"""As-of join — a custom operator Ray Data lacks (SURVEY.md 'custom
operators': as-of/range joins built from composition).

Pattern (ray_guide 'As-of / range join'): bucket BOTH sides by the equality
key so every key's rows co-locate, sort within the bucket, and run
``pandas.merge_asof`` per bucket — the classic partitioned as-of join.
Event-time semantics: for each left event, the latest right event with
``right.ts <= left.ts`` for the same key (inclusive), i.e. exactly DuckDB's
``ASOF JOIN … ON l.key = r.key AND l.ts >= r.ts``.

The demo operator: for every 'click' event, the most recent prior 'view'
by the same user → ``(event_id, view_event_id, gap_us)``; unmatched clicks
drop (inner as-of).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .agg import hash_groupby


def asof_join_events(sf_dir: str, left_type: str = "click", right_type: str = "view"):
    """events ⟕asof events on (user_id, ts) — returns a Dataset of
    (event_id, view_event_id, gap_us)."""
    import ray.data

    from ..sources.tables import read_table

    ds = read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    both = ds.map_batches(
        lambda t, lt=left_type, rt=right_type: t[t["event_type"].isin([lt, rt])],
        batch_format="pandas",
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values("ts", kind="mergesort")
        right = (
            g[g["event_type"] == right_type]
            .sort_values("ts", kind="mergesort")
            .rename(columns={"event_id": "view_event_id", "ts": "view_ts"})
        )
        if left.empty or right.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "view_event_id": pd.Series(dtype="int64"),
                 "gap_us": pd.Series(dtype="int64")}
            )
        m = pd.merge_asof(
            left,
            right[["view_event_id", "view_ts", "user_id"]],
            left_on="ts",
            right_on="view_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=["view_event_id"])  # inner as-of
        gap = (m["ts"] - m["view_ts"]).astype("timedelta64[us]").astype("int64")
        return pd.DataFrame(
            {"event_id": m["event_id"].astype("int64"),
             "view_event_id": m["view_event_id"].astype("int64"),
             "gap_us": gap}
        )

    return hash_groupby(both, "user_id", per_bucket)


RANGE_WINDOW_US = 5 * 60 * 1_000_000  # 5 minutes


def range_count_events(sf_dir: str, left_type: str = "click",
                       right_type: str = "view",
                       window_us: int = RANGE_WINDOW_US):
    """events ⟕range events — for every '{left_type}' event, the number of
    '{right_type}' events by the same user in the HALF-OPEN window
    ``(l.ts - window, l.ts]``. The range-join companion to the as-of join:
    same key-bucketed composition (ray_guide 'As-of / range join'), but the
    per-bucket kernel is two vectorized ``searchsorted`` probes over the
    sorted right side instead of ``merge_asof`` — a count over an interval,
    not a nearest match.

    Returns (event_id, n_views); zero-match left rows kept (count 0)."""
    from ..sources.tables import read_table

    ds = read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    both = ds.map_batches(
        lambda t, lt=left_type, rt=right_type: t[t["event_type"].isin([lt, rt])],
        batch_format="pandas",
    )

    def per_bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        """Grouped interval count WITHOUT a per-user loop: the merge-rank
        trick. rights-≤-query counts come from ONE lexsort of the union
        (user, ts, rights-first flag) + a cumsum; the window count is the
        difference of two such ranks (the shared previous-users prefix
        cancels). O((n+m) log(n+m)) vectorized per bucket."""
        is_l = (g["event_type"] == left_type).to_numpy()
        is_r = (g["event_type"] == right_type).to_numpy()
        lu = g.loc[is_l, "user_id"].to_numpy(np.int64)
        lt = g.loc[is_l, "ts"].to_numpy("datetime64[us]").astype("int64")
        ru = g.loc[is_r, "user_id"].to_numpy(np.int64)
        rt = g.loc[is_r, "ts"].to_numpy("datetime64[us]").astype("int64")
        if not len(lu):
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "n_views": pd.Series(dtype="int64")})

        def rank_le(qt: np.ndarray) -> np.ndarray:
            u = np.concatenate([ru, lu])
            t = np.concatenate([rt, qt])
            flag = np.concatenate([np.zeros(len(ru), np.int8),
                                   np.ones(len(qt), np.int8)])
            order = np.lexsort((flag, t, u))
            rights_cum = np.cumsum(flag[order] == 0)
            pos = np.empty(len(order), np.int64)
            pos[order] = np.arange(len(order))
            return rights_cum[pos[len(ru):]]

        n = rank_le(lt) - rank_le(lt - window_us)
        return pd.DataFrame(
            {"event_id": g.loc[is_l, "event_id"].to_numpy(np.int64),
             "n_views": n.astype(np.int64)}
        )

    return hash_groupby(both, "user_id", per_bucket_count)
