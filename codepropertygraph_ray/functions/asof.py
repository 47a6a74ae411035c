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


OVERLAP_BAND_US = 6 * 3600 * 1_000_000  # 6-hour time bands


def session_overlap_counts(sf_dir: str, gap_min: int = 30,
                           band_us: int = OVERLAP_BAND_US):
    """Interval-OVERLAP self-join over sessionized events: for each session,
    how many OTHER sessions (any user) overlap it in time (inclusive
    endpoints). The third member of the temporal-join family next to the
    as-of and range joins above.

    NOT a pairwise join: overlap(a) over disjoint-per-key intervals reduces
    to the counting identity

        n(a) = |{b : b.start <= a.end}| - |{b : b.end < a.start}| - 1

    (same-user sessions never overlap by construction — the sessionizer
    breaks on gap > ``gap_min`` — so the -1 removes exactly self). Both
    terms are GLOBAL ranks, computed distributively: (1) a calendar-scale
    per-band histogram of starts/ends (per-batch partials, tiny driver
    reduce, broadcast once) supplies the prefix below each band; (2) one
    exchange keyed by time band co-locates each band's point values with
    the queries that land in it for an in-band ``searchsorted``; (3) a
    session-keyed sum combines the two signed partials. Shuffle volume is
    session-scale (4 rows/session), never pair-scale — the reason this
    beats enumerating overlap pairs at 100 TB.

    Returns (user_id, session_idx, n_overlap); zero-overlap sessions kept.
    """
    import ray

    from .agg import empty_safe, hash_agg, hash_groupby
    from .joins import get_broadcast
    from .relational import sessionize_events

    sessions = sessionize_events(sf_dir, gap_min=gap_min)

    def to_us(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": t["user_id"].astype("int64"),
             "session_idx": t["session_idx"].astype("int64"),
             "s_us": t["session_start"].astype("datetime64[us]").astype("int64"),
             "e_us": t["session_end"].astype("datetime64[us]").astype("int64")}
        )

    # session-scale (orders of magnitude below the event stream); pin it so
    # the histogram and the tagged exchange don't re-run the sessionizer
    iv = sessions.map_batches(to_us, batch_format="pandas").materialize()

    # (1) band histogram: bounded by calendar span / band_us, not by rows
    def hist(t: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series(t["s_us"].to_numpy() // band_us).value_counts()
        e = pd.Series(t["e_us"].to_numpy() // band_us).value_counts()
        return empty_safe(
            pd.DataFrame({"band": s.index, "n_s": s.to_numpy(np.int64),
                          "n_e": 0}).set_index("band")
            .add(pd.DataFrame({"band": e.index, "n_s": 0,
                               "n_e": e.to_numpy(np.int64)}).set_index("band"),
                 fill_value=0)
            .reset_index().astype({"band": "int64", "n_s": "int64",
                                   "n_e": "int64"})
        )

    h = iv.map_batches(hist, batch_format="pandas").to_pandas()
    h = h.groupby("band", as_index=False).sum().sort_values("band",
                                                            ignore_index=True)
    bands = h["band"].to_numpy(np.int64)
    cum_s = np.concatenate([[0], np.cumsum(h["n_s"].to_numpy(np.int64))])
    cum_e = np.concatenate([[0], np.cumsum(h["n_e"].to_numpy(np.int64))])
    pref = ray.put((bands, cum_s, cum_e))

    # (2) tagged exchange: per session 2 point rows + 2 query rows
    def tag(t: pd.DataFrame) -> pd.DataFrame:
        s = t["s_us"].to_numpy(np.int64)
        e = t["e_us"].to_numpy(np.int64)
        uid = t["user_id"].to_numpy(np.int64)
        sid = t["session_idx"].to_numpy(np.int64)
        z = np.zeros(len(t), np.int64)
        return pd.DataFrame(
            {"band": np.concatenate([s // band_us, e // band_us,
                                     e // band_us, s // band_us]),
             # 0 = start point, 1 = end point,
             # 2 = query rank(starts <= e), 3 = query rank(ends < s)
             "kind": np.repeat(np.arange(4, dtype=np.int8), len(t)),
             "val": np.concatenate([s, e, e, s]),
             "user_id": np.concatenate([z, z, uid, uid]),
             "session_idx": np.concatenate([z, z, sid, sid])}
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bands_g, cs, ce = get_broadcast(pref)
        out = []
        for band, gb in g.groupby("band", sort=False):
            i = int(np.searchsorted(bands_g, band))
            kb = gb["kind"].to_numpy()
            val = gb["val"].to_numpy(np.int64)
            starts = np.sort(val[kb == 0])
            ends = np.sort(val[kb == 1])
            q2 = kb == 2
            q3 = kb == 3
            if q2.any():
                n2 = np.searchsorted(starts, val[q2], side="right") + cs[i]
                out.append(pd.DataFrame(
                    {"user_id": gb["user_id"].to_numpy(np.int64)[q2],
                     "session_idx": gb["session_idx"].to_numpy(np.int64)[q2],
                     "cnt": n2.astype(np.int64)}))
            if q3.any():
                n3 = np.searchsorted(ends, val[q3], side="left") + ce[i]
                out.append(pd.DataFrame(
                    {"user_id": gb["user_id"].to_numpy(np.int64)[q3],
                     "session_idx": gb["session_idx"].to_numpy(np.int64)[q3],
                     "cnt": -n3.astype(np.int64)}))
        if not out:
            return empty_safe(pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "session_idx": pd.Series(dtype="int64"),
                 "cnt": pd.Series(dtype="int64")}))
        return pd.concat(out, ignore_index=True)

    parts = hash_groupby(iv.map_batches(tag, batch_format="pandas"),
                         "band", per_bucket)

    # (3) combine the signed partials per session; -1 removes self
    summed = hash_agg(parts, ["user_id", "session_idx"], n=("cnt", "sum"))
    return summed.map_batches(
        lambda t: pd.DataFrame(
            {"user_id": t["user_id"].astype("int64"),
             "session_idx": t["session_idx"].astype("int64"),
             "n_overlap": (t["n"] - 1).astype("int64")}),
        batch_format="pandas",
    )
