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
