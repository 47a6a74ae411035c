"""Bucketed hash aggregation — the engine's high-cardinality groupby.

Ray Data's ``groupby(keys).aggregate(...)`` / ``map_groups`` pays Python
per-group overhead after its sort: fine for dozens of groups, pathological
at 10^5+ groups (measured: 294k-group degree count = 135 s vs 3.6 s with
this pattern on the same input, 16 CPUs).

The scalable shape: shuffle by a COARSE bucket — ``siphash(keys) % B`` —
then run ONE vectorized pandas groupby per bucket. Every key lands in
exactly one bucket, so per-bucket results are globally correct without a
second merge. B is small (≈ 4 × CPUs), so the shuffle and the per-group
Python dispatch are both O(B), while the real aggregation work is C-level.

This is the partial-aggregation discipline of SURVEY.md §2.5/§7.3 applied
to the shuffle itself; bucket skew is bounded because SipHash spreads keys
uniformly (a single *hot key* still lands in one bucket — salt upstream if
one key dominates, cf. SURVEY.md §7.4).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

from ..ids import hash_series

DEFAULT_BUCKETS = 64

# one bucket is realized as ONE pandas frame in ONE task — cap its share of
# the shuffled stream so a bucket fits a worker heap at any corpus size
TARGET_BUCKET_BYTES = 64 << 20
# ~bytes/row fallback when only a row count is known (wide string rows)
EST_ROW_BYTES = 200
# upper bound: groupby shuffles are sort-based so many groups are fine, but
# metadata per bucket is not free — 2^17 buckets × 64 MiB ≈ 8 TiB per
# exchange, beyond which callers should also shard the exchange itself
MAX_BUCKETS = 1 << 17


def auto_buckets(
    nbytes: int | None = None,
    rows: int | None = None,
    floor: int | None = None,
) -> int:
    """Data-scaled shuffle width: ``max(4×CPUs, input_size / 64 MiB)``.

    A FIXED bucket count is the classic 100-TB failure mode: every bucket
    is 1/B of the corpus-scale stream, so at 1000× the data each bucket
    task OOMs. The base read already scales its block count by bytes
    (pipelines/kg.py run_base); shuffle widths must scale the same way.
    The floor (4× cluster CPUs, min DEFAULT_BUCKETS) keeps small inputs
    wide enough to occupy the cluster; the byte/row term takes over as
    data grows."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    f = max(DEFAULT_BUCKETS, 4 * ncpu) if floor is None else floor
    if nbytes is None and rows is not None:
        nbytes = rows * EST_ROW_BYTES
    n = f if nbytes is None else max(f, -(-int(nbytes) // TARGET_BUCKET_BYTES))
    return min(n, MAX_BUCKETS)


def empty_as_arrow(df: pd.DataFrame):
    """0-row pandas blocks with string/object columns trip Ray's block-size
    sampler (`np.vectorize` on size-0 input → a logged warning per block).
    Convert empty frames to a TYPED arrow table instead: exact size, no
    sampling, and the schema survives (object columns — strings throughout
    this engine — are cast to string so they don't infer as arrow null)."""
    import pyarrow as pa

    obj_cols = {c: "string" for c in df.columns if df[c].dtype == object}
    if obj_cols:
        df = df.astype(obj_cols)
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def round_half_away(x, decimals: int):
    """Round half away from zero — SQL/DuckDB ``round()`` semantics.

    numpy's ``.round`` is banker's (half-to-even), so exact binary-fraction
    ties diverge from a SQL oracle: ``np.round(0.0078125, 6) = 0.007812``
    while DuckDB gives ``0.007813``. Every float column that feeds a
    hash-compared oracle must round through this helper instead."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def empty_safe(df):
    """Wrap a ``map_batches`` pandas output: 0-row frames become typed
    arrow (see :func:`empty_as_arrow`), everything else passes through."""
    if isinstance(df, pd.DataFrame) and len(df) == 0:
        return empty_as_arrow(df)
    return df


def hash_groupby(
    ds,
    keys: list[str] | str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
):
    """Apply ``fn`` once per hash bucket; all rows of any key co-locate.

    ``fn`` receives the bucket's rows (without the bucket column) and
    returns any DataFrame — typically a vectorized ``groupby(keys)``.

    ``num_buckets=None`` → :func:`auto_buckets` (CPU-scaled floor). Callers
    that know their input size should pass ``auto_buckets(nbytes=...)`` so
    the width grows with the data."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if num_buckets is None:
        num_buckets = auto_buckets()

    def add_bucket(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        cols = [t[k] for k in keys]
        if all(c.dtype.kind in "iu" for c in cols):
            # numeric fast path: splitmix combine, no string building
            from ..ids import mix_ids

            h = mix_ids(*[c.to_numpy() for c in cols])
        else:
            h = hash_series(cols)
        t["_bucket"] = (h % num_buckets).astype("int32")
        return t

    def per_bucket(g: pd.DataFrame):
        out = fn(g.drop(columns=["_bucket"]))
        if isinstance(out, pd.DataFrame) and len(out) == 0:
            return empty_as_arrow(out)
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def hash_agg(ds, keys: list[str] | str, num_buckets: int | None = None, **named_aggs):
    """``hash_groupby`` with pandas named aggregations:

        hash_agg(ds, "key", n_mentions=("n", "sum"))
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys_l, as_index=False).agg(**named_aggs)

    return hash_groupby(ds, keys_l, agg, num_buckets=num_buckets)


def salted_agg(
    ds,
    keys: list[str] | str,
    num_buckets: int | None = None,
    salt: int = 8,
    **named_aggs,
):
    """Two-stage aggregation for HOT keys (SURVEY.md §7.4 'salt hot keys').

    ``hash_agg`` co-locates every row of a key in one bucket; a single key
    holding a large fraction of all rows (the long-conversation / frequent-
    entity skew) then serializes into one straggler task. ``salted_agg``
    first aggregates on (key, salt) where salt spreads each key's rows over
    ``salt`` sub-groups (round 1 shrinks the hot key to ``salt`` partial
    rows), then re-aggregates the partials on the key alone (round 2 is
    tiny). Only valid for algebraic aggregations (sum/min/max/count-as-sum
    — anything expressible as a merge of partials).
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys)

    # count-style partials must re-merge with sum in round 2
    MERGE = {"sum": "sum", "min": "min", "max": "max", "count": "sum", "size": "sum"}
    round2 = {}
    for out_col, (in_col, how) in named_aggs.items():
        if how not in MERGE:
            raise ValueError(f"salted_agg supports algebraic aggs only, got {how!r}")
        round2[out_col] = (out_col, MERGE[how])

    def add_salt(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        # deterministic spread: hash of the row position within the batch
        # is NOT stable across runs — use a content hash of all agg inputs
        in_cols = [c for c, _ in named_aggs.values()]
        t["_salt"] = (hash_series([t[c] for c in keys_l + in_cols]) % salt).astype("int32")
        return t

    stage1 = hash_agg(
        ds.map_batches(add_salt, batch_format="pandas"),
        keys_l + ["_salt"],
        num_buckets=num_buckets,
        **named_aggs,
    )

    def drop_salt(t: pd.DataFrame) -> pd.DataFrame:
        return t.drop(columns=["_salt"])

    return hash_agg(
        stage1.map_batches(drop_salt, batch_format="pandas"),
        keys_l,
        num_buckets=num_buckets,
        **round2,
    )
