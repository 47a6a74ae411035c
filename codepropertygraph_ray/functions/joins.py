"""Join strategies — broadcast vs shuffle, chosen by side size.

The reference's linking passes build in-memory name→node maps over the whole
graph and probe them per row (`semanticcpg/.../linking/linker/Linker.scala:
19-22,122-130`; `CallLinker.scala:42-51`). The Ray-native split
(SURVEY.md §2.6):

* **broadcast join** — the dimension side (entity vocab, canonical map,
  tool/speaker dims) is vocab-scale, orders of magnitude smaller than the
  fact stream. ``ray.put`` it ONCE; every map task reads it zero-copy from
  the object store (never re-shipped per batch) and does a vectorized
  pandas merge per batch. No shuffle of the big side at all.
* **shuffle hash join** — both sides large → ``Dataset.join`` (Ray's
  hash-partitioned join). Caller picks ``num_partitions``; salt hot keys
  upstream when skewed.

``join_auto`` picks broadcast when the small side is under a byte budget.
"""

from __future__ import annotations

import pandas as pd
import ray


# Per-worker-process cache of deserialized broadcast objects: ``ray.get``
# re-deserializes on every call, so a hot stage must memoize. One entry per
# ObjectRef per worker process — the once-per-worker setup the reference gets
# from per-thread pass state (`Linker.scala:122-130` builds its maps once).
_BROADCAST_CACHE: dict[bytes, object] = {}


def get_broadcast(ref):
    key = ref.binary()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def _parquet_lookup(source, key_col: str, val_col: str):
    import pyarrow.dataset as pads

    t = pads.dataset(source).to_table(columns=[key_col, val_col])
    return build_lookup(t.column(key_col).to_pandas(), t.column(val_col).to_pandas())


_parquet_lookup_task = ray.remote(_parquet_lookup)


def lookup_task(source, key_col: str = "node", val_col: str = "component"):
    """Build a :func:`build_lookup` probe INSIDE a Ray task; returns the
    ObjectRef of the probe table (lands in plasma as the task output —
    zero driver copies, zero driver hash/sort time).

    The driver-side ``read_table(...).to_pandas()`` + ``build_lookup`` it
    replaces was the link pass's largest width-independent serial term
    (~4 s at sf0.4 — BASELINE.md 'Quantified serial attribution'); as a
    task it overlaps the consuming stage's read startup, and consumers
    that ``get_broadcast(ref)`` inside map tasks block on the ref exactly
    as they would on a ``ray.put`` ref (Ray releases a blocked worker's
    CPU, the same self-synchronization the validator's dim task uses —
    stages/validate.py:_dim_state_task)."""
    return _parquet_lookup_task.remote(source, key_col, val_col)


def build_lookup(keys, values):
    """(keys, values) → broadcastable sorted-hash probe table.

    The hot-path replacement for ``Series.map(dict)``: keys are SipHashed to
    int64 once (driver-side), sorted; the probe is ``np.searchsorted`` on
    the hash column — measured ~100× faster per batch than a dict probe at
    10^6+ keys (see stages/validate.py, which pioneered the pattern for the
    id→label lookup). Distinct-key hash collisions are 2^-63 per pair —
    the same accepted budget as content-hash node ids (ids.py).
    """
    import numpy as np

    from ..ids import hash_series

    k = pd.Series(keys, dtype="object").reset_index(drop=True)
    v = np.asarray(list(values), dtype=object)
    h = hash_series([k])
    order = np.argsort(h, kind="stable")
    return h[order], v[order]


def lookup_keys(table, keys: pd.Series, default=None):
    """Probe a ``build_lookup`` table; missing keys → ``default`` scalar,
    or themselves when ``default`` is the sentinel ``"self"`` (the
    Linker.scala:244-266 soft-fail: unresolved keys keep themselves)."""
    import numpy as np

    from ..ids import hash_series

    hs, vals = table
    if len(hs) == 0:
        return keys.to_numpy() if default == "self" else np.full(len(keys), default, dtype=object)
    h = hash_series([keys])
    pos = np.clip(np.searchsorted(hs, h), 0, len(hs) - 1)
    found = hs[pos] == h
    fallback = keys.to_numpy() if default == "self" else np.full(len(keys), default, dtype=object)
    return np.where(found, vals[pos], fallback)


def broadcast_join(ds, small, on, right_on=None, how="left",
                   batch_size: int = 65536):
    """ds ⟕ small — the map-side join. ``small`` must fit in worker heap.

    Stateless tasks (NOT an actor pool): a broadcast probe needs no per-actor
    state beyond the cached small side, and stateless tasks can't starve
    sibling stages of CPUs the way a fleet of reserved actors can (several
    broadcast joins compose in one pipeline). The indexed probe side is
    built once on the driver and ``ray.put`` once; workers memoize the
    deserialized frame via ``get_broadcast``.
    """
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    ref = ray.put(small.set_index(right_on))

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        probe = get_broadcast(ref)
        return batch.join(probe, on=on, how=how, rsuffix="_r").reset_index(drop=True)

    return ds.map_batches(_join, batch_format="pandas", batch_size=batch_size)


def broadcast_semi_filter(ds, keys, on: str, keep: bool = True, batch_size: int = 65536):
    """Semi/anti join: broadcast the key *set* and filter inside map_batches
    (the guide's 'semi/anti = broadcast key set' pattern; at extreme scale
    substitute a Bloom filter of the keys)."""
    ref = ray.put(frozenset(keys))

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        ks = get_broadcast(ref)
        mask = batch[on].isin(ks)
        return batch[mask if keep else ~mask]

    return ds.map_batches(_filter, batch_format="pandas", batch_size=batch_size)


# ~256 MB: a broadcast side bigger than this should shuffle instead
BROADCAST_BYTES_LIMIT = 256 * 1024 * 1024


def join_auto(left, right, on, right_on=None, how: str = "left",
              num_partitions: int | None = None):
    """Size-aware join: broadcast the right side when small, else shuffle.

    ``right`` may be a pandas DataFrame (always broadcast) or a Dataset
    (size probed via ``size_bytes``). ``num_partitions`` defaults to the
    cluster CPU count: Ray's JoinOperator reserves one actor per
    partition, so partitions > CPUs DEADLOCKS a small cluster waiting for
    actors that can never schedule.
    """
    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)))
    if isinstance(right, pd.DataFrame):
        if right.memory_usage(deep=True).sum() <= BROADCAST_BYTES_LIMIT:
            return broadcast_join(left, right, on=on, right_on=right_on, how=how)
        from ray.data import from_pandas

        right = from_pandas(right)
    sz = right.size_bytes()
    if sz is not None and sz <= BROADCAST_BYTES_LIMIT:
        return broadcast_join(left, right.to_pandas(), on=on, right_on=right_on, how=how)
    ray_how = {"left": "left_outer", "inner": "inner"}.get(how, how)
    on_t = (on,) if isinstance(on, str) else tuple(on)
    ron_t = None if right_on is None else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(right, ray_how, num_partitions, on=on_t, right_on=ron_t)
