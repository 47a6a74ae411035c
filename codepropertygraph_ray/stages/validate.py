"""Schema-facts validation over the materialized graph tables.

Rebuild of the reference's conformance checker
(`cpgvalidator/.../validators/CpgValidator.scala:8-15` running
`OutFactsValidator.scala:19-105`, `InFactsValidator`, `KeysValidator`):
facts come from `schema.py` (the analog of re-importing the generated
schema) and every produced graph can be checked against them.

Checks (each emits violation rows; a valid graph yields ZERO rows):

1. node labels ∈ NODE_LABELS; node ids unique (KeysValidator-ish)
2. edge (src_label, label, dst_label) ∈ EDGE_FACTS   (OutFacts/InFacts)
3. no dangling edge endpoints (the ProtoToCpg dangling-edge warning,
   `ProtoToCpg.scala:81-89`, promoted to a check)
4. out-degree cardinality bounds per OUT_DEGREE_FACTS (≤1 NEXT_TURN,
   exactly one REF per MENTION — the "0-1:n" facts of base.json)
5. in-degree cardinality bounds per IN_DEGREE_FACTS (exactly one AST
   parent per TURN/MENTION, ≤1 NEXT_TURN predecessor — the
   `InFactsValidator.scala:12-60` side) plus the conditional
   entity_ref_missing check (every non-external ENTITY has ≥1 incoming
   REF — external stubs legitimately have zero)
6. CFG sanity over NEXT_TURN (the `cfg/NoLongJumpValidator` /
   `CallReceiverValidator` analog): an edge must stay INSIDE one
   conversation (cfg_cross_conversation) and run strictly forward in
   turn order (cfg_nonmonotonic)

Two execution shapes, chosen by node count:

* **broadcast path** (default below ``BROADCAST_MAX_ROWS`` nodes): one
  nodes scan pulls the NUMERIC (id:int64, code:int16) dim to the driver,
  broadcasts it as sorted arrays, and one edges scan does every edge-side
  check with ``np.searchsorted`` probes (measured ~100× faster per batch
  than dict probes).
* **sharded path** (corpus-scale dims): NOTHING corpus-scale touches the
  driver. Node checks run in an id-bucketed shuffle over the dim; edge
  checks run as two co-group shuffles (by src then by dst) that join edges
  to the dim in-bucket — the degree bounds complete in the src shuffle
  because all of a node's out-edges co-locate there.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .. import schema
from ..functions.joins import get_broadcast

# above this many nodes the (id, code) dim stops being broadcast and the
# validator switches to the sharded join path
BROADCAST_MAX_ROWS = 50_000_000

VIOLATIONS_SCHEMA = pa.schema([("check", pa.string()), ("detail", pa.string())])


def _viol(check, detail_series) -> pd.DataFrame:
    d = pd.Series(detail_series, dtype="string")
    return pd.DataFrame(
        {"check": pd.Series([check] * len(d), dtype="string"),
         "detail": d.reset_index(drop=True)}
    )


_EMPTY = pd.DataFrame({"check": pd.Series([], dtype="string"),
                       "detail": pd.Series([], dtype="string")})


def _label_codes():
    label_names = list(schema.NODE_LABELS)
    return label_names, {name: i for i, name in enumerate(label_names)}


def _bound_matrix(code_of_label):
    edge_code = {name: i for i, name in enumerate(schema.EDGE_LABELS)}
    mat = np.full((len(code_of_label), len(schema.EDGE_LABELS)), np.inf)
    for (sl, el), (_mn, mx) in schema.OUT_DEGREE_FACTS.items():
        if mx is not None:
            mat[code_of_label[sl], edge_code[el]] = mx
    return mat


def _in_fact_codes(code_of_label):
    """IN_DEGREE_FACTS keyed by (dst_code, edge_code) + a boolean collect
    matrix for the vectorized per-batch membership test."""
    edge_code = {name: i for i, name in enumerate(schema.EDGE_LABELS)}
    facts = {
        (code_of_label[dl], edge_code[el]): (mn, mx)
        for (dl, el), (mn, mx) in schema.IN_DEGREE_FACTS.items()
    }
    collect = np.zeros((len(code_of_label), len(schema.EDGE_LABELS)), dtype=bool)
    for dc, lc in facts:
        collect[dc, lc] = True
    return facts, collect


def _prop_masks(label_names):
    """(required, forbidden) uint16 bit-matrices per label code over
    schema.NODE_PROP_COLS — the KeysValidator fact tables
    (`cpgvalidator/.../validators/KeysValidator.scala:12-58`). Labels
    absent from NODE_PROP_FACTS (unregistered extensions) are unchecked."""
    pcols = schema.NODE_PROP_COLS
    bit = {c: np.uint16(1 << i) for i, c in enumerate(pcols)}
    full = np.uint16((1 << len(pcols)) - 1)
    req = np.zeros(len(label_names), dtype=np.uint16)
    forb = np.zeros(len(label_names), dtype=np.uint16)
    for i, lab in enumerate(label_names):
        fact = schema.NODE_PROP_FACTS.get(lab)
        if fact is None:
            continue
        required, optional = fact
        r = np.uint16(sum(int(bit[c]) for c in required))
        o = np.uint16(sum(int(bit[c]) for c in optional))
        req[i] = r
        forb[i] = full & ~(r | o)
    return req, forb


def _decode_mask_viols(label_names, miss_or, over_or):
    out = []
    for i, lab in enumerate(label_names):
        for j, col in enumerate(schema.NODE_PROP_COLS):
            if miss_or[i] & (1 << j):
                out.append(("node_key_missing", f"{lab}.{col}"))
            if over_or[i] & (1 << j):
                out.append(("node_key_forbidden", f"{lab}.{col}"))
    return out


def _prop_mask_viols(label_names, codes, pmask):
    """(check, detail) rows from per-node label codes + presence bitmasks:
    per label, the OR of missing-required and set-forbidden bits."""
    valid = codes >= 0
    c, pm = codes[valid].astype(np.int64), pmask[valid].astype(np.uint16)
    req, forb = _prop_masks(label_names)
    miss_or = np.zeros(len(label_names), dtype=np.uint16)
    over_or = np.zeros(len(label_names), dtype=np.uint16)
    np.bitwise_or.at(miss_or, c, req[c] & ~pm)
    np.bitwise_or.at(over_or, c, forb[c] & pm)
    return _decode_mask_viols(label_names, miss_or, over_or)


def _keys_partial_scan(ds, label_names, precoded: bool = False):
    """KeysValidator check via a distributed scan: each batch reduces to at
    most one (code, miss, over) row per label — only bit-OR partials reach
    the driver. ``precoded=True`` scans a numeric dim that already carries
    (code, pmask) columns; otherwise ``ds`` is a raw nodes table."""
    req, forb = _prop_masks(label_names)
    pcols = schema.NODE_PROP_COLS

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        if precoded:
            code = t["code"].to_numpy().astype(np.int64)
            pm = t["pmask"].to_numpy().astype(np.uint16)
        else:
            code = pd.Categorical(
                t["label"], categories=label_names
            ).codes.astype("int64")
            pm = np.zeros(len(t), dtype=np.uint16)
            for i, c in enumerate(pcols):
                pm |= t[c].notna().to_numpy().astype(np.uint16) << i
        valid = code >= 0
        c2, p2 = code[valid], pm[valid]
        miss_or = np.zeros(len(label_names), dtype=np.uint16)
        over_or = np.zeros(len(label_names), dtype=np.uint16)
        np.bitwise_or.at(miss_or, c2, req[c2] & ~p2)
        np.bitwise_or.at(over_or, c2, forb[c2] & p2)
        nz = (miss_or | over_or) != 0
        return pd.DataFrame({
            "kcode": pd.Series(np.flatnonzero(nz), dtype="int16"),
            "miss": pd.Series(miss_or[nz], dtype="uint16"),
            "over": pd.Series(over_or[nz], dtype="uint16"),
        })

    parts = (
        (ds if precoded else ds.select_columns(["label", *pcols]))
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    miss_or = np.zeros(len(label_names), dtype=np.uint16)
    over_or = np.zeros(len(label_names), dtype=np.uint16)
    if len(parts):
        np.bitwise_or.at(miss_or, parts["kcode"].to_numpy(np.int64),
                         parts["miss"].to_numpy(np.uint16))
        np.bitwise_or.at(over_or, parts["kcode"].to_numpy(np.int64),
                         parts["over"].to_numpy(np.uint16))
    return _decode_mask_viols(label_names, miss_or, over_or)


def _dim_dataset(src):
    """pads.dataset over one dir OR a list of dirs (expanded to files —
    pyarrow's list form wants file paths, not directories)."""
    import os

    import pyarrow.dataset as pads

    if isinstance(src, (list, tuple)):
        return pads.dataset(_dim_files(src))
    return pads.dataset(src)



def _probe_sorted(ids_s: np.ndarray, q: np.ndarray) -> np.ndarray:
    """``np.searchsorted(ids_s, q)`` but ~2.7× faster for large random
    query vectors: pre-sorting the queries makes the binary-search walk
    sequentially through the probe table (cache locality) instead of
    random-missing per query; the inverse permutation restores order."""
    if len(q) < 4096:
        return np.searchsorted(ids_s, q)
    o = np.argsort(q, kind="stable")
    pos = np.empty(len(q), dtype=np.int64)
    pos[o] = np.searchsorted(ids_s, q[o])
    return pos


def _dim_files(src) -> list:
    """Expand one dir OR a list of dirs to a sorted parquet file list."""
    dirs = src if isinstance(src, (list, tuple)) else [src]
    files = []
    for d in dirs:
        if os.path.isdir(d):
            files.extend(sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")
            ))
        else:
            files.append(d)
    return files


_SIGN64 = np.uint64(1) << np.uint64(63)


def _shard_of(ids: np.ndarray, k: int) -> np.ndarray:
    """Shard index (0..2^k-1) from an id's TOP bits in int64 sort order:
    biasing through uint64 makes the shards RANGE-CONTIGUOUS, so the
    concatenation of per-shard sorted runs IS the globally sorted array —
    no merge step, and positions stay global after an offset add."""
    u = np.ascontiguousarray(ids, dtype=np.int64).view(np.uint64) ^ _SIGN64
    return (u >> np.uint64(64 - k)).astype(np.int64)


@ray.remote
def _dim_read_shards(files: list, k: int):
    """Read a file subset of a numeric dim and split its rows into 2^k
    shard pieces (returned as separate task outputs → each sorter fetches
    only its shard). Column-agnostic: works for ndim (id, code, ext,
    pmask) and tprops (id, conv, tidx) alike."""
    import pyarrow.parquet as pqt

    R = 1 << k
    tabs = [pqt.read_table(f) for f in files]
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return tuple({} for _ in range(R)) if R > 1 else ({},)
    t = pa.concat_tables(tabs, promote_options="default")
    cols = {c: np.asarray(t.column(c).to_numpy(zero_copy_only=False))
            for c in t.column_names}
    sh = _shard_of(cols["id"].astype(np.int64, copy=False), k)
    order = np.argsort(sh, kind="stable")
    bounds = np.searchsorted(sh[order], np.arange(R + 1))
    out = []
    for s in range(R):
        sel = order[bounds[s]:bounds[s + 1]]
        out.append({c: v[sel] for c, v in cols.items()} if len(sel) else {})
    return tuple(out) if R > 1 else (out[0],)


def _masks_from(codes, pm, req, forb, nlabels):
    """KeysValidator bit-OR reductions with the zero-violation fast path
    (shared by the single-task and sharded dim builders)."""
    contrib_miss = req[codes] & ~pm
    contrib_over = forb[codes] & pm
    invalid = codes < 0
    if invalid.any():
        contrib_miss[invalid] = 0
        contrib_over[invalid] = 0
    miss_or = np.zeros(nlabels, dtype=np.uint16)
    over_or = np.zeros(nlabels, dtype=np.uint16)
    if contrib_miss.any():
        np.bitwise_or.at(miss_or, codes[~invalid].astype(np.int64),
                         contrib_miss[~invalid])
    if contrib_over.any():
        np.bitwise_or.at(over_or, codes[~invalid].astype(np.int64),
                         contrib_over[~invalid])
    return miss_or, over_or


@ray.remote
def _ndim_sort_shard(nlabels, ent_code, req, forb, *parts):
    """Sort ONE id shard of the node dim and reduce its node-side checks.
    Input: this shard's piece from every reader task."""
    parts = [p for p in parts if p]
    if not parts:
        return ((np.empty(0, np.int64), np.empty(0, np.int16)),
                {"n": 0, "dup_ids": np.empty(0, np.int64),
                 "counts": np.zeros(nlabels, np.int64), "n_unknown": 0,
                 "has_pmask": True,
                 "masks": (np.zeros(nlabels, np.uint16),
                           np.zeros(nlabels, np.uint16)),
                 "nonext": np.empty(0, bool)})
    ids = np.concatenate([p["id"].astype(np.int64, copy=False) for p in parts])
    codes = np.concatenate([p["code"].astype(np.int16, copy=False) for p in parts])
    ext = np.concatenate([p["ext"].astype(bool, copy=False) for p in parts])
    has_pmask = all("pmask" in p for p in parts)
    o = np.argsort(ids)
    ids, codes, ext = ids[o], codes[o], ext[o]
    dup_ids = (np.unique(ids[1:][ids[1:] == ids[:-1]])
               if len(ids) > 1 else np.empty(0, np.int64))
    counts = np.bincount(codes[codes >= 0], minlength=nlabels)
    masks = None
    if has_pmask:
        pm = np.concatenate(
            [p["pmask"].astype(np.uint16, copy=False) for p in parts])[o]
        masks = _masks_from(codes, pm, req, forb, nlabels)
    return ((ids, codes),
            {"n": len(ids), "dup_ids": dup_ids, "counts": counts,
             "n_unknown": int((codes < 0).sum()), "has_pmask": has_pmask,
             "masks": masks, "nonext": (codes == ent_code) & ~ext})


@ray.remote
def _tprops_sort_shard(*parts):
    parts = [p for p in parts if p]
    if not parts:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int32))
    ids = np.concatenate([p["id"].astype(np.int64, copy=False) for p in parts])
    conv = np.concatenate([p["conv"].astype(np.int64, copy=False) for p in parts])
    tidx = np.concatenate([p["tidx"].astype(np.int32, copy=False) for p in parts])
    o = np.argsort(ids)
    return ids[o], conv[o], tidx[o]


@ray.remote(num_returns=3)
def _dim_concat_task(nlabels, R, *outs):
    """Stitch the per-shard sorted runs (range-contiguous by construction)
    into the same three outputs `_dim_state_task` produces. Pure memcpy —
    the sorts already happened shard-parallel."""
    nd = outs[:R]
    tp = outs[R:]
    ids = np.concatenate([d[0][0] for d in nd]) if nd else np.empty(0, np.int64)
    codes = (np.concatenate([d[0][1] for d in nd])
             if nd else np.empty(0, np.int16))
    smalls = [d[1] for d in nd]
    has_pmask = all(s["has_pmask"] for s in smalls) if smalls else True
    masks = None
    if has_pmask and smalls:
        miss_or = np.zeros(nlabels, dtype=np.uint16)
        over_or = np.zeros(nlabels, dtype=np.uint16)
        for s in smalls:
            if s["masks"] is not None:
                miss_or |= s["masks"][0]
                over_or |= s["masks"][1]
        masks = (miss_or, over_or)
    small = {
        "n_dim_rows": int(sum(s["n"] for s in smalls)),
        "dup_ids": (np.concatenate([s["dup_ids"] for s in smalls])
                    if smalls else np.empty(0, np.int64)),
        "counts": (np.sum([s["counts"] for s in smalls], axis=0)
                   if smalls else np.zeros(nlabels, np.int64)),
        "n_unknown": int(sum(s["n_unknown"] for s in smalls)),
        "masks": masks,
        "nonext_packed": np.packbits(
            np.concatenate([s["nonext"] for s in smalls])
            if smalls else np.empty(0, bool)),
    }
    tid = np.concatenate([t[0] for t in tp]) if tp else np.empty(0, np.int64)
    tconv = np.concatenate([t[1] for t in tp]) if tp else np.empty(0, np.int64)
    ttidx = np.concatenate([t[2] for t in tp]) if tp else np.empty(0, np.int32)
    return (ids, codes), (tid, tconv, ttidx), small


def _dim_state_sharded(dim_dir, turn_props_dir, nlabels, ent_code, req, forb,
                       node_cpu: int):
    """Shard-parallel replacement for the single `_dim_state_task`: the
    read+sort of the numeric dim was the validator's one remaining
    width-INDEPENDENT stage (a lone task capped at a quarter-node of
    threads — 1.5 s at sf0.4/32 cpus, ~4 s at 8 cpus where its slot
    shrinks to 2 threads, worse at larger sf). File-parallel readers
    split rows by the id's top bits; per-shard sorters run across the
    whole cluster; a memcpy concat emits the identical broadcast arrays.
    Same (label_ref, tprops_ref, small_ref) contract as the single task."""
    nd_files = _dim_files(dim_dir)
    tp_files = _dim_files(turn_props_dir)
    k = max(2, min(5, max(node_cpu, 2).bit_length() - 1))
    R = 1 << k

    def groups(files, g):
        g = max(1, min(g, len(files)))
        return [files[i::g] for i in range(g)]

    nd_parts = [
        _dim_read_shards.options(num_returns=R).remote(fs, k)
        for fs in groups(nd_files, 16)
    ]
    tp_parts = [
        _dim_read_shards.options(num_returns=R).remote(fs, k)
        for fs in groups(tp_files, 8)
    ]
    nd_sorted = [
        _ndim_sort_shard.remote(nlabels, ent_code, req, forb,
                                *[p[s] for p in nd_parts])
        for s in range(R)
    ]
    tp_sorted = [
        _tprops_sort_shard.remote(*[p[s] for p in tp_parts]) for s in range(R)
    ]
    return _dim_concat_task.remote(nlabels, R, *nd_sorted, *tp_sorted)


@ray.remote(num_returns=3)
def _dim_state_task(dim_dir, turn_props_dir, nlabels, ent_code, req, forb,
                    nthreads=4):
    """Side-written-dim fast path: read + sort the numeric dims and reduce
    every node-side check in ONE worker task. The two big returns (sorted
    probe arrays, sorted TURN props) land in plasma as task outputs — zero
    driver copies, zero driver sort time — and the read+sort itself is
    polars, multi-threaded inside the task's 4-cpu slot (measured 0.1–0.4 s
    vs 1.1 s numpy argsort+take at 7.3M rows). ``req``/``forb`` are the
    KeysValidator bit-matrices built on the DRIVER (runtime schema
    extensions registered there must win over the worker's module state);
    the driver decodes the returned OR-masks back to violation rows."""
    os.environ.setdefault("POLARS_MAX_THREADS", str(nthreads))  # task slot
    import polars as pl

    dim = pl.read_parquet(_dim_files(dim_dir)).sort("id")
    ids_sorted = np.ascontiguousarray(dim["id"].to_numpy())
    codes_sorted = np.ascontiguousarray(dim["code"].to_numpy())
    ext_sorted = np.ascontiguousarray(dim["ext"].to_numpy())
    tp = pl.read_parquet(_dim_files(turn_props_dir)).sort("id")
    n_dim_rows = len(ids_sorted)
    dup_ids = (
        np.unique(ids_sorted[1:][ids_sorted[1:] == ids_sorted[:-1]])
        if n_dim_rows > 1 else np.empty(0, np.int64)
    )
    counts = np.bincount(codes_sorted[codes_sorted >= 0], minlength=nlabels)
    n_unknown = int((codes_sorted < 0).sum())
    masks = None
    if "pmask" in dim.columns:  # bit-OR is order-free: sorted rows are fine
        # zero-violation fast path: compute each row's contribution without
        # boolean-filter copies (req/forb fancy-index is a tiny-table
        # gather), and only run the slow ufunc.at per-label attribution
        # when some row actually violates — a healthy graph pays one
        # .any() instead of 0.75 s of filtered copies at 7.3M rows
        pm = dim["pmask"].to_numpy().astype(np.uint16, copy=False)
        contrib_miss = req[codes_sorted] & ~pm
        contrib_over = forb[codes_sorted] & pm
        invalid = codes_sorted < 0
        if invalid.any():
            contrib_miss[invalid] = 0
            contrib_over[invalid] = 0
        miss_or = np.zeros(nlabels, dtype=np.uint16)
        over_or = np.zeros(nlabels, dtype=np.uint16)
        if contrib_miss.any():
            np.bitwise_or.at(miss_or, codes_sorted[~invalid].astype(np.int64),
                             contrib_miss[~invalid])
        if contrib_over.any():
            np.bitwise_or.at(over_or, codes_sorted[~invalid].astype(np.int64),
                             contrib_over[~invalid])
        masks = (miss_or, over_or)
    nonext_packed = np.packbits((codes_sorted == ent_code) & ~ext_sorted)
    small = {"n_dim_rows": n_dim_rows, "dup_ids": dup_ids, "counts": counts,
             "n_unknown": n_unknown, "masks": masks,
             "nonext_packed": nonext_packed}
    return (
        (ids_sorted, codes_sorted),
        (np.ascontiguousarray(tp["id"].to_numpy()),
         np.ascontiguousarray(tp["conv"].to_numpy()),
         np.ascontiguousarray(tp["tidx"].to_numpy())),
        small,
    )


def validate_graph(nodes, edges, num_partitions: int = 16,
                   broadcast_max_rows: int = BROADCAST_MAX_ROWS,
                   n_nodes: int | None = None,
                   dim_dir: str | list | None = None,
                   turn_props_dir: str | list | None = None,
                   numeric_edges_dir: str | None = None) -> pa.Table:
    """nodes, edges: ray Datasets → pyarrow Table of (check, detail) rows.

    ``n_nodes`` selects the execution path; pass it from parquet metadata
    (ledger row counts / ``pyarrow.dataset.count_rows``) when available —
    ``Dataset.count()`` on a column-pruned read of the materialize delta
    measured ~30 s at 7M nodes (a full decode of the union-schema files),
    pure waste for a path-selection scalar.

    ``nodes`` / ``edges`` may be zero-arg CALLABLES returning the Dataset:
    ``read_parquet`` over a many-part delta spends 1–2 s of driver-serial
    metadata time just CONSTRUCTING the Dataset (551 parts at sf0.4), and
    on the side-written-dim fast path the nodes table is only touched by
    exceptional branches — a thunk defers (usually: skips) that cost, and
    the edges construction runs inside the warm thread, overlapped with
    the driver's dim chain."""
    nodes_fn = _once(nodes if callable(nodes) else (lambda: nodes))
    edges_fn = edges if callable(edges) else (lambda: edges)
    if n_nodes is None:  # memoized: the broadcast path reuses this Dataset
        n_nodes = nodes_fn().count()
    if n_nodes <= broadcast_max_rows:
        return _validate_broadcast(nodes_fn, edges_fn, dim_dir,
                                   turn_props_dir, numeric_edges_dir)
    return _validate_sharded(nodes_fn(), edges_fn(), num_partitions)


def _once(fn):
    """Memoize a zero-arg thunk (the nodes Dataset is used by several
    exceptional branches; construct it at most once)."""
    cell: list = []

    def get():
        if not cell:
            cell.append(fn())
        return cell[0]

    return get


# ---------------------------------------------------------------------------
# broadcast fast path
# ---------------------------------------------------------------------------


def _validate_broadcast(nodes, edges_fn, dim_dir: str | list | None = None,
                        turn_props_dir: str | list | None = None,
                        numeric_edges_dir: str | None = None) -> pa.Table:
    import threading

    import pyarrow.compute as pc

    label_names, code_of_label = _label_codes()
    edge_labels = list(schema.EDGE_LABELS)  # captured: includes extensions
    _label_set = pa.array(edge_labels, pa.string())

    # ---- numeric edge stream, CONSTRUCTED and materialized CONCURRENTLY
    # with the driver's dim build below: the edge read/decode needs nothing
    # from the dim, and the dim argsort/put chain is the validator's
    # largest serial term — overlapping the two hides one behind the other
    # on both cluster widths. Dataset construction itself (read_parquet
    # metadata over a many-part delta, ~1 s driver-serial) lives in the
    # thread too, so the driver goes straight to the dim chain.
    def to_numeric(t: pa.Table) -> pa.Table:
        # arrow kernels end-to-end: index_in maps label→code without a
        # pandas object-string detour (measured 1.22 s vs 1.59 s for the
        # Categorical path over 27M edges at 32 cpus)
        lcode = pc.cast(
            pc.fill_null(pc.index_in(t["label"], value_set=_label_set), -1),
            pa.int16(),
        )
        return pa.table(
            {"src": pc.cast(t["src"], pa.int64()),
             "dst": pc.cast(t["dst"], pa.int64()),
             "lcode": lcode}
        )

    def _build_edge_input():
        if numeric_edges_dir is not None:
            from ray.data import read_parquet

            return read_parquet(numeric_edges_dir)
        return edges_fn().select_columns(["src", "dst", "label"]).map_batches(
            to_numeric, batch_format="pyarrow"
        )

    _edge_holder: dict = {}
    _t0 = time.perf_counter()
    # the side-written-dim FAST path runs the edge pipeline FUSED (read →
    # label decode → scan in one task, no mid-pipeline materialize): scan
    # tasks block inside get_broadcast until the dim task publishes the
    # probe arrays — Ray releases a worker's CPU while it waits in
    # ray.get, so the dim task schedules even on a tiny cluster — and the
    # read/decode half of every task overlaps the dim build for free.
    # Fallback paths keep the warm-thread materialize: their probe table
    # is built on the DRIVER between construction and scan.
    # TRUTHINESS, not is-not-None: callers build these as isdir-filtered
    # list comprehensions, and an empty list must take the fallback node
    # scan (normalized here so every downstream `is not None` agrees)
    dim_dir = dim_dir or None
    turn_props_dir = turn_props_dir or None
    fast = dim_dir is not None and turn_props_dir is not None

    def _warm_edges():
        try:
            _edge_holder["ds"] = _build_edge_input().materialize()
            _edge_holder["t"] = time.perf_counter() - _t0
        except Exception as e:  # surfaced after join
            _edge_holder["err"] = e

    _warm = None
    if not fast:
        _warm = threading.Thread(target=_warm_edges, daemon=True)
        _warm.start()

    def node_dim_batch(t: pd.DataFrame) -> pd.DataFrame:
        # categorical codes (C-level) — unknown labels → -1 like the old map
        code = pd.Categorical(t["label"], categories=label_names).codes.astype("int16")
        pm = np.zeros(len(t), dtype=np.uint16)
        for i, c in enumerate(schema.NODE_PROP_COLS):
            pm |= t[c].notna().to_numpy().astype(np.uint16) << i
        return pd.DataFrame(
            {"id": t["id"].astype("int64"), "code": code,
             "ext": t["is_external"].notna() & t["is_external"].astype(object).eq(True),
             "pmask": pm}
        )

    def turn_prop_batch(t: pd.DataFrame) -> pd.DataFrame:
        # TURN-only props for the CFG checks: filter in-task so only
        # turn-scale (id, conv hash, tidx) rows reach the driver — the
        # full-dim fetch stays 11 B/row
        from ..ids import hash_series

        t = t[t["label"] == schema.TURN]
        return pd.DataFrame(
            {"id": t["id"].astype("int64"),
             "conv": hash_series([t["conv_id"].fillna("")])
             if len(t) else np.empty(0, np.int64),
             "tidx": t["turn_idx"].fillna(-1).astype("int32")}
        )

    # The probe table is the (id, code) dim fetched UNSORTED and argsorted
    # ONCE. Measured alternatives at 7.3M/14.7M nodes, same box: Ray's
    # distributed sort("id") 13.3 s (sample + range-exchange barriers),
    # serial k-way run merge 6.8 s (and scaling-hostile), parallel
    # Ray-task merge tree 12.5 s (searchsorted merges are cache-miss-
    # bound, not O(n)) — vs np.argsort+take 1.2 s/2.3 s (introsort on
    # values). On the side-written-dim fast path the WHOLE chain (read →
    # argsort → reductions) runs in ONE Ray task whose big returns land in
    # plasma directly — off the driver's critical path, overlapped with
    # the edge-stream warm thread (was ~3.3 s driver-serial at sf0.4).
    # The fallback paths (no side dim: probe built from a full node scan)
    # keep the driver chain — they already pay a corpus scan anyway.
    ent_code = code_of_label.get(schema.ENTITY, -1)
    if fast:
        req, forb = _prop_masks(label_names)
        # cap the slot at the LARGEST SINGLE NODE's width, not the cluster
        # total: a num_cpus=4 request on a cluster of 2x2-cpu nodes (or a
        # 2-cpu test cluster) is infeasible and would hang forever
        try:
            node_cpu = max(
                (int(n["Resources"].get("CPU", 0))
                 for n in ray.nodes() if n.get("Alive")), default=1,
            )
        except Exception:
            node_cpu = int(ray.cluster_resources().get("CPU", 1))
        if os.environ.get("GRAFT_DIM_SINGLE"):
            # legacy A/B path: ONE multi-threaded read+sort task on a
            # quarter-node slot (the round-4 shape; width-independent)
            slot = max(1, min(8, node_cpu if node_cpu < 8 else node_cpu // 4))
            label_of, turn_props_ref, small_ref = _dim_state_task.options(
                num_cpus=slot
            ).remote(
                dim_dir, turn_props_dir, len(label_names), ent_code, req,
                forb, nthreads=slot)
        else:
            label_of, turn_props_ref, small_ref = _dim_state_sharded(
                dim_dir, turn_props_dir, len(label_names), ent_code, req,
                forb, node_cpu)
        # small_ref is fetched AFTER the scan pipeline launches (below):
        # nothing before the driver-side reductions needs it
    else:
        if dim_dir is not None:
            dim = _dim_dataset(dim_dir).to_table().to_pandas()
        else:
            dim = (
                nodes().select_columns(["id", "label", *schema.NODE_PROP_COLS])
                .map_batches(node_dim_batch, batch_format="pandas", batch_size=None)
                .to_pandas()
            )
        ids_u = dim["id"].to_numpy(np.int64)
        codes_u = dim["code"].to_numpy(np.int16)
        order = np.argsort(ids_u)
        ids_sorted = ids_u[order]
        codes_sorted = codes_u[order]
        ext_sorted = dim["ext"].to_numpy()[order]
        nonext = (codes_sorted == ent_code) & ~ext_sorted
        # TURN-subset property lookup (sorted ids ∥ conv hash ∥ turn_idx)
        # for the CFG checks — filtered in-task, sorted once
        if turn_props_dir is not None:
            tprops = _dim_dataset(turn_props_dir).to_table().to_pandas()
        else:
            tprops = (
                nodes().select_columns(["id", "label", "conv_id", "turn_idx"])
                .map_batches(turn_prop_batch, batch_format="pandas", batch_size=None)
                .to_pandas()
            )
        _to = np.argsort(tprops["id"].to_numpy(np.int64))
        turn_props_ref = ray.put(
            (tprops["id"].to_numpy(np.int64)[_to],
             tprops["conv"].to_numpy(np.int64)[_to],
             tprops["tidx"].to_numpy(np.int32)[_to])
        )
        n_dim_rows = len(ids_sorted)
        dup_ids = (
            np.unique(ids_sorted[1:][ids_sorted[1:] == ids_sorted[:-1]])
            if n_dim_rows > 1 else np.empty(0, np.int64)
        )
        counts = np.bincount(codes_sorted[codes_sorted >= 0],
                             minlength=len(label_names))
        n_unknown = int((codes_sorted < 0).sum())
        key_rows = (
            _prop_mask_viols(label_names, codes_u, dim["pmask"].to_numpy())
            if "pmask" in dim.columns else None
        )
        # broadcast lookup = (sorted int64 ids, int16 label codes): plasma-
        # zero-copy numpy arrays + np.searchsorted — 100× faster per batch
        # than a Series.map(dict) probe at 10^6+ nodes
        label_of = ray.put((ids_sorted, codes_sorted))

    def _node_side_viols(n_unknown, dup_ids, counts, key_rows) -> list:
        viols = [_EMPTY]
        if n_unknown:  # exceptional path: name the unknown labels
            bad = (
                nodes().select_columns(["label"])
                .map_batches(
                    lambda t: t.loc[~t["label"].isin(label_names), ["label"]].drop_duplicates(),
                    batch_format="pandas",
                )
                .to_pandas()["label"].drop_duplicates()
            )
            viols.append(_viol("unknown_node_label", bad))
        if len(dup_ids):
            viols.append(_viol("duplicate_node_id", dup_ids.astype(str)))
        if counts[code_of_label[schema.META_DATA]] != 1:
            viols.append(_viol("meta_data_count", ["expected exactly 1"]))
        # ---- KeysValidator analog: required/forbidden property keys -----
        # the side-written dim carries a per-node property-presence bitmask
        # (pmask); without one, a distributed bit-OR partial scan stands in
        if key_rows is None:
            key_rows = _keys_partial_scan(nodes(), label_names)
        if key_rows:
            kf = pd.DataFrame(key_rows, columns=["check", "detail"])
            for chk, grp in kf.groupby("check"):
                viols.append(_viol(chk, grp["detail"]))
        return viols

    if not fast:
        driver_viols = _node_side_viols(n_unknown, dup_ids, counts, key_rows)
        n_mentions = int(counts[code_of_label[schema.MENTION]])

    allowed = frozenset(schema.EDGE_FACTS)

    # ---- ONE edges scan does everything edge-side, NO shuffle -----------
    # Per batch: dangling + edge-fact checks, a REF-count partial, and the
    # degree-bound evidence. Every finite bound in the base schema is
    # max == 1, and "out-degree ≤ 1 for every src" ⟺ "edge count ==
    # distinct-src count": each batch emits the POSITIONS (indexes into
    # the sorted broadcast dim) of its bounded edges' srcs as one packed
    # binary cell per (src_label, edge_label); the driver ORs them into a
    # bitmap and compares popcount to the total. That replaced the
    # (src,lcode) degree-partial shuffle — measured ~6M shuffled rows and
    # most of the validator's residual wall at sf0.4. Extension-registered
    # bounds with max > 1 (rare) fall back to per-batch partial counts
    # reduced on the driver — still shuffle-free; the driver already holds
    # a dim of this scale on the broadcast path by definition.
    bound_mat = _bound_matrix(code_of_label)
    bounds_mat_ref = ray.put(bound_mat)
    has_multi = bool(np.isfinite(bound_mat[bound_mat > 1]).any())
    in_facts, _ = _in_fact_codes(code_of_label)
    # static fact lists captured by the closure (tiny) — one mask per fact
    edge_code = {name: i for i, name in enumerate(edge_labels)}
    deg1_facts = tuple(
        (code_of_label[sl], edge_code[el])
        for (sl, el), (_mn, mx) in schema.OUT_DEGREE_FACTS.items()
        if mx == 1
    )
    ideg_facts = tuple(in_facts)
    # extension facts with max > 1: the total-vs-distinct bound is only
    # exact for mx==1 (one node at mx+1 can hide behind nodes below the
    # bound), so these ship per-batch (dst, count) partials reduced to
    # exact per-node totals on the driver — same shape as _degN
    ideg_n_facts = tuple(
        (dc, lc) for (dc, lc), (_mn, mx) in in_facts.items()
        if mx is not None and mx > 1
    )
    ideg_n_set = frozenset(ideg_n_facts)
    nt_code = edge_labels.index(schema.NEXT_TURN) if schema.NEXT_TURN in edge_labels else -1
    ref_code = edge_labels.index(schema.REF) if schema.REF in edge_labels else -1

    def edge_scan(t: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(label_of)
        ids_s, codes_s = table
        names = label_names
        src_v = t["src"].to_numpy(np.int64)
        dst_v = t["dst"].to_numpy(np.int64)
        if len(ids_s):
            pos_src = np.clip(_probe_sorted(ids_s, src_v), 0, len(ids_s) - 1)
            src_c = np.where(ids_s[pos_src] == src_v, codes_s[pos_src], -1)
            pos_dst = np.clip(_probe_sorted(ids_s, dst_v), 0, len(ids_s) - 1)
            dst_c = np.where(ids_s[pos_dst] == dst_v, codes_s[pos_dst], -1)
        else:
            pos_src = np.zeros(len(t), dtype=np.int64)
            src_c = np.full(len(t), -1, dtype=np.int16)
            pos_dst = np.zeros(len(t), dtype=np.int64)
            dst_c = np.full(len(t), -1, dtype=np.int16)
        lcode = t["lcode"].to_numpy(np.int16)
        viols = []
        dangling = (src_c < 0) | (dst_c < 0)
        if dangling.any():
            labs = pd.Series(
                [edge_labels[c] if c >= 0 else "?"
                 for c in np.unique(lcode[dangling])]
            )
            viols.append(_viol("dangling_edge", labs))
        ok = ~dangling
        combos = pd.DataFrame(
            {"s": src_c[ok], "l": lcode[ok], "d": dst_c[ok]}
        ).drop_duplicates()
        bad = [
            f"{names[s]}-{edge_labels[l] if l >= 0 else '?'}->{names[d]}"
            for s, l, d in combos.itertuples(index=False)
            if l < 0 or (names[s], edge_labels[l], names[d]) not in allowed
        ]
        if bad:
            viols.append(_viol("edge_fact", bad))
        viols.append(_viol("_ref_partial", [str(int((lcode == ref_code).sum()))]))
        out = pd.concat(viols, ignore_index=True)
        out["scode"] = np.int16(-1)
        out["lcode"] = np.int16(-1)
        out["n"] = np.int64(0)
        out["pos"] = pd.Series([None] * len(out), dtype="object")
        frames = [out]
        bm = get_broadcast(bounds_mat_ref)
        valid = (src_c >= 0) & (lcode >= 0)
        lim = np.where(valid, bm[np.clip(src_c, 0, None), np.clip(lcode, 0, None)], np.inf)
        # the bounded fact set is tiny and STATIC — one boolean mask per
        # fact beats a per-batch argsort+unique over all bounded edges
        # (measured: the generic key-sort packing was the dominant
        # edge-scan cost once the in-degree facts doubled the blob volume)
        blobs, scs, lcs, ns = [], [], [], []
        for sc, lc in deg1_facts:
            m1 = valid & (src_c == sc) & (lcode == lc)
            if m1.any():
                # blob = per-batch UNIQUE positions (n keeps the raw count
                # for the total-vs-distinct bound): a hot node repeating in
                # one batch ships once — the REF->ENTITY dst blob shrinks
                # ~(mentions per entity)x
                blobs.append(np.unique(pos_src[m1]).astype("<i4").tobytes())
                scs.append(np.int16(sc))
                lcs.append(np.int16(lc))
                ns.append(np.int64(int(m1.sum())))
        if blobs:
            frames.append(pd.DataFrame(
                {"check": pd.Series(["_deg1"] * len(blobs), dtype="string"),
                 "detail": pd.Series([None] * len(blobs), dtype="string"),
                 "scode": scs, "lcode": lcs, "n": ns,
                 "pos": pd.Series(blobs, dtype="object")}
            ))
        if has_multi:
            bn = valid & np.isfinite(lim) & (lim > 1)
            if bn.any():
                deg = (
                    pd.DataFrame({"srcp": pos_src[bn].astype(np.int64),
                                  "scode": src_c[bn].astype(np.int16),
                                  "lcode": lcode[bn].astype(np.int16)})
                    .groupby(["srcp", "scode", "lcode"], as_index=False)
                    .size()
                )
                frames.append(pd.DataFrame(
                    {"check": pd.Series(["_degN"] * len(deg), dtype="string"),
                     "detail": pd.Series(deg["srcp"].astype(str), dtype="string"),
                     "scode": deg["scode"], "lcode": deg["lcode"],
                     "n": deg["size"].astype(np.int64),
                     "pos": pd.Series([None] * len(deg), dtype="object")}
                ))

        # ---- in-degree evidence: dst POSITIONS per declared in-fact ------
        iblobs, idcs, ilcs, ins_ = [], [], [], []
        for dc, lc in ideg_facts:
            m2 = (dst_c == dc) & (lcode == lc)
            if m2.any():
                iblobs.append(np.unique(pos_dst[m2]).astype("<i4").tobytes())
                idcs.append(np.int16(dc))
                ilcs.append(np.int16(lc))
                ins_.append(np.int64(int(m2.sum())))
        if iblobs:
            frames.append(pd.DataFrame(
                {"check": pd.Series(["_ideg"] * len(iblobs), dtype="string"),
                 "detail": pd.Series([None] * len(iblobs), dtype="string"),
                 "scode": idcs, "lcode": ilcs, "n": ins_,
                 "pos": pd.Series(iblobs, dtype="object")}
            ))
        for dc, lc in ideg_n_facts:
            m3 = (dst_c == dc) & (lcode == lc)
            if m3.any():
                degi = (
                    pd.DataFrame({"p": pos_dst[m3].astype(np.int64)})
                    .groupby("p", as_index=False).size()
                )
                frames.append(pd.DataFrame(
                    {"check": pd.Series(["_idegN"] * len(degi), dtype="string"),
                     "detail": pd.Series(degi["p"].astype(str), dtype="string"),
                     "scode": np.full(len(degi), dc, np.int16),
                     "lcode": np.full(len(degi), lc, np.int16),
                     "n": degi["size"].astype(np.int64),
                     "pos": pd.Series([None] * len(degi), dtype="object")}
                ))

        # ---- CFG sanity on NEXT_TURN (NoLongJumpValidator analog) --------
        ntm = lcode == nt_code
        if nt_code >= 0 and ntm.any():
            tids, tconv, ttidx = get_broadcast(turn_props_ref)
            if len(tids):
                sv, dvv = src_v[ntm], dst_v[ntm]
                ps = np.clip(_probe_sorted(tids, sv), 0, len(tids) - 1)
                pdd = np.clip(_probe_sorted(tids, dvv), 0, len(tids) - 1)
                okb = (tids[ps] == sv) & (tids[pdd] == dvv)
                cross = okb & (tconv[ps] != tconv[pdd])
                mono = (
                    okb & (ttidx[ps] >= 0) & (ttidx[pdd] >= 0)
                    & (ttidx[pdd] <= ttidx[ps])
                )
                cfg = []
                if cross.any():
                    cfg.append(_viol(
                        "cfg_cross_conversation",
                        [f"{int(cross.sum())} NEXT_TURN edges"],
                    ))
                if mono.any():
                    cfg.append(_viol(
                        "cfg_nonmonotonic",
                        [f"{int(mono.sum())} NEXT_TURN edges"],
                    ))
                for v in cfg:
                    v = v.copy()
                    v["scode"] = np.int16(-1)
                    v["lcode"] = np.int16(-1)
                    v["n"] = np.int64(0)
                    v["pos"] = pd.Series([None] * len(v), dtype="object")
                    frames.append(v)
        return pd.concat(frames, ignore_index=True)

    if fast:
        # launch the fused scan FIRST (its tasks self-synchronize on the
        # dim task via get_broadcast), then do the driver's node-side work
        # while it runs — nothing here serializes against the scan
        def _consume():
            try:
                _edge_holder["res"] = (
                    _build_edge_input()
                    .map_batches(edge_scan, batch_format="pandas")
                    .to_pandas()
                )
                _edge_holder["t"] = time.perf_counter() - _t0
            except Exception as e:  # surfaced after join
                _edge_holder["err"] = e

        _consumer = threading.Thread(target=_consume, daemon=True)
        _consumer.start()
        try:
            small = ray.get(small_ref)
            n_dim_rows = small["n_dim_rows"]
            counts = small["counts"]
            key_rows = (_decode_mask_viols(label_names, *small["masks"])
                        if small["masks"] is not None else None)
            nonext = np.unpackbits(
                small["nonext_packed"], count=n_dim_rows).astype(bool)
            driver_viols = _node_side_viols(
                small["n_unknown"], small["dup_ids"], counts, key_rows)
            n_mentions = int(counts[code_of_label[schema.MENTION]])
            _t_dim = time.perf_counter() - _t0
        finally:
            # never leave the scan running past an exception: if the dim
            # task failed, the scan's own broadcast gets fail fast too,
            # so this join is bounded either way
            _consumer.join()
        if "err" in _edge_holder:
            raise _edge_holder["err"]
        _t_warm = -1.0  # fast path has no separate materialize step
        edge_results = _edge_holder["res"]
    else:
        _t_dim = time.perf_counter() - _t0
        _warm.join()
        if "err" in _edge_holder:
            raise _edge_holder["err"]
        _t_warm = time.perf_counter() - _t0
        edge_results = (
            _edge_holder["ds"].map_batches(edge_scan, batch_format="pandas").to_pandas()
        )
    _t_scan = time.perf_counter() - _t0

    ref_rows = edge_results["check"] == "_ref_partial"
    n_refs = edge_results.loc[ref_rows, "detail"].astype(int).sum()

    deg1 = edge_results[edge_results["check"] == "_deg1"]
    for (sc, lc), grp in deg1.groupby(["scode", "lcode"]):
        total = int(grp["n"].sum())
        bitmap = np.zeros(max(n_dim_rows, 1), dtype=bool)
        for blob in grp["pos"]:
            bitmap[np.frombuffer(blob, dtype="<i4")] = True
        distinct = int(bitmap.sum())
        if total > distinct:
            driver_viols.append(_viol(
                "out_degree_exceeded",
                [f"{label_names[int(sc)]}:{edge_labels[int(lc)]}"
                 f" n={total} distinct_src={distinct}"],
            ))
    degn = edge_results[edge_results["check"] == "_degN"]
    if len(degn):
        agg = degn.groupby(["detail", "scode", "lcode"], as_index=False)["n"].sum()
        lim = bound_mat[agg["scode"].to_numpy(np.int64),
                        agg["lcode"].to_numpy(np.int64)]
        over = agg[agg["n"].to_numpy() > lim]
        if len(over):
            driver_viols.append(_viol(
                "out_degree_exceeded",
                [f"{label_names[int(s)]}:{edge_labels[int(l)]}={n}"
                 for s, l, n in zip(over["scode"], over["lcode"], over["n"])],
            ))

    # ---- in-degree facts: totals + distinct-dst bitmaps per fact --------
    # (mx>1 extension facts reduce exact per-node sums from _idegN instead:
    # the aggregate total-vs-distinct bound is only exact for mx==1)
    ideg = edge_results[edge_results["check"] == "_ideg"]
    idegn = edge_results[edge_results["check"] == "_idegN"]
    idegn_sums = (
        idegn.groupby(["detail", "scode", "lcode"], as_index=False)["n"].sum()
        if len(idegn) else None
    )
    ent_code = code_of_label.get(schema.ENTITY, -1)
    ref_lcode = edge_labels.index(schema.REF) if schema.REF in edge_labels else -1
    grouped = {k: g for k, g in ideg.groupby(["scode", "lcode"])} if len(ideg) else {}
    for (dc, lc), (mn, mx) in _in_fact_codes(code_of_label)[0].items():
        grp = grouped.get((np.int16(dc), np.int16(lc)))
        bitmap = np.zeros(max(n_dim_rows, 1), dtype=bool)
        total = 0
        if grp is not None:
            total = int(grp["n"].sum())
            for blob in grp["pos"]:
                bitmap[np.frombuffer(blob, dtype="<i4")] = True
        distinct = int(bitmap.sum())
        if mx is not None and (dc, lc) in ideg_n_set:
            n_over = 0
            if idegn_sums is not None:
                sub = idegn_sums[(idegn_sums["scode"] == dc)
                                 & (idegn_sums["lcode"] == lc)]
                n_over = int((sub["n"].to_numpy() > mx).sum())
            if n_over:
                driver_viols.append(_viol(
                    "in_degree_exceeded",
                    [f"{label_names[dc]}<-{edge_labels[lc]}"
                     f" nodes_over_max={n_over}"],
                ))
        elif mx is not None and total > distinct * mx:
            driver_viols.append(_viol(
                "in_degree_exceeded",
                [f"{label_names[dc]}<-{edge_labels[lc]}"
                 f" n={total} distinct_dst={distinct}"],
            ))
        if mn >= 1:
            n_label = int(counts[dc])
            if distinct < n_label:
                driver_viols.append(_viol(
                    "in_degree_missing",
                    [f"{label_names[dc]}<-{edge_labels[lc]}"
                     f" missing={n_label - distinct}"],
                ))
        if dc == ent_code and lc == ref_lcode:
            # conditional InFact: non-external ENTITY needs ≥1 incoming REF
            miss = int((nonext & ~bitmap[:n_dim_rows]).sum()) if n_dim_rows else 0
            if miss:
                driver_viols.append(_viol(
                    "entity_ref_missing", [f"missing={miss}"]
                ))

    edge_results = edge_results[
        ~ref_rows & ~edge_results["check"].isin(["_deg1", "_degN", "_ideg", "_idegN"])
    ][["check", "detail"]].drop_duplicates()
    if n_refs != n_mentions:  # every MENTION has exactly one REF out-edge
        driver_viols.append(
            _viol("mention_ref_count", [f"mentions={n_mentions} refs={n_refs}"])
        )

    if os.environ.get("GRAFT_VALIDATE_TIMING"):
        import sys as _sys
        if fast:  # fused path: one pipeline, no separate materialize
            print(f"[validate] dim_get={_t_dim:.2f}s scan_done={_t_scan:.2f}s "
                  f"reduce={time.perf_counter() - _t0 - _t_scan:.2f}s",
                  file=_sys.stderr)
        else:
            print(f"[validate] dim_chain={_t_dim:.2f}s "
                  f"edge_mat={_edge_holder.get('t', -1):.2f}s "
                  f"joined_at={_t_warm:.2f}s scan_done={_t_scan:.2f}s "
                  f"reduce={time.perf_counter() - _t0 - _t_scan:.2f}s",
                  file=_sys.stderr)
    driver_df = pd.concat(driver_viols + [edge_results], ignore_index=True)
    return pa.Table.from_pandas(
        driver_df.reset_index(drop=True), schema=VIOLATIONS_SCHEMA, preserve_index=False
    ).replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# sharded path — no corpus-scale driver materialization
# ---------------------------------------------------------------------------


def _validate_sharded(nodes, edges, num_partitions: int) -> pa.Table:
    """Join-based validation for dims beyond the broadcast budget.

    * node checks: one id-bucketed shuffle over the (id, code) dim —
      duplicate ids detected in-bucket; label counts (META_DATA /
      MENTION) are tiny numeric partials.
    * edge checks: shuffle 1 co-groups edges with the dim by SRC id
      (dangling-src, full out-degree bounds — every out-edge of a node
      co-locates); its output co-groups with the dim by DST id in
      shuffle 2 (dangling-dst + edge-fact checks + REF counting).
    """
    from ..functions.agg import hash_groupby

    label_names, code_of_label = _label_codes()
    edge_labels = list(schema.EDGE_LABELS)  # captured: includes extensions
    allowed_codes = frozenset(
        (code_of_label[s], el, code_of_label[d]) for s, el, d in schema.EDGE_FACTS
    )
    bound_mat = _bound_matrix(code_of_label)
    bm_ref = ray.put(bound_mat)
    allowed_ref = ray.put(allowed_codes)
    in_facts, _in_coll = _in_fact_codes(code_of_label)
    in_facts_ref = ray.put(in_facts)
    turn_code = code_of_label[schema.TURN]
    nt_code = edge_labels.index(schema.NEXT_TURN) if schema.NEXT_TURN in edge_labels else -1
    ent_code = code_of_label.get(schema.ENTITY, -1)
    ref_lcode = edge_labels.index(schema.REF) if schema.REF in edge_labels else -1

    def node_dim_batch(t: pd.DataFrame) -> pd.DataFrame:
        from ..ids import hash_series

        code = t["label"].map(code_of_label).fillna(-1).astype("int16")
        is_turn = (code == turn_code).to_numpy()
        conv = np.zeros(len(t), np.int64)
        if is_turn.any():
            conv[is_turn] = hash_series([t.loc[is_turn, "conv_id"].fillna("")])
        pm = np.zeros(len(t), dtype=np.uint16)
        for i, c in enumerate(schema.NODE_PROP_COLS):
            pm |= t[c].notna().to_numpy().astype(np.uint16) << i
        out = pd.DataFrame(
            {"id": t["id"].astype("int64"), "code": code, "conv": conv,
             "tidx": t["turn_idx"].fillna(-1).astype("int32"),
             "ext": t["is_external"].notna() & t["is_external"].astype(object).eq(True),
             "pmask": pm}
        )
        return out

    dim = nodes.select_columns(
        ["id", "label", *schema.NODE_PROP_COLS]
    ).map_batches(node_dim_batch, batch_format="pandas").materialize()

    # ---- node-side: duplicate ids (bucketed) + label counts (partials) --
    def dup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dups = g.loc[g["id"].duplicated(keep="first"), "id"].drop_duplicates()
        return _viol("duplicate_node_id", dups.astype(str))

    dup_viols = hash_groupby(dim, "id", dup_bucket, num_buckets=num_partitions).to_pandas()
    if not len(dup_viols) or "check" not in dup_viols.columns:
        dup_viols = _EMPTY

    def count_partial(t: pd.DataFrame) -> pd.DataFrame:
        vc = t["code"].value_counts()
        return pd.DataFrame({"code": vc.index.to_numpy(np.int16),
                             "n": vc.to_numpy(np.int64)})

    code_counts = (
        dim.map_batches(count_partial, batch_format="pandas")
        .to_pandas().groupby("code", as_index=False)["n"].sum()
    )
    counts = dict(zip(code_counts["code"], code_counts["n"]))
    driver_viols = [_EMPTY, dup_viols]
    if counts.get(-1, 0):
        driver_viols.append(_viol("unknown_node_label", [f"{counts[-1]} nodes"]))
    if counts.get(code_of_label[schema.META_DATA], 0) != 1:
        driver_viols.append(_viol("meta_data_count", ["expected exactly 1"]))
    n_mentions = int(counts.get(code_of_label[schema.MENTION], 0))

    # ---- KeysValidator analog over the numeric dim (bit-OR partials) ----
    key_rows = _keys_partial_scan(dim, label_names, precoded=True)
    if key_rows:
        kf = pd.DataFrame(key_rows, columns=["check", "detail"])
        for chk, grp in kf.groupby("check"):
            driver_viols.append(_viol(chk, grp["detail"]))

    # ---- edge-side shuffle 1: key = src -------------------------------
    def edge_rows(t: pd.DataFrame) -> pd.DataFrame:
        lcode = pd.Categorical(t["label"], categories=edge_labels).codes
        return pd.DataFrame(
            {"key": t["src"].astype("int64").to_numpy(),
             "other": t["dst"].astype("int64").to_numpy(),
             "lcode": lcode.astype("int16"),
             "code": np.full(len(t), -1, dtype=np.int16),
             "conv": np.zeros(len(t), dtype=np.int64),
             "tidx": np.full(len(t), -1, dtype=np.int32),
             "is_dim": np.zeros(len(t), dtype=bool)}
        )

    def dim_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": t["id"].to_numpy(np.int64),
             "other": np.full(len(t), -1, dtype=np.int64),
             "lcode": np.full(len(t), -1, dtype=np.int16),
             "code": t["code"].to_numpy(np.int16),
             "conv": t["conv"].to_numpy(np.int64),
             "tidx": t["tidx"].to_numpy(np.int32),
             "is_dim": np.ones(len(t), dtype=bool)}
        )

    tagged_a = edges.select_columns(["src", "dst", "label"]).map_batches(
        edge_rows, batch_format="pandas"
    ).union(dim.map_batches(dim_rows, batch_format="pandas"))

    B_COLS = ["check", "detail", "key", "src_code", "lcode", "code",
              "sconv", "stidx", "ext", "is_dim"]

    def bucket_a(g: pd.DataFrame) -> pd.DataFrame:
        bm = get_broadcast(bm_ref)
        dims = g[g["is_dim"]].drop_duplicates("key")[["key", "code", "conv", "tidx"]]
        e = g[~g["is_dim"]]
        out = []
        if len(e):
            m = e.merge(dims, on="key", how="left", suffixes=("", "_n"))
            src_code = m["code_n"].fillna(-1).astype(np.int16).to_numpy()
            dang = src_code < 0
            viols = []
            if dang.any():
                labs = pd.Series([edge_labels[c] for c in m.loc[dang, "lcode"]])
                viols.append(_viol("dangling_edge", labs.drop_duplicates()))
            # degree bounds: ALL out-edges of every src in this bucket
            deg = m.groupby(["key", "lcode"], as_index=False).size()
            dm = deg.merge(dims, on="key", how="left")
            sc = dm["code"].fillna(-1).astype(np.int64).to_numpy()
            lc = dm["lcode"].to_numpy(np.int64)
            lim = np.where(sc >= 0, bm[np.clip(sc, 0, None), lc], np.inf)
            over = dm["size"].to_numpy() > lim
            if over.any():
                sel = dm[over]
                viols.append(
                    _viol(
                        "out_degree_exceeded",
                        [
                            f"{label_names[int(s)] if s >= 0 else None}:"
                            f"{edge_labels[int(l)]}={n}"
                            for s, l, n in zip(sc[over], sel["lcode"], sel["size"])
                        ],
                    )
                )
            for v in viols:
                v2 = v.copy()
                v2["key"] = np.int64(-1)
                v2["src_code"] = np.int16(-1)
                v2["lcode"] = np.int16(-1)
                v2["code"] = np.int16(-1)
                v2["sconv"] = np.int64(0)
                v2["stidx"] = np.int32(-1)
                v2["ext"] = False
                v2["is_dim"] = False
                out.append(v2[B_COLS])
            # forward edge rows keyed by DST for shuffle 2, carrying the
            # SRC node's properties (conv hash + turn_idx) for CFG checks
            fwd = pd.DataFrame(
                {"check": pd.Series([None] * len(m), dtype="string"),
                 "detail": pd.Series([None] * len(m), dtype="string"),
                 "key": m["other"].to_numpy(np.int64),
                 "src_code": src_code,
                 "lcode": m["lcode"].to_numpy(np.int16),
                 "code": np.full(len(m), -1, dtype=np.int16),
                 "sconv": m["conv_n"].fillna(0).astype("int64").to_numpy(),
                 "stidx": m["tidx_n"].fillna(-1).astype("int32").to_numpy(),
                 "ext": np.zeros(len(m), dtype=bool),
                 "is_dim": np.zeros(len(m), dtype=bool)}
            )
            out.append(fwd)
        if not out:
            return pd.DataFrame(
                {"check": pd.Series([], dtype="string"),
                 "detail": pd.Series([], dtype="string"),
                 "key": pd.Series([], dtype="int64"),
                 "src_code": pd.Series([], dtype="int16"),
                 "lcode": pd.Series([], dtype="int16"),
                 "code": pd.Series([], dtype="int16"),
                 "sconv": pd.Series([], dtype="int64"),
                 "stidx": pd.Series([], dtype="int32"),
                 "ext": pd.Series([], dtype="bool"),
                 "is_dim": pd.Series([], dtype="bool")}
            )
        return pd.concat(out, ignore_index=True)

    stage_a = hash_groupby(tagged_a, "key", bucket_a, num_buckets=num_partitions)

    def dim_rows_b(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"check": pd.Series([None] * len(t), dtype="string"),
             "detail": pd.Series([None] * len(t), dtype="string"),
             "key": t["id"].to_numpy(np.int64),
             "src_code": np.full(len(t), -1, dtype=np.int16),
             "lcode": np.full(len(t), -1, dtype=np.int16),
             "code": t["code"].to_numpy(np.int16),
             "sconv": t["conv"].to_numpy(np.int64),
             "stidx": t["tidx"].to_numpy(np.int32),
             "ext": t["ext"].to_numpy(),
             "is_dim": np.ones(len(t), dtype=bool)}
        )

    tagged_b = stage_a.union(dim.map_batches(dim_rows_b, batch_format="pandas"))

    ref_code = edge_labels.index(schema.REF)

    def bucket_b(g: pd.DataFrame) -> pd.DataFrame:
        allowed = get_broadcast(allowed_ref)
        ifacts = get_broadcast(in_facts_ref)
        passthrough = g[g["check"].notna()][["check", "detail"]]
        # dim rows carry their OWN props in the sconv/stidx/ext slots
        dims = g[g["is_dim"] & g["check"].isna()].drop_duplicates("key")[
            ["key", "code", "sconv", "stidx", "ext"]
        ].rename(columns={"sconv": "dconv", "stidx": "dtidx"})
        e = g[~g["is_dim"] & g["check"].isna()]
        out = [passthrough]
        m = None
        if len(e):
            m = e.drop(columns=["code", "ext"]).merge(dims, on="key", how="left")
            dst_code = m["code"].fillna(-1).astype(np.int16).to_numpy()
            dang = dst_code < 0
            if dang.any():
                labs = pd.Series([edge_labels[c] for c in m.loc[dang, "lcode"]])
                out.append(_viol("dangling_edge", labs.drop_duplicates()))
            ok = (~dang) & (m["src_code"].to_numpy() >= 0)
            combos = pd.DataFrame(
                {"s": m["src_code"].to_numpy()[ok], "l": m["lcode"].to_numpy()[ok],
                 "d": dst_code[ok]}
            ).drop_duplicates()
            bad = [
                f"{label_names[s]}-{edge_labels[l]}->{label_names[d]}"
                for s, l, d in combos.itertuples(index=False)
                if (s, edge_labels[l], d) not in allowed
            ]
            if bad:
                out.append(_viol("edge_fact", bad))
            n_ref = int((m["lcode"].to_numpy() == ref_code).sum())
            out.append(_viol("_ref_partial", [str(n_ref)]))

            # CFG sanity: NEXT_TURN must stay inside one conversation and
            # move strictly forward — src props rode along from shuffle 1
            if nt_code >= 0:
                lc_v = m["lcode"].to_numpy()
                ntm = (
                    (lc_v == nt_code)
                    & (m["src_code"].to_numpy() == turn_code)
                    & (dst_code == turn_code)
                )
                if ntm.any():
                    sc_v = m["sconv"].to_numpy(np.int64)[ntm]
                    dc_v = m["dconv"].fillna(0).astype("int64").to_numpy()[ntm]
                    st_v = m["stidx"].to_numpy()[ntm]
                    dt_v = m["dtidx"].fillna(-1).astype("int32").to_numpy()[ntm]
                    cross = sc_v != dc_v
                    mono = (st_v >= 0) & (dt_v >= 0) & (dt_v <= st_v)
                    if cross.any():
                        out.append(_viol(
                            "cfg_cross_conversation",
                            [f"{int(cross.sum())} NEXT_TURN edges"],
                        ))
                    if mono.any():
                        out.append(_viol(
                            "cfg_nonmonotonic",
                            [f"{int(mono.sum())} NEXT_TURN edges"],
                        ))

        # in-degree facts: every in-edge of a node co-locates with its dim
        # row here, so bounds AND zero-in-edge minima are decidable in-bucket
        if len(dims):
            if m is not None and len(m):
                ideg = (
                    pd.DataFrame({"key": m["key"].to_numpy(np.int64),
                                  "lcode": m["lcode"].to_numpy(np.int16),
                                  "code": dst_code})
                    .groupby(["key", "lcode", "code"], as_index=False).size()
                )
            else:
                ideg = pd.DataFrame({"key": pd.Series(dtype="int64"),
                                     "lcode": pd.Series(dtype="int16"),
                                     "code": pd.Series(dtype="int16"),
                                     "size": pd.Series(dtype="int64")})
            for (dc, lc), (mn, mx) in ifacts.items():
                sub = ideg[(ideg["code"] == dc) & (ideg["lcode"] == lc)]
                if mx is not None and (sub["size"].to_numpy() > mx).any():
                    n_over = int((sub["size"].to_numpy() > mx).sum())
                    out.append(_viol(
                        "in_degree_exceeded",
                        [f"{label_names[dc]}<-{edge_labels[lc]} nodes={n_over}"],
                    ))
                if mn >= 1:
                    have = sub["key"]
                    missing = int(
                        (~dims.loc[dims["code"] == dc, "key"].isin(have)).sum()
                    )
                    if missing:
                        out.append(_viol(
                            "_in_missing", [f"{dc}:{lc}:{missing}"]
                        ))
            # conditional: non-external ENTITY needs ≥1 incoming REF
            if ent_code >= 0 and ref_lcode >= 0:
                ents = dims[(dims["code"] == ent_code) & (~dims["ext"].astype(bool))]
                if len(ents):
                    have = ideg.loc[ideg["lcode"] == ref_lcode, "key"]
                    miss = int((~ents["key"].isin(have)).sum())
                    if miss:
                        out.append(_viol("_entity_ref", [str(miss)]))
        return pd.concat(out, ignore_index=True)

    edge_results = hash_groupby(
        tagged_b, "key", bucket_b, num_buckets=num_partitions
    ).to_pandas()
    if not len(edge_results) or "check" not in edge_results.columns:
        edge_results = _EMPTY
    ref_rows = edge_results["check"] == "_ref_partial"
    n_refs = edge_results.loc[ref_rows, "detail"].astype(int).sum()
    # in-degree minimum partials: per-bucket missing counts → one violation
    inm_rows = edge_results["check"] == "_in_missing"
    if inm_rows.any():
        parts = edge_results.loc[inm_rows, "detail"].str.split(":", expand=True)
        parts.columns = ["dc", "lc", "miss"]
        agg = parts.astype({"dc": int, "lc": int, "miss": int}).groupby(
            ["dc", "lc"], as_index=False
        )["miss"].sum()
        for dc, lc, miss in agg.itertuples(index=False):
            driver_viols.append(_viol(
                "in_degree_missing",
                [f"{label_names[dc]}<-{edge_labels[lc]} missing={miss}"],
            ))
    er_rows = edge_results["check"] == "_entity_ref"
    if er_rows.any():
        miss = edge_results.loc[er_rows, "detail"].astype(int).sum()
        driver_viols.append(_viol("entity_ref_missing", [f"missing={miss}"]))
    edge_results = edge_results[~ref_rows & ~inm_rows & ~er_rows].drop_duplicates()
    if n_refs != n_mentions:
        driver_viols.append(
            _viol("mention_ref_count", [f"mentions={n_mentions} refs={n_refs}"])
        )
    driver_df = pd.concat(driver_viols + [edge_results], ignore_index=True)
    return pa.Table.from_pandas(
        driver_df.reset_index(drop=True), schema=VIOLATIONS_SCHEMA, preserve_index=False
    ).replace_schema_metadata(None)
