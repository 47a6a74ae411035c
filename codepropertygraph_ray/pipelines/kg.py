"""The flagship pipeline: transcripts → knowledge graph (nodes/edges/triples).

Ray-Data transposition of the reference's build lifecycle (SURVEY.md §3.4):

    read_parquet(transcripts)                       # S1 loader analog
      → stable (conv_id, turn_idx) order            # per-row invariant:
        (stable per-batch sort; see run_base)       #   order-as-data
      → extraction (stateless, process-cached)      # F3/F4 base construction
      → entities pass (FUSED): entity dimension     # F7/F8 TypeNodePass +
        + alias pairs + union-find canonical map    #   O14/NodeFilter analog
      → link pass (FUSED): broadcast canon probe    # O5/O10 Linker/CallLinker
        + dual-keyed exchange in ONE execution      #   + NodeFilter dedup +
        → triples ∥ reaching ∥ linked-canons        #   ReachingDefPass analog
      → materialize nodes/edges (+ per-conv passes) # S8 + F5 CfgCreationPass
      → schema-facts validation                     # cpgvalidator analog

Each step is an overlay pass (numbered parquet delta dir + ledger,
`ProtoCpgLoader.scala:57-75` semantics) so the job is resumable per pass and
every delta carries per-file row-count metrics (lineage). Round-2 fusions
cut the pass count 7→5 and the Ray executions ~12→7: the fixed per-barrier
latency was the dominant term in the measured 8→32-cpu scaling gap. The
dominator/CDG overlay (closed-form interval-DAG evaluation) and the
NEXT_TURN build share one conv-keyed exchange inside materialize's single
partitioned-write execution.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from .. import ids, schema
from ..functions.agg import empty_safe as _empty_safe
from ..functions.cc import canonical_map
from ..sources.transcripts import ensure_transcripts
from .passes import Pass, PassContext, PipelineRunner

DEFAULT_PARAMS = {
    "num_partitions": 16,  # hash-join/shuffle width
    "cc_distributed": None,  # None = auto by edge count
    "validate_broadcast_max_rows": None,  # None = stages/validate default
    "num_buckets": None,  # corpus-keyed exchange width; None = byte-scaled
}


def _p(ctx: PassContext, key: str):
    return ctx.params.get(key, DEFAULT_PARAMS[key])


# lazily-decorated remote handles (ray is imported inside functions here)
_REMOTE_HANDLES: dict = {}


def _remote(fn):
    import ray

    if fn.__name__ not in _REMOTE_HANDLES:
        _REMOTE_HANDLES[fn.__name__] = ray.remote(fn)
    return _REMOTE_HANDLES[fn.__name__]


def _linked_canons_union(canons_dir: str, cmap_dir: str):
    """Sorted union of the link pass's side-written triple-endpoint canons
    and every canon-map component — the 'linked' membership probe for the
    is_external flag. Runs as a Ray task (output lands in plasma,
    overlapped with the conv exchange — no driver union/sort)."""
    import pyarrow.dataset as pads

    l = pads.dataset(canons_dir).to_table().column("canon").to_pandas()
    c = (
        pads.dataset(cmap_dir)
        .to_table(columns=["component"])
        .column("component")
        .to_pandas()
    )
    return np.union1d(pd.unique(l), pd.unique(c))


def _corpus_buckets(ctx: PassContext) -> int:
    """Width of the corpus-scale exchanges (triple dedup, conv buckets).

    Byte-scaled like run_base's block count: a FIXED width (the old
    ``NB = NBC = 64``) makes every bucket 1/64 of the corpus-scale stream
    — one pandas frame in one task — which OOMs at 100× the data. See
    functions/agg.auto_buckets. ``params["num_buckets"]`` forces a width
    (tests exercise two forced widths against the oracles)."""
    nb = _p(ctx, "num_buckets")
    if nb:
        return int(nb)
    from ..functions.agg import auto_buckets
    from ..sources.transcripts import corpus_bytes

    return auto_buckets(nbytes=corpus_bytes(ensure_transcripts(ctx.sf_dir)))


# ---------------------------------------------------------------------------
# pass 00 — base extraction
# ---------------------------------------------------------------------------


def run_base(ctx: PassContext) -> dict:
    """Stable-ordered extraction → long record table, with NO exchange.

    The per-row invariant is "per-turn text equality under stable turn
    ordering": extraction is a pure per-turn function, so each batch is
    stably sorted by (conv_id, turn_idx) before the extractor consumes it
    — every unit of work runs under stable turn order. No cross-batch
    exchange precedes extraction because NO operator can observe one:
    every downstream consumer is a keyed aggregation/join (order-as-data,
    SURVEY.md §4 'Ordering assumptions'), and the stages where
    conversation order IS load-bearing (NEXT_TURN build, reaching overlay)
    re-establish it inside their own conv_id-keyed exchanges. At 100 TB a
    global sort of the full text corpus ahead of a per-turn map would
    shuffle the entire corpus for nothing.

    Measured (sf0.4, min of 2): per-batch sort 3.6 s @32 cpus / 8.3 s @8
    vs global range sort 5.6/9.0 vs conv_id-bucket exchange 6.5/12.2 —
    the exchange variants pay a flat ~2-4 s barrier that dominated the
    round-1 scaling gap. Set params["base_exchange"]="bucket" to force the
    conv_id hash-partition + per-partition stable sort (contiguous whole
    conversations) when an extractor needs cross-turn state.

    Extraction runs as stateless tasks with a per-process compiled-pattern
    cache (stages/extract.py — measured faster than an actor pool for
    this light state). Only (conv_id, turn_idx, text) are read —
    role/tool/ts are pruned at the read (wide-string discipline,
    SURVEY.md §7.4)."""
    import ray

    from ..sources.transcripts import corpus_bytes
    from ..stages.extract import extract_batch

    path = ensure_transcripts(ctx.sf_dir)
    nbytes = corpus_bytes(path)
    from .passes import blocks_per_cpu

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nblocks = max(ncpu * blocks_per_cpu(), nbytes // (32 << 20))
    from ..sources.fastread import fast_read_parquet

    # fast path: the corpus is many-part by construction (sf1.6 = 254
    # files) and the native read's driver-serial metadata prefetch is
    # O(files) — see sources/fastread.py. Batch sizing happens IN the
    # reader (batch_rows): a batch_size on the fused extract would make
    # Ray bundle the reader's 1-row item blocks into one giant task.
    ds = fast_read_parquet(
        path, columns=["conv_id", "turn_idx", "text"], num_tasks=nblocks,
        batch_rows=16384,
    )

    def extract_sorted(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable", ignore_index=True)
        return extract_batch(g)

    if ctx.params.get("base_exchange") == "bucket":
        from ..functions.agg import hash_groupby

        records = hash_groupby(
            ds, "conv_id", extract_sorted, num_buckets=max(32, 4 * ncpu)
        )
    else:
        records = ds.map_batches(extract_sorted, batch_format="pandas")
    return {"records": records}


# ---------------------------------------------------------------------------
# pass 01 — entities: entity dimension + alias pairs + canonical map (FUSED)
# ---------------------------------------------------------------------------

_EK_COLS = ["key", "n_mentions", "obj_key", "is_alias"]


def run_entities(ctx: PassContext) -> dict:
    """ONE records scan + ONE bucketed shuffle emits both the entity-key
    dimension (distinct mention keys + counts — TypeNodePass/Global.usedTypes
    analog, `TypeNodePass.scala:7-21`) and the distinct alias pairs
    (canonicalization input). Fused because both are aggregations of the
    same delta — two passes here would re-scan records and pay a second
    barrier for no parallelism gain (the round-1 scaling gap was exactly
    these fixed barriers).

    Rows pre-aggregate inside map_batches (combiner discipline) and bucket
    by ``key``, which co-locates both a key's mention counts and its
    outgoing alias pairs. The canonical map (union-find over the alias
    pairs, `NamespaceCreator.scala:22-28` generalized) is then a DEFERRED
    tiny table computed from the written delta — no extra Ray execution."""
    from ..functions.agg import hash_groupby

    records = ctx.read("base", "records", columns=["kind", "key", "pred", "obj_key"])

    def partials(t: pd.DataFrame) -> pd.DataFrame:
        m = t.loc[t["kind"] == "mention", "key"].value_counts()
        ment = pd.DataFrame(
            {"key": m.index.to_numpy(), "n_mentions": m.to_numpy(np.int64)}
        )
        ment["obj_key"] = ""
        ment["is_alias"] = False
        a = t.loc[
            (t["kind"] == "fact") & (t["pred"] == schema.ALIAS_PRED),
            ["key", "obj_key"],
        ].drop_duplicates()
        ali = pd.DataFrame(
            {
                "key": a["key"].to_numpy(),
                "n_mentions": np.zeros(len(a), np.int64),
                "obj_key": a["obj_key"].to_numpy(),
                "is_alias": np.ones(len(a), dtype=bool),
            }
        )
        return _empty_safe(
            pd.concat([ment[_EK_COLS], ali[_EK_COLS]], ignore_index=True)
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ments = (
            g[~g["is_alias"]]
            .groupby("key", as_index=False)
            .agg(n_mentions=("n_mentions", "sum"))
        )
        ments["obj_key"] = ""
        ments["is_alias"] = False
        ali = g[g["is_alias"]].drop_duplicates(["key", "obj_key"])
        return pd.concat([ments[_EK_COLS], ali[_EK_COLS]], ignore_index=True)

    combined = hash_groupby(
        records.map_batches(partials, batch_format="pandas"), "key", reduce_bucket
    )

    def canon_from_delta(c: PassContext):
        import pyarrow as pa
        import pyarrow.dataset as pads

        d = pads.dataset(c.delta_dir("entities", "entity_keys"))
        tbl = d.to_table(
            columns=["key", "obj_key"], filter=pads.field("is_alias") == True  # noqa: E712
        )
        pairs = tbl.to_pandas().rename(columns={"key": "a", "obj_key": "b"})
        cmap = canonical_map(
            pairs,
            distributed=_p(ctx, "cc_distributed"),
            num_partitions=_p(ctx, "num_partitions"),
        )
        return pa.Table.from_pandas(
            cmap.astype({"node": "object", "component": "object"}),
            schema=pa.schema([("node", pa.string()), ("component", pa.string())]),
            preserve_index=False,
        ).replace_schema_metadata(None)

    return {"entity_keys": combined, "canon_map": canon_from_delta}


# ---------------------------------------------------------------------------
# pass 02 — linking: mention links + triples + reaching overlay (FUSED)
# ---------------------------------------------------------------------------

_TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _empty_triples():
    # a typed ARROW table: Ray's block size estimation never samples it
    # (pandas "string"-dtype empties still ran np.vectorize over the
    # column and logged a warning per group)
    import pyarrow as pa

    return pa.table(
        {
            "subj": pa.array([], type=pa.string()),
            "pred": pa.array([], type=pa.string()),
            "obj": pa.array([], type=pa.string()),
            "conv_id": pa.array([], type=pa.string()),
            "turn_idx": pa.array([], type=pa.int32()),
        }
    )


def run_link(ctx: PassContext) -> dict:
    """Broadcast-join the canonical map onto facts and mentions, then derive
    every downstream view of the linked records in ONE dual-keyed exchange.

    Linker/CallLinker analog (`Linker.scala:122-130` builds driver maps and
    probes per row; here: `ray.put` once, vectorized ``searchsorted`` probe
    per batch — the sorted-hash lookup measured ~100× faster than a dict
    probe, see functions/joins.build_lookup). Unresolved keys keep
    themselves (log-and-continue soft-fail, `Linker.scala:244-266` — no row
    is dropped).

    Execution shape (ONE execution — round 2 cut the ``mention_links``
    full-table rewrite: the canon columns are a pure broadcast-lookup
    function of the base records, so persisting records+canon as a second
    corpus-scale delta bought nothing downstream consumers can't derive
    per batch from the canon map; at 100 TB that delta was the single
    largest write after the graph itself):

    * ONE base-records scan links facts and mentions in the batch body
      and feeds a DUAL-KEYED bucket shuffle: fact rows bucket by
      (subj, pred, obj) for the exact-triple dedup (NodeFilter.scala:12-27
      first-wins, order-free: winner = the lexicographic minimum
      (conv, turn)); mention rows bucket by conv_id for the
      reaching-mentions overlay (ReachingDefPass analog,
      stages/reaching.py). The per-bucket reducer RETURNS triple rows and
      SIDE-WRITES the reaching pairs and the linked-canon partials —
      three deltas, one barrier.
    """
    from ..functions.joins import get_broadcast, lookup_keys, lookup_task

    # probe built OFF-driver: a Ray task reads the canon delta and its
    # output (the sorted-hash probe) lands in plasma, overlapped with the
    # base-records scan startup — scan tasks self-synchronize on the ref
    canon_ref = lookup_task(ctx.delta_dir("entities", "canon_map"))

    def link_records(t: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(canon_ref)
        t = t.copy()
        t["canon"] = lookup_keys(table, t["key"], default="self")
        t["obj_canon"] = lookup_keys(table, t["obj_key"], default="self")
        return t

    NB = _corpus_buckets(ctx)  # spo buckets; conv buckets live at NB..2*NB-1

    def derived_from_delta(c: PassContext):
        import pyarrow as pa
        import pyarrow.parquet as pqt

        from ..stages.reaching import reaching_pairs_of_bucket

        reaching_dir = c.side_dir("reaching")
        canons_dir = c.side_dir("linked_canons")
        reaching_schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("src_turn_idx", pa.int32()),
                ("dst_turn_idx", pa.int32()),
                ("variable", pa.string()),
            ]
        )

        linked = c.read(
            "base",
            "records",
            columns=["kind", "pred", "conv_id", "turn_idx", "key", "obj_key"],
        ).map_batches(link_records, batch_format="pandas")

        def tag(t: pd.DataFrame) -> pd.DataFrame:
            f = t[(t["kind"] == "fact") & (t["pred"] != schema.ALIAS_PRED)]
            fact_rows = pd.DataFrame(
                {
                    "subj": f["canon"].to_numpy(),
                    "pred": f["pred"].to_numpy(),
                    "obj": f["obj_canon"].to_numpy(),
                    "conv_id": f["conv_id"].to_numpy(),
                    "turn_idx": f["turn_idx"].to_numpy(),
                }
            )
            # per-batch combiner: keep the min-(conv,turn) row per triple
            fact_rows = fact_rows.sort_values(_TRIPLE_COLS).drop_duplicates(
                ["subj", "pred", "obj"], keep="first"
            )
            fact_rows["key"] = ""
            fact_rows["_bucket"] = (
                ids.hash_series([fact_rows["subj"], fact_rows["pred"], fact_rows["obj"]]) % NB
            ).astype("int32")
            m = t.loc[
                t["kind"] == "mention", ["conv_id", "turn_idx", "key"]
            ].drop_duplicates()
            ment_rows = pd.DataFrame(
                {
                    "subj": np.full(len(m), "", dtype=object),
                    "pred": np.full(len(m), "", dtype=object),
                    "obj": np.full(len(m), "", dtype=object),
                    "conv_id": m["conv_id"].to_numpy(),
                    "turn_idx": m["turn_idx"].to_numpy(),
                    "key": m["key"].to_numpy(),
                }
            )
            ment_rows["_bucket"] = (
                NB + ids.hash_series([ment_rows["conv_id"]]) % NB
            ).astype("int32")
            return _empty_safe(pd.concat([fact_rows, ment_rows], ignore_index=True))

        def dispatch(g: pd.DataFrame) -> pd.DataFrame:
            b = int(g["_bucket"].iloc[0])
            if b < NB:  # triple-dedup bucket
                tri = g[_TRIPLE_COLS].sort_values(_TRIPLE_COLS).drop_duplicates(
                    ["subj", "pred", "obj"], keep="first"
                )
                tri = tri.assign(turn_idx=tri["turn_idx"].astype("int32"))
                canons = pd.unique(
                    pd.concat([tri["subj"], tri["obj"]], ignore_index=True)
                )
                pqt.write_table(
                    pa.table({"canon": pa.array(canons, type=pa.string())}),
                    os.path.join(canons_dir, f"part-{b:03d}.parquet"),
                    compression="zstd",
                )
                return tri
            # conv bucket → reaching pairs (side-written)
            pairs = reaching_pairs_of_bucket(g[["conv_id", "turn_idx", "key"]])
            pqt.write_table(
                pa.Table.from_pandas(
                    pairs, schema=reaching_schema, preserve_index=False
                ).replace_schema_metadata(None),
                os.path.join(reaching_dir, f"part-{b - NB:03d}.parquet"),
                compression="zstd",
            )
            return _empty_triples()

        return (
            linked.map_batches(tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(dispatch, batch_format="pandas")
        )

    return {"triples": derived_from_delta}


# ---------------------------------------------------------------------------
# pass 03 — dominators / post-dominators / control-dependence overlay
# ---------------------------------------------------------------------------


def conv_graph_edges(turns: np.ndarray, roles: np.ndarray) -> list[tuple]:
    """One conversation's reply graph: the NEXT_TURN chain plus 'skip'
    edges between consecutive USER turns (a user's follow-up replies to
    their previous turn, bypassing the assistant/tool turns in between).
    All edges run forward in turn order — an interval DAG, which gives the
    dominator relation a closed form the SQL oracle exploits (m dom n ⟺
    no edge (a,b) with a < m < b ≤ n)."""
    edges = list(zip(turns[:-1], turns[1:]))
    ut = turns[roles == "user"]
    edges += [(a, b) for a, b in zip(ut[:-1], ut[1:]) if b > a + 1]
    return edges


# ---------------------------------------------------------------------------
# pass 04 — materialize CPG-shaped nodes + edges
# ---------------------------------------------------------------------------


def _as_np(v):
    """Positional semantics: strip pandas indexes before frame assembly."""
    return v.to_numpy() if isinstance(v, pd.Series) else v


def _nodes_frame(n: int, **cols) -> pd.DataFrame:
    """SPARSE node frame: only provided columns materialize (absent ones
    become metadata-only ``pa.nulls`` in ``_graph_block`` — building dense
    [None]*n object columns for every absent property measured as real
    remote-wall in the 27M-row edge branches)."""
    out = {"id": _as_np(cols["id"]), "label": _as_np(cols["label"])}
    for k in ("name", "full_name", "code", "conv_id"):
        if k in cols:
            out[k] = _as_np(cols[k])
    for k, dt in (("order", "Int32"), ("turn_idx", "Int32"), ("is_external", "boolean")):
        if k in cols:
            out[k] = pd.array(_as_np(cols[k]), dtype=dt)
    out["overlay"] = _as_np(cols["overlay"])
    return pd.DataFrame(out)


def _edges_frame(n: int, **cols) -> pd.DataFrame:
    out = {
        "src": _as_np(cols["src"]),
        "dst": _as_np(cols["dst"]),
        "label": _as_np(cols["label"]),
    }
    if "variable" in cols:
        out["variable"] = _as_np(cols["variable"])
    if "order" in cols:
        out["order"] = pd.array(_as_np(cols["order"]), dtype="Int32")
    out["overlay"] = _as_np(cols["overlay"])
    return pd.DataFrame(out)


def sparse_to_table(df: pd.DataFrame, sch) -> "object":
    """Sparse node/edge frame → full-schema arrow table (absent columns
    become ``pa.nulls``). The consumer for sparse `_nodes_frame` /
    `_edges_frame` output everywhere OUTSIDE materialize's union stream
    (e.g. the tag write-back pass)."""
    import pyarrow as pa

    n = len(df)
    arrays = [
        pa.Array.from_pandas(df[f.name], type=f.type)
        if f.name in df.columns
        else pa.nulls(n, f.type)
        for f in sch
    ]
    return pa.Table.from_arrays(arrays, schema=sch)


def _turn_key(conv, idx) -> pd.Series:
    c = pd.Series(_as_np(conv)).astype(str)
    i = pd.Series(_as_np(idx)).astype(np.int64).astype(str)
    return c + ":" + i


def run_materialize(ctx: PassContext) -> dict:
    """Emit the graph (nodes + edges tables, NODES_SCHEMA / EDGES_SCHEMA)
    in ONE streaming execution with IN-TASK writes.

    All ids are content hashes (ids.py) so every stage can mint the id of
    any node it references without coordination — the replacement for the
    reference's KeyPool + single-writer apply (`ParallelCpgPass.scala:86-121`).

    Scale shape: every input is scanned ONCE, and every scan's map WRITES
    its node/edge rows to the ``nodes/`` + ``edges/`` delta dirs from
    inside its own task (``write_graph`` below — single-threaded
    pq.write_table, one file per task), returning only a tiny summary
    block. The branches union into one summary stream whose count()
    drives the execution. Earlier shapes paid for their plumbing at the
    DRIVER: a union-schema stream into Ray's partitioned Write operator
    cost ~500 extra unfused write tasks + the full graph moving through
    the object store, and the measured driver-side cost of ~10-20 ms per
    task launch×completion (~1,450 tasks ≈ 15-30 s) was the pipeline's
    CPU-count-independent scaling floor. In-task writes + the fused
    exchange below cut the task count roughly in half.

    The conversation-keyed exchange is shared AND dual-keyed (the link
    pass pattern): ONE sort carries conv-bucketed turn rows (buckets
    0..NBC-1 → NEXT_TURN edges, `CfgCreationPass.scala:28-36`;
    dominator/post-dominator/CDG overlay edges,
    `CfgDominatorPass.scala:15-60`, `CdgPass.scala:17-54` — closed-form
    interval-DAG evaluation, `functions/graph.py`; CONVERSATION dimension
    nodes, conv-exclusive per bucket; and the side-written ``dom`` delta)
    and dim-partial rows (buckets NBC.. → globally-distinct SPEAKER/TOOL
    dimension nodes).
    """
    import pyarrow as pa
    import pyarrow.parquet as pqt

    overlay = "materialize"
    ndir = os.path.join(ctx._side_root, "nodes")
    edir = os.path.join(ctx._side_root, "edges")
    dimdir = os.path.join(ctx._side_root, "ndim")
    tpdir = os.path.join(ctx._side_root, "tprops")
    os.makedirs(ndir, exist_ok=True)
    os.makedirs(edir, exist_ok=True)
    os.makedirs(dimdir, exist_ok=True)
    os.makedirs(tpdir, exist_ok=True)
    # label-code vocabularies FROZEN at write time; the validator checks
    # them against its own schema before trusting the side-written tables
    dim_labels = list(schema.NODE_LABELS)
    dim_edge_labels = list(schema.EDGE_LABELS)

    _SUM_SCHEMA = pa.schema([("table", pa.string()), ("rows", pa.int64())])

    def write_graph(*parts) -> pa.Table:
        """Write sparse node/edge frames from INSIDE the task (one file
        per kind per call, single-threaded writer — see functions/sink.py
        for why Ray's Write operator is avoided); returns a summary."""
        import uuid as _uuid

        fname = f"part-{_uuid.uuid4().hex}.parquet"
        groups: dict = {"nodes": [], "edges": []}
        for df, kind in parts:
            if len(df):
                sch = schema.NODES_SCHEMA if kind == "nodes" else schema.EDGES_SCHEMA
                groups[kind].append(
                    sparse_to_table(df, sch).replace_schema_metadata(None)
                )
        names, rows = [], []
        for kind, tbls in groups.items():
            if not tbls:
                continue
            t = tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)
            pqt.write_table(
                t,
                os.path.join(ndir if kind == "nodes" else edir, fname),
                compression="zstd",
            )
            if kind == "nodes":
                # side-write the VALIDATOR DIM from the frame in hand —
                # the label coding / conv hashing the validate pass would
                # otherwise pay two extra node scans for (its dim fetch
                # was the largest serial term of the pipeline's measured
                # scaling gap). Numeric-only: 11 B/node + 20 B/turn.
                from ..ids import hash_series as _hs

                lab = t.column("label").to_pandas()
                code = pd.Categorical(lab, categories=dim_labels).codes.astype("int16")
                extc = t.column("is_external").to_pandas()
                pqt.write_table(
                    pa.table({
                        "id": t.column("id"),
                        "code": pa.array(code, pa.int16()),
                        "ext": pa.array((extc.notna() & extc.astype(object).eq(True)).to_numpy()),
                        "pmask": pa.array(schema.node_prop_mask(t), pa.uint16()),
                    }),
                    os.path.join(dimdir, fname), compression="zstd",
                )
                tm = (lab == schema.TURN).to_numpy()
                if tm.any():
                    tt = t.select(["id", "conv_id", "turn_idx"]).to_pandas()[tm]
                    pqt.write_table(
                        pa.table({
                            "id": pa.array(tt["id"].to_numpy(np.int64)),
                            "conv": pa.array(_hs([tt["conv_id"].fillna("")])),
                            "tidx": pa.array(
                                tt["turn_idx"].fillna(-1).astype("int32").to_numpy()
                            ),
                        }),
                        os.path.join(tpdir, fname), compression="zstd",
                    )
            # (an (src,dst,lcode) edge mirror was measured a WASH on the
            # read side vs the in-scan label->code map — 1.7 s vs 2.0 s at
            # 32 cpus — while costing ~430 MB of throttled writeback, so
            # edges are NOT mirrored; the validator maps labels in-scan)
            names.append(kind)
            rows.append(t.num_rows)
        return pa.table({"table": names, "rows": rows}, schema=_SUM_SCHEMA)

    # --- ONE (text-pruned!) transcript scan: writes TURN nodes +
    # AST/SPOKEN_BY/USES_TOOL edges in-task, RETURNS the rows of the
    # shared dual-keyed exchange (conv rows + dim partials)
    from ..sources.transcripts import read_transcripts

    turns = read_transcripts(ctx.sf_dir, columns=["conv_id", "turn_idx", "role", "tool"])

    from ..functions.graph import conv_dominators_frame

    NBC = _corpus_buckets(ctx)  # conv buckets 0..NBC-1
    NBD = 8  # dim buckets NBC..NBC+NBD-1
    _EXCH_COLS = ["_bucket", "conv_id", "turn_idx", "role", "dim_label", "dim_key"]

    def turn_graph(t: pd.DataFrame) -> pd.DataFrame:
        n = len(t)
        tk = _turn_key(t["conv_id"], t["turn_idx"])  # display name only
        turn_ids = ids.composite_ids("TURN", t["conv_id"], t["turn_idx"])
        nodes = _nodes_frame(
            n,
            id=turn_ids,
            label=schema.TURN,
            name=tk,
            full_name=tk,
            order=t["turn_idx"].to_numpy(),
            conv_id=t["conv_id"].to_numpy(),
            turn_idx=t["turn_idx"].to_numpy(),
            overlay=overlay,
        )
        conv_ids = ids.node_ids(schema.CONVERSATION, t["conv_id"])
        frames = [
            _edges_frame(
                n, src=conv_ids, dst=turn_ids, label=schema.AST,
                order=t["turn_idx"].to_numpy(), overlay=overlay,
            ),
            _edges_frame(
                n, src=turn_ids, dst=ids.node_ids(schema.SPEAKER, t["role"]),
                label=schema.SPOKEN_BY, overlay=overlay,
            ),
        ]
        toolmask = (t["role"] == "tool") & t["tool"].fillna("").ne("")
        tt = t[toolmask]
        if len(tt):
            frames.append(
                _edges_frame(
                    len(tt),
                    src=ids.composite_ids("TURN", tt["conv_id"], tt["turn_idx"]),
                    dst=ids.node_ids(schema.TOOL, tt["tool"]),
                    label=schema.USES_TOOL,
                    overlay=overlay,
                )
            )
        write_graph((nodes, "nodes"), *[(f, "edges") for f in frames])
        # exchange rows: every turn keyed by conv hash; per-batch-distinct
        # SPEAKER/TOOL partials keyed by (label, key) hash (tiny)
        conv = pd.DataFrame(
            {
                "_bucket": (ids.hash_series([t["conv_id"]]) % NBC).astype("int32"),
                "conv_id": t["conv_id"].to_numpy(),
                "turn_idx": t["turn_idx"].to_numpy(),
                "role": t["role"].to_numpy(),
                "dim_label": np.full(n, "", dtype=object),
                "dim_key": np.full(n, "", dtype=object),
            }
        )
        roles = t["role"].drop_duplicates()
        tools = tt["tool"].drop_duplicates()
        dl = pd.Series(
            [schema.SPEAKER] * len(roles) + [schema.TOOL] * len(tools), dtype="object"
        )
        dk = pd.concat([roles, tools], ignore_index=True)
        dims = pd.DataFrame(
            {
                "_bucket": (NBC + ids.hash_series([dl, dk]) % NBD).astype("int32"),
                "conv_id": np.full(len(dl), "", dtype=object),
                "turn_idx": np.zeros(len(dl), dtype=t["turn_idx"].dtype),
                "role": np.full(len(dl), "", dtype=object),
                "dim_label": dl.to_numpy(),
                "dim_key": dk.to_numpy(),
            }
        )
        return pd.concat([conv[_EXCH_COLS], dims[_EXCH_COLS]], ignore_index=True)

    # --- the shared exchange: conv buckets → NEXT_TURN + dominator overlay
    # + dom delta + CONVERSATION nodes; dim buckets → SPEAKER/TOOL nodes
    dom_dir = ctx.side_dir("dom")
    dom_schema = pa.schema(
        [("conv_id", pa.string()), ("kind", pa.string()),
         ("a", pa.int32()), ("b", pa.int32())]
    )
    _dom_label = {"dom": schema.DOMINATE, "pdom": schema.POST_DOMINATE, "cdg": schema.CDG}

    def conv_or_dim_bucket(g: pd.DataFrame) -> pa.Table:
        b = int(g["_bucket"].iloc[0])
        if b >= NBC:  # dim bucket → globally-distinct SPEAKER/TOOL nodes
            d = g.drop_duplicates(["dim_label", "dim_key"])
            dim_nodes = _nodes_frame(
                len(d),
                id=ids.hash_series([d["dim_label"], d["dim_key"]]),
                label=d["dim_label"].to_numpy(),
                name=d["dim_key"].to_numpy(),
                full_name=d["dim_key"].to_numpy(),
                overlay=overlay,
            )
            return write_graph((dim_nodes, "nodes"))
        g = g[["conv_id", "turn_idx", "role"]].sort_values(
            ["conv_id", "turn_idx"], ignore_index=True
        )
        # dominators / post-dominators / CDG (closed form == CHK, tested)
        dom = conv_dominators_frame(g)
        pqt.write_table(
            pa.Table.from_pandas(
                dom, schema=dom_schema, preserve_index=False
            ).replace_schema_metadata(None),
            os.path.join(dom_dir, f"part-{b:03d}.parquet"),
            compression="zstd",
        )
        nd = len(dom)
        dom_e = _edges_frame(
            nd,
            src=ids.composite_ids("TURN", dom["conv_id"], dom["a"]),
            dst=ids.composite_ids("TURN", dom["conv_id"], dom["b"]),
            label=dom["kind"].map(_dom_label).to_numpy(),
            overlay="dominators",
        )
        # NEXT_TURN chain: pair row i with i+1 while conv is unchanged
        tid = ids.composite_ids("TURN", g["conv_id"], g["turn_idx"])
        same = (g["conv_id"].shift(-1) == g["conv_id"]).to_numpy()
        same[-1:] = False
        nt = _edges_frame(
            int(same.sum()), src=tid[:-1][same[:-1]], dst=tid[1:][same[:-1]],
            label=schema.NEXT_TURN, overlay=overlay,
        )
        # CONVERSATION dimension nodes: conv_ids are bucket-exclusive
        # (hashed by conv_id), so per-bucket distinct IS globally distinct
        convs = g["conv_id"].drop_duplicates()
        conv_nodes = _nodes_frame(
            len(convs),
            id=ids.node_ids(schema.CONVERSATION, convs),
            label=schema.CONVERSATION,
            name=convs.to_numpy(),
            full_name=convs.to_numpy(),
            conv_id=convs.to_numpy(),
            overlay=overlay,
        )
        return write_graph(
            (conv_nodes, "nodes"), (dom_e, "edges"), (nt, "edges")
        )

    conv_graph = (
        turns.map_batches(turn_graph, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(conv_or_dim_bucket, batch_format="pandas")
    )

    # --- mention nodes + edges from ONE base-records scan ------------------
    # round 2: the mention_links delta (records + canon columns) is gone —
    # canon is a pure broadcast-lookup function of the base records, so the
    # scan re-derives it per batch instead of re-reading a second
    # corpus-scale delta (the largest write after the graph itself).
    from ..functions.joins import get_broadcast, lookup_keys, lookup_task

    # both broadcast sides built OFF-driver (probe + linked-canon union
    # land in plasma as task outputs, overlapped with the conv exchange)
    cmap_ref = lookup_task(ctx.delta_dir("entities", "canon_map"))

    def mention_rows(t: pd.DataFrame) -> pd.DataFrame:
        m = t[t["kind"] == "mention"].drop(columns=["kind"]).copy()
        m["canon"] = lookup_keys(get_broadcast(cmap_ref), m["key"], default="self")
        return _empty_safe(m)

    mlinks = ctx.read(
        "base", "records",
        columns=["kind", "conv_id", "turn_idx", "ordinal", "surface", "key"],
    ).map_batches(mention_rows, batch_format="pandas")

    def mention_graph(t: pd.DataFrame) -> pa.Table:
        n = len(t)
        mid = ids.composite_ids("MENTION", t["conv_id"], t["turn_idx"], t["ordinal"])
        nodes = _nodes_frame(
            n,
            id=mid,
            label=schema.MENTION,
            name=t["key"].to_numpy(),
            full_name=t["canon"].to_numpy(),
            code=t["surface"].to_numpy(),
            order=t["ordinal"].to_numpy(),
            conv_id=t["conv_id"].to_numpy(),
            turn_idx=t["turn_idx"].to_numpy(),
            overlay=overlay,
        )
        tid = ids.composite_ids("TURN", t["conv_id"], t["turn_idx"])
        cid = ids.node_ids(schema.CONVERSATION, t["conv_id"])
        eid = ids.node_ids(schema.ENTITY, t["canon"])
        return write_graph(
            (nodes, "nodes"),
            (_edges_frame(n, src=tid, dst=mid, label=schema.AST,
                          order=t["ordinal"].to_numpy(), overlay=overlay), "edges"),
            (_edges_frame(n, src=cid, dst=mid, label=schema.CONTAINS, overlay=overlay), "edges"),
            (_edges_frame(n, src=mid, dst=eid, label=schema.REF, overlay=overlay), "edges"),
        )

    # --- entity nodes (canonical; is_external = no fact participation) ----
    # linked = canonical keys in ANY fact: triple endpoints (side-written
    # per-bucket by the link pass — no extra execution here) ∪ alias
    # participants (= every canon_map component — those keys appeared in an
    # alias_of fact by construction). Fully distributed: the entity vocab
    # is never driver-materialized (it grows with the corpus); only the
    # canon map and the linked-canon set (both vocab-dimension) broadcast.
    from ..functions.agg import hash_groupby

    linked_ref = _remote(_linked_canons_union).remote(
        ctx.delta_dir("link", "linked_canons"),
        ctx.delta_dir("entities", "canon_map"),
    )

    entity_keys = ctx.read(
        "entities", "entity_keys", columns=["key", "n_mentions", "is_alias"]
    )

    def canon_partials(t: pd.DataFrame) -> pd.DataFrame:
        cm = get_broadcast(cmap_ref)
        t = t[~t["is_alias"]].copy()
        t["canon"] = lookup_keys(cm, t["key"], default="self")
        return t.groupby("canon", as_index=False).agg(n_mentions=("n_mentions", "sum"))

    def entity_graph_of_bucket(g: pd.DataFrame) -> pa.Table:
        linked = get_broadcast(linked_ref)
        ents = g.groupby("canon", as_index=False).agg(n_mentions=("n_mentions", "sum"))
        ents = ents.sort_values("canon", ignore_index=True)  # usedTypes.sorted
        n = len(ents)
        nodes = _nodes_frame(
            n,
            id=ids.node_ids(schema.ENTITY, ents["canon"]),
            label=schema.ENTITY,
            name=ents["canon"].to_numpy(),
            full_name=ents["canon"].to_numpy(),
            is_external=(~ents["canon"].isin(linked)).to_numpy(),
            overlay=overlay,
        )
        return write_graph((nodes, "nodes"))

    entity_graph_ds = hash_groupby(
        entity_keys.map_batches(canon_partials, batch_format="pandas"),
        "canon",
        entity_graph_of_bucket,
    )

    # --- REACHES edges from the reaching overlay (side-written by link) ---
    reaching = ctx.read("link", "reaching")

    def reaches_graph(t: pd.DataFrame) -> pa.Table:
        n = len(t)
        edges = _edges_frame(
            n,
            src=ids.composite_ids("TURN", t["conv_id"], t["src_turn_idx"]),
            dst=ids.composite_ids("TURN", t["conv_id"], t["dst_turn_idx"]),
            label=schema.REACHES,
            variable=t["variable"].to_numpy(),
            overlay="reaching",
        )
        return write_graph((edges, "edges"))

    # --- FACT edges from triples ------------------------------------------
    triples = ctx.read("link", "triples")

    def fact_graph(t: pd.DataFrame) -> pa.Table:
        n = len(t)
        edges = _edges_frame(
            n,
            src=ids.node_ids(schema.ENTITY, t["subj"]),
            dst=ids.node_ids(schema.ENTITY, t["obj"]),
            label=schema.FACT,
            variable=t["pred"].to_numpy(),
            overlay=overlay,
        )
        return write_graph((edges, "edges"))

    # --- META_DATA node (exactly one; carries the overlay ledger) ---------
    # written directly by the driver — no Ray execution for one row
    meta = _nodes_frame(
        1,
        id=[ids.node_id_scalar(schema.META_DATA, "kg")],
        label=schema.META_DATA,
        name="transcript-kg",
        full_name="codepropertygraph_ray/0.1.0",
        overlay="base",
    )
    pqt.write_table(
        sparse_to_table(meta, schema.NODES_SCHEMA).replace_schema_metadata(None),
        os.path.join(ndir, "part-meta.parquet"),
        compression="zstd",
    )
    pqt.write_table(
        pa.table({"id": pa.array(meta["id"].to_numpy(np.int64)),
                  "code": pa.array([dim_labels.index(schema.META_DATA)], pa.int16()),
                  "ext": pa.array([False]),
                  "pmask": pa.array(
                      schema.node_prop_mask(
                          sparse_to_table(meta, schema.NODES_SCHEMA)
                      ), pa.uint16())}),
        os.path.join(dimdir, "part-meta.parquet"), compression="zstd",
    )
    import json as _json

    with open(os.path.join(ctx._side_root, "dim_labels.json"), "w") as fh:
        _json.dump({"nodes": dim_labels, "edges": dim_edge_labels,
                    "props": list(schema.NODE_PROP_COLS)}, fh)

    # every branch writes its own files; the union carries only the tiny
    # per-task summaries, and ONE count() drives the whole execution
    if os.environ.get("GRAFT_MAT_SPLIT"):
        # experiment: run the barrier chain (turn_graph → sort →
        # conv_or_dim_bucket) alone first, then the four map-only
        # branches — measures whether fair-share stretching of the
        # chain dominates the unified execution's makespan
        import sys as _sys
        t0 = time.perf_counter()
        conv_graph.count()
        t1 = time.perf_counter()
        (
            mlinks.map_batches(mention_graph, batch_format="pandas")
            .union(entity_graph_ds)
            .union(reaching.map_batches(reaches_graph, batch_format="pandas"))
            .union(triples.map_batches(fact_graph, batch_format="pandas"))
        ).count()
        print(f"[mat-split] chain={t1 - t0:.2f}s "
              f"rest={time.perf_counter() - t1:.2f}s", file=_sys.stderr)
        return {}
    summaries = (
        conv_graph
        .union(mlinks.map_batches(mention_graph, batch_format="pandas"))
        .union(entity_graph_ds)
        .union(reaching.map_batches(reaches_graph, batch_format="pandas"))
        .union(triples.map_batches(fact_graph, batch_format="pandas"))
    )
    if os.environ.get("GRAFT_MATERIALIZE_STATS"):
        # count() executes a DERIVED plan whose stats aren't visible on
        # `summaries`; materialize (tiny — per-task summary rows only)
        # and print the full operator breakdown instead
        import sys as _sys
        print(summaries.materialize().stats(), file=_sys.stderr)
    else:
        summaries.count()
    return {}


# ---------------------------------------------------------------------------
# pass 05 — schema-facts validation (cpgvalidator analog)
# ---------------------------------------------------------------------------


def run_validate(ctx: PassContext) -> dict:
    import pyarrow.dataset as pads

    from ..stages import validate as v

    # logical (base ∪ inc_* overlay) reads: at build time this is just the
    # materialize delta, but a re-validation run AFTER incremental ingest
    # must see the increments' nodes/edges AND their ndim/tprops dims —
    # otherwise every increment edge would read as dangling
    # THUNKS, not Datasets: read_parquet over a many-part delta spends
    # ~1-2 s of driver-serial metadata time per construction; the validator
    # builds edges inside its warm thread (overlapped with the dim chain)
    # and touches nodes only on exceptional paths when the side-written
    # dim is present
    nodes = lambda: ctx.read_logical("nodes")  # noqa: E731
    edges = lambda: ctx.read_logical("edges")  # noqa: E731
    budget = _p(ctx, "validate_broadcast_max_rows") or v.BROADCAST_MAX_ROWS
    # path-selection scalar from parquet METADATA (row-group counts), not a
    # Dataset.count() — counting the union-schema delta decoded every file
    # (~30 s at 7M nodes)
    n_nodes = sum(
        pads.dataset(d).count_rows() for d in ctx.overlay_dirs("nodes")
    )
    import json as _json

    mat_dir = os.path.dirname(ctx.delta_dir("materialize", "nodes"))
    labels_file = os.path.join(mat_dir, "dim_labels.json")
    dim_dir = tp_dir = None
    if os.path.isfile(labels_file):
        with open(labels_file) as fh:
            vocab = _json.load(fh)
        if (isinstance(vocab, dict)
                and vocab.get("nodes") == list(schema.NODE_LABELS)
                and vocab.get("props") == list(schema.NODE_PROP_COLS)):
            # COMPLETENESS gate: every overlay contributing nodes must
            # also have side-written its ndim/tprops — a partial dim list
            # would make the fast path read every un-dimmed overlay's
            # edges as dangling. Any gap ⇒ full fallback node scan.
            node_dirs = list(ctx.overlay_dirs("nodes"))
            dim_dir = [os.path.join(os.path.dirname(nd), "ndim")
                       for nd in node_dirs]
            tp_dir = [os.path.join(os.path.dirname(nd), "tprops")
                      for nd in node_dirs]
            if not all(os.path.isdir(d) for d in dim_dir):
                dim_dir = None
            if not all(os.path.isdir(d) for d in tp_dir):
                tp_dir = None
    return {
        "violations": v.validate_graph(
            nodes, edges,
            num_partitions=_p(ctx, "num_partitions"),
            broadcast_max_rows=budget,
            n_nodes=n_nodes,
            dim_dir=dim_dir,
            turn_props_dir=tp_dir,
        )
    }


# ---------------------------------------------------------------------------
# pipeline assembly
# ---------------------------------------------------------------------------

PASSES = [
    Pass("base", run_base),
    Pass("entities", run_entities, depends_on=("base",)),
    Pass("link", run_link, depends_on=("base", "entities")),
    Pass("materialize", run_materialize, depends_on=("entities", "link")),
    Pass("validate", run_validate, depends_on=("materialize",)),
]


def build_kg(sf_dir: str, out_dir: str, params: dict | None = None) -> PipelineRunner:
    """Run (or resume) the full pipeline; returns the runner (ledger has
    per-pass metrics; ctx has delta dirs for nodes/edges/triples)."""
    runner = PipelineRunner(PASSES, out_dir=out_dir, sf_dir=sf_dir, params=params)
    runner.run()
    return runner
