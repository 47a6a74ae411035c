"""The flagship pipeline: transcripts → knowledge graph (nodes/edges/triples).

Ray-Data transposition of the reference's build lifecycle (SURVEY.md §3.4):

    read_parquet(transcripts)                       # S1 loader analog
      → sort(conv_id, turn_idx)                     # stable turn order (per-row invariant)
      → map_batches(TurnExtractor actor pool)       # F3/F4 base construction
      → entity dimension (partial agg + groupby)    # F7/F8 TypeNodePass analog
      → canonicalization (union-find over aliases)  # O14/NodeFilter generalized
      → linking (broadcast joins)                   # O5/O10 Linker/CallLinker analog
      → materialize nodes/edges (+ per-conv passes) # S8 + F5 CfgCreationPass analog
      → schema-facts validation                     # cpgvalidator analog

Each step is an overlay pass (numbered parquet delta dir + ledger,
`ProtoCpgLoader.scala:57-75` semantics) so the job is resumable per pass and
every delta carries per-file row-count metrics (lineage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import ids, schema
from ..functions.cc import canonical_map
from ..functions.joins import broadcast_join
from ..sources.transcripts import ensure_transcripts
from ..stages.extract import TurnExtractor
from .passes import Pass, PassContext, PipelineRunner

DEFAULT_PARAMS = {
    "num_partitions": 16,  # hash-join/shuffle width
    "extract_concurrency": None,  # None = stateless tasks; int = actor pool
    "extract_batch_size": 16384,
    "cc_distributed": None,  # None = auto by edge count
}


def _p(ctx: PassContext, key: str):
    return ctx.params.get(key, DEFAULT_PARAMS[key])


# ---------------------------------------------------------------------------
# pass 00 — base extraction
# ---------------------------------------------------------------------------


def run_base(ctx: PassContext) -> dict:
    """Stable-sorted read + vectorized extraction → long record table.

    Extraction runs as stateless tasks with a per-process compiled-pattern
    cache (see stages/extract.py — measured faster than an actor pool for
    this light state); pass ``extract_concurrency`` to force a pool for
    heavy extractor state. Read block count is sized so the sort shuffle
    moves ~32 MB blocks instead of hundreds of slivers."""
    import os

    import ray.data

    from ..stages.extract import extract_batch

    import ray

    path = ensure_transcripts(ctx.sf_dir)
    nbytes = os.path.getsize(path)
    # width scales with BOTH data and cluster: every stage downstream of
    # the sort inherits this block count, so fewer blocks than ~2×CPUs
    # caps the whole base pass below cluster width
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nblocks = max(2 * ncpu, nbytes // (32 << 20))
    ds = ray.data.read_parquet(path, override_num_blocks=nblocks)
    ds = ds.sort(["conv_id", "turn_idx"])  # the mandated stable order
    conc = ctx.params.get("extract_concurrency")
    if conc:
        records = ds.map_batches(
            TurnExtractor,
            batch_format="pandas",
            batch_size=_p(ctx, "extract_batch_size"),
            concurrency=conc,
        )
    else:
        records = ds.map_batches(
            extract_batch,
            batch_format="pandas",
            batch_size=_p(ctx, "extract_batch_size"),
        )
    return {"records": records}


# ---------------------------------------------------------------------------
# pass 01 — entity dimension (distinct mention keys, partial-agg first)
# ---------------------------------------------------------------------------


def run_entities(ctx: PassContext) -> dict:
    """Distinct mention keys + counts. Pre-aggregates inside map_batches so
    the bucketed groupby shuffles key partials, not raw mentions
    (SURVEY.md §2.5, the `Global.usedTypes` → emitted-column + aggregate
    replacement)."""
    from ..functions.agg import hash_agg

    records = ctx.read("base", "records", columns=["kind", "key"])

    def partial_counts(t: pd.DataFrame) -> pd.DataFrame:
        m = t.loc[t["kind"] == "mention", "key"].value_counts()
        return pd.DataFrame({"key": m.index, "n": m.to_numpy(np.int64)})

    partials = records.map_batches(partial_counts, batch_format="pandas")
    entity_keys = hash_agg(partials, "key", n_mentions=("n", "sum"))
    return {"entity_keys": entity_keys}


# ---------------------------------------------------------------------------
# pass 02 — canonicalization (alias pairs → union-find → canonical map)
# ---------------------------------------------------------------------------


def run_canonicalize(ctx: PassContext) -> dict:
    """Alias pairs → connected components → (node, component) map.

    The map is a vocab-scale dimension table; it is emitted as a delta and
    *broadcast* into later link stages (never re-shuffled per batch)."""
    records = ctx.read("base", "records", columns=["kind", "pred", "key", "obj_key"])

    def alias_pairs(t: pd.DataFrame) -> pd.DataFrame:
        f = t[(t["kind"] == "fact") & (t["pred"] == schema.ALIAS_PRED)]
        out = pd.DataFrame({"a": f["key"], "b": f["obj_key"]})
        return out.drop_duplicates()  # per-batch partial dedup

    pairs = records.map_batches(alias_pairs, batch_format="pandas")
    import pyarrow as pa

    cmap = canonical_map(
        pairs,
        distributed=_p(ctx, "cc_distributed"),
        num_partitions=_p(ctx, "num_partitions"),
    )
    return {"canon_map": pa.Table.from_pandas(cmap, preserve_index=False)}


# ---------------------------------------------------------------------------
# pass 03 — linking: canonical triples + mention→entity links
# ---------------------------------------------------------------------------


def _dedup_triples(triples):
    """Exact (subj,pred,obj) dedup keeping the earliest stating turn —
    first row under (conv_id, turn_idx) order (NodeFilter.scala:12-27
    first-wins analog, made order-free: the winner is the lexicographic
    minimum, not whichever partition arrived first)."""
    from ..functions.agg import hash_groupby

    keys = ["subj", "pred", "obj"]

    def local_first(t: pd.DataFrame) -> pd.DataFrame:
        # vectorized min-by-(conv,turn): sort then keep first per key —
        # used both as the per-batch combiner and the per-bucket reducer
        return t.sort_values(keys + ["conv_id", "turn_idx"]).drop_duplicates(
            keys, keep="first"
        )

    partials = triples.map_batches(local_first, batch_format="pandas")
    return hash_groupby(partials, keys, local_first)


def run_link(ctx: PassContext) -> dict:
    """Broadcast-join the canonical map onto facts and mentions.

    Linker/CallLinker analog (`Linker.scala:122-130` builds driver maps and
    probes per row; here: `ray.put` once, vectorized merge per batch).
    Unresolved keys keep themselves (log-and-continue soft-fail,
    `Linker.scala:244-266` — no row is dropped).

    ONE scan of the records delta links mentions and facts in the same
    batch body (mention_links delta); canonical triples then dedup from the
    already-linked fact rows of that delta — records is never read twice.
    """
    import ray

    cmap = ctx.read_table("canonicalize", "canon_map").to_pandas()
    canon_ref = ray.put(dict(zip(cmap["node"], cmap["component"])))
    from ..functions.joins import get_broadcast

    records = ctx.read(
        "base",
        "records",
        columns=["kind", "conv_id", "turn_idx", "ordinal", "surface", "key", "pred", "obj_key"],
    )

    def link_records(t: pd.DataFrame) -> pd.DataFrame:
        cm = get_broadcast(canon_ref)
        t = t.copy()
        # canon(key): pandas map + fillna(self) — the soft-fail default
        t["canon"] = t["key"].map(cm).fillna(t["key"])
        t["obj_canon"] = t["obj_key"].map(cm).fillna(t["obj_key"])
        return t

    linked_records = records.map_batches(link_records, batch_format="pandas")

    # triples: a DEFERRED delta — computed after mention_links is on disk,
    # reading the written files back (records is scanned exactly once)
    def fact_rows(t: pd.DataFrame) -> pd.DataFrame:
        f = t[(t["kind"] == "fact") & (t["pred"] != schema.ALIAS_PRED)]
        return f.rename(columns={"canon": "subj", "obj_canon": "obj"})[
            ["subj", "pred", "obj", "conv_id", "turn_idx"]
        ]

    def triples_from_delta(c: PassContext):
        linked = c.read(
            "link", "mention_links",
            columns=["kind", "pred", "conv_id", "turn_idx", "canon", "obj_canon"],
        )
        return _dedup_triples(linked.map_batches(fact_rows, batch_format="pandas"))

    return {"mention_links": linked_records, "triples": triples_from_delta}


# ---------------------------------------------------------------------------
# pass 04 — reaching-mentions overlay (ReachingDefPass analog)
# ---------------------------------------------------------------------------


def run_reaching(ctx: PassContext) -> dict:
    """Per-conversation mention-reaches-turn pairs (stages/reaching.py)."""
    from ..stages.reaching import reaching_mentions

    mentions = ctx.read(
        "link", "mention_links", columns=["kind", "conv_id", "turn_idx", "key"]
    ).map_batches(lambda t: t[t["kind"] == "mention"], batch_format="pandas")
    return {"reaching": reaching_mentions(mentions)}


# ---------------------------------------------------------------------------
# pass 05 — materialize CPG-shaped nodes + edges
# ---------------------------------------------------------------------------


def _empty_str(n: int) -> pd.Series:
    return pd.Series([None] * n, dtype="object")


def _as_np(v):
    """Positional semantics: strip pandas indexes before frame assembly."""
    return v.to_numpy() if isinstance(v, pd.Series) else v


def _nodes_frame(n: int, **cols) -> pd.DataFrame:
    out = pd.DataFrame(
        {
            "id": _as_np(cols["id"]),
            "label": _as_np(cols["label"]),
            "name": _as_np(cols.get("name", _empty_str(n))),
            "full_name": _as_np(cols.get("full_name", _empty_str(n))),
            "code": _as_np(cols.get("code", _empty_str(n))),
            "order": pd.array(_as_np(cols.get("order", [None] * n)), dtype="Int32"),
            "conv_id": _as_np(cols.get("conv_id", _empty_str(n))),
            "turn_idx": pd.array(_as_np(cols.get("turn_idx", [None] * n)), dtype="Int32"),
            "is_external": pd.array(_as_np(cols.get("is_external", [None] * n)), dtype="boolean"),
            "overlay": _as_np(cols["overlay"]),
        }
    )
    return out


def _edges_frame(n: int, **cols) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "src": _as_np(cols["src"]),
            "dst": _as_np(cols["dst"]),
            "label": _as_np(cols["label"]),
            "variable": _as_np(cols.get("variable", _empty_str(n))),
            "order": pd.array(_as_np(cols.get("order", [None] * n)), dtype="Int32"),
            "overlay": _as_np(cols["overlay"]),
        }
    )


def _turn_key(conv, idx) -> pd.Series:
    c = pd.Series(_as_np(conv)).astype(str)
    i = pd.Series(_as_np(idx)).astype(np.int64).astype(str)
    return c + ":" + i


def run_materialize(ctx: PassContext) -> dict:
    """Emit the nodes and edges tables (NODES_SCHEMA / EDGES_SCHEMA).

    All ids are content hashes (ids.py) so every stage can mint the id of
    any node it references without coordination — the replacement for the
    reference's KeyPool + single-writer apply (`ParallelCpgPass.scala:86-121`).
    Per-conversation NEXT_TURN edges come from a `groupby(conv_id).map_groups`
    — the CfgCreationPass per-method pattern (`CfgCreationPass.scala:28-36`).
    """
    import ray.data

    overlay = "materialize"

    # --- turn-level nodes/edges from the (text-pruned!) transcript read ----
    from ..sources.transcripts import read_transcripts

    turns = read_transcripts(ctx.sf_dir, columns=["conv_id", "turn_idx", "role", "tool"])

    def turn_nodes(t: pd.DataFrame) -> pd.DataFrame:
        n = len(t)
        tk = _turn_key(t["conv_id"], t["turn_idx"])
        return _nodes_frame(
            n,
            id=ids.hash_series([pd.Series(["TURN"] * n), tk]),
            label=schema.TURN,
            name=tk,
            full_name=tk,
            order=t["turn_idx"].to_numpy(),
            conv_id=t["conv_id"].to_numpy(),
            turn_idx=t["turn_idx"].to_numpy(),
            overlay=overlay,
        )

    def turn_edges(t: pd.DataFrame) -> pd.DataFrame:
        tk = _turn_key(t["conv_id"], t["turn_idx"])
        n = len(t)
        turn_ids = ids.hash_series([pd.Series(["TURN"] * n), tk])
        conv_ids = ids.node_ids(schema.CONVERSATION, t["conv_id"])
        frames = [
            _edges_frame(
                n, src=conv_ids, dst=turn_ids, label=schema.AST,
                order=t["turn_idx"].to_numpy(), overlay=overlay,
            )
        ]
        spk_ids = ids.node_ids(schema.SPEAKER, t["role"])
        frames.append(
            _edges_frame(n, src=turn_ids, dst=spk_ids, label=schema.SPOKEN_BY, overlay=overlay)
        )
        toolmask = (t["role"] == "tool") & t["tool"].fillna("").ne("")
        tt = t[toolmask]
        if len(tt):
            ttk = _turn_key(tt["conv_id"], tt["turn_idx"])
            frames.append(
                _edges_frame(
                    len(tt),
                    src=ids.hash_series([pd.Series(["TURN"] * len(tt)), ttk]),
                    dst=ids.node_ids(schema.TOOL, tt["tool"]),
                    label=schema.USES_TOOL,
                    overlay=overlay,
                )
            )
        return pd.concat(frames, ignore_index=True)

    def next_turn_edges(g: pd.DataFrame) -> pd.DataFrame:
        # one bucket of whole conversations; vectorized across them:
        # sort by (conv, idx), pair row i with i+1 where conv is unchanged
        g = g.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        tk = _turn_key(g["conv_id"], g["turn_idx"])
        tid = ids.hash_series([pd.Series(["TURN"] * len(g)), tk])
        same = (g["conv_id"].shift(-1) == g["conv_id"]).to_numpy()
        same[-1:] = False
        n = int(same.sum())
        return _edges_frame(
            n, src=tid[:-1][same[:-1]], dst=tid[1:][same[:-1]],
            label=schema.NEXT_TURN, overlay=overlay,
        )

    # --- dimension nodes (conversation / speaker / tool) -------------------
    # ONE scan + ONE bucketed shuffle covers all three dimensions: partials
    # emit (label, key) for CONVERSATION / SPEAKER / TOOL alike
    from ..functions.agg import hash_agg

    def dim_partials(t: pd.DataFrame) -> pd.DataFrame:
        convs = t["conv_id"].drop_duplicates()
        roles = t["role"].drop_duplicates()
        tools = t.loc[(t["role"] == "tool") & t["tool"].fillna("").ne(""), "tool"].drop_duplicates()
        return pd.DataFrame(
            {
                "label": [schema.CONVERSATION] * len(convs)
                + [schema.SPEAKER] * len(roles)
                + [schema.TOOL] * len(tools),
                "key": pd.concat([convs, roles, tools], ignore_index=True),
            }
        )

    dims = hash_agg(
        turns.map_batches(dim_partials, batch_format="pandas"),
        ["label", "key"],
        _n=("key", "size"),
    )

    def dim_nodes(t: pd.DataFrame) -> pd.DataFrame:
        n = len(t)
        is_conv = (t["label"] == schema.CONVERSATION).to_numpy()
        return _nodes_frame(
            n,
            id=ids.hash_series([t["label"], t["key"]]),
            label=t["label"].to_numpy(),
            name=t["key"].to_numpy(),
            full_name=t["key"].to_numpy(),
            conv_id=np.where(is_conv, t["key"], None),
            overlay=overlay,
        )

    # --- mention nodes + AST/CONTAINS/REF edges ----------------------------
    mlinks = ctx.read(
        "link", "mention_links",
        columns=["kind", "conv_id", "turn_idx", "ordinal", "surface", "key", "canon"],
    ).map_batches(
        lambda t: t[t["kind"] == "mention"].drop(columns=["kind"]),
        batch_format="pandas",
    )

    def mention_key(t: pd.DataFrame) -> pd.Series:
        return (
            t["conv_id"].astype(str)
            + ":"
            + t["turn_idx"].astype(np.int64).astype(str)
            + ":"
            + t["ordinal"].astype(np.int64).astype(str)
        )

    def mention_nodes(t: pd.DataFrame) -> pd.DataFrame:
        n = len(t)
        return _nodes_frame(
            n,
            id=ids.hash_series([pd.Series(["MENTION"] * n), mention_key(t)]),
            label=schema.MENTION,
            name=t["key"].to_numpy(),
            full_name=t["canon"].to_numpy(),
            code=t["surface"].to_numpy(),
            order=t["ordinal"].to_numpy(),
            conv_id=t["conv_id"].to_numpy(),
            turn_idx=t["turn_idx"].to_numpy(),
            overlay=overlay,
        )

    def mention_edges(t: pd.DataFrame) -> pd.DataFrame:
        n = len(t)
        mid = ids.hash_series([pd.Series(["MENTION"] * n), mention_key(t)])
        tk = _turn_key(t["conv_id"], t["turn_idx"])
        tid = ids.hash_series([pd.Series(["TURN"] * n), tk])
        cid = ids.node_ids(schema.CONVERSATION, t["conv_id"])
        eid = ids.node_ids(schema.ENTITY, t["canon"])
        return pd.concat(
            [
                _edges_frame(n, src=tid, dst=mid, label=schema.AST,
                             order=t["ordinal"].to_numpy(), overlay=overlay),
                _edges_frame(n, src=cid, dst=mid, label=schema.CONTAINS, overlay=overlay),
                _edges_frame(n, src=mid, dst=eid, label=schema.REF, overlay=overlay),
            ],
            ignore_index=True,
        )

    # --- entity nodes (canonical; is_external = no fact participation) ----
    # linked = canonical keys in ANY fact: triple endpoints ∪ alias
    # participants (= every canon_map component — those keys appeared in an
    # alias_of fact by construction). Fully distributed: the entity vocab
    # is never driver-materialized (it grows with the corpus); only the
    # canon map and the linked-canon set (both vocab-dimension) broadcast.
    from ..functions.agg import hash_groupby
    from ..functions.joins import get_broadcast

    cmap = ctx.read_table("canonicalize", "canon_map").to_pandas()
    cmap_ref = ray.put(dict(zip(cmap["node"], cmap["component"])))
    tri_keys = ctx.read("link", "triples", columns=["subj", "obj"])

    def tri_key_partials(t: pd.DataFrame) -> pd.DataFrame:
        ks = pd.concat([t["subj"], t["obj"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame({"canon": ks})

    linked_canons = (
        hash_groupby(
            tri_keys.map_batches(tri_key_partials, batch_format="pandas"),
            "canon",
            lambda g: g.drop_duplicates("canon"),
        )
        .to_pandas()["canon"]
    )
    linked_ref = ray.put(frozenset(linked_canons) | frozenset(cmap["component"]))

    entity_keys = ctx.read("entities", "entity_keys")

    def canon_partials(t: pd.DataFrame) -> pd.DataFrame:
        cm = get_broadcast(cmap_ref)
        t = t.copy()
        t["canon"] = t["key"].map(cm).fillna(t["key"])
        return t.groupby("canon", as_index=False).agg(n_mentions=("n_mentions", "sum"))

    def entity_nodes_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        linked = get_broadcast(linked_ref)
        ents = g.groupby("canon", as_index=False).agg(n_mentions=("n_mentions", "sum"))
        ents = ents.sort_values("canon", ignore_index=True)  # usedTypes.sorted
        n = len(ents)
        return _nodes_frame(
            n,
            id=ids.node_ids(schema.ENTITY, ents["canon"]),
            label=schema.ENTITY,
            name=ents["canon"].to_numpy(),
            full_name=ents["canon"].to_numpy(),
            is_external=[c not in linked for c in ents["canon"]],
            overlay=overlay,
        )

    entity_nodes_ds = hash_groupby(
        entity_keys.map_batches(canon_partials, batch_format="pandas"),
        "canon",
        entity_nodes_of_bucket,
    )

    # --- REACHES edges from the reaching overlay --------------------------
    reaching = ctx.read("reaching", "reaching")

    def reaches_edges(t: pd.DataFrame) -> pd.DataFrame:
        n = len(t)
        src_tk = _turn_key(t["conv_id"], t["src_turn_idx"])
        dst_tk = _turn_key(t["conv_id"], t["dst_turn_idx"])
        return _edges_frame(
            n,
            src=ids.hash_series([pd.Series(["TURN"] * n), src_tk]),
            dst=ids.hash_series([pd.Series(["TURN"] * n), dst_tk]),
            label=schema.REACHES,
            variable=t["variable"].to_numpy(),
            overlay="reaching",
        )

    # --- FACT edges from triples ------------------------------------------
    triples = ctx.read("link", "triples")

    def fact_edges(t: pd.DataFrame) -> pd.DataFrame:
        n = len(t)
        return _edges_frame(
            n,
            src=ids.node_ids(schema.ENTITY, t["subj"]),
            dst=ids.node_ids(schema.ENTITY, t["obj"]),
            label=schema.FACT,
            variable=t["pred"].to_numpy(),
            overlay=overlay,
        )

    # --- META_DATA node (exactly one; carries the overlay ledger) ---------
    meta = _nodes_frame(
        1,
        id=[ids.node_id_scalar(schema.META_DATA, "kg")],
        label=schema.META_DATA,
        name="transcript-kg",
        full_name="codepropertygraph_ray/0.1.0",
        overlay="base",
    )

    import pyarrow as pa

    node_tbl_schema = schema.NODES_SCHEMA

    def to_nodes_arrow(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(df, schema=node_tbl_schema, preserve_index=False)

    nodes = (
        turns.map_batches(turn_nodes, batch_format="pandas")
        .union(dims.map_batches(dim_nodes, batch_format="pandas"))
        .union(mlinks.map_batches(mention_nodes, batch_format="pandas"))
        .union(entity_nodes_ds)
        .union(ray.data.from_pandas(meta))
        .map_batches(to_nodes_arrow, batch_format="pandas")
    )

    edge_tbl_schema = schema.EDGES_SCHEMA

    def to_edges_arrow(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(df, schema=edge_tbl_schema, preserve_index=False)

    from ..functions.agg import hash_groupby

    edges = (
        turns.map_batches(turn_edges, batch_format="pandas")
        .union(
            hash_groupby(
                turns.select_columns(["conv_id", "turn_idx"]),
                "conv_id",
                next_turn_edges,
            )
        )
        .union(mlinks.map_batches(mention_edges, batch_format="pandas"))
        .union(triples.map_batches(fact_edges, batch_format="pandas"))
        .union(reaching.map_batches(reaches_edges, batch_format="pandas"))
        .map_batches(to_edges_arrow, batch_format="pandas")
    )

    return {"nodes": nodes, "edges": edges}


# ---------------------------------------------------------------------------
# pass 05 — schema-facts validation (cpgvalidator analog)
# ---------------------------------------------------------------------------


def run_validate(ctx: PassContext) -> dict:
    from ..stages.validate import validate_graph

    nodes = ctx.read("materialize", "nodes")
    edges = ctx.read("materialize", "edges")
    return {"violations": validate_graph(nodes, edges, num_partitions=_p(ctx, "num_partitions"))}


# ---------------------------------------------------------------------------
# pipeline assembly
# ---------------------------------------------------------------------------

PASSES = [
    Pass("base", run_base),
    Pass("entities", run_entities, depends_on=("base",)),
    Pass("canonicalize", run_canonicalize, depends_on=("base",)),
    Pass("link", run_link, depends_on=("base", "canonicalize")),
    Pass("reaching", run_reaching, depends_on=("link",)),
    Pass("materialize", run_materialize, depends_on=("entities", "link", "reaching")),
    Pass("validate", run_validate, depends_on=("materialize",)),
]


def build_kg(sf_dir: str, out_dir: str, params: dict | None = None) -> PipelineRunner:
    """Run (or resume) the full pipeline; returns the runner (ledger has
    per-pass metrics; ctx has delta dirs for nodes/edges/triples)."""
    runner = PipelineRunner(PASSES, out_dir=out_dir, sf_dir=sf_dir, params=params)
    runner.run()
    return runner
