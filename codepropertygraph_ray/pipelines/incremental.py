"""Incremental corpus ingest — additive DiffGraph semantics for NEW data.

The reference's overlay model is strictly ADDITIVE: enhancement layers
append nodes/edges as numbered DiffGraphs over a frozen base
(`ProtoCpgLoader.scala:57-75`, `CpgLoader.addDiffGraphs:119-123`), and
loaders apply them in order without rewriting earlier layers. This module
transposes that to DATA increments: a new batch of conversations lands as
ONE appended overlay pass (``inc_<name>``) holding its own records /
entity-key / canon-map / triples / reaching / dom deltas plus its
node+edge graph tables (and ndim/tprops validator dims) — every table
uses the SAME name as the base pass's, so ``PassContext.read_logical``
and ``GraphView`` union base + every increment without rewriting anything.

**Multi-increment correctness**: the "old" state an increment checks
against is the LOGICAL union of the base build and every previously
applied ``inc_*`` overlay (keys, alias pairs, canon map, triples, node
dims) — increment N sees everything increments 1..N-1 added, so a chain
``inc1: E alias_of A`` then ``inc2: F alias_of E`` roots F at A without
touching E, duplicate facts across increments are anti-joined away, and
re-ingesting a conversation added by ANY earlier increment is rejected.

The additive contract has one invariant worth its name: **the canonical
id of every EXISTING key is frozen.** A new alias pair may attach new
keys to an existing component (their canon becomes the existing one —
fine, purely additive), but a pair that would CHANGE an existing key's
canon (merging two existing components, or re-rooting one under a new
lexicographically-smaller key) would invalidate every already-written
triple and REF edge. Such increments raise :class:`IncrementalMergeError`
listing the offending keys — the caller reruns a full build, exactly like
the reference regenerates a CPG when the base changes.

**Frozen node properties**: already-written ENTITY node rows are never
rewritten, so a base entity that gains fact participation via an
increment keeps its stored ``is_external`` (and the base ``entity_keys``
rows keep their build-time ``n_mentions``). The increment side-writes an
``entity_flips`` table naming every existing external entity the new
facts link; the query surface (``queries.entity_stats``) applies those
flips and re-aggregates mention counts over the logical union, so query
results match a full rebuild even though the raw node rows are frozen —
the DiffGraph "property update packed as data" discipline
(`DiffGraph.scala:114-146`).

At 100 TB this is the shape that matters: daily increments re-extract and
re-link ONLY the new conversations (corpus-scale work proportional to the
increment) plus pruned 3-column scans of the existing triples (distributed
anti-join) and entity_keys (alias-pair collection + broadcast-candidate
membership probes). Driver state is PAIR- or increment-scale throughout —
neither the corpus nor the mention-key vocabulary (which grows with the
corpus) is ever driver-materialized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .. import ids, schema
from ..functions.agg import empty_safe

_TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx"]


class IncrementalMergeError(RuntimeError):
    """The increment would change the canon of existing keys (additive
    contract violated) — run a full rebuild instead."""


def _read_inc(inc_path: str, columns):
    from ..sources.tables import read_table

    return read_table(inc_path, columns=columns)


def ingest_increment(runner, inc_path: str, name: str):
    """Append conversations from ``inc_path`` (transcripts-schema parquet)
    to an already-built KG at ``runner`` as ONE ledgered overlay pass.

    Idempotent via the pass ledger (same ``name`` re-runs are skipped,
    LayerCreator semantics); undoable via ``runner.undo_pass``.
    """
    from .passes import Pass

    def run(ctx):
        return _run_increment(ctx, inc_path, name)

    runner.run_extra(Pass(f"inc_{name}", run))
    return runner


def _empty_triples_frame() -> pd.DataFrame:
    return pd.DataFrame({
        "subj": pd.Series(dtype="object"), "pred": pd.Series(dtype="object"),
        "obj": pd.Series(dtype="object"), "conv_id": pd.Series(dtype="object"),
        "turn_idx": pd.Series(dtype="int32"),
    })


def _run_increment(ctx, inc_path: str, name: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pqt
    import ray

    from ..functions.agg import auto_buckets, hash_groupby
    from ..functions.cc import canonical_map
    from ..functions.joins import build_lookup, get_broadcast, lookup_keys
    from ..stages.extract import extract_batch
    from ..stages.reaching import reaching_pairs_of_bucket
    from .kg import _edges_frame, _nodes_frame, sparse_to_table

    overlay = f"inc_{name}"

    # ---- guard 1: increment conversations must be NEW ---------------------
    # Broadcast the SMALL side (the increment's conv node ids) and probe the
    # BIG side (the logical ndim union: base + every prior increment's node
    # dims) distributed — never driver-materialize the graph's id column.
    inc_convs = (
        _read_inc(inc_path, ["conv_id"]).map_batches(
            lambda t: t.drop_duplicates(), batch_format="pandas"
        ).to_pandas()["conv_id"].drop_duplicates()
    )
    conv_node_ids = np.sort(ids.node_ids(schema.CONVERSATION, inc_convs))
    conv_ids_ref = ray.put(conv_node_ids)

    def probe_known(t: pd.DataFrame) -> pd.DataFrame:
        cn = get_broadcast(conv_ids_ref)
        arr = t["id"].to_numpy()
        if not len(cn) or not len(arr):
            return empty_safe(pd.DataFrame({"id": pd.Series(dtype="int64")}))
        pos = np.clip(np.searchsorted(cn, arr), 0, len(cn) - 1)
        return empty_safe(pd.DataFrame({"id": arr[cn[pos] == arr]}))

    dup_ids = (
        ctx.read_logical("ndim", columns=["id"])
        .map_batches(probe_known, batch_format="pandas")
        .to_pandas()
    )
    if len(dup_ids):
        id2conv = dict(zip(ids.node_ids(schema.CONVERSATION, inc_convs), inc_convs))
        dups = sorted({id2conv[i] for i in dup_ids["id"] if i in id2conv})
        raise IncrementalMergeError(
            f"increment re-ingests existing conversations: {dups[:5]}"
        )

    # ---- extraction over the increment only -------------------------------
    inc_turns = _read_inc(inc_path, ["conv_id", "turn_idx", "text"])

    def extract_sorted(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable", ignore_index=True)
        return extract_batch(g)

    records = inc_turns.map_batches(
        extract_sorted, batch_format="pandas", batch_size=16384
    ).materialize()

    # ---- canon check + extension (PAIR-scale driver work only) ------------
    # "old" = LOGICAL union: base entities pass + every applied increment's
    # entity_keys/canon_map (each increment emits its alias pairs + new
    # canon rows under the same table names). The driver touches only
    # pair-scale tables (VERDICT r4 item 2): alias pairs collected from a
    # pruned DISTRIBUTED scan of entity_keys, and the canon map (pair-scale
    # by construction — canonical_map emits rows for alias participants
    # only). The vocab-scale key universe is never driver-materialized;
    # membership questions against it run as broadcast-candidate probes.
    old_pairs = (
        ctx.read_logical("entity_keys", columns=["key", "obj_key", "is_alias"])
        .map_batches(
            lambda t: empty_safe(
                t.loc[t["is_alias"], ["key", "obj_key"]].drop_duplicates()
            ),
            batch_format="pandas",
        )
        .to_pandas().drop_duplicates()
    )
    if "key" not in old_pairs.columns:  # all-empty read may drop columns
        old_pairs = pd.DataFrame({"key": pd.Series(dtype="object"),
                                  "obj_key": pd.Series(dtype="object")})
    old_map = ctx.read_logical_table("canon_map").to_pandas()
    old_lookup = build_lookup(old_map["node"], old_map["component"])

    def _probe_existing_keys(cands) -> set:
        """Which of ``cands`` exist in the OLD key universe (every mention
        key, alias endpoint, or canon-map node across base + prior
        increments)? Broadcast the sorted candidate array (increment-scale)
        and stream the vocab-scale entity_keys union through a distributed
        membership probe — the same shape as the dup-conversation guard.
        Canon-map nodes are alias-pair endpoints, so the entity_keys scan
        (key ∪ alias obj_key) covers the whole universe."""
        cands_arr = np.asarray(sorted(set(cands)), dtype=object)
        if not len(cands_arr):
            return set()
        cands_ref = ray.put(cands_arr)

        def probe(t: pd.DataFrame) -> pd.DataFrame:
            cs = get_broadcast(cands_ref)
            ks = pd.unique(pd.concat(
                [t["key"], t.loc[t["is_alias"], "obj_key"]], ignore_index=True
            ).dropna())
            if len(ks):
                ks = ks[ks != ""]
            if not len(ks):
                return empty_safe(pd.DataFrame({"key": pd.Series(dtype="object")}))
            pos = np.clip(np.searchsorted(cs, ks), 0, len(cs) - 1)
            return empty_safe(pd.DataFrame({"key": ks[cs[pos] == ks]}))

        found = (
            ctx.read_logical("entity_keys", columns=["key", "obj_key", "is_alias"])
            .map_batches(probe, batch_format="pandas")
            .to_pandas()
        )
        # an all-empty Dataset.to_pandas() can drop columns — treat as no hits
        return set(found["key"]) if "key" in found.columns else set()

    inc_partials = records.map_batches(
        lambda t: empty_safe(
            t.loc[(t["kind"] == "fact") & (t["pred"] == schema.ALIAS_PRED),
                  ["key", "obj_key"]].drop_duplicates()
        ),
        batch_format="pandas",
    ).to_pandas()
    all_pairs = pd.concat(
        [old_pairs.rename(columns={"key": "a", "obj_key": "b"}),
         inc_partials.rename(columns={"key": "a", "obj_key": "b"})],
        ignore_index=True,
    ).drop_duplicates()
    new_map = canonical_map(all_pairs)
    new_lookup = build_lookup(new_map["node"], new_map["component"])
    # frozen-canon check, CANDIDATE-scale: a key's canon can only change
    # for a node in the NEW map's domain (all_pairs ⊇ old pairs, so the
    # domain only grows; keys outside both domains canon to themselves in
    # both). A differing candidate violates the additive contract IFF the
    # key already exists in the old universe — a NEW key attaching to an
    # existing component (self → root) is the allowed additive case.
    old_c = lookup_keys(old_lookup, new_map["node"], default="self")
    cand_mask = old_c != new_map["component"].to_numpy(object)
    changed = (
        sorted(_probe_existing_keys(new_map.loc[cand_mask, "node"]))
        if cand_mask.any() else []
    )
    if changed:
        raise IncrementalMergeError(
            "increment would re-canonicalize existing keys (additive "
            f"contract): {changed[:5]}{'...' if len(changed) > 5 else ''}"
        )

    canon_lookup_ref = ray.put(new_lookup)

    def link_batch(t: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(canon_lookup_ref)
        t = t.copy()
        t["canon"] = lookup_keys(table, t["key"], default="self")
        t["obj_canon"] = lookup_keys(table, t["obj_key"], default="self")
        return t

    linked = records.map_batches(link_batch, batch_format="pandas").materialize()

    # ---- triples: DISTRIBUTED anti-join vs every existing triple ----------
    # Tag increment candidates (origin=1) and the pruned 3-column scan of
    # ALL existing triples (base + prior increments, origin=0), co-locate
    # by (subj, pred, obj) in one byte-scaled bucket exchange, and keep the
    # new rows with no old match in-bucket. The old side streams through
    # the shuffle; nothing corpus-scale reaches the driver.
    canons_dir = ctx.side_dir("linked_canons")

    def inc_fact_rows(t: pd.DataFrame) -> pd.DataFrame:
        f = t[(t["kind"] == "fact") & (t["pred"] != schema.ALIAS_PRED)]
        tri = pd.DataFrame(
            {"subj": f["canon"].to_numpy(), "pred": f["pred"].to_numpy(),
             "obj": f["obj_canon"].to_numpy(), "conv_id": f["conv_id"].to_numpy(),
             "turn_idx": f["turn_idx"].astype("int32").to_numpy()}
        ).sort_values(_TRIPLE_COLS).drop_duplicates(
            ["subj", "pred", "obj"], keep="first"  # per-batch combiner
        )
        tri["origin"] = np.int8(1)
        return empty_safe(tri.reset_index(drop=True))

    def old_triple_rows(t: pd.DataFrame) -> pd.DataFrame:
        out = t[["subj", "pred", "obj"]].copy()
        out["conv_id"] = ""
        out["turn_idx"] = np.int32(-1)
        out["origin"] = np.int8(0)
        return empty_safe(out)

    def anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        new = g.loc[g["origin"] == 1, _TRIPLE_COLS]
        if not len(new):
            return empty_safe(_empty_triples_frame())
        old = g.loc[g["origin"] == 0, ["subj", "pred", "obj"]].drop_duplicates()
        new = new.sort_values(_TRIPLE_COLS).drop_duplicates(
            ["subj", "pred", "obj"], keep="first"
        )
        if len(old):
            m = new.merge(old, on=["subj", "pred", "obj"], how="left", indicator=True)
            new = m.loc[m["_merge"] == "left_only", _TRIPLE_COLS]
        new = new.reset_index(drop=True)
        if len(new):
            import uuid as _uuid

            canons = pd.unique(pd.concat([new["subj"], new["obj"]],
                                         ignore_index=True))
            pqt.write_table(
                pa.table({"canon": pa.array(canons, type=pa.string())}),
                os.path.join(canons_dir, f"part-{_uuid.uuid4().hex}.parquet"),
                compression="zstd",
            )
        return empty_safe(new)

    old_triples_ds = ctx.read_logical(
        "triples", columns=["subj", "pred", "obj"]
    ).map_batches(old_triple_rows, batch_format="pandas")
    tagged = linked.map_batches(inc_fact_rows, batch_format="pandas").union(
        old_triples_ds
    )
    nb = auto_buckets(nbytes=ctx.logical_bytes("triples"))
    triples_inc = hash_groupby(
        tagged, ["subj", "pred", "obj"], anti_bucket, num_buckets=nb
    ).materialize()

    def reaching_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.loc[g["kind"] == "mention", ["conv_id", "turn_idx", "key"]]
        return empty_safe(reaching_pairs_of_bucket(m))

    reaching_inc = hash_groupby(linked, "conv_id", reaching_of_bucket)

    # ---- graph emission (additive overlay tables + validator dims) --------
    ndir, edir = ctx.side_dir("nodes"), ctx.side_dir("edges")
    dimdir, tpdir = ctx.side_dir("ndim"), ctx.side_dir("tprops")
    dim_labels = list(schema.NODE_LABELS)

    def write_graph(*parts) -> pa.Table:
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
                t, os.path.join(ndir if kind == "nodes" else edir, fname),
                compression="zstd",
            )
            if kind == "nodes":
                # validator dims for the increment's nodes, same layout as
                # the materialize pass — post-ingest validation unions them
                lab = t.column("label").to_pandas()
                code = pd.Categorical(lab, categories=dim_labels).codes.astype("int16")
                extc = t.column("is_external").to_pandas()
                pqt.write_table(
                    pa.table({
                        "id": t.column("id"),
                        "code": pa.array(code, pa.int16()),
                        "ext": pa.array(
                            (extc.notna() & extc.astype(object).eq(True)).to_numpy()
                        ),
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
                            "conv": pa.array(ids.hash_series([tt["conv_id"].fillna("")])),
                            "tidx": pa.array(
                                tt["turn_idx"].fillna(-1).astype("int32").to_numpy()
                            ),
                        }),
                        os.path.join(tpdir, fname), compression="zstd",
                    )
            names.append(kind)
            rows.append(t.num_rows)
        return pa.table({"table": names, "rows": rows},
                        schema=pa.schema([("table", pa.string()),
                                          ("rows", pa.int64())]))

    from ..functions.graph import conv_dominators_frame
    from .kg import _turn_key

    inc_full = _read_inc(inc_path, ["conv_id", "turn_idx", "role", "tool"])
    dom_dir = ctx.side_dir("dom")
    dom_schema = pa.schema(
        [("conv_id", pa.string()), ("kind", pa.string()),
         ("a", pa.int32()), ("b", pa.int32())]
    )
    _dom_label = {"dom": schema.DOMINATE, "pdom": schema.POST_DOMINATE,
                  "cdg": schema.CDG}

    def conv_graph_of_bucket(g: pd.DataFrame) -> pa.Table:
        import uuid as _uuid

        g = g.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        n = len(g)
        turn_ids = ids.composite_ids("TURN", g["conv_id"], g["turn_idx"])
        tk = _turn_key(g["conv_id"], g["turn_idx"])
        nodes = [_nodes_frame(
            n, id=turn_ids, label=schema.TURN, name=tk, full_name=tk,
            order=g["turn_idx"].to_numpy(), conv_id=g["conv_id"].to_numpy(),
            turn_idx=g["turn_idx"].to_numpy(), overlay=overlay,
        )]
        convs = g["conv_id"].drop_duplicates()
        nodes.append(_nodes_frame(
            len(convs), id=ids.node_ids(schema.CONVERSATION, convs),
            label=schema.CONVERSATION, name=convs.to_numpy(),
            full_name=convs.to_numpy(), conv_id=convs.to_numpy(),
            overlay=overlay,
        ))
        conv_node = ids.node_ids(schema.CONVERSATION, g["conv_id"])
        edges = [
            _edges_frame(n, src=conv_node, dst=turn_ids, label=schema.AST,
                         order=g["turn_idx"].to_numpy(), overlay=overlay),
            _edges_frame(n, src=turn_ids,
                         dst=ids.node_ids(schema.SPEAKER, g["role"]),
                         label=schema.SPOKEN_BY, overlay=overlay),
        ]
        # dominator / post-dominator / CDG overlay for the NEW conversations
        # (CfgDominatorPass/CdgPass analog — the merged graph must carry the
        # same per-conversation overlays a full rebuild would)
        dom = conv_dominators_frame(g[["conv_id", "turn_idx", "role"]])
        pqt.write_table(
            pa.Table.from_pandas(
                dom, schema=dom_schema, preserve_index=False
            ).replace_schema_metadata(None),
            os.path.join(dom_dir, f"part-{_uuid.uuid4().hex}.parquet"),
            compression="zstd",
        )
        if len(dom):
            edges.append(_edges_frame(
                len(dom),
                src=ids.composite_ids("TURN", dom["conv_id"], dom["a"]),
                dst=ids.composite_ids("TURN", dom["conv_id"], dom["b"]),
                label=dom["kind"].map(_dom_label).to_numpy(),
                overlay="dominators",
            ))
        nxt = g["conv_id"].eq(g["conv_id"].shift(-1)).to_numpy()
        if nxt.any():
            edges.append(_edges_frame(
                int(nxt.sum()), src=turn_ids[nxt], dst=np.roll(turn_ids, -1)[nxt],
                label=schema.NEXT_TURN, overlay=overlay,
            ))
        toolmask = ((g["role"] == "tool") & g["tool"].fillna("").ne("")).to_numpy()
        if toolmask.any():
            edges.append(_edges_frame(
                int(toolmask.sum()), src=turn_ids[toolmask],
                dst=ids.node_ids(schema.TOOL, g.loc[toolmask, "tool"]),
                label=schema.USES_TOOL, overlay=overlay,
            ))
        return write_graph(*[(f, "nodes") for f in nodes],
                           *[(f, "edges") for f in edges])

    conv_graph = hash_groupby(inc_full, "conv_id", conv_graph_of_bucket)

    def mention_graph(t: pd.DataFrame) -> pa.Table:
        m = t[t["kind"] == "mention"]
        n = len(m)
        mid = ids.composite_ids("MENTION", m["conv_id"], m["turn_idx"], m["ordinal"])
        nodes = _nodes_frame(
            n, id=mid, label=schema.MENTION, name=m["key"].to_numpy(),
            full_name=m["canon"].to_numpy(), code=m["surface"].to_numpy(),
            order=m["ordinal"].to_numpy(), conv_id=m["conv_id"].to_numpy(),
            turn_idx=m["turn_idx"].to_numpy(), overlay=overlay,
        )
        tid = ids.composite_ids("TURN", m["conv_id"], m["turn_idx"])
        cid = ids.node_ids(schema.CONVERSATION, m["conv_id"])
        eid = ids.node_ids(schema.ENTITY, m["canon"])
        return write_graph(
            (nodes, "nodes"),
            (_edges_frame(n, src=tid, dst=mid, label=schema.AST,
                          order=m["ordinal"].to_numpy(), overlay=overlay), "edges"),
            (_edges_frame(n, src=cid, dst=mid, label=schema.CONTAINS,
                          overlay=overlay), "edges"),
            (_edges_frame(n, src=mid, dst=eid, label=schema.REF,
                          overlay=overlay), "edges"),
        )

    mention_graph_ds = linked.map_batches(mention_graph, batch_format="pandas")

    # ---- NEW entity nodes + dim nodes (increment-scale, driver) -----------
    inc_mentions = linked.map_batches(
        lambda t: empty_safe(
            t.loc[t["kind"] == "mention", ["canon"]].drop_duplicates()
        ),
        batch_format="pandas",
    ).to_pandas()
    inc_fact_canons = triples_inc.map_batches(
        lambda t: empty_safe(pd.DataFrame(
            {"canon": np.concatenate([t["subj"].to_numpy(object),
                                      t["obj"].to_numpy(object)])}
        ).drop_duplicates()),
        batch_format="pandas",
    ).to_pandas()
    inc_canons = pd.unique(pd.concat(
        [inc_mentions["canon"], inc_fact_canons["canon"],
         pd.Series(new_map["component"].unique(), dtype="object")],
        ignore_index=True,
    ))
    # old canon universe = old keys ∪ old components; every component is
    # itself an alias-pair endpoint, so ONE distributed membership probe of
    # the key universe answers both (the old driver shape materialized the
    # whole vocab to build this set)
    new_entity_canons = sorted(set(inc_canons) - _probe_existing_keys(inc_canons))
    # base-build is_external semantics: linked ⟺ triple endpoint ∪ canon-map
    # component root (new canons can't appear in OLD triples, so increment
    # linkage + new roots is exactly the full-rebuild answer for them)
    linked_new = set(inc_fact_canons["canon"]) | set(new_map["component"])
    ent_nodes = _nodes_frame(
        len(new_entity_canons),
        id=ids.node_ids(schema.ENTITY, new_entity_canons),
        label=schema.ENTITY,
        name=np.asarray(new_entity_canons, dtype=object),
        full_name=np.asarray(new_entity_canons, dtype=object),
        is_external=np.array([c not in linked_new for c in new_entity_canons],
                             dtype=bool),
        overlay=overlay,
    )
    # EXISTING external entities the increment's facts now link: their node
    # rows are frozen (additive overlays never rewrite), so record the flip
    # as data for the query surface (entity_stats applies it).
    linked_new_ref = ray.put(np.sort(np.asarray(sorted(linked_new), dtype=object)))

    def flipped(t: pd.DataFrame) -> pd.DataFrame:
        e = t[(t["label"] == schema.ENTITY)
              & t["is_external"].astype(object).eq(True)]
        if not len(e):
            return empty_safe(pd.DataFrame({"canon": pd.Series(dtype="object")}))
        ln = get_broadcast(linked_new_ref)
        if not len(ln):
            return empty_safe(pd.DataFrame({"canon": pd.Series(dtype="object")}))
        arr = e["full_name"].to_numpy(object)
        pos = np.clip(np.searchsorted(ln, arr), 0, len(ln) - 1)
        return empty_safe(pd.DataFrame({"canon": arr[ln[pos] == arr]}))

    flips = (
        ctx.read_logical("nodes", columns=["label", "full_name", "is_external"])
        .map_batches(flipped, batch_format="pandas")
        .to_pandas().drop_duplicates()
    )
    # old dim vocab via a pruned logical scan (base + prior increments)
    old_dims = (
        ctx.read_logical("nodes", columns=["label", "name"])
        .map_batches(
            lambda t: empty_safe(
                t[t["label"].isin([schema.SPEAKER, schema.TOOL])].drop_duplicates()
            ),
            batch_format="pandas",
        )
        .to_pandas().drop_duplicates()
    )
    have_dims = set(zip(old_dims["label"], old_dims["name"]))
    inc_dims = (
        inc_full.map_batches(
            lambda t: empty_safe(pd.concat([
                pd.DataFrame({"label": schema.SPEAKER, "name": t["role"]}),
                pd.DataFrame({"label": schema.TOOL,
                              "name": t.loc[(t["role"] == "tool")
                                            & t["tool"].fillna("").ne(""), "tool"]}),
            ], ignore_index=True).drop_duplicates()),
            batch_format="pandas",
        )
        .to_pandas().drop_duplicates()
    )
    if len(inc_dims):
        mask = [
            (lbl, nm) not in have_dims
            for lbl, nm in zip(inc_dims["label"], inc_dims["name"])
        ]
        new_dims = inc_dims[np.asarray(mask, dtype=bool)]
    else:
        new_dims = inc_dims
    dim_nodes = _nodes_frame(
        len(new_dims),
        id=np.concatenate([
            ids.node_ids(lbl, new_dims.loc[new_dims["label"] == lbl, "name"])
            for lbl in (schema.SPEAKER, schema.TOOL)
        ]) if len(new_dims) else np.empty(0, np.int64),
        label=pd.concat([
            new_dims.loc[new_dims["label"] == lbl, "label"]
            for lbl in (schema.SPEAKER, schema.TOOL)
        ]).to_numpy() if len(new_dims) else np.empty(0, object),
        name=pd.concat([
            new_dims.loc[new_dims["label"] == lbl, "name"]
            for lbl in (schema.SPEAKER, schema.TOOL)
        ]).to_numpy() if len(new_dims) else np.empty(0, object),
        full_name=pd.concat([
            new_dims.loc[new_dims["label"] == lbl, "name"]
            for lbl in (schema.SPEAKER, schema.TOOL)
        ]).to_numpy() if len(new_dims) else np.empty(0, object),
        overlay=overlay,
    )
    write_graph((ent_nodes, "nodes"), (dim_nodes, "nodes"))

    def fact_graph(t: pd.DataFrame) -> pa.Table:
        n = len(t)
        return write_graph((_edges_frame(
            n, src=ids.node_ids(schema.ENTITY, t["subj"]),
            dst=ids.node_ids(schema.ENTITY, t["obj"]),
            label=schema.FACT, variable=t["pred"].to_numpy(), overlay=overlay,
        ), "edges"))

    def reaches_graph(t: pd.DataFrame) -> pa.Table:
        n = len(t)
        return write_graph((_edges_frame(
            n, src=ids.composite_ids("TURN", t["conv_id"], t["src_turn_idx"]),
            dst=ids.composite_ids("TURN", t["conv_id"], t["dst_turn_idx"]),
            label=schema.REACHES, variable=t["variable"].to_numpy(),
            overlay=overlay,
        ), "edges"))

    reaching_cached = reaching_inc.materialize()
    summaries = (
        conv_graph
        .union(mention_graph_ds)
        .union(triples_inc.map_batches(fact_graph, batch_format="pandas"))
        .union(reaching_cached.map_batches(reaches_graph, batch_format="pandas"))
    )
    summaries.count()

    # ---- pass deltas: SAME table names as the base passes ------------------
    # entity_keys: mention-count PARTIALS for every inc key (union readers
    # re-aggregate, so existing keys' totals stay correct) + the increment's
    # new alias-pair rows, in the base 4-column schema
    inc_keys = records.map_batches(
        lambda t: empty_safe(
            t.loc[t["kind"] == "mention"]
            .groupby("key", as_index=False).size()
            .rename(columns={"size": "n_mentions"})
        ),
        batch_format="pandas",
    ).to_pandas()
    if len(inc_keys):
        inc_keys = inc_keys.groupby("key", as_index=False)["n_mentions"].sum()
    else:
        inc_keys = pd.DataFrame({"key": pd.Series(dtype="object"),
                                 "n_mentions": pd.Series(dtype="int64")})
    ment_rows = pd.DataFrame({
        "key": inc_keys["key"].to_numpy(object),
        "n_mentions": inc_keys["n_mentions"].to_numpy(np.int64),
        "obj_key": np.full(len(inc_keys), "", dtype=object),
        "is_alias": np.zeros(len(inc_keys), dtype=bool),
    })
    old_pair_set = set(zip(old_pairs["key"], old_pairs["obj_key"]))
    new_pairs = inc_partials[[
        (a, b) not in old_pair_set
        for a, b in zip(inc_partials["key"], inc_partials["obj_key"])
    ]] if len(inc_partials) else inc_partials
    alias_rows = pd.DataFrame({
        "key": new_pairs["key"].to_numpy(object),
        "n_mentions": np.zeros(len(new_pairs), np.int64),
        "obj_key": new_pairs["obj_key"].to_numpy(object),
        "is_alias": np.ones(len(new_pairs), dtype=bool),
    })
    ek_delta = pd.concat([ment_rows, alias_rows], ignore_index=True)
    cm_new = new_map[~new_map["node"].isin(set(old_map["node"]))]

    _EK_SCHEMA = pa.schema([
        ("key", pa.string()), ("n_mentions", pa.int64()),
        ("obj_key", pa.string()), ("is_alias", pa.bool_()),
    ])
    _CM_SCHEMA = pa.schema([("node", pa.string()), ("component", pa.string())])
    _FLIP_SCHEMA = pa.schema([("canon", pa.string())])

    def _typed(df: pd.DataFrame, sch: pa.Schema) -> pa.Table:
        # an all-empty Dataset.to_pandas() can drop columns — rebuild them
        for f in sch:
            if f.name not in df.columns:
                df = df.assign(**{f.name: pd.Series(dtype="object")})
        obj_cols = {f.name: "object" for f in sch if f.type == pa.string()}
        return pa.Table.from_pandas(
            df[[f.name for f in sch]].reset_index(drop=True).astype(obj_cols),
            schema=sch, preserve_index=False,
        ).replace_schema_metadata(None)

    return {
        "records": records,
        "triples": triples_inc,
        "reaching": reaching_cached,
        "entity_keys": _typed(ek_delta, _EK_SCHEMA),
        "canon_map": _typed(
            cm_new.astype({"node": "object", "component": "object"}), _CM_SCHEMA
        ),
        "entity_flips": _typed(flips, _FLIP_SCHEMA),
    }
