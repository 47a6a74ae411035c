"""Incremental corpus ingest — additive DiffGraph semantics for NEW data.

The reference's overlay model is strictly ADDITIVE: enhancement layers
append nodes/edges as numbered DiffGraphs over a frozen base
(`ProtoCpgLoader.scala:57-75`, `CpgLoader.addDiffGraphs:119-123`), and
loaders apply them in order without rewriting earlier layers. This module
transposes that to DATA increments: a new batch of conversations lands as
ONE appended overlay pass (``inc_<name>``) holding its own records /
entity-key / canon-map / triples / reaching deltas plus its node+edge
graph tables — `GraphView` already unions overlay dirs in numeric order,
so the merged graph needs no rewrite of any earlier pass.

The additive contract has one invariant worth its name: **the canonical
id of every EXISTING key is frozen.** A new alias pair may attach new
keys to an existing component (their canon becomes the existing one —
fine, purely additive), but a pair that would CHANGE an existing key's
canon (merging two existing components, or re-rooting one under a new
lexicographically-smaller key) would invalidate every already-written
triple and REF edge. Such increments raise :class:`IncrementalMergeError`
listing the offending keys — the caller reruns a full build, exactly like
the reference regenerates a CPG when the base changes.

At 100 TB this is the shape that matters: daily increments re-extract and
re-link ONLY the new conversations (corpus-scale work proportional to the
increment), while the vocab-scale dimension work (canon check, new-entity
detection) stays driver-cheap.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .. import ids, schema
from ..functions.agg import empty_safe


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


def _run_increment(ctx, inc_path: str, name: str) -> dict:
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pqt
    import ray

    from ..functions.agg import hash_groupby
    from ..functions.cc import canonical_map
    from ..functions.joins import build_lookup, get_broadcast, lookup_keys
    from ..stages.extract import extract_batch
    from ..stages.reaching import reaching_pairs_of_bucket
    from .kg import _edges_frame, _nodes_frame, sparse_to_table

    overlay = f"inc_{name}"

    # ---- guard 1: increment conversations must be NEW ---------------------
    inc_convs = (
        _read_inc(inc_path, ["conv_id"]).map_batches(
            lambda t: t.drop_duplicates(), batch_format="pandas"
        ).to_pandas()["conv_id"].drop_duplicates()
    )
    mat_dir = os.path.dirname(ctx.delta_dir("materialize", "nodes"))
    known_parts = [
        pads.dataset(os.path.join(mat_dir, "ndim")).to_table(["id"]).column("id").to_numpy()
    ]
    # prior increments registered their own node tables — include them so a
    # re-ingest under a DIFFERENT pass name is still rejected
    for key, d in ctx._dirs.items():
        if key.startswith("inc_") and key.endswith("/nodes"):
            known_parts.append(
                pads.dataset(d).to_table(["id"]).column("id").to_numpy()
            )
    known_sorted = np.sort(np.concatenate(known_parts))
    conv_node_ids = ids.node_ids(schema.CONVERSATION, inc_convs)
    pos = np.clip(np.searchsorted(known_sorted, conv_node_ids), 0,
                  max(len(known_sorted) - 1, 0))
    dup = known_sorted[pos] == conv_node_ids if len(known_sorted) else np.zeros(0, bool)
    if dup.any():
        raise IncrementalMergeError(
            f"increment re-ingests existing conversations: "
            f"{sorted(inc_convs[dup].head(5))}"
        )

    # ---- extraction over the increment only -------------------------------
    inc_turns = _read_inc(inc_path, ["conv_id", "turn_idx", "text"])

    def extract_sorted(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable", ignore_index=True)
        return extract_batch(g)

    records = inc_turns.map_batches(
        extract_sorted, batch_format="pandas", batch_size=16384
    ).materialize()

    # ---- canon check + extension (vocab-scale driver work) ----------------
    old_keys_tbl = ctx.read_table("entities", "entity_keys",
                                  columns=["key", "obj_key", "is_alias"]).to_pandas()
    old_pairs = old_keys_tbl.loc[old_keys_tbl["is_alias"], ["key", "obj_key"]]
    old_map = ctx.read_table("entities", "canon_map").to_pandas()
    old_canon = dict(zip(old_map["node"], old_map["component"]))
    old_keys = pd.unique(old_keys_tbl["key"])

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
    new_canon = dict(zip(new_map["node"], new_map["component"]))
    changed = [
        k for k in old_keys
        if new_canon.get(k, k) != old_canon.get(k, k)
    ]
    if changed:
        raise IncrementalMergeError(
            "increment would re-canonicalize existing keys (additive "
            f"contract): {sorted(changed)[:5]}{'...' if len(changed) > 5 else ''}"
        )

    canon_lookup_ref = ray.put(build_lookup(new_map["node"], new_map["component"]))

    # ---- link the increment: triples (deduped vs old) + reaching ----------
    old_triples = ctx.read_table("link", "triples",
                                 columns=["subj", "pred", "obj"]).to_pandas()
    old_tkeys = np.sort(ids.hash_series(
        [old_triples["subj"], old_triples["pred"], old_triples["obj"]]
    ))
    old_tkeys_ref = ray.put(old_tkeys)

    def link_batch(t: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(canon_lookup_ref)
        t = t.copy()
        t["canon"] = lookup_keys(table, t["key"], default="self")
        t["obj_canon"] = lookup_keys(table, t["obj_key"], default="self")
        return t

    linked = records.map_batches(link_batch, batch_format="pandas").materialize()

    def triples_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        f = g[(g["kind"] == "fact") & (g["pred"] != schema.ALIAS_PRED)]
        tri = pd.DataFrame(
            {"subj": f["canon"].to_numpy(), "pred": f["pred"].to_numpy(),
             "obj": f["obj_canon"].to_numpy(), "conv_id": f["conv_id"].to_numpy(),
             "turn_idx": f["turn_idx"].astype("int32").to_numpy()}
        ).sort_values(["subj", "pred", "obj", "conv_id", "turn_idx"])
        tri = tri.drop_duplicates(["subj", "pred", "obj"], keep="first")
        if not len(tri):
            return empty_safe(tri)
        keys = ids.hash_series([tri["subj"], tri["pred"], tri["obj"]])
        old = get_broadcast(old_tkeys_ref)
        if len(old):
            p = np.clip(np.searchsorted(old, keys), 0, len(old) - 1)
            tri = tri[old[p] != keys]  # anti-join against already-known triples
        return empty_safe(tri.reset_index(drop=True))

    triples_inc = hash_groupby(linked, ["canon", "pred", "obj_canon"],
                               triples_of_bucket).materialize()

    def reaching_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.loc[g["kind"] == "mention", ["conv_id", "turn_idx", "key"]]
        return empty_safe(reaching_pairs_of_bucket(m))

    reaching_inc = hash_groupby(linked, "conv_id", reaching_of_bucket)

    # ---- graph emission for the increment (additive overlay tables) -------
    ndir, edir = ctx.side_dir("nodes"), ctx.side_dir("edges")

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
            names.append(kind)
            rows.append(t.num_rows)
        return pa.table({"table": names, "rows": rows},
                        schema=pa.schema([("table", pa.string()),
                                          ("rows", pa.int64())]))

    from .kg import _turn_key

    inc_full = _read_inc(inc_path, ["conv_id", "turn_idx", "role", "tool"])

    def conv_graph_of_bucket(g: pd.DataFrame) -> pa.Table:
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
            full_name=convs.to_numpy(), overlay=overlay,
        ))
        conv_node = ids.node_ids(schema.CONVERSATION, g["conv_id"])
        edges = [
            _edges_frame(n, src=conv_node, dst=turn_ids, label=schema.AST,
                         order=g["turn_idx"].to_numpy(), overlay=overlay),
            _edges_frame(n, src=turn_ids,
                         dst=ids.node_ids(schema.SPEAKER, g["role"]),
                         label=schema.SPOKEN_BY, overlay=overlay),
        ]
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

    # ---- NEW entity nodes + dim nodes (vocab-scale, driver) ---------------
    # old canon universe = canon of every old key; old dim vocab via a
    # pruned scan of the existing nodes (dimension-sized results)
    old_canons = {old_canon.get(k, k) for k in old_keys}
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
         pd.Series(list(new_canon.values()), dtype="object")],
        ignore_index=True,
    ))
    new_entity_canons = sorted(set(inc_canons) - old_canons)
    linked_new = (
        set(inc_fact_canons["canon"]) | set(new_canon) | set(new_canon.values())
    )
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
    old_dims = (
        ctx.read("materialize", "nodes", columns=["label", "name"])
        .map_batches(
            lambda t: empty_safe(
                t[t["label"].isin([schema.SPEAKER, schema.TOOL])].drop_duplicates()
            ),
            batch_format="pandas",
        )
        .to_pandas()
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
    new_dims = inc_dims[~inc_dims.apply(
        lambda r: (r["label"], r["name"]) in have_dims, axis=1
    )] if len(inc_dims) else inc_dims
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

    # new-key entity dimension rows + new canon-map rows, as pass deltas
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
    new_key_rows = inc_keys[~inc_keys["key"].isin(set(old_keys))]
    cm_new = new_map[~new_map["node"].isin(set(old_canon))]

    return {
        "records": records,
        "triples": triples_inc,
        "reaching": reaching_cached,
        "entity_keys_new": pa.Table.from_pandas(
            new_key_rows.reset_index(drop=True), preserve_index=False
        ).replace_schema_metadata(None),
        "canon_map_new": pa.Table.from_pandas(
            cm_new.reset_index(drop=True), preserve_index=False
        ).replace_schema_metadata(None),
    }
