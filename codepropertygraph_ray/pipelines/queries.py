"""Query surface over the KG pipeline outputs (the driver-contract entries).

Each function takes ``sf_dir`` and returns a Dataset / DataFrame whose
columns match the paired DuckDB oracle SQL in ``__ray_entry__.py`` exactly.
The underlying pipeline run is resumable and cached per sf dir (overlay
ledger semantics) so the first KG query pays the build and the rest are
parquet reads — mirroring how the reference loads a stored CPG once and
serves many traversals (`CpgLoader.scala:22-41`).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .kg import build_kg

KG_OUT_ROOT = "/tmp/graft_kg_out_v3"  # bump on pass-layout/id-format changes:
# stale ledgers from an older layout must not be resumed into the new one
# (v3: composite numeric turn/mention ids)


def kg_runner(sf_dir: str):
    name = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return build_kg(sf_dir, os.path.join(KG_OUT_ROOT, name))


def mentions(sf_dir: str):
    """(conv_id, turn_idx, ordinal, surface, key) — extraction surface."""
    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical(
        "records",
        columns=["kind", "conv_id", "turn_idx", "ordinal", "surface", "key"])
    return ds.map_batches(
        lambda t: t[t["kind"] == "mention"].drop(columns=["kind"]),
        batch_format="pandas",
    )


def facts(sf_dir: str):
    """(conv_id, turn_idx, ordinal, subj_key, pred, obj_key) — raw facts."""
    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical(
        "records",
        columns=["kind", "conv_id", "turn_idx", "ordinal", "key", "pred", "obj_key"])
    return ds.map_batches(
        lambda t: t[t["kind"] == "fact"]
        .drop(columns=["kind"])
        .rename(columns={"key": "subj_key"}),
        batch_format="pandas",
    )


def entity_keys(sf_dir: str):
    """(key, n_mentions) — the distinct-mention-key dimension (the entities
    delta also carries the alias-pair rows of the fused pass; filter them).
    Reads the LOGICAL union (base + increments) and re-aggregates: an
    increment emits mention-count PARTIALS for keys it touches, so the sum
    reproduces the full-rebuild totals."""
    from ..functions.agg import hash_agg

    ds = kg_runner(sf_dir).ctx.read_logical(
        "entity_keys", columns=["key", "n_mentions", "is_alias"]
    )
    ments = ds.map_batches(
        lambda t: t.loc[~t["is_alias"], ["key", "n_mentions"]],
        batch_format="pandas",
    )
    return hash_agg(ments, "key", n_mentions=("n_mentions", "sum"))


def canonical_map(sf_dir: str):
    """(key, canon) for EVERY distinct mention key (un-aliased → itself)."""
    r = kg_runner(sf_dir)
    ek = (
        r.ctx.read_logical_table("entity_keys", columns=["key", "is_alias"])
        .to_pandas()
    )
    ek = ek.loc[~ek["is_alias"], ["key"]].drop_duplicates()
    cm = r.ctx.read_logical_table("canon_map").to_pandas()
    out = ek.merge(cm, left_on="key", right_on="node", how="left")
    out["canon"] = out["component"].fillna(out["key"])
    return out[["key", "canon"]].sort_values("key", ignore_index=True)


def canonical_map_distributed(sf_dir: str):
    """(key, canon) — identical semantics to :func:`canonical_map`, but the
    union-find runs on the FORCED hash-min label-propagation path
    (``functions/cc.cc_distributed``): per round, two bucketed shuffles
    propagate labels one hop and take the min, until the changed-count
    aggregate hits 0. This is the 100-TB path the auto-switch picks above
    ``DRIVER_CC_MAX_EDGES``; exposing it as its own oracle-gated query puts
    the distributed rounds (not just the driver union-find) under the
    side-by-side DuckDB check."""
    import ray.data

    from ..functions.cc import canonical_map as cc_canonical_map

    r = kg_runner(sf_dir)
    ek = (
        r.ctx.read_logical_table("entity_keys", columns=["key", "is_alias"])
        .to_pandas()
    )
    rec = r.ctx.read_logical("records", columns=["kind", "pred", "key", "obj_key"])
    from ..functions.agg import empty_safe

    alias_pairs = rec.map_batches(
        lambda t: empty_safe(
            t.loc[(t["kind"] == "fact") & (t["pred"] == "alias_of"),
                  ["key", "obj_key"]]
            .rename(columns={"key": "a", "obj_key": "b"})
            .drop_duplicates()
        ),
        batch_format="pandas",
    )
    cm = cc_canonical_map(alias_pairs, distributed=True)
    keys = ek.loc[~ek["is_alias"], ["key"]].drop_duplicates()
    out = keys.merge(cm, left_on="key", right_on="node", how="left")
    out["canon"] = out["component"].fillna(out["key"])
    return out[["key", "canon"]].sort_values("key", ignore_index=True)


def triples(sf_dir: str):
    """(subj, pred, obj, conv_id, turn_idx) — canonical triples with
    earliest-stating-turn lineage. THE flagship output."""
    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical("triples")
    return ds.map_batches(
        lambda t: t.assign(turn_idx=t["turn_idx"].astype("int32"))[
            ["subj", "pred", "obj", "conv_id", "turn_idx"]
        ],
        batch_format="pandas",
    )


def entity_stats(sf_dir: str):
    """(canon, n_mentions, is_external) per canonical entity.

    Fully distributed (VERDICT r4 item 7): the ENTITY node slice and the
    mention-count partials are TAGGED sides of ONE canon-keyed bucketed
    exchange, joined in-bucket — neither the node table nor entity_keys
    is driver-materialized; only the pair-scale canon map and the
    increment-scale flip set broadcast. The collected output is the
    query's RESULT (entity-dimension), not an intermediate.

    Post-ingest correctness: node rows are additive overlays and never
    rewritten, so an existing external entity that gained fact linkage via
    an increment keeps a stale ``is_external`` on its NODE row; each
    increment records those canons in an ``entity_flips`` side table and
    this query applies them (the DiffGraph property-update-as-data
    discipline — see pipelines/incremental.py)."""
    import numpy as np
    import ray

    from ..functions.agg import empty_safe, hash_groupby
    from ..functions.joins import build_lookup, get_broadcast, lookup_keys

    r = kg_runner(sf_dir)
    cm = r.ctx.read_logical_table("canon_map").to_pandas()  # pair-scale
    lookup_ref = ray.put(build_lookup(cm["node"], cm["component"]))
    flips_ref = ray.put(
        np.sort(np.asarray(sorted(_entity_flips(r)), dtype=object))
    )

    COLS = ["canon", "n_mentions", "is_external", "kind"]

    def ent_rows(t: pd.DataFrame) -> pd.DataFrame:
        e = t[t["label"] == "ENTITY"]
        return empty_safe(pd.DataFrame({
            "canon": e["full_name"].to_numpy(object),
            "n_mentions": np.zeros(len(e), np.int64),
            "is_external": e["is_external"].astype(object).eq(True).to_numpy(),
            "kind": np.full(len(e), "e", object),
        })[COLS])

    def count_rows(t: pd.DataFrame) -> pd.DataFrame:
        k = t[~t["is_alias"]]
        canon = lookup_keys(get_broadcast(lookup_ref), k["key"], default="self")
        part = (
            pd.DataFrame({"canon": canon,
                          "n_mentions": k["n_mentions"].to_numpy(np.int64)})
            .groupby("canon", as_index=False)["n_mentions"].sum()
        )
        part["is_external"] = False
        part["kind"] = "c"
        return empty_safe(part[COLS])

    nodes = r.ctx.read_logical(
        "nodes", columns=["label", "full_name", "is_external"]
    ).map_batches(ent_rows, batch_format="pandas")
    counts = r.ctx.read_logical(
        "entity_keys", columns=["key", "n_mentions", "is_alias"]
    ).map_batches(count_rows, batch_format="pandas")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g.loc[g["kind"] == "e", ["canon", "is_external"]]
        c = (
            g.loc[g["kind"] == "c"]
            .groupby("canon", as_index=False)["n_mentions"].sum()
        )
        out = e.merge(c, on="canon", how="left")
        out["n_mentions"] = out["n_mentions"].fillna(0).astype("int64")
        out["is_external"] = out["is_external"].astype(bool)
        fl = get_broadcast(flips_ref)
        if len(fl) and len(out):
            arr = out["canon"].to_numpy(object)
            pos = np.clip(np.searchsorted(fl, arr), 0, len(fl) - 1)
            out.loc[fl[pos] == arr, "is_external"] = False
        return empty_safe(out[["canon", "n_mentions", "is_external"]])

    res = hash_groupby(nodes.union(counts), "canon", join_bucket).to_pandas()
    if "canon" not in res.columns:  # all-empty read may drop columns
        res = pd.DataFrame({"canon": pd.Series(dtype="object"),
                            "n_mentions": pd.Series(dtype="int64"),
                            "is_external": pd.Series(dtype="bool")})
    return res.astype({"n_mentions": "int64", "is_external": "bool"}).sort_values(
        "canon", ignore_index=True
    )


def _entity_flips(r) -> set:
    """Union of every increment's entity_flips table (empty pre-ingest)."""
    import pyarrow.dataset as pads

    canons: set = set()
    for key, d in sorted(r.ctx._dirs.items()):
        if key.split("/", 1)[1] == "entity_flips":
            import os as _os

            files = [f for f in _os.listdir(d) if f.endswith(".parquet")]
            if files:
                canons |= set(pads.dataset(d).to_table().column("canon").to_pylist())
    return canons


def conv_stats(sf_dir: str):
    """(conv_id, n_turns, n_mentions, n_facts) — per-conversation rollup."""
    from ray.data.aggregate import Sum

    from ..sources.transcripts import ensure_transcripts

    import ray.data

    r = kg_runner(sf_dir)
    rec = r.ctx.read_logical("records", columns=["kind", "conv_id"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        g = (
            t.assign(m=(t["kind"] == "mention").astype("int64"),
                     f=(t["kind"] == "fact").astype("int64"))
            .groupby("conv_id", as_index=False)
            .agg(n_mentions=("m", "sum"), n_facts=("f", "sum"))
        )
        return g

    from ..functions.agg import hash_agg

    per_conv = hash_agg(
        rec.map_batches(partial, batch_format="pandas"),
        "conv_id",
        n_mentions=("n_mentions", "sum"),
        n_facts=("n_facts", "sum"),
    ).to_pandas()

    # n_turns from the graph's TURN nodes (logical union) — post-ingest the
    # sf transcripts don't include increment conversations, the graph does
    turns = r.ctx.read_logical("nodes", columns=["label", "conv_id"]).map_batches(
        lambda t: t.loc[t["label"] == "TURN", ["conv_id"]], batch_format="pandas"
    )
    tc = hash_agg(
        turns.map_batches(
            lambda t: t.groupby("conv_id", as_index=False).agg(n_turns=("conv_id", "size")),
            batch_format="pandas",
        ),
        "conv_id",
        n_turns=("n_turns", "sum"),
    ).to_pandas()
    out = tc.merge(per_conv, on="conv_id", how="left")
    for c in ("n_mentions", "n_facts"):
        out[c] = out[c].fillna(0).astype("int64")
    return out[["conv_id", "n_turns", "n_mentions", "n_facts"]]


def tool_usage(sf_dir: str):
    """(tool, n_turns) — dimension rollup over tool turns, computed from
    the GRAPH (one USES_TOOL edge per tool turn, grouped by the TOOL
    dimension node): post-ingest the union graph carries increment turns
    the sf transcripts don't. TOOL nodes are a vocab-scale dimension —
    broadcast the id→name map and count edges distributed."""
    import ray

    from ..functions.agg import empty_safe, hash_agg
    from ..functions.joins import get_broadcast

    r = kg_runner(sf_dir)
    tools = (
        r.ctx.read_logical("nodes", columns=["label", "id", "name"])
        .map_batches(
            lambda t: empty_safe(t.loc[t["label"] == "TOOL", ["id", "name"]]),
            batch_format="pandas",
        )
        .to_pandas().drop_duplicates("id")
    )
    name_ref = ray.put(dict(zip(tools["id"], tools["name"])))

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        e = t[t["label"] == "USES_TOOL"]
        vc = e["dst"].value_counts()
        names = pd.Series(vc.index).map(get_broadcast(name_ref))
        return empty_safe(pd.DataFrame(
            {"tool": names.to_numpy(object), "n_turns": vc.to_numpy(np.int64)}
        ))

    edges = r.ctx.read_logical("edges", columns=["label", "dst"])
    return hash_agg(
        edges.map_batches(partial, batch_format="pandas"),
        "tool",
        n_turns=("n_turns", "sum"),
    )


def external_entities(sf_dir: str):
    """(canon) — canonical entities with zero fact participation (the
    placeholder/stub population, MethodStubCreator analog)."""
    es = entity_stats(sf_dir)
    return es.loc[es["is_external"], ["canon"]].reset_index(drop=True)


def next_turn_pairs(sf_dir: str):
    """(conv_id, turn_idx, next_turn_idx) — the NEXT_TURN (CFG-successor)
    relation, built per conversation group over the graph's TURN nodes
    (logical union, so increment conversations are included)."""
    from ..functions.agg import hash_groupby

    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical(
        "nodes", columns=["label", "conv_id", "turn_idx"]
    ).map_batches(
        lambda t: t.loc[t["label"] == "TURN", ["conv_id", "turn_idx"]],
        batch_format="pandas",
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # bucket of whole conversations → vectorized shift across them
        g = g.sort_values(["conv_id", "turn_idx"], ignore_index=True)
        same = (g["conv_id"].shift(-1) == g["conv_id"]).to_numpy()
        t = g["turn_idx"].to_numpy()
        keep = same[:-1] if len(same) else same
        return pd.DataFrame(
            {"conv_id": g["conv_id"].to_numpy()[:-1][keep],
             "turn_idx": t[:-1][keep].astype("int32"),
             "next_turn_idx": t[1:][keep].astype("int32")}
        )

    return hash_groupby(ds, "conv_id", pairs)


def node_label_counts(sf_dir: str):
    """(label, n_nodes) — graph-shape summary (well-formedness surface)."""
    from ray.data.aggregate import Sum

    r = kg_runner(sf_dir)
    nodes = r.ctx.read_logical("nodes", columns=["label"])

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        vc = t["label"].value_counts()
        return pd.DataFrame({"label": vc.index, "n_nodes": vc.to_numpy(np.int64)})

    return (
        nodes.map_batches(partial, batch_format="pandas")
        .groupby("label")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
    )


def reaching_mentions_pairs(sf_dir: str):
    """(conv_id, src_turn_idx, dst_turn_idx, variable) — the REACHING_DEF
    overlay rows (stages/reaching.py, side-written by the fused link pass)."""
    return kg_runner(sf_dir).ctx.read_logical("reaching")


def dominators(sf_dir: str):
    """(conv_id, turn_idx, idom_turn_idx) — immediate dominators of every
    non-entry turn over the conversation reply graph (CfgDominatorPass
    analog, `CfgDominatorPass.scala:15-60`). The SQL oracle uses the
    interval-DAG closed form (m dom n ⟺ no edge spans m below n); the Ray
    side runs Cooper-Harvey-Kennedy per conversation — agreement IS the
    algorithm check."""
    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical("dom")
    return ds.map_batches(
        lambda t: t.loc[t["kind"] == "dom", ["conv_id", "b", "a"]].rename(
            columns={"b": "turn_idx", "a": "idom_turn_idx"}
        ),
        batch_format="pandas",
    )


def cdg_pairs(sf_dir: str):
    """(conv_id, controller, dependent) — control-dependence edges over the
    conversation reply graph (CdgPass analog via dominance frontier of the
    reverse graph, `CdgPass.scala:17-54`, `CfgDominatorFrontier.scala:14-38`).
    SQL oracle: Ferrante's definition with the interval-DAG span predicate."""
    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical("dom")
    return ds.map_batches(
        lambda t: t.loc[t["kind"] == "cdg", ["conv_id", "a", "b"]].rename(
            columns={"a": "controller", "b": "dependent"}
        ),
        batch_format="pandas",
    )


def reaches_closure(sf_dir: str):
    """(turn_idx) — turns reachable within 3 REACHES hops of the earliest
    reaching source turn of conv-0000000, via the traversal DSL's bounded
    repeat-out over the REACHES overlay — the `.reachableBy` equivalent
    (`dataflowengineoss/.../queryengine/Engine.scala:16-127`; the survey's
    stated closure-over-REACHING_DEF mapping). Oracle: recursive CTE over
    the same reaching pairs."""
    from ..functions.agg import empty_safe
    from ..traversal import GraphView

    r = kg_runner(sf_dir)
    conv = "conv-0000000"
    # distributed filter to ONE conversation before anything drives —
    # the reaching table is corpus-scale, the survivor set is one conv
    mine = (
        r.ctx.read_logical("reaching", columns=["conv_id", "src_turn_idx"])
        .map_batches(
            lambda t: empty_safe(t[t["conv_id"] == conv]),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if mine.empty:
        return pd.DataFrame({"turn_idx": pd.Series(dtype="int32")})
    seed = int(mine["src_turn_idx"].min())
    g = GraphView.from_runner(r)
    start = g.turns().has(conv_id=conv, turn_idx=seed)
    closure = start.repeat_out("REACHES", max_depth=3, emit=True)
    out = closure.to_pandas()[["turn_idx"]].drop_duplicates()
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out.sort_values("turn_idx", ignore_index=True)


# Depth budgets for the dataflow closures. The reference engine explores
# call chains to ARBITRARY depth with a driver-local memoized ResultTable
# (queryengine/Engine.scala:16-127, ResultTable.scala:1-76) — fine on one
# JVM heap, but a shared mutable memo is exactly what a distributed
# engine cannot have: each extra depth level is another all-to-all
# self-join of the edge table, and an unbounded loop over those joins has
# no termination bound the scheduler can plan for. Fixed small budgets
# (expansions converge in <=depth rounds, each a bounded bucketed join)
# are the deliberate distributed-first trade; callers can raise
# max_depth per query when a deeper closure is worth the shuffles.
REACHES_PATH_DEPTH = 3
SEM_TOP_K = 5  # default semantics: kill the K most frequent reaching keys
CROSS_DEPTH = 2  # boundary-expansion budget for reaches_cross


def reaches_cross(sf_dir: str, max_depth: int = CROSS_DEPTH):
    """(conv_id, turn_idx) — dataflow closure WITH ONE KIND OF BOUNDARY
    EXPANSION: besides intra-conversation REACHES hops, a turn that
    mentions key ``k`` flows into every OTHER conversation mentioning
    ``k``, entering at that conversation's earliest ``k``-mention turn —
    the param↔arg/return task-spawning of the reference engine
    (`dataflowengineoss/.../queryengine/Engine.scala:70-125`: crossing a
    METHOD boundary enters at the parameter binding) transposed to shared
    canonical entities. Depth-capped BFS from conv-0000000's earliest
    reaching source; oracle = recursive CTE over the identical edge union.

    Scale shape: the frontier is bounded (depth ≤ ``max_depth``) and
    broadcast; every probe — intra-edge match, frontier-turn keys, per-key
    entry turns — is a distributed merge against the streamed reaching /
    mention tables, pre-filtered by the broadcast key set BEFORE any
    aggregation, so nothing corpus-scale drives."""
    import ray

    from ..functions.agg import empty_safe
    from ..functions.joins import get_broadcast

    r = kg_runner(sf_dir)
    conv = "conv-0000000"
    reaching = r.ctx.read_logical(
        "reaching", columns=["conv_id", "src_turn_idx", "dst_turn_idx"]
    )
    # seed: per-batch min + tiny driver reduce (no corpus materialization)
    mins = reaching.map_batches(
        lambda t: empty_safe(pd.DataFrame(
            {"m": [t.loc[t["conv_id"] == conv, "src_turn_idx"].min()]}
        ).dropna()),
        batch_format="pandas",
    ).to_pandas()
    out_empty = pd.DataFrame({"conv_id": pd.Series(dtype="object"),
                              "turn_idx": pd.Series(dtype="int32")})
    if mins.empty:
        return out_empty
    seed = (conv, int(mins["m"].min()))

    mentions = r.ctx.read_logical(
        "records", columns=["kind", "conv_id", "turn_idx", "key"]
    ).map_batches(
        lambda t: empty_safe(
            t.loc[t["kind"] == "mention", ["conv_id", "turn_idx", "key"]]
            .assign(turn_idx=lambda d: d["turn_idx"].astype("int64"))
            .drop_duplicates()
        ),
        batch_format="pandas",
    ).materialize()

    seen = {seed}
    frontier = [seed]
    for _ in range(max_depth):
        fdf = pd.DataFrame(frontier, columns=["conv_id", "turn_idx"])
        fdf["turn_idx"] = fdf["turn_idx"].astype("int64")
        fref = ray.put(fdf)

        def intra(t: pd.DataFrame) -> pd.DataFrame:
            f = get_broadcast(fref)
            m = t.assign(turn_idx=t["src_turn_idx"].astype("int64")).merge(
                f, on=["conv_id", "turn_idx"]
            )
            return empty_safe(pd.DataFrame(
                {"conv_id": m["conv_id"],
                 "turn": m["dst_turn_idx"].astype("int64")}
            ).drop_duplicates())

        nxt_intra = reaching.map_batches(intra, batch_format="pandas").to_pandas()

        def frontier_keys(t: pd.DataFrame) -> pd.DataFrame:
            f = get_broadcast(fref)
            m = t.merge(f, on=["conv_id", "turn_idx"])
            return empty_safe(m[["conv_id", "key"]].drop_duplicates())

        fkeys = (
            mentions.map_batches(frontier_keys, batch_format="pandas")
            .to_pandas().drop_duplicates()
        )
        if len(fkeys):
            kref = ray.put(np.sort(fkeys["key"].unique().astype(object)))

            def entry_partial(t: pd.DataFrame) -> pd.DataFrame:
                ks = get_broadcast(kref)
                arr = t["key"].to_numpy(object)
                if not len(ks) or not len(arr):
                    return empty_safe(pd.DataFrame(
                        {"key": pd.Series(dtype="object"),
                         "conv_id": pd.Series(dtype="object"),
                         "turn": pd.Series(dtype="int64")}
                    ))
                pos = np.clip(np.searchsorted(ks, arr), 0, len(ks) - 1)
                sub = t[ks[pos] == arr]
                g = sub.groupby(["key", "conv_id"], as_index=False).agg(
                    turn=("turn_idx", "min")
                )
                return empty_safe(g)

            ent = (
                mentions.map_batches(entry_partial, batch_format="pandas")
                .to_pandas()
            )
            if len(ent):
                ent = ent.groupby(["key", "conv_id"], as_index=False)["turn"].min()
            cross = ent.merge(fkeys, on="key", suffixes=("", "_src"))
            cross = cross[cross["conv_id"] != cross["conv_id_src"]][
                ["conv_id", "turn"]
            ].drop_duplicates()
        else:
            cross = pd.DataFrame({"conv_id": pd.Series(dtype="object"),
                                  "turn": pd.Series(dtype="int64")})

        cand = pd.concat([nxt_intra, cross], ignore_index=True).drop_duplicates()
        new_states = [
            (c, int(t)) for c, t in zip(cand["conv_id"], cand["turn"])
            if (c, int(t)) not in seen
        ]
        if not new_states:
            break
        seen.update(new_states)
        frontier = new_states

    out = pd.DataFrame(sorted(seen), columns=["conv_id", "turn_idx"])
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out.reset_index(drop=True)


def reaches_paths(sf_dir: str, max_depth: int = REACHES_PATH_DEPTH):
    """(conv_id, start_turn, end_turn, depth, path) — PATH ENUMERATION over
    the REACHES overlay: every dataflow FLOW of length ≤ ``max_depth``
    starting at each conversation's earliest reaching source turn, with the
    hop sequence materialized as ``a->b->c``. The `.reachableByFlows`
    analog (`dataflowengineoss/.../queryengine/Engine.scala:16-127` returns
    node PATHS, not reachable sets; `ResultTable.scala:1-76` memoizes
    per-node partial paths — here the per-conversation frontier frame IS
    that table, carried through ``max_depth`` vectorized self-joins).

    Scale shape: REACHES edges never cross conversations, so ONE bucketed
    shuffle keyed by conv_id co-locates each conversation's edge set, and
    path expansion is a per-bucket pandas merge per depth level — no
    driver materialization, no global join. Path fan-out is bounded by
    (per-turn branching)^depth inside one conversation, the same budget
    the reference's engine pays per task."""
    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical(
        "reaching", columns=["conv_id", "src_turn_idx", "dst_turn_idx"]
    )
    return _enumerate_paths(ds, max_depth)


def _enumerate_paths(ds, max_depth: int):
    """Shared path-expansion: Dataset(conv_id, src_turn_idx, dst_turn_idx)
    → Dataset(conv_id, start_turn, end_turn, depth, path)."""
    from ..functions.agg import empty_safe, hash_groupby

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame(
            {"conv_id": g["conv_id"],
             "es": g["src_turn_idx"].astype("int32"),
             "ed": g["dst_turn_idx"].astype("int32")}
        ).drop_duplicates()
        seeds = e.groupby("conv_id", as_index=False).agg(s0=("es", "min"))
        cur = seeds.merge(e, left_on=["conv_id", "s0"], right_on=["conv_id", "es"])
        cur = pd.DataFrame(
            {"conv_id": cur["conv_id"], "start_turn": cur["s0"],
             "end_turn": cur["ed"],
             "depth": np.full(len(cur), 1, dtype=np.int32),
             "path": cur["s0"].astype(str) + "->" + cur["ed"].astype(str)}
        )
        levels = [cur]
        for _ in range(max_depth - 1):
            nxt = levels[-1].merge(
                e, left_on=["conv_id", "end_turn"], right_on=["conv_id", "es"]
            )
            if not len(nxt):
                break
            levels.append(pd.DataFrame(
                {"conv_id": nxt["conv_id"], "start_turn": nxt["start_turn"],
                 "end_turn": nxt["ed"],
                 "depth": (nxt["depth"] + 1).astype("int32"),
                 "path": nxt["path"] + "->" + nxt["ed"].astype(str)}
            ))
        return empty_safe(pd.concat(levels, ignore_index=True))

    return hash_groupby(ds, "conv_id", per_conv)


def reaches_paths_semantic(sf_dir: str, max_depth: int = REACHES_PATH_DEPTH,
                           semantics_text: str | None = None):
    """(conv_id, start_turn, end_turn, depth, path) — flow enumeration with
    EDGE SEMANTICS: REACHES edges whose ``variable`` is declared with no
    mappings in the semantics DSL are KILLED before expansion — the
    per-call-site semantics filtering of the reference engine
    (`Engine.scala` consults `Semantics.forMethod`;
    `semanticsloader/Parser.scala:34-76` parses the DSL; see
    `codepropertygraph_ray/semantics.py`).

    With no explicit ``semantics_text``, the default document kills the
    corpus's ``SEM_TOP_K`` most frequent reaching variables (ties →
    lexicographic min) — a deterministic, data-derived sanitizer rule BOTH
    sides can compute, so the oracle is exact."""
    import ray

    from ..functions.agg import hash_agg
    from ..functions.joins import get_broadcast
    from ..semantics import blocked_keys, parse

    r = kg_runner(sf_dir)
    if semantics_text is None:
        counts = hash_agg(
            r.ctx.read_logical("reaching", columns=["variable"]).map_batches(
                lambda t: t.groupby("variable", as_index=False).size()
                .rename(columns={"size": "n"}),
                batch_format="pandas",
            ),
            "variable",
            n=("n", "sum"),
        ).to_pandas().sort_values(["n", "variable"], ascending=[False, True])
        if counts.empty:
            return reaches_paths(sf_dir, max_depth)
        semantics_text = "\n".join(
            f'"{k}"' for k in counts["variable"].head(SEM_TOP_K)
        )
    blocked = blocked_keys(parse(semantics_text))
    bref = ray.put(blocked)

    ds = r.ctx.read_logical(
        "reaching",
        columns=["conv_id", "src_turn_idx", "dst_turn_idx", "variable"],
    ).map_batches(
        lambda t: t.loc[~t["variable"].isin(get_broadcast(bref)),
                        ["conv_id", "src_turn_idx", "dst_turn_idx"]],
        batch_format="pandas",
    )
    return _enumerate_paths(ds, max_depth)


def reaches_paths_semantic_mapped(sf_dir: str,
                                  max_depth: int = REACHES_PATH_DEPTH,
                                  semantics_text: str | None = None):
    """(conv_id, start_turn, end_turn, depth, path) — flow enumeration with
    PER-ARGUMENT semantics mappings: a variable declared with ``a->b``
    mappings propagates ONLY along hops where its mention position (the
    min ordinal within the turn — the argument-index analog) is ``a`` at
    the source turn and ``b`` at the destination turn; declared with no
    mappings ⇒ killed; undeclared ⇒ propagates. This is the
    PassThroughMapping side of the reference DSL
    (`semanticsloader/Parser.scala:34-76`; `Engine.scala` applies the
    mapping per call site) that `reaches_paths_semantic` only used the
    kill rule of.

    Default document: the ``SEM_TOP_K`` most frequent reaching variables
    each declared ``1->1`` (second-position pass-through — the
    position pair that actually occurs in the corpus, so the result
    provably — deterministic
    and data-derived, so the oracle is exact; by construction the result
    differs from both the kill-rule variant (some top-K hops survive) and
    the unfiltered enumeration (some are dropped).

    Scale shape: mapped-variable edges and their mention positions
    co-locate in ONE conv_id-bucketed exchange (positions pre-filtered by
    the broadcast mapped-key set); undeclared-variable edges stream
    straight into path expansion. Nothing corpus-scale drives."""
    import ray

    from ..functions.agg import empty_safe, hash_agg, hash_groupby
    from ..functions.joins import get_broadcast
    from ..semantics import parse

    r = kg_runner(sf_dir)
    if semantics_text is None:
        counts = hash_agg(
            r.ctx.read_logical("reaching", columns=["variable"]).map_batches(
                lambda t: t.groupby("variable", as_index=False).size()
                .rename(columns={"size": "n"}),
                batch_format="pandas",
            ),
            "variable",
            n=("n", "sum"),
        ).to_pandas().sort_values(["n", "variable"], ascending=[False, True])
        if counts.empty:
            return reaches_paths(sf_dir, max_depth)
        semantics_text = "\n".join(
            f'"{k}" 1->1' for k in counts["variable"].head(SEM_TOP_K)
        )
    sem = parse(semantics_text)
    killed = frozenset(k for k, v in sem.items() if not v.propagates)
    map_rows = [(k, a, b) for k, v in sem.items() for a, b in v.mappings]
    mapdf = pd.DataFrame(map_rows, columns=["v", "a", "b"]).astype(
        {"a": "int64", "b": "int64"}
    )
    mapped_keys = frozenset(mapdf["v"])
    kref = ray.put(killed)
    mkref = ray.put(mapped_keys)
    mdref = ray.put(mapdf)

    reaching = r.ctx.read_logical(
        "reaching",
        columns=["conv_id", "src_turn_idx", "dst_turn_idx", "variable"],
    )
    free = reaching.map_batches(
        lambda t: t.loc[
            ~t["variable"].isin(get_broadcast(kref))
            & ~t["variable"].isin(get_broadcast(mkref)),
            ["conv_id", "src_turn_idx", "dst_turn_idx"],
        ],
        batch_format="pandas",
    )

    def edge_rows(t: pd.DataFrame) -> pd.DataFrame:
        e = t[t["variable"].isin(get_broadcast(mkref))]
        return empty_safe(pd.DataFrame(
            {"conv_id": e["conv_id"],
             "x": e["src_turn_idx"].astype("int64"),
             "y": e["dst_turn_idx"].astype("int64"),
             "v": e["variable"].astype(object),
             "tag": np.full(len(e), "e", object)}
        ))

    def pos_rows(t: pd.DataFrame) -> pd.DataFrame:
        m = t[(t["kind"] == "mention") & t["key"].isin(get_broadcast(mkref))]
        g = m.groupby(["conv_id", "turn_idx", "key"], as_index=False).agg(
            p=("ordinal", "min")
        )
        return empty_safe(pd.DataFrame(
            {"conv_id": g["conv_id"],
             "x": g["turn_idx"].astype("int64"),
             "y": g["p"].astype("int64"),
             "v": g["key"].astype(object),
             "tag": np.full(len(g), "p", object)}
        ))

    sem_edges = reaching.map_batches(edge_rows, batch_format="pandas")
    positions = r.ctx.read_logical(
        "records", columns=["kind", "conv_id", "turn_idx", "key", "ordinal"]
    ).map_batches(pos_rows, batch_format="pandas")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["conv_id", "src_turn_idx", "dst_turn_idx"]
        e = g.loc[g["tag"] == "e", ["conv_id", "x", "y", "v"]]
        if not len(e):
            return empty_safe(pd.DataFrame(
                {c: pd.Series(dtype="int64" if c != "conv_id" else "object")
                 for c in out_cols}
            ))
        # per-batch position partials may repeat across batches → min again
        p = g.loc[g["tag"] == "p"].groupby(
            ["conv_id", "x", "v"], as_index=False
        )["y"].min()
        m = e.merge(
            p.rename(columns={"x": "xs", "y": "p_src"}),
            left_on=["conv_id", "x", "v"], right_on=["conv_id", "xs", "v"],
        ).merge(
            p.rename(columns={"x": "xd", "y": "p_dst"}),
            left_on=["conv_id", "y", "v"], right_on=["conv_id", "xd", "v"],
        )
        keep = m.merge(get_broadcast(mdref),
                       left_on=["v", "p_src", "p_dst"],
                       right_on=["v", "a", "b"])
        out = keep[["conv_id", "x", "y"]].rename(
            columns={"x": "src_turn_idx", "y": "dst_turn_idx"}
        ).drop_duplicates()
        return empty_safe(out.reset_index(drop=True))

    resolved = hash_groupby(sem_edges.union(positions), "conv_id", resolve)
    surviving = free.map_batches(
        lambda t: pd.DataFrame(
            {"conv_id": t["conv_id"],
             "src_turn_idx": t["src_turn_idx"].astype("int64"),
             "dst_turn_idx": t["dst_turn_idx"].astype("int64")}
        ),
        batch_format="pandas",
    ).union(resolved)
    return _enumerate_paths(surviving, max_depth)


def fact_closure(sf_dir: str):
    """(full_name) — entities reachable within 3 FACT hops of the
    lexicographically-first fact subject, via the traversal DSL's
    repeat-out expansion (callgraphextension analog). SQL oracle:
    depth-bounded recursive CTE."""
    from ..traversal import GraphView

    from ..functions.agg import empty_safe

    r = kg_runner(sf_dir)

    # seed = distributed min(subj): per-batch min + tiny driver reduce —
    # never materialize the triple column (corpus-scale at 100 TB)
    def local_min(t: pd.DataFrame) -> pd.DataFrame:
        if not len(t):
            return empty_safe(pd.DataFrame({"m": pd.Series(dtype="object")}))
        return pd.DataFrame({"m": [t["subj"].min()]})

    mins = (
        r.ctx.read_logical("triples", columns=["subj"])
        .map_batches(local_min, batch_format="pandas")
        .to_pandas()
    )
    if mins.empty or "m" not in mins.columns:
        return pd.DataFrame({"full_name": pd.Series(dtype="object")})
    seed = mins["m"].min()
    g = GraphView.from_runner(r)
    closure = g.entities().name_exact(seed).repeat_out("FACT", max_depth=3, emit=True)
    out = closure.to_pandas()[["full_name"]].drop_duplicates().sort_values(
        "full_name", ignore_index=True
    )
    return out


def member_resolve(sf_dir: str):
    """(entity, root) — memoized chain resolution, the MemberAccessLinker
    analog (O11): each entity with a strictly-decreasing ``located_in``
    edge (obj < subj keeps the chain acyclic, the `a.b.c` nesting shape)
    resolves through the functional min-edge map to its terminal root,
    depth-capped at 100 (`MemberAccessLinker.scala:92-96`).

    Scale shape: the functional edge map is vocab-scale (one row per
    entity) — broadcast it once (`ray.put` + per-process cache) and run
    the memoized resolve inside ``map_batches``; the memo dict plays the
    linker's memoization role, amortizing shared chain suffixes."""
    import ray
    import ray.data

    from ..functions.agg import hash_agg
    from ..functions.graph import resolve_functional
    from ..functions.joins import get_broadcast

    r = kg_runner(sf_dir)
    tri = r.ctx.read_logical("triples", columns=["subj", "pred", "obj"])
    pairs = tri.map_batches(
        lambda t: t.loc[(t["pred"] == "located_in") & (t["obj"] < t["subj"]),
                        ["subj", "obj"]],
        batch_format="pandas",
    )
    f_df = hash_agg(pairs, "subj", nxt=("obj", "min")).to_pandas()
    if f_df.empty:
        return pd.DataFrame({"entity": pd.Series(dtype="object"),
                             "root": pd.Series(dtype="object")})
    ref = ray.put(dict(zip(f_df["subj"], f_df["nxt"])))

    def resolve_batch(t: pd.DataFrame) -> pd.DataFrame:
        f = get_broadcast(ref)
        roots = resolve_functional(f, t["entity"].to_numpy())
        return pd.DataFrame({"entity": t["entity"],
                             "root": [roots[e] for e in t["entity"]]})

    starts = ray.data.from_pandas(f_df[["subj"]].rename(columns={"subj": "entity"}))
    return starts.map_batches(resolve_batch, batch_format="pandas")


BIND_MAX_DEPTH = 100


def _binding_inputs(sf_dir: str):
    """(distinct facts, functional min-parent map) — both vocab-scale dims.

    The distinct-triple set is reduced DISTRIBUTED (bucketed dedup) before
    the driver collects it; the parent map is the same strictly-decreasing
    ``located_in`` functional edge map member_resolve broadcasts."""
    from ..functions.agg import hash_agg, hash_groupby

    r = kg_runner(sf_dir)
    tri = r.ctx.read_logical("triples", columns=["subj", "pred", "obj"])
    facts = hash_groupby(
        tri, ["subj", "pred", "obj"], lambda g: g.drop_duplicates()
    ).to_pandas()
    pairs = facts.loc[
        (facts["pred"] == "located_in") & (facts["obj"] < facts["subj"]),
        ["subj", "obj"],
    ]
    par = pairs.groupby("subj", as_index=False).agg(nxt=("obj", "min"))
    return facts, par


def _ancestor_chains(facts: pd.DataFrame, par: pd.DataFrame) -> pd.DataFrame:
    """(entity, anc, depth) rows along the functional min-parent chain,
    depth 0 = self; strictly-decreasing parents guarantee termination."""
    ents = pd.unique(facts["subj"])
    cur = pd.DataFrame(
        {"entity": ents, "anc": ents, "depth": np.zeros(len(ents), np.int32)}
    )
    chains = [cur]
    for d in range(1, BIND_MAX_DEPTH + 1):
        nxt = cur.merge(par, left_on="anc", right_on="subj")
        if nxt.empty:
            break
        cur = pd.DataFrame(
            {"entity": nxt["entity"], "anc": nxt["nxt"],
             "depth": np.full(len(nxt), d, dtype=np.int32)}
        )
        chains.append(cur)
    return pd.concat(chains, ignore_index=True)


def bindings_inherited(sf_dir: str):
    """(entity, pred, obj, provider, depth) — the effective binding table:
    each entity's own predicates plus the ones inherited along its
    ``located_in`` ancestor chain, where a binding at a SHALLOWER depth
    (own = depth 0) SHADOWS the same predicate deeper up — the
    BindingTableCompat analog (`semanticcpg/.../compat/bindingtablecompat/
    BindingTableCompat.scala:16-80`: derived types inherit base bindings
    minus a name/signature shadowing anti-join).

    Scale shape: every frame here is vocab-scale (the triples aggregate) —
    the distinct-fact reduction runs distributed, then the chain expansion
    is K vectorized merges over the dimension on the driver, the same
    budget as the canonical map."""
    facts, par = _binding_inputs(sf_dir)
    chain = _ancestor_chains(facts, par)
    own = facts[facts["pred"] != "located_in"]
    cand = chain.merge(own, left_on="anc", right_on="subj")
    best = cand.groupby(["entity", "pred"], as_index=False).agg(
        depth=("depth", "min")
    )
    out = cand.merge(best, on=["entity", "pred", "depth"])
    return pd.DataFrame(
        {"entity": out["entity"], "pred": out["pred"], "obj": out["obj"],
         "provider": out["anc"], "depth": out["depth"].astype("int32")}
    ).sort_values(["entity", "pred", "obj"], ignore_index=True)


def binding_overrides(sf_dir: str):
    """(entity, pred, is_overridden) — for every entity's own predicate,
    whether some strict ``located_in`` DESCENDANT re-binds the same
    predicate: the boolean-property propagation up the DAG of
    BindingMethodOverridesPass (`semanticcpg/.../passes/
    BindingMethodOverridesPass.scala:9-52` marks methods overridden by a
    deriving type's binding)."""
    facts, par = _binding_inputs(sf_dir)
    chain = _ancestor_chains(facts, par)
    own = facts.loc[facts["pred"] != "located_in", ["subj", "pred"]].drop_duplicates()
    marked = (
        chain[chain["depth"] >= 1]
        .merge(own, left_on="entity", right_on="subj")[["anc", "pred"]]
        .drop_duplicates()
        .assign(_ov=True)
    )
    out = own.merge(
        marked, left_on=["subj", "pred"], right_on=["anc", "pred"], how="left"
    )
    return pd.DataFrame(
        {"entity": out["subj"], "pred": out["pred"],
         "is_overridden": out["_ov"].fillna(False).astype(bool)}
    ).sort_values(["entity", "pred"], ignore_index=True)


def dump_turn_context(sf_dir: str):
    """(conv_id, turn_idx, role, text) around turn 10 of the first
    conversation — the CodeDumper analog (stages/export.py)."""
    from ..stages.export import dump_context

    targets = pd.DataFrame({"conv_id": ["conv-0000000"], "turn_idx": [10]})
    ds = dump_context(sf_dir, targets, around=1)
    return ds.map_batches(
        lambda t: t.assign(turn_idx=t["turn_idx"].astype("int32"))[
            ["conv_id", "turn_idx", "role", "text"]
        ],
        batch_format="pandas",
    )


def dot_export(sf_dir: str):
    """(conv_id, dot) — per-conversation Graphviz text (DOT sink, S11).
    SQL oracle: string_agg over sorted turns rebuilds the identical DOT."""
    from ..stages.export import conversation_dot

    return conversation_dot(sf_dir)


def dot_export_cfg(sf_dir: str):
    """(conv_id, dot) — the conversation reply graph (chain + user-skip
    edges), the `DotCfgGenerator.scala` flavor."""
    from ..stages.export import conversation_dot_cfg

    return conversation_dot_cfg(sf_dir)


def dot_export_cdg(sf_dir: str):
    """(conv_id, dot) — per-conversation control-dependence edges, the
    `DotCdgGenerator.scala` flavor."""
    from ..stages.export import conversation_dot_cdg

    return conversation_dot_cdg(sf_dir)


def dot_export_ddg(sf_dir: str):
    """(conv_id, dot) — per-conversation REACHES dataflow edges labeled
    with their variable, the `DdgGenerator.scala:1-100` flavor (drawn from
    the pipeline's reaching overlay, logical union incl. increments)."""
    from ..stages.export import conversation_dot_ddg

    r = kg_runner(sf_dir)
    return conversation_dot_ddg(sf_dir, r.ctx.read_logical("reaching"))


def dot_export_pdg(sf_dir: str):
    """(conv_id, dot) — the program-dependence-graph union view: CDG ∪
    DDG edges in one digraph, each labeled with its flavor — the
    `DotPdgGenerator.scala` flavor (`DumpPdgTests.scala` shape)."""
    from ..stages.export import conversation_dot_pdg

    r = kg_runner(sf_dir)
    return conversation_dot_pdg(sf_dir, r.ctx.read_logical("reaching"))


def dot_export_cpg14(sf_dir: str):
    """(conv_id, dot) — the combined AST+CFG whole-CPG view (turn nodes,
    mention nodes, layer-labeled containment + reply edges), the
    `DotCpg14Generator.scala` flavor."""
    from ..stages.export import conversation_dot_cpg14

    return conversation_dot_cpg14(sf_dir, mentions(sf_dir))


AP_ELEMENT_RE = r"^(.*) (\d+)$"  # base tokens + numeric element suffix


def reaches_paths_accesspath(sf_dir: str,
                             max_depth: int = REACHES_PATH_DEPTH):
    """(conv_id, var_class, start_turn, end_turn, depth, path) — VARIABLE-
    TRACKED flow enumeration under ACCESS-PATH matching: a hop continues a
    path only when its variable matches the tracked one, where a key with
    a numeric trailing token ("unknown item 259") is a VariableAccess-like
    element of its base ("unknown item") and conservatively aliases every
    other numeric element of the same base — the over-taint rule of
    `semanticcpg/.../accesspath/AccessPath.scala:62-249` (matchAndDiff:
    untracked indices cannot be proven disjoint, so they MATCH); keys
    without a numeric element match only exactly. Matching is an
    equivalence, so it reduces to equality of a derived alias class, and
    enumeration runs per (conversation, class) with each class's earliest
    source turn as its seed.

    Scale shape: one hash-bucketed exchange keyed (conv_id, var_class);
    expansion is per-group vectorized self-joins, fan-out bounded by the
    class's own branching — strictly narrower than reaches_paths' whole-
    conversation edge set. Nothing drives on the driver."""
    r = kg_runner(sf_dir)
    ds = r.ctx.read_logical(
        "reaching",
        columns=["conv_id", "src_turn_idx", "dst_turn_idx", "variable"],
    )
    return _accesspath_paths(ds, max_depth)


def _accesspath_paths(ds, max_depth: int):
    """Class derivation + per-(conv, class) path expansion over a Dataset
    of (conv_id, src_turn_idx, dst_turn_idx, variable) reaching rows."""
    from ..functions.agg import empty_safe, hash_groupby

    def add_class(t: pd.DataFrame) -> pd.DataFrame:
        base = t["variable"].str.extract(AP_ELEMENT_RE, expand=True)[0]
        return pd.DataFrame({
            "conv_id": t["conv_id"],
            "var_class": base.fillna(t["variable"]),
            "src_turn_idx": t["src_turn_idx"],
            "dst_turn_idx": t["dst_turn_idx"],
        })

    def per_class(g: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame(
            {"conv_id": g["conv_id"], "var_class": g["var_class"],
             "es": g["src_turn_idx"].astype("int32"),
             "ed": g["dst_turn_idx"].astype("int32")}
        ).drop_duplicates()
        gk = ["conv_id", "var_class"]
        seeds = e.groupby(gk, as_index=False).agg(s0=("es", "min"))
        cur = seeds.merge(e, left_on=gk + ["s0"], right_on=gk + ["es"])
        cur = pd.DataFrame(
            {"conv_id": cur["conv_id"], "var_class": cur["var_class"],
             "start_turn": cur["s0"], "end_turn": cur["ed"],
             "depth": np.full(len(cur), 1, dtype=np.int32),
             "path": cur["s0"].astype(str) + "->" + cur["ed"].astype(str)}
        )
        levels = [cur]
        for _ in range(max_depth - 1):
            nxt = levels[-1].merge(
                e, left_on=gk + ["end_turn"], right_on=gk + ["es"]
            )
            if not len(nxt):
                break
            levels.append(pd.DataFrame(
                {"conv_id": nxt["conv_id"], "var_class": nxt["var_class"],
                 "start_turn": nxt["start_turn"], "end_turn": nxt["ed"],
                 "depth": (nxt["depth"] + 1).astype("int32"),
                 "path": nxt["path"] + "->" + nxt["ed"].astype(str)}
            ))
        out = pd.concat(levels, ignore_index=True).drop_duplicates()
        return empty_safe(out)

    return hash_groupby(
        ds.map_batches(add_class, batch_format="pandas"),
        ["conv_id", "var_class"],
        per_class,
    )
