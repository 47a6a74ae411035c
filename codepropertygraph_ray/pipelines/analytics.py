"""Graph analytics over the constructed KG — the query-surface extension.

The reference's query layer walks the stored graph with traversals
(`semanticcpg/.../language/package.scala`, call-graph extension
`language/callgraphextension/Method.scala:9-78`); whole-graph analytics
(degree, triangles, reachability, centrality) are what a KG consumer runs
on top. Each operator here is expressed over the pipeline's output tables
with the engine's own shuffle machinery (`functions/agg.py`) and checked
against a DuckDB oracle.

Scale discipline shared by all of them: the *entity* graph is vocab-scale
(bounded by the entity vocabulary, not the corpus — SURVEY.md §7.1 step 6),
so entity-keyed dimension tables (degrees, ranks, frontiers) broadcast,
while every corpus-scale scan (mentions, triples) stays a distributed
``map_batches``/``hash_groupby`` pipeline.

* ``entity_cooccurrence`` — the co-mention edge list: distinct canonical
  entity pairs sharing a turn, with turn counts. One bucketed shuffle keyed
  by (conv, turn); per-turn fan-out is bounded by mentions-per-turn.
* ``entity_degree`` — distinct-neighbor counts over that graph.
* ``triangle_count`` — degree-ordered triangle counting (the classic
  distributed formulation: orient edges small→large by (degree, id), emit
  wedges from each apex's out-neighborhood, match wedges against oriented
  edges in a bucketed hash join — wedge volume O(m^1.5), never the naive
  Σdeg²).
* ``entity_bfs`` — bounded BFS layers from the lexicographically-first
  entity: frontier sets broadcast (vocab-scale), edge scans distributed —
  the `.repeat(...).dedup.emit` closure generalized to whole-graph layers.
* ``pagerank`` — fixed-iteration PageRank over the directed FACT graph
  (subj→obj): ranks/degrees broadcast per iteration, contributions
  aggregated with ``hash_agg``; dangling mass is dropped identically on
  both sides (documented, mirrored in the unrolled SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..functions.agg import empty_safe, hash_agg, hash_groupby, round_half_away
from ..functions.joins import build_lookup, get_broadcast, lookup_keys
from .queries import kg_runner

BFS_MAX_DEPTH = 4
PR_DAMPING = 0.85
PR_ITERS = 3
PR_ROUND = 7


def _canon_mention_turns(sf_dir: str):
    """Dataset(conv_id, turn_idx, canon) — canonical entity per mention,
    pre-deduped per batch (global per-turn dedup happens inside the
    consumer's (conv, turn)-keyed bucket). The canon map is vocab-scale →
    broadcast sorted-hash probe (never a shuffle of the mention stream)."""
    r = kg_runner(sf_dir)
    cm = r.ctx.read_logical_table("canon_map").to_pandas()
    ref = ray.put(build_lookup(cm["node"], cm["component"]))
    ds = r.ctx.read_logical("records", columns=["kind", "conv_id", "turn_idx", "key"])

    def to_canon(t: pd.DataFrame) -> pd.DataFrame:
        t = t[t["kind"] == "mention"]
        canon = lookup_keys(get_broadcast(ref), t["key"], default="self")
        out = pd.DataFrame(
            {"conv_id": t["conv_id"].to_numpy(),
             "turn_idx": t["turn_idx"].to_numpy().astype("int32"),
             "canon": canon}
        )
        return empty_safe(out.drop_duplicates())

    return ds.map_batches(to_canon, batch_format="pandas")


def entity_cooccurrence(sf_dir: str):
    """(canon_a, canon_b, n_turns) — unordered canonical-entity pairs
    co-mentioned in the same turn, counting turns. The co-mention graph is
    the KG analog of the reference's shared-AST-parent structure queries."""
    ds = _canon_mention_turns(sf_dir)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on=["conv_id", "turn_idx"])
        m = m[m["canon_x"] < m["canon_y"]]
        pc = m.groupby(["canon_x", "canon_y"], as_index=False).size()
        return pc.rename(
            columns={"canon_x": "canon_a", "canon_y": "canon_b", "size": "n_turns"}
        )

    return hash_agg(
        hash_groupby(ds, ["conv_id", "turn_idx"], pairs),
        ["canon_a", "canon_b"],
        n_turns=("n_turns", "sum"),
    )


def _cooc_edges(sf_dir: str):
    """Materialized distinct co-occurrence edge list (a < b)."""
    return (
        entity_cooccurrence(sf_dir)
        .drop_columns(["n_turns"])
        .rename_columns({"canon_a": "a", "canon_b": "b"})
        .materialize()
    )


def entity_degree(sf_dir: str):
    """(canon, degree) — distinct-neighbor count per canonical entity over
    the co-occurrence graph (edge rows are distinct pairs, so degree is a
    plain count after exploding both directions)."""
    pairs = entity_cooccurrence(sf_dir)

    def both(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"canon": pd.concat([t["canon_a"], t["canon_b"]], ignore_index=True)}
        )

    return hash_agg(
        pairs.map_batches(both, batch_format="pandas"),
        "canon",
        degree=("canon", "size"),
    )


def triangle_count(sf_dir: str):
    """Single row (n_triangles) — triangles in the co-occurrence graph.

    Degree-ordered orientation: every edge points from its (degree, id)-
    smaller endpoint, each apex emits wedges over its out-neighborhood
    (bounded by out-degree ≤ sqrt-ish after orientation), and a wedge
    closes a triangle iff its (x, y) pair — ordered by the same key — is
    itself an oriented edge. The wedge⋈edge match is a bucketed hash join
    (rows tagged, co-located by (x, y)) — no broadcast of the edge set, so
    the operator survives an edge list larger than worker heap."""
    edges = _cooc_edges(sf_dir)

    deg = hash_agg(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"canon": pd.concat([t["a"], t["b"]], ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        "canon",
        degree=("canon", "size"),
    ).to_pandas()
    dref = ray.put(build_lookup(deg["canon"], deg["degree"]))

    def orient(t: pd.DataFrame) -> pd.DataFrame:
        tbl = get_broadcast(dref)
        da = lookup_keys(tbl, t["a"]).astype(np.int64)
        db = lookup_keys(tbl, t["b"]).astype(np.int64)
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        swap = (db < da) | ((db == da) & (b < a))
        return pd.DataFrame(
            {"src": np.where(swap, b, a), "dst": np.where(swap, a, b)}
        )

    oriented = edges.map_batches(orient, batch_format="pandas").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        tbl = get_broadcast(dref)
        m = g.merge(g, on="src")
        dx = lookup_keys(tbl, m["dst_x"]).astype(np.int64)
        dy = lookup_keys(tbl, m["dst_y"]).astype(np.int64)
        x = m["dst_x"].to_numpy()
        y = m["dst_y"].to_numpy()
        # keep wedge pairs in orientation order so they compare against
        # oriented edges directly; strict < dedups the symmetric wedge
        keep = (dx < dy) | ((dx == dy) & (x < y))
        w = pd.DataFrame({"x": x[keep], "y": y[keep]})
        pc = w.groupby(["x", "y"], as_index=False).size()
        pc["kind"] = "w"
        return pc.rename(columns={"size": "nw"})

    w = hash_groupby(oriented, "src", wedges)
    e_tagged = oriented.map_batches(
        lambda t: pd.DataFrame(
            {"x": t["src"], "y": t["dst"], "nw": np.int64(0), "kind": "e"}
        ),
        batch_format="pandas",
    )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        es = g.loc[g["kind"] == "e", ["x", "y"]]
        ws = g[g["kind"] == "w"]
        m = ws.merge(es, on=["x", "y"])
        return pd.DataFrame({"n": [np.int64(m["nw"].sum())]})

    total = hash_groupby(w.union(e_tagged), ["x", "y"], close).sum("n")
    return pd.DataFrame({"n_triangles": [int(total or 0)]})


def entity_local_cc(sf_dir: str):
    """(canon, n_tri, n_wedges) — per-node triangle participation and
    wedge capacity over the co-occurrence graph: the local-clustering-
    coefficient integers (cc = 2·n_tri / (deg·(deg−1)) is a client-side
    division; integers hash stably against the SQL oracle).

    Same degree-ordered orientation as :func:`triangle_count`, but each
    wedge keeps its APEX so a closed wedge can credit all three corners:
    wedges emit from the apex's bucket, an (x, y)-bucketed tag join
    restricts to actual edges, matched wedges fan out 3 corner partials,
    and one vocab-scale aggregation sums per node. Degrees broadcast."""
    edges = _cooc_edges(sf_dir)

    deg_df = hash_agg(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"canon": pd.concat([t["a"], t["b"]], ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        "canon",
        degree=("canon", "size"),
    ).to_pandas()
    dref = ray.put(build_lookup(deg_df["canon"], deg_df["degree"]))

    def orient(t: pd.DataFrame) -> pd.DataFrame:
        tbl = get_broadcast(dref)
        da = lookup_keys(tbl, t["a"]).astype(np.int64)
        db = lookup_keys(tbl, t["b"]).astype(np.int64)
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        swap = (db < da) | ((db == da) & (b < a))
        return pd.DataFrame(
            {"src": np.where(swap, b, a), "dst": np.where(swap, a, b)}
        )

    oriented = edges.map_batches(orient, batch_format="pandas").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        tbl = get_broadcast(dref)
        m = g.merge(g, on="src")
        dx = lookup_keys(tbl, m["dst_x"]).astype(np.int64)
        dy = lookup_keys(tbl, m["dst_y"]).astype(np.int64)
        x = m["dst_x"].to_numpy()
        y = m["dst_y"].to_numpy()
        keep = (dx < dy) | ((dx == dy) & (x < y))
        return pd.DataFrame({"apex": m["src"].to_numpy()[keep],
                             "x": x[keep], "y": y[keep], "kind": "w"})

    w = hash_groupby(oriented, "src", wedges)
    e_tagged = oriented.map_batches(
        lambda t: pd.DataFrame(
            {"apex": "", "x": t["src"], "y": t["dst"], "kind": "e"}
        ),
        batch_format="pandas",
    )

    def corners(g: pd.DataFrame) -> pd.DataFrame:
        es = g.loc[g["kind"] == "e", ["x", "y"]]
        ws = g[g["kind"] == "w"]
        m = ws.merge(es, on=["x", "y"])
        nodes = pd.concat([m["apex"], m["x"], m["y"]], ignore_index=True)
        vc = nodes.value_counts()
        return pd.DataFrame({"canon": vc.index.to_numpy(),
                             "n": vc.to_numpy(np.int64)})

    tri = hash_agg(
        hash_groupby(w.union(e_tagged), ["x", "y"], corners),
        "canon", n_tri=("n", "sum"),
    ).to_pandas()
    out = deg_df.merge(tri, on="canon", how="left")
    deg = out["degree"].to_numpy(np.int64)
    return pd.DataFrame({
        "canon": out["canon"].to_numpy(),
        "n_tri": out["n_tri"].fillna(0).to_numpy(np.int64),
        "n_wedges": deg * (deg - 1) // 2,
    })


def entity_bfs(sf_dir: str, max_depth: int = BFS_MAX_DEPTH):
    """(canon, dist) — BFS layers from the lexicographically-first entity
    of the co-occurrence graph, depth-capped (the MemberAccessLinker cap
    discipline). Frontier/visited sets are vocab-scale → driver-held and
    broadcast per round; each round's edge scan is distributed."""
    edges = _cooc_edges(sf_dir)

    def local_min(t: pd.DataFrame) -> pd.DataFrame:
        if not len(t):
            return empty_safe(pd.DataFrame({"m": pd.Series(dtype="object")}))
        return pd.DataFrame({"m": [min(t["a"].min(), t["b"].min())]})

    mins = edges.map_batches(local_min, batch_format="pandas").to_pandas()
    if mins.empty or "m" not in mins.columns:
        return pd.DataFrame({"canon": pd.Series(dtype="object"),
                             "dist": pd.Series(dtype="int64")})
    seed = mins["m"].min()
    visited: dict = {seed: 0}
    frontier = {seed}
    for d in range(1, max_depth + 1):
        fref = ray.put(frozenset(frontier))

        def nbrs(t: pd.DataFrame) -> pd.DataFrame:
            fs = get_broadcast(fref)
            out = pd.concat(
                [t.loc[t["a"].isin(fs), "b"], t.loc[t["b"].isin(fs), "a"]],
                ignore_index=True,
            )
            return empty_safe(pd.DataFrame({"canon": out.drop_duplicates()}))

        cand = edges.map_batches(nbrs, batch_format="pandas").to_pandas()
        got = cand["canon"].unique() if "canon" in cand.columns else []
        frontier = {c for c in got if c not in visited}
        if not frontier:
            break
        visited.update({c: d for c in frontier})
    out = pd.DataFrame({"canon": list(visited), "dist": list(visited.values())})
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values("canon", ignore_index=True)


def pagerank(sf_dir: str):
    """(canon, pr) — PageRank over the directed FACT graph (subj→obj),
    ``PR_ITERS`` fixed iterations, damping ``PR_DAMPING``, uniform init.
    Dangling-node mass is dropped (not redistributed) — mirrored exactly in
    the unrolled SQL oracle, so agreement checks the whole computation.

    Ranks and out-degrees are entity-vocab-scale → broadcast sorted-hash
    probes rebuilt per iteration; the distinct-edge reduction and each
    iteration's contribution sum are bucketed shuffles over the (already
    vocab-scale) edge list. Values round to ``PR_ROUND`` decimals on both
    sides to absorb summation-order float noise."""
    r = kg_runner(sf_dir)
    tri = r.ctx.read_logical("triples", columns=["subj", "obj"])
    edges = hash_groupby(
        tri.map_batches(lambda t: t.drop_duplicates(), batch_format="pandas"),
        ["subj", "obj"],
        lambda g: g.drop_duplicates(),
    ).materialize()

    deg = hash_agg(edges, "subj", deg=("obj", "size")).to_pandas()
    nodes_ds = hash_groupby(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"n": pd.concat([t["subj"], t["obj"]], ignore_index=True)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        "n",
        lambda g: g.drop_duplicates(),
    )
    nodes = nodes_ds.to_pandas()["n"].to_numpy()
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"canon": pd.Series(dtype="object"),
                             "pr": pd.Series(dtype="float64")})
    dref = ray.put(build_lookup(deg["subj"], deg["deg"].astype("float64")))
    rank = pd.Series(np.full(n, 1.0 / n), index=nodes)
    base = (1.0 - PR_DAMPING) / n

    for _ in range(PR_ITERS):
        rref = ray.put(build_lookup(rank.index, rank.to_numpy()))

        def contrib(t: pd.DataFrame) -> pd.DataFrame:
            dt = get_broadcast(dref)
            rt = get_broadcast(rref)
            dv = lookup_keys(dt, t["subj"]).astype(np.float64)
            rv = lookup_keys(rt, t["subj"]).astype(np.float64)
            g = pd.DataFrame({"node": t["obj"], "c": rv / dv})
            return g.groupby("node", as_index=False).agg(c=("c", "sum"))

        cs = hash_agg(
            edges.map_batches(contrib, batch_format="pandas"),
            "node",
            c=("c", "sum"),
        ).to_pandas()
        rank = pd.Series(np.full(n, base), index=nodes)
        rank.loc[cs["node"]] += PR_DAMPING * cs["c"].to_numpy()

    out = pd.DataFrame(
        {"canon": nodes, "pr": round_half_away(rank.to_numpy(), PR_ROUND)}
    )
    return out.sort_values("canon", ignore_index=True)


HITS_ITERS = 2


def hits(sf_dir: str, iters: int = HITS_ITERS):
    """(canon, auth_units, hub_units) — HITS hubs/authorities over the
    directed FACT graph (subj→obj): ``HITS_ITERS`` fixed iterations from
    hub≡1 WITHOUT per-step normalization, so every iterate is an integer
    path count (auth_i(v) = Σ_{u→v} hub_{i-1}(u), hub_i(u) = Σ_{u→v}
    auth_i(v)) and the DuckDB oracle is bit-exact all-integer — the
    adamic_adar fixed-point-units precedent. Normalization is one scalar
    division the consumer applies; skipping it keeps the gate float-free
    (magnitudes are bounded by (max_deg²)^iters · n — safe in int64 at
    2 iterations on a vocab-scale graph).

    Scale shape = pagerank's: score vectors are entity-vocab-scale →
    broadcast sorted-hash probes rebuilt per half-step; each half-step's
    sum is a bucketed shuffle of the (vocab-scale) distinct edge list.
    Reference analog: ranking consumers of the stored graph's traversal
    layer (`semanticcpg/.../language/package.scala`)."""
    r = kg_runner(sf_dir)
    tri = r.ctx.read_logical("triples", columns=["subj", "obj"])
    edges = hash_groupby(
        tri.map_batches(lambda t: t.drop_duplicates(), batch_format="pandas"),
        ["subj", "obj"],
        lambda g: g.drop_duplicates(),
    ).materialize()

    nodes_ds = hash_groupby(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"n": pd.concat([t["subj"], t["obj"]], ignore_index=True)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        "n",
        lambda g: g.drop_duplicates(),
    )
    nodes = nodes_ds.to_pandas()["n"].to_numpy()
    if len(nodes) == 0:
        return pd.DataFrame({"canon": pd.Series(dtype="object"),
                             "auth_units": pd.Series(dtype="int64"),
                             "hub_units": pd.Series(dtype="int64")})

    def half(vec: pd.Series, src: str, dst: str) -> pd.Series:
        """One half-step: out[v] = Σ over edges (src=u, dst=v) of vec[u].
        vec is vocab-scale → broadcast; the sum is a bucketed shuffle."""
        ref = ray.put(build_lookup(vec.index, vec.to_numpy()))

        def contrib(t: pd.DataFrame) -> pd.DataFrame:
            lk = get_broadcast(ref)
            v = lookup_keys(lk, t[src]).astype(np.int64)
            g = pd.DataFrame({"node": t[dst], "c": v})
            return g.groupby("node", as_index=False).agg(c=("c", "sum"))

        cs = hash_agg(
            edges.map_batches(contrib, batch_format="pandas"),
            "node",
            c=("c", "sum"),
        ).to_pandas()
        out = pd.Series(np.zeros(len(vec), dtype=np.int64), index=vec.index)
        if "node" in cs.columns and len(cs):
            out.loc[cs["node"]] += cs["c"].to_numpy(np.int64)
        return out

    hub = pd.Series(np.ones(len(nodes), dtype=np.int64), index=nodes)
    auth = pd.Series(np.zeros(len(nodes), dtype=np.int64), index=nodes)
    for _ in range(iters):
        auth = half(hub, "subj", "obj")
        hub = half(auth, "obj", "subj")

    out = pd.DataFrame(
        {"canon": nodes,
         "auth_units": auth.to_numpy(np.int64),
         "hub_units": hub.to_numpy(np.int64)}
    )
    return out.sort_values("canon", ignore_index=True)


JAC_ROUND = 6


def entity_jaccard(sf_dir: str):
    """(canon_a, canon_b, jac) — neighborhood Jaccard similarity for every
    co-occurring entity pair with ≥1 shared neighbor: the graph-similarity
    operator (link prediction / alias-candidate scoring).

    Shape: wedge counting — every apex's neighbor pairs emit once from the
    apex's bucket, a bucketed sum gives |N(a)∩N(b)| per pair, and an
    (x, y)-bucketed tag join restricts to actual edges; degrees broadcast
    (vocab-scale). Wedge volume is Σdeg² — the inherent all-pairs-common-
    neighbor cost; at hub-skewed scale, cap apex degree or route through
    the MinHash/LSH family (functions/dedup.py) instead."""
    edges = _cooc_edges(sf_dir)

    deg_df = hash_agg(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"canon": pd.concat([t["a"], t["b"]], ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        "canon",
        degree=("canon", "size"),
    ).to_pandas()
    dref = ray.put(build_lookup(deg_df["canon"], deg_df["degree"]))

    und = edges.map_batches(
        lambda t: pd.DataFrame(
            {"apex": pd.concat([t["a"], t["b"]], ignore_index=True),
             "nbr": pd.concat([t["b"], t["a"]], ignore_index=True)}
        ),
        batch_format="pandas",
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="apex")
        m = m[m["nbr_x"] < m["nbr_y"]]
        pc = m.groupby(["nbr_x", "nbr_y"], as_index=False).size()
        out = pc.rename(columns={"nbr_x": "x", "nbr_y": "y", "size": "c"})
        out["kind"] = "w"
        return out

    w = hash_agg(
        hash_groupby(und, "apex", wedges).drop_columns(["kind"]),
        ["x", "y"],
        c=("c", "sum"),
    ).map_batches(lambda t: t.assign(kind="w"), batch_format="pandas")
    e_tagged = edges.map_batches(
        lambda t: pd.DataFrame(
            {"x": t["a"], "y": t["b"], "c": np.int64(0), "kind": "e"}
        ),
        batch_format="pandas",
    )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        es = g.loc[g["kind"] == "e", ["x", "y"]]
        ws = g[g["kind"] == "w"]
        m = ws.merge(es, on=["x", "y"])
        if not len(m):
            return empty_safe(
                pd.DataFrame({"canon_a": pd.Series(dtype="object"),
                              "canon_b": pd.Series(dtype="object"),
                              "jac": pd.Series(dtype="float64")})
            )
        tbl = get_broadcast(dref)
        da = lookup_keys(tbl, m["x"]).astype(np.int64)
        db = lookup_keys(tbl, m["y"]).astype(np.int64)
        c = m["c"].to_numpy(np.int64)
        jac = round_half_away(c / (da + db - c), JAC_ROUND)
        return pd.DataFrame({"canon_a": m["x"], "canon_b": m["y"], "jac": jac})

    return hash_groupby(w.union(e_tagged), ["x", "y"], score)


def entity_span(sf_dir: str):
    """(canon, first_turn, last_turn, n_convs) — the temporal footprint of
    every canonical entity: earliest and latest mentioning (conv, turn)
    position plus distinct-conversation spread. Pure partial-aggregation
    shape: per-batch min/max/dedup partials, one bucketed merge — the
    entity-dimension rollup a KG consumer uses for recency/coverage
    filtering. first/last encode as conv_id||':'||turn for a total order
    matching the SQL oracle."""
    ds = _canon_mention_turns(sf_dir)

    def partial(t: pd.DataFrame) -> pd.DataFrame:
        pos = t["conv_id"].astype(str) + ":" + (
            t["turn_idx"].astype("int64").astype(str).str.zfill(9)
        )
        g = pd.DataFrame({"canon": t["canon"], "pos": pos, "conv_id": t["conv_id"]})
        agg = g.groupby("canon", as_index=False).agg(
            first_turn=("pos", "min"), last_turn=("pos", "max")
        )
        convs = g[["canon", "conv_id"]].drop_duplicates()
        return agg.merge(convs, on="canon")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("canon", as_index=False).agg(
            first_turn=("first_turn", "min"),
            last_turn=("last_turn", "max"),
            n_convs=("conv_id", "nunique"),
        )
        out["n_convs"] = out["n_convs"].astype("int64")
        return out

    return hash_groupby(
        ds.map_batches(partial, batch_format="pandas"), "canon", finish
    )


PMI_ROUND = 6


def entity_pmi(sf_dir: str):
    """(canon_a, canon_b, pmi) — pointwise mutual information of each
    co-occurring canonical entity pair over turn units:
    ``ln(n_ab * N / (n_a * n_b))`` with n_ab = turns co-mentioning the
    pair, n_x = turns mentioning x, N = total TURN count. The association
    strength behind alias suggestion / related-entity panels (the KG-side
    collocation statistic; same unit definitions as entity_cooccurrence).

    Shape: pair counts ride the existing (conv, turn)-bucketed exchange;
    per-entity turn counts are ONE canon-keyed exchange and broadcast
    (vocab-scale) into the pair stream; N is a per-batch partial count +
    tiny reduce. Rounded half-away at ``PMI_ROUND`` on both sides."""
    from ..functions.joins import build_lookup, get_broadcast, lookup_keys

    mc = _canon_mention_turns(sf_dir).materialize()

    # distinct (conv, turn) per canon → n_x; one canon-keyed exchange
    ent = hash_groupby(
        mc,
        "canon",
        lambda g: g.drop_duplicates()
        .groupby("canon", as_index=False)
        .agg(n=("canon", "size")),
    ).to_pandas()
    eref = ray.put(build_lookup(ent["canon"], ent["n"]))

    r = kg_runner(sf_dir)
    nn = (
        r.ctx.read_logical("nodes", columns=["label"])
        .map_batches(
            lambda t: pd.DataFrame({"n": [int((t["label"] == "TURN").sum())]}),
            batch_format="pandas",
        )
        .to_pandas()
    )
    total_turns = int(nn["n"].sum())

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on=["conv_id", "turn_idx"])
        m = m[m["canon_x"] < m["canon_y"]]
        pc = m.groupby(["canon_x", "canon_y"], as_index=False).size()
        return pc.rename(
            columns={"canon_x": "canon_a", "canon_y": "canon_b", "size": "n_ab"}
        )

    co = hash_agg(
        hash_groupby(mc, ["conv_id", "turn_idx"], pairs),
        ["canon_a", "canon_b"],
        n_ab=("n_ab", "sum"),
    )

    def score(t: pd.DataFrame) -> pd.DataFrame:
        lk = get_broadcast(eref)
        na = lookup_keys(lk, t["canon_a"]).astype("float64")
        nb = lookup_keys(lk, t["canon_b"]).astype("float64")
        pmi = np.log(t["n_ab"].to_numpy(np.float64) * total_turns / (na * nb))
        return pd.DataFrame(
            {"canon_a": t["canon_a"], "canon_b": t["canon_b"],
             "pmi": round_half_away(pmi, PMI_ROUND)}
        )

    return co.map_batches(score, batch_format="pandas")


FUZZY_MAX_VARIANT_DF = 256  # hot-variant cap (the MAX_DF discipline): a
# deletion variant shared by more keys than this is a stop-pattern (e.g. a
# template fragment); enumerating its pairs is quadratic noise, so it is
# dropped and logged by count in the bucket (bounded false-negative rate,
# same contract as dedup.MAX_DF / SIMHASH_MAX_BUCKET).


def fuzzy_key_pairs(sf_dir: str, max_df: int = FUZZY_MAX_VARIANT_DF):
    """(key_a, key_b) — all entity-key pairs at Levenshtein distance ≤ 1,
    key_a < key_b. The fuzzy-match companion to the exact-key linking the
    Linker performs (`semanticcpg/.../Linker.scala:52-86` joins on exact
    FULL_NAME; a curation pipeline wants the near-miss report next to it).

    SymSpell deletion-neighborhood join, never an all-pairs scan: every
    key emits itself plus each single-character deletion (≤ len+1 variants,
    keys are vocab-scale); two keys within edit distance 1 necessarily
    share a variant (b = insert into a ⇒ a ∈ del(b); substitution ⇒ same
    deletion at the edit position), so candidate pairs are enumerated per
    variant bucket and verified with an exact distance-≤1 check. Shuffle
    volume is Σ(len+1) variant rows — linear in vocabulary bytes — and
    pair work is candidate-scale, bounded by the per-variant DF cap."""
    keys = kg_runner(sf_dir).ctx.read_logical(
        "entity_keys", columns=["key", "is_alias"]
    ).map_batches(
        lambda t: t.loc[~t["is_alias"], ["key"]].drop_duplicates(),
        batch_format="pandas",
    )

    def variants(t: pd.DataFrame) -> pd.DataFrame:
        out_v, out_k = [], []
        for k in t["key"].drop_duplicates():
            out_v.append(k)
            out_k.append(k)
            for i in range(len(k)):
                out_v.append(k[:i] + k[i + 1:])
                out_k.append(k)
        return pd.DataFrame({"variant": out_v, "key": out_k})

    def _ed_le_1(a: str, b: str) -> bool:
        la, lb = len(a), len(b)
        if a == b:
            return True
        if abs(la - lb) > 1:
            return False
        if la == lb:  # one substitution allowed
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0  # a is shorter: b must be a with one char inserted
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    def per_variant(g: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        for _, grp in g.groupby("variant", sort=False):
            ks = grp["key"].drop_duplicates().to_numpy()
            if len(ks) < 2 or len(ks) > max_df:
                continue
            ks.sort()
            for i in range(len(ks) - 1):
                for j in range(i + 1, len(ks)):
                    if _ed_le_1(ks[i], ks[j]):
                        rows_a.append(ks[i])
                        rows_b.append(ks[j])
        return empty_safe(pd.DataFrame({"key_a": rows_a, "key_b": rows_b}))

    cand = hash_groupby(
        keys.map_batches(variants, batch_format="pandas"),
        "variant",
        per_variant,
    )
    # the same pair surfaces once per shared variant — distinct it
    return hash_groupby(
        cand, ["key_a", "key_b"],
        lambda g: g.drop_duplicates(ignore_index=True),
    )


KCORE_K = 3
KCORE_ITERS = 8


def kcore(sf_dir: str, k: int = KCORE_K, iters: int = KCORE_ITERS):
    """(canon, core_deg) — the k-core of the co-occurrence graph by
    fixed-iteration peeling: repeatedly drop nodes with fewer than ``k``
    neighbors among the survivors; report survivors with their in-core
    degree. The dense-subgraph extractor a KG pipeline runs to find the
    tightly-connected entity clusters (the whole-graph analog of the
    reference's structure queries over shared-parent neighborhoods).

    Iteration cap discipline (MemberAccessLinker.scala:92-96): both sides
    run EXACTLY ``iters`` peel rounds — the Ray loop may early-exit only
    on a fixed point, where further rounds are no-ops, so the capped
    unrolled-CTE oracle stays bit-identical even on inputs where peeling
    hasn't converged.

    Scale shape: each round is one distributed edge scan (survivor set
    broadcast, vocab-scale — the BFS/PageRank discipline) feeding a
    degree partial-agg; only the degree table (vocab-scale, shrinking)
    returns to the driver. Edges materialize once."""
    edges = _cooc_edges(sf_dir)

    def _deg_within(sref):
        """Distributed degree count restricted to the broadcast node set
        (None = unrestricted first round)."""

        def deg_partial(t: pd.DataFrame) -> pd.DataFrame:
            if sref is not None:
                fs = get_broadcast(sref)
                t = t[t["a"].isin(fs) & t["b"].isin(fs)]
            return empty_safe(pd.DataFrame(
                {"canon": pd.concat([t["a"], t["b"]], ignore_index=True)}
            ))

        d = hash_agg(
            edges.map_batches(deg_partial, batch_format="pandas"),
            "canon", core_deg=("canon", "size"),
        ).to_pandas()
        if "canon" not in d.columns:
            return pd.DataFrame({"canon": pd.Series(dtype="object"),
                                 "core_deg": pd.Series(dtype="int64")})
        return d

    cur_ref = None
    cur: set | None = None
    deg = _deg_within(None)
    for _ in range(iters):
        new = set(deg.loc[deg["core_deg"] >= k, "canon"])
        if cur is not None and new == cur:
            break  # fixed point: every further peel is a no-op
        cur = new
        cur_ref = ray.put(frozenset(cur))
        deg = _deg_within(cur_ref)
    out = deg[deg["canon"].isin(cur)] if cur is not None else deg
    out = out.sort_values("canon", ignore_index=True)
    out["core_deg"] = out["core_deg"].astype("int64")
    return out


def assortativity(sf_dir: str):
    """Single row (sxy, sxx, sx, n) → (assort) — the degree-assortativity
    coefficient of the co-occurrence graph: Pearson correlation of the
    endpoint degrees over the (symmetrized) edge list, the one-scalar
    whole-graph health statistic (Newman 2002). Positive = hubs link
    hubs; negative = hub-and-spoke.

    The corr_qty_price discipline on a graph: degrees are exact int64
    (vocab-scale, broadcast as a sorted probe); each edge contributes
    integer moment partials inside map_batches, ONE tiny reduce, and the
    final float formula is the identical IEEE tree as the oracle's
    explicit-sum corr. Symmetrized (each edge counted in both directions)
    so x and y are exchangeable — sx == sy, sxx == syy."""
    edges = _cooc_edges(sf_dir)
    deg = hash_agg(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"canon": pd.concat([t["a"], t["b"]], ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        "canon", degree=("canon", "size"),
    ).to_pandas()
    dref = ray.put(build_lookup(deg["canon"], deg["degree"].to_numpy(np.int64)))

    def moments(t: pd.DataFrame) -> pd.DataFrame:
        da = lookup_keys(get_broadcast(dref), t["a"], default=0).astype(np.int64)
        db = lookup_keys(get_broadcast(dref), t["b"], default=0).astype(np.int64)
        # symmetrize: both directions contribute
        x = np.concatenate([da, db])
        y = np.concatenate([db, da])
        return pd.DataFrame(
            {"n": [np.int64(len(x))], "sx": [x.sum()],
             "sxy": [(x * y).sum()], "sxx": [(x * x).sum()]}
        )

    parts = edges.map_batches(moments, batch_format="pandas").to_pandas()
    n = float(parts["n"].sum())
    sx = float(parts["sx"].sum())
    sxy = float(parts["sxy"].sum())
    sxx = float(parts["sxx"].sum())
    assort = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    return pd.DataFrame({"assort": [assort]})


SCC_DEPTH = 3


def scc_capped(sf_dir: str, depth: int = SCC_DEPTH):
    """(node, scc_id) — depth-capped strongly-connected components of the
    directed FACT graph: u and v share a component iff each reaches the
    other within ``depth`` hops; scc_id = MIN of the mutual set (incl.
    self). The directed counterpart of ``canonical_map``'s undirected
    components — cycles of entities that feed each other's facts.

    Depth-cap discipline (the REACHES/MemberAccessLinker choice): true
    SCC needs unbounded reachability; both sides run the SAME capped
    closure, so the oracle checks the whole computation. Scale shape:
    the closure expands by ``depth-1`` self-joins of the vocab-scale
    distinct edge list (join_auto: broadcast under the budget, shuffle
    beyond), deduped per round; the mutual test is ONE join of the
    closure against its transpose; scc_id is a bucketed min-agg. Nothing
    corpus-scale ever moves."""
    from ..functions.joins import join_auto

    r = kg_runner(sf_dir)
    tri = r.ctx.read_logical("triples", columns=["subj", "obj"])
    edges = hash_groupby(
        tri.map_batches(
            lambda t: t.drop_duplicates().rename(columns={"subj": "u", "obj": "v"}),
            batch_format="pandas",
        ),
        ["u", "v"],
        lambda g: g.drop_duplicates(),
    ).materialize()

    closure = edges
    for _ in range(depth - 1):
        ext = join_auto(
            closure.map_batches(
                lambda t: t.rename(columns={"v": "mid"}), batch_format="pandas"
            ),
            edges.map_batches(
                lambda t: t.rename(columns={"u": "mid"}), batch_format="pandas"
            ),
            on="mid", how="inner",
        ).map_batches(
            lambda t: t[["u", "v"]].drop_duplicates(), batch_format="pandas"
        )
        closure = hash_groupby(
            closure.union(ext), ["u", "v"], lambda g: g.drop_duplicates()
        ).materialize()

    # mutual reachability: closure ∩ transpose(closure), ONE keyed join
    mutual = join_auto(
        closure,
        closure.map_batches(
            lambda t: t.rename(columns={"u": "v", "v": "u"}),
            batch_format="pandas",
        ),
        on=["u", "v"], how="inner",
    )

    nodes = hash_groupby(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"node": pd.concat([t["u"], t["v"]], ignore_index=True)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        "node", lambda g: g.drop_duplicates(),
    )
    partner_min = hash_agg(
        mutual.map_batches(
            lambda t: t.rename(columns={"u": "node", "v": "partner"}),
            batch_format="pandas",
        ),
        "node", scc_id=("partner", "min"),
    ).to_pandas()
    out = nodes.to_pandas()
    m = dict(zip(partner_min["node"], partner_min["scc_id"]))
    out["scc_id"] = np.minimum(
        out["node"].to_numpy(object), out["node"].map(m).fillna(out["node"]).to_numpy(object)
    )
    return out.sort_values("node", ignore_index=True)


WIDEST_DEPTH = 4
WIDEST_INF = 2**62


def widest_path(sf_dir: str, depth: int = WIDEST_DEPTH):
    """(canon, width) — widest-path (max-min bottleneck) strengths from
    the lexicographically-first entity over the co-occurrence graph,
    edge strength = co-mention turn count: "how strongly is every entity
    connected to the seed", the weighted upgrade of ``entity_bfs``.
    Bellman-Ford shape, ``depth`` fixed relaxation rounds:
    W_k(v) = max(W_{k-1}(v), max over edges (u,v) of
    min(W_{k-1}(u), n_turns(u,v))), seed pinned at the WIDEST_INF
    sentinel (reported as-is; mirrored in the oracle). All-integer, so
    the unrolled SQL oracle is bit-exact; the cap is the REACHES/BFS
    discipline — relaxation is monotone, so the fixed-point early-exit
    can never diverge from the exact unroll.

    Scale shape: the width table is vocab-scale — broadcast per round as
    a sorted-hash probe (the BFS/PageRank discipline); each round is one
    distributed vectorized edge scan into a bucketed max-agg."""
    edges = entity_cooccurrence(sf_dir).map_batches(
        lambda t: t.rename(columns={"canon_a": "a", "canon_b": "b"}),
        batch_format="pandas",
    ).materialize()

    def local_min(t: pd.DataFrame) -> pd.DataFrame:
        if not len(t):
            return empty_safe(pd.DataFrame({"m": pd.Series(dtype="object")}))
        return pd.DataFrame({"m": [min(t["a"].min(), t["b"].min())]})

    mins = edges.map_batches(local_min, batch_format="pandas").to_pandas()
    if mins.empty or "m" not in mins.columns:
        return pd.DataFrame({"canon": pd.Series(dtype="object"),
                             "width": pd.Series(dtype="int64")})
    seed = mins["m"].min()

    width = pd.Series([np.int64(WIDEST_INF)], index=[seed])
    for _ in range(depth):
        wref = ray.put(build_lookup(width.index, width.to_numpy(np.int64)))

        def relax(t: pd.DataFrame) -> pd.DataFrame:
            tbl = get_broadcast(wref)
            n = t["n_turns"].to_numpy(np.int64)
            out = []
            for src, dst in (("a", "b"), ("b", "a")):
                w = lookup_keys(tbl, t[src], default=-1).astype(np.int64)
                m = w >= 0
                out.append(pd.DataFrame(
                    {"canon": t[dst].to_numpy()[m],
                     "cand": np.minimum(w[m], n[m])}
                ))
            g = pd.concat(out, ignore_index=True)
            if len(g) == 0:
                return empty_safe(g)
            return g.groupby("canon", as_index=False).max()

        cand = hash_agg(
            edges.map_batches(relax, batch_format="pandas"),
            "canon", cand=("cand", "max"),
        ).to_pandas()
        new = width.copy()
        if "canon" in cand.columns and len(cand):
            c = pd.Series(cand["cand"].to_numpy(np.int64),
                          index=cand["canon"].to_numpy())
            merged = new.reindex(new.index.union(c.index), fill_value=-1)
            cm = c.reindex(merged.index, fill_value=-1)
            new = pd.Series(np.maximum(merged.to_numpy(np.int64),
                                       cm.to_numpy(np.int64)),
                            index=merged.index)
        if new.equals(width.reindex(new.index, fill_value=-2)):
            break  # monotone fixed point — further rounds are no-ops
        width = new

    out = pd.DataFrame(
        {"canon": width.index.to_numpy(object),
         "width": width.to_numpy(np.int64)}
    )
    return out.sort_values("canon", ignore_index=True)


IDF_UNIT = 6  # fixed-point decimals for the ln(N/df) entity weights


def entity_salience(sf_dir: str):
    """(conv_id, canon, salience_units) — the most salient canonical entity
    per conversation by tf·idf: tf = distinct turns in the conversation
    mentioning the entity, idf = ln(N_conversations / df) quantized ONCE
    per entity to ``IDF_UNIT`` fixed-point units (the adamic_adar
    discipline — one rounded ln per vocab entry, integer products after),
    tie-break lowest canon. The entity-salience ranking a KG consumer uses
    to pick a document's primary entities.

    Scale shape: mention stream → ONE (conv, canon)-keyed exchange for
    global distinct-turn tf counts → df/idf are vocab-scale (hash_agg +
    broadcast) → salience is a pure map → per-conv top-1 via a conv-keyed
    bucket. N comes from a distributed CONVERSATION-node count."""
    r = kg_runner(sf_dir)
    ds = _canon_mention_turns(sf_dir)

    def per_cc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        return empty_safe(
            g.groupby(["conv_id", "canon"], as_index=False)
            .size().rename(columns={"size": "tf"})
        )

    ct = hash_groupby(ds, ["conv_id", "canon"], per_cc).materialize()

    dfc = hash_agg(ct, "canon", df=("tf", "size")).to_pandas()
    nconv = int(
        r.ctx.read_logical("nodes", columns=["label"]).map_batches(
            lambda t: pd.DataFrame(
                {"n": [int((t["label"] == "CONVERSATION").sum())]}
            ),
            batch_format="pandas",
        ).to_pandas()["n"].sum()
    )
    idf_units = round_half_away(
        10.0 ** IDF_UNIT
        * np.log(float(nconv) / dfc["df"].to_numpy(np.float64)),
        0,
    ).astype(np.int64)
    uref = ray.put(build_lookup(dfc["canon"], idf_units))

    def score(t: pd.DataFrame) -> pd.DataFrame:
        u = lookup_keys(get_broadcast(uref), t["canon"]).astype(np.int64)
        return pd.DataFrame(
            {"conv_id": t["conv_id"], "canon": t["canon"],
             "salience_units": t["tf"].to_numpy(np.int64) * u}
        )

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["conv_id", "salience_units", "canon"],
            ascending=[True, False, True], kind="stable",
        )
        return g.drop_duplicates("conv_id", keep="first")

    return hash_groupby(
        ct.map_batches(score, batch_format="pandas"), "conv_id", top1
    )


AA_UNIT = 6  # fixed-point decimals for the 1/ln(deg) apex weights


def adamic_adar(sf_dir: str):
    """(canon_a, canon_b, aa_units) — Adamic–Adar link-prediction score
    for every co-occurring entity pair with ≥1 shared neighbor:
    Σ over common neighbors z of 1/ln(deg(z)), in int64 fixed-point units
    (``AA_UNIT`` decimals) — the rarity-weighted upgrade of
    ``entity_jaccard`` (a shared rare neighbor means more than a shared
    hub). Per-NODE weights are quantized ONCE (round(10^6/ln(d)) — the
    fixed-point-before-sum discipline that absorbs numpy-vs-libm last-ulp
    log differences), so the per-pair sums are all-integer and the oracle
    is bit-exact.

    Same shape as entity_jaccard: apex-bucketed wedge enumeration with
    the apex's weight attached, bucketed integer sum per pair, (x, y)-
    bucketed tag join restricting to actual edges; degrees/weights
    broadcast (vocab-scale)."""
    edges = _cooc_edges(sf_dir)

    deg_df = hash_agg(
        edges.map_batches(
            lambda t: pd.DataFrame(
                {"canon": pd.concat([t["a"], t["b"]], ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        "canon", degree=("canon", "size"),
    ).to_pandas()
    d = deg_df["degree"].to_numpy(np.int64)
    units = np.zeros(len(d), np.int64)
    m = d >= 2  # a common neighbor always has ≥2 edges; ln(1)=0 guarded
    units[m] = round_half_away(
        10.0 ** AA_UNIT / np.log(d[m].astype(np.float64)), 0
    ).astype(np.int64)
    uref = ray.put(build_lookup(deg_df["canon"], units))

    und = edges.map_batches(
        lambda t: pd.DataFrame(
            {"apex": pd.concat([t["a"], t["b"]], ignore_index=True),
             "nbr": pd.concat([t["b"], t["a"]], ignore_index=True)}
        ),
        batch_format="pandas",
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        u = lookup_keys(get_broadcast(uref), g["apex"], default=0).astype(np.int64)
        g = g.assign(u=u)
        m = g.merge(g, on="apex")
        m = m[m["nbr_x"] < m["nbr_y"]]
        pc = m.groupby(["nbr_x", "nbr_y"], as_index=False).agg(s=("u_x", "sum"))
        return empty_safe(pc.rename(columns={"nbr_x": "x", "nbr_y": "y"}))

    w = hash_agg(
        hash_groupby(und, "apex", wedges), ["x", "y"], s=("s", "sum")
    ).map_batches(lambda t: t.assign(kind="w"), batch_format="pandas")
    e_tagged = edges.map_batches(
        lambda t: pd.DataFrame(
            {"x": t["a"], "y": t["b"], "s": np.int64(0), "kind": "e"}
        ),
        batch_format="pandas",
    )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        es = g.loc[g["kind"] == "e", ["x", "y"]]
        ws = g[g["kind"] == "w"]
        m = ws.merge(es, on=["x", "y"])
        if not len(m):
            return empty_safe(
                pd.DataFrame({"canon_a": pd.Series(dtype="object"),
                              "canon_b": pd.Series(dtype="object"),
                              "aa_units": pd.Series(dtype="int64")})
            )
        return pd.DataFrame(
            {"canon_a": m["x"], "canon_b": m["y"],
             "aa_units": m["s"].to_numpy(np.int64)}
        )

    return hash_groupby(w.union(e_tagged), ["x", "y"], score)


CONV_JAC_DF_CAP = 50   # stop-entity cap: entities in > this many convs are dropped
CONV_JAC_NUM, CONV_JAC_DEN = 3, 10  # keep pairs with Jaccard >= 3/10


def conv_jaccard(sf_dir: str):
    """(conv_a, conv_b, n_common, n_union) — conversation near-dup pairs by
    canonical-entity-set Jaccard ≥ ``CONV_JAC_NUM/CONV_JAC_DEN``, checked
    with the integer cross-multiplication ``n_common·DEN ≥ NUM·n_union``
    (no float ever computed → bit-exact oracle). The document-level
    near-dup signal a KG consumer uses to collapse re-ingested or
    templated conversations — the set-similarity analog of the reference's
    structural duplicate queries over shared AST shapes
    (`semanticcpg/.../language/package.scala`).

    Hub discipline: entities appearing in more than ``CONV_JAC_DF_CAP``
    conversations are stop-entities — dropped from every set BEFORE sizes
    and intersections (both sides of the oracle apply the same cap), the
    ngram_jaccard stop-shingle precedent (functions/dedup.py). Pair volume
    is then Σ df² with df ≤ cap — bounded per entity, never all-pairs.

    Scale shape: mention stream → ONE (conv, canon)-keyed exchange for the
    global distinct sets → entity df is vocab-scale (hash_agg + broadcast
    keep-list) → pairs emit from per-ENTITY buckets (inverted index) →
    bucketed integer sum per conv pair → threshold is a pure map. Set
    sizes broadcast (conv-dim scale; at 10^12-turn scale route them
    through a sharded lookup — the validate.py 50M-row switch precedent)."""
    ds = _canon_mention_turns(sf_dir)

    cs = hash_agg(
        ds.map_batches(
            lambda t: empty_safe(t[["conv_id", "canon"]].drop_duplicates()),
            batch_format="pandas",
        ),
        ["conv_id", "canon"], n=("canon", "size"),
    ).drop_columns(["n"]).materialize()

    dfc = hash_agg(cs, "canon", df=("canon", "size")).to_pandas()
    keep = dfc.loc[dfc["df"] <= CONV_JAC_DF_CAP, "canon"]
    kref = ray.put(np.sort(keep.to_numpy(object)))

    def fil(t: pd.DataFrame) -> pd.DataFrame:
        ks = get_broadcast(kref)
        arr = t["canon"].to_numpy(object)
        if not len(ks) or not len(arr):
            return empty_safe(t.iloc[0:0])
        pos = np.clip(np.searchsorted(ks, arr), 0, len(ks) - 1)
        return empty_safe(t[ks[pos] == arr])

    kept = cs.map_batches(fil, batch_format="pandas").materialize()
    sz = hash_agg(kept, "conv_id", n=("conv_id", "size")).to_pandas()
    sref = ray.put(build_lookup(sz["conv_id"], sz["n"].to_numpy(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="canon")
        m = m[m["conv_id_x"] < m["conv_id_y"]]
        pc = m.groupby(["conv_id_x", "conv_id_y"], as_index=False).size()
        return empty_safe(pc.rename(columns={
            "conv_id_x": "conv_a", "conv_id_y": "conv_b", "size": "n_common"
        }))

    pr = hash_agg(
        hash_groupby(kept, "canon", pairs),
        ["conv_a", "conv_b"], n_common=("n_common", "sum"),
    )

    def score(t: pd.DataFrame) -> pd.DataFrame:
        tbl = get_broadcast(sref)
        na = lookup_keys(tbl, t["conv_a"]).astype(np.int64)
        nb = lookup_keys(tbl, t["conv_b"]).astype(np.int64)
        nc = t["n_common"].to_numpy(np.int64)
        nu = na + nb - nc
        m = nc * CONV_JAC_DEN >= CONV_JAC_NUM * nu
        return empty_safe(pd.DataFrame(
            {"conv_a": t["conv_a"].to_numpy()[m],
             "conv_b": t["conv_b"].to_numpy()[m],
             "n_common": nc[m], "n_union": nu[m]}
        ))

    return pr.map_batches(score, batch_format="pandas")


LPA_ITERS = 3


def communities(sf_dir: str):
    """(canon, community) — community detection over the undirected
    co-mention graph by synchronous label propagation: ``LPA_ITERS`` fixed
    rounds from self-labels, each node adopting the most frequent label
    among its neighbors, ties broken by lexicographic minimum — fully
    deterministic (no float, no randomness) so the unrolled SQL oracle is
    bit-exact. Fixed-round sync LPA is the distributed-safe variant (async
    LPA is order-dependent); domain = nodes incident to ≥1 co-mention
    edge. The topic-cluster view of the KG — the analog of grouping the
    reference's graph by connected structural neighborhoods
    (`semanticcpg/.../language/package.scala`).

    Scale shape: the edge list is entity-vocab-scale; labels broadcast per
    iteration (the pagerank discipline), votes emit from a distributed
    edge scan with per-batch pre-aggregation, one (node, lab)-keyed
    bucketed sum, and the per-node argmax runs in node-keyed buckets."""
    edges = _cooc_edges(sf_dir)

    und = edges.map_batches(
        lambda t: pd.DataFrame(
            {"src": pd.concat([t["a"], t["b"]], ignore_index=True),
             "dst": pd.concat([t["b"], t["a"]], ignore_index=True)}
        ),
        batch_format="pandas",
    ).materialize()

    nodes = hash_agg(und, "dst", n=("dst", "size")).to_pandas()
    dom = nodes["dst"].to_numpy(object)
    if not len(dom):
        return pd.DataFrame({"canon": pd.Series(dtype="object"),
                             "community": pd.Series(dtype="object")})
    lab = pd.Series(dom, index=dom)

    for _ in range(LPA_ITERS):
        lref = ray.put(build_lookup(lab.index, lab.to_numpy(object)))

        def votes(t: pd.DataFrame) -> pd.DataFrame:
            ls = lookup_keys(get_broadcast(lref), t["src"], default="self")
            g = pd.DataFrame({"node": t["dst"], "lab": ls})
            return empty_safe(
                g.groupby(["node", "lab"], as_index=False)
                .size().rename(columns={"size": "c"})
            )

        vs = hash_agg(
            und.map_batches(votes, batch_format="pandas"),
            ["node", "lab"], c=("c", "sum"),
        )

        def pick(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["node", "c", "lab"], ascending=[True, False, True],
                kind="stable",
            )
            return g.drop_duplicates("node", keep="first")[["node", "lab"]]

        new = hash_groupby(vs, "node", pick).to_pandas()
        lab = pd.Series(new["lab"].to_numpy(object),
                        index=new["node"].to_numpy(object))

    out = pd.DataFrame(
        {"canon": lab.index.to_numpy(object),
         "community": lab.to_numpy(object)}
    )
    return out.sort_values("canon", ignore_index=True)


def conv_groups(sf_dir: str):
    """(conv_id, grp) — the conversation-level dedup policy composed
    end-to-end: ``conv_jaccard`` near-dup pairs → connected components
    (the engine's union-find, ``functions/cc.canonical_map``) → grp = the
    component's MIN conv_id, or the conversation itself when it is in no
    component. The conversation analog of ``dedup_keep_list``'s
    candidate→cluster→select flow, giving a KG consumer the collapse map
    for re-ingested/templated conversations.

    Scale shape: pair volume is near-dup-scale (≪ corpus) so the
    component map broadcasts; the conversation universe streams through a
    vectorized sorted-probe — never driver-materialized."""
    import ray.data

    from ..functions.cc import canonical_map
    from ..sources.transcripts import ensure_transcripts

    pairs = conv_jaccard(sf_dir).map_batches(
        lambda t: empty_safe(t.rename(columns={"conv_a": "a", "conv_b": "b"})
                             [["a", "b"]]),
        batch_format="pandas",
    )
    cm = canonical_map(pairs)  # DataFrame(node, component) — dup-scale
    if len(cm):
        nodes = cm["node"].to_numpy(object)
        order = np.argsort(nodes)
        nodes_s = nodes[order]
        comps_s = cm["component"].to_numpy(object)[order]
    else:
        nodes_s = np.empty(0, object)
        comps_s = np.empty(0, object)
    gref = ray.put((nodes_s, comps_s))

    def assign(t: pd.DataFrame) -> pd.DataFrame:
        ns, cs = get_broadcast(gref)
        cv = t["conv_id"].drop_duplicates().to_numpy(object)
        grp = cv.copy()
        if len(ns) and len(cv):
            pos = np.clip(np.searchsorted(ns, cv), 0, len(ns) - 1)
            hit = ns[pos] == cv
            grp[hit] = cs[pos][hit]
        return empty_safe(pd.DataFrame({"conv_id": cv, "grp": grp}))

    convs = ray.data.read_parquet(ensure_transcripts(sf_dir), columns=["conv_id"])
    out = convs.map_batches(assign, batch_format="pandas")
    # batch-level dedup above, global distinct here (conversations span files)
    return hash_groupby(out, "conv_id", lambda g: g.drop_duplicates())
