"""Graph-analytics + window-operator tests.

Every distributed result is checked against a single-threaded pure-python/
pandas reference on the same input (the CodeToCpgSuite fixture discipline,
`semanticcpg-tests/.../testfixtures/CodeToCpgSuite.scala:14-49`): the
distributed shuffle plan and the obviously-correct loop must agree exactly.
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cooc_edges(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import _cooc_edges

    return _cooc_edges(SF_DIR).to_pandas()


def test_cooccurrence_edge_invariants(ray_session, cooc_edges):
    assert len(cooc_edges) > 0
    assert (cooc_edges["a"] < cooc_edges["b"]).all()
    assert not cooc_edges.duplicated(["a", "b"]).any()


def test_degree_matches_edge_list(ray_session, cooc_edges):
    from codepropertygraph_ray.pipelines.analytics import entity_degree

    deg = entity_degree(SF_DIR).to_pandas()
    ref = pd.concat(
        [cooc_edges["a"], cooc_edges["b"]], ignore_index=True
    ).value_counts()
    assert dict(zip(deg["canon"], deg["degree"])) == ref.to_dict()


def test_triangle_count_matches_bruteforce(ray_session, cooc_edges):
    from codepropertygraph_ray.pipelines.analytics import triangle_count

    got = int(triangle_count(SF_DIR)["n_triangles"].iloc[0])
    adj: dict = defaultdict(set)
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        adj[a].add(b)
        adj[b].add(a)
    ref = sum(
        1
        for a, b in zip(cooc_edges["a"], cooc_edges["b"])
        for c in (adj[a] & adj[b])
        if b < c
    )
    assert got == ref
    assert got > 0  # the corpus plants co-mention cliques


def test_bfs_matches_reference(ray_session, cooc_edges):
    from codepropertygraph_ray.pipelines.analytics import BFS_MAX_DEPTH, entity_bfs

    adj: dict = defaultdict(list)
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        adj[a].append(b)
        adj[b].append(a)
    seed = min(cooc_edges["a"].min(), cooc_edges["b"].min())
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= BFS_MAX_DEPTH:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = entity_bfs(SF_DIR)
    assert dict(zip(got["canon"], got["dist"])) == dist


def test_pagerank_matches_reference(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import (
        PR_DAMPING,
        PR_ITERS,
        pagerank,
    )
    from codepropertygraph_ray.pipelines.queries import kg_runner

    tri = (
        kg_runner(SF_DIR)
        .ctx.read("link", "triples", columns=["subj", "obj"])
        .to_pandas()
        .drop_duplicates()
    )
    nodes = sorted(set(tri["subj"]) | set(tri["obj"]))
    n = len(nodes)
    deg = tri.groupby("subj").size().to_dict()
    r = {x: 1.0 / n for x in nodes}
    for _ in range(PR_ITERS):
        c: dict = defaultdict(float)
        for s, o in zip(tri["subj"], tri["obj"]):
            c[o] += r[s] / deg[s]
        r = {x: (1.0 - PR_DAMPING) / n + PR_DAMPING * c.get(x, 0.0) for x in nodes}
    got = pagerank(SF_DIR)
    assert list(got["canon"]) == nodes
    ref = np.array([r[x] for x in nodes])
    assert np.allclose(got["pr"].to_numpy(), ref, atol=1e-9)
    # total rank ≤ 1 (dangling mass drops, never grows) modulo the
    # PR_ROUND per-row rounding slack
    assert got["pr"].sum() <= 1.0 + 5e-8 * len(got)


def test_hits_matches_reference(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import HITS_ITERS, hits
    from codepropertygraph_ray.pipelines.queries import kg_runner

    tri = (
        kg_runner(SF_DIR)
        .ctx.read("link", "triples", columns=["subj", "obj"])
        .to_pandas()
        .drop_duplicates()
    )
    nodes = sorted(set(tri["subj"]) | set(tri["obj"]))
    hub = {x: 1 for x in nodes}
    edges = list(zip(tri["subj"], tri["obj"]))
    for _ in range(HITS_ITERS):
        auth: dict = defaultdict(int)
        for s, o in edges:
            auth[o] += hub[s]
        hub = defaultdict(int)
        for s, o in edges:
            hub[s] += auth[o]
    got = hits(SF_DIR)
    assert list(got["canon"]) == nodes
    assert list(got["auth_units"]) == [auth.get(x, 0) for x in nodes]
    assert list(got["hub_units"]) == [hub.get(x, 0) for x in nodes]
    # all-integer contract: no floats anywhere in the gate
    assert got["auth_units"].dtype == "int64" and got["hub_units"].dtype == "int64"


# ---------------------------------------------------------------------------
# window / percentile / sampling operators
# ---------------------------------------------------------------------------


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True
    )


def test_retention_cohorts_matches_pandas(ray_session):
    from codepropertygraph_ray.functions.relational import retention_cohorts

    ev = _events()
    day = ev["ts"].dt.floor("D").astype("datetime64[s]").astype("int64") // 86400
    ud = pd.DataFrame({"user_id": ev["user_id"], "d": day}).drop_duplicates()
    cohort = ud.groupby("user_id")["d"].transform("min")
    ref = (
        pd.DataFrame({"cohort_day": cohort, "age_days": ud["d"] - cohort})
        .groupby(["cohort_day", "age_days"], as_index=False)
        .size().rename(columns={"size": "active_users"})
        .sort_values(["cohort_day", "age_days"], ignore_index=True)
    )
    got = retention_cohorts(SF_DIR)
    pd.testing.assert_frame_equal(
        got, ref.astype({"active_users": "int64"}), check_dtype=False
    )
    # invariant: age 0 of every cohort counts the whole cohort exactly once
    assert (got.groupby("cohort_day")["age_days"].min() == 0).all()


def test_entity_salience_matches_loop(ray_session, kg_run):
    from codepropertygraph_ray.functions.agg import round_half_away
    from codepropertygraph_ray.pipelines.analytics import (
        IDF_UNIT,
        _canon_mention_turns,
        entity_salience,
    )
    from codepropertygraph_ray.pipelines.queries import kg_runner

    mc = _canon_mention_turns(SF_DIR).to_pandas().drop_duplicates()
    nodes = kg_runner(SF_DIR).ctx.read_logical("nodes", columns=["label"]).to_pandas()
    nconv = int((nodes["label"] == "CONVERSATION").sum())
    ct = mc.groupby(["conv_id", "canon"], as_index=False).size().rename(
        columns={"size": "tf"}
    )
    df = ct.groupby("canon")["tf"].size()
    idf = {
        c: int(round_half_away(10.0**IDF_UNIT * np.log(nconv / float(d)), 0))
        for c, d in df.items()
    }
    ct["s"] = ct["tf"] * ct["canon"].map(idf)
    ref = (
        ct.sort_values(["conv_id", "s", "canon"], ascending=[True, False, True])
        .drop_duplicates("conv_id", keep="first")
        .set_index("conv_id")
    )
    got = entity_salience(SF_DIR).to_pandas().set_index("conv_id").sort_index()
    assert got["canon"].to_dict() == ref["canon"].to_dict()
    assert got["salience_units"].to_dict() == ref["s"].to_dict()


def test_event_transitions_matches_pandas(ray_session):
    from codepropertygraph_ray.functions.relational import event_transitions

    ev = _events().sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    same = ev["user_id"].eq(ev["user_id"].shift())
    ref = (
        pd.DataFrame({"from_type": ev["event_type"].shift()[same],
                      "to_type": ev["event_type"][same]})
        .groupby(["from_type", "to_type"], as_index=False).size()
        .rename(columns={"size": "n"})
        .sort_values(["from_type", "to_type"], ignore_index=True)
    )
    got = event_transitions(SF_DIR)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_out_of_order_matches_pandas(ray_session):
    from codepropertygraph_ray.functions.relational import out_of_order_events

    ev = _events().sort_values(["user_id", "event_id"], ignore_index=True)
    ts = ev["ts"].astype("datetime64[us]").astype("int64")
    pmax = ts.groupby(ev["user_id"]).cummax().shift()
    same = ev["user_id"].eq(ev["user_id"].shift())
    late = same & (ts < pmax)
    ref = pd.DataFrame({"user_id": ev["user_id"], "late": late}).groupby(
        "user_id"
    ).agg(n_events=("late", "size"), n_late=("late", "sum"))
    got = (
        out_of_order_events(SF_DIR).to_pandas()
        .set_index("user_id").sort_index()
    )
    assert got["n_events"].to_dict() == ref["n_events"].to_dict()
    assert got["n_late"].to_dict() == {k: int(v) for k, v in ref["n_late"].items()}


def test_unpivot_roundtrips_measures(ray_session):
    from codepropertygraph_ray.functions.relational import (
        UNPIVOT_MEASURES,
        unpivot_lineitem,
    )

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    got = unpivot_lineitem(SF_DIR).to_pandas()
    assert len(got) == len(li) * len(UNPIVOT_MEASURES)
    # multiset equality vs a direct pandas melt ((orderkey, linenumber) is
    # NOT unique in the synthetic lineitem, so no keyed round-trip)
    frames = []
    for m in UNPIVOT_MEASURES:
        v = li[m].to_numpy()
        frames.append(pd.DataFrame({
            "l_orderkey": li["l_orderkey"], "l_linenumber": li["l_linenumber"],
            "measure": m,
            "value_cents": (np.floor(np.abs(v) * 100 + 0.5)
                            * np.sign(v)).astype("int64"),
        }))
    ref = pd.concat(frames, ignore_index=True)
    cols = ["l_orderkey", "l_linenumber", "measure", "value_cents"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, ignore_index=True),
        ref[cols].sort_values(cols, ignore_index=True),
        check_dtype=False,
    )


def test_trend_slope_matches_numpy_lstsq(ray_session):
    """The integer numerator must equal numpy's least-squares slope times
    the corpus-constant denominator on the zero-filled axis."""
    from codepropertygraph_ray.functions.relational import trend_slope

    ev = _events()
    h = ev["ts"].dt.floor("h").astype("datetime64[s]").astype("int64") // 3600
    h0, h1 = int(h.min()), int(h.max())
    n = h1 - h0 + 1
    xs = np.arange(n, dtype=np.float64)
    denom = n * (xs**2).sum() - xs.sum() ** 2
    got = trend_slope(SF_DIR).set_index("event_type")["trend_units"]
    for et, grp in ev.groupby("event_type"):
        y = np.zeros(n)
        vc = (h[grp.index] - h0).value_counts()
        y[vc.index.to_numpy()] = vc.to_numpy()
        slope = np.polyfit(xs, y, 1)[0]
        assert got[et] == pytest.approx(slope * denom, rel=1e-9, abs=1e-3)


def test_rolling_avg_matches_direct_window(ray_session):
    from codepropertygraph_ray.functions.relational import rolling_avg_events

    got = rolling_avg_events(SF_DIR).to_pandas()
    ev = _events()
    ref = {}
    for _, g in ev.groupby("user_id"):
        v = g["value"].to_numpy()
        e = g["event_id"].to_numpy()
        for i in range(len(v)):
            ref[e[i]] = round(float(np.mean(v[max(0, i - 2) : i + 1])), 4)
    assert len(got) == len(ev)
    assert {e: round(a, 4) for e, a in zip(got["event_id"], got["avg3"])} == ref


def test_lag_gaps_matches_shift(ray_session):
    from codepropertygraph_ray.functions.relational import lag_gaps

    got = lag_gaps(SF_DIR).to_pandas().sort_values("event_id", ignore_index=True)
    ev = _events()
    same = ev["user_id"].eq(ev["user_id"].shift())
    ts_us = ev["ts"].astype("datetime64[us]").astype("int64")
    ref = pd.DataFrame(
        {
            "event_id": ev["event_id"][same],
            "prev_event_id": ev["event_id"].shift()[same].astype("int64"),
            "gap_us": (ts_us - ts_us.shift())[same].astype("int64"),
        }
    ).sort_values("event_id", ignore_index=True)
    assert got[["event_id", "prev_event_id", "gap_us"]].equals(ref)


def test_median_is_percentile_disc(ray_session):
    from codepropertygraph_ray.functions.relational import median_price_by_priority

    got = median_price_by_priority(SF_DIR).to_pandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    for prio, g in orders.groupby("o_orderpriority"):
        v = np.sort(g["o_totalprice"].to_numpy())
        # percentile_disc(0.5): smallest value with cume_dist ≥ 0.5
        idx = int(np.ceil(len(v) * 0.5)) - 1
        assert got.loc[got["o_orderpriority"] == prio, "median_price"].iloc[0] == v[idx]


def test_hash_sample_is_deterministic_subset(ray_session):
    from codepropertygraph_ray.functions.relational import (
        SAMPLE_KEEP,
        SAMPLE_MOD,
        SAMPLE_MULT,
        sample_orders_hash,
    )

    got = sample_orders_hash(SF_DIR).to_pandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    h = (orders["o_orderkey"].to_numpy(np.int64) * SAMPLE_MULT) % SAMPLE_MOD
    ref = set(orders["o_orderkey"][h < SAMPLE_KEEP])
    assert set(got["o_orderkey"]) == ref
    again = sample_orders_hash(SF_DIR).to_pandas()
    assert set(again["o_orderkey"]) == ref


def test_bigram_counts_match_counter(ray_session):
    from collections import Counter

    from codepropertygraph_ray.functions.text import bigram_counts

    got = bigram_counts(SF_DIR, min_n=5).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ctr: Counter = Counter()
    for text in docs["text"]:
        toks = text.split(" ")
        ctr.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    ref = {k: v for k, v in ctr.items() if v >= 5}
    assert dict(zip(got["bigram"], got["n"])) == ref


def test_entity_jaccard_matches_setmath(ray_session, cooc_edges):
    from codepropertygraph_ray.pipelines.analytics import entity_jaccard

    got = entity_jaccard(SF_DIR).to_pandas()
    adj: dict = defaultdict(set)
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        adj[a].add(b)
        adj[b].add(a)
    ref = {}
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        c = len(adj[a] & adj[b])
        if c:
            ref[(a, b)] = round(c / (len(adj[a]) + len(adj[b]) - c), 6)
    assert {(a, b): j for a, b, j in zip(got["canon_a"], got["canon_b"], got["jac"])} == ref


def test_pivot_matches_crosstab(ray_session):
    from codepropertygraph_ray.functions.relational import (
        EVENT_TYPES,
        pivot_event_types,
    )

    got = pivot_event_types(SF_DIR).to_pandas().sort_values("user_id", ignore_index=True)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ref = (
        pd.crosstab(ev["user_id"], ev["event_type"])
        .reindex(columns=EVENT_TYPES, fill_value=0)
        .reset_index()
    )
    for t in EVENT_TYPES:
        assert (got[f"n_{t}"].to_numpy() == ref[t].to_numpy()).all()


def test_region_nations_sorted_join(ray_session):
    from codepropertygraph_ray.functions.relational import region_nation_list

    got = region_nation_list(SF_DIR)
    assert len(got) == 5
    for ns in got["nations"]:
        parts = ns.split(",")
        assert parts == sorted(parts) and len(parts) == 5


def test_top_term_matches_counter(ray_session):
    from collections import Counter

    from codepropertygraph_ray.functions.text import top_term

    got = top_term(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ctr = Counter(text.split(" "))
        best = min(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        row = got[got["doc_id"] == doc_id].iloc[0]
        assert (row["top_term"], row["n"]) == best


def test_rollup_levels_consistent(ray_session):
    from codepropertygraph_ray.functions.relational import rollup_revenue

    got = rollup_revenue(SF_DIR)
    base = got[(got["r_name"] != "ALL") & (got["n_name"] != "ALL")]
    per_region = got[(got["r_name"] != "ALL") & (got["n_name"] == "ALL")]
    total = got[(got["r_name"] == "ALL") & (got["n_name"] == "ALL")]
    assert len(total) == 1
    # each level re-sums the one below (rounding slack ≤ a cent per term)
    for r, rev in zip(per_region["r_name"], per_region["revenue"]):
        sub = base.loc[base["r_name"] == r, "revenue"].sum()
        assert abs(sub - rev) < 0.05
    assert abs(base["revenue"].sum() - total["revenue"].iloc[0]) < 0.25


def test_stratified_sample_matches_reference(ray_session):
    from codepropertygraph_ray.functions.relational import (
        SAMPLE_MOD,
        SAMPLE_MULT,
        STRAT_K,
        sample_stratified_events,
    )

    got = sample_stratified_events(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.assign(_h=(ev["event_id"].to_numpy(np.int64) * SAMPLE_MULT) % SAMPLE_MOD)
    ref = (
        ev.sort_values(["event_type", "_h", "event_id"])
        .groupby("event_type")
        .head(STRAT_K)
    )
    assert set(zip(got["event_type"], got["event_id"])) == set(
        zip(ref["event_type"], ref["event_id"])
    )
    assert got.groupby("event_type").size().le(STRAT_K).all()


def test_frame_sampling_fanout_and_determinism(ray_session):
    from codepropertygraph_ray.functions.multimodal import (
        FRAME_EVERY_MS,
        featurize_frames,
        sample_frames,
        synthetic_video,
    )

    media = synthetic_video(SF_DIR).to_pandas()
    expected = sum(
        max(int(d) // FRAME_EVERY_MS, 1) for d in media["duration_ms"]
    )
    a = featurize_frames(sample_frames(synthetic_video(SF_DIR))).to_pandas()
    a = a.sort_values(["media_id", "frame_idx"], ignore_index=True)
    assert len(a) == expected
    assert (a["ts_ms"] == a["frame_idx"] * FRAME_EVERY_MS).all()
    b = featurize_frames(sample_frames(synthetic_video(SF_DIR))).to_pandas()
    b = b.sort_values(["media_id", "frame_idx"], ignore_index=True)
    assert a[["media_id", "frame_idx", "ts_ms"]].equals(
        b[["media_id", "frame_idx", "ts_ms"]]
    )
    import numpy as np

    assert np.array_equal(np.stack(a["features"]), np.stack(b["features"]))


def test_contamination_and_split(ray_session):
    from codepropertygraph_ray.functions.text import (
        CONTAMINATION_PROBES,
        SPLIT_MOD,
        SPLIT_MULT,
        contamination,
        dataset_split,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    got = contamination(SF_DIR).to_pandas()
    ref = {
        did: any(p in t for p in CONTAMINATION_PROBES)
        for did, t in zip(docs["doc_id"], docs["text"])
    }
    assert dict(zip(got["doc_id"], got["contaminated"])) == ref
    assert got["contaminated"].any()  # probes chosen to hit the corpus

    sp = dataset_split(SF_DIR).to_pandas()
    h = (docs["doc_id"].to_numpy(np.int64) * SPLIT_MULT) % SPLIT_MOD % 100
    exp = {"train": int((h < 80).sum()),
           "val": int(((h >= 80) & (h < 90)).sum()),
           "test": int((h >= 90).sum())}
    assert dict(zip(sp["split"], sp["n_docs"])) == {k: v for k, v in exp.items() if v}


def test_sliding_max_matches_direct_window(ray_session):
    from codepropertygraph_ray.functions.relational import sliding_max_events

    got = sliding_max_events(SF_DIR).to_pandas()
    ev = _events()
    ref = {}
    for _, g in ev.groupby("user_id"):
        ts = g["ts"].to_numpy()
        v = g["value"].to_numpy()
        e = g["event_id"].to_numpy()
        for i in range(len(v)):
            lo = ts[i] - np.timedelta64(30, "m")
            ref[e[i]] = v[(ts >= lo) & (ts <= ts[i])].max()
    assert dict(zip(got["event_id"], got["max30"])) == ref


def test_dbscan_matches_reference(ray_session):
    from codepropertygraph_ray.functions.similarity import (
        DBSCAN_COS,
        DBSCAN_MIN_PTS,
        _matrix,
        dbscan_embeddings,
    )

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    m = _matrix(emb)
    ids = emb["vec_id"].to_numpy(np.int64)
    sims = m @ m.T
    adj = defaultdict(set)
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= DBSCAN_COS:
                adj[ids[i]].add(ids[j])
                adj[ids[j]].add(ids[i])
    cores = {x for x in adj if len(adj[x]) >= DBSCAN_MIN_PTS}
    # clusters: CC over core-core edges, min-id label (isolated cores self)
    cluster = {}
    for c in sorted(cores):
        if c in cluster:
            continue
        comp, q = [], deque([c])
        seen = {c}
        while q:
            u = q.popleft()
            comp.append(u)
            for v in adj[u]:
                if v in cores and v not in seen:
                    seen.add(v)
                    q.append(v)
        rep = min(comp)
        for x in comp:
            cluster[x] = rep
    ref = {}
    for x in ids:
        if x in cores:
            ref[x] = (cluster[x], True)
        else:
            adj_cores = [cluster[y] for y in adj.get(x, ()) if y in cores]
            ref[x] = (min(adj_cores) if adj_cores else -1, False)
    got = dbscan_embeddings(SF_DIR).to_pandas()
    assert {v: (c, k) for v, c, k in zip(got["vec_id"], got["cluster"], got["is_core"])} == ref


def test_hourly_active_users_exact(ray_session):
    from codepropertygraph_ray.functions.relational import hourly_active_users

    got = hourly_active_users(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    hour = ev["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
    ref = ev.assign(h=hour).groupby("h")["user_id"].nunique()
    assert dict(zip(got["hour_epoch"], got["n_users"])) == ref.to_dict()


def test_entity_span_reference(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import (
        _canon_mention_turns,
        entity_span,
    )

    mc = _canon_mention_turns(SF_DIR).to_pandas().drop_duplicates()
    pos = mc["conv_id"] + ":" + mc["turn_idx"].astype("int64").astype(str).str.zfill(9)
    ref = (
        mc.assign(pos=pos)
        .groupby("canon")
        .agg(first_turn=("pos", "min"), last_turn=("pos", "max"),
             n_convs=("conv_id", "nunique"))
    )
    got = entity_span(SF_DIR).to_pandas().set_index("canon")
    assert got["first_turn"].to_dict() == ref["first_turn"].to_dict()
    assert got["last_turn"].to_dict() == ref["last_turn"].to_dict()
    assert got["n_convs"].to_dict() == {k: int(v) for k, v in ref["n_convs"].items()}


def test_hll_sketch_error_merge_and_determinism(ray_session):
    from codepropertygraph_ray.functions.sketch import (
        hll_distinct_users,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    exact = ev.groupby("event_type")["user_id"].nunique()
    got = hll_distinct_users(SF_DIR).to_pandas()
    for et, n in zip(got["event_type"], got["approx_users"]):
        assert abs(n - exact[et]) <= max(0.1 * exact[et], 3), (et, n, exact[et])
    # max-merge is exactly associative: split registers == whole-column
    s = ev["user_id"]
    whole = hll_registers(s)
    parts = [hll_registers(s.iloc[i::3]) for i in range(3)]
    assert (hll_merge(parts) == whole).all()
    assert hll_estimate(whole) == hll_estimate(hll_merge(parts))
    # determinism across executions
    again = hll_distinct_users(SF_DIR).to_pandas()
    assert dict(zip(got["event_type"], got["approx_users"])) == dict(
        zip(again["event_type"], again["approx_users"])
    )


def test_fuzzy_keys_match_bruteforce(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import fuzzy_key_pairs
    from codepropertygraph_ray.pipelines.queries import entity_keys

    got = fuzzy_key_pairs(SF_DIR).to_pandas()
    keys = sorted(entity_keys(SF_DIR).to_pandas()["key"])

    def ed1(a, b):
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    ref = {(a, b) for i, a in enumerate(keys) for b in keys[i + 1:]
           if ed1(a, b)}
    assert set(zip(got["key_a"], got["key_b"])) == ref
    assert not got.duplicated(["key_a", "key_b"]).any()


def test_gap_fill_matches_loop(ray_session):
    from codepropertygraph_ray.functions.relational import gap_fill_hourly

    got = gap_fill_hourly(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["user_id", "ts"])
    hour = (ev["ts"].astype("datetime64[us]").astype("int64")
            // 3_600_000_000) * 3600
    counts = defaultdict(int)
    for u, h in zip(ev["user_id"], hour):
        counts[(u, h)] += 1
    ref = {}
    for u in ev["user_id"].unique():
        hs = [h for (uu, h) in counts if uu == u]
        for h in range(min(hs), max(hs) + 3600, 3600):
            ref[(u, h)] = counts.get((u, h), 0)
    assert dict(zip(zip(got["user_id"], got["hour_epoch"]),
                    got["n_events"])) == ref


def test_skyline_matches_bruteforce(ray_session):
    from codepropertygraph_ray.functions.relational import skyline_orders

    got = skyline_orders(SF_DIR).to_pandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    d = o["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
    p = o["o_totalprice"].to_numpy()
    dominated = np.zeros(len(o), dtype=bool)
    for i in range(len(o)):
        dominated[i] = bool(np.any(
            (p >= p[i]) & (d <= d[i]) & ((p > p[i]) | (d < d[i]))))
    assert set(got["o_orderkey"]) == set(o["o_orderkey"].to_numpy()[~dominated])
    assert len(got) == int((~dominated).sum())


def test_first_last_matches_sort(ray_session):
    from codepropertygraph_ray.functions.relational import first_last_event

    got = first_last_event(SF_DIR).to_pandas()
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    first = ev.drop_duplicates("user_id", keep="first").set_index("user_id")
    last = ev.drop_duplicates("user_id", keep="last").set_index("user_id")
    assert dict(zip(got["user_id"], got["first_event"])) == \
        first["event_type"].to_dict()
    assert dict(zip(got["user_id"], got["last_event"])) == \
        last["event_type"].to_dict()


def test_session_overlap_matches_pairscan(ray_session):
    from codepropertygraph_ray.functions.asof import session_overlap_counts
    from codepropertygraph_ray.functions.relational import sessionize_events

    got = session_overlap_counts(SF_DIR).to_pandas()
    sess = sessionize_events(SF_DIR).to_pandas()
    s = sess["session_start"].astype("datetime64[us]").astype("int64").to_numpy()
    e = sess["session_end"].astype("datetime64[us]").astype("int64").to_numpy()
    n = len(sess)
    ref = {}
    for i in range(n):
        ov = (s <= e[i]) & (e >= s[i])
        ov[i] = False
        ref[(sess["user_id"].iat[i], sess["session_idx"].iat[i])] = int(ov.sum())
    assert dict(zip(zip(got["user_id"], got["session_idx"]),
                    got["n_overlap"])) == ref


def test_pack_chunks_stream_invariants(ray_session):
    from codepropertygraph_ray.functions.text import (
        PACK_BUDGET, pack_chunks,
    )

    got = pack_chunks(SF_DIR).to_pandas().sort_values(
        ["shard", "doc_id"], ignore_index=True)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ntok = {d: len(t.split()) for d, t in zip(docs["doc_id"], docs["text"])}
    assert len(got) == len(docs)
    # per shard: offsets are the exclusive prefix sum of token counts in
    # doc_id order, and chunk spans follow from pure offset arithmetic
    for _, g in got.groupby("shard"):
        pos = 0
        for r in g.itertuples():
            n = ntok[r.doc_id]
            assert r.start_tok == pos
            assert r.chunk_first == pos // PACK_BUDGET
            assert r.chunk_last == (pos + max(n, 1) - 1) // PACK_BUDGET
            pos += n


def test_repetition_matches_bruteforce(ray_session):
    from codepropertygraph_ray.functions.text import repetition_stats

    got = repetition_stats(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for r in got.sample(50, random_state=0).itertuples():
        toks = docs.loc[docs["doc_id"] == r.doc_id, "text"].iat[0].split()
        tris = list(zip(toks, toks[1:], toks[2:]))
        assert r.n_trigrams == len(tris)
        assert r.n_dup_trigrams == len(tris) - len(set(tris))


def test_shuffle_rank_is_hash_order_permutation(ray_session):
    from codepropertygraph_ray.functions.relational import (
        SAMPLE_MOD, SAMPLE_MULT, shuffle_rank_orders,
    )

    got = shuffle_rank_orders(SF_DIR).to_pandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    assert sorted(got["shuffle_pos"]) == list(range(len(orders)))
    h = (orders["o_orderkey"].to_numpy(np.int64) * SAMPLE_MULT) % SAMPLE_MOD
    ref = orders.assign(h=h).sort_values(
        ["h", "o_orderkey"], ignore_index=True)["o_orderkey"]
    by_pos = got.sort_values("shuffle_pos", ignore_index=True)["o_orderkey"]
    assert list(by_pos) == list(ref)


def test_unigram_logprob_matches_bruteforce(ray_session):
    import math
    import re
    from collections import Counter

    from codepropertygraph_ray.functions.text import unigram_logprob

    got = unigram_logprob(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    word_re = re.compile(r"[a-z]+")
    toks = {d: word_re.findall(t.lower())
            for d, t in zip(docs["doc_id"], docs["text"])}
    ctr: Counter = Counter()
    for ws in toks.values():
        ctr.update(ws)
    total = sum(ctr.values())

    def unit(w):
        x = math.log(ctr[w] / total) * 1e6
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    for r in got.sample(50, random_state=0).itertuples():
        ws = toks[r.doc_id]
        assert r.n_words == len(ws)
        assert r.logprob_units == sum(unit(w) for w in ws)


def test_cms_heavy_users_bounds_and_determinism(ray_session):
    from codepropertygraph_ray.functions.sketch import (
        CMS_D, CMS_W, cms_estimate, cms_heavy_users, cms_sketch,
    )

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    true = ev["user_id"].value_counts()
    got = cms_heavy_users(SF_DIR)
    n = len(ev)
    for r in got.itertuples():
        t = int(true.get(r.user_id, 0))
        assert r.approx_n >= t            # CMS never underestimates
        assert r.approx_n <= t + int(np.e / CMS_W * n) + 8  # w.h.p. bound
    again = cms_heavy_users(SF_DIR)
    pd.testing.assert_frame_equal(got, again)
    # linearity: sketch(whole) == sum of split sketches
    u = ev["user_id"].astype("int64")
    whole = cms_sketch(u)
    half = cms_sketch(u.iloc[: n // 2]) + cms_sketch(u.iloc[n // 2:])
    assert (whole == half).all()
    est = cms_estimate(whole, u.iloc[:100])
    assert (est >= true.loc[u.iloc[:100]].to_numpy()).all()


def test_local_cc_matches_bruteforce(ray_session, cooc_edges):
    from codepropertygraph_ray.pipelines.analytics import entity_local_cc

    got = entity_local_cc(SF_DIR)
    adj: dict = defaultdict(set)
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        adj[a].add(b)
        adj[b].add(a)
    for r in got.sample(60, random_state=0).itertuples():
        nbrs = sorted(adj[r.canon])
        tri = sum(
            1
            for i, x in enumerate(nbrs)
            for y in nbrs[i + 1:]
            if y in adj[x]
        )
        assert r.n_tri == tri
        assert r.n_wedges == len(nbrs) * (len(nbrs) - 1) // 2
    # every triangle credits exactly three corners
    assert got["n_tri"].sum() % 3 == 0


def test_bloom_antijoin_exact_and_prefilter_works(ray_session):
    from codepropertygraph_ray.functions.sketch import (
        bloom_might_contain, bloom_partial, customers_without_events,
    )

    got = customers_without_events(SF_DIR).to_pandas()
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    have = set(ev["user_id"])
    ref = set(cust.loc[~cust["c_custkey"].isin(have), "c_custkey"])
    assert set(got["c_custkey"]) == ref  # exact despite the Bloom
    # the filter itself: no false negatives, bounded false positives
    bits = np.unpackbits(np.frombuffer(
        bloom_partial(ev["user_id"].to_numpy(np.int64)), dtype=np.uint8
    )).astype(bool)
    keys = cust["c_custkey"].to_numpy(np.int64)
    maybe = bloom_might_contain(bits, keys)
    assert all(maybe[i] for i, k in enumerate(keys) if k in have)
    fp = sum(1 for i, k in enumerate(keys) if maybe[i] and k not in have)
    assert fp <= max(5, len(keys) * 0.01)


def test_q3_matches_pandas_reference(ray_session):
    from codepropertygraph_ray.functions.relational import (
        Q3_CUTOFF, Q3_SEGMENT, q3_unshipped,
    )

    got = q3_unshipped(SF_DIR).to_pandas()
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cut = pd.Timestamp(Q3_CUTOFF)
    seg = cust.loc[cust["c_mktsegment"] == Q3_SEGMENT, "c_custkey"]
    of = orders[(orders["o_orderdate"] < cut) & orders["o_custkey"].isin(seg)]
    lf = li[li["l_shipdate"] > cut].copy()
    lf["rev_u"] = np.floor(
        np.abs(lf["l_extendedprice"] * (1 - lf["l_discount"])) * 100 + 0.5
    ).astype("int64")
    m = lf.merge(of, left_on="l_orderkey", right_on="o_orderkey")
    g = m.groupby(["l_orderkey", "o_orderdate"], as_index=False)["rev_u"].sum()
    g = g.sort_values(["rev_u", "o_orderdate", "l_orderkey"],
                      ascending=[False, True, True]).head(10)
    assert list(got["l_orderkey"]) == list(g["l_orderkey"])
    assert np.allclose(got["revenue"], g["rev_u"] / 100.0)


def test_cumulative_users_matches_first_seen(ray_session):
    from codepropertygraph_ray.functions.relational import cumulative_new_users

    got = cumulative_new_users(SF_DIR)
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    first = ev.assign(
        h=ev["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
    ).groupby("user_id")["h"].min()
    ref = first.value_counts().sort_index()
    assert list(got["hour_epoch"]) == list(ref.index)
    assert list(got["new_users"]) == list(ref.values)
    assert list(got["cum_users"]) == list(ref.cumsum().values)
    assert got["cum_users"].iloc[-1] == ev["user_id"].nunique()


def test_kcore_matches_bruteforce_peel(ray_session, cooc_edges):
    from codepropertygraph_ray.pipelines.analytics import KCORE_K, kcore

    got = kcore(SF_DIR)
    cur = set(cooc_edges["a"]) | set(cooc_edges["b"])
    for _ in range(50):  # peel to the true fixed point
        deg: dict = defaultdict(int)
        for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
            if a in cur and b in cur:
                deg[a] += 1
                deg[b] += 1
        new = {n for n, d in deg.items() if d >= KCORE_K}
        if new == cur:
            break
        cur = new
    assert set(got["canon"]) == cur
    assert dict(zip(got["canon"], got["core_deg"])) == {
        n: d for n, d in deg.items() if n in cur
    }
    assert (got["core_deg"] >= KCORE_K).all()  # converged → true k-core


def test_histogram_matches_numpy(ray_session):
    from codepropertygraph_ray.functions.relational import (
        HIST_BINS, histogram_prices,
    )

    got = histogram_prices(SF_DIR).to_pandas().sort_values(
        "bucket", ignore_index=True
    )
    v = pd.read_parquet(f"{SF_DIR}/orders.parquet")["o_totalprice"].to_numpy()
    mn, mx = v.min(), v.max()
    b = np.minimum(
        np.floor((v - mn) * float(HIST_BINS) / (mx - mn)).astype(int),
        HIST_BINS - 1,
    )
    ref = pd.Series(b).value_counts().sort_index()
    assert list(got["bucket"]) == list(ref.index)
    assert list(got["n"]) == list(ref.values)
    assert got["n"].sum() == len(v)


def test_ntile_matches_sql_semantics(ray_session):
    from codepropertygraph_ray.functions.relational import NTILE_N, ntile_orders

    got = ntile_orders(SF_DIR).to_pandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet").sort_values(
        ["o_orderpriority", "o_totalprice", "o_orderkey"], ignore_index=True
    )
    # reference NTILE: first (cnt % n) tiles get one extra row
    tiles = {}
    for _, grp in o.groupby("o_orderpriority", sort=False):
        cnt = len(grp)
        base, rem = divmod(cnt, NTILE_N)
        sizes = [base + (1 if i < rem else 0) for i in range(NTILE_N)]
        lab = np.repeat(np.arange(1, NTILE_N + 1), sizes)
        tiles.update(dict(zip(grp["o_orderkey"], lab)))
    assert dict(zip(got["o_orderkey"], got["tile"])) == tiles


def test_corr_matches_numpy(ray_session):
    from codepropertygraph_ray.functions.relational import corr_qty_price

    got = corr_qty_price(SF_DIR).to_pandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        x = np.floor(grp["l_quantity"].to_numpy(np.float64))
        y = np.floor(grp["l_extendedprice"].to_numpy(np.float64))
        ref = np.corrcoef(x, y)[0, 1]
        mine = float(got.loc[got["l_returnflag"] == flag, "corr_qp"].iloc[0])
        assert abs(mine - ref) < 1e-9
    assert got["corr_qp"].abs().max() <= 1.0


def test_embedding_keep_list_matches_components(ray_session):
    from codepropertygraph_ray.functions.similarity import (
        dedup_keep_embeddings, dup_groups,
    )

    got = dedup_keep_embeddings(SF_DIR).to_pandas()
    cm = dup_groups(SF_DIR)
    drop = set(cm.loc[cm["vec_id"] != cm["group_id"], "vec_id"])
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id"])
    assert len(got) == len(emb)
    assert set(got.loc[~got["keep"], "vec_id"]) == drop
    # exactly one representative survives per component
    kept = set(got.loc[got["keep"], "vec_id"])
    for gid, grp in cm.groupby("group_id"):
        assert len(set(grp["vec_id"]) & kept) == 1


def test_char_entropy_matches_counter(ray_session):
    import math
    from collections import Counter

    from codepropertygraph_ray.functions.text import ENTROPY_UNIT, char_entropy

    got = char_entropy(SF_DIR).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ref = {}
    for r in docs.sample(50, random_state=0).itertuples():
        c = Counter(r.text or "")
        units = sum(
            n * int(np.sign(v := math.log(n) * 10**ENTROPY_UNIT)
                    * math.floor(abs(v) + 0.5))
            for n in c.values()
        )
        ref[r.doc_id] = (sum(c.values()), units)
    sub = got.set_index("doc_id")
    for did, (n_chars, units) in ref.items():
        assert sub.loc[did, "n_chars"] == n_chars
        assert sub.loc[did, "ent_units"] == units
    # recovered entropy is a sane Shannon value
    nz = got[got["n_chars"] > 0]
    h = (np.log(nz["n_chars"]) - nz["ent_units"] / 10**ENTROPY_UNIT / nz["n_chars"])
    assert (h >= -1e-9).all() and (h < np.log(1114112)).all()


def test_division_matches_set_containment(ray_session):
    from codepropertygraph_ray.functions.relational import users_all_event_types

    got = users_all_event_types(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"])
    all_types = set(ev["event_type"])
    per_user = ev.groupby("user_id")["event_type"].agg(set)
    ref = {u for u, s in per_user.items() if s == all_types}
    assert set(got["user_id"]) == ref
    assert (got["n_types"] == len(all_types)).all()
    assert len(ref) > 0  # fixture has full-coverage users


def test_weighted_sample_matches_aes_reference(ray_session):
    import math

    from codepropertygraph_ray.functions.relational import (
        SAMPLE_MOD, SAMPLE_MULT, WSAMPLE_K, sample_orders_weighted,
    )

    got = sample_orders_weighted(SF_DIR).to_pandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    u = ((o["o_orderkey"].to_numpy(np.int64) * SAMPLE_MULT) % SAMPLE_MOD
         + 1.0) / float(SAMPLE_MOD + 1)
    lu = np.array([math.copysign(math.floor(abs(math.log(x) * 1e6) + 0.5), -1)
                   for x in u])
    key = lu / o["o_totalprice"].to_numpy(np.float64)
    ref = o.assign(skey=key).sort_values(
        ["skey", "o_orderkey"], ascending=[False, True]
    ).head(WSAMPLE_K)
    assert list(got["o_orderkey"]) == list(ref["o_orderkey"])
    assert len(got) == WSAMPLE_K
    # weight-proportionality sanity: the sample skews rich (top-k by
    # u^(1/w) favors high w) — sample mean weight above population mean
    assert got["o_totalprice"].mean() > o["o_totalprice"].mean()


def test_compact_matches_linear_scan(ray_session):
    from codepropertygraph_ray.functions.relational import distinct_until_changed

    got = distinct_until_changed(SF_DIR).to_pandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True
    )
    keep = (ev["user_id"] != ev["user_id"].shift()) | (
        ev["event_type"] != ev["event_type"].shift()
    )
    ref = ev[keep]
    assert set(got["event_id"]) == set(ref["event_id"])
    assert len(got) < len(ev)  # the fixture has consecutive repeats


def test_assortativity_matches_numpy(ray_session, cooc_edges):
    from codepropertygraph_ray.pipelines.analytics import assortativity

    got = float(assortativity(SF_DIR)["assort"].iloc[0])
    deg = pd.concat([cooc_edges["a"], cooc_edges["b"]],
                    ignore_index=True).value_counts()
    da = cooc_edges["a"].map(deg).to_numpy(float)
    db = cooc_edges["b"].map(deg).to_numpy(float)
    x = np.concatenate([da, db])
    y = np.concatenate([db, da])
    ref = np.corrcoef(x, y)[0, 1]
    assert abs(got - ref) < 1e-9
    assert -1.0 <= got <= 1.0


def test_scc_capped_matches_bruteforce(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import SCC_DEPTH, scc_capped

    got = scc_capped(SF_DIR)
    tri = kg_run.ctx.read_logical("triples", columns=["subj", "obj"]).to_pandas()
    e = set(zip(tri["subj"], tri["obj"]))
    # brute-force capped closure
    adj = defaultdict(set)
    for u, v in e:
        adj[u].add(v)
    def reach_raw(s):
        seen, frontier = set(), {s}
        for _ in range(SCC_DEPTH):
            frontier = set().union(*(adj[x] for x in frontier)) if frontier else set()
            seen |= frontier
        return seen
    nodes = set(tri["subj"]) | set(tri["obj"])
    fwd = {n: reach_raw(n) for n in nodes}
    ref = {}
    for n in nodes:
        mutual = {m for m in fwd[n] if n in fwd[m]}
        ref[n] = min(mutual | {n})
    assert dict(zip(got["node"], got["scc_id"])) == ref
    # at least one non-trivial directed cycle collapses on this corpus
    assert any(v != k for k, v in ref.items())


def test_bigram_logprob_matches_bruteforce(ray_session):
    import math
    from collections import Counter

    from codepropertygraph_ray.functions.text import (
        LOGPROB_UNIT, bigram_logprob,
    )

    got = bigram_logprob(SF_DIR).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs_per_doc = {
        r.doc_id: list(zip(r.text.split(" "), r.text.split(" ")[1:]))
        for r in docs.itertuples()
    }
    c = Counter(p for ps in pairs_per_doc.values() for p in ps)
    c1 = Counter()
    for (w1, _), n in c.items():
        c1[w1] += n
    v = len({w2 for (_, w2) in c})

    def unit(p):
        x = math.log((c[p] + 1.0) / (c1[p[0]] + v)) * 10**LOGPROB_UNIT
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    for did, ps in list(pairs_per_doc.items())[:80]:
        assert got.loc[did, "n_bigrams"] == len(ps)
        assert got.loc[did, "logprob_units"] == sum(unit(p) for p in ps)


def test_widest_path_matches_bruteforce(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import (
        WIDEST_DEPTH, WIDEST_INF, entity_cooccurrence, widest_path,
    )

    got = widest_path(SF_DIR)
    e = entity_cooccurrence(SF_DIR).to_pandas()
    seed = min(e["canon_a"].min(), e["canon_b"].min())
    width = {seed: WIDEST_INF}
    und = list(zip(e["canon_a"], e["canon_b"], e["n_turns"])) + list(
        zip(e["canon_b"], e["canon_a"], e["n_turns"])
    )
    for _ in range(WIDEST_DEPTH):
        new = dict(width)
        for u, v, n in und:
            if u in width:
                c = min(width[u], int(n))
                if new.get(v, -1) < c:
                    new[v] = c
        width = new
    assert dict(zip(got["canon"], got["width"])) == width
    assert int(got.loc[got["canon"] == seed, "width"].iloc[0]) == WIDEST_INF
    nonseed = got[got["canon"] != seed]
    assert len(nonseed) > 0 and (nonseed["width"] >= 1).all()


def test_adamic_adar_matches_bruteforce(ray_session, cooc_edges):
    import math

    from codepropertygraph_ray.pipelines.analytics import AA_UNIT, adamic_adar

    got = adamic_adar(SF_DIR).to_pandas()
    adj: dict = defaultdict(set)
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        adj[a].add(b)
        adj[b].add(a)

    def unit(z):
        x = 10.0 ** AA_UNIT / math.log(len(adj[z]))
        return int(math.floor(x + 0.5))

    ref = {}
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        common = adj[a] & adj[b]
        if common:
            ref[(a, b)] = sum(unit(z) for z in common)
    assert dict(zip(zip(got["canon_a"], got["canon_b"]), got["aa_units"])) == ref
    assert len(ref) > 0


def test_interval_coverage_matches_merge_scan(ray_session):
    from codepropertygraph_ray.functions.relational import (
        IC_WINDOW_US, interval_coverage,
    )

    got = interval_coverage(SF_DIR).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    ev["s"] = ev["ts"].astype("datetime64[us]").astype("int64")
    for uid, g in ev.groupby("user_id"):
        ivs = sorted((s, s + IC_WINDOW_US) for s in g["s"])
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = sum(e - s for s, e in merged)
        assert got.loc[uid, "covered_us"] == covered
        assert got.loc[uid, "n_islands"] == len(merged)
    # the window actually merges: fewer islands than events for someone
    n_ev = ev.groupby("user_id").size()
    assert (got["n_islands"] < n_ev.reindex(got.index)).any()


def test_conv_jaccard_matches_loop(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import (
        CONV_JAC_DEN,
        CONV_JAC_DF_CAP,
        CONV_JAC_NUM,
        _canon_mention_turns,
        conv_jaccard,
    )

    cs = (
        _canon_mention_turns(SF_DIR).to_pandas()[["conv_id", "canon"]]
        .drop_duplicates()
    )
    df = cs.groupby("canon")["conv_id"].size()
    kept = cs[cs["canon"].map(df) <= CONV_JAC_DF_CAP]
    sets = kept.groupby("conv_id")["canon"].agg(set)
    convs = sorted(sets.index)
    ref = {}
    for i, a in enumerate(convs):
        for b in convs[i + 1:]:
            nc = len(sets[a] & sets[b])
            nu = len(sets[a] | sets[b])
            if nc and nc * CONV_JAC_DEN >= CONV_JAC_NUM * nu:
                ref[(a, b)] = (nc, nu)
    got = conv_jaccard(SF_DIR).to_pandas()
    assert (got["conv_a"] < got["conv_b"]).all()
    assert not got.duplicated(["conv_a", "conv_b"]).any()
    got_map = {
        (r.conv_a, r.conv_b): (int(r.n_common), int(r.n_union))
        for r in got.itertuples()
    }
    assert got_map == ref
    assert len(ref) > 0  # the corpus plants near-dup conversations


def test_communities_matches_loop(ray_session, cooc_edges):
    from collections import Counter

    from codepropertygraph_ray.pipelines.analytics import LPA_ITERS, communities

    adj: dict = defaultdict(set)
    for a, b in zip(cooc_edges["a"], cooc_edges["b"]):
        adj[a].add(b)
        adj[b].add(a)
    lab = {v: v for v in adj}
    for _ in range(LPA_ITERS):
        new = {}
        for v, nbrs in adj.items():
            cnt = Counter(lab[u] for u in nbrs)
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        lab = new
    got = communities(SF_DIR)
    assert dict(zip(got["canon"], got["community"])) == lab
    # sanity: propagation actually merges — some community has >1 member
    assert got["community"].duplicated().any()


def test_conv_groups_matches_loop(ray_session, kg_run):
    from codepropertygraph_ray.pipelines.analytics import conv_groups, conv_jaccard

    pairs = conv_jaccard(SF_DIR).to_pandas()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["conv_a"], pairs["conv_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    got = conv_groups(SF_DIR).to_pandas()
    assert not got["conv_id"].duplicated().any()
    for cid, grp in zip(got["conv_id"], got["grp"]):
        assert grp == find(cid)
    # sanity: some group actually collapses >1 conversation
    assert got["grp"].duplicated().any()
