"""Incremental corpus ingest (additive DiffGraph semantics).

Hand-written micro-corpora make the canon topology explicit: the additive
increment must equal a full rebuild over the union; the re-canonicalizing
increment must be rejected."""

from __future__ import annotations

import os

import pandas as pd
import pytest


def _transcripts(rows) -> pd.DataFrame:
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    df["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(df["turn_idx"], unit="m")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


BASE_ROWS = [
    ("c-base-1", 0, "user", "note @[B] <alias_of> @[A] .", ""),
    ("c-base-1", 1, "assistant", "fyi @[A] <uses> @[D] .", ""),
    ("c-base-2", 0, "user", "hello @[D] and @[Q] .", ""),
    ("c-base-2", 1, "tool", "ran @[Q] <located_in> @[D] .", "search"),
    ("c-base-3", 0, "user", "just mentioning @[X] here .", ""),  # external
]

# additive: new conversations, new keys; E aliases INTO the existing A
# component (allowed — existing canons unchanged)
INC_ROWS = [
    ("c-inc-1", 0, "user", "note @[E] <alias_of> @[A] .", ""),
    ("c-inc-1", 1, "assistant", "fyi @[E] <uses> @[F] .", ""),
    ("c-inc-2", 0, "user", "hi @[G] <located_in> @[D] .", ""),
]

# violating: aliases two EXISTING components (D would re-root under A)
MERGE_ROWS = [
    ("c-bad-1", 0, "user", "note @[D] <alias_of> @[A] .", ""),
]


def _write(tmp_path, name, rows) -> str:
    d = tmp_path / name
    d.mkdir()
    _transcripts(rows).to_parquet(d / "part-0.parquet")
    return str(d)


def _build(tmp_path, name, rows):
    """Full KG build over a transcripts dir via the pass framework (the
    corpus generator is bypassed: read_transcripts resolves an explicit
    'transcripts' subdir when present)."""
    from codepropertygraph_ray.pipelines.kg import build_kg

    sf = tmp_path / name
    sf.mkdir()
    tdir = sf / "transcripts"
    tdir.mkdir()
    _transcripts(rows).to_parquet(tdir / "part-0.parquet")
    out = str(tmp_path / f"{name}_out")
    return build_kg(str(sf), out)


def _triples_set(runner):
    t = runner.ctx.read_table("link", "triples",
                              columns=["subj", "pred", "obj"]).to_pandas()
    return set(map(tuple, t.values))


def _union_graph(runner):
    from codepropertygraph_ray.traversal import GraphView

    return GraphView.from_runner(runner)


def test_incremental_equals_full_rebuild(ray_session, tmp_path):
    from codepropertygraph_ray.pipelines.incremental import ingest_increment

    base = _build(tmp_path, "base", BASE_ROWS)
    inc_path = _write(tmp_path, "inc_parquet", INC_ROWS)
    ingest_increment(base, inc_path, "day1")

    # triples: base ∪ increment == full rebuild over the union corpus
    inc_tri = base.ctx.read_table("inc_day1", "triples",
                                  columns=["subj", "pred", "obj"]).to_pandas()
    got = _triples_set(base) | set(map(tuple, inc_tri.values))
    full = _build(tmp_path, "full", BASE_ROWS + INC_ROWS)
    assert got == _triples_set(full)

    # the UNION graph (GraphView composes overlay dirs) matches the full
    # rebuild node-for-node on every label
    g_inc = _union_graph(base)
    g_full = _union_graph(full)
    for label in ("CONVERSATION", "TURN", "MENTION", "ENTITY"):
        a = set(g_inc.label(label).to_pandas()["id"])
        b = set(g_full.label(label).to_pandas()["id"])
        assert a == b, label

    # the union graph passes full schema validation (in/out-degree, CFG,
    # entity-REF conditional included)
    from codepropertygraph_ray.stages.validate import validate_graph

    viols = validate_graph(g_inc._nodes(), g_inc._edges()).to_pandas()
    assert len(viols) == 0, viols.to_dict()

    # idempotent: same name re-runs are ledger-skipped
    ingest_increment(base, inc_path, "day1")
    assert [p for p in base.ledger()["applied"] if p == "inc_day1"] == ["inc_day1"]


# second increment DEPENDS on the first: H is a NEW key aliasing into E
# (added by inc1, canon a) — without inc1's pairs in the union this would
# root {h,e} at e and silently re-canonicalize e; one fact restates an
# inc1 fact (must anti-join against inc1, not just the base), and X
# (external in the base) gains fact participation (is_external flip)
INC2_ROWS = [
    ("c-inc-3", 0, "user", "note @[H] <alias_of> @[E] .", ""),
    ("c-inc-3", 1, "assistant", "again @[E] <uses> @[F] .", ""),
    ("c-inc-4", 0, "user", "also @[X] <uses> @[D] .", ""),
]


def _edges_set(view):
    e = view._edges(columns=["src", "dst", "label"]).to_pandas()
    return set(zip(e["src"], e["dst"], e["label"]))


def test_two_increments_equal_full_rebuild(ray_session, tmp_path):
    """Increment 2 sees increment 1's keys/aliases/triples/nodes (the
    multi-increment 'old state' union), and the merged graph matches a
    full rebuild on nodes AND edges — dominator/CDG overlays included."""
    from codepropertygraph_ray.pipelines import queries as q
    from codepropertygraph_ray.pipelines.incremental import ingest_increment

    base = _build(tmp_path, "mbase", BASE_ROWS)
    ingest_increment(base, _write(tmp_path, "minc1", INC_ROWS), "day1")
    ingest_increment(base, _write(tmp_path, "minc2", INC2_ROWS), "day2")
    full = _build(tmp_path, "mfull", BASE_ROWS + INC_ROWS + INC2_ROWS)

    # triples: logical union == full rebuild (duplicate restated fact
    # anti-joined against increment 1, not just the base)
    got = base.ctx.read_logical_table(
        "triples", columns=["subj", "pred", "obj"]
    ).to_pandas()
    assert set(map(tuple, got.values)) == _triples_set(full)
    assert len(got) == len(got.drop_duplicates())  # no dup rows across overlays

    # H (inc2) aliases through E (inc1) to the BASE root 'a'
    cm = base.ctx.read_logical_table("canon_map").to_pandas()
    canon = dict(zip(cm["node"], cm["component"]))
    assert canon["h"] == canon["e"] == "a"

    g_inc, g_full = _union_graph(base), _union_graph(full)
    for label in ("CONVERSATION", "TURN", "MENTION", "ENTITY", "SPEAKER", "TOOL"):
        a = set(g_inc.label(label).to_pandas()["id"])
        b = set(g_full.label(label).to_pandas()["id"])
        assert a == b, label
    # EDGES too — the increment must emit the DOMINATE/POST_DOMINATE/CDG
    # overlay a full rebuild produces, not just AST/NEXT_TURN
    assert _edges_set(g_inc) == _edges_set(g_full)

    # validator over the union graph (with union dims) — zero violations
    from codepropertygraph_ray.stages.validate import validate_graph

    viols = validate_graph(g_inc._nodes(), g_inc._edges()).to_pandas()
    assert len(viols) == 0, viols.to_dict()

    # re-ingesting an increment-1 conversation under a NEW name is rejected
    from codepropertygraph_ray.pipelines.incremental import IncrementalMergeError

    with pytest.raises(IncrementalMergeError, match="existing conversations"):
        ingest_increment(base, _write(tmp_path, "mdup", INC_ROWS[:2]), "dup2")

    # aliasing an EXISTING key (f carries inc1 mention + triple lineage)
    # into a component is NOT additive — its canon is frozen, so the guard
    # must raise (the ADVICE r3 chain scenario, loud instead of silent)
    with pytest.raises(IncrementalMergeError, match="re-canonicalize"):
        ingest_increment(base, _write(tmp_path, "mbad2", [
            ("c-bad-2", 0, "user", "note @[F] <alias_of> @[E] .", ""),
        ]), "bad2")

    # query surface over the union == over the full rebuild:
    # entity_stats applies the increment's is_external flip for X and
    # re-aggregates mention counts over the logical union
    import codepropertygraph_ray.pipelines.queries as qq

    def fake_runner(sf_dir, _cache={}):
        return base if "union" in sf_dir else full

    old = qq.kg_runner
    qq.kg_runner = fake_runner
    try:
        es_u = qq.entity_stats("union").reset_index(drop=True)
        es_f = qq.entity_stats("full").reset_index(drop=True)
        pd.testing.assert_frame_equal(es_u, es_f)
        assert not es_u.loc[es_u["canon"] == "x", "is_external"].iloc[0]
        ek_u = qq.entity_keys("union").to_pandas().sort_values(
            "key", ignore_index=True)
        ek_f = qq.entity_keys("full").to_pandas().sort_values(
            "key", ignore_index=True)
        pd.testing.assert_frame_equal(ek_u, ek_f)
    finally:
        qq.kg_runner = old


def test_increment_never_driver_materializes_corpus_tables(
    ray_session, tmp_path, monkeypatch
):
    """The old-triple anti-join, the dup-conversation guard AND the
    frozen-canon chain must stay distributed: neither a corpus-scale table
    nor the vocab-scale entity_keys (which grows with the corpus) may be
    driver-materialized during ingest (VERDICT r3 item 1 + r4 item 2 —
    alias pairs are collected via a pruned distributed scan and the key
    universe is only probed with broadcast candidates)."""
    from codepropertygraph_ray.pipelines.incremental import ingest_increment
    from codepropertygraph_ray.pipelines.passes import PassContext

    base = _build(tmp_path, "nbase", BASE_ROWS)

    CORPUS = {"triples", "records", "nodes", "edges", "reaching", "ndim",
              "tprops", "entity_keys"}
    real_rt = PassContext.read_table
    real_rlt = PassContext.read_logical_table

    def guard_rt(self, pass_name, table, columns=None):
        assert table not in CORPUS, f"driver-materialized corpus table {table}"
        return real_rt(self, pass_name, table, columns=columns)

    def guard_rlt(self, logical, columns=None):
        assert logical not in CORPUS, f"driver-materialized corpus table {logical}"
        return real_rlt(self, logical, columns=columns)

    monkeypatch.setattr(PassContext, "read_table", guard_rt)
    monkeypatch.setattr(PassContext, "read_logical_table", guard_rlt)
    ingest_increment(base, _write(tmp_path, "ninc", INC_ROWS), "day1")
    monkeypatch.undo()  # the assertion read below is test code, not ingest
    inc_tri = base.ctx.read_table("inc_day1", "triples",
                                  columns=["subj", "pred", "obj"]).to_pandas()
    assert len(inc_tri) > 0


def test_incremental_rejects_recanonicalization(ray_session, tmp_path):
    from codepropertygraph_ray.pipelines.incremental import (
        IncrementalMergeError, ingest_increment,
    )

    base = _build(tmp_path, "base2", BASE_ROWS)
    bad = _write(tmp_path, "bad_parquet", MERGE_ROWS)
    with pytest.raises(IncrementalMergeError, match="re-canonicalize"):
        ingest_increment(base, bad, "bad")


def test_incremental_rejects_existing_conversations(ray_session, tmp_path):
    from codepropertygraph_ray.pipelines.incremental import (
        IncrementalMergeError, ingest_increment,
    )

    base = _build(tmp_path, "base3", BASE_ROWS)
    dup = _write(tmp_path, "dup_parquet", BASE_ROWS[:2])
    with pytest.raises(IncrementalMergeError, match="existing conversations"):
        ingest_increment(base, dup, "dup")
