"""End-to-end KG pipeline vs the pure-Python oracle.

The rebuild analog of the reference's fixture-driven operator tests
("code → CPG → assert graph shape", CodeToCpgSuite.scala:14-49) plus the
P/R ≥ 0.95 gate of BASELINE.json — we assert exact equality, which is
stronger.
"""

from __future__ import annotations

import pyarrow.dataset as pads


def _delta(runner, pass_name, table):
    return pads.dataset(runner.ctx.delta_dir(pass_name, table)).to_table()


def test_extraction_matches_oracle(kg_run, oracle_result):
    rec = _delta(kg_run, "base", "records").to_pandas()
    got_mentions = {
        (r.conv_id, int(r.turn_idx), int(r.ordinal), r.surface, r.key)
        for r in rec[rec["kind"] == "mention"].itertuples()
    }
    want_mentions = set(map(tuple, oracle_result.mentions))
    assert got_mentions == want_mentions

    got_facts = sorted(
        (r.conv_id, int(r.turn_idx), r.key, r.pred, r.obj_key)
        for r in rec[rec["kind"] == "fact"].itertuples()
    )
    want_facts = sorted(oracle_result.raw_facts)
    assert got_facts == want_facts


def test_canonical_map_matches_oracle(kg_run, oracle_result):
    cmap = _delta(kg_run, "entities", "canon_map").to_pandas()
    got = dict(zip(cmap["node"], cmap["component"]))
    # oracle canonical covers every mention key; the pipeline map only
    # covers alias-edge endpoints (others canonicalize to themselves)
    for k, v in oracle_result.canonical.items():
        assert got.get(k, k) == v, f"key {k}: got {got.get(k, k)} want {v}"


def test_triples_match_oracle_exactly(kg_run, oracle_result):
    t = _delta(kg_run, "link", "triples").to_pandas()
    got = set(zip(t["subj"], t["pred"], t["obj"]))
    assert got == oracle_result.triples  # P == R == 1.0 ≥ 0.95 gate


def test_triples_lineage_is_earliest_turn(kg_run, oracle_result):
    t = _delta(kg_run, "link", "triples").to_pandas()
    # recompute earliest stating turn from oracle raw facts
    first: dict = {}
    for conv, ti, sk, p, ok in sorted(oracle_result.raw_facts, key=lambda r: (r[0], r[1])):
        cs = oracle_result.canonical.get(sk, sk)
        co = oracle_result.canonical.get(ok, ok)
        if p != "alias_of":
            first.setdefault((cs, p, co), (conv, ti))
    for r in t.itertuples():
        assert first[(r.subj, r.pred, r.obj)] == (r.conv_id, int(r.turn_idx))


def test_entity_nodes_and_external_flags(kg_run, oracle_result):
    nodes = _delta(kg_run, "materialize", "nodes").to_pandas()
    ents = nodes[nodes["label"] == "ENTITY"]
    got = dict(zip(ents["full_name"], ents["is_external"]))
    assert got == oracle_result.entities


def test_node_edge_counts(kg_run, oracle_result):
    nodes = _delta(kg_run, "materialize", "nodes").to_pandas()
    edges = _delta(kg_run, "materialize", "edges").to_pandas()
    by_label = nodes["label"].value_counts().to_dict()
    assert by_label["META_DATA"] == 1  # exactly one, base.json:67-74 analog
    assert by_label["MENTION"] == len(oracle_result.mentions)
    assert by_label["ENTITY"] == len(oracle_result.entities)
    n_turns = len({(m[0], m[1]) for m in oracle_result.mentions})
    assert by_label["TURN"] >= n_turns  # every mentioning turn exists
    # every mention has exactly one REF edge
    assert (edges["label"] == "REF").sum() == len(oracle_result.mentions)
    # AST edges: conv→turn (one per turn) + turn→mention (one per mention)
    assert (edges["label"] == "AST").sum() == by_label["TURN"] + by_label["MENTION"]
    # NEXT_TURN edges: turns - conversations (linear chains)
    assert (edges["label"] == "NEXT_TURN").sum() == by_label["TURN"] - by_label["CONVERSATION"]


def test_validator_zero_violations(kg_run):
    import os

    vdir = kg_run.ctx.delta_dir("validate", "violations")
    files = [f for f in os.listdir(vdir) if f.endswith(".parquet")]
    if files:
        v = pads.dataset(vdir).to_table()
        assert v.num_rows == 0, v.to_pydict()


def test_ledger_metrics_and_resume(kg_run):
    led = kg_run.ledger()
    core = [p.name for p in kg_run.passes]
    # extra passes (e.g. tag write-backs from other tests) may follow, but
    # the core list must be applied completely and in order
    assert [n for n in led["applied"] if n in set(core)] == core
    for name in led["applied"]:
        m = led["metrics"][name]
        assert m["wall_sec"] > 0
        assert "tables" in m  # per-table per-file row counts = lineage
    # resume: re-running is a no-op (skip-if-applied, LayerCreator semantics)
    import time

    t0 = time.perf_counter()
    kg_run.run()
    assert time.perf_counter() - t0 < 2.0  # no pass re-executed


def test_jsonl_source_equals_parquet_source(ray_session, tmp_path):
    """An NDJSON transcripts corpus (the S9 payload-reader analog —
    `FuzzyC2Cpg.scala:1701-1712` ingests JSON) must build the identical
    KG as the same rows delivered as parquet."""
    import json

    import pandas as pd
    import pyarrow.dataset as pads

    from codepropertygraph_ray.pipelines.kg import build_kg

    rows = [
        {"conv_id": "c-1", "turn_idx": 0, "role": "user",
         "text": "note @[B] <alias_of> @[A] .", "tool": "",
         "ts": "2024-01-01T00:00:00"},
        {"conv_id": "c-1", "turn_idx": 1, "role": "assistant",
         "text": "fyi @[A] <uses> @[D] .", "tool": "",
         "ts": "2024-01-01T00:01:00"},
        {"conv_id": "c-2", "turn_idx": 0, "role": "tool",
         "text": "ran @[Q] <located_in> @[D] .", "tool": "search",
         "ts": "2024-01-01T01:00:00"},
    ]

    jdir = tmp_path / "jsonl_sf" / "transcripts"
    jdir.mkdir(parents=True)
    with open(jdir / "part-0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    pdir = tmp_path / "parq_sf" / "transcripts"
    pdir.mkdir(parents=True)
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df.to_parquet(pdir / "part-0.parquet")

    rj = build_kg(str(tmp_path / "jsonl_sf"), str(tmp_path / "jsonl_out"))
    rp = build_kg(str(tmp_path / "parq_sf"), str(tmp_path / "parq_out"))

    def table_set(r, table, cols):
        t = pads.dataset(r.ctx.delta_dir("link", table)).to_table(columns=cols)
        return set(map(tuple, t.to_pandas().values))

    cols = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    got = table_set(rj, "triples", cols)
    assert got == table_set(rp, "triples", cols) and got

    # CSV delivery of the same rows must also build the identical KG
    # (the third source format; shares the cast + cache machinery)
    cdir = tmp_path / "csv_sf" / "transcripts"
    cdir.mkdir(parents=True)
    pd.DataFrame(rows).to_csv(cdir / "part-0.csv", index=False)
    rc = build_kg(str(tmp_path / "csv_sf"), str(tmp_path / "csv_out"))
    assert table_set(rc, "triples", cols) == got
    for r in (rj, rp):
        nodes = pads.dataset(r.ctx.delta_dir("materialize", "nodes")).to_table(
            columns=["id"]
        )
        assert nodes.num_rows > 0
    a = pads.dataset(rj.ctx.delta_dir("materialize", "nodes")).to_table(columns=["id"])
    b = pads.dataset(rp.ctx.delta_dir("materialize", "nodes")).to_table(columns=["id"])
    assert set(a.column("id").to_pylist()) == set(b.column("id").to_pylist())
