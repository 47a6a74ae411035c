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
