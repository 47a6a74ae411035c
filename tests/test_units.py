"""Unit tests: ids, normalization, extractor, union-find, pass framework.

Analog of the reference's infra unit level (SURVEY.md §5.1:
KeyPoolTests / DiffGraphTest / CpgPassTests).
"""

from __future__ import annotations

import pandas as pd
import pytest

from codepropertygraph_ray import ids, oracle, schema
from codepropertygraph_ray.functions.cc import cc_local
from codepropertygraph_ray.stages.extract import TurnExtractor, normalize_series


def test_ids_deterministic_and_label_scoped():
    a = ids.node_ids("ENTITY", ["acme corp 1", "acme corp 2"])
    b = ids.node_ids("ENTITY", ["acme corp 1", "acme corp 2"])
    assert list(a) == list(b)  # StableOutputTests analog
    c = ids.node_ids("MENTION", ["acme corp 1"])
    assert c[0] != a[0]  # same key, different label → different id
    assert all(x > 0 for x in a)


def test_normalize_matches_oracle():
    cases = ["Acme Corp 7", "ACME--Corp...7", "  The ACME corp 7 Team ", "héllo wörld"]
    s = normalize_series(pd.Series(cases))
    for raw, got in zip(cases, s):
        assert got == oracle.normalize(raw)


def test_extractor_truth_table():
    """Exact expected rows for a hand-written turn — the
    CfgCreationPassTests truth-table analog (micro-fixture #1)."""
    ex = TurnExtractor()
    batch = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": [0, 1, 0],
            "text": [
                "hello @[Acme Corp 1] and @[Foo-Bar 2] .",
                "fyi @[Acme Corp 1] <works_at> @[Foo Bar 2] .",
                "",  # empty text turn (micro-fixture #7)
            ],
        }
    )
    out = ex(batch)
    mentions = out[out["kind"] == "mention"]
    assert list(mentions["surface"]) == ["Acme Corp 1", "Foo-Bar 2", "Acme Corp 1", "Foo Bar 2"]
    assert list(mentions["ordinal"]) == [0, 1, 0, 1]
    assert list(mentions["key"]) == ["acme corp 1", "foo bar 2", "acme corp 1", "foo bar 2"]
    facts = out[out["kind"] == "fact"]
    assert len(facts) == 1
    f = facts.iloc[0]
    assert (f["key"], f["pred"], f["obj_key"]) == ("acme corp 1", "works_at", "foo bar 2")


def test_extractor_unicode_and_null():
    ex = TurnExtractor()
    batch = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": [0, 1],
            "text": ["héllo @[Ünïcode Éntity 9] " + "x" * 10_000, None],
        }
    )
    out = ex(batch)
    # non-ascii chars act as separators; exact form defined by the oracle
    assert list(out["key"]) == [oracle.normalize("Ünïcode Éntity 9")]
    assert list(out["surface"]) == ["Ünïcode Éntity 9"]


def test_cc_local_components():
    pairs = pd.DataFrame({"a": ["b", "c", "x"], "b": ["a", "b", "y"]})
    out = cc_local(pairs)
    comp = dict(zip(out["node"], out["component"]))
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_union_find_oracle_alias_chain():
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "text": "note @[B] <alias_of> @[A] ."},
        {"conv_id": "c1", "turn_idx": 1, "text": "note @[C] <alias_of> @[B] ."},
        {"conv_id": "c2", "turn_idx": 0, "text": "fyi @[C] <uses> @[D] ."},
    ]
    res = oracle.run_oracle(rows)
    assert res.canonical == {"a": "a", "b": "a", "c": "a", "d": "d"}
    assert res.triples == {("a", "uses", "d")}
    assert res.entities == {"a": False, "d": False}


def test_pass_framework_resume_and_undo(tmp_path):
    import pyarrow as pa

    from codepropertygraph_ray.pipelines.passes import Pass, PipelineRunner

    calls = []

    def mk(name):
        def run(ctx):
            calls.append(name)
            return {"t": pa.table({"x": [1, 2]})}

        return Pass(name, run)

    passes = [mk("p0"), mk("p1")]
    r1 = PipelineRunner(passes, str(tmp_path), sf_dir="unused")
    r1.run()
    assert calls == ["p0", "p1"]
    # resume skips
    r2 = PipelineRunner(passes, str(tmp_path), sf_dir="unused")
    r2.run()
    assert calls == ["p0", "p1"]
    # the inverse diff is serialized as DATA at apply time
    # (DiffGraphProtoSerializer.scala:65-87 analog)
    import json as _json

    inv = _json.load(open(tmp_path / "01_p1" / "inverse.json"))
    assert inv == {"pass": "p1",
                   "inverse": [{"op": "remove_table", "table": "t", "rows": 2}]}
    # undo p1 → only p1 re-runs (inverse-overlay semantics)
    r2.undo_pass("p1")
    import pytest as _pytest

    with _pytest.raises(KeyError):  # stale registration purged
        r2.ctx.delta_dir("p1", "t")
    r3 = PipelineRunner(passes, str(tmp_path), sf_dir="unused")
    r3.run()
    assert calls == ["p0", "p1", "p1"]


def test_generator_is_deterministic():
    from codepropertygraph_ray.sources.transcripts import generate_conversation

    a = generate_conversation(3, 0.001)
    b = generate_conversation(3, 0.001)
    assert a == b
    assert all(r["conv_id"] == "conv-0000003" for r in a)
    assert [r["turn_idx"] for r in a] == list(range(len(a)))


def test_schema_facts_cover_pipeline_edges():
    srcs = {s for s, _, _ in schema.EDGE_FACTS}
    dsts = {d for _, _, d in schema.EDGE_FACTS}
    assert srcs | dsts <= set(schema.NODE_LABELS)
    assert {l for _, l, _ in schema.EDGE_FACTS} == set(schema.EDGE_LABELS)


def test_hash_agg_and_salted_agg_equal(ray_session):
    import ray.data

    from codepropertygraph_ray.functions.agg import hash_agg, salted_agg

    df = pd.DataFrame(
        {
            "k": ["hot"] * 500 + [f"k{i}" for i in range(100)],
            "v": list(range(500)) + [1] * 100,
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    a = (
        hash_agg(ds, "k", total=("v", "sum"), n=("v", "size"))
        .to_pandas().sort_values("k", ignore_index=True)
    )
    ds2 = ray.data.from_pandas(df).repartition(8)
    b = (
        salted_agg(ds2, "k", salt=4, total=("v", "sum"), n=("v", "size"))
        .to_pandas().sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert int(a.loc[a["k"] == "hot", "total"].iloc[0]) == sum(range(500))


def test_salted_agg_rejects_non_algebraic():
    from codepropertygraph_ray.functions.agg import salted_agg

    with pytest.raises(ValueError):
        salted_agg(None, "k", avg=("v", "mean"))


def test_cc_distributed_matches_local(ray_session):
    import ray.data

    from codepropertygraph_ray.functions.cc import canonical_map, cc_local

    pairs = pd.DataFrame(
        {
            "a": ["b", "c", "x", "q", "r", "s"],
            "b": ["a", "b", "y", "r", "s", "q"],  # chain, pair, 3-cycle
        }
    )
    local = cc_local(pairs)
    dist = canonical_map(pairs, distributed=True).sort_values(
        "node", ignore_index=True
    )
    pd.testing.assert_frame_equal(
        local, dist[["node", "component"]].reset_index(drop=True)
    )


def test_pass_framework_recovers_partial_output(tmp_path):
    """A pass dir without _SUCCESS (crashed mid-write) is wiped and the
    pass re-runs — the per-partition checkpoint/recovery semantics."""
    import os

    import pyarrow as pa

    from codepropertygraph_ray.pipelines.passes import Pass, PipelineRunner

    calls = []

    def run(ctx):
        calls.append(1)
        return {"t": pa.table({"x": [1]})}

    passes = [Pass("p0", run)]
    PipelineRunner(passes, str(tmp_path), sf_dir="u").run()
    assert calls == [1]
    # simulate crash: drop _SUCCESS, corrupt the table dir
    os.remove(tmp_path / "00_p0" / "_SUCCESS")
    (tmp_path / "00_p0" / "t" / "garbage.parquet").write_bytes(b"junk")
    led_path = tmp_path / "ledger.json"
    import json

    led = json.loads(led_path.read_text())
    led["applied"] = []  # ledger also lost the entry (crash before save)
    led_path.write_text(json.dumps(led))
    PipelineRunner(passes, str(tmp_path), sf_dir="u").run()
    assert calls == [1, 1]  # re-ran
    assert (tmp_path / "00_p0" / "_SUCCESS").exists()
    assert not (tmp_path / "00_p0" / "t" / "garbage.parquet").exists()


def test_grouped_arange():
    import numpy as np

    from codepropertygraph_ray.functions.text import _grouped_arange

    got = _grouped_arange(np.array([5, 20, 0]), np.array([3, 2, 4]))
    assert got.tolist() == [5, 6, 7, 20, 21, 0, 1, 2, 3]
    assert _grouped_arange(np.array([], dtype=np.int64),
                           np.array([], dtype=np.int64)).tolist() == []


def test_fingerprint_batch_matches_per_doc_reference():
    """The batch-vectorized winnowing body equals a straightforward per-doc
    implementation (window minima → distinct → xor-fold) on edge cases:
    empty text, sub-k-gram, sub-window, multibyte UTF-8, long docs."""
    import numpy as np

    from codepropertygraph_ray.functions.text import (
        FP_KGRAM, FP_WINDOW, POLY_B, POLY_P55, fingerprint_batch)

    def ref_one(text):
        # plain-Python-int polynomial hash over codepoints (the SQL-mirror
        # arithmetic) — the independent reference for the vectorized body
        cps = [ord(c) for c in text]
        if len(cps) < FP_KGRAM:
            h = 0
            for x in cps:
                h = (h * POLY_B + x) % POLY_P55
            sel = np.array([h], np.int64)
        else:
            khs = []
            for i in range(len(cps) - FP_KGRAM + 1):
                h = 0
                for x in cps[i:i + FP_KGRAM]:
                    h = (h * POLY_B + x) % POLY_P55
                khs.append(h)
            kh = np.array(khs, np.int64)
            if len(kh) >= FP_WINDOW:
                sel = np.unique(
                    np.lib.stride_tricks.sliding_window_view(kh, FP_WINDOW).min(axis=1))
            else:
                sel = np.unique(kh)
        folded = np.bitwise_xor.reduce(sel)
        return np.int64(folded), len(sel)

    rng = np.random.default_rng(0)
    texts = ["", "ab", "abcdefg", "abcdefgh", "abcdefghi",
             "hello world this is a longer document " * 5,
             "ünïcode tèxt with mültibyte chars " * 3]
    texts += ["".join(rng.choice(list("abcde "), int(rng.integers(0, 60))))
              for _ in range(30)]
    t = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = fingerprint_batch(t)
    for i, text in enumerate(texts):
        f, n = ref_one(text)
        assert got["fingerprint"][i] == f, (i, text)
        assert got["n_selected"][i] == n, (i, text)
    # shared long substrings ⇒ shared selected hashes ⇒ overlap in folds:
    # identical docs get identical fingerprints
    dup = fingerprint_batch(pd.DataFrame({"doc_id": [0, 1], "text": [texts[5], texts[5]]}))
    assert dup["fingerprint"][0] == dup["fingerprint"][1]


def test_sessionize_gap_breaks(ray_session, tmp_path):
    import os
    import pandas as pd

    from codepropertygraph_ray.functions.relational import sessionize_events

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 01:00",  # u1: gap>30m
         "2024-01-01 00:00"]                                          # u2
    )
    pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "ts": ts, "user_id": [1, 1, 1, 2],
         "event_type": ["a"] * 4, "value": [1.0, 2.0, 4.0, 8.0],
         "props": [""] * 4}
    ).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = sessionize_events(str(tmp_path)).to_pandas().sort_values(
        ["user_id", "session_idx"], ignore_index=True
    )
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["session_idx"].tolist() == [1, 2, 1]
    assert out["sum_value"].tolist() == [3.0, 4.0, 8.0]


def test_topk_per_customer_rank_and_tiebreak(ray_session, tmp_path):
    import os
    import pandas as pd

    from codepropertygraph_ray.functions.relational import topk_orders_per_customer

    pd.DataFrame(
        {"o_orderkey": [1, 2, 3, 4, 5], "o_custkey": [7, 7, 7, 7, 8],
         "o_orderstatus": ["O"] * 5, "o_totalprice": [50.0, 90.0, 90.0, 10.0, 5.0],
         "o_orderdate": pd.to_datetime(["2024-01-01"] * 5),
         "o_orderpriority": ["1-URGENT"] * 5}
    ).to_parquet(os.path.join(str(tmp_path), "orders.parquet"))
    out = topk_orders_per_customer(str(tmp_path), k=3).to_pandas().sort_values(
        ["o_custkey", "rnk"], ignore_index=True
    )
    # cust 7: price 90 (key 2), 90 (key 3 — tiebreak by key), 50 (key 1)
    assert out.loc[out["o_custkey"] == 7, "o_orderkey"].tolist() == [2, 3, 1]
    assert out.loc[out["o_custkey"] == 8, "rnk"].tolist() == [1]


def test_value_bands_boundaries(ray_session, tmp_path):
    import os
    import pandas as pd

    from codepropertygraph_ray.functions.relational import events_value_bands

    pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "ts": pd.to_datetime(["2024-01-01"] * 4),
         "user_id": [1, 1, 1, 1], "event_type": ["x"] * 4,
         "value": [0.0, 9.99, 10.0, 100.0],  # [lo, hi) boundary semantics
         "props": [""] * 4}
    ).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = events_value_bands(str(tmp_path)).to_pandas()
    got = dict(zip(out["band"], out["n_events"]))
    assert got == {"low": 2, "mid": 1, "high": 1}


def test_dup_groups_transitive(ray_session):
    from codepropertygraph_ray.functions.similarity import dup_groups

    out = dup_groups("/root/testdata/sf0.001")
    # every group's id equals the min vec_id inside it (cc canonical label)
    assert (out.groupby("group_id")["vec_id"].min() ==
            out.groupby("group_id")["vec_id"].apply(lambda s: s.min())).all()
    assert (out.groupby("group_id")["group_id"].first() ==
            out.groupby("group_id")["vec_id"].min()).all()


def test_join_auto_shuffle_degrade_matches_broadcast(ray_session, monkeypatch):
    """nation_revenue's customer hop must produce identical results on the
    broadcast probe AND on the degraded shuffle-join path (budget forced
    to 0) — the size-aware flip is a pure physical choice."""
    from codepropertygraph_ray.functions import joins, relational

    sf = "/root/testdata/sf0.001"
    want = relational.nation_revenue(sf).to_pandas()
    monkeypatch.setattr(joins, "BROADCAST_BYTES_LIMIT", 0)
    got = relational.nation_revenue(sf).to_pandas()
    key = ["r_name", "n_name"]
    want = want.sort_values(key, ignore_index=True)
    got = got.sort_values(key, ignore_index=True)[want.columns]
    pd.testing.assert_frame_equal(want, got)


def test_sliding_max_range_peer_ties(ray_session, tmp_path):
    """SQL RANGE ... CURRENT ROW includes ALL ts-peers — rows sharing a
    timestamp must see each other's values regardless of tie order."""
    import os

    import duckdb

    from codepropertygraph_ray.functions.relational import sliding_max_events

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:10",  # tie
         "2024-01-01 00:50"]
    )
    df = pd.DataFrame(
        {"event_id": [1, 2, 3, 4], "ts": ts, "user_id": [1, 1, 1, 1],
         "event_type": ["a"] * 4, "value": [9.0, 1.0, 7.0, 2.0],
         "props": [""] * 4}
    )
    df.to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = (
        sliding_max_events(str(tmp_path))
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(
        """SELECT user_id, event_id,
                  max(value) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                                             AND CURRENT ROW) AS max30
           FROM events ORDER BY event_id"""
    ).df()
    # both ts-peers (event 2 and 3) must see max30 = 9 (window holds 9,1,7);
    # event 4's window [00:20, 00:50] holds only itself
    assert got["max30"].tolist() == want["max30"].tolist() == [9.0, 9.0, 9.0, 2.0]


def test_semantics_dsl_parser():
    """Parser.scala:34-76 analog: quoted names + N->M mappings, comments,
    no-mapping lines kill propagation."""
    from codepropertygraph_ray.semantics import blocked_keys, parse

    text = '''
# comment line
"<operator>.assignment" 2->1
"<operators>.assignmentAnd" 2->1 1->1
"sanitizer key"          # declared, no mappings: kills flow
"neg" -1->2
'''
    sem = parse(text)
    assert sem["<operator>.assignment"].mappings == ((2, 1),)
    assert sem["<operators>.assignmentAnd"].mappings == ((2, 1), (1, 1))
    assert sem["neg"].mappings == ((-1, 2),)
    assert not sem["sanitizer key"].propagates
    assert blocked_keys(sem) == frozenset({"sanitizer key"})
    with pytest.raises(ValueError):
        parse("unquoted 1->2")


def test_workspace_and_scripts(ray_session, tmp_path):
    """WorkspaceManager/ScriptManager analogs: create (build) a project,
    list it, open resumes the stored ledger, scripts run against the open
    graph with params, overwrite + remove semantics."""
    from codepropertygraph_ray.workspace import (
        WorkspaceManager, list_scripts, run_script,
    )

    ws = WorkspaceManager(str(tmp_path / "ws"))
    proj = ws.create_project("/root/testdata/sf0.001", "demo")
    assert [p.name for p in ws.projects()] == ["demo"]
    assert ws.active == "demo"

    runner = ws.open("demo")  # resume: ledger already applied
    assert runner.ledger()["applied"][-1] == "validate"

    sdir = tmp_path / "scripts"
    sdir.mkdir()
    (sdir / "count_entities.py").write_text(
        '"""Count entities, optionally only external ones."""\n'
        "q = graph.entities()\n"
        "if params.get('external') == 'true':\n"
        "    q = q.external(True)\n"
        "result = q.count()\n"
    )
    assert list_scripts(str(sdir)) == [
        ("count_entities.py", "Count entities, optionally only external ones.")
    ]
    total = run_script(str(sdir / "count_entities.py"), runner)
    ext = run_script(str(sdir / "count_entities.py"), runner,
                     {"external": "true"})
    assert total > ext > 0

    # createProject overwrites an existing name (reference semantics)
    ws.create_project("/root/testdata/sf0.001", "demo")
    assert [p.name for p in ws.projects()] == ["demo"]
    ws.remove_project("demo")
    assert ws.projects() == []
    with pytest.raises(KeyError):
        ws.open("demo")


def test_redact_masks_pii_in_rule_order(ray_session, tmp_path):
    import os
    import pandas as pd

    from codepropertygraph_ray.functions.text import redact

    props = [
        'contact a.b@mail.com or 555-123 4567 now',  # email + phone
        '{"k": 42}',                                 # bare number
        "no pii here",
        "ids 7 and 99",
    ]
    pd.DataFrame(
        {"event_id": [1, 2, 3, 4],
         "ts": pd.to_datetime(["2024-01-01"] * 4),
         "user_id": [1, 1, 2, 2], "event_type": ["a"] * 4,
         "value": [0.0] * 4, "props": props}
    ).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = redact(str(tmp_path)).to_pandas().sort_values(
        "event_id", ignore_index=True
    )
    # email masked BEFORE the number rule could eat its digits
    assert out["redacted"].tolist() == [
        "contact <EMAIL> or <PHONE> now",
        '{"k": <NUM>}',
        "no pii here",
        "ids <NUM> and <NUM>",
    ]
    assert out["n_redacted"].tolist() == [2, 1, 0, 2]


def test_range_count_halfopen_window(ray_session, tmp_path):
    import os
    import pandas as pd

    from codepropertygraph_ray.functions.asof import range_count_events

    base = pd.Timestamp("2024-01-01 12:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: click at 12:05; views at 12:00 (EXCLUDED: == ts-5min),
        # 12:01, 12:05 (included: == ts), 12:06 (after)
        (1, base + 5 * m, 1, "click"),
        (2, base + 0 * m, 1, "view"),
        (3, base + 1 * m, 1, "view"),
        (4, base + 5 * m, 1, "view"),
        (5, base + 6 * m, 1, "view"),
        # user 2's view must not leak into user 1's count
        (6, base + 4 * m, 2, "view"),
        # user 3: click with no views at all -> count 0
        (7, base + 5 * m, 3, "click"),
    ]
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"]).assign(
        value=0.0, props=""
    ).to_parquet(os.path.join(str(tmp_path), "events.parquet"))
    out = range_count_events(str(tmp_path)).to_pandas().sort_values(
        "event_id", ignore_index=True
    )
    assert out["event_id"].tolist() == [1, 7]
    assert out["n_views"].tolist() == [2, 0]


def test_fast_read_parquet_equals_native(ray_session, tmp_path):
    """sources/fastread must return the same rows/columns as the native
    read over a many-part table, honor column pruning, and slice output
    to batch_rows (the base-pass regression guard: a batch_size on the
    first fused consumer once serialized the whole scan)."""
    import os

    import numpy as np
    import ray.data

    from codepropertygraph_ray.sources.fastread import fast_read_parquet

    rng = np.random.default_rng(7)
    d = os.path.join(str(tmp_path), "many")
    os.makedirs(d)
    total = 0
    for i in range(40):  # above the 32-file fast-path threshold
        n = int(rng.integers(1, 400))
        pd.DataFrame(
            {"a": rng.integers(0, 1_000_000, n),
             "b": rng.integers(0, 9, n).astype(str),
             "c": rng.random(n)}
        ).to_parquet(os.path.join(d, f"p{i:02d}.parquet"))
        total += n
    fast = fast_read_parquet(d, columns=["a", "b"], num_tasks=7).to_pandas()
    native = ray.data.read_parquet(d, columns=["a", "b"]).to_pandas()
    key = ["a", "b"]
    assert sorted(fast.columns) == sorted(native.columns) == key
    pd.testing.assert_frame_equal(
        fast.sort_values(key, ignore_index=True),
        native.sort_values(key, ignore_index=True),
    )
    # the bundling-collapse guard (commit 5351c7e): a consumer fused
    # onto the read WITHOUT an explicit batch_size must run one task per
    # file group — an explicit batch_size makes Ray's bundler count the
    # reader's 1-row item blocks and serialize the scan into ONE task
    import re

    mat = (
        fast_read_parquet(d, num_tasks=5, batch_rows=100)
        .map_batches(lambda t: t, batch_format="pandas")
        .materialize()
    )
    assert len(mat.to_pandas()) == total
    op_line = next(
        ln for ln in mat.stats().splitlines() if "_read_group" in ln
    )
    n_tasks = int(re.search(r"(\d+) tasks executed", op_line).group(1))
    assert n_tasks == 5, f"fused scan collapsed to {n_tasks} task(s)"
