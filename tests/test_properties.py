"""Property-based tests (hypothesis) over the pure-function core.

The reference has no randomized testing (SURVEY.md §5); these go beyond
it: each property pits a distributed-engine primitive against an
obviously-correct brute-force definition on randomized inputs —
regression armor for the primitives everything else is built on.
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
import pyarrow as pa
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from codepropertygraph_ray.functions.cc import cc_local
from codepropertygraph_ray.functions.graph import (
    immediate_dominators,
    resolve_functional,
)
from codepropertygraph_ray.ids import node_ids

# -- ids: content-derived, order-free, label-scoped --------------------------

keys_st = st.lists(
    st.text(min_size=0, max_size=8), min_size=1, max_size=30
)


@given(keys_st, st.randoms())
@settings(max_examples=50, deadline=None)
def test_node_ids_order_free(keys, rnd):
    a = node_ids("ENTITY", keys)
    perm = list(range(len(keys)))
    rnd.shuffle(perm)
    b = node_ids("ENTITY", [keys[i] for i in perm])
    assert {k: v for k, v in zip(keys, a)} == {
        keys[i]: v for i, v in zip(perm, b)
    }


@given(st.text(min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_node_ids_label_scoped(key):
    assert node_ids("ENTITY", [key])[0] != node_ids("TURN", [key])[0]


# -- union-find vs BFS components --------------------------------------------

edges_st = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1,
    max_size=40,
)


@given(edges_st)
@settings(max_examples=100, deadline=None)
def test_cc_local_matches_bfs_components(pairs):
    df = pd.DataFrame(
        {"a": [f"n{a}" for a, _ in pairs], "b": [f"n{b}" for _, b in pairs]}
    )
    got = cc_local(df)
    adj = defaultdict(set)
    for a, b in pairs:
        adj[f"n{a}"].add(f"n{b}")
        adj[f"n{b}"].add(f"n{a}")
    seen: dict = {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, q = [], deque([start])
        comp_seen = {start}
        while q:
            u = q.popleft()
            comp.append(u)
            for v in adj[u]:
                if v not in comp_seen:
                    comp_seen.add(v)
                    q.append(v)
        rep = min(comp)
        for n in comp:
            seen[n] = rep
    assert dict(zip(got["node"], got["component"])) == seen


# -- CHK dominators vs the path definition ------------------------------------


@given(
    st.integers(3, 8).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                min_size=n - 1,
                max_size=3 * n,
            ),
        )
    )
)
@settings(max_examples=100, deadline=None)
def test_dominators_match_removal_definition(case):
    n, raw = case
    # force reachability skeleton: chain 0→1→…→n-1, plus random edges
    edges = sorted(set([(i, i + 1) for i in range(n - 1)] + raw))
    succ = defaultdict(list)
    for s, d in edges:
        succ[s].append(d)

    def reachable(exclude=None):
        seen, q = {0}, deque([0])
        if exclude == 0:
            return set()
        while q:
            u = q.popleft()
            for v in succ[u]:
                if v != exclude and v not in seen:
                    seen.add(v)
                    q.append(v)
        return seen

    idom = immediate_dominators(edges, 0)
    base = reachable()
    for node in base:
        if node == 0:
            continue
        # dominators of node = m such that removing m makes node unreachable
        doms = {m for m in base if m != node and node not in reachable(exclude=m)}
        doms.add(node)
        # idom = the strict dominator dominated by all other strict doms:
        # it is the strict dominator whose own strict-dominator set is
        # largest (the closest one)
        strict = doms - {node}
        got = idom[node]
        assert got in strict
        # every other strict dominator of node must dominate got as well
        for m in strict - {got}:
            assert got not in reachable(exclude=m) or got == m


# -- memoized functional resolve vs naive walk --------------------------------


@given(
    st.dictionaries(
        st.integers(0, 20), st.integers(0, 20), min_size=0, max_size=20
    )
)
@settings(max_examples=100, deadline=None)
def test_resolve_functional_matches_naive(fmap):
    # make acyclic: only keep strictly-decreasing edges (the caller contract)
    f = {k: v for k, v in fmap.items() if v < k}
    starts = list(f)
    got = resolve_functional(f, starts)
    for s in starts:
        cur = s
        for _ in range(100):
            if cur not in f:
                break
            cur = f[cur]
        assert got[s] == cur


# -- sketches: CMS never underestimates; Bloom never false-negatives ---------

stream_st = st.lists(st.integers(min_value=0, max_value=200),
                     min_size=1, max_size=300)


@given(stream_st, st.integers(min_value=1, max_value=299))
@settings(max_examples=50, deadline=None)
def test_cms_one_sided_and_linear(stream, cut):
    from collections import Counter

    from codepropertygraph_ray.functions.sketch import (
        cms_estimate, cms_sketch,
    )

    s = pd.Series(stream)
    sk = cms_sketch(s)
    true = Counter(stream)
    qs = pd.Series(sorted(true))
    est = cms_estimate(sk, qs)
    assert (est >= np.array([true[q] for q in qs])).all()
    cut = min(cut, len(stream))
    split = cms_sketch(s.iloc[:cut]) + cms_sketch(s.iloc[cut:]) \
        if cut < len(stream) else cms_sketch(s)
    assert (sk == split).all()


@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=200),
       st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives_and_or_merge(build, probe):
    from codepropertygraph_ray.functions.sketch import (
        bloom_might_contain, bloom_partial,
    )

    b = np.array(build, dtype=np.int64)
    bits = np.unpackbits(
        np.frombuffer(bloom_partial(b), dtype=np.uint8)).astype(bool)
    assert bloom_might_contain(bits, b).all()  # no false negatives
    half = len(b) // 2 or 1
    merged = np.unpackbits(
        np.frombuffer(bloom_partial(b[:half]), dtype=np.uint8)
        | np.frombuffer(bloom_partial(b[half:]), dtype=np.uint8)
        if half < len(b)
        else np.frombuffer(bloom_partial(b), dtype=np.uint8)
    ).astype(bool)
    assert (merged == bits).all()  # OR-merge == whole-stream build


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=0, max_size=5000),
       st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=100))
@settings(max_examples=50, deadline=None)
def test_probe_sorted_equals_searchsorted(table, queries):
    from codepropertygraph_ray.stages.validate import _probe_sorted

    tbl = np.sort(np.array(table, dtype=np.int64))
    q = np.array(queries * 50, dtype=np.int64)  # push past the 4096 gate
    assert (np.searchsorted(tbl, q) == _probe_sorted(tbl, q)).all()


# -- poly_hash: the SQL-expressible mixer must equal DuckDB exactly ----------

_poly_str = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    min_size=0, max_size=16,
)


@given(st.lists(_poly_str, min_size=1, max_size=25))
@settings(max_examples=40, deadline=None)
def test_poly_hash_matches_duckdb(strs):
    """Every oracle of the keyed-hash family (simhash / fingerprint /
    minhash / HLL / CMS) rests on poly_hash(py) == poly_hash(SQL); pin the
    equality on arbitrary unicode, both moduli and both bases."""
    import duckdb

    from codepropertygraph_ray.functions.text import (
        POLY_B2, POLY_P31, poly_hash, poly_hash_sql,
    )

    s = pd.Series(strs, dtype=object)
    for kw in ({}, {"mod": POLY_P31}, {"base": POLY_B2}):
        py = list(poly_hash(s, **kw))
        got = [r[0] for r in duckdb.sql(
            f"SELECT {poly_hash_sql('s', **kw)} FROM (SELECT unnest(?) AS s)",
            params=[strs],
        ).fetchall()]
        assert py == got


# -- exact_span_stats batch kernel vs pure-Python reference ------------------

_span_word = st.text(alphabet="abcde", min_size=1, max_size=3)
_span_text = st.lists(_span_word, min_size=0, max_size=14).map(" ".join)


@given(st.lists(_span_text, min_size=1, max_size=12))
@settings(max_examples=40, deadline=None)
def test_span_gram_rows_matches_reference(texts):
    """The vectorized gram-position kernel (explode + poly_hash + groupby)
    must equal the obvious per-doc Python enumeration: same (doc, gram)
    hash multiset, positions counted with multiplicity. The tiny alphabet
    forces heavy cross- and within-doc gram collisions."""
    from collections import Counter

    from codepropertygraph_ray.functions.dedup import SPAN_K, _span_gram_rows
    from codepropertygraph_ray.functions.text import poly_hash

    t = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
    })
    got = _span_gram_rows(t)
    got_counts = (
        {} if isinstance(got, pa.Table) and got.num_rows == 0 else {
            (int(r.doc_id), int(r.h)): int(r.cnt)
            for r in pd.DataFrame(got).itertuples()
        }
    )

    want: Counter = Counter()
    for d, text in enumerate(texts):
        toks = text.split(" ")
        for i in range(len(toks) - SPAN_K + 1):
            g = " ".join(toks[i : i + SPAN_K])
            h = int(poly_hash(pd.Series([g]))[0])
            want[(d, h)] += 1
    assert got_counts == dict(want)


@settings(deadline=None)
@given(
    st.integers(min_value=1, max_value=97),
    st.integers(min_value=1, max_value=12),
)
def test_ntile_closed_form_matches_repeat_spec(cnt, n):
    import numpy as np

    from codepropertygraph_ray.functions.relational import ntile_assign

    rn = np.arange(1, cnt + 1)
    got = ntile_assign(rn, np.full(cnt, cnt), n)
    base, rem = divmod(cnt, n)
    sizes = [base + (1 if i < rem else 0) for i in range(n)]
    ref = np.repeat(np.arange(1, n + 1), sizes)
    assert list(got) == list(ref)
