"""Dedup + similarity operator tests: vectorized MinHash correctness,
LSH containment/recall on planted dups, the stop-shingle DF cap, and the
block-pair embedding dedup vs a brute-force reference.

These are the probabilistic/approximate operators without a SQL oracle
(CORRECTNESS marks them rows-only), so pytest carries their semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from codepropertygraph_ray.functions.dedup import (
    JACCARD_THRESHOLD,
    MinHasher,
    _shingles,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from codepropertygraph_ray.ids import hash_series, mix_ids


def _write_docs(tmp_path, texts) -> str:
    sf_dir = str(tmp_path)
    pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    ).to_parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def _jaccard(a: str, b: str) -> float:
    sa, sb = set(_shingles(a)), set(_shingles(b))
    if not (sa or sb):
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_minhash_vectorized_matches_single_doc_signature():
    """The batch-level explode+reduceat path must equal the per-doc
    ``signature`` path (same permutations, same band combiner)."""
    mh = MinHasher()
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven eight",
        "xy",  # < shingle width → no bands emitted
    ]
    batch = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64), "text": texts})
    out = mh(batch)
    assert set(out["doc_id"]) == {0, 1}  # shingle-less doc 2 emits nothing
    from codepropertygraph_ray.functions.dedup import N_BANDS, N_PERM

    from codepropertygraph_ray.functions.dedup import MH_P
    from codepropertygraph_ray.functions.text import poly_hash

    for doc_id, text in [(0, texts[0]), (1, texts[1])]:
        sh = sorted(set(_shingles(text)))
        hs = poly_hash(pd.Series(sh), mod=MH_P)
        sig = mh.signature(hs)
        per_band = sig.reshape(N_BANDS, N_PERM // N_BANDS)
        want = mix_ids(*[per_band[:, r] for r in range(per_band.shape[1])])
        got = out[out["doc_id"] == doc_id].sort_values("band_id")["band_hash"]
        assert list(got) == list(want)


def test_minhash_batch_split_invariance():
    """Signatures must not depend on batch boundaries (determinism across
    parallelism — the StableOutputTests discipline)."""
    mh = MinHasher()
    texts = [f"common prefix words number {i} tail tail tail" for i in range(6)]
    full = mh(pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64), "text": texts}))
    parts = pd.concat(
        [
            mh(pd.DataFrame({"doc_id": np.arange(0, 3, dtype=np.int64), "text": texts[:3]})),
            mh(pd.DataFrame({"doc_id": np.arange(3, 6, dtype=np.int64), "text": texts[3:]})),
        ],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(
        full.sort_values(["doc_id", "band_id"], ignore_index=True),
        parts.sort_values(["doc_id", "band_id"], ignore_index=True),
    )


def test_minhash_lsh_planted_dups(ray_session, tmp_path):
    """Planted near-identical pairs are recalled; every returned pair
    verifies at exact Jaccard ≥ threshold (containment in the exact set)."""
    base = [
        f"doc {i} talks about topic {i} with words w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f"
        for i in range(20)
    ]
    # planted dups: ids 20/21 and 22/23 are one-word edits of each other
    dup1 = "the quick brown fox jumps over the lazy dog again and again today"
    dup2 = dup1.replace("today", "tomorrow")
    dup3 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    dup4 = dup3.replace("mu", "nu")
    sf_dir = _write_docs(tmp_path, base + [dup1, dup2, dup3, dup4])
    texts = base + [dup1, dup2, dup3, dup4]

    got = minhash_lsh_pairs(sf_dir).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (20, 21) in pairs and (22, 23) in pairs  # recall on planted dups
    for a, b in pairs:  # containment: all verified pairs are true pairs
        assert _jaccard(texts[a], texts[b]) >= JACCARD_THRESHOLD


def test_minhash_lsh_contained_in_exact(ray_session, tmp_path):
    """LSH-verified pairs ⊆ exact n-gram Jaccard pairs on the same corpus."""
    texts = [
        "shared words one two three four five six unique %d suffix" % i
        for i in range(10)
    ] + ["totally different content here nothing shared with others at all"]
    sf_dir = _write_docs(tmp_path, texts)
    exact = ngram_jaccard_pairs(sf_dir).to_pandas()
    lsh = minhash_lsh_pairs(sf_dir).to_pandas()
    exact_set = set(zip(exact["id_a"], exact["id_b"]))
    lsh_set = set(zip(lsh["id_a"], lsh["id_b"]))
    assert lsh_set <= exact_set


def test_ngram_df_cap_bounds_hot_shingle(ray_session, tmp_path):
    """A planted stop-shingle shared by many docs stops producing pairs
    once its DF exceeds the cap; genuine dups (many non-hot shingles) are
    unaffected — the SURVEY.md §7.4 fan-out bound."""
    hot = "hot stop shingle"
    # 10 docs share ONLY the hot shingle (rest unique) → pairwise J over
    # the uncapped shingle set is 1/(1+4+4)=0.11 < 0.5, but make them
    # J-heavy by keeping docs tiny: text = hot shingle only → J = 1.0
    hot_docs = [hot for _ in range(10)]
    dup_a = "alpha beta gamma delta epsilon zeta eta theta"
    dup_b = "alpha beta gamma delta epsilon zeta eta thetb"
    sf_dir = _write_docs(tmp_path, hot_docs + [dup_a, dup_b])

    uncapped = ngram_jaccard_pairs(sf_dir, max_df=1000).to_pandas()
    got_u = set(zip(uncapped["id_a"], uncapped["id_b"]))
    assert (10, 11) in got_u
    assert sum(1 for a, b in got_u if a < 10 and b < 10) == 45  # hot quadratic

    capped = ngram_jaccard_pairs(sf_dir, max_df=5).to_pandas()
    got_c = set(zip(capped["id_a"], capped["id_b"]))
    assert (10, 11) in got_c  # genuine dup survives
    assert not any(a < 10 and b < 10 for a, b in got_c)  # fan-out bounded


def test_embedding_dups_block_join_matches_bruteforce(ray_session):
    """Block-pair join output == direct all-pairs numpy on the sf0.001
    embeddings table (exactness of the distributed shape)."""
    from codepropertygraph_ray.functions.similarity import (
        DUP_COS_THRESHOLD,
        _matrix,
        embedding_dups,
    )

    sf = "/root/testdata/sf0.001"
    full = pd.read_parquet(f"{sf}/embeddings.parquet")
    m = _matrix(full)
    ids = full["vec_id"].to_numpy(np.int64)
    sims = m @ m.T
    ia, ib = np.where(np.triu(sims >= DUP_COS_THRESHOLD, k=1))
    want = {(min(a, b), max(a, b)) for a, b in zip(ids[ia], ids[ib])}

    got_df = embedding_dups(sf).to_pandas()
    got = set(zip(got_df["id_a"], got_df["id_b"]))
    assert got == want


def test_knn_ivf_recall_vs_bruteforce(ray_session):
    """IVF top-k recalls most of the exact top-k on the sf0.001 embeddings
    (same discipline as the LSH recall check): with nprobe/IVF_N_LISTS = 1/4
    of the lists scanned, recall of the exact neighbor set stays high on
    this clustered synthetic corpus."""
    from codepropertygraph_ray.functions.similarity import knn_bruteforce, knn_ivf

    sf = "/root/testdata/sf0.001"
    exact = knn_bruteforce(sf).to_pandas()
    approx = knn_ivf(sf).to_pandas()
    exact_set = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_set = set(zip(approx["query_id"], approx["neighbor_id"]))
    assert len(approx_set) > 0
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"


def test_knn_ivf_deterministic(ray_session):
    """Two runs produce identical rows (codebook + assignment are seeded
    and data-order-free)."""
    from codepropertygraph_ray.functions.similarity import knn_ivf

    sf = "/root/testdata/sf0.001"
    a = knn_ivf(sf).to_pandas().sort_values(["query_id", "rank"], ignore_index=True)
    b = knn_ivf(sf).to_pandas().sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_dedup_keep_list_policy(ray_session, tmp_path):
    """keep = exactly one representative (min id) per near-dup component,
    all untouched docs kept."""
    from codepropertygraph_ray.functions.dedup import dedup_keep_list

    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [base, base + " iota", "totally different words here now", base]
    sf = _write_docs(tmp_path, texts)
    out = dedup_keep_list(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(out) == 4
    kept = set(out.loc[out["keep"], "doc_id"])
    # docs 0,1,3 are one near-dup component (rep = 0); doc 2 untouched
    assert kept == {0, 2}


def test_simhash_pairs_equals_bruteforce(ray_session, tmp_path):
    """Banding over 4×16-bit bands is EXACT for hamming <= 3 (pigeonhole:
    <=3 flipped bits corrupt at most 3 bands), so simhash_pairs must equal
    the all-pairs answer computed directly from the fingerprints —
    including planted exact dups (hamming 0)."""
    import itertools

    from codepropertygraph_ray.functions.dedup import (
        SIMHASH_MAX_HAMMING,
        _popcount64,
        simhash_pairs,
    )
    from codepropertygraph_ray.functions.text import simhash64

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "data", "table", "scan", "merge"]
    base = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(30)
    ]
    # planted: exact dup of doc 0, one-token variant of doc 1
    texts = base + [base[0], base[1].replace("alpha", "omega", 1)]
    sf_dir = _write_docs(tmp_path, texts)

    got = simhash_pairs(sf_dir).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"], got["hamming"]))

    sigs = simhash64(sf_dir).to_pandas().sort_values("doc_id")
    sims = np.ascontiguousarray(sigs["sim" "hash"].to_numpy(np.int64)).view(np.uint64)
    ids = sigs["doc_id"].to_numpy(np.int64)
    want = set()
    for i, j in itertools.combinations(range(len(ids)), 2):
        h = int(_popcount64(np.array([sims[i] ^ sims[j]], dtype=np.uint64))[0])
        if h <= SIMHASH_MAX_HAMMING:
            a, b = sorted((int(ids[i]), int(ids[j])))
            want.add((a, b, h))
    assert got_set == want
    # the exact dup is found at hamming 0
    assert (0, 30, 0) in got_set


def _brute_span_stats(texts, k):
    """Pure-Python reference: per doc, positions whose k-gram string also
    occurs (as a string, not a hash) in some other document."""
    grams = [
        [" ".join(t.split(" ")[i : i + k])
         for i in range(len(t.split(" ")) - k + 1)]
        for t in texts
    ]
    docs_of = {}
    for d, gs in enumerate(grams):
        for g in set(gs):
            docs_of.setdefault(g, set()).add(d)
    return [
        (d, len(gs), sum(1 for g in gs if len(docs_of[g]) >= 2))
        for d, gs in enumerate(grams)
    ]


def test_exact_span_stats_matches_bruteforce(ray_session, tmp_path):
    from codepropertygraph_ray.functions.dedup import SPAN_K, exact_span_stats

    shared = "the quick brown fox jumps over the lazy dog tonight"
    texts = [
        shared + " alpha beta gamma",                  # shares a long span with 1
        "prefix words here " + shared,                 # shares with 0
        "totally unrelated content with unique words only here",
        "short doc",                                   # < SPAN_K tokens → 0 grams
        "the quick brown fox jumps",                   # exactly one gram, shared
    ]
    sf = _write_docs(tmp_path, texts)
    got = (
        exact_span_stats(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = _brute_span_stats(texts, SPAN_K)
    assert list(map(tuple, got.to_numpy())) == want
    # the shared sentence makes every position of doc 4 duplicated
    row4 = got.loc[got["doc_id"] == 4].iloc[0]
    assert row4["n_grams"] == 1 and row4["dup_grams"] == 1
    # doc 3 has no grams at all
    row3 = got.loc[got["doc_id"] == 3].iloc[0]
    assert row3["n_grams"] == 0 and row3["dup_grams"] == 0


def test_exact_span_stats_within_doc_repeat_not_dup(ray_session, tmp_path):
    """A k-gram repeated INSIDE one document only is not cross-doc
    duplication (distinct-doc count is 1)."""
    from codepropertygraph_ray.functions.dedup import exact_span_stats

    rep = "a b c d e"
    texts = [rep + " " + rep, "x y z w v u t s"]  # doc 0 self-repeats
    sf = _write_docs(tmp_path, texts)
    got = exact_span_stats(sf).to_pandas().sort_values("doc_id")
    assert got["dup_grams"].tolist() == [0, 0]


def _brute_dup_spans(texts, k):
    """Independent formulation: union the covered TOKEN sets of duplicated
    gram positions, then read off contiguous covered runs — must equal the
    engine's position-jump islands."""
    grams = [
        [" ".join(t.split(" ")[i : i + k])
         for i in range(len(t.split(" ")) - k + 1)]
        for t in texts
    ]
    docs_of = {}
    for d, gs in enumerate(grams):
        for g in set(gs):
            docs_of.setdefault(g, set()).add(d)
    spans = []
    for d, gs in enumerate(grams):
        covered = set()
        for p, g in enumerate(gs):
            if len(docs_of[g]) >= 2:
                covered.update(range(p, p + k))
        run = None
        for tok in sorted(covered) + [None]:
            if run and (tok is None or tok != run[1] + 1):
                spans.append((d, run[0], run[1] - run[0] + 1))
                run = None
            if tok is not None:
                run = (run[0], tok) if run else (tok, tok)
    return sorted(spans)


def test_dup_spans_matches_token_cover_runs(ray_session, tmp_path):
    from codepropertygraph_ray.functions.dedup import SPAN_K, dup_spans

    shared1 = "alpha beta gamma delta epsilon zeta eta theta"
    shared2 = "one two three four five"
    texts = [
        shared1 + " filler words between " + shared2,   # two separate spans
        shared2 + " unrelated tail goes here now",       # shares span 2
        "prefix " + shared1,                             # shares span 1
        "no duplication in this document at all okay",
        shared1 + " " + shared2,                         # adjacent spans may merge
    ]
    sf = _write_docs(tmp_path, texts)
    got = sorted(
        map(tuple, dup_spans(sf).to_pandas()[["doc_id", "start", "length"]]
            .to_numpy())
    )
    assert got == _brute_dup_spans(texts, SPAN_K)
    # sanity: doc 3 contributes no spans
    assert not any(d == 3 for d, _, _ in got)


def test_dup_spans_randomized_cover_equivalence(ray_session, tmp_path):
    """Randomized (seeded) corpus over a tiny vocabulary — heavy collisions,
    within-doc repeats, adjacent and overlapping spans."""
    import random

    from codepropertygraph_ray.functions.dedup import SPAN_K, dup_spans

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(20)
    ]
    sf = _write_docs(tmp_path, texts)
    got = sorted(
        map(tuple, dup_spans(sf).to_pandas()[["doc_id", "start", "length"]]
            .to_numpy())
    )
    assert got == _brute_dup_spans(texts, SPAN_K)


def test_cut_dup_spans_applies_cut_list(ray_session, tmp_path):
    """clean_text == tokens minus the union of dup_spans covers, and a doc
    that is ENTIRELY duplicated text cuts to the empty string."""
    from codepropertygraph_ray.functions.dedup import (
        SPAN_K, cut_dup_spans, dup_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    texts = [
        "keep these words " + shared + " and keep these too",
        shared,                                    # fully duplicated → ""
        "all original text nothing shared anywhere here at all",
    ]
    sf = _write_docs(tmp_path, texts)
    spans = dup_spans(sf).to_pandas()
    got = (
        cut_dup_spans(sf).to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    for d, text in enumerate(texts):
        toks = text.split(" ")
        keep = [True] * len(toks)
        for _, r in spans[spans["doc_id"] == d].iterrows():
            for i in range(int(r["start"]), int(r["start"] + r["length"])):
                keep[i] = False
        want = " ".join(t for t, kf in zip(toks, keep) if kf)
        assert got.loc[got["doc_id"] == d, "clean_text"].iloc[0] == want
    assert got.loc[got["doc_id"] == 1, "clean_text"].iloc[0] == ""
    assert got.loc[got["doc_id"] == 2, "clean_text"].iloc[0] == texts[2]


def test_turn_dup_spans_cross_conversation_only(ray_session, tmp_path):
    """Duplication unit is the CONVERSATION: a span repeated across turns
    of ONE conversation is structure, the same span in two conversations
    is a template signal."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from codepropertygraph_ray.functions.dedup import turn_dup_span_stats

    tmpl = "please run the standard diagnostic suite now"
    rows = [
        ("c1", 0, "user", "", tmpl + " extra words one two"),
        ("c1", 1, "assistant", "", tmpl + " different tail here"),  # same conv
        ("c2", 0, "user", "", "unrelated opening on another topic entirely ok"),
        ("c2", 1, "assistant", "", "prefix " + tmpl),               # cross-conv!
        ("c3", 0, "user", "", "tiny"),
    ]
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "tool": [r[3] for r in rows],
        "text": [r[4] for r in rows],
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
    })
    corpus = os.path.join(str(tmp_path), "transcripts")
    os.makedirs(corpus)
    pq.write_table(t, os.path.join(corpus, "part-0.parquet"))
    # a `transcripts/` dir inside sf_dir is used verbatim (user-corpus path)
    got = (
        turn_dup_span_stats(str(tmp_path))
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    # the 7-token template has 3 5-gram positions; every turn containing it
    # (c1/0, c1/1, c2/1) is cross-conversation duplicated at those positions
    assert got.loc[("c1", 0), "dup_grams"] == 3
    assert got.loc[("c1", 1), "dup_grams"] == 3
    assert got.loc[("c2", 1), "dup_grams"] == 3
    assert got.loc[("c2", 0), "dup_grams"] == 0
    assert got.loc[("c3", 0), "n_grams"] == 0


def test_kmeans_matches_bruteforce_lloyd(ray_session):
    """Distributed all-integer Lloyd's == the obvious single-threaded loop
    on the same quantized input (same init, same floor-div centroid means,
    same lowest-id tie-break)."""
    from codepropertygraph_ray.functions.similarity import (
        KM_ITERS,
        KM_K,
        KM_Q,
        kmeans_clusters,
    )

    sf = "/root/testdata/sf0.001"
    full = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values(
        "vec_id", ignore_index=True
    )
    x = np.floor(
        np.stack(full["embedding"].to_numpy()).astype(np.float64) * KM_Q + 0.5
    ).astype(np.int64)
    ids = full["vec_id"].to_numpy(np.int64)
    cent = x[:KM_K].copy()
    cl_ids = np.arange(KM_K, dtype=np.int64)

    def assign(c):
        d2 = (x * x).sum(1)[:, None] - 2 * (x @ c.T) + (c * c).sum(1)[None, :]
        return d2.argmin(axis=1)

    for _ in range(KM_ITERS):
        a = assign(cent)
        present = np.unique(a)
        cent = np.stack([
            np.floor_divide(x[a == p].sum(axis=0), (a == p).sum())
            for p in present
        ])
        cl_ids = cl_ids[present]
    final = cl_ids[assign(cent)]

    got = (
        kmeans_clusters(sf).to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert list(got["vec_id"]) == list(ids)
    assert list(got["cluster"]) == list(final)
    # every surviving cluster is non-trivial on this corpus
    assert got["cluster"].nunique() == KM_K


def test_mutual_knn_matches_bruteforce(ray_session):
    """Distributed reciprocal-kNN == single-threaded integer brute force
    under the same (score desc, dst asc) total order."""
    from codepropertygraph_ray.functions.similarity import (
        MUTUAL_K,
        _qunit,
        mutual_knn,
    )

    sf = "/root/testdata/sf0.001"
    full = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values(
        "vec_id", ignore_index=True
    )
    q = _qunit(full)
    ids = full["vec_id"].to_numpy(np.int64)
    sims = q @ q.T
    directed = set()
    for r in range(len(ids)):
        order = np.argsort(-sims[r], kind="stable")
        cnt = 0
        for c in order:
            if c == r:
                continue
            directed.add((ids[r], ids[c]))
            cnt += 1
            if cnt == MUTUAL_K:
                break
    want = {(a, b) for (a, b) in directed if a < b and (b, a) in directed}
    got_df = mutual_knn(sf).to_pandas()
    got = set(zip(got_df["id_a"], got_df["id_b"]))
    assert got == want
    assert len(got) > 0
