"""Near-duplicate detection over the documents table.

The large-scale-training-pipeline dedup family:

* exact dedup — see ``relational.dedup_docs_exact`` (NodeFilter analog);
* **n-gram Jaccard** — exact set-similarity pairs via a shingle-inverted
  index (explode → co-occurrence groupby → pair counts), SQL-oracled.
  A stop-shingle DF cap (drop shingles appearing in > ``max_df`` docs,
  mirrored in the SQL oracle) bounds the per-shingle pair fan-out — the
  skew/salting discipline of SURVEY.md §7.4: one shingle shared by 10^5
  docs would otherwise emit 10^10 candidate pairs from a single bucket.
* **MinHash + LSH** — the sub-quadratic scale path: per-doc minhash
  signatures (ONE batch-level explode + universal hash + ``reduceat``
  min — no per-document Python loop), banded into LSH buckets, bucket
  groupby emits candidate pairs, candidates verified DISTRIBUTED with
  exact Jaccard via a shingle join restricted to candidate documents
  (broadcast candidate-pair set; nothing corpus-scale ever reaches the
  driver, and no per-pair Python loop).

String hashes are the SQL-expressible polynomial codepoint hash
(functions/text.poly_hash, VERDICT r4 item 4) — deterministic across
runs/parallelism AND bit-exactly reproducible by the DuckDB oracles
(dedup_minhash_lsh / dedup_simhash_pairs are hash-compared, not
rows-only); pair/bucket keys still combine via the numeric splitmix
mixer (ids.mix_ids), whose equality the oracle states as tuple equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..ids import mix_ids
from .joins import get_broadcast

SHINGLE_W = 3  # word shingle width
JACCARD_THRESHOLD = 0.5
MAX_DF = 1000  # stop-shingle cap: drop shingles present in > MAX_DF docs

N_PERM = 64  # minhash permutations
N_BANDS = 16  # → 4 rows per band
# 31-bit Mersenne field: shingle hashes and universal-hash permutations
# stay < 2^31, so (a·h + b) mod P is exact in int64 AND in the oracle's
# BIGINT — the SQL-expressible-mixer switch of VERDICT r4 item 4 (32-bit
# minhash is the standard published width; collision budget unchanged in
# practice). Permutation params are closed-form (no RNG) so the DuckDB
# oracle regenerates them from the same two multipliers.
MH_P = (1 << 31) - 1
MH_A_MULT = 2654435761  # Knuth multiplicative constants
MH_B_MULT = 2246822519


def _read_docs(sf_dir: str, columns=None):
    from ..sources.tables import read_table

    return read_table(f"{sf_dir}/documents.parquet", columns=columns)


def _shingles(text: str) -> list[str]:
    toks = (text or "").split(" ")
    if len(toks) < SHINGLE_W:
        return []  # matches the SQL oracle's empty generate_series
    return [" ".join(toks[i : i + SHINGLE_W]) for i in range(len(toks) - SHINGLE_W + 1)]


def _shingle_rows(t: pd.DataFrame):
    sh = t["text"].map(lambda x: sorted(set(_shingles(x))))
    exploded = pd.DataFrame({"doc_id": t["doc_id"], "shingle": sh}).explode("shingle")
    from .agg import empty_safe

    # typed-empty: 0-row object frames trip Ray's block-size sampler
    return empty_safe(exploded.dropna().reset_index(drop=True))


def _hot_shingles(shingled, max_df: int) -> frozenset:
    """Distinct shingles with document frequency > max_df (rows of
    ``shingled`` are distinct (doc, shingle), so DF = row count). The hot
    set is tiny by construction (shingle frequency is heavy-tailed), so it
    broadcasts."""
    from .agg import hash_agg

    df = hash_agg(
        shingled.map_batches(
            lambda t: t.groupby("shingle", as_index=False).agg(df=("doc_id", "size")),
            batch_format="pandas",
        ),
        "shingle",
        df=("df", "sum"),
    )
    from .agg import empty_safe

    hot = df.map_batches(
        lambda t, m=max_df: empty_safe(t.loc[t["df"] > m, ["shingle"]]),
        batch_format="pandas",
    ).to_pandas()
    # empty Datasets lose their schema through to_pandas (typed-empty landmine)
    if hot.empty or "shingle" not in hot.columns:
        return frozenset()
    return frozenset(hot["shingle"])


def ngram_jaccard_pairs(sf_dir: str, max_df: int = MAX_DF):
    """(id_a, id_b): document pairs with word-3-gram Jaccard ≥ 0.5, the
    Jaccard computed over shingles with DF ≤ ``max_df`` (the stop-shingle
    cap — identical filter in the SQL oracle, so both paths measure the
    same quantity; at the default cap nothing is dropped below 1000-doc
    collisions).

    Exact algorithm via inverted index: explode distinct shingles, drop
    hot shingles, groupby shingle → pairwise co-occurrences, sum per pair
    → |A∩B|, then J = inter / (|A| + |B| - inter)."""
    from .agg import hash_agg, hash_groupby

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    shingled = ds.map_batches(_shingle_rows, batch_format="pandas").materialize()

    hot = _hot_shingles(shingled, max_df)
    if hot:
        hot_ref = ray.put(hot)
        shingled = shingled.map_batches(
            lambda t: t[~t["shingle"].isin(get_broadcast(hot_ref))],
            batch_format="pandas",
        )

    # |A| per doc over KEPT shingles (broadcast — dimension-sized),
    # aggregated from the (hot-filtered) shingle rows already in the
    # object store — no second corpus read / re-shingle pass
    from .agg import empty_safe

    sizes_df = shingled.map_batches(
        lambda t: empty_safe(t.groupby("doc_id", as_index=False).size()),
        batch_format="pandas",
    ).to_pandas()
    size_ref = ray.put(
        sizes_df.groupby("doc_id")["size"].sum().to_dict() if len(sizes_df) else {}
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a shingle co-locate → vectorized self-merge;
        # fan-out per shingle is ≤ max_df² by the cap above
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        pc = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        return pc.rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b", "size": "ninter"})

    pair_counts = hash_agg(
        hash_groupby(shingled, "shingle", pairs_in_bucket),
        ["id_a", "id_b"],
        ninter=("ninter", "sum"),
    )

    def verify(t: pd.DataFrame) -> pd.DataFrame:
        szs = get_broadcast(size_ref)
        na = t["id_a"].map(szs).to_numpy(np.int64)
        nb = t["id_b"].map(szs).to_numpy(np.int64)
        inter = t["ninter"].to_numpy(np.int64)
        j = inter / (na + nb - inter)
        keep = t[j >= JACCARD_THRESHOLD]
        return keep[["id_a", "id_b"]]

    return pair_counts.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH (the sub-quadratic scale path)
# ---------------------------------------------------------------------------


def _minhash_params():
    i = np.arange(1, N_PERM + 1, dtype=np.int64)
    a = (MH_A_MULT * i) % MH_P  # never 0: MH_A_MULT % MH_P ≠ 0 and i ≤ 64
    b = (MH_B_MULT * i) % MH_P
    return a, b


class MinHasher:
    """documents batch → (doc_id, band_id, band_hash), fully vectorized.

    Permutation params build once per worker process (see
    ``minhash_batch``'s process cache — same amortization as an actor pool
    without reserving CPUs, cf. stages/extract.py). Per batch: ONE explode
    of all shingle sets, ONE SipHash of the exploded column, one universal-
    hash matrix, per-doc signature via ``np.minimum.reduceat`` over row
    segments, band hashes via the numeric splitmix combiner — zero
    per-document Python."""

    def __init__(self) -> None:
        self.a, self.b = _minhash_params()

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """Single-doc signature (kept for tests/direct use)."""
        if len(shingle_hashes) == 0:
            return np.full(N_PERM, np.iinfo(np.int64).max, dtype=np.int64)
        h = shingle_hashes.astype(np.int64)[:, None]  # (S, 1)
        vals = (self.a[None, :] * h + self.b[None, :]) % MH_P  # (S, P)
        return vals.min(axis=0)

    def __call__(self, t: pd.DataFrame) -> pd.DataFrame:
        sh_lists = t["text"].map(lambda x: list(set(_shingles(x))))
        lens = sh_lists.str.len().to_numpy(np.int64)
        # shingle-less docs emit NO bands: they cannot be near-dups, and an
        # all-sentinel signature would collide every empty doc into every
        # band bucket (a planted quadratic hot key)
        nz = lens > 0
        n = int(nz.sum())
        if n == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "band_id": pd.Series(dtype="int32"),
                 "band_hash": pd.Series(dtype="int64")}
            )
        from .text import poly_hash

        flat = pd.Series(np.concatenate(sh_lists[nz].to_numpy()), dtype="object")
        hs = poly_hash(flat, mod=MH_P)
        vals = (self.a[None, :] * hs[:, None] + self.b[None, :]) % MH_P
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=starts[1:])
        sigs = np.minimum.reduceat(vals, starts, axis=0)
        per_band = sigs.reshape(n, N_BANDS, N_PERM // N_BANDS)
        band_hash = mix_ids(
            *[per_band[:, :, r].ravel() for r in range(per_band.shape[2])]
        )
        return pd.DataFrame(
            {
                "doc_id": np.repeat(t["doc_id"].to_numpy(np.int64)[nz], N_BANDS),
                "band_id": np.tile(np.arange(N_BANDS, dtype=np.int32), n),
                "band_hash": band_hash,
            }
        )


# per-worker-process MinHasher cache (stateless-task amortization)
_PROCESS_MINHASHER: list[MinHasher] = []


def minhash_batch(t: pd.DataFrame) -> pd.DataFrame:
    if not _PROCESS_MINHASHER:
        _PROCESS_MINHASHER.append(MinHasher())
    return _PROCESS_MINHASHER[0](t)


def minhash_lsh_pairs(sf_dir: str):
    """(id_a, id_b): near-dup candidates from MinHash-LSH banding, verified
    with exact shingle Jaccard ≥ 0.5. Sub-quadratic: only bucket-colliding
    pairs are verified. Bit-exact DuckDB oracle: signatures/banding are
    deterministic closed forms over the polynomial shingle hash, so the
    oracle recomputes the same candidates and the same verified pairs;
    tests additionally assert candidates ⊆ exact pairs and recall on
    planted dups.

    Verification is DISTRIBUTED: the candidate-pair set (pair-scale, tiny
    relative to the corpus) broadcasts; shingle rows are re-derived only
    for candidate documents, intersections count in a shingle-bucketed
    shuffle semi-filtered to candidate pairs, and the Jaccard check is a
    vectorized map over pair counts. The documents table is never
    driver-materialized. Returns a Dataset.
    """
    from .agg import empty_safe, hash_agg, hash_groupby

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(minhash_batch, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of any LSH bucket co-locate → vectorized self-merge
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return m[["doc_id_x", "doc_id_y"]].drop_duplicates().rename(
            columns={"doc_id_x": "id_a", "doc_id_y": "id_b"}
        )

    # cross-band duplicate pairs dedup on the DRIVER: the candidate set is
    # pair-scale and broadcasts below anyway, so a second shuffle just to
    # dedupe would pay a whole execution for work the driver does in one
    # drop_duplicates
    candidates = (
        hash_groupby(bands, ["band_id", "band_hash"], bucket_pairs)
        .to_pandas()
        .drop_duplicates(ignore_index=True)
    )
    if candidates.empty:
        from ray.data import from_pandas

        return from_pandas(
            pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64")})
        )

    # broadcast: candidate doc set + sorted candidate pair-key array
    cand_docs = np.union1d(candidates["id_a"].to_numpy(np.int64),
                           candidates["id_b"].to_numpy(np.int64))
    pair_keys = np.sort(mix_ids(candidates["id_a"].to_numpy(np.int64),
                                candidates["id_b"].to_numpy(np.int64)))
    docs_ref = ray.put(cand_docs)
    pairs_ref = ray.put(pair_keys)

    shingled = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: _shingle_rows(t[t["doc_id"].isin(get_broadcast(docs_ref))]),
        batch_format="pandas",
    ).materialize()

    # per-doc sizes FROM the materialized shingle rows (one row per
    # distinct shingle per candidate doc, exactly the |shingles(d)| the
    # Jaccard denominator needs) — no third corpus read; the aggregation
    # runs over cached blocks and its result is candidate-dimension-sized
    sizes_df = shingled.map_batches(
        lambda t: empty_safe(t.groupby("doc_id", as_index=False).size()),
        batch_format="pandas",
    ).to_pandas()
    size_ref = ray.put(
        sizes_df.groupby("doc_id")["size"].sum().to_dict() if len(sizes_df) else {}
    )

    def cand_pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if len(m):
            pk = mix_ids(m["doc_id_x"].to_numpy(np.int64),
                         m["doc_id_y"].to_numpy(np.int64))
            keys = get_broadcast(pairs_ref)
            pos = np.clip(np.searchsorted(keys, pk), 0, len(keys) - 1)
            m = m[keys[pos] == pk]  # semi-filter to candidate pairs only
        pc = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        return pc.rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b", "size": "ninter"})

    # the per-bucket intersection partials are CANDIDATE-PAIR-scale (each
    # pair contributes at most one row per shingle bucket it shares) — the
    # final merge + Jaccard verify runs on the driver instead of paying a
    # whole second shuffle execution for a dimension-sized reduction
    partials = hash_groupby(shingled, "shingle", cand_pairs_in_bucket).to_pandas()
    from ray.data import from_pandas

    if partials.empty:
        return from_pandas(
            pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64")})
        )
    t = partials.groupby(["id_a", "id_b"], as_index=False)["ninter"].sum()
    szs = ray.get(size_ref)
    na = t["id_a"].map(szs).fillna(0).to_numpy(np.int64)
    nb = t["id_b"].map(szs).fillna(0).to_numpy(np.int64)
    inter = t["ninter"].to_numpy(np.int64)
    union = na + nb - inter
    j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    keep = t[j >= JACCARD_THRESHOLD][["id_a", "id_b"]].astype("int64")
    return from_pandas(keep.reset_index(drop=True))


def dedup_keep_list(sf_dir: str):
    """(doc_id, keep) — the END-TO-END dedup policy: near-dup pairs
    (exact n-gram Jaccard ≥ 0.5, stop-shingle-capped) → connected
    components (the engine's union-find) → keep = component representative
    (MIN doc_id) or any doc in no component. The full
    candidate→verify→cluster→select flow a training-data pipeline runs;
    each stage is the already-oracled operator, and the composition has
    its own recursive-CTE oracle.

    Scale shape: pair volume is duplicate-scale (≪ corpus), so the
    component map broadcasts; the corpus-scale doc list streams through a
    vectorized membership probe."""
    from .cc import canonical_map

    pairs = ngram_jaccard_pairs(sf_dir).map_batches(
        lambda t: t.rename(columns={"id_a": "a", "id_b": "b"}),
        batch_format="pandas",
    )
    cm = canonical_map(pairs)  # DataFrame(node, component) — dup-scale
    if len(cm):
        nodes = cm["node"].to_numpy(np.int64)
        comps = cm["component"].to_numpy(np.int64)
        keep_mask = nodes == comps
        drop_sorted = np.sort(nodes[~keep_mask])
    else:
        drop_sorted = np.empty(0, np.int64)
    dref = ray.put(drop_sorted)

    def flag(t: pd.DataFrame) -> pd.DataFrame:
        drops = get_broadcast(dref)
        ids_v = t["doc_id"].to_numpy(np.int64)
        if len(drops):
            pos = np.clip(np.searchsorted(drops, ids_v), 0, len(drops) - 1)
            keep = drops[pos] != ids_v
        else:
            keep = np.ones(len(ids_v), dtype=bool)
        return pd.DataFrame({"doc_id": ids_v, "keep": keep})

    return _read_docs(sf_dir, ["doc_id"]).map_batches(flag, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash banded near-dup pairs
# ---------------------------------------------------------------------------

SIMHASH_BANDS = 4  # 4 × 16-bit bands over the 64-bit fingerprint
SIMHASH_MAX_HAMMING = 3  # pigeonhole: ham ≤ bands-1 ⇒ ≥1 band identical
SIMHASH_MAX_BUCKET = 2000  # hot-band cap (the MAX_DF discipline): a band
# value shared by B docs emits B² pairs from ONE bucket — cap and move on
# (an all-identical-boilerplate corpus is exact-dedup's job, not simhash's)

_POP8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (numpy<2 has no
    bitwise_count): byte-view + 256-entry table."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(
        axis=1, dtype=np.int64
    )


def simhash_pairs(sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING):
    """(id_a, id_b, hamming) — SimHash near-duplicate pairs with Hamming
    distance ≤ ``max_hamming``, via banded bucketing: the 64-bit
    fingerprint (text.simhash64, SQL-expressible dual polynomial hash)
    splits into ``SIMHASH_BANDS`` 16-bit bands; docs sharing any band
    value co-locate in one bucketed shuffle and verify the full Hamming
    distance in-bucket. For ``max_hamming ≤ SIMHASH_BANDS - 1`` the
    banding is EXACT by pigeonhole (≤3 differing bits can corrupt at most
    3 of the 4 bands), so the result equals the all-pairs answer — the
    property `test_simhash_pairs_equals_bruteforce` pins.

    Scale shape: candidate generation is one (band, value)-bucketed
    exchange (the SimHash analog of `minhash_lsh_pairs`' LSH banding);
    per-bucket fan-out is capped at ``SIMHASH_MAX_BUCKET`` docs; only
    pair-scale rows reach the driver for the final cross-band dedupe."""
    from ray.data import from_pandas

    from .agg import empty_safe, hash_groupby
    from .text import simhash64

    sigs = simhash64(sf_dir)

    def band_rows(t: pd.DataFrame) -> pd.DataFrame:
        sim = np.ascontiguousarray(t["simhash"].to_numpy(np.int64)).view(np.uint64)
        n = len(t)
        parts = [
            pd.DataFrame({
                "band": np.full(n, b, np.int8),
                "val": ((sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32),
                "doc_id": t["doc_id"].to_numpy(np.int64),
                "sim": sim.view(np.int64),
            })
            for b in range(SIMHASH_BANDS)
        ]
        return pd.concat(parts, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "hamming": pd.Series(dtype="int64")})
        sz = g.groupby(["band", "val"])["doc_id"].transform("size")
        g = g[(sz > 1) & (sz <= SIMHASH_MAX_BUCKET)]
        if not len(g):
            return empty_safe(empty)
        m = g.merge(g, on=["band", "val"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return empty_safe(empty)
        ham = _popcount64(
            np.ascontiguousarray(m["sim_x"].to_numpy(np.int64)).view(np.uint64)
            ^ np.ascontiguousarray(m["sim_y"].to_numpy(np.int64)).view(np.uint64)
        )
        m = m[ham <= max_hamming]
        out = pd.DataFrame({
            "id_a": m["doc_id_x"].to_numpy(np.int64),
            "id_b": m["doc_id_y"].to_numpy(np.int64),
            "hamming": ham[ham <= max_hamming],
        }).drop_duplicates(["id_a", "id_b"])
        return empty_safe(out)

    pairs = (
        hash_groupby(
            sigs.map_batches(band_rows, batch_format="pandas"),
            ["band", "val"],
            bucket_pairs,
        )
        .to_pandas()  # pair-scale: cross-band dedupe on the driver
        .drop_duplicates(["id_a", "id_b"])
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    if pairs.empty:
        pairs = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "hamming": pd.Series(dtype="int64")})
    return from_pandas(pairs.astype({"id_a": "int64", "id_b": "int64",
                                     "hamming": "int64"}))


# ---------------------------------------------------------------------------
# Exact substring duplication (position-level, Lee et al. 2022 style)
# ---------------------------------------------------------------------------

SPAN_K = 5  # word k-gram width for duplicated-span detection


def _span_gram_rows(t: pd.DataFrame):
    """(doc_id, h, cnt): per-document POSITION counts of each word
    ``SPAN_K``-gram's polynomial hash. Unlike :func:`_shingle_rows` this
    keeps multiplicity — the metric is the fraction of token positions
    sitting inside a cross-document duplicated span, so every position
    counts. Each document lives in exactly one input row, so the
    per-(doc, h) rows this batch emits are globally unique — downstream
    aggregations never need a doc-level combine."""
    from .agg import empty_safe
    from .text import poly_hash

    k = SPAN_K

    def grams(x):
        toks = (x or "").split(" ")
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    ex = (
        pd.DataFrame({"doc_id": t["doc_id"], "gram": t["text"].map(grams)})
        .explode("gram")
        .dropna()
    )
    if not len(ex):
        return empty_safe(
            pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "h": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            })
        )
    ex = ex.reset_index(drop=True)
    ex["h"] = poly_hash(ex["gram"])
    out = (
        ex.groupby(["doc_id", "h"], as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
    )
    return out.astype({"doc_id": "int64", "h": "int64", "cnt": "int64"})


def exact_span_stats(sf_dir: str, k: int = SPAN_K):
    """(doc_id, n_grams, dup_grams): per-document duplicated-span signal —
    of the ``n_grams`` word-``k``-gram positions in the document, how many
    (``dup_grams``) have a k-gram that also occurs in at least one OTHER
    document. dup_grams/n_grams is the memorization-risk fraction of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2022, ExactSubstr) — the sub-document EXACT mode the rest of the
    dedup family (doc-level exact, MinHash/SimHash/Jaccard near-dup)
    doesn't cover.

    Scale shape: gram rows are token-scale but carry only (int64 doc,
    int64 hash, int64 cnt); ONE gram-hash-keyed bucket exchange computes
    cross-doc document frequency and folds it to per-(bucket, doc)
    partials in the same task (no pair enumeration — work is linear in
    gram rows even for stop-grams shared by millions of docs). The
    n_grams side needs no exchange at all (each doc is in exactly one
    batch), so its rows UNION with the dup partials — same 3-column
    schema, n_grams/dup_grams zero on the other side — and ONE doc-keyed
    combine sums both facets (no join; a typed-empty partial stream is
    just absorbed). Counts stay integers end-to-end so the DuckDB oracle
    is bit-exact."""
    from .agg import empty_safe, hash_agg, hash_groupby

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    grams = ds.map_batches(_span_gram_rows, batch_format="pandas")

    def dup_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["doc_id"].transform("nunique")
        d = g[nd.ge(2)]
        out = d.groupby("doc_id", as_index=False).agg(dup_grams=("cnt", "sum"))
        out.insert(1, "n_grams", np.int64(0))
        return empty_safe(
            out.astype({"doc_id": "int64", "n_grams": "int64", "dup_grams": "int64"})
        )

    # materialize the doc-scale partials: unioning a stream that CONTAINS
    # its own Sort into a second Sort makes Ray chain both all-to-alls in
    # one DAG (measured 14.3 s vs 5.7 s at sf0.1, ds.stats() pins the
    # fused Sort at 13.97 s); the partials are aggregate-scale (≤ buckets
    # × docs rows of 3 int64s — the ngram_jaccard `shingled.materialize()`
    # precedent is token-scale, far larger), the docs read itself stays
    # streaming
    dup_partials = hash_groupby(grams, "h", dup_in_bucket).materialize()

    def totals(t: pd.DataFrame) -> pd.DataFrame:
        n = (t["text"].fillna("").str.split(" ").str.len() - k + 1).clip(lower=0)
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(np.int64),
            "n_grams": n.to_numpy(np.int64),
            "dup_grams": np.zeros(len(t), np.int64),
        })

    return hash_agg(
        ds.map_batches(totals, batch_format="pandas").union(dup_partials),
        "doc_id",
        n_grams=("n_grams", "sum"),
        dup_grams=("dup_grams", "sum"),
    )


def _span_pos_rows(t: pd.DataFrame):
    """(doc_id, p, h): every word-``SPAN_K``-gram POSITION (0-based token
    index of the gram's first word) with its polynomial hash — the
    position-preserving sibling of :func:`_span_gram_rows` that
    :func:`dup_spans` needs to reconstruct maximal duplicated runs."""
    from .agg import empty_safe
    from .text import poly_hash

    k = SPAN_K

    def grams(x):
        toks = (x or "").split(" ")
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    ex = (
        pd.DataFrame({"doc_id": t["doc_id"], "gram": t["text"].map(grams)})
        .explode("gram")
        .dropna()
    )
    if not len(ex):
        return empty_safe(
            pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "p": pd.Series(dtype="int64"),
                "h": pd.Series(dtype="int64"),
            })
        )
    # explode preserves per-doc order, so the within-doc running index IS
    # the gram's 0-based start position
    p = ex.groupby(level=0).cumcount().to_numpy(np.int64)
    ex = ex.reset_index(drop=True)
    return pd.DataFrame({
        "doc_id": ex["doc_id"].to_numpy(np.int64),
        "p": p,
        "h": poly_hash(ex["gram"]),
    })


def dup_spans(sf_dir: str, k: int = SPAN_K):
    """(doc_id, start, length): MAXIMAL duplicated token runs per document
    — the spans ExactSubstr dedup (Lee et al. 2022) would actually cut. A
    gram position is duplicated when its k-gram occurs in ≥2 distinct
    docs (:func:`exact_span_stats`); each such position covers tokens
    [p, p+k-1]; overlapping/contiguous covers merge into maximal spans.

    Scale shape: same gram-hash bucket exchange as exact_span_stats but
    position-preserving; the surviving duplicated POSITIONS (token-scale
    worst case — the shingled-materialize precedent) materialize, then
    ONE doc-keyed exchange merges runs per doc. The merge is vectorized
    gaps-and-islands: sorted by (doc, p), with every cover the same
    length k, a new island starts exactly when p jumps by more than k —
    the same arithmetic the SQL oracle states with window functions."""
    from .agg import empty_safe, hash_groupby

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    pos = ds.map_batches(_span_pos_rows, batch_format="pandas")

    def dup_pos_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["doc_id"].transform("nunique")
        out = g.loc[nd.ge(2), ["doc_id", "p"]]
        return empty_safe(out.astype({"doc_id": "int64", "p": "int64"}))

    dup_positions = hash_groupby(pos, "h", dup_pos_in_bucket).materialize()

    def merge_runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "p"])
        doc = g["doc_id"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        brk = np.ones(len(g), bool)
        if len(g) > 1:
            brk[1:] = (doc[1:] != doc[:-1]) | (p[1:] > p[:-1] + k)
        grp = np.cumsum(brk)
        f = pd.DataFrame({"doc_id": doc, "p": p, "grp": grp})
        spans = f.groupby(["doc_id", "grp"], as_index=False).agg(
            start=("p", "min"), last=("p", "max")
        )
        return empty_safe(pd.DataFrame({
            "doc_id": spans["doc_id"].to_numpy(np.int64),
            "start": spans["start"].to_numpy(np.int64),
            "length": (spans["last"] - spans["start"] + k).to_numpy(np.int64),
        }))

    return hash_groupby(dup_positions, "doc_id", merge_runs)


def cut_dup_spans(sf_dir: str, k: int = SPAN_K):
    """(doc_id, clean_text): the document with every maximal duplicated
    span (:func:`dup_spans`) removed — the APPLIED ExactSubstr cut, i.e.
    the cleaned training corpus rather than a report about it.

    Scale shape: spans are span-scale (≪ doc-scale rows, int64 triples);
    they flow into ONE doc-keyed bucket exchange TAGGED alongside the
    corpus rows (the entity_stats union pattern), so the cut happens
    in-bucket with both sides co-located — no broadcast of a
    corpus-growing table, no driver collect. Token removal is a
    vectorized boolean mask per doc."""
    from .agg import empty_safe, hash_groupby

    # span-scale (tiny int64 triples); materializing also keeps dup_spans'
    # terminal Sort out of the exchange below (the chained-sort lesson)
    spans = dup_spans(sf_dir, k).materialize()

    def span_rows(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["text"] = None
        return t[["doc_id", "start", "length", "text"]]

    def doc_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(np.int64),
            "start": np.full(len(t), -1, np.int64),
            "length": np.zeros(len(t), np.int64),
            "text": t["text"].fillna("").to_numpy(object),
        })

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    tagged = ds.map_batches(doc_rows, batch_format="pandas").union(
        spans.map_batches(span_rows, batch_format="pandas")
    )

    def cut_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["start"].eq(-1)]
        sp = g[g["start"].ge(0)]
        cuts = {
            d: list(zip(s["start"], s["length"]))
            for d, s in sp.groupby("doc_id")
        } if len(sp) else {}
        out_ids, out_txt = [], []
        for d, text in zip(docs["doc_id"].to_numpy(np.int64),
                           docs["text"].to_numpy(object)):
            toks = (text or "").split(" ")
            cut = cuts.get(d)
            if cut:
                keep = np.ones(len(toks), bool)
                for s, ln in cut:
                    keep[s : s + ln] = False
                toks = [t for t, kf in zip(toks, keep) if kf]
            out_ids.append(d)
            out_txt.append(" ".join(toks))
        return empty_safe(pd.DataFrame({
            "doc_id": np.asarray(out_ids, np.int64),
            "clean_text": np.asarray(out_txt, object),
        }))

    return hash_groupby(tagged, "doc_id", cut_in_bucket)


def turn_dup_span_stats(sf_dir: str, k: int = SPAN_K):
    """(conv_id, turn_idx, n_grams, dup_grams): the ExactSubstr signal on
    the FLAGSHIP transcript payload — per turn, how many word-k-gram
    positions carry a gram that also appears in at least one OTHER
    conversation. Cross-conversation (not cross-turn) duplication is the
    interesting unit for agent transcripts: repeated boilerplate inside
    one conversation is normal structure, the same span recurring across
    conversations is a template / memorization signal the KG's dataflow
    queries can then treat as low-information text.

    Same two-exchange shape as :func:`exact_span_stats` (gram-hash bucket
    exchange → tagged union with the exchange-free n_grams side → one
    turn-keyed combine), keyed on (conv_id, turn_idx)."""
    from ..sources.transcripts import read_transcripts
    from .agg import empty_safe, hash_agg, hash_groupby
    from .text import poly_hash

    def gram_rows(t: pd.DataFrame):
        def grams(x):
            toks = (x or "").split(" ")
            return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

        ex = (
            pd.DataFrame({
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "gram": t["text"].map(grams),
            })
            .explode("gram")
            .dropna(subset=["gram"])
        )
        if not len(ex):
            return empty_safe(
                pd.DataFrame({
                    "conv_id": pd.Series(dtype="object"),
                    "turn_idx": pd.Series(dtype="int32"),
                    "h": pd.Series(dtype="int64"),
                    "cnt": pd.Series(dtype="int64"),
                })
            )
        ex = ex.reset_index(drop=True)
        ex["h"] = poly_hash(ex["gram"])
        out = (
            ex.groupby(["conv_id", "turn_idx", "h"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out.astype({"h": "int64", "cnt": "int64"})

    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
    grams = ds.map_batches(gram_rows, batch_format="pandas")

    def dup_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nc = g.groupby("h")["conv_id"].transform("nunique")
        d = g[nc.ge(2)]
        out = d.groupby(["conv_id", "turn_idx"], as_index=False).agg(
            dup_grams=("cnt", "sum")
        )
        out.insert(2, "n_grams", np.int64(0))
        return empty_safe(
            out.astype({"turn_idx": "int32", "n_grams": "int64",
                        "dup_grams": "int64"})
        )

    # turn-scale partials; the materialize splits the chained-sort DAG
    # (see exact_span_stats)
    dup_partials = hash_groupby(grams, "h", dup_in_bucket).materialize()

    def totals(t: pd.DataFrame) -> pd.DataFrame:
        n = (t["text"].fillna("").str.split(" ").str.len() - k + 1).clip(lower=0)
        return pd.DataFrame({
            "conv_id": t["conv_id"].to_numpy(object),
            "turn_idx": t["turn_idx"].astype("int32").to_numpy(np.int32),
            "n_grams": n.to_numpy(np.int64),
            "dup_grams": np.zeros(len(t), np.int64),
        })

    return hash_agg(
        ds.map_batches(totals, batch_format="pandas").union(dup_partials),
        ["conv_id", "turn_idx"],
        n_grams=("n_grams", "sum"),
        dup_grams=("dup_grams", "sum"),
    )
