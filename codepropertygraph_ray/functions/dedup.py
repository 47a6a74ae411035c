"""Near-duplicate detection over the documents table.

The large-scale-training-pipeline dedup family:

* exact dedup — see ``relational.dedup_docs_exact`` (NodeFilter analog);
* **n-gram Jaccard** — exact set-similarity pairs via a shingle-inverted
  index (explode → co-occurrence groupby → pair counts), SQL-oracled;
* **MinHash + LSH** — the scale path: per-doc minhash signature (vectorized
  universal hashing over shingle hashes), banded into LSH buckets, bucket
  groupby emits candidate pairs, candidates verified with exact Jaccard.
  At 100 TB the verify step joins shingle sets; here the doc side is
  broadcast (documents is a dimension-sized table in this corpus).

All hashes derive from the repo's keyed SipHash (ids.py) — deterministic
across runs/parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..ids import hash_series
from .joins import get_broadcast

SHINGLE_W = 3  # word shingle width
JACCARD_THRESHOLD = 0.5

N_PERM = 64  # minhash permutations
N_BANDS = 16  # → 4 rows per band
_MERSENNE = np.uint64((1 << 61) - 1)


def _read_docs(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _shingles(text: str) -> list[str]:
    toks = (text or "").split(" ")
    if len(toks) < SHINGLE_W:
        return []  # matches the SQL oracle's empty generate_series
    return [" ".join(toks[i : i + SHINGLE_W]) for i in range(len(toks) - SHINGLE_W + 1)]


def _shingle_rows(t: pd.DataFrame) -> pd.DataFrame:
    sh = t["text"].map(lambda x: sorted(set(_shingles(x))))
    exploded = pd.DataFrame({"doc_id": t["doc_id"], "shingle": sh}).explode("shingle")
    return exploded.dropna().reset_index(drop=True)


def ngram_jaccard_pairs(sf_dir: str):
    """(id_a, id_b): document pairs with word-3-gram Jaccard ≥ 0.5.

    Exact algorithm via inverted index: explode distinct shingles, groupby
    shingle → pairwise co-occurrences, sum per pair → |A∩B|, then
    J = inter / (|A| + |B| - inter). The per-shingle pair fan-out is the
    skew hazard; a stop-shingle cap (drop shingles in > MAX_DF docs) bounds
    it — the salting/cap discipline of SURVEY.md §7.4."""
    from .agg import hash_agg, hash_groupby

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    shingled = ds.map_batches(_shingle_rows, batch_format="pandas")

    # |A| per doc (broadcast — dimension-sized)
    sizes = hash_agg(
        shingled.map_batches(
            lambda t: t.groupby("doc_id", as_index=False).agg(n=("shingle", "size")),
            batch_format="pandas",
        ),
        "doc_id",
        n=("n", "sum"),
    ).to_pandas()
    size_ref = ray.put(dict(zip(sizes["doc_id"], sizes["n"])))

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a shingle co-locate → vectorized self-merge
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
    rng = np.random.RandomState(42)
    a = rng.randint(1, (1 << 61) - 1, size=N_PERM).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=N_PERM).astype(np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: documents batch → (doc_id, band_id, band_hash).

    Permutation params are built once per actor (``__init__``), the batch
    body is a vectorized universal-hash min-reduce."""

    def __init__(self) -> None:
        self.a, self.b = _minhash_params()

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(N_PERM, np.iinfo(np.int64).max, dtype=np.uint64)
        h = shingle_hashes.astype(np.uint64)[:, None]  # (S, 1)
        vals = (self.a[None, :] * h + self.b[None, :]) % _MERSENNE  # (S, P)
        return vals.min(axis=0)

    def __call__(self, t: pd.DataFrame) -> pd.DataFrame:
        rows_doc, rows_band, rows_hash = [], [], []
        for doc_id, text in zip(t["doc_id"], t["text"]):
            sh = list(set(_shingles(text)))
            hs = hash_series([pd.Series(sh)]).astype(np.uint64) if sh else np.array([], dtype=np.uint64)
            sig = self.signature(hs)
            per_band = sig.reshape(N_BANDS, -1)
            bh = hash_series([pd.Series([",".join(map(str, row)) for row in per_band])])
            rows_doc.extend([doc_id] * N_BANDS)
            rows_band.extend(range(N_BANDS))
            rows_hash.extend(bh)
        return pd.DataFrame(
            {"doc_id": np.array(rows_doc, dtype=np.int64),
             "band_id": np.array(rows_band, dtype=np.int32),
             "band_hash": np.array(rows_hash, dtype=np.int64)}
        )


def minhash_lsh_pairs(sf_dir: str):
    """(id_a, id_b): near-dup candidates from MinHash-LSH banding, verified
    with exact shingle Jaccard ≥ 0.5. Sub-quadratic: only bucket-colliding
    pairs are verified. (No SQL oracle — probabilistic recall; tests assert
    candidates ⊆ exact pairs after verification and recall on planted dups.)
    """
    from .agg import hash_agg, hash_groupby

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(MinHasher, batch_format="pandas", concurrency=2)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of any LSH bucket co-locate → vectorized self-merge
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return m[["doc_id_x", "doc_id_y"]].drop_duplicates().rename(
            columns={"doc_id_x": "id_a", "doc_id_y": "id_b"}
        )

    candidates = (
        hash_agg(
            hash_groupby(bands, ["band_id", "band_hash"], bucket_pairs),
            ["id_a", "id_b"],
            _n=("id_a", "size"),  # distinct pairs across bands
        )
        .drop_columns(["_n"])
        .to_pandas()
    )

    # exact-Jaccard verification (broadcast shingle sets — dimension-sized
    # here; at corpus scale this becomes a join against the shingle table)
    docs = _read_docs(sf_dir, ["doc_id", "text"]).to_pandas()
    sets = {d: set(_shingles(x)) for d, x in zip(docs["doc_id"], docs["text"])}
    keep = []
    for ia, ib in zip(candidates["id_a"], candidates["id_b"]):
        sa, sb = sets[ia], sets[ib]
        if sa or sb:
            j = len(sa & sb) / len(sa | sb)
            if j >= JACCARD_THRESHOLD:
                keep.append((ia, ib))
    return pd.DataFrame(keep, columns=["id_a", "id_b"]).astype("int64")
