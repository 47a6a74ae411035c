"""Similarity search over the embeddings table (list<float> column).

* ``knn_bruteforce`` — exact top-k cosine: the query matrix is broadcast
  (``ray.put`` once), each batch does one float64 matmul against it and
  emits its local top-k per query; a tiny global merge finishes. This is
  the 'broadcast small side + per-batch numpy kernel' baseline.
* ``knn_lsh`` — the scale path: random-hyperplane signatures bucket the
  corpus; only same-bucket (plus probing neighbors) candidates are scored.
* ``embedding_dups`` — near-duplicate pairs by cosine ≥ threshold (exact,
  SQL-oracled).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .joins import get_broadcast

N_QUERIES = 5
KNN_K = 5
# chosen from the corpus cosine distribution (max pairwise ≈ 0.51): high
# enough to be "near-dup", low enough that the operator has output to check
DUP_COS_THRESHOLD = 0.45
LSH_BITS = 8


def _read_emb(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def _matrix(t: pd.DataFrame) -> np.ndarray:
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _query_matrix(sf_dir: str):
    q = (
        _read_emb(sf_dir)
        .filter(expr=f"vec_id < {N_QUERIES}")
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    return q["vec_id"].to_numpy(np.int64), _matrix(q)


def knn_bruteforce(sf_dir: str):
    """(query_id, rank, neighbor_id) — exact cosine top-k per query vector.

    Per-batch local top-k (numpy matmul against the broadcast query matrix)
    → global merge of ≤ k·n_batches candidate rows. The corpus is never
    materialized; only candidates move."""
    qids, qmat = _query_matrix(sf_dir)
    ref = ray.put((qids, qmat))

    def local_topk(t: pd.DataFrame) -> pd.DataFrame:
        qids_, qmat_ = get_broadcast(ref)
        m = _matrix(t)
        ids = t["vec_id"].to_numpy(np.int64)
        sims = m @ qmat_.T  # (batch, n_queries)
        out = []
        for j, qid in enumerate(qids_):
            col = sims[:, j]
            mask = ids != qid  # exclude self
            cids, csims = ids[mask], col[mask]
            take = min(KNN_K, len(cids))
            if take == 0:
                continue
            # partial selection then deterministic (-sim, id) order
            part = np.argpartition(-csims, take - 1)[:take]
            order = np.lexsort((cids[part], -csims[part]))
            sel = part[order]
            out.append(
                pd.DataFrame(
                    {"query_id": qid, "neighbor_id": cids[sel], "cos": csims[sel]}
                )
            )
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(KNN_K)
        return pd.DataFrame(
            {"query_id": g["query_id"].to_numpy(np.int64),
             "rank": np.arange(1, len(g) + 1, dtype=np.int64),
             "neighbor_id": g["neighbor_id"].to_numpy(np.int64)}
        )

    return (
        _read_emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pandas")
        .groupby("query_id")
        .map_groups(global_topk, batch_format="pandas")
    )


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(1234)
    return rng.normal(size=(LSH_BITS, dim))


def knn_lsh(sf_dir: str):
    """(query_id, rank, neighbor_id) — approximate top-k via random-
    hyperplane LSH: score only vectors whose signature is within Hamming
    distance 1 of the query signature (bucket + probing). No SQL oracle
    (approximate); tests assert recall ≥ 0.6 vs brute force on this corpus.
    """
    qids, qmat = _query_matrix(sf_dir)
    planes = _hyperplanes(qmat.shape[1])
    qsig = (qmat @ planes.T > 0).astype(np.uint8)
    qbits = np.packbits(qsig, axis=1, bitorder="little")[:, 0]
    ref = ray.put((qids, qmat, planes, qbits))

    def local_candidates(t: pd.DataFrame) -> pd.DataFrame:
        qids_, qmat_, planes_, qbits_ = get_broadcast(ref)
        m = _matrix(t)
        ids = t["vec_id"].to_numpy(np.int64)
        sig = (m @ planes_.T > 0).astype(np.uint8)
        bits = np.packbits(sig, axis=1, bitorder="little")[:, 0]
        sims = m @ qmat_.T
        out = []
        for j, qid in enumerate(qids_):
            ham = np.unpackbits(bits ^ qbits_[j], bitorder="little").reshape(len(bits), -1).sum(axis=1)
            mask = (ham <= 1) & (ids != qid)
            if not mask.any():
                continue
            out.append(pd.DataFrame({"query_id": qid, "neighbor_id": ids[mask], "cos": sims[mask, j]}))
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(KNN_K)
        return pd.DataFrame(
            {"query_id": g["query_id"].to_numpy(np.int64),
             "rank": np.arange(1, len(g) + 1, dtype=np.int64),
             "neighbor_id": g["neighbor_id"].to_numpy(np.int64)}
        )

    return (
        _read_emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(local_candidates, batch_format="pandas")
        .groupby("query_id")
        .map_groups(global_topk, batch_format="pandas")
    )


def embedding_dups(sf_dir: str):
    """(id_a, id_b) — exact near-duplicate pairs with cosine ≥ 0.9.

    Here the corpus side is broadcast once and every batch matmuls against
    it (O(n·batch) flops, zero shuffle). At 10^9+ vectors this flips to the
    LSH-bucketed pair generation of ``knn_lsh``."""
    full = _read_emb(sf_dir, ["vec_id", "embedding"]).to_pandas()
    fids = full["vec_id"].to_numpy(np.int64)
    fmat = _matrix(full)
    ref = ray.put((fids, fmat))

    def pairs(t: pd.DataFrame) -> pd.DataFrame:
        fids_, fmat_ = get_broadcast(ref)
        m = _matrix(t)
        ids = t["vec_id"].to_numpy(np.int64)
        sims = m @ fmat_.T
        ia, ib = np.where(sims >= DUP_COS_THRESHOLD)
        left, right = ids[ia], fids_[ib]
        mask = left < right  # dedup + drop self
        return pd.DataFrame({"id_a": left[mask], "id_b": right[mask]})

    out = _read_emb(sf_dir, ["vec_id", "embedding"]).map_batches(
        pairs, batch_format="pandas"
    ).to_pandas()
    if out.empty:  # keep the schema even when no pair crosses the threshold
        out = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                            "id_b": pd.Series(dtype="int64")})
    return out
