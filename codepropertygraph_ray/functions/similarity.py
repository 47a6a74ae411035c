"""Similarity search over the embeddings table (list<float> column).

* ``knn_bruteforce`` — exact top-k cosine: the query matrix is broadcast
  (``ray.put`` once), each batch does one float64 matmul against it and
  emits its local top-k per query; a tiny global merge finishes. This is
  the 'broadcast small side + per-batch numpy kernel' baseline.
* ``knn_lsh`` — the scale path: random-hyperplane signatures bucket the
  corpus; only same-bucket (plus probing neighbors) candidates are scored.
* ``knn_ivf`` — the other classic scale path: a broadcast k-means codebook
  assigns each vector to an inverted list; queries scan only their
  ``nprobe`` nearest lists.
* ``embedding_dups`` — near-duplicate pairs by cosine ≥ threshold (exact,
  SQL-oracled).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .agg import empty_safe
from .joins import get_broadcast

N_QUERIES = 5
KNN_K = 5
# chosen from the corpus cosine distribution (max pairwise ≈ 0.51): high
# enough to be "near-dup", low enough that the operator has output to check
DUP_COS_THRESHOLD = 0.45
LSH_BITS = 8


def _read_emb(sf_dir: str, columns=None):
    from ..sources.tables import read_table

    return read_table(f"{sf_dir}/embeddings.parquet", columns=columns)


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


MUTUAL_K = 3  # reciprocal-neighbor rank cutoff
MUTUAL_Q = 1000  # fixed-point units per unit-vector coordinate


def _qunit(t: pd.DataFrame) -> np.ndarray:
    """Unit-normalize then quantize to ``MUTUAL_Q`` fixed-point int64 units
    (half-up floor). Integer dot products of these are EXACT under any
    summation order — float cosine is not: the corpus contains exact
    duplicate vectors, so rank ties at the k-th position are real, and a
    float matmul's last-ulp summation-order noise (which varies with the
    bucket's matrix shape) would break them differently per bucket."""
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n[n == 0] = 1e-30
    return np.floor(m / n * MUTUAL_Q + 0.5).astype(np.int64)


def mutual_knn(sf_dir: str, k: int = MUTUAL_K):
    """(id_a, id_b) — reciprocal nearest neighbors: unordered pairs where
    each vector ranks in the OTHER's top-``MUTUAL_K`` by quantized-cosine
    (integer dot of ``_qunit`` vectors; ties broken by lower id). The
    mutual-kNN criterion is the classic high-precision near-dup/
    cluster-seed filter — one-directional top-k keeps hub vectors'
    spurious edges, mutuality kills them.

    Distributed shape: the embedding_dups BLOCK-PAIR join (no corpus
    broadcast; each bucket scores side i × side j with one integer matmul)
    emits per-vector LOCAL top-k candidates both ways → a src-keyed bucket
    reduces ≤ k·B candidates per vector to the global top-k → an
    unordered-pair-keyed bucket keeps pairs present in both directions.
    Candidate volume is n·B·k rows; the matmul cost is the inherent O(n²)
    — the sub-quadratic path is knn_lsh/knn_ivf."""
    from ..ids import mix_ids
    from .agg import hash_groupby

    B = _dup_n_blocks()
    ds = _read_emb(sf_dir, ["vec_id", "embedding"])

    def replicate(t: pd.DataFrame) -> pd.DataFrame:
        ids_ = t["vec_id"].to_numpy(np.int64)
        blk = (mix_ids(ids_) % B).astype(np.int64)
        frames = []
        for kk in range(B):
            i = np.minimum(blk, kk)
            j = np.maximum(blk, kk)
            frames.append(pd.DataFrame({
                "pair": i * B + j, "vec_id": ids_, "blk": blk,
                "embedding": t["embedding"].to_numpy(),
            }))
        return pd.concat(frames, ignore_index=True)

    empty = pd.DataFrame({"src": pd.Series(dtype="int64"),
                          "dst": pd.Series(dtype="int64"),
                          "s": pd.Series(dtype="int64")})

    def cand(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty
        i, j = divmod(int(g["pair"].iloc[0]), B)
        # sort by id so sims columns are dst-ascending: a stable argsort on
        # -s then breaks duplicate-vector score ties by LOWEST dst — the
        # same total order as the global reduce and the SQL oracle
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        m = _qunit(g)
        ids_ = g["vec_id"].to_numpy(np.int64)
        blk = g["blk"].to_numpy(np.int64)

        def topk_rows(srcs, dsts, sims, self_mask=False):
            kk = min(k + 1 if self_mask else k, sims.shape[1])
            if kk == 0 or not len(srcs):
                return empty
            part = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
            out = pd.DataFrame({
                "src": np.repeat(srcs, kk),
                "dst": dsts[part.ravel()],
                "s": np.take_along_axis(sims, part, axis=1).ravel(),
            })
            return out[out["src"] != out["dst"]]

        if i == j:
            sims = m @ m.T  # int64: exact under any grouping
            return empty_safe(topk_rows(ids_, ids_, sims, self_mask=True))
        li, ri = blk == i, blk == j
        if not li.any() or not ri.any():
            return empty
        sims = m[li] @ m[ri].T
        return empty_safe(pd.concat(
            [topk_rows(ids_[li], ids_[ri], sims),
             topk_rows(ids_[ri], ids_[li], sims.T)],
            ignore_index=True,
        ))

    cands = (
        ds.map_batches(replicate, batch_format="pandas")
        .groupby("pair")
        .map_groups(cand, batch_format="pandas")
    )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "s", "dst"],
                          ascending=[True, False, True], kind="stable")
        return empty_safe(g.groupby("src").head(k)[["src", "dst"]])

    directed = hash_groupby(cands, "src", global_topk)

    def tag(t: pd.DataFrame) -> pd.DataFrame:
        s = t["src"].to_numpy(np.int64)
        d = t["dst"].to_numpy(np.int64)
        return pd.DataFrame({"lo": np.minimum(s, d), "hi": np.maximum(s, d),
                             "fwd": s < d})

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        piv = g.groupby(["lo", "hi"], as_index=False)["fwd"].nunique()
        kept = piv[piv["fwd"] == 2]
        return empty_safe(pd.DataFrame(
            {"id_a": kept["lo"].to_numpy(np.int64),
             "id_b": kept["hi"].to_numpy(np.int64)}
        ))

    return hash_groupby(
        directed.map_batches(tag, batch_format="pandas"), ["lo", "hi"], mutual
    )


KM_K = 4  # clusters
KM_ITERS = 2  # Lloyd rounds (assignment → centroid update), then final assign
KM_Q = 1000  # fixed-point units per embedding coordinate


def kmeans_clusters(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS):
    """(vec_id, cluster) — deterministic distributed Lloyd's k-means over
    the embedding corpus, ``KM_ITERS`` fixed rounds. Everything the gate
    hashes is integer-exact: coordinates quantize once to ``KM_Q``
    fixed-point units (explicit half-up ``floor(x·Q + 0.5)``, the
    quantize_int8 precedent), distances are all-integer squared-L2 with
    ties broken by lowest cluster id, and centroid updates are element-wise
    FLOOR-division means — so the DuckDB oracle reproduces every argmin
    bit-for-bit. Init = the ``k`` smallest vec_ids (cluster id = 0-based
    seed rank); a cluster that empties drops out on both sides.

    Scale shape: the corpus is never materialized — per-batch matmul
    assignment against the broadcast (k×d) centroid matrix, per-batch
    (cluster, pos) moment partials (k·d rows) → one tiny hash_agg →
    driver rebuilds the k×d centroids; the final labeling streams out as
    a map stage. Iterations cost one corpus scan each."""
    ds = _read_emb(sf_dir, ["vec_id", "embedding"])

    def qmat(t: pd.DataFrame) -> np.ndarray:
        m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        return np.floor(m * KM_Q + 0.5).astype(np.int64)

    def seed_partial(t: pd.DataFrame) -> pd.DataFrame:
        idx = np.argsort(t["vec_id"].to_numpy(np.int64), kind="stable")[:k]
        tt = t.iloc[idx]
        q = qmat(tt)
        return pd.DataFrame({"vec_id": tt["vec_id"].to_numpy(np.int64),
                             "v": list(q)})

    seeds = (
        ds.map_batches(seed_partial, batch_format="pandas")
        .to_pandas().sort_values("vec_id", ignore_index=True).head(k)
    )
    if not len(seeds):
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "cluster": pd.Series(dtype="int64")})
    cent = np.stack(seeds["v"].to_numpy()).astype(np.int64)  # (k', d)
    cl_ids = np.arange(len(cent), dtype=np.int64)
    d = cent.shape[1]

    def assign(x: np.ndarray, c: np.ndarray) -> np.ndarray:
        d2 = (x * x).sum(1)[:, None] - 2 * (x @ c.T) + (c * c).sum(1)[None, :]
        return d2.argmin(axis=1)  # exact ints; argmin tie → lowest index

    from .agg import hash_agg

    for _ in range(iters):
        ref = ray.put((cl_ids, cent))

        def moments(t: pd.DataFrame) -> pd.DataFrame:
            ci, cm = get_broadcast(ref)
            x = qmat(t)
            a = assign(x, cm)
            present = np.unique(a)
            sums = np.empty((len(present), d), dtype=np.int64)
            cnts = np.empty(len(present), dtype=np.int64)
            for j, p in enumerate(present):  # bounded by k, not batch size
                mask = a == p
                sums[j] = x[mask].sum(axis=0)
                cnts[j] = mask.sum()
            return pd.DataFrame({
                "cl": np.repeat(ci[present], d),
                "pos": np.tile(np.arange(1, d + 1, dtype=np.int64),
                               len(present)),
                "s": sums.ravel(),
                "cnt": np.repeat(cnts, d),
            })

        mom = hash_agg(
            ds.map_batches(moments, batch_format="pandas"),
            ["cl", "pos"], s=("s", "sum"), cnt=("cnt", "sum"),
        ).to_pandas()
        mom = mom[mom["cnt"] > 0].sort_values(["cl", "pos"], ignore_index=True)
        cl_ids = np.unique(mom["cl"].to_numpy(np.int64))
        cent = np.floor_divide(
            mom["s"].to_numpy(np.int64).reshape(len(cl_ids), d),
            mom["cnt"].to_numpy(np.int64).reshape(len(cl_ids), d),
        )

    fref = ray.put((cl_ids, cent))

    def label(t: pd.DataFrame) -> pd.DataFrame:
        ci, cm = get_broadcast(fref)
        a = assign(qmat(t), cm)
        return pd.DataFrame({"vec_id": t["vec_id"].to_numpy(np.int64),
                             "cluster": ci[a]})

    return ds.map_batches(label, batch_format="pandas")


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
        # popcount via an 8-bit table: Hamming distance of every row to
        # every query signature in one vectorized shot
        pop = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
        ham = pop[bits[:, None] ^ qbits_[None, :]]  # (batch, n_queries)
        out = []
        for j, qid in enumerate(qids_):
            mask = (ham[:, j] <= 1) & (ids != qid)
            if not mask.any():
                continue
            # score ONLY the bucket survivors — this is where LSH saves
            # compute (one matvec over candidates, not a full matmul)
            cos = m[mask] @ qmat_[j]
            out.append(pd.DataFrame({"query_id": qid, "neighbor_id": ids[mask], "cos": cos}))
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


IVF_N_LISTS = 16
IVF_NPROBE = 4
IVF_TRAIN_MAX = 4096


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic IVF codebook: Lloyd's k-means on a bounded sample.

    The sample is the first ``IVF_TRAIN_MAX`` vec_ids (deterministic, no
    RNG over data order); init = the first vector of each of K strided
    slices. At 100 TB the train set stays bounded — the codebook is
    dimension-sized and broadcasts; only the assignment pass scans the
    corpus."""
    t = (
        _read_emb(sf_dir, ["vec_id", "embedding"])
        .filter(expr=f"vec_id < {IVF_TRAIN_MAX}")
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    m = _matrix(t)
    k = min(IVF_N_LISTS, len(m))
    cent = m[:: max(len(m) // k, 1)][:k].copy()
    for _ in range(10):  # Lloyd iterations on the sample (spherical k-means)
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(k):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def knn_ivf(sf_dir: str):
    """(query_id, rank, neighbor_id) — approximate top-k via IVF: corpus
    vectors assign to their nearest of ``IVF_N_LISTS`` centroids (one
    broadcast codebook, one matmul per batch); each query scores only the
    vectors in its ``IVF_NPROBE`` closest lists. The sub-quadratic scale
    path when queries ≫ LSH probing can serve (the inverted-list scan is
    |corpus|·nprobe/K instead of |corpus|). Approximate — no SQL oracle;
    tests assert recall vs brute force (same discipline as ``knn_lsh``)."""
    qids, qmat = _query_matrix(sf_dir)
    cent = _ivf_centroids(sf_dir)
    nprobe = min(IVF_NPROBE, len(cent))
    # per-query probe set: the nprobe nearest centroid ids
    qprobe = np.argsort(-(qmat @ cent.T), axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((qids, qmat, cent, qprobe))

    def local_candidates(t: pd.DataFrame) -> pd.DataFrame:
        qids_, qmat_, cent_, qprobe_ = get_broadcast(ref)
        m = _matrix(t)
        ids = t["vec_id"].to_numpy(np.int64)
        assign = np.argmax(m @ cent_.T, axis=1)  # inverted-list id per vector
        out = []
        for j, qid in enumerate(qids_):
            mask = np.isin(assign, qprobe_[j]) & (ids != qid)
            if not mask.any():
                continue
            cos = m[mask] @ qmat_[j]  # score only the probed lists
            out.append(pd.DataFrame({"query_id": qid, "neighbor_id": ids[mask], "cos": cos}))
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


def _dup_n_blocks() -> int:
    """Block count B for the block-pair join, scaled to cluster width:
    B(B+1)/2 buckets ≈ 4 × CPUs keeps every core busy without inflating
    replication (each vector ships B copies). Result is exact for ANY B,
    so the env override (GRAFT_DUP_BLOCKS) is a pure tuning knob."""
    import os

    env = os.environ.get("GRAFT_DUP_BLOCKS")
    if env:
        return max(1, int(env))
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, int(np.sqrt(8 * ncpu)))


def embedding_dups(sf_dir: str, threshold: float = DUP_COS_THRESHOLD):
    """(id_a, id_b) — exact near-duplicate pairs with cosine ≥ threshold.

    Distributed BLOCK-PAIR join (the standard exact all-pairs shape):
    vectors hash into B blocks; every unordered block pair (i ≤ j) is one
    shuffle bucket; each vector replicates to exactly B buckets (one per
    partner block). Within a bucket ONE numpy matmul scores side i against
    side j (upper triangle on the diagonal bucket). A pair (x, y) lands in
    exactly the bucket (blk(x), blk(y)) — no cross-bucket duplicates.

    Exact (matches the all-pairs SQL oracle); no full-corpus broadcast and
    no driver materialization — shuffle volume is n·B rows and per-bucket
    memory is 2n/B vectors, so B scales with cluster width (pick
    B ≈ sqrt(#tasks)). The compute is inherently O(n²); the sub-quadratic
    approximate path is the signature bucketing of ``knn_lsh``."""
    from ..ids import mix_ids

    B = _dup_n_blocks()

    def replicate(t: pd.DataFrame) -> pd.DataFrame:
        ids_ = t["vec_id"].to_numpy(np.int64)
        blk = (mix_ids(ids_) % B).astype(np.int64)
        frames = []
        for k in range(B):
            i = np.minimum(blk, k)
            j = np.maximum(blk, k)
            frames.append(
                pd.DataFrame(
                    {
                        "pair": i * B + j,
                        "vec_id": ids_,
                        "blk": blk,
                        "embedding": t["embedding"].to_numpy(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
        )
        if not len(g):
            return empty
        i, j = divmod(int(g["pair"].iloc[0]), B)
        g = g.drop_duplicates("vec_id")
        m = _matrix(g)
        ids_ = g["vec_id"].to_numpy(np.int64)
        blk = g["blk"].to_numpy(np.int64)
        if i == j:
            sims = m @ m.T
            ia, ib = np.where(np.triu(sims >= threshold, k=1))
            left, right = ids_[ia], ids_[ib]
        else:
            li, ri = blk == i, blk == j
            if not li.any() or not ri.any():
                return empty
            sims = m[li] @ m[ri].T
            ia, ib = np.where(sims >= threshold)
            left, right = ids_[li][ia], ids_[ri][ib]
        if not len(left):
            return empty
        return pd.DataFrame(
            {"id_a": np.minimum(left, right), "id_b": np.maximum(left, right)}
        )

    return (
        _read_emb(sf_dir, ["vec_id", "embedding"])
        .map_batches(replicate, batch_format="pandas")
        .groupby("pair")
        .map_groups(score, batch_format="pandas")
    )


def dup_groups(sf_dir: str):
    """Near-duplicate CLUSTERS: connected components over the pair graph.

    ``embedding_dups`` yields pairs; dedup policy needs groups (keep one
    representative per component). The engine's own connected-components
    machinery (`functions/cc.py` — union-find on the driver for small
    graphs, hash-min label propagation for large) canonicalizes each
    component to its MIN vec_id, so the result is deterministic and the
    recursive-CTE oracle can reproduce it exactly. Pair volume is
    vocab-scale (duplicates only), far below corpus scale, so the
    auto-path pick in ``canonical_map`` holds at 100 TB.
    """
    from .cc import canonical_map

    pairs = embedding_dups(sf_dir).map_batches(
        lambda t: t.rename(columns={"id_a": "a", "id_b": "b"}),
        batch_format="pandas",
    )
    out = canonical_map(pairs)
    return out.rename(columns={"node": "vec_id", "component": "group_id"})


QUANT_BITS_MAX = 127  # int8 symmetric quantization range


def quantize_int8(sf_dir: str):
    """(vec_id, sum_qabs, n_sat) — symmetric int8 quantization of every
    embedding (q = floor(x * 127 / max|x| + 0.5), explicit half-up so the
    SQL oracle reproduces it bit-for-bit): the storage-scale path that
    quarters vector bytes before ANN indexing. Output is integer-only
    (sum of |q| + saturation count) so the gate hashes stably.

    Per batch: one matrix op, no Python per row; at 100 TB this is a pure
    map stage (no shuffle), quantized vectors would be written in-task."""
    ds = _read_emb(sf_dir, ["vec_id", "embedding"])

    def quant(t: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        mx = np.maximum(np.abs(m).max(axis=1, keepdims=True), 1e-30)
        q = np.floor(m * 127.0 / mx + 0.5)
        return pd.DataFrame(
            {"vec_id": t["vec_id"].to_numpy(np.int64),
             "sum_qabs": np.abs(q).sum(axis=1).astype(np.int64),
             "n_sat": (np.abs(q) >= QUANT_BITS_MAX).sum(axis=1).astype(np.int64)}
        )

    return ds.map_batches(quant, batch_format="pandas")


# ---------------------------------------------------------------------------
# density-based clustering (DBSCAN over the cosine-threshold graph)
# ---------------------------------------------------------------------------

DBSCAN_COS = 0.35  # eps as a cosine floor (looser than the dup threshold)
DBSCAN_MIN_PTS = 2  # neighbors (excluding self) needed to be a core point


def _sorted_member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership of ``vals`` in a SORTED int64 array — the searchsorted
    probe (no Python sets in hot paths)."""
    if len(sorted_arr) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_arr, vals), 0, len(sorted_arr) - 1)
    return sorted_arr[pos] == vals


def dbscan_embeddings(sf_dir: str):
    """(vec_id, cluster, is_core) — DBSCAN over embeddings: eps-neighbors
    = cosine ≥ ``DBSCAN_COS``, core = ≥ ``DBSCAN_MIN_PTS`` neighbors,
    clusters = connected components of the core-core graph (label = MIN
    core id), border points attach to the MIN cluster among adjacent
    cores, everything else is noise (-1). Deterministic — every tie-break
    is a min — so the SQL oracle reproduces it exactly (the batch
    transposition of the density-clustering family, cf. DISC, ICDE 2021).

    Scale shape: the eps-neighbor pair graph comes from the block-pair
    join (``embedding_dups`` — no corpus broadcast) and is NEVER
    driver-materialized: degrees are a bucketed partial-sum over one
    exploded scan, border attachment is a second scan emitting per-batch
    (non-core, min core-cluster) partials merged by ``hash_agg`` min, and
    only the two dimension-sized maps (sorted core ids + aligned cluster
    labels; border ids + labels) are ``ray.put`` and probed by
    searchsorted in the final streamed membership pass. At loose eps the
    pair list is far larger than the point dimension — every per-pair step
    must stay distributed, only per-point results may drive."""
    from .agg import hash_agg
    from .cc import canonical_map

    # one execution of the block-pair join; three consumers read its blocks
    pairs = embedding_dups(sf_dir, threshold=DBSCAN_COS).materialize()

    def explode_deg(t: pd.DataFrame) -> pd.DataFrame:
        ids_ = np.concatenate(
            [t["id_a"].to_numpy(np.int64), t["id_b"].to_numpy(np.int64)]
        )
        u, c = np.unique(ids_, return_counts=True)  # per-batch combiner
        return pd.DataFrame({"node": u, "n": c.astype(np.int64)})

    deg = hash_agg(
        pairs.map_batches(explode_deg, batch_format="pandas"), "node",
        deg=("n", "sum"),
    )
    cores = np.sort(
        deg.map_batches(
            lambda t: t.loc[t["deg"] >= DBSCAN_MIN_PTS, ["node"]],
            batch_format="pandas",
        )
        .to_pandas()["node"]
        .to_numpy(np.int64)
    )
    cores_ref = ray.put(cores)

    def core_edges(t: pd.DataFrame) -> pd.DataFrame:
        cs = get_broadcast(cores_ref)
        a = t["id_a"].to_numpy(np.int64)
        b = t["id_b"].to_numpy(np.int64)
        m = _sorted_member(cs, a) & _sorted_member(cs, b)
        return pd.DataFrame({"a": a[m], "b": b[m]})

    cm = canonical_map(pairs.map_batches(core_edges, batch_format="pandas"))
    # cores absent from the core-core graph keep their own id as cluster
    core_cluster = cores.copy()
    if len(cm):
        cm_nodes = cm["node"].to_numpy(np.int64)
        cm_comp = cm["component"].to_numpy(np.int64)
        o = np.argsort(cm_nodes)
        cm_nodes, cm_comp = cm_nodes[o], cm_comp[o]
        hit = _sorted_member(cm_nodes, cores)
        core_cluster[hit] = cm_comp[np.searchsorted(cm_nodes, cores[hit])]
    core_map_ref = ray.put((cores, core_cluster))

    def border_msgs(t: pd.DataFrame) -> pd.DataFrame:
        cs, cvals = get_broadcast(core_map_ref)
        a = t["id_a"].to_numpy(np.int64)
        b = t["id_b"].to_numpy(np.int64)
        x = np.concatenate([a, b])
        y = np.concatenate([b, a])
        m = (~_sorted_member(cs, x)) & _sorted_member(cs, y)
        if not m.any():
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "cluster": pd.Series(dtype="int64")}
            )
        g = pd.DataFrame(
            {"node": x[m], "cluster": cvals[np.searchsorted(cs, y[m])]}
        )
        # per-batch min combiner before the bucketed merge
        return g.groupby("node", as_index=False).agg(cluster=("cluster", "min"))

    border = hash_agg(
        pairs.map_batches(border_msgs, batch_format="pandas"), "node",
        cluster=("cluster", "min"),
    ).to_pandas()
    b_nodes = border["node"].to_numpy(np.int64)
    b_cl = border["cluster"].to_numpy(np.int64)
    o = np.argsort(b_nodes)
    maps_ref = ray.put((cores, core_cluster, b_nodes[o], b_cl[o]))

    def assign(t: pd.DataFrame) -> pd.DataFrame:
        cs, cvals, bn, bv = get_broadcast(maps_ref)
        ids_v = t["vec_id"].to_numpy(np.int64)
        cluster = np.full(len(ids_v), -1, dtype=np.int64)
        bm = _sorted_member(bn, ids_v)
        if bm.any():
            cluster[bm] = bv[np.searchsorted(bn, ids_v[bm])]
        cmemb = _sorted_member(cs, ids_v)
        if cmemb.any():
            cluster[cmemb] = cvals[np.searchsorted(cs, ids_v[cmemb])]
        return pd.DataFrame(
            {"vec_id": ids_v, "cluster": cluster, "is_core": cmemb}
        )

    return _read_emb(sf_dir, ["vec_id"]).map_batches(assign, batch_format="pandas")


def dedup_keep_embeddings(sf_dir: str):
    """(vec_id, keep) — the EMBEDDING-side end-to-end dedup policy:
    cosine near-dup pairs → connected components → keep = component
    representative (MIN vec_id) or any vector in no component. The
    semantic twin of ``dedup.dedup_keep_list`` (n-gram pairs feed that
    one; the eps-graph feeds this one), closing the
    candidate→verify→cluster→select flow for the embedding modality.

    Scale shape: the component map is duplicate-scale (pairs only, far
    below corpus), so the drop set broadcasts as one sorted array; the
    corpus-scale vector ids stream through a vectorized searchsorted
    membership probe — no join, no shuffle of the id stream."""
    cm = dup_groups(sf_dir)  # DataFrame(vec_id, group_id) — dup-scale
    if len(cm):
        nodes = cm["vec_id"].to_numpy(np.int64)
        comps = cm["group_id"].to_numpy(np.int64)
        drop_sorted = np.sort(nodes[nodes != comps])
    else:
        drop_sorted = np.empty(0, np.int64)
    dref = ray.put(drop_sorted)

    def flag(t: pd.DataFrame) -> pd.DataFrame:
        drops = get_broadcast(dref)
        ids_v = t["vec_id"].to_numpy(np.int64)
        if len(drops):
            pos = np.clip(np.searchsorted(drops, ids_v), 0, len(drops) - 1)
            keep = drops[pos] != ids_v
        else:
            keep = np.ones(len(ids_v), dtype=bool)
        return pd.DataFrame({"vec_id": ids_v, "keep": keep})

    return _read_emb(sf_dir, ["vec_id"]).map_batches(flag, batch_format="pandas")
