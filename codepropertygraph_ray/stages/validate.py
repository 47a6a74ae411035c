"""Schema-facts validation over the materialized graph tables.

Rebuild of the reference's conformance checker
(`cpgvalidator/.../validators/CpgValidator.scala:8-15` running
`OutFactsValidator.scala:19-105`, `InFactsValidator`, `KeysValidator`):
facts come from `schema.py` (the analog of re-importing the generated
schema) and every produced graph can be checked against them.

Checks (each emits violation rows; a valid graph yields ZERO rows):

1. node labels ∈ NODE_LABELS; node ids unique (KeysValidator-ish)
2. edge (src_label, label, dst_label) ∈ EDGE_FACTS   (OutFacts/InFacts)
3. no dangling edge endpoints (the ProtoToCpg dangling-edge warning,
   `ProtoToCpg.scala:81-89`, promoted to a check)
4. out-degree cardinality bounds per OUT_DEGREE_FACTS (≤1 NEXT_TURN,
   exactly one REF per MENTION — the "0-1:n" facts of base.json)

Two execution shapes, chosen by node count:

* **broadcast path** (default below ``BROADCAST_MAX_ROWS`` nodes): one
  nodes scan pulls the NUMERIC (id:int64, code:int16) dim to the driver,
  broadcasts it as sorted arrays, and one edges scan does every edge-side
  check with ``np.searchsorted`` probes (measured ~100× faster per batch
  than dict probes).
* **sharded path** (corpus-scale dims): NOTHING corpus-scale touches the
  driver. Node checks run in an id-bucketed shuffle over the dim; edge
  checks run as two co-group shuffles (by src then by dst) that join edges
  to the dim in-bucket — the degree bounds complete in the src shuffle
  because all of a node's out-edges co-locate there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .. import schema
from ..functions.joins import get_broadcast

# above this many nodes the (id, code) dim stops being broadcast and the
# validator switches to the sharded join path
BROADCAST_MAX_ROWS = 50_000_000

VIOLATIONS_SCHEMA = pa.schema([("check", pa.string()), ("detail", pa.string())])


def _viol(check, detail_series) -> pd.DataFrame:
    d = pd.Series(detail_series, dtype="string")
    return pd.DataFrame(
        {"check": pd.Series([check] * len(d), dtype="string"),
         "detail": d.reset_index(drop=True)}
    )


_EMPTY = pd.DataFrame({"check": pd.Series([], dtype="string"),
                       "detail": pd.Series([], dtype="string")})


def _label_codes():
    label_names = list(schema.NODE_LABELS)
    return label_names, {name: i for i, name in enumerate(label_names)}


def _bound_matrix(code_of_label):
    edge_code = {name: i for i, name in enumerate(schema.EDGE_LABELS)}
    mat = np.full((len(code_of_label), len(schema.EDGE_LABELS)), np.inf)
    for (sl, el), (_mn, mx) in schema.OUT_DEGREE_FACTS.items():
        if mx is not None:
            mat[code_of_label[sl], edge_code[el]] = mx
    return mat


def validate_graph(nodes, edges, num_partitions: int = 16,
                   broadcast_max_rows: int = BROADCAST_MAX_ROWS,
                   n_nodes: int | None = None) -> pa.Table:
    """nodes, edges: ray Datasets → pyarrow Table of (check, detail) rows.

    ``n_nodes`` selects the execution path; pass it from parquet metadata
    (ledger row counts / ``pyarrow.dataset.count_rows``) when available —
    ``Dataset.count()`` on a column-pruned read of the materialize delta
    measured ~30 s at 7M nodes (a full decode of the union-schema files),
    pure waste for a path-selection scalar."""
    if n_nodes is None:
        n_nodes = nodes.count()
    if n_nodes <= broadcast_max_rows:
        return _validate_broadcast(nodes, edges)
    return _validate_sharded(nodes, edges, num_partitions)


# ---------------------------------------------------------------------------
# broadcast fast path
# ---------------------------------------------------------------------------


def _validate_broadcast(nodes, edges) -> pa.Table:
    label_names, code_of_label = _label_codes()
    edge_labels = list(schema.EDGE_LABELS)  # captured: includes extensions

    def node_dim_batch(t: pd.DataFrame) -> pd.DataFrame:
        # categorical codes (C-level) — unknown labels → -1 like the old map
        code = pd.Categorical(t["label"], categories=label_names).codes.astype("int16")
        return pd.DataFrame({"id": t["id"].astype("int64"), "code": code})

    # The probe table is the (id, code) dim fetched UNSORTED and argsorted
    # on the driver. Measured alternatives at 7.3M/14.7M nodes, same box:
    # Ray's distributed sort("id") 13.3 s (sample + range-exchange
    # barriers), serial k-way run merge 6.8 s (and scaling-hostile),
    # parallel Ray-task merge tree 12.5 s (searchsorted merges are
    # cache-miss-bound, not O(n)) — vs driver np.argsort+take 1.2 s/2.3 s
    # (introsort on values). The driver holds the dim on this path by
    # definition (≤ BROADCAST_MAX_ROWS ⇒ argsort ≤ ~8 s at the cap, a
    # width-independent constant); beyond the cap the sharded path runs.
    dim = (
        nodes.select_columns(["id", "label"])
        .map_batches(node_dim_batch, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    ids_u = dim["id"].to_numpy(np.int64)
    codes_u = dim["code"].to_numpy(np.int16)
    order = np.argsort(ids_u)
    ids_sorted = ids_u[order]
    codes_sorted = codes_u[order]
    n_dim_rows = len(ids_sorted)
    dup_ids = (
        np.unique(ids_sorted[1:][ids_sorted[1:] == ids_sorted[:-1]])
        if n_dim_rows > 1 else np.empty(0, np.int64)
    )
    counts = np.bincount(codes_sorted[codes_sorted >= 0], minlength=len(label_names))
    n_unknown = int((codes_sorted < 0).sum())

    driver_viols = [_EMPTY]
    if n_unknown:  # exceptional path: name the unknown labels
        bad = (
            nodes.select_columns(["label"])
            .map_batches(
                lambda t: t.loc[~t["label"].isin(label_names), ["label"]].drop_duplicates(),
                batch_format="pandas",
            )
            .to_pandas()["label"].drop_duplicates()
        )
        driver_viols.append(_viol("unknown_node_label", bad))
    if len(dup_ids):
        driver_viols.append(_viol("duplicate_node_id", dup_ids.astype(str)))
    if counts[code_of_label[schema.META_DATA]] != 1:
        driver_viols.append(_viol("meta_data_count", ["expected exactly 1"]))
    n_mentions = int(counts[code_of_label[schema.MENTION]])

    # broadcast lookup = (sorted int64 ids, int16 label codes): plasma-zero-
    # copy numpy arrays + np.searchsorted — 100× faster per batch than a
    # Series.map(dict) probe at 10^6+ nodes, and the dominant validator
    # cost at scale.
    label_of = ray.put((ids_sorted, codes_sorted))
    allowed = frozenset(schema.EDGE_FACTS)

    def _lookup(ids: np.ndarray, table) -> np.ndarray:
        ids_s, codes = table
        if not len(ids_s):
            return np.full(len(ids), -1, dtype=np.int16)
        pos = np.clip(np.searchsorted(ids_s, ids), 0, len(ids_s) - 1)
        found = ids_s[pos] == ids
        out = np.where(found, codes[pos], -1)
        return out

    # ---- ONE edges scan does everything edge-side, NO shuffle -----------
    # Per batch: dangling + edge-fact checks, a REF-count partial, and the
    # degree-bound evidence. Every finite bound in the base schema is
    # max == 1, and "out-degree ≤ 1 for every src" ⟺ "edge count ==
    # distinct-src count": each batch emits the POSITIONS (indexes into
    # the sorted broadcast dim) of its bounded edges' srcs as one packed
    # binary cell per (src_label, edge_label); the driver ORs them into a
    # bitmap and compares popcount to the total. That replaced the
    # (src,lcode) degree-partial shuffle — measured ~6M shuffled rows and
    # most of the validator's residual wall at sf0.4. Extension-registered
    # bounds with max > 1 (rare) fall back to per-batch partial counts
    # reduced on the driver — still shuffle-free; the driver already holds
    # a dim of this scale on the broadcast path by definition.
    bound_mat = _bound_matrix(code_of_label)
    bounds_mat_ref = ray.put(bound_mat)
    has_multi = bool(np.isfinite(bound_mat[bound_mat > 1]).any())

    def edge_scan(t: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(label_of)
        ids_s, codes_s = table
        names = label_names
        src_v = t["src"].to_numpy(np.int64)
        if len(ids_s):
            pos_src = np.clip(np.searchsorted(ids_s, src_v), 0, len(ids_s) - 1)
            src_c = np.where(ids_s[pos_src] == src_v, codes_s[pos_src], -1)
        else:
            pos_src = np.zeros(len(t), dtype=np.int64)
            src_c = np.full(len(t), -1, dtype=np.int16)
        dst_c = _lookup(t["dst"].to_numpy(np.int64), table)
        viols = []
        dangling = (src_c < 0) | (dst_c < 0)
        if dangling.any():
            viols.append(_viol("dangling_edge", t.loc[dangling, "label"].drop_duplicates()))
        ok = ~dangling
        combos = pd.DataFrame(
            {"s": src_c[ok], "l": t.loc[ok, "label"].to_numpy(), "d": dst_c[ok]}
        ).drop_duplicates()
        bad = [
            f"{names[s]}-{l}->{names[d]}"
            for s, l, d in combos.itertuples(index=False)
            if (names[s], l, names[d]) not in allowed
        ]
        if bad:
            viols.append(_viol("edge_fact", bad))
        viols.append(_viol("_ref_partial", [str(int((t["label"] == schema.REF).sum()))]))
        out = pd.concat(viols, ignore_index=True)
        out["scode"] = np.int16(-1)
        out["lcode"] = np.int16(-1)
        out["n"] = np.int64(0)
        out["pos"] = pd.Series([None] * len(out), dtype="object")
        frames = [out]

        lcode = np.asarray(pd.Categorical(t["label"], categories=edge_labels).codes)
        bm = get_broadcast(bounds_mat_ref)
        valid = (src_c >= 0) & (lcode >= 0)
        lim = np.where(valid, bm[np.clip(src_c, 0, None), np.clip(lcode, 0, None)], np.inf)
        b1 = valid & (lim == 1)
        if b1.any():
            key = src_c[b1].astype(np.int64) * 1024 + lcode[b1]
            order = np.argsort(key, kind="stable")
            uk, starts = np.unique(key[order], return_index=True)
            pos_sorted = pos_src[b1][order].astype("<i4")
            blobs, scs, lcs, ns = [], [], [], []
            bounds = np.r_[starts, len(key)]
            for i, kk in enumerate(uk):
                seg = pos_sorted[bounds[i]:bounds[i + 1]]
                blobs.append(seg.tobytes())
                scs.append(np.int16(kk // 1024))
                lcs.append(np.int16(kk % 1024))
                ns.append(np.int64(len(seg)))
            frames.append(pd.DataFrame(
                {"check": pd.Series(["_deg1"] * len(uk), dtype="string"),
                 "detail": pd.Series([None] * len(uk), dtype="string"),
                 "scode": scs, "lcode": lcs, "n": ns,
                 "pos": pd.Series(blobs, dtype="object")}
            ))
        if has_multi:
            bn = valid & np.isfinite(lim) & (lim > 1)
            if bn.any():
                deg = (
                    pd.DataFrame({"srcp": pos_src[bn].astype(np.int64),
                                  "scode": src_c[bn].astype(np.int16),
                                  "lcode": lcode[bn].astype(np.int16)})
                    .groupby(["srcp", "scode", "lcode"], as_index=False)
                    .size()
                )
                frames.append(pd.DataFrame(
                    {"check": pd.Series(["_degN"] * len(deg), dtype="string"),
                     "detail": pd.Series(deg["srcp"].astype(str), dtype="string"),
                     "scode": deg["scode"], "lcode": deg["lcode"],
                     "n": deg["size"].astype(np.int64),
                     "pos": pd.Series([None] * len(deg), dtype="object")}
                ))
        return pd.concat(frames, ignore_index=True)

    edge_results = (
        edges.select_columns(["src", "dst", "label"])
        .map_batches(edge_scan, batch_format="pandas")
        .to_pandas()
    )

    ref_rows = edge_results["check"] == "_ref_partial"
    n_refs = edge_results.loc[ref_rows, "detail"].astype(int).sum()

    deg1 = edge_results[edge_results["check"] == "_deg1"]
    for (sc, lc), grp in deg1.groupby(["scode", "lcode"]):
        total = int(grp["n"].sum())
        bitmap = np.zeros(max(n_dim_rows, 1), dtype=bool)
        for blob in grp["pos"]:
            bitmap[np.frombuffer(blob, dtype="<i4")] = True
        distinct = int(bitmap.sum())
        if total > distinct:
            driver_viols.append(_viol(
                "out_degree_exceeded",
                [f"{label_names[int(sc)]}:{edge_labels[int(lc)]}"
                 f" n={total} distinct_src={distinct}"],
            ))
    degn = edge_results[edge_results["check"] == "_degN"]
    if len(degn):
        agg = degn.groupby(["detail", "scode", "lcode"], as_index=False)["n"].sum()
        lim = bound_mat[agg["scode"].to_numpy(np.int64),
                        agg["lcode"].to_numpy(np.int64)]
        over = agg[agg["n"].to_numpy() > lim]
        if len(over):
            driver_viols.append(_viol(
                "out_degree_exceeded",
                [f"{label_names[int(s)]}:{edge_labels[int(l)]}={n}"
                 for s, l, n in zip(over["scode"], over["lcode"], over["n"])],
            ))

    edge_results = edge_results[
        ~ref_rows & ~edge_results["check"].isin(["_deg1", "_degN"])
    ][["check", "detail"]]
    if n_refs != n_mentions:  # every MENTION has exactly one REF out-edge
        driver_viols.append(
            _viol("mention_ref_count", [f"mentions={n_mentions} refs={n_refs}"])
        )

    driver_df = pd.concat(driver_viols + [edge_results], ignore_index=True)
    return pa.Table.from_pandas(
        driver_df.reset_index(drop=True), schema=VIOLATIONS_SCHEMA, preserve_index=False
    ).replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# sharded path — no corpus-scale driver materialization
# ---------------------------------------------------------------------------


def _validate_sharded(nodes, edges, num_partitions: int) -> pa.Table:
    """Join-based validation for dims beyond the broadcast budget.

    * node checks: one id-bucketed shuffle over the (id, code) dim —
      duplicate ids detected in-bucket; label counts (META_DATA /
      MENTION) are tiny numeric partials.
    * edge checks: shuffle 1 co-groups edges with the dim by SRC id
      (dangling-src, full out-degree bounds — every out-edge of a node
      co-locates); its output co-groups with the dim by DST id in
      shuffle 2 (dangling-dst + edge-fact checks + REF counting).
    """
    from ..functions.agg import hash_groupby

    label_names, code_of_label = _label_codes()
    edge_labels = list(schema.EDGE_LABELS)  # captured: includes extensions
    allowed_codes = frozenset(
        (code_of_label[s], el, code_of_label[d]) for s, el, d in schema.EDGE_FACTS
    )
    bound_mat = _bound_matrix(code_of_label)
    bm_ref = ray.put(bound_mat)
    allowed_ref = ray.put(allowed_codes)

    def node_dim_batch(t: pd.DataFrame) -> pd.DataFrame:
        code = t["label"].map(code_of_label).fillna(-1).astype("int16")
        out = pd.DataFrame({"id": t["id"].astype("int64"), "code": code})
        return out

    dim = nodes.select_columns(["id", "label"]).map_batches(
        node_dim_batch, batch_format="pandas"
    ).materialize()

    # ---- node-side: duplicate ids (bucketed) + label counts (partials) --
    def dup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dups = g.loc[g["id"].duplicated(keep="first"), "id"].drop_duplicates()
        return _viol("duplicate_node_id", dups.astype(str))

    dup_viols = hash_groupby(dim, "id", dup_bucket, num_buckets=num_partitions).to_pandas()
    if not len(dup_viols) or "check" not in dup_viols.columns:
        dup_viols = _EMPTY

    def count_partial(t: pd.DataFrame) -> pd.DataFrame:
        vc = t["code"].value_counts()
        return pd.DataFrame({"code": vc.index.to_numpy(np.int16),
                             "n": vc.to_numpy(np.int64)})

    code_counts = (
        dim.map_batches(count_partial, batch_format="pandas")
        .to_pandas().groupby("code", as_index=False)["n"].sum()
    )
    counts = dict(zip(code_counts["code"], code_counts["n"]))
    driver_viols = [_EMPTY, dup_viols]
    if counts.get(-1, 0):
        driver_viols.append(_viol("unknown_node_label", [f"{counts[-1]} nodes"]))
    if counts.get(code_of_label[schema.META_DATA], 0) != 1:
        driver_viols.append(_viol("meta_data_count", ["expected exactly 1"]))
    n_mentions = int(counts.get(code_of_label[schema.MENTION], 0))

    # ---- edge-side shuffle 1: key = src -------------------------------
    def edge_rows(t: pd.DataFrame) -> pd.DataFrame:
        lcode = pd.Categorical(t["label"], categories=edge_labels).codes
        return pd.DataFrame(
            {"key": t["src"].astype("int64").to_numpy(),
             "other": t["dst"].astype("int64").to_numpy(),
             "lcode": lcode.astype("int16"),
             "code": np.full(len(t), -1, dtype=np.int16),
             "is_dim": np.zeros(len(t), dtype=bool)}
        )

    def dim_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": t["id"].to_numpy(np.int64),
             "other": np.full(len(t), -1, dtype=np.int64),
             "lcode": np.full(len(t), -1, dtype=np.int16),
             "code": t["code"].to_numpy(np.int16),
             "is_dim": np.ones(len(t), dtype=bool)}
        )

    tagged_a = edges.select_columns(["src", "dst", "label"]).map_batches(
        edge_rows, batch_format="pandas"
    ).union(dim.map_batches(dim_rows, batch_format="pandas"))

    B_COLS = ["check", "detail", "key", "src_code", "lcode", "code", "is_dim"]

    def bucket_a(g: pd.DataFrame) -> pd.DataFrame:
        bm = get_broadcast(bm_ref)
        dims = g[g["is_dim"]].drop_duplicates("key")[["key", "code"]]
        e = g[~g["is_dim"]]
        out = []
        if len(e):
            m = e.merge(dims, on="key", how="left", suffixes=("", "_n"))
            src_code = m["code_n"].fillna(-1).astype(np.int16).to_numpy()
            dang = src_code < 0
            viols = []
            if dang.any():
                labs = pd.Series([edge_labels[c] for c in m.loc[dang, "lcode"]])
                viols.append(_viol("dangling_edge", labs.drop_duplicates()))
            # degree bounds: ALL out-edges of every src in this bucket
            deg = m.groupby(["key", "lcode"], as_index=False).size()
            dm = deg.merge(dims, on="key", how="left")
            sc = dm["code"].fillna(-1).astype(np.int64).to_numpy()
            lc = dm["lcode"].to_numpy(np.int64)
            lim = np.where(sc >= 0, bm[np.clip(sc, 0, None), lc], np.inf)
            over = dm["size"].to_numpy() > lim
            if over.any():
                sel = dm[over]
                viols.append(
                    _viol(
                        "out_degree_exceeded",
                        [
                            f"{label_names[int(s)] if s >= 0 else None}:"
                            f"{edge_labels[int(l)]}={n}"
                            for s, l, n in zip(sc[over], sel["lcode"], sel["size"])
                        ],
                    )
                )
            for v in viols:
                v2 = v.copy()
                v2["key"] = np.int64(-1)
                v2["src_code"] = np.int16(-1)
                v2["lcode"] = np.int16(-1)
                v2["code"] = np.int16(-1)
                v2["is_dim"] = False
                out.append(v2[B_COLS])
            # forward edge rows keyed by DST for shuffle 2
            fwd = pd.DataFrame(
                {"check": pd.Series([None] * len(m), dtype="string"),
                 "detail": pd.Series([None] * len(m), dtype="string"),
                 "key": m["other"].to_numpy(np.int64),
                 "src_code": src_code,
                 "lcode": m["lcode"].to_numpy(np.int16),
                 "code": np.full(len(m), -1, dtype=np.int16),
                 "is_dim": np.zeros(len(m), dtype=bool)}
            )
            out.append(fwd)
        if not out:
            return pd.DataFrame(
                {"check": pd.Series([], dtype="string"),
                 "detail": pd.Series([], dtype="string"),
                 "key": pd.Series([], dtype="int64"),
                 "src_code": pd.Series([], dtype="int16"),
                 "lcode": pd.Series([], dtype="int16"),
                 "code": pd.Series([], dtype="int16"),
                 "is_dim": pd.Series([], dtype="bool")}
            )
        return pd.concat(out, ignore_index=True)

    stage_a = hash_groupby(tagged_a, "key", bucket_a, num_buckets=num_partitions)

    def dim_rows_b(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"check": pd.Series([None] * len(t), dtype="string"),
             "detail": pd.Series([None] * len(t), dtype="string"),
             "key": t["id"].to_numpy(np.int64),
             "src_code": np.full(len(t), -1, dtype=np.int16),
             "lcode": np.full(len(t), -1, dtype=np.int16),
             "code": t["code"].to_numpy(np.int16),
             "is_dim": np.ones(len(t), dtype=bool)}
        )

    tagged_b = stage_a.union(dim.map_batches(dim_rows_b, batch_format="pandas"))

    ref_code = edge_labels.index(schema.REF)

    def bucket_b(g: pd.DataFrame) -> pd.DataFrame:
        allowed = get_broadcast(allowed_ref)
        passthrough = g[g["check"].notna()][["check", "detail"]]
        dims = g[g["is_dim"] & g["check"].isna()].drop_duplicates("key")[["key", "code"]]
        e = g[~g["is_dim"] & g["check"].isna()]
        out = [passthrough]
        if len(e):
            m = e.merge(dims, on="key", how="left", suffixes=("", "_n"))
            dst_code = m["code_n"].fillna(-1).astype(np.int16).to_numpy()
            dang = dst_code < 0
            if dang.any():
                labs = pd.Series([edge_labels[c] for c in m.loc[dang, "lcode"]])
                out.append(_viol("dangling_edge", labs.drop_duplicates()))
            ok = (~dang) & (m["src_code"].to_numpy() >= 0)
            combos = pd.DataFrame(
                {"s": m["src_code"].to_numpy()[ok], "l": m["lcode"].to_numpy()[ok],
                 "d": dst_code[ok]}
            ).drop_duplicates()
            bad = [
                f"{label_names[s]}-{edge_labels[l]}->{label_names[d]}"
                for s, l, d in combos.itertuples(index=False)
                if (s, edge_labels[l], d) not in allowed
            ]
            if bad:
                out.append(_viol("edge_fact", bad))
            n_ref = int((m["lcode"].to_numpy() == ref_code).sum())
            out.append(_viol("_ref_partial", [str(n_ref)]))
        return pd.concat(out, ignore_index=True)

    edge_results = hash_groupby(
        tagged_b, "key", bucket_b, num_buckets=num_partitions
    ).to_pandas()
    if not len(edge_results) or "check" not in edge_results.columns:
        edge_results = _EMPTY
    ref_rows = edge_results["check"] == "_ref_partial"
    n_refs = edge_results.loc[ref_rows, "detail"].astype(int).sum()
    edge_results = edge_results[~ref_rows]
    if n_refs != n_mentions:
        driver_viols.append(
            _viol("mention_ref_count", [f"mentions={n_mentions} refs={n_refs}"])
        )
    driver_df = pd.concat(driver_viols + [edge_results], ignore_index=True)
    return pa.Table.from_pandas(
        driver_df.reset_index(drop=True), schema=VIOLATIONS_SCHEMA, preserve_index=False
    ).replace_schema_metadata(None)
