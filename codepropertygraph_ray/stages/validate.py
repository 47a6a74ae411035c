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
        code = t["label"].map(code_of_label).fillna(-1).astype("int16")
        return pd.DataFrame({"id": t["id"].astype("int64"), "code": code})

    # the dim arrives SORTED by id from a distributed sort — the driver
    # never argsorts a corpus-scale array (measured ~2.3 s single-threaded
    # at 7M nodes, a fixed cost that capped 8→32 scaling efficiency);
    # block order is preserved by to_pandas, so concatenation stays sorted
    dim = (
        nodes.select_columns(["id", "label"])
        .map_batches(node_dim_batch, batch_format="pandas")
        .sort("id")
        .to_pandas()
    )
    driver_viols = [_EMPTY]
    codes_sorted = dim["code"].to_numpy(np.int16)
    if (codes_sorted < 0).any():  # exceptional path: name the unknown labels
        bad = (
            nodes.select_columns(["label"])
            .map_batches(
                lambda t: t.loc[~t["label"].isin(label_names), ["label"]].drop_duplicates(),
                batch_format="pandas",
            )
            .to_pandas()["label"].drop_duplicates()
        )
        driver_viols.append(_viol("unknown_node_label", bad))

    ids_sorted = dim["id"].to_numpy(np.int64)
    dup_mask = np.zeros(len(ids_sorted), dtype=bool)
    if len(ids_sorted) > 1:
        eq = ids_sorted[1:] == ids_sorted[:-1]
        dup_mask[1:] = eq
    if dup_mask.any():
        driver_viols.append(
            _viol("duplicate_node_id", np.unique(ids_sorted[dup_mask]).astype(str))
        )
    counts = np.bincount(codes_sorted[codes_sorted >= 0], minlength=len(label_names))
    if counts[code_of_label[schema.META_DATA]] != 1:
        driver_viols.append(_viol("meta_data_count", ["expected exactly 1"]))
    n_mentions = int(counts[code_of_label[schema.MENTION]])

    # broadcast lookup = (sorted int64 ids, int16 label codes): plasma-zero-
    # copy numpy arrays + np.searchsorted — 100× faster per batch than a
    # Series.map(dict) probe at 10^6+ nodes, and the dominant validator
    # cost at scale.
    label_of = ray.put((ids_sorted, codes_sorted, label_names))
    allowed = frozenset(schema.EDGE_FACTS)

    def _lookup(ids: np.ndarray, table) -> np.ndarray:
        ids_s, codes, _names = table
        pos = np.clip(np.searchsorted(ids_s, ids), 0, len(ids_s) - 1)
        found = ids_s[pos] == ids
        out = np.where(found, codes[pos], -1)
        return out

    # ---- ONE edges scan does everything edge-side -----------------------
    # Per batch: dangling + edge-fact checks, a REF-count partial, and
    # (src,label) degree partials. All ride one combined frame through the
    # bucketed shuffle; the per-bucket reducer finishes degree bounds and
    # passes violation rows through.
    bound_mat = _bound_matrix(code_of_label)
    bounds_mat_ref = ray.put(bound_mat)

    _combined_empty = pd.DataFrame(
        {"check": pd.Series([], dtype="string"),
         "detail": pd.Series([], dtype="string"),
         "src": pd.Series([], dtype="int64"),
         "lcode": pd.Series([], dtype="int8"),
         "n": pd.Series([], dtype="int64")}
    )

    def _as_combined(viol_df: pd.DataFrame | None, deg_df: pd.DataFrame | None):
        frames = []
        if viol_df is not None and len(viol_df):
            v = viol_df.copy()
            v["src"] = np.int64(-1)
            v["lcode"] = np.int8(-1)
            v["n"] = np.int64(0)
            frames.append(v)
        if deg_df is not None and len(deg_df):
            d = deg_df.copy()
            d["check"] = pd.Series([None] * len(d), dtype="string")
            d["detail"] = pd.Series([None] * len(d), dtype="string")
            frames.append(d[["check", "detail", "src", "lcode", "n"]])
        if not frames:
            return _combined_empty
        return pd.concat(frames, ignore_index=True)[_combined_empty.columns]

    def edge_scan(t: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(label_of)
        names = table[2]
        src_c = _lookup(t["src"].to_numpy(np.int64), table)
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
        lcode = np.asarray(pd.Categorical(t["label"], categories=edge_labels).codes)
        # degree partials ONLY for (src_label, edge_label) combos that carry
        # a finite bound — everything else shuffles for nothing (measured:
        # 4 bounded combos cover ~6M of 27M edges at sf0.4, a 4× cut in the
        # validator's shuffle volume). Unknown labels (code -1) are already
        # flagged by the edge_fact/dangling checks above.
        bm = get_broadcast(bounds_mat_ref)
        bounded = (src_c >= 0) & (lcode >= 0)
        bounded &= np.isfinite(
            bm[np.clip(src_c, 0, None), np.clip(lcode, 0, None)]
        )
        deg = (
            pd.DataFrame(
                {"src": t["src"].to_numpy(np.int64)[bounded], "lcode": lcode[bounded]}
            )
            .groupby(["src", "lcode"], as_index=False, observed=True)
            .size()
            .rename(columns={"size": "n"})
        )
        deg["lcode"] = deg["lcode"].astype("int8")
        return _as_combined(pd.concat(viols, ignore_index=True), deg)

    def bucket_reduce(g: pd.DataFrame) -> pd.DataFrame:
        table = get_broadcast(label_of)
        names = table[2]
        bm = get_broadcast(bounds_mat_ref)
        passthrough = g[g["check"].notna()][["check", "detail"]]
        deg = g[g["check"].isna()].groupby(["src", "lcode"], as_index=False)["n"].sum()
        out = [passthrough]
        if len(deg):
            src_c = _lookup(deg["src"].to_numpy(np.int64), table)
            lc = deg["lcode"].to_numpy(np.int64)
            lim = np.where(src_c >= 0, bm[np.clip(src_c, 0, None), lc], np.inf)
            over = deg["n"].to_numpy() > lim
            if over.any():
                sel = deg[over]
                src_l = [names[c] if c >= 0 else None for c in src_c[over]]
                out.append(
                    _viol(
                        "out_degree_exceeded",
                        [
                            f"{s}:{edge_labels[l]}={n}"
                            for s, l, n in zip(src_l, sel["lcode"], sel["n"])
                        ],
                    )
                )
        return pd.concat(out, ignore_index=True) if out else _EMPTY

    from ..functions.agg import hash_groupby

    edge_results = hash_groupby(
        edges.select_columns(["src", "dst", "label"]).map_batches(
            edge_scan, batch_format="pandas"
        ),
        ["src", "lcode"],
        bucket_reduce,
    ).to_pandas()

    ref_rows = edge_results["check"] == "_ref_partial"
    n_refs = edge_results.loc[ref_rows, "detail"].astype(int).sum()
    edge_results = edge_results[~ref_rows]
    if n_refs != n_mentions:  # every MENTION has exactly one REF out-edge
        driver_viols.append(
            _viol("mention_ref_count", [f"mentions={n_mentions} refs={n_refs}"])
        )

    driver_df = pd.concat(driver_viols + [edge_results], ignore_index=True)
    return pa.Table.from_pandas(
        driver_df.reset_index(drop=True), schema=VIOLATIONS_SCHEMA, preserve_index=False
    )


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
    )
