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

Execution shape (cost-conscious: exactly THREE dataset executions):

* one scan of ``nodes`` fetching the (id,label) dimension — driver-side
  checks 1 come for free from it; the dim is broadcast for edge labeling.
  (At corpus scales where (id,label) outgrows the broadcast budget this
  switches to the shuffle-join path — ``num_partitions`` is the knob.)
* one scan of ``edges`` doing dangling/edge-fact checks + REF counting
  against the broadcast dim;
* one groupby over edge (src,label) degree partials for the bounds check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .. import schema
from ..functions.joins import get_broadcast


def _viol(check, detail_series) -> pd.DataFrame:
    d = pd.Series(detail_series).astype("string")
    return pd.DataFrame({"check": pd.Series([check] * len(d), dtype="string"),
                         "detail": d.to_numpy()})


_EMPTY = pd.DataFrame({"check": pd.Series([], dtype="string"),
                       "detail": pd.Series([], dtype="string")})


def validate_graph(nodes, edges, num_partitions: int = 16):
    """nodes, edges: ray Datasets → Dataset of (check, detail) violations."""
    import ray.data

    # ---- execution 1: node dimension (numeric!) + node checks -----------
    # The label→code mapping happens distributed so the driver only pulls
    # two numeric columns (id:int64, code:int16) — pulling the label
    # STRINGS serialized the validator at scale (700 MB of pandas objects
    # for 7M nodes). Unknown-label details are fetched lazily only if any
    # code is -1 (the exceptional path pays the extra scan, not the common
    # one). At 10^9+ nodes the dim itself outgrows one machine — then this
    # lookup shards by id range; the threshold note in AGENTS/BASELINE.
    label_names = list(schema.NODE_LABELS)
    code_of_label = {name: i for i, name in enumerate(label_names)}

    def node_dim_batch(t: pd.DataFrame) -> pd.DataFrame:
        code = t["label"].map(code_of_label).fillna(-1).astype("int16")
        return pd.DataFrame({"id": t["id"].astype("int64"), "code": code})

    dim = nodes.select_columns(["id", "label"]).map_batches(
        node_dim_batch, batch_format="pandas"
    ).to_pandas()
    driver_viols = [_EMPTY]
    codes_all = dim["code"].to_numpy(np.int16)
    if (codes_all < 0).any():  # exceptional path: name the unknown labels
        bad = (
            nodes.select_columns(["label"])
            .map_batches(
                lambda t: t.loc[~t["label"].isin(label_names), ["label"]].drop_duplicates(),
                batch_format="pandas",
            )
            .to_pandas()["label"].drop_duplicates()
        )
        driver_viols.append(_viol("unknown_node_label", bad))

    ids_all = dim["id"].to_numpy(np.int64)
    id_order = np.argsort(ids_all, kind="stable")
    ids_sorted = ids_all[id_order]
    dup_mask = np.zeros(len(ids_sorted), dtype=bool)
    if len(ids_sorted) > 1:
        eq = ids_sorted[1:] == ids_sorted[:-1]
        dup_mask[1:] = eq
    if dup_mask.any():
        driver_viols.append(
            _viol("duplicate_node_id", np.unique(ids_sorted[dup_mask]).astype(str))
        )
    counts = np.bincount(codes_all[codes_all >= 0], minlength=len(label_names))
    if counts[code_of_label[schema.META_DATA]] != 1:
        driver_viols.append(_viol("meta_data_count", ["expected exactly 1"]))
    n_mentions = int(counts[code_of_label[schema.MENTION]])

    # broadcast lookup = (sorted int64 ids, int16 label codes): plasma-zero-
    # copy numpy arrays + np.searchsorted — 100× faster per batch than a
    # Series.map(dict) probe at 10^6+ nodes (measured 1.3 s vs 0.011 s on a
    # 14k-row batch), and the dominant validator cost at scale.
    codes_sorted = codes_all[id_order]
    label_of = ray.put((ids_sorted, codes_sorted, label_names))
    allowed = frozenset(schema.EDGE_FACTS)

    def _lookup(ids: np.ndarray, table) -> np.ndarray:
        ids_s, codes, _names = table
        pos = np.clip(np.searchsorted(ids_s, ids), 0, len(ids_s) - 1)
        found = ids_s[pos] == ids
        out = np.where(found, codes[pos], -1)
        return out

    # ---- execution 2: ONE edges scan does everything edge-side ----------
    # Per batch: dangling + edge-fact checks, a REF-count partial, and
    # (src,label) degree partials. All ride one combined frame through the
    # bucketed shuffle; the per-bucket reducer finishes degree bounds and
    # passes violation rows through. One execution instead of three.
    max_bounds = {
        (sl, el): mx
        for (sl, el), (_mn, mx) in schema.OUT_DEGREE_FACTS.items()
        if mx is not None
    }
    bounds_ref = ray.put(max_bounds)

    # the degree stream carries (src:int64, lcode:int8) — label STRINGS
    # never enter this 20M+-row shuffle (bandwidth discipline)
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
        lcode = pd.Categorical(t["label"], categories=schema.EDGE_LABELS).codes
        deg = (
            pd.DataFrame({"src": t["src"].to_numpy(np.int64), "lcode": lcode})
            .groupby(["src", "lcode"], as_index=False, observed=True)
            .size()
            .rename(columns={"size": "n"})
        )
        deg["lcode"] = deg["lcode"].astype("int8")
        return _as_combined(pd.concat(viols, ignore_index=True), deg)

    # max bound per (node-label code, edge-label code) as a dense matrix —
    # the bounds check is then pure numpy indexing
    edge_code = {name: i for i, name in enumerate(schema.EDGE_LABELS)}
    bound_mat = np.full((len(label_names), len(schema.EDGE_LABELS)), np.inf)
    for (sl, el), mx in max_bounds.items():
        bound_mat[code_of_label[sl], edge_code[el]] = mx
    bounds_mat_ref = ray.put(bound_mat)

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
                            f"{s}:{schema.EDGE_LABELS[l]}={n}"
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
    return ray.data.from_pandas(driver_df.reset_index(drop=True))
