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
4. out-degree cardinality bounds per OUT_DEGREE_FACTS (e.g. ≤1 NEXT_TURN,
   exactly one REF per MENTION — the "0-1:n" facts of base.json)

Scale shape: label resolution is two hash joins of edges against the
(id,label) projection of nodes (`join_auto` broadcasts when the node dim is
small); degree checks are partial-aggregated groupbys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import schema
from ..functions.joins import join_auto


def _viol(check, detail_series) -> pd.DataFrame:
    d = pd.Series(detail_series).astype(str)
    return pd.DataFrame({"check": [check] * len(d), "detail": d.to_numpy()})


def validate_graph(nodes, edges, num_partitions: int = 16):
    """nodes, edges: ray Datasets → Dataset of (check, detail) violations."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    # dtype "string" so empty blocks carry arrow string (not null) type
    empty = pd.DataFrame({"check": pd.Series([], dtype="string"),
                          "detail": pd.Series([], dtype="string")})

    # -- 1a. unknown node labels -------------------------------------------
    def bad_labels(t: pd.DataFrame) -> pd.DataFrame:
        bad = t.loc[~t["label"].isin(schema.NODE_LABELS), "label"].drop_duplicates()
        return _viol("unknown_node_label", bad) if len(bad) else empty

    v_labels = nodes.map_batches(bad_labels, batch_format="pandas")

    # -- 1b. duplicate node ids (same id must mean same content row) -------
    def id_partials(t: pd.DataFrame) -> pd.DataFrame:
        vc = t["id"].value_counts()
        return pd.DataFrame({"id": vc.index.to_numpy(), "n": vc.to_numpy(np.int64)})

    dup_ids = (
        nodes.map_batches(id_partials, batch_format="pandas")
        .groupby("id")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: _viol("duplicate_node_id", t.loc[t["n"] > 1, "id"])
            if (t["n"] > 1).any()
            else empty,
            batch_format="pandas",
        )
    )

    # -- 2+3. resolve endpoint labels via joins ----------------------------
    node_dim = nodes.select_columns(["id", "label"]).rename_columns(
        {"id": "nid", "label": "node_label"}
    )
    def _ren(frm: str, to: str):
        # rename via a pandas stage: Dataset.rename_columns assumes arrow
        # blocks and breaks on pandas-format blocks from broadcast joins
        return lambda t: t.rename(columns={frm: to})

    e = edges.select_columns(["src", "dst", "label"])
    e = join_auto(e, node_dim, on="src", right_on="nid", how="left",
                  num_partitions=num_partitions)
    e = e.map_batches(_ren("node_label", "src_label"), batch_format="pandas")
    e = join_auto(e, node_dim, on="dst", right_on="nid", how="left",
                  num_partitions=num_partitions)
    e = e.map_batches(_ren("node_label", "dst_label"), batch_format="pandas")

    allowed = {(s, l, d) for (s, l, d) in schema.EDGE_FACTS}

    def edge_checks(t: pd.DataFrame) -> pd.DataFrame:
        out = []
        dangling = t["src_label"].isna() | t["dst_label"].isna()
        if dangling.any():
            out.append(_viol("dangling_edge", t.loc[dangling, "label"].drop_duplicates()))
        ok = t[~dangling]
        combos = ok[["src_label", "label", "dst_label"]].drop_duplicates()
        bad = combos[
            [tuple(r) not in allowed for r in combos.itertuples(index=False)]
        ]
        if len(bad):
            out.append(
                _viol("edge_fact", bad.apply(lambda r: f"{r.src_label}-{r.label}->{r.dst_label}", axis=1))
            )
        return pd.concat(out, ignore_index=True) if out else empty

    v_edges = e.map_batches(edge_checks, batch_format="pandas")

    # -- 4. out-degree bounds ----------------------------------------------
    def degree_partials(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby(["src", "label"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    deg = (
        edges.select_columns(["src", "label"])
        .map_batches(degree_partials, batch_format="pandas")
        .groupby(["src", "label"])
        .aggregate(Sum("n", alias_name="n"))
    )
    # max-bound check needs src's node label → reuse the label join
    deg = join_auto(deg, node_dim, on="src", right_on="nid", how="left",
                    num_partitions=num_partitions)

    max_bounds = {
        (sl, el): mx
        for (sl, el), (_mn, mx) in schema.OUT_DEGREE_FACTS.items()
        if mx is not None
    }

    def degree_checks(t: pd.DataFrame) -> pd.DataFrame:
        lim = t.apply(lambda r: max_bounds.get((r["node_label"], r["label"]), None), axis=1)
        over = t[lim.notna() & (t["n"] > lim.fillna(np.inf))]
        if not len(over):
            return empty
        return _viol(
            "out_degree_exceeded",
            over.apply(lambda r: f"{r['node_label']}:{r['label']}={r['n']}", axis=1),
        )

    v_deg = deg.map_batches(degree_checks, batch_format="pandas")

    # min-degree: every MENTION must have exactly one REF out-edge; a mention
    # with zero REF edges never reaches the edges table, so compare counts.
    def count_label(ds, label, col="label"):
        return ds.map_batches(
            lambda t, lb=label: pd.DataFrame({"n": [int((t[col] == lb).sum())]}),
            batch_format="pandas",
        ).sum("n") or 0

    n_mentions = count_label(nodes, schema.MENTION)
    n_refs = count_label(edges, schema.REF)
    extra = (
        [{"check": "mention_ref_count", "detail": f"mentions={n_mentions} refs={n_refs}"}]
        if n_mentions != n_refs
        else []
    )
    v_extra = ray.data.from_items(extra) if extra else ray.data.from_pandas(empty)

    return v_labels.union(dup_ids).union(v_edges).union(v_deg).union(v_extra)
