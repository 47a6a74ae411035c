"""Connected components — the canonicalization merge (union-find at scale).

The reference canonicalizes by groupby + dedup (NamespaceCreator groupby,
`semanticcpg/.../namespacecreator/NamespaceCreator.scala:22-28`; NodeFilter
exact dedup, `cpgloading/NodeFilter.scala:12-27`). For transcript entity
canonicalization the analog is a *global* union-find over stated alias
pairs (SURVEY.md §7.1 step 6, per PAPERS.md hash-min / BTS-style CC).

Two code paths, chosen by edge count:

* ``cc_local`` — edges fit on the driver (vocab-scale, the common case:
  alias pairs ≤ a few million even at 10^12 turns because they're bounded
  by the entity vocabulary, not the corpus): classic union-find, exact,
  O(E α(E)).
* ``cc_distributed`` — hash-min label propagation over Ray Data: per round,
  one co-group groupby propagates each node's current label across its
  incident edges, a second groupby takes the min; repeat until the
  round's change-count aggregate is 0. Converges in O(log diameter)
  rounds; labels are materialized between rounds (vocab-scale tables) so
  rounds don't re-execute the whole lineage. Skewed giant components cost
  one hot groupby key; cap via ``max_rounds`` + salting upstream.

Both return the same mapping: ``node → component`` where the component
representative is the **lexicographically smallest member** (deterministic,
order-free — the content-hash-id discipline of SURVEY.md §7.4).
"""

from __future__ import annotations

import pandas as pd

DRIVER_CC_MAX_EDGES = 5_000_000


def cc_local(pairs: pd.DataFrame, a: str = "a", b: str = "b") -> pd.DataFrame:
    """Union-find on the driver → DataFrame(node, component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(pairs[a].to_numpy(), pairs[b].to_numpy()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[rv] = ru
    comp_min: dict[str, str] = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return pd.DataFrame(
        {"node": list(parent), "component": [comp_min[find(n)] for n in parent]}
    ).sort_values("node", ignore_index=True)


def _propagate_round(labels, edges, num_partitions: int):
    """One hash-min round: node's label flows across incident edges.

    Implemented as union + co-group (one shuffle) instead of two hash
    joins: rows tagged L carry (node,label), rows tagged E carry the far
    endpoint; within a key group every edge row emits (far, label).
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Min

    def edge_msgs(t: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "node": pd.concat([t["a"], t["b"]], ignore_index=True),
                "far": pd.concat([t["b"], t["a"]], ignore_index=True),
            }
        )
        out["label"] = pd.Series([None] * len(out), dtype="object")
        return out[["node", "label", "far"]]

    incident = edges.map_batches(edge_msgs, batch_format="pandas")

    def label_rows(t: pd.DataFrame) -> pd.DataFrame:
        t = t.copy()
        t["far"] = pd.Series([None] * len(t), dtype="object")
        return t[["node", "label", "far"]]

    labels = labels.map_batches(label_rows, batch_format="pandas")

    def cogroup(g: pd.DataFrame) -> pd.DataFrame:
        lab = g["label"].dropna()
        if lab.empty:  # node label not present (shouldn't happen)
            return pd.DataFrame({"node": [], "label": []})
        label = lab.min()
        far = g["far"].dropna()
        out_nodes = list(far) + [g["node"].iloc[0]]
        return pd.DataFrame({"node": out_nodes, "label": label})

    tagged = labels.union(incident)  # schemas: (node,label) ∪ (node,far) → nulls fill
    flowed = tagged.groupby("node").map_groups(cogroup, batch_format="pandas")
    return flowed.groupby("node").aggregate(Min("label", alias_name="label"))


def cc_distributed(edges, num_partitions: int = 32, max_rounds: int = 50):
    """edges: Dataset(a,b) → Dataset(node, component) via hash-min rounds."""
    import pandas as pd
    import ray.data

    def init_labels(t: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([t["a"], t["b"]], ignore_index=True)
        out = pd.DataFrame({"node": nodes})
        out["label"] = out["node"]
        return out.drop_duplicates("node")  # per-batch partial dedup

    from ray.data.aggregate import Min

    labels = (
        edges.map_batches(init_labels, batch_format="pandas")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    for _ in range(max_rounds):
        new_labels = _propagate_round(labels, edges, num_partitions).materialize()
        # convergence: any label changed this round?
        old = labels.rename_columns({"label": "old_label"})
        joined = new_labels.join(old, "inner", num_partitions, on=("node",))
        changed = joined.map_batches(
            lambda t: pd.DataFrame({"c": [(t["label"] != t["old_label"]).sum()]}),
            batch_format="pandas",
        ).sum("c")
        labels = new_labels
        if not changed:
            break
    return labels.rename_columns({"label": "component"})


def canonical_map(alias_pairs: pd.DataFrame | "object", distributed: bool | None = None,
                  num_partitions: int = 32) -> pd.DataFrame:
    """alias pairs → pandas DataFrame(node, component), auto path choice.

    Accepts a pandas DataFrame(a,b) or a ray Dataset(a,b). The result is the
    canonical dimension table (vocab-scale) that downstream link stages
    broadcast.
    """
    import ray.data

    if isinstance(alias_pairs, pd.DataFrame):
        n_edges = len(alias_pairs)
        if distributed or (distributed is None and n_edges > DRIVER_CC_MAX_EDGES):
            ds = ray.data.from_pandas(alias_pairs)
            return cc_distributed(ds, num_partitions).to_pandas()
        return cc_local(alias_pairs)
    # ray Dataset input
    if distributed is False or (distributed is None and alias_pairs.count() <= DRIVER_CC_MAX_EDGES):
        return cc_local(alias_pairs.to_pandas())
    return cc_distributed(alias_pairs, num_partitions).to_pandas()
