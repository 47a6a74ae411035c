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
  round's change-count aggregate is 0. One-hop propagation converges in
  O(diameter) rounds (NOT O(log d) — that would need pointer doubling);
  alias chains in practice are short, and exhausting ``max_rounds`` with
  changes still pending raises rather than silently returning an
  unconverged (wrong) map. Labels are materialized between rounds
  (vocab-scale tables) so rounds don't re-execute the whole lineage.
  Skewed giant components cost one hot groupby key; cap via
  ``max_rounds`` + salting upstream.

Both return the same mapping: ``node → component`` where the component
representative is the **lexicographically smallest member** (deterministic,
order-free — the content-hash-id discipline of SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
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


def _propagate_round(labels, edges, num_buckets: int):
    """One hash-min round: each node's label flows across incident edges.

    Join-free (no aggregator-actor pools that could starve a small
    cluster): TWO bucketed shuffles built from the engine's hash_groupby.

    * shuffle 1, keyed by the edge's NEAR endpoint: label rows and edge
      rows co-locate; every edge row emits (far, label[near]).
    * shuffle 2, keyed by node: min over candidate labels, and a
      ``changed`` flag vs the old label rides along for convergence.
    """
    import pandas as pd

    from .agg import hash_groupby

    def edge_msgs(t: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "key": pd.concat([t["a"], t["b"]], ignore_index=True),
                "far": pd.concat([t["b"], t["a"]], ignore_index=True),
            }
        )
        out["label"] = pd.Series([None] * len(out), dtype="object")
        return out[["key", "far", "label"]]

    def label_rows(t: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": t["node"], "far": pd.Series([None] * len(t), dtype="object"),
             "label": t["label"]}
        )

    tagged = edges.map_batches(edge_msgs, batch_format="pandas").union(
        labels.map_batches(label_rows, batch_format="pandas")
    )

    def flow(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: label lookup = a pandas hash join, never a
        # Python dict/list comprehension — this IS the >5M-edge scale path
        labs = g.loc[g["far"].isna(), ["key", "label"]]
        e = g.loc[g["far"].notna(), ["key", "far"]]
        em = e.merge(labs, on="key", how="left")
        out = pd.DataFrame(
            {
                "node": np.concatenate(
                    [em["far"].to_numpy(object), labs["key"].to_numpy(object)]
                ),
                "label": np.concatenate(
                    [em["label"].to_numpy(object), labs["label"].to_numpy(object)]
                ),
            }
        )
        # rows whose near endpoint had no label yet (first round edge cases)
        out = out.merge(
            labs.rename(columns={"key": "node", "label": "old"}),
            on="node",
            how="left",
        )
        return out.dropna(subset=["label"])

    candidates = hash_groupby(tagged, "key", flow, num_buckets=num_buckets)

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        # old is null on rows emitted from a foreign bucket; dropna before
        # min (mixing str and NaN breaks pandas' object-min)
        agg = g.groupby("node", as_index=False).agg(
            label=("label", "min"),
            old=("old", lambda s: s.dropna().min() if s.notna().any() else None),
        )
        agg["changed"] = (agg["old"].isna() | (agg["label"] != agg["old"])).astype(
            "int64"
        )
        return agg[["node", "label", "changed"]]

    return hash_groupby(candidates, "node", reduce_min, num_buckets=num_buckets)


def cc_distributed(edges, num_partitions: int = 32, max_rounds: int = 50):
    """edges: Dataset(a,b) → Dataset(node, component) via hash-min rounds.

    Labels are materialized between rounds (vocab-scale) so each round's
    lineage doesn't re-execute the previous ones; convergence = the
    ``changed`` sum of the round hitting 0 — O(diameter) rounds for
    one-hop propagation. Raises if ``max_rounds`` is exhausted while
    labels are still changing: an unconverged map would silently corrupt
    every downstream triple/entity (the canonical map is load-bearing).
    """
    import pandas as pd

    from .agg import hash_groupby

    def init_labels(t: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([t["a"], t["b"]], ignore_index=True)
        out = pd.DataFrame({"node": nodes})
        out["label"] = out["node"]
        return out.drop_duplicates("node")  # per-batch partial dedup

    labels = hash_groupby(
        edges.map_batches(init_labels, batch_format="pandas"),
        "node",
        lambda g: g.drop_duplicates("node"),
        num_buckets=num_partitions,
    ).materialize()

    changed = 0
    for _ in range(max_rounds):
        round_out = _propagate_round(labels, edges, num_partitions).materialize()
        changed = round_out.sum("changed") or 0
        labels = round_out.drop_columns(["changed"]).materialize()
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"cc_distributed did not converge in {max_rounds} rounds "
            f"({changed} labels still changing) — component diameter exceeds "
            "the round budget; raise max_rounds (or add pointer doubling)"
        )
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
    # ray Dataset input: materialize ONCE before the size probe so the
    # upstream lineage (an alias-pair scan of the base records delta) does
    # not execute twice — count() and the path taken both read the cache
    if distributed is True:
        return cc_distributed(alias_pairs.materialize(), num_partitions).to_pandas()
    pairs = alias_pairs.materialize()
    if distributed is False or pairs.count() <= DRIVER_CC_MAX_EDGES:
        return cc_local(pairs.to_pandas())
    return cc_distributed(pairs, num_partitions).to_pandas()
