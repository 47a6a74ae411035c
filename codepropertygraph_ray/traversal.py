"""Thin lazy-traversal DSL over the materialized graph tables.

Rebuild of the reference's query surface (SURVEY.md §2.4): typed node-table
starters (`language/NodeTypeStarters.scala:10-315`), property filters
(`propertyaccessors/*.scala`), structure steps that expand along edges
(`AstNode.scala:1-221`, `Call.scala:15-61`), and bounded transitive
expansion (`callgraphextension/Method.scala:9-78`'s
``repeat(...).dedup.emit``).

The transposition is tables-first: a traversal holds a lazy Dataset of node
rows; each step is a vectorized filter or an edge hop. Edge hops broadcast
the current frontier's id set and semi-filter the edges table — frontier
sets are query-sized (≪ graph), so no shuffle is ever issued; a traversal
that genuinely needs a huge frontier should be a pipeline pass instead.
"""

from __future__ import annotations

import re

import pandas as pd

from . import schema


class GraphView:
    """Handle on the materialized nodes/edges parquet dirs."""

    def __init__(self, nodes_dir: str, edges_dir: str):
        self.nodes_dir = nodes_dir
        self.edges_dir = edges_dir

    @classmethod
    def from_runner(cls, runner) -> "GraphView":
        return cls(
            runner.ctx.delta_dir("materialize", "nodes"),
            runner.ctx.delta_dir("materialize", "edges"),
        )

    def _nodes(self, columns=None):
        import ray.data

        return ray.data.read_parquet(self.nodes_dir, columns=columns)

    def _edges(self, columns=None):
        import ray.data

        return ray.data.read_parquet(self.edges_dir, columns=columns)

    # --- starters (NodeTypeStarters analog) ------------------------------
    def all(self) -> "Traversal":
        return Traversal(self, self._nodes())

    def label(self, label: str) -> "Traversal":
        ds = self._nodes().map_batches(
            lambda t, lb=label: t[t["label"] == lb], batch_format="pandas"
        )
        return Traversal(self, ds)

    def conversations(self):
        return self.label(schema.CONVERSATION)

    def turns(self):
        return self.label(schema.TURN)

    def mentions(self):
        return self.label(schema.MENTION)

    def entities(self):
        return self.label(schema.ENTITY)

    def tools(self):
        return self.label(schema.TOOL)

    def speakers(self):
        return self.label(schema.SPEAKER)

    def id(self, *node_ids: int) -> "Traversal":
        wanted = set(int(i) for i in node_ids)
        ds = self._nodes().map_batches(
            lambda t: t[t["id"].isin(wanted)], batch_format="pandas"
        )
        return Traversal(self, ds)


class Traversal:
    """Lazy chain of filters/hops; immutable (each step → new Traversal)."""

    def __init__(self, view: GraphView, ds):
        self.view = view
        self.ds = ds

    # --- property filters (propertyaccessors analog) ---------------------
    def filter_batches(self, fn) -> "Traversal":
        return Traversal(self.view, self.ds.map_batches(fn, batch_format="pandas"))

    def name(self, regex: str) -> "Traversal":
        pat = re.compile(regex)
        return self.filter_batches(
            lambda t: t[t["name"].fillna("").str.match(pat)]
        )

    def name_exact(self, value: str) -> "Traversal":
        return self.filter_batches(lambda t: t[t["name"] == value])

    def full_name(self, regex: str) -> "Traversal":
        pat = re.compile(regex)
        return self.filter_batches(
            lambda t: t[t["full_name"].fillna("").str.match(pat)]
        )

    def has(self, **props) -> "Traversal":
        def f(t: pd.DataFrame) -> pd.DataFrame:
            for k, v in props.items():
                t = t[t[k] == v]
            return t

        return self.filter_batches(f)

    def external(self, flag: bool = True) -> "Traversal":
        return self.filter_batches(lambda t: t[t["is_external"] == flag])

    # --- structure steps (edge hops) -------------------------------------
    def _frontier_ids(self) -> set:
        return set(
            self.ds.map_batches(
                lambda t: t[["id"]].drop_duplicates(), batch_format="pandas"
            ).to_pandas()["id"]
        )

    def _hop(self, edge_label: str, forward: bool) -> set:
        """frontier ids → ids across edges of ``edge_label``."""
        import ray

        from .functions.joins import get_broadcast

        frontier = self._frontier_ids()
        ref = ray.put(frozenset(frontier))
        src, dst = ("src", "dst") if forward else ("dst", "src")

        def step(t: pd.DataFrame) -> pd.DataFrame:
            fr = get_broadcast(ref)
            e = t[(t["label"] == edge_label) & t[src].isin(fr)]
            return e[[dst]].drop_duplicates().rename(columns={dst: "id"})

        hops = self.view._edges(["src", "dst", "label"]).map_batches(
            step, batch_format="pandas"
        )
        return set(hops.to_pandas()["id"])

    def out(self, edge_label: str) -> "Traversal":
        return self.view.id(*self._hop(edge_label, forward=True))

    def in_(self, edge_label: str) -> "Traversal":
        return self.view.id(*self._hop(edge_label, forward=False))

    def repeat_out(self, edge_label: str, max_depth: int = 100, emit: bool = False) -> "Traversal":
        """Transitive out-expansion to fixpoint with visited-set dedup and
        the reference's depth cap (``repeat(...).dedup.emit`` +
        MemberAccessLinker.scala:92-96's depth 100)."""
        seen = self._frontier_ids() if emit else set()
        frontier = self._frontier_ids()
        for _ in range(max_depth):
            cur = Traversal(self.view, self.view.id(*frontier).ds)
            nxt = cur._hop(edge_label, forward=True) - seen
            if not nxt:
                break
            seen |= nxt
            frontier = nxt
        return self.view.id(*seen) if seen else self.view.id()

    # --- output helpers (Steps.scala:25-126 analog) ----------------------
    def to_pandas(self) -> pd.DataFrame:
        return self.ds.to_pandas().sort_values("id", ignore_index=True)

    def to_list(self) -> list[dict]:
        return self.to_pandas().to_dict("records")

    def to_json(self) -> str:
        return self.to_pandas().to_json(orient="records")

    def count(self) -> int:
        return self.ds.count()
