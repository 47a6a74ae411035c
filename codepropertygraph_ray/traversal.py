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
    """Handle on the materialized nodes/edges parquet dirs.

    Accepts one dir or a LIST of overlay dirs per table: later overlays
    (e.g. tag passes) union onto the base graph in numeric-prefix order —
    the overlay-loader semantics of `ProtoCpgLoader.scala:57-75` /
    `CpgOverlayLoader.scala:23-45`."""

    def __init__(self, nodes_dir, edges_dir):
        self.nodes_dirs = [nodes_dir] if isinstance(nodes_dir, str) else list(nodes_dir)
        self.edges_dirs = [edges_dir] if isinstance(edges_dir, str) else list(edges_dir)

    @classmethod
    def from_runner(cls, runner) -> "GraphView":
        nd, ed = [], []
        # sorted by directory path = numeric overlay order
        for key, d in sorted(runner.ctx._dirs.items(), key=lambda kv: kv[1]):
            table = key.split("/", 1)[1]
            if table == "nodes":
                nd.append(d)
            elif table == "edges":
                ed.append(d)
        return cls(nd, ed)

    @staticmethod
    def _expand(dirs) -> list[str]:
        # read_parquet takes a LIST of file paths (dirs only as a scalar)
        import os

        files = []
        for d in dirs:
            if os.path.isdir(d):
                files.extend(
                    sorted(
                        os.path.join(d, f)
                        for f in os.listdir(d)
                        if f.endswith(".parquet")
                    )
                )
            else:
                files.append(d)
        return files

    def _nodes(self, columns=None):
        import ray.data

        from . import schema

        # default to the node schema's own columns: the materialize delta
        # is a union-schema partitioned table (nodes ∪ edges columns), so
        # an unqualified read would drag all-null edge columns into every
        # traversal frame
        if columns is None:
            columns = [f.name for f in schema.NODES_SCHEMA]
        return self._read(self._expand(self.nodes_dirs), columns)

    def _edges(self, columns=None):
        import ray.data

        from . import schema

        if columns is None:
            columns = [f.name for f in schema.EDGES_SCHEMA]
        return self._read(self._expand(self.edges_dirs), columns)

    @staticmethod
    def _read(files, columns):
        import ray.data

        if len(files) >= 32:  # skip the driver-serial metadata prefetch
            from .sources.fastread import fast_read_parquet

            return fast_read_parquet(files, columns=columns)
        return ray.data.read_parquet(files, columns=columns)

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

    def _label_filter(self, label: str) -> "Traversal":
        return self.filter_batches(lambda t, lb=label: t[t["label"] == lb])

    # --- typed structure steps (NodeTypeStarters.scala:10-315 /
    # Method.scala:19-157 / Call.scala:15-61 analogs, transcript domain) --
    def turns(self) -> "Traversal":
        """CONVERSATION → its TURN children (`.astChildren` typed)."""
        return self.out(schema.AST)._label_filter(schema.TURN)

    def conversation(self) -> "Traversal":
        """TURN → owning CONVERSATION (`.astParent` typed)."""
        return self.in_(schema.AST)._label_filter(schema.CONVERSATION)

    def mentions(self) -> "Traversal":
        """TURN → its MENTION children (CALL-site step analog)."""
        return self.out(schema.AST)._label_filter(schema.MENTION)

    def turn(self) -> "Traversal":
        """MENTION → containing TURN."""
        return self.in_(schema.AST)._label_filter(schema.TURN)

    def entity(self) -> "Traversal":
        """MENTION → linked canonical ENTITY (`Call.scala:15-61` `.method`
        resolution analog via the REF edge)."""
        return self.out(schema.REF)

    def refs(self) -> "Traversal":
        """ENTITY → its MENTIONs (`.callIn` analog)."""
        return self.in_(schema.REF)

    def facts(self) -> "Traversal":
        """ENTITY → entities it states facts about (callee step analog)."""
        return self.out(schema.FACT)

    def fact_sources(self) -> "Traversal":
        """ENTITY → entities stating facts about it (caller analog)."""
        return self.in_(schema.FACT)

    def next_turn(self) -> "Traversal":
        """TURN → successor turn (`.cfgNext`)."""
        return self.out(schema.NEXT_TURN)

    def prev_turn(self) -> "Traversal":
        """TURN → predecessor turn (`.cfgPrev`)."""
        return self.in_(schema.NEXT_TURN)

    def speaker(self) -> "Traversal":
        return self.out(schema.SPOKEN_BY)

    def tool(self) -> "Traversal":
        return self.out(schema.USES_TOOL)

    def dominates(self) -> "Traversal":
        """TURN → turns it immediately dominates (`.dominates` step,
        CfgNodeMethods.scala:1-103 analog over the DOMINATE overlay)."""
        return self.out(schema.DOMINATE)

    def post_dominates(self) -> "Traversal":
        return self.out(schema.POST_DOMINATE)

    def controls(self) -> "Traversal":
        """TURN → turns control-dependent on it (`.controls` over CDG)."""
        return self.out(schema.CDG)

    def order(self, n: int) -> "Traversal":
        """Filter by the ORDER property (`.order`/`.argument(i)` analog —
        order is data, never block position)."""
        return self.filter_batches(lambda t, n=n: t[t["order"] == n])

    def tags(self) -> "Traversal":
        """node → its TAG nodes (Tag.scala analog)."""
        return self.out(schema.TAGGED_BY)

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

    def new_tag_node(self, runner, name: str) -> None:
        """Tagging WRITE-BACK: persist this traversal's node set as a TAG
        overlay — `.newTagNode` (`semanticcpg/.../language/NodeSteps.scala:
        99-110`, `Tag.scala:1-78`). Appends a numbered pass dir holding one
        TAG node + a TAGGED_BY edge per tagged node; ledgered + resumable
        like any overlay (LayerCreator semantics). Re-open the graph with
        ``GraphView.from_runner`` to traverse `.tags()`."""
        tag_pass(runner, self, name)

    def location(self, sf_dir: str, snippet_chars: int = 80) -> pd.DataFrame:
        """Denormalized location records — the `.location` output helper
        (`semanticcpg/.../language/LocationCreator.scala:1-173` synthesizes
        NewLocation rows; the transcript transposition is (conv, turn) +
        a text snippet). Nodes without a (conv_id, turn_idx) anchor yield
        null locations, like the reference's empty-location fallback.

        Scale shape: traversal results are answer-sized; the corpus scan
        is a broadcast-key semi-filter over the pruned transcript read —
        text never shuffles (SURVEY.md §7.4)."""
        import ray

        from .functions.joins import get_broadcast
        from .sources.transcripts import read_transcripts

        nodes = self.to_pandas()
        out = nodes[["id", "label"]].copy()
        have = nodes.dropna(subset=["conv_id", "turn_idx"]) if {
            "conv_id", "turn_idx"
        } <= set(nodes.columns) else nodes.iloc[0:0]
        if not len(have):
            out["conv_id"] = None
            out["turn_idx"] = pd.array([None] * len(out), dtype="Int32")
            out["snippet"] = None
            return out
        convs = ray.put(frozenset(have["conv_id"]))
        ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "text"])
        rows = ds.map_batches(
            lambda t: t[t["conv_id"].isin(get_broadcast(convs))],
            batch_format="pandas",
        ).to_pandas()
        rows["snippet"] = rows["text"].str.slice(0, snippet_chars)
        merged = nodes.merge(
            rows[["conv_id", "turn_idx", "snippet"]],
            on=["conv_id", "turn_idx"], how="left",
        )
        merged["turn_idx"] = pd.array(merged["turn_idx"], dtype="Int32")
        return merged[["id", "label", "conv_id", "turn_idx", "snippet"]]

    def to_list(self) -> list[dict]:
        return self.to_pandas().to_dict("records")

    def to_json(self) -> str:
        return self.to_pandas().to_json(orient="records")

    def count(self) -> int:
        return self.ds.count()


def tag_pass(runner, traversal: "Traversal", name: str) -> None:
    """Write a traversal result as a ``tag_<name>`` delta overlay pass."""
    import numpy as np
    import pyarrow as pa

    from . import ids
    from .pipelines.kg import _edges_frame, _nodes_frame, sparse_to_table
    from .pipelines.passes import Pass

    tagged = traversal.to_pandas()[["id", "label"]]

    def run(ctx):
        tag_id = ids.node_id_scalar(schema.TAG, name)
        nodes = _nodes_frame(
            1, id=[tag_id], label=schema.TAG, name=name, full_name=name,
            overlay=f"tag_{name}",
        )
        edges = _edges_frame(
            len(tagged),
            src=tagged["id"].to_numpy(np.int64),
            dst=np.full(len(tagged), tag_id, dtype=np.int64),
            label=schema.TAGGED_BY,
            overlay=f"tag_{name}",
        )
        # frames are SPARSE (absent property columns omitted) — pad to the
        # full schema with typed nulls
        return {
            "nodes": sparse_to_table(nodes, schema.NODES_SCHEMA),
            "edges": sparse_to_table(edges, schema.EDGES_SCHEMA),
        }

    runner.run_extra(Pass(f"tag_{name}", run))
