"""Debug/inspection sinks: DOT export and source-context dumping.

* ``conversation_dot`` — per-conversation Graphviz text, the analog of the
  reference's per-method DOT generators
  (`semanticcpg/.../dotgenerator/DotSerializer.scala`, `DotAstGenerator`,
  `DotCfgGenerator`, `DdgGenerator.scala:1-100`): a
  ``hash_groupby(conv_id → dot string)`` debug sink (SURVEY.md S11).
* ``dump_context`` — joins graph rows back to the transcript text around a
  location, the `CodeDumper.dump` analog
  (`semanticcpg/.../codedumper/CodeDumper.scala`): given (conv_id,
  turn_idx) targets, returns the surrounding turns' text (SURVEY.md S12).
"""

from __future__ import annotations

import pandas as pd

from ..functions.agg import hash_groupby
from ..functions.joins import broadcast_join



def _esc(s: str) -> str:
    return str(s).replace("\\", "\\\\").replace('"', '\\"')


def conversation_dot(sf_dir: str, which: str = "turns"):
    """→ Dataset (conv_id, dot): one Graphviz digraph per conversation.

    ``which='turns'`` draws the NEXT_TURN chain (CFG analog);
    ``which='mentions'`` adds TURN→MENTION containment (AST analog).
    """
    import ray.data

    cols = ["conv_id", "turn_idx", "role"]
    from ..sources.transcripts import read_transcripts

    ds = read_transcripts(sf_dir, columns=cols)

    def to_dot(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, grp in g.groupby("conv_id"):
            grp = grp.sort_values("turn_idx")
            lines = [f'digraph "{_esc(conv_id)}" {{']
            for r in grp.itertuples():
                lines.append(
                    f'  t{r.turn_idx} [label="{_esc(f"{r.turn_idx}:{r.role}")}"];'
                )
            idxs = grp["turn_idx"].tolist()
            for a, b in zip(idxs, idxs[1:]):
                lines.append(f"  t{a} -> t{b};")
            lines.append("}")
            rows.append({"conv_id": conv_id, "dot": "\n".join(lines)})
        return pd.DataFrame(rows, columns=["conv_id", "dot"])

    return hash_groupby(ds, "conv_id", to_dot)


def _dot_rows(conv_id, grp, edge_lines) -> dict:
    """Assemble one digraph: header + sorted node lines + edge lines."""
    lines = [f'digraph "{_esc(conv_id)}" {{']
    for r in grp.sort_values("turn_idx").itertuples():
        lines.append(
            f'  t{r.turn_idx} [label="{_esc(f"{r.turn_idx}:{r.role}")}"];'
        )
    lines.extend(edge_lines)
    lines.append("}")
    return {"conv_id": conv_id, "dot": "\n".join(lines)}


def conversation_dot_cfg(sf_dir: str):
    """→ Dataset (conv_id, dot): the conversation REPLY GRAPH (NEXT_TURN
    chain + user-skip edges — the graph the dominator overlay runs on),
    the `DotCfgGenerator.scala` analog."""
    from ..pipelines.kg import conv_graph_edges
    from ..sources.transcripts import read_transcripts

    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role"])

    def to_dot(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, grp in g.groupby("conv_id"):
            grp = grp.sort_values("turn_idx")
            edges = sorted(conv_graph_edges(
                grp["turn_idx"].to_numpy(), grp["role"].to_numpy()
            ))
            rows.append(_dot_rows(
                conv_id, grp, [f"  t{a} -> t{b};" for a, b in edges]
            ))
        return pd.DataFrame(rows, columns=["conv_id", "dot"])

    return hash_groupby(ds, "conv_id", to_dot)


def conversation_dot_cdg(sf_dir: str):
    """→ Dataset (conv_id, dot): per-conversation control-dependence edges
    (the CdgPass overlay), the `DotCdgGenerator.scala` analog. Recomputed
    in-bucket with the closed form that is property-tested equal to the
    CHK dominance-frontier run (functions/graph.py)."""
    from ..functions.graph import conv_dominators_frame
    from ..sources.transcripts import read_transcripts

    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role"])

    def to_dot(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        dom = conv_dominators_frame(g[["conv_id", "turn_idx", "role"]])
        cdg = dom[dom["kind"] == "cdg"]
        for conv_id, grp in g.groupby("conv_id"):
            e = cdg[cdg["conv_id"] == conv_id].sort_values(["a", "b"])
            rows.append(_dot_rows(
                conv_id, grp,
                [f"  t{a} -> t{b};" for a, b in zip(e["a"], e["b"])],
            ))
        return pd.DataFrame(rows, columns=["conv_id", "dot"])

    return hash_groupby(ds, "conv_id", to_dot)


def _turns_reaching_union(sf_dir: str, reaching_ds):
    """Tagged union of transcript turns ('t' rows) and reaching-overlay
    edges ('r' rows) — ONE conv_id-keyed exchange feeds the DDG/PDG
    flavors, no broadcast of either side."""
    from ..sources.transcripts import read_transcripts

    import numpy as np

    turns = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "role"]
    ).map_batches(
        lambda t: pd.DataFrame(
            {"conv_id": t["conv_id"],
             "turn_idx": t["turn_idx"].astype("int32"),
             "role": t["role"],
             "src_turn_idx": np.full(len(t), -1, np.int32),
             "dst_turn_idx": np.full(len(t), -1, np.int32),
             "variable": np.full(len(t), "", object),
             "kind": np.full(len(t), "t", object)}
        ),
        batch_format="pandas",
    )
    redges = reaching_ds.map_batches(
        lambda t: pd.DataFrame(
            {"conv_id": t["conv_id"],
             "turn_idx": np.full(len(t), -1, np.int32),
             "role": np.full(len(t), "", object),
             "src_turn_idx": t["src_turn_idx"].astype("int32"),
             "dst_turn_idx": t["dst_turn_idx"].astype("int32"),
             "variable": t["variable"].astype(object),
             "kind": np.full(len(t), "r", object)}
        ),
        batch_format="pandas",
    )
    return turns.union(redges)


def conversation_dot_ddg(sf_dir: str, reaching_ds):
    """→ Dataset (conv_id, dot): per-conversation REACHES (dataflow) edges
    labeled with their variable — the `DdgGenerator.scala:1-100` analog
    (edges carry the def'd variable like the reference's DDG edge labels).

    ``reaching_ds`` is the pipeline's reaching overlay (conv_id,
    src_turn_idx, dst_turn_idx, variable); it joins the transcript turns
    in ONE conv_id-bucketed exchange (tagged union, no broadcast)."""

    def to_dot(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, grp in g.groupby("conv_id"):
            t = grp[grp["kind"] == "t"]
            e = grp.loc[grp["kind"] == "r",
                        ["src_turn_idx", "dst_turn_idx", "variable"]]
            e = e.astype({"src_turn_idx": "int64", "dst_turn_idx": "int64"})
            e = e.sort_values(["src_turn_idx", "dst_turn_idx", "variable"])
            rows.append(_dot_rows(
                conv_id, t,
                [f'  t{a} -> t{b} [label="{_esc(v)}"];'
                 for a, b, v in zip(e["src_turn_idx"], e["dst_turn_idx"],
                                    e["variable"])],
            ))
        return pd.DataFrame(rows, columns=["conv_id", "dot"])

    return hash_groupby(_turns_reaching_union(sf_dir, reaching_ds),
                        "conv_id", to_dot)


def conversation_dot_pdg(sf_dir: str, reaching_ds):
    """→ Dataset (conv_id, dot): the PROGRAM-DEPENDENCE-GRAPH union view —
    control-dependence (CDG) edges ∪ dataflow (DDG) edges in ONE digraph,
    each edge labeled with its flavor (`dataflowengineoss/.../dotgenerator/
    DotPdgGenerator.scala`, test shape `DumpPdgTests.scala`; the flavor a
    user debugging dataflow dumps first). CDG edges recompute in-bucket
    from the turn rows (the closed form property-tested equal to the CHK
    dominance-frontier run, functions/graph.py); DDG edges come from the
    pipeline's reaching overlay via the same tagged conv-keyed union as
    the DDG flavor — ONE exchange, no broadcast. Edge lines sort by
    (src, dst, label) so 'CDG' edges precede 'DDG: var' labels at equal
    endpoints, matching the SQL oracle's string_agg order."""
    from ..functions.graph import conv_dominators_frame

    def to_dot(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        t_all = g[g["kind"] == "t"]
        dom = conv_dominators_frame(
            t_all[["conv_id", "turn_idx", "role"]].astype({"turn_idx": "int64"})
        )
        cdg_all = dom[dom["kind"] == "cdg"]
        for conv_id, grp in g.groupby("conv_id"):
            t = grp[grp["kind"] == "t"]
            c = cdg_all[cdg_all["conv_id"] == conv_id]
            e = grp.loc[grp["kind"] == "r",
                        ["src_turn_idx", "dst_turn_idx", "variable"]]
            lines = pd.DataFrame({
                "a": pd.concat([c["a"].astype("int64"),
                                e["src_turn_idx"].astype("int64")],
                               ignore_index=True),
                "b": pd.concat([c["b"].astype("int64"),
                                e["dst_turn_idx"].astype("int64")],
                               ignore_index=True),
                "lbl": pd.concat([pd.Series(["CDG"] * len(c), dtype=object),
                                  ("DDG: " + e["variable"].astype(object))
                                  .astype(object)],
                                 ignore_index=True),
            }).sort_values(["a", "b", "lbl"])
            rows.append(_dot_rows(
                conv_id, t,
                [f'  t{a} -> t{b} [label="{_esc(l)}"];'
                 for a, b, l in zip(lines["a"], lines["b"], lines["lbl"])],
            ))
        return pd.DataFrame(rows, columns=["conv_id", "dot"])

    return hash_groupby(_turns_reaching_union(sf_dir, reaching_ds),
                        "conv_id", to_dot)


def dump_context(sf_dir: str, targets: pd.DataFrame, around: int = 1):
    """targets: DataFrame(conv_id, turn_idx) → Dataset of the turns within
    ``around`` turns of each target, with text (CodeDumper analog).

    The big transcript table streams; the (small) target set broadcasts —
    text is fetched by key, never shuffled (SURVEY.md §7.4 wide strings).
    """
    import ray.data

    wanted: set = set()
    for r in targets.itertuples(index=False):
        for d in range(-around, around + 1):
            wanted.add((r.conv_id, int(r.turn_idx) + d))

    import ray

    ref = ray.put(frozenset(wanted))
    from ..functions.joins import get_broadcast

    from ..sources.transcripts import read_transcripts

    ds = read_transcripts(sf_dir, columns=["conv_id", "turn_idx", "role", "text"])

    def pick(t: pd.DataFrame) -> pd.DataFrame:
        w = get_broadcast(ref)
        mask = [
            (c, int(i)) in w for c, i in zip(t["conv_id"], t["turn_idx"])
        ]
        return t[pd.Series(mask, index=t.index)]

    return ds.map_batches(pick, batch_format="pandas")


def conversation_dot_cpg14(sf_dir: str, mentions_ds):
    """→ Dataset (conv_id, dot): the combined AST+CFG "whole-CPG" view —
    turn nodes plus their contained mention nodes, AST containment edges
    (turn → mention) and CFG reply-graph edges in ONE digraph, each edge
    labeled with its layer (`semanticcpg/.../dotgenerator/
    DotCpg14Generator.scala` — the reference's all-layers dump, sibling of
    the PDG flavor). Mention node labels use the normalized ``key`` (the
    escape-free alphabet), node ids are ``m<turn>_<ordinal>``.

    ``mentions_ds`` is the pipeline's mention slice (conv_id, turn_idx,
    ordinal, key); it joins the transcript turns in ONE conv_id-bucketed
    exchange (tagged union — no broadcast of either side)."""
    import numpy as np

    from ..pipelines.kg import conv_graph_edges
    from ..sources.transcripts import read_transcripts

    turns = read_transcripts(
        sf_dir, columns=["conv_id", "turn_idx", "role"]
    ).map_batches(
        lambda t: pd.DataFrame(
            {"conv_id": t["conv_id"],
             "turn_idx": t["turn_idx"].astype("int32"),
             "role": t["role"],
             "ordinal": np.full(len(t), -1, np.int32),
             "key": np.full(len(t), "", object),
             "kind": np.full(len(t), "t", object)}
        ),
        batch_format="pandas",
    )
    ments = mentions_ds.map_batches(
        lambda t: pd.DataFrame(
            {"conv_id": t["conv_id"],
             "turn_idx": t["turn_idx"].astype("int32"),
             "role": np.full(len(t), "", object),
             "ordinal": t["ordinal"].astype("int32"),
             "key": t["key"].astype(object),
             "kind": np.full(len(t), "m", object)}
        ),
        batch_format="pandas",
    )

    def to_dot(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, grp in g.groupby("conv_id"):
            t = grp[grp["kind"] == "t"].sort_values("turn_idx")
            m = grp[grp["kind"] == "m"].sort_values(["turn_idx", "ordinal"])
            lines = [f'digraph "{_esc(conv_id)}" {{']
            for r in t.itertuples():
                lines.append(
                    f'  t{r.turn_idx} [label="{_esc(f"{r.turn_idx}:{r.role}")}"];'
                )
            for r in m.itertuples():
                lines.append(
                    f'  m{r.turn_idx}_{r.ordinal} [label="{_esc(r.key)}"];'
                )
            for r in m.itertuples():
                lines.append(
                    f'  t{r.turn_idx} -> m{r.turn_idx}_{r.ordinal} [label="AST"];'
                )
            edges = sorted(conv_graph_edges(
                t["turn_idx"].to_numpy().astype("int64"),
                t["role"].to_numpy(),
            ))
            lines.extend(f'  t{a} -> t{b} [label="CFG"];' for a, b in edges)
            lines.append("}")
            rows.append({"conv_id": conv_id, "dot": "\n".join(lines)})
        return pd.DataFrame(rows, columns=["conv_id", "dot"])

    return hash_groupby(turns.union(ments), "conv_id", to_dot)
