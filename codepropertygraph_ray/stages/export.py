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
from ..sources.transcripts import ensure_transcripts


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

    ds = ray.data.read_parquet(
        ensure_transcripts(sf_dir), columns=["conv_id", "turn_idx", "role", "text"]
    )

    def pick(t: pd.DataFrame) -> pd.DataFrame:
        w = get_broadcast(ref)
        mask = [
            (c, int(i)) in w for c, i in zip(t["conv_id"], t["turn_idx"])
        ]
        return t[pd.Series(mask, index=t.index)]

    return ds.map_batches(pick, batch_format="pandas")
