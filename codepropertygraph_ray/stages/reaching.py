"""Reaching-mentions overlay — the dataflow (`REACHING_DEF`) analog.

The reference's `ReachingDefPass` runs a per-method gen/kill worklist and
emits `REACHING_DEF` edges carrying a `VARIABLE` property between
definitions and uses (`dataflowengineoss/.../passes/reachingdef/
ReachingDefPass.scala:27-103`, edge property `enhancements.json:256`).

Transcript transposition (SURVEY.md §8 "mention reaches later turn"): per
conversation, a mention of entity-key K in turn T *reaches* the next turn
that mentions K again — each new mention "kills" the previous one, exactly
the single-assignment gen/kill chain. The emitted overlay rows are

    (conv_id, src_turn_idx, dst_turn_idx, variable=K)

and become `REACHES` edges TURN→TURN with the key in the `variable`
property slot.

Execution shape: one bucketed shuffle by ``conv_id`` (conversations are
the natural group, as methods are for the reference), then a vectorized
shift within each (conv, key) run — no Python per-group loop; heavy-tailed
conversations cost one hot bucket, bounded by SipHash spread.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.agg import hash_groupby


def reaching_pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Bucket of whole conversations → consecutive same-key mention pairs.

    Vectorized across every (conv, key) run: sort by (conv, key, turn),
    pair row i with row i+1 where both keys match. Mentions of the same
    key in the SAME turn don't produce a self-pair (turn inequality)."""
    g = g.drop_duplicates(["conv_id", "key", "turn_idx"]).sort_values(
        ["conv_id", "key", "turn_idx"], ignore_index=True
    )
    if len(g) < 2:
        return _empty()
    same = (
        (g["conv_id"].shift(-1) == g["conv_id"])
        & (g["key"].shift(-1) == g["key"])
    ).to_numpy()
    same[-1] = False
    keep = same[:-1]
    t = g["turn_idx"].to_numpy()
    return pd.DataFrame(
        {
            "conv_id": g["conv_id"].to_numpy()[:-1][keep],
            "src_turn_idx": t[:-1][keep].astype("int32"),
            "dst_turn_idx": t[1:][keep].astype("int32"),
            "variable": g["key"].to_numpy()[:-1][keep],
        }
    )


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype="string"),
            "src_turn_idx": pd.Series([], dtype="int32"),
            "dst_turn_idx": pd.Series([], dtype="int32"),
            "variable": pd.Series([], dtype="string"),
        }
    )


def reaching_mentions(mentions_ds):
    """mentions Dataset (conv_id, turn_idx, key, …) → reaching-pair rows."""
    proj = mentions_ds.map_batches(
        lambda t: t[["conv_id", "turn_idx", "key"]].drop_duplicates(),
        batch_format="pandas",
    )
    return hash_groupby(proj, "conv_id", reaching_pairs_of_bucket)
