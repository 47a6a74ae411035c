"""TurnExtractor — the batched mention/fact extraction stage.

The base-construction analog of the reference's per-file frontend pass
(`fuzzyc2cpg/.../passes/AstCreationPass.scala:14-68` + the Solidity
ingestion walkers `FuzzyC2Cpg.scala:177-1488`): each transcript turn is
"parsed" into mention and fact records by a compiled grammar.

Ray-Data-first shape (SURVEY.md §2.6 row "Extractor … models"):

* a **callable class** run as an actor pool via
  ``map_batches(TurnExtractor, concurrency=N, batch_size=B)`` — patterns are
  compiled once per actor in ``__init__``, never per batch;
* the per-batch body is vectorized (`pandas .str.extractall`, C-level regex
  loop — no Python iteration over rows);
* ONE pass over the wide ``text`` column emits a single long-format record
  table (``kind ∈ {mention, fact}``); downstream passes filter/project it,
  so text is read exactly once and never enters a shuffle (SURVEY.md §7.4
  "wide string rows").

Soft-fail semantics: rows whose text is null extract nothing; nothing
throws — mirroring the reference's log-and-continue policy
(`AstCreationPass.scala:50-68`, `Linker.scala:244-266`).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..schema import FACT_RE, MENTION_RE, NORM_STRIP_RE

RECORD_COLUMNS = [
    "conv_id",
    "turn_idx",
    "kind",  # "mention" | "fact"
    "ordinal",  # occurrence index within the turn, per kind
    "surface",  # mention surface / fact subject surface
    "key",  # normalized mention key / fact subject key
    "pred",  # fact predicate ("" for mentions)
    "obj_surface",  # fact object surface ("" for mentions)
    "obj_key",  # fact object key ("" for mentions)
]


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized mention-key normalization — must agree byte-for-byte with
    ``oracle.normalize`` and the DuckDB oracle SQL expression
    ``trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'))``."""
    return s.str.lower().str.replace(NORM_STRIP_RE, " ", regex=True).str.strip()


class TurnExtractor:
    """Extraction stage: transcripts batch → long-format extraction records.

    Usable two ways:
    * as stateless tasks via ``extract_batch`` (default): the compiled
      extractor is cached once per worker PROCESS — same amortization as an
      actor pool, but elastic and with zero pool-startup latency (measured:
      tasks 2.6-3.9 s vs actor pool 4.6-4.9 s for the same sf0.1 extract);
    * as an actor pool via ``map_batches(TurnExtractor, concurrency=N)``
      when the state is genuinely heavy (model weights, big gazetteers) —
      the MinHasher stage (functions/dedup.py) keeps that shape.
    """

    def __init__(self) -> None:
        # once per actor/process (ParallelCpgPass-part analog)
        self.mention_pat = re.compile(MENTION_RE)
        self.fact_pat = re.compile(FACT_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        text = batch["text"].astype("string").fillna("")
        conv = batch["conv_id"].to_numpy()
        tidx = batch["turn_idx"].to_numpy()
        frames = []

        m = text.str.extractall(self.mention_pat)
        if len(m):
            rows = m.index.get_level_values(0).to_numpy()
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[rows],
                        "turn_idx": tidx[rows],
                        "kind": "mention",
                        "ordinal": m.index.get_level_values("match").to_numpy(np.int32),
                        "surface": m[0].to_numpy(),
                        "key": normalize_series(m[0]).to_numpy(),
                        "pred": "",
                        "obj_surface": "",
                        "obj_key": "",
                    }
                )
            )

        f = text.str.extractall(self.fact_pat)
        if len(f):
            rows = f.index.get_level_values(0).to_numpy()
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[rows],
                        "turn_idx": tidx[rows],
                        "kind": "fact",
                        "ordinal": f.index.get_level_values("match").to_numpy(np.int32),
                        "surface": f[0].to_numpy(),
                        "key": normalize_series(f[0]).to_numpy(),
                        "pred": f[1].to_numpy(),
                        "obj_surface": f[2].to_numpy(),
                        "obj_key": normalize_series(f[2]).to_numpy(),
                    }
                )
            )

        if not frames:
            out = pd.DataFrame({c: pd.Series([], dtype="object") for c in RECORD_COLUMNS})
            out["turn_idx"] = out["turn_idx"].astype("int32")
            out["ordinal"] = out["ordinal"].astype("int32")
            return out
        out = pd.concat(frames, ignore_index=True)[RECORD_COLUMNS]
        out["turn_idx"] = out["turn_idx"].astype("int32")
        out["ordinal"] = out["ordinal"].astype("int32")
        return out


# per-worker-process extractor cache for the stateless-task path
_PROCESS_EXTRACTOR: list[TurnExtractor] = []


def extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    if not _PROCESS_EXTRACTOR:
        _PROCESS_EXTRACTOR.append(TurnExtractor())
    return _PROCESS_EXTRACTOR[0](batch)
