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
    ``trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'))``.

    Factorize-dedups first (the ids.node_ids discipline): surfaces are
    entity names and repeat heavily, so the regex pipeline runs once per
    DISTINCT value — measured ~2× on the whole extract body."""
    codes, uniq = pd.factorize(s, use_na_sentinel=False)
    if len(uniq) >= len(s):  # nothing repeats — skip the gather
        return s.str.lower().str.replace(NORM_STRIP_RE, " ", regex=True).str.strip()
    norm = (
        pd.Series(uniq, dtype=s.dtype)
        .str.lower().str.replace(NORM_STRIP_RE, " ", regex=True).str.strip()
    )
    return pd.Series(norm.to_numpy()[codes], index=s.index, dtype=s.dtype)


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
        """Single-pass concatenated scan (round-5 measured rewrite): the
        whole batch's text joins into ONE string and each pattern runs ONE
        C-level ``finditer`` over it — Python work scales with the MATCH
        count, not the row count (pandas ``.str.extractall`` loops re calls
        per row). Measured 288 → 81 ms per 16k-row sf0.01 batch (3.5×, the
        A/B of VERDICT r4 item 8; numbers in BASELINE.md).

        Correctness of the join: the separator is ``]``, which no capture
        can contain (``[^\\]]``) — no match can span rows. The one artifact
        is an unterminated ``@[...`` row suffix "completed" by the
        separator; such a match ends AT the separator consuming nothing of
        the next row (the scan resumes exactly at the next row's start, so
        no legitimate match is shadowed) and is dropped by the span/row
        boundary check below."""
        batch = batch.reset_index(drop=True)
        text = batch["text"].astype("string").fillna("")
        conv = batch["conv_id"].to_numpy()
        tidx = batch["turn_idx"].to_numpy()
        n = len(batch)
        frames = []
        if n:
            arr = text.to_numpy(object)
            lens = np.fromiter((len(s) + 1 for s in arr), np.int64, n)
            ends = np.cumsum(lens)  # row i = big[ends[i-1] .. ends[i]-2]
            big = "]".join(arr) + "]"

            for kind, pat in (("mention", self.mention_pat),
                              ("fact", self.fact_pat)):
                spans_s, spans_e, groups = [], [], []
                for m in pat.finditer(big):
                    spans_s.append(m.start())
                    spans_e.append(m.end())
                    groups.append(m.groups() if kind == "fact" else m.group(1))
                if not spans_s:
                    continue
                s = np.asarray(spans_s, np.int64)
                e = np.asarray(spans_e, np.int64)
                rows = np.searchsorted(ends, s, side="right")
                # no match can span a ']' separator, so a match is invalid
                # only when it ENDS exactly at its row's separator (the
                # completed-prefix artifact): keep e < row end-of-text
                ok = e < ends[rows]
                rows = rows[ok]
                if not len(rows):
                    continue
                # per-row ordinal: matches arrive in scan order, so rows is
                # sorted and the ordinal is the offset into the row's run
                starts = np.flatnonzero(
                    np.concatenate(([True], rows[1:] != rows[:-1]))
                )
                counts = np.diff(np.concatenate((starts, [len(rows)])))
                ordinal = (
                    np.arange(len(rows)) - np.repeat(starts, counts)
                ).astype(np.int32)
                if kind == "mention":
                    g1 = pd.Series(
                        [g for g, k in zip(groups, ok) if k], dtype="object"
                    )
                    frames.append(pd.DataFrame({
                        "conv_id": conv[rows], "turn_idx": tidx[rows],
                        "kind": "mention", "ordinal": ordinal,
                        "surface": g1.to_numpy(),
                        "key": normalize_series(g1).to_numpy(),
                        "pred": "", "obj_surface": "", "obj_key": "",
                    }))
                else:
                    kept = [g for g, k in zip(groups, ok) if k]
                    g1 = pd.Series([g[0] for g in kept], dtype="object")
                    g2 = pd.Series([g[1] for g in kept], dtype="object")
                    g3 = pd.Series([g[2] for g in kept], dtype="object")
                    frames.append(pd.DataFrame({
                        "conv_id": conv[rows], "turn_idx": tidx[rows],
                        "kind": "fact", "ordinal": ordinal,
                        "surface": g1.to_numpy(),
                        "key": normalize_series(g1).to_numpy(),
                        "pred": g2.to_numpy(),
                        "obj_surface": g3.to_numpy(),
                        "obj_key": normalize_series(g3).to_numpy(),
                    }))

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
