"""Single-threaded pure-Python oracle for the transcript KG.

This is the rebuild's stand-in for "the reference's emitted triples": an
obviously-correct, sequential implementation of the shared extraction spec
(schema.MENTION_RE / FACT_RE / NORM_STRIP_RE) against which the distributed
Ray pipeline is held to P/R ≥ 0.95 (BASELINE.json `north_rule`). It mirrors
the role of the reference's fixture suites, which compile a snippet with the
sequential frontend and assert exact graph shape
(`semanticcpg-tests/.../testfixtures/CodeToCpgSuite.scala:14-49`,
`fuzzyc2cpg/.../passes/CfgCreationPassTests.scala:17-60`).

Canonicalization semantics (the NamespaceCreator-groupby + NodeFilter-dedup
generalization, SURVEY.md §8): connected components over stated `alias_of`
mention-key pairs; canonical id of a component = lexicographically smallest
member key. Implemented here with a textbook union-find; the Ray pipeline
implements the same fixpoint with distributed hash-min label propagation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .schema import ALIAS_PRED, FACT_RE, MENTION_RE, NORM_STRIP_RE

_MENTION = re.compile(MENTION_RE)
_FACT = re.compile(FACT_RE)
_STRIP = re.compile(NORM_STRIP_RE)


def normalize(surface: str) -> str:
    """surface → mention key: lowercase, non-alnum runs → space, trim."""
    return _STRIP.sub(" ", surface.lower()).strip()


def extract_mentions(text: str) -> list[str]:
    """Surfaces in text order (non-overlapping, same as re/DuckDB re2)."""
    return _MENTION.findall(text)


def extract_facts(text: str) -> list[tuple[str, str, str]]:
    """(subj_surface, pred, obj_surface) per fact statement, text order."""
    return _FACT.findall(text)


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


@dataclass
class OracleResult:
    # (conv_id, turn_idx, ordinal, surface, key)
    mentions: list[tuple[str, int, int, str, str]] = field(default_factory=list)
    # (conv_id, turn_idx, subj_key, pred, obj_key) — alias facts included
    raw_facts: list[tuple[str, int, str, str, str]] = field(default_factory=list)
    canonical: dict[str, str] = field(default_factory=dict)  # key → canon key
    triples: set[tuple[str, str, str]] = field(default_factory=set)
    # key → is_external (True = never subject/object of a non-alias fact)
    entities: dict[str, bool] = field(default_factory=dict)


def run_oracle(rows: list[dict]) -> OracleResult:
    """rows: transcript dicts in any order; processed in stable
    (conv_id, turn_idx) order — the per-row invariant."""
    out = OracleResult()
    uf = UnionFind()
    for row in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        conv, ti, text = row["conv_id"], int(row["turn_idx"]), row["text"]
        for ordinal, surface in enumerate(extract_mentions(text)):
            out.mentions.append((conv, ti, ordinal, surface, normalize(surface)))
        for s, p, o in extract_facts(text):
            sk, ok = normalize(s), normalize(o)
            out.raw_facts.append((conv, ti, sk, p, ok))
            if p == ALIAS_PRED:
                uf.union(sk, ok)

    # every observed mention key is an entity node (TypeNodePass analog)
    keys = sorted({m[4] for m in out.mentions})
    for k in keys:
        uf.find(k)

    # canonical member = min key per component
    comp_min: dict[str, str] = {}
    for k in keys:
        r = uf.find(k)
        if r not in comp_min or k < comp_min[r]:
            comp_min[r] = k
    out.canonical = {k: comp_min[uf.find(k)] for k in keys}

    linked: set[str] = set()
    for conv, ti, sk, p, ok in out.raw_facts:
        cs = out.canonical.get(sk, sk)
        co = out.canonical.get(ok, ok)
        if p != ALIAS_PRED:
            out.triples.add((cs, p, co))
            linked.update((cs, co))
        else:
            linked.update((cs, co))

    canon_keys = sorted(set(out.canonical.values()))
    out.entities = {k: k not in linked for k in canon_keys}
    return out
