"""Dataflow semantics DSL — the `semanticsloader` analog.

The reference ships a tiny grammar (`dataflowengineoss/.../semanticsloader/
Parser.scala:34-76`, grammar exercised by `default.semantics`):

    "<operator>.assignment" 2->1
    "<operator>.sizeOf"

one line per flow-relevant name — a quoted name followed by zero or more
``src->dst`` integer mappings. A name declared WITH mappings propagates
taint along those argument positions; a name declared with NO mappings
kills propagation entirely (the engine consults `Semantics.forMethod` per
call site, `Engine.scala`); undeclared names use the default (propagate).

Transcript transposition: the flow unit is the REACHES edge and its
``variable`` (the mention key), so semantics are keyed by entity key.
``blocked_keys`` gives the kill set a flow query filters edges by — see
`pipelines/queries.reaches_paths_semantic`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class FlowSemantic:
    """One parsed line: name + (src, dst) argument-position mappings."""

    name: str
    mappings: tuple

    @property
    def propagates(self) -> bool:
        return len(self.mappings) > 0


_LINE = re.compile(r'^"((?:[^"\\]|\\.)*)"((?:\s+-?\d+\s*->\s*-?\d+)*)\s*(?:#.*)?$')
_MAP = re.compile(r"(-?\d+)\s*->\s*(-?\d+)")


def parse(text: str) -> dict[str, FlowSemantic]:
    """Parse a semantics document → {name: FlowSemantic}.

    Same grammar as the reference's ANTLR one (quoted name, ``N->M``
    pairs, ``#`` comments, blank lines), re-expressed as two regexes —
    the grammar is regular, no parse tree needed."""
    out: dict[str, FlowSemantic] = {}
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        m = _LINE.match(ln)
        if not m:
            raise ValueError(f"bad semantics line: {ln!r}")
        name = m.group(1).replace('\\"', '"')
        maps = tuple((int(a), int(b)) for a, b in _MAP.findall(m.group(2)))
        out[name] = FlowSemantic(name, maps)
    return out


def parse_file(path: str) -> dict[str, FlowSemantic]:
    with open(path, encoding="utf-8") as fh:
        return parse(fh.read())


def blocked_keys(sem: dict[str, FlowSemantic]) -> frozenset[str]:
    """Names declared with NO mappings — propagation killed at these."""
    return frozenset(k for k, v in sem.items() if not v.propagates)
