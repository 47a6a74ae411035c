"""Per-group graph algorithms — dominators, dominance frontier, closure.

Rebuild of the reference's per-method graph passes, which run a pure
algorithm on each method's small CFG inside a parallel pass:

* immediate dominators / post-dominators via the Cooper-Harvey-Kennedy
  "A Simple, Fast Dominance Algorithm" — postorder numbering + intersect
  loop (`semanticcpg/.../cfgdominator/CfgDominator.scala:15-116`, pass
  driver `CfgDominatorPass.scala:15-60`);
* control-dependence (CDG) via the dominance frontier of the reverse graph
  (`CfgDominatorFrontier.scala:14-38`, `CdgPass.scala:17-54`);
* bounded transitive closure (the `.repeat(...).dedup.emit` call-graph
  extension, `language/callgraphextension/Method.scala:9-78`).

Ray mapping (SURVEY.md §2.3 O19/O20): these are pure per-group functions —
run them inside ``groupby(conv_id).map_groups`` / ``hash_groupby`` where a
group is one conversation's graph. The functions themselves are
single-threaded on purpose: group-local graphs are small; parallelism
comes from the number of groups.
"""

from __future__ import annotations

from collections import defaultdict


def _postorder(succ: dict, entry) -> list:
    """Iterative DFS postorder from entry (recursion-free: group graphs are
    small but may be deep chains — a 500-turn conversation would blow the
    Python stack)."""
    seen = set()
    order = []
    stack = [(entry, iter(succ.get(entry, ())))]
    seen.add(entry)
    while stack:
        node, it = stack[-1]
        advanced = False
        for nxt in it:
            if nxt not in seen:
                seen.add(nxt)
                stack.append((nxt, iter(succ.get(nxt, ()))))
                advanced = True
                break
        if not advanced:
            order.append(node)
            stack.pop()
    return order


def immediate_dominators(edges: list[tuple], entry) -> dict:
    """(src,dst) edge list + entry → {node: idom} (entry maps to itself).

    Cooper-Harvey-Kennedy: process nodes in reverse postorder, intersect
    predecessor dominators by walking postorder indexes until fixpoint.
    Unreachable nodes are omitted (same as the reference, which only walks
    the reachable CFG)."""
    succ = defaultdict(list)
    pred = defaultdict(list)
    for s, d in edges:
        succ[s].append(d)
        pred[d].append(s)

    post = _postorder(succ, entry)
    number = {n: i for i, n in enumerate(post)}
    rpo = list(reversed(post))

    idom = {entry: entry}

    def intersect(a, b):
        while a != b:
            while number[a] < number[b]:
                a = idom[a]
            while number[b] < number[a]:
                b = idom[b]
        return a

    changed = True
    while changed:
        changed = False
        for node in rpo:
            if node == entry:
                continue
            new_idom = None
            for p in pred[node]:
                if p in idom:
                    new_idom = p if new_idom is None else intersect(p, new_idom)
            if new_idom is not None and idom.get(node) != new_idom:
                idom[node] = new_idom
                changed = True
    return idom


def post_dominators(edges: list[tuple], exit_node) -> dict:
    """Dominators of the reversed graph (ReverseCpgCfgAdapter analog)."""
    return immediate_dominators([(d, s) for s, d in edges], exit_node)


def dominance_frontier(edges: list[tuple], idom: dict) -> dict:
    """{node: set(frontier)} — Cooper-Harvey-Kennedy frontier walk
    (CfgDominatorFrontier.scala:14-38): for join points (≥2 preds), walk
    each predecessor's idom chain up to the join's idom, adding the join
    to every node passed."""
    pred = defaultdict(list)
    for s, d in edges:
        pred[d].append(s)
    df: dict = defaultdict(set)
    for node, ps in pred.items():
        if len(ps) < 2 or node not in idom:
            continue
        for p in ps:
            runner = p
            while runner in idom and runner != idom[node]:
                df[runner].add(node)
                if runner == idom[runner]:
                    break
                runner = idom[runner]
    return dict(df)


def control_dependence(edges: list[tuple], exit_node) -> list[tuple]:
    """CDG edges (controller, dependent) = dominance frontier over the
    REVERSE graph (CdgPass.scala:17-54)."""
    rev = [(d, s) for s, d in edges]
    ipdom = immediate_dominators(rev, exit_node)
    df = dominance_frontier(rev, ipdom)
    out = []
    for dependent, controllers in df.items():
        for c in controllers:
            out.append((c, dependent))
    return sorted(out)


def resolve_functional(f: dict, starts, max_depth: int = 100) -> dict:
    """Memoized resolution over a FUNCTIONAL edge map — the
    MemberAccessLinker analog (`MemberAccessLinker.scala` resolves nested
    member-access chains recursively with memoization and a depth cap of
    100 at lines 92-96): follow ``f`` from each start until the chain ends
    or the cap is hit; every node on a resolved path is memoized to its
    root (path compression), so each chain is walked once no matter how
    many starts share it.

    Callers must hand in an acyclic ``f`` (the KG query restricts to
    strictly-decreasing ``obj < subj`` edges); with cycles the cap still
    bounds the walk but memoized roots then depend on visit order."""
    memo: dict = {}

    def res(x):
        path = []
        cur = x
        for _ in range(max_depth):
            if cur in memo or cur not in f:
                break
            path.append(cur)
            cur = f[cur]
        root = memo.get(cur, cur)
        for p in path:
            memo[p] = root
        return root

    return {s: res(s) for s in starts}


def transitive_closure(edges: list[tuple], sources, max_depth: int = 100) -> dict:
    """BFS closure {source: set(reachable)} with the reference's depth cap
    (MemberAccessLinker.scala:92-96 caps recursion at 100)."""
    succ = defaultdict(list)
    for s, d in edges:
        succ[s].append(d)
    out = {}
    for src in sources:
        seen = set()
        frontier = [src]
        for _ in range(max_depth):
            nxt = []
            for n in frontier:
                for m in succ.get(n, ()):
                    if m not in seen:
                        seen.add(m)
                        nxt.append(m)
            if not nxt:
                break
            frontier = nxt
        out[src] = seen
    return out
