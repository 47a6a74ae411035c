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


def conv_dominators_frame(g):
    """Closed-form dom/pdom/cdg over conversation reply graphs, vectorized
    across every conversation in ``g`` (columns conv_id, turn_idx, role;
    any row order) → DataFrame(conv_id, kind∈{dom,pdom,cdg}, a, b).

    The reply graph (``pipelines.kg.conv_graph_edges``) is an interval
    DAG — NEXT_TURN chain plus skip edges between consecutive user turns
    — so the CHK fixpoint (`CfgDominator.scala:15-116`) collapses to a
    closed form (m dom n ⟺ no edge (x,y) with x < m < y ≤ n, and its
    mirror for post-dominators):

    * idom(n)  = previous user turn if n is a user turn entered by a skip
      edge, else the previous turn;
    * ipdom(n) = next user turn if n has an outgoing skip edge, else the
      next turn;
    * cdg: each skip edge (a, b) makes the turns strictly between a and b
      control-dependent on a (the classic diamond).

    Equality with the generic CHK run on the same edge lists is
    property-tested (tests/test_graph_and_overlays.py). Single-turn
    conversations contribute no rows, matching the generic pass."""
    import numpy as np
    import pandas as pd

    from .text import _grouped_arange

    g = g.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    n = len(g)
    empty = pd.DataFrame(
        {"conv_id": pd.Series(dtype="object"), "kind": pd.Series(dtype="object"),
         "a": pd.Series(dtype="int32"), "b": pd.Series(dtype="int32")}
    )
    if n == 0:
        return empty
    conv = g["conv_id"].to_numpy()
    t = g["turn_idx"].to_numpy(np.int64)
    user = g["role"].to_numpy() == "user"

    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = conv[1:] != conv[:-1]
    seg_id = np.cumsum(new_seg) - 1
    same_prev = ~new_seg
    same_next = np.zeros(n, dtype=bool)
    same_next[:-1] = ~new_seg[1:]

    prev_t = np.empty(n, dtype=np.int64)
    prev_t[0] = -1
    prev_t[1:] = t[:-1]
    next_t = np.empty(n, dtype=np.int64)
    next_t[-1] = -1
    next_t[:-1] = t[1:]

    # segment-isolated scans: per-segment offsets of BIG keep segments in
    # disjoint value ranges (turn_idx and positions are far below BIG, and
    # the NOUSER sentinel = BIG-1 stays inside its segment's range), so a
    # plain cummax/cummin never crosses a conversation boundary
    BIG = np.int64(1) << 40
    NOUSER = BIG - 1
    # last user turn at-or-before each row (forward cummax)
    x = np.where(user, t, np.int64(-1)) + seg_id * BIG
    cm = np.maximum.accumulate(x) - seg_id * BIG
    prev_user = np.full(n, np.int64(-1))
    prev_user[1:] = np.where(same_prev[1:], cm[:-1], np.int64(-1))
    # first user turn at-or-after each row: value and POSITION (reversed cummin)
    xr = (np.where(user, t, NOUSER) + seg_id * BIG)[::-1]
    nmr = np.minimum.accumulate(xr)[::-1] - seg_id * BIG
    next_user = np.full(n, NOUSER)
    next_user[:-1] = np.where(same_next[:-1], nmr[1:], NOUSER)
    pr = (np.where(user, np.arange(n), NOUSER) + seg_id * BIG)[::-1]
    npos = np.minimum.accumulate(pr)[::-1] - seg_id * BIG  # pos of user ≥ row

    frames = []
    md = same_prev
    if md.any():
        a_dom = np.where(
            user[md] & (prev_user[md] >= 0) & (t[md] > prev_user[md] + 1),
            prev_user[md], prev_t[md],
        )
        frames.append(pd.DataFrame(
            {"conv_id": conv[md], "kind": "dom", "a": a_dom, "b": t[md]}))
    mp = same_next
    if mp.any():
        a_pd = np.where(
            user[mp] & (next_user[mp] < NOUSER) & (next_user[mp] > t[mp] + 1),
            next_user[mp], next_t[mp],
        )
        frames.append(pd.DataFrame(
            {"conv_id": conv[mp], "kind": "pdom", "a": a_pd, "b": t[mp]}))
    # cdg: controllers = user rows with a skip edge AND ≥1 row between them
    # and the next user turn in sequence
    ctrl = user & (next_user < NOUSER) & (next_user > t + 1)
    if ctrl.any():
        cpos = np.flatnonzero(ctrl)  # ctrl ⇒ same_next ⇒ cpos+1 < n
        qpos = npos[cpos + 1].astype(np.int64)  # next user's position
        counts = qpos - cpos - 1
        keep = counts > 0
        cpos, counts = cpos[keep], counts[keep]
        if len(cpos):
            dep_idx = _grouped_arange(cpos + 1, counts)
            frames.append(pd.DataFrame(
                {"conv_id": conv[dep_idx], "kind": "cdg",
                 "a": np.repeat(t[cpos], counts), "b": t[dep_idx]}))
    if not frames:
        return empty
    out = pd.concat(frames, ignore_index=True)
    out["a"] = out["a"].astype("int32")
    out["b"] = out["b"].astype("int32")
    return out


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
