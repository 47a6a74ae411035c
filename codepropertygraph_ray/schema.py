"""Graph schema for the transcript knowledge graph.

Plays the role of the reference's declarative, codegen'd schema JSONs
(`schema/src/main/resources/schemas/base.json:67-602` — node types with
allowed keys and allowed out-edges with degree cardinalities) transposed to
the transcript domain (SURVEY.md §8). Both the pipeline (builder) and the
validator pass consume these facts, mirroring how the reference's
cpgvalidator re-imports the generated schema facts
(`cpgvalidator/.../validators/OutFactsValidator.scala:19-105`).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Node labels (the reference's nodeTypes, base.json:67-602, transposed)
# ---------------------------------------------------------------------------

META_DATA = "META_DATA"
CONVERSATION = "CONVERSATION"  # FILE analog
TURN = "TURN"  # METHOD/statement analog (ordered by `order` = turn_idx)
MENTION = "MENTION"  # CALL-site analog (carries linking key `full_name`)
ENTITY = "ENTITY"  # TYPE/TYPE_DECL analog (canonical, deduped, sorted)
TOOL = "TOOL"  # dimension node
SPEAKER = "SPEAKER"  # dimension node

NODE_LABELS = [META_DATA, CONVERSATION, TURN, MENTION, ENTITY, TOOL, SPEAKER]

# ---------------------------------------------------------------------------
# Edge labels (base.json:616-636 + enhancements.json:247-258, transposed)
# ---------------------------------------------------------------------------

AST = "AST"  # CONVERSATION→TURN, TURN→MENTION (ORDER as data column)
NEXT_TURN = "NEXT_TURN"  # TURN→TURN, the CFG-successor analog
REF = "REF"  # MENTION→ENTITY, the linking edge (Linker.scala:33-42)
USES_TOOL = "USES_TOOL"  # TURN→TOOL (EVAL_TYPE-style dimension link)
SPOKEN_BY = "SPOKEN_BY"  # TURN→SPEAKER
CONTAINS = "CONTAINS"  # CONVERSATION→MENTION shortcut (ContainsEdgePass)
FACT = "FACT"  # ENTITY→ENTITY with `variable`=predicate
#   (the REACHING_DEF-with-VARIABLE-property analog, enhancements.json:256)

REACHES = "REACHES"  # TURN→TURN with `variable`=mention key — the
#   REACHING_DEF-with-VARIABLE dataflow overlay (enhancements.json:256,
#   ReachingDefPass.scala:27-103), see stages/reaching.py

DOMINATE = "DOMINATE"  # TURN→TURN immediate-dominator edge over the
#   conversation reply graph (CfgDominatorPass.scala:15-60 analog,
#   enhancements-internal.json:645)
POST_DOMINATE = "POST_DOMINATE"  # reverse-graph dominators (same pass)
CDG = "CDG"  # TURN→TURN control-dependence (CdgPass.scala:17-54 analog)

TAGGED_BY = "TAGGED_BY"  # node→TAG write-back (NodeSteps.scala:99-110)
TAG = "TAG"  # tag node label (enhancements.json TAG node analog)

NODE_LABELS = NODE_LABELS + [TAG]

EDGE_LABELS = [
    AST, NEXT_TURN, REF, USES_TOOL, SPOKEN_BY, CONTAINS, FACT, REACHES,
    DOMINATE, POST_DOMINATE, CDG, TAGGED_BY,
]

# Allowed (src_label, edge_label, dst_label) combos — the "outEdges" facts.
EDGE_FACTS: list[tuple[str, str, str]] = [
    (CONVERSATION, AST, TURN),
    (TURN, AST, MENTION),
    (TURN, NEXT_TURN, TURN),
    (MENTION, REF, ENTITY),
    (TURN, USES_TOOL, TOOL),
    (TURN, SPOKEN_BY, SPEAKER),
    (CONVERSATION, CONTAINS, MENTION),
    (ENTITY, FACT, ENTITY),
    (TURN, REACHES, TURN),
    (TURN, DOMINATE, TURN),
    (TURN, POST_DOMINATE, TURN),
    (TURN, CDG, TURN),
] + [(lbl, TAGGED_BY, TAG) for lbl in (CONVERSATION, TURN, MENTION, ENTITY)]

# Out-degree cardinality facts per (src_label, edge_label):
#   (min_out, max_out) with None = unbounded — the "0-1:n" style facts
#   of base.json (e.g. base.json:96-103).
OUT_DEGREE_FACTS: dict[tuple[str, str], tuple[int, int | None]] = {
    (CONVERSATION, AST): (1, None),  # every conversation has ≥1 turn
    (TURN, AST): (0, None),
    (TURN, NEXT_TURN): (0, 1),  # linear thread: at most one successor
    (MENTION, REF): (1, 1),  # every mention links to exactly one entity
    (TURN, USES_TOOL): (0, 1),
    (TURN, SPOKEN_BY): (1, 1),
    (CONVERSATION, CONTAINS): (0, None),
    (ENTITY, FACT): (0, None),
    (TURN, REACHES): (0, None),  # one per distinct key mentioned in the turn
    (TURN, DOMINATE): (0, None),  # idom tree fan-out unbounded
    (TURN, POST_DOMINATE): (0, None),
    (TURN, CDG): (0, None),
}

# In-degree cardinality facts per (dst_label, edge_label): (min_in, max_in)
# with None = unbounded — the InFactsValidator side of the schema
# (`cpgvalidator/.../validators/InFactsValidator.scala:12-60`: every node's
# incoming edges must satisfy the declared inEdges cardinalities).
IN_DEGREE_FACTS: dict[tuple[str, str], tuple[int, int | None]] = {
    (TURN, AST): (1, 1),  # every turn belongs to exactly one conversation
    (MENTION, AST): (1, 1),  # every mention sits in exactly one turn
    (TURN, NEXT_TURN): (0, 1),  # linear thread: at most one predecessor
    (MENTION, CONTAINS): (1, 1),  # ContainsEdgePass emits exactly one
    (ENTITY, REF): (0, None),  # external entities legitimately have zero;
    #   the ≥1-unless-external rule is the dedicated entity_ref_missing
    #   check (validator reads is_external per node)
}

# Property-key facts per node label — the KeysValidator analog
# (`cpgvalidator/.../validators/KeysValidator.scala:12-58`: every node must
# carry its type's required keys and nothing outside the allowed set). In
# the Arrow transposition "property present" means the sparse column is
# non-null, so each label maps to (required_props, optional_props); any
# other NODE_PROP_COLS column set on a node of that label is a violation.
# `id`, `label` and `overlay` are universal and not property keys.
NODE_PROP_COLS = ("name", "full_name", "code", "order", "conv_id",
                  "turn_idx", "is_external")

def node_prop_mask(t) -> "object":
    """uint16 bitmask per row of an Arrow nodes table: bit i set ⟺
    ``NODE_PROP_COLS[i]`` is non-null. Computed wherever a node frame is
    already in hand (the materialize/ingest dim writers) so the validator's
    KeysValidator checks never need a second full node scan."""
    import numpy as np
    import pyarrow.compute as pc

    pm = np.zeros(t.num_rows, dtype=np.uint16)
    for i, c in enumerate(NODE_PROP_COLS):
        pm |= pc.is_valid(t.column(c)).to_numpy(
            zero_copy_only=False
        ).astype(np.uint16) << i
    return pm


NODE_PROP_FACTS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    META_DATA: (("name", "full_name"), ()),
    CONVERSATION: (("name", "full_name", "conv_id"), ()),
    TURN: (("name", "full_name", "order", "conv_id", "turn_idx"), ()),
    MENTION: (("name", "full_name", "code", "order", "conv_id", "turn_idx"),
              ()),
    ENTITY: (("name", "full_name", "is_external"), ()),
    TOOL: (("name", "full_name"), ()),
    SPEAKER: (("name", "full_name"), ()),
    TAG: (("name", "full_name"), ()),
}

# ---------------------------------------------------------------------------
# User schema extension (samples/customcpg/schemas/myschema.json analog:
# the reference merges user JSON schemas over the base at build time)
# ---------------------------------------------------------------------------


def register_extension(node_labels=(), edge_facts=(), out_degree=None,
                       in_degree=None, node_props=None) -> None:
    """Merge user-supplied node labels, (src, edge, dst) facts and
    out-degree bounds into the active schema — the rebuild of the
    reference's layered user-schema merge (`samples/customcpg/README.md`).

    Driver-side registration is sufficient: the builder and validator
    capture the merged fact lists on the driver and ship them to workers
    via closures/broadcast (worker processes never consult this module's
    globals for schema facts)."""
    for nl in node_labels:
        if nl not in NODE_LABELS:
            NODE_LABELS.append(nl)
    for s, e, d in edge_facts:
        if e not in EDGE_LABELS:
            EDGE_LABELS.append(e)
        if (s, e, d) not in EDGE_FACTS:
            EDGE_FACTS.append((s, e, d))
    if out_degree:
        OUT_DEGREE_FACTS.update(out_degree)
    if in_degree:
        IN_DEGREE_FACTS.update(in_degree)
    if node_props:  # label → (required_props, optional_props); labels
        NODE_PROP_FACTS.update(node_props)  # absent here are unchecked


# ---------------------------------------------------------------------------
# Table schemas (the Arrow transposition of the property model, SURVEY.md §1.6)
# ---------------------------------------------------------------------------

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("label", pa.string()),
        ("name", pa.string()),
        ("full_name", pa.string()),  # canonical key — FULL_NAME analog
        ("code", pa.string()),  # surface text — CODE analog
        ("order", pa.int32()),  # ORDER analog (base.json:23)
        ("conv_id", pa.string()),  # provenance
        ("turn_idx", pa.int32()),  # provenance
        ("is_external", pa.bool_()),  # placeholder/stub flag (base.json:26)
        ("overlay", pa.string()),  # which pass emitted the row
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("label", pa.string()),
        ("variable", pa.string()),  # edge property slot (REACHING_DEF.VARIABLE)
        ("order", pa.int32()),  # child order as data, never block order
        ("overlay", pa.string()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),  # lineage: first stating conversation
        ("turn_idx", pa.int32()),  # lineage: first stating turn
    ]
)

# Predicate vocabulary of the synthetic corpus; `alias_of` is the
# canonicalization signal and never becomes a triple.
ALIAS_PRED = "alias_of"
FACT_PREDS = [
    "works_at",
    "located_in",
    "reports_to",
    "uses",
    "created",
    "partnered_with",
    "acquired",
    "depends_on",
]

# Extraction grammar (THE shared spec — the Ray stages, the pure-Python
# oracle and the DuckDB oracle SQL all implement exactly this):
#   mention   : @[Surface Form]            → regex MENTION_RE, in text order
#   fact      : @[subj] <pred> @[obj]      → regex FACT_RE (non-overlapping)
#   key       : lower(surface), non-[a-z0-9] runs → single space, trim
MENTION_RE = r"@\[([^\]]{1,200})\]"
FACT_RE = r"@\[([^\]]{1,200})\] <([a-z_]{1,40})> @\[([^\]]{1,200})\]"
NORM_STRIP_RE = r"[^a-z0-9]+"
