"""codepropertygraph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the *capabilities* of m1cm1c/codepropertygraph
(a layered property-graph construction engine: base pass + additive overlay
passes + linking joins + validation + serialization — see /root/repo/SURVEY.md)
re-expressed over multi-turn conversation transcripts with Ray Data
primitives: ``read_parquet → sort → map_batches (actor pools) → joins /
groupby → write_parquet`` with streaming execution throughout.

Nothing here is a port: the reference is single-JVM Scala over OverflowDB;
this engine is tables-first (``nodes`` / ``edges`` / ``triples`` Arrow
datasets), content-hash ids instead of KeyPools, and delta-table overlays
instead of in-place graph mutation.
"""

__version__ = "0.1.0"
