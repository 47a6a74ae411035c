"""Data-scaled shuffle widths (functions/agg.auto_buckets).

A fixed bucket count is the 100-TB failure mode: each bucket is 1/B of a
corpus-scale stream realized as ONE pandas frame in ONE task. The widths
must grow with input bytes the way run_base's block count does, and the
pipeline's results must be invariant to the width (bucketing is pure
partitioning, never semantics).
"""

from __future__ import annotations

import pyarrow.dataset as pads

SF_DIR = "/root/testdata/sf0.001"


def test_auto_buckets_scales_with_bytes(ray_session):
    from codepropertygraph_ray.functions.agg import (
        DEFAULT_BUCKETS,
        MAX_BUCKETS,
        TARGET_BUCKET_BYTES,
        auto_buckets,
    )

    floor = auto_buckets()
    assert floor >= DEFAULT_BUCKETS  # small inputs keep the cluster busy
    # tiny input stays at the floor; big input scales linearly in bytes
    assert auto_buckets(nbytes=1 << 20) == floor
    one_tib = auto_buckets(nbytes=1 << 40)
    assert one_tib == (1 << 40) // TARGET_BUCKET_BYTES > floor
    # 100 TB grows 100×; the cap bounds metadata blowup
    assert auto_buckets(nbytes=100 * (1 << 40)) == min(100 * one_tib, MAX_BUCKETS)
    assert auto_buckets(nbytes=1 << 60) == MAX_BUCKETS
    # row-count fallback also grows past the floor
    assert auto_buckets(rows=10_000_000_000) > floor


def test_bucket_width_invariance(ray_session, tmp_path, oracle_result):
    """Same graph at two forced corpus-exchange widths (narrow + prime)."""
    from codepropertygraph_ray.pipelines.kg import build_kg

    for nb in (3, 17):
        out = str(tmp_path / f"kg_nb{nb}")
        r = build_kg(SF_DIR, out, params={"num_buckets": nb})
        t = pads.dataset(r.ctx.delta_dir("link", "triples")).to_table().to_pandas()
        assert set(zip(t["subj"], t["pred"], t["obj"])) == oracle_result.triples
        nodes = pads.dataset(r.ctx.delta_dir("materialize", "nodes")).to_table()
        ents = nodes.to_pandas()
        ents = ents[ents["label"] == "ENTITY"]
        assert dict(zip(ents["full_name"], ents["is_external"])) == oracle_result.entities
        # validator stays zero-violation at any width
        import os

        vdir = r.ctx.delta_dir("validate", "violations")
        files = [f for f in os.listdir(vdir) if f.endswith(".parquet")]
        if files:
            v = pads.dataset(vdir).to_table()
            assert v.num_rows == 0, v.to_pydict()
