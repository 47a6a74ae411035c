"""Determinism across parallelism levels — the StableOutputTests analog
(`fuzzyc2cpg/.../StableOutputTests.scala:8-29`, which asserts byte-identical
node dumps across 10 runs; here: two fresh processes at DIFFERENT
num_cpus must produce identical sorted triples + node id sets).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys; sys.path.insert(0, {repo!r})
import ray, logging
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
from codepropertygraph_ray.pipelines.kg import build_kg
import shutil
shutil.rmtree({out!r}, ignore_errors=True)
runner = build_kg("/root/testdata/sf0.001", {out!r})
import pyarrow.dataset as pads
tri = pads.dataset(runner.ctx.delta_dir("link", "triples")).to_table().to_pandas()
tri.sort_values(["subj", "pred", "obj"], ignore_index=True).to_parquet({tri_out!r})
nodes = pads.dataset(runner.ctx.delta_dir("materialize", "nodes")).to_table(
    columns=["id"]).to_pandas()
nodes.sort_values("id", ignore_index=True).to_parquet({nodes_out!r})
ray.shutdown()
"""


@pytest.mark.slow
def test_two_parallelism_levels_identical(tmp_path):
    outs = {}
    for ncpu in (2, 4):
        out = str(tmp_path / f"kg_{ncpu}")
        tri_out = str(tmp_path / f"tri_{ncpu}.parquet")
        nodes_out = str(tmp_path / f"nodes_{ncpu}.parquet")
        code = SCRIPT.format(repo=REPO, ncpu=ncpu, out=out,
                             tri_out=tri_out, nodes_out=nodes_out)
        subprocess.run([sys.executable, "-c", code], check=True,
                       capture_output=True, timeout=420)
        outs[ncpu] = (pd.read_parquet(tri_out), pd.read_parquet(nodes_out))
    tri2, nodes2 = outs[2]
    tri4, nodes4 = outs[4]
    pd.testing.assert_frame_equal(tri2, tri4)  # triples identical
    pd.testing.assert_frame_equal(nodes2, nodes4)  # node ids identical
