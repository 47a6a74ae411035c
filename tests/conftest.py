"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def kg_run(ray_session, tmp_path_factory):
    """Full KG pipeline at sf0.001, shared by all e2e assertions."""
    from codepropertygraph_ray.pipelines.kg import build_kg

    out = str(tmp_path_factory.mktemp("kg_out"))
    runner = build_kg(SF_DIR, out)
    return runner


@pytest.fixture(scope="session")
def oracle_result():
    """Single-threaded reference semantics over the same corpus."""
    import pyarrow.parquet as pq

    from codepropertygraph_ray.oracle import run_oracle
    from codepropertygraph_ray.sources.transcripts import ensure_transcripts

    rows = pq.read_table(ensure_transcripts(SF_DIR)).to_pylist()
    return run_oracle(rows)
