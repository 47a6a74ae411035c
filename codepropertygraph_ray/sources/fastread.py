"""Construction-cheap parquet reads for many-part tables.

``ray.data.read_parquet`` prefetches per-file parquet metadata at
CONSTRUCTION time, on the driver: measured 3.5-4.6 s for the 408-part
edges delta at sf0.4, scaling with file count (a ~1,600-part sf1.6 delta
projects to ~15 s) — a pure width-independent serial term paid by every
pass that scans a many-part table, before a single read task runs.

``fast_read_parquet`` defers ALL file IO to the read tasks: the driver
only lists sizes (one os.stat per file), groups files size-balanced
(greedy LPT) into ``num_tasks`` groups, and emits a Dataset whose tasks
read their group with pyarrow directly. Same rows, same columns, same
task width — construction in milliseconds.

Trade-off vs the native read: blocks are file-group-granular (no
row-group splitting), so callers that need finer blocks than files
should keep the native read. Delta tables here are written one file per
task, so file granularity ≥ task granularity by construction.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _expand_files(src) -> list[str]:
    """One dir, one file, or a list of either → sorted parquet file list."""
    srcs = src if isinstance(src, (list, tuple)) else [src]
    files: list[str] = []
    for s in srcs:
        if os.path.isdir(s):
            files.extend(
                sorted(
                    os.path.join(s, f)
                    for f in os.listdir(s)
                    if f.endswith(".parquet")
                )
            )
        else:
            files.append(s)
    return files


def fast_read_parquet(src, columns: list[str] | None = None,
                      num_tasks: int | None = None,
                      batch_rows: int | None = None):
    """→ ray.data.Dataset over parquet ``src`` (dir / file list) with
    O(1)-per-file driver construction cost. ``num_tasks`` defaults to
    one per CPU (the repo-wide width policy, passes.blocks_per_cpu).

    ``batch_rows`` slices each group's output into ≤batch_rows-row
    tables. CAUTION for the FIRST consumer fused onto this read: do NOT
    pass ``batch_size=`` there — Ray's bundler counts the reader's
    1-row item blocks, so a 16k batch_size bundles EVERY group into ONE
    task (measured: the whole base pass serialized, 3 s → 49 s). Use
    ``batch_rows`` here instead; downstream operators past the first
    see real row counts and may batch freely."""
    import ray
    import ray.data

    from ..pipelines.passes import blocks_per_cpu

    files = _expand_files(src)
    if not files:
        raise FileNotFoundError(f"no parquet files under {src!r}")
    if num_tasks is None:
        ncpu = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        num_tasks = ncpu * blocks_per_cpu()
    sizes = np.array([os.path.getsize(f) for f in files], dtype=np.int64)
    G = max(1, min(int(num_tasks), len(files)))
    # greedy LPT: biggest file to the least-loaded group — bounds any
    # group at ~(max_file + total/G) bytes, so one oversized part can't
    # straggle a whole stage
    order = np.argsort(sizes)[::-1]
    groups: list[list[str]] = [[] for _ in range(G)]
    loads = np.zeros(G, dtype=np.int64)
    for i in order:
        g = int(np.argmin(loads))
        groups[g].append(files[i])
        loads[g] += sizes[i]

    cols = list(columns) if columns is not None else None

    def _read_group(batch: pd.DataFrame):
        import pyarrow.parquet as pqt

        for fs in batch["files"]:
            tabs = [pqt.read_table(f, columns=cols) for f in fs]
            tabs = [t for t in tabs if t.num_rows]
            if not tabs:
                continue
            t = (
                tabs[0]
                if len(tabs) == 1
                else pa.concat_tables(tabs, promote_options="default")
            )
            t = t.replace_schema_metadata(None)
            if batch_rows is None or t.num_rows <= batch_rows:
                yield t
            else:
                for off in range(0, t.num_rows, batch_rows):
                    yield t.slice(off, batch_rows)

    return ray.data.from_items(
        [{"files": g} for g in groups], override_num_blocks=G
    ).map_batches(_read_group, batch_size=1, batch_format="pandas")
