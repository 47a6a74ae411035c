"""Terminal parquet sink executed inside map tasks (plain pq.write_table).

Replaces ``Dataset.write_parquet`` throughout the engine. Ray's
ParquetDatasink routes every write task through
``pyarrow.dataset.write_dataset``, which drives the process-global Arrow
thread pool (sized to ALL cores) in every concurrent writer. Measured on
the 32-cpu box at sf0.4 (~35M rows, ~0.5 GB zstd output): the Write
operator burned ~1,300 s of remote wall (~30 µs/row, 41 bundled tasks ×
~32 s each) while 32 concurrent single-threaded ``pq.write_table`` calls
finish the same rows in ~3.5 s — a ~13× inflation purely from
writers × cores/writer thread oversubscription, and it grows with CPU
count, which is exactly what flattened the 8→32 scaling curve (the write
floor was the pipeline's dominant non-scaling term).

This sink keeps exactly one single-threaded writer per task: a
``map_batches`` stage that writes each block (optionally split by a
partition column) with ``pq.write_table`` and emits a tiny per-file
summary row; consuming the summary Dataset drives the execution. The
write fuses into the producing map task — no extra barrier, no
scheduling round-trip, and the file layout is one file per producer
task, i.e. block-sized files (the Ray-native resumable layout; at real
scale blocks are ~128 MB so files are too).

Multi-node note: tasks write to ``out_dir`` directly, so on a cluster it
must be shared storage (object store / NFS / s3-fuse) — the same
assumption the pass framework's side-written deltas already make
(pipelines/passes.py side_dir).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_SUMMARY_SCHEMA = pa.schema(
    [("file", pa.string()), ("rows", pa.int64()), ("bytes", pa.int64())]
)


def sink_parquet(
    ds,
    out_dir: str,
    partition_col: str | None = None,
    compression: str = "zstd",
) -> list[dict]:
    """Write ``ds`` under ``out_dir``; returns per-file summary dicts.

    With ``partition_col``, each block is split by that column's values
    into ``out_dir/<value>/`` subdirectories (the column itself is
    dropped from the written files — hive-style semantics without the
    ``col=value`` dir naming, matching the pass framework's plain
    delta-table layout).
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        # strip pandas metadata: Ray's read-side schema dedup can't hash
        # dict metadata and logs a warning per downstream read task
        t = t.replace_schema_metadata(None)
        fname = f"part-{uuid.uuid4().hex}.parquet"
        if partition_col is None:
            parts = [(out_dir, t)]
        else:
            col = t[partition_col]
            parts = [
                (
                    os.path.join(out_dir, str(v)),
                    t.filter(pc.equal(col, v)).drop_columns([partition_col]),
                )
                for v in pc.unique(col).to_pylist()
            ]
        names, rows, sizes = [], [], []
        for d, sub in parts:
            if sub.num_rows == 0:
                continue
            os.makedirs(d, exist_ok=True)
            p = os.path.join(d, fname)
            pq.write_table(sub, p, compression=compression)
            names.append(os.path.relpath(p, out_dir))
            rows.append(sub.num_rows)
            sizes.append(os.path.getsize(p))
        return pa.table(
            {"file": names, "rows": rows, "bytes": sizes}, schema=_SUMMARY_SCHEMA
        )

    summary = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).take_all()
    return summary
