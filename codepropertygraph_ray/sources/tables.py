"""External-table reader: read_parquet + schema-metadata hygiene.

The driver-generated testdata parquet (and any user-supplied file written
through pandas) carries a ``b"pandas"`` schema-metadata dict. Ray Data's
per-task schema dedup hashes block schemas and logs ``Failed to hash the
schemas (for deduplication): unhashable type: 'dict'`` for EVERY task that
touches such a block — pure log noise, but at fleet scale it floods the
log pipeline and masks real warnings. Files we write ourselves are already
stripped at the sink (functions/sink.py, pipelines/passes.py); external
reads go through this helper, which passes an explicitly stripped schema
to the read so every block is born clean (a post-read map_batches strip
would not help — the warning fires inside the read task itself).
"""

from __future__ import annotations

import os


def _clean_schema(path: str):
    """Schema of the first parquet under ``path``, metadata stripped.
    One tiny footer read on the driver; None when nothing is found."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return pq.read_schema(os.path.join(path, name)).remove_metadata()
        return None
    return pq.read_schema(path).remove_metadata()


def read_table(path: str, columns=None, **kw):
    """``ray.data.read_parquet`` over an external (possibly pandas-written)
    parquet file/dir, with schema metadata stripped at the source."""
    import pyarrow as pa
    import ray.data

    sch = _clean_schema(path)
    if sch is not None and columns is not None:
        # the read yields column-pruned batches; the explicit schema must
        # match them field-for-field
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kw)
