"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as opaque ``binary``
columns with typed metadata and run decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` stages. The image/audio codecs
are NOT in this container, so the decode kernel is STUBBED: a clearly
marked deterministic fake (or ``NotImplementedError`` in strict mode). The
Ray-side plumbing — schema, batch sizing for wide binary rows, actor
signature, output layout — is real and tested.

Scale notes (ray_guide 'Memory-aware'): binary payloads make rows wide, so
these stages run with SMALL ``batch_size`` and arrow batch format (pandas
would copy the buffers into object cells); block size is governed by
``DataContext.target_max_block_size``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),  # nullable metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16

# per-dim universal-hash rows ((a_i·h + b_i) mod P31) mod 2^24 — every
# constant < 2^31 so a_i·h < 2^62 stays int64/BIGINT-exact, making the
# fake features SQL-expressible (the poly-hash oracle precedent,
# functions/text.py POLY_*; oracle in __ray_entry__.oracle_sql)
_DIM_A_MULT = 2654435761
_DIM_B_MULT = 40503


def _mix_dims(base: np.ndarray) -> np.ndarray:
    """(n,) int64 hashes → (n, FEATURE_DIM) float32 in [0, 1). Each value
    is k/2^24 with k < 2^24, so float32 (and any float64 cast) is EXACT —
    the property the DuckDB oracle's bit-exact compare relies on."""
    from .text import POLY_P31

    dims = np.arange(FEATURE_DIM, dtype=np.int64)
    a = (dims * _DIM_A_MULT + 1) % POLY_P31
    b = (dims * _DIM_B_MULT + 7) % POLY_P31
    v = (a[None, :] * base[:, None] + b[None, :]) % POLY_P31
    return (v % (1 << 24)).astype(np.float32) / np.float32(1 << 24)


class MediaDecoder:
    """Actor-pool stage: media batch → fixed-dim feature vectors.

    ``__init__`` is where a real deployment loads the codec/model ONCE per
    actor (the reference's pass-state pattern, SURVEY.md §2.6). In this
    container there is no codec, so:

    * ``strict=True``  → raises NotImplementedError at decode time;
    * ``strict=False`` → deterministic fake features derived from the
      payload bytes via the repo's polynomial codepoint hash over the hex
      string — stable across runs and parallelism AND BIGINT-expressible,
      so the feature queries carry bit-exact DuckDB oracles.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        # real version: self.model = load_codec_and_model()  # once per actor

    def _fake_features(self, payloads: list[bytes | None]) -> np.ndarray:
        import pandas as pd

        from .text import POLY_P31, poly_hash

        base = poly_hash(
            pd.Series([(p or b"").hex() for p in payloads]), mod=POLY_P31
        )
        return _mix_dims(base)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "run with strict=False for deterministic fake features"
            )
        payloads = batch.column("payload").to_pylist()
        feats = self._fake_features(payloads)
        sizes = pa.array(
            [len(p) if p is not None else 0 for p in payloads], pa.int64()
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": sizes,
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), FEATURE_DIM
                ),
            }
        )


def decode_media(media_ds, batch_size: int = 64, concurrency=2, strict: bool = False):
    """media Dataset → features Dataset via the actor-pool decode stage.

    Small batch_size on purpose: payload bytes × batch_size × concurrency
    must fit each worker's heap (wide-binary-row rule)."""
    return media_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media(sf_dir: str, kind: str = "image"):
    """Deterministic fake media table derived from the documents table
    (payload = utf-8 text bytes) — gives the plumbing a real input without
    external data."""
    from ..sources.tables import read_table

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_pylist()
        n = len(text)
        payload = pa.array([(t or "").encode() for t in text], pa.binary())
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "kind": pa.array([kind] * n),
                "payload": payload,
                "mime": pa.array(["application/octet-stream"] * n),
                "width": pa.array([None] * n, pa.int32()),
                "height": pa.array([None] * n, pa.int32()),
                "duration_ms": pa.array([None] * n, pa.int32()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", batch_size=256)


def explode_features(ds, key_cols: list[str]):
    """vector rows → scalar rows (key_cols…, dim, value): the comparable
    surface for the feature queries — list columns can't be sorted/hashed
    by the oracle compare, exploded scalars can (and the poly-hash fakes
    are exact dyadic rationals, so float compare is bit-exact)."""

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        vals = (
            batch.column("features").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.float64)
        )
        cols = {
            c: pa.array(
                np.repeat(
                    batch.column(c).to_numpy(zero_copy_only=False), FEATURE_DIM
                )
            )
            for c in key_cols
        }
        cols["dim"] = pa.array(
            np.tile(np.arange(FEATURE_DIM, dtype=np.int32), n)
        )
        cols["value"] = pa.array(vals, pa.float64())
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


def media_features(sf_dir: str):
    """queries() surface: synthetic media → decode stub → exploded
    (media_id, kind, n_bytes, dim, value) — bit-exact DuckDB oracle via
    the poly-hash fake (oracle in __ray_entry__)."""
    return explode_features(
        decode_media(synthetic_media(sf_dir)), ["media_id", "kind", "n_bytes"]
    )


FRAME_EVERY_MS = 500


def synthetic_video(sf_dir: str):
    """Deterministic fake VIDEO table: payload = utf-8 text bytes,
    duration derived from payload length (1–6 s) — the frame-sampling
    plumbing gets a real variable-length input without external data."""
    from ..sources.tables import read_table

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        text = batch.column("text").to_pylist()
        n = len(text)
        payload = [(t or "").encode() for t in text]
        dur = [1000 + (len(p) % 5000) for p in payload]
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "kind": pa.array(["video"] * n),
                "payload": pa.array(payload, pa.binary()),
                "mime": pa.array(["video/fake"] * n),
                "width": pa.array([None] * n, pa.int32()),
                "height": pa.array([None] * n, pa.int32()),
                "duration_ms": pa.array(dur, pa.int32()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow", batch_size=256)


def sample_frames(media_ds, every_ms: int = FRAME_EVERY_MS, batch_size: int = 64):
    """video rows → frame rows (1→N flat map): one frame per ``every_ms``
    of duration, frame payload = the corresponding byte slice of the
    encoded stream (stub for a real seek+decode). The row fan-out stage of
    a video pipeline: small batches (wide binary rows × N frames), arrow
    end-to-end, deterministic output order via explicit frame_idx."""

    def explode(batch: pa.Table) -> pa.Table:
        mids, kinds, payloads, durs = (
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        )
        out_id, out_idx, out_ts, out_pay = [], [], [], []
        for mid, kind, pay, dur in zip(mids, kinds, payloads, durs):
            if kind != "video" or not dur:
                continue
            n_frames = max(int(dur) // every_ms, 1)
            pay = pay or b""
            step = max(len(pay) // n_frames, 1)
            for i in range(n_frames):
                out_id.append(mid)
                out_idx.append(i)
                out_ts.append(i * every_ms)
                out_pay.append(pay[i * step : (i + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "ts_ms": pa.array(out_ts, pa.int32()),
                "payload": pa.array(out_pay, pa.binary()),
            }
        )

    return media_ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)


class FrameFeaturizer(MediaDecoder):
    """Per-frame feature extraction (actor pool) — same decode stub, frame
    granularity; a real deployment would batch frames through the model."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        if self.strict:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "run with strict=False for deterministic fake features"
            )
        payloads = batch.column("payload").to_pylist()
        feats = self._fake_features(payloads)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "frame_idx": batch.column("frame_idx"),
                "ts_ms": batch.column("ts_ms"),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), pa.float32()), FEATURE_DIM
                ),
            }
        )


def featurize_frames(frames_ds):
    """frame rows → per-frame feature VECTORS (the operator surface the
    ANN/dedup stages consume; pytest asserts fan-out + determinism)."""
    return frames_ds.map_batches(
        FrameFeaturizer,
        fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )


def frame_features(sf_dir: str):
    """queries() surface: synthetic video → frame sampling → per-frame
    features, exploded to (media_id, frame_idx, ts_ms, dim, value) —
    bit-exact DuckDB oracle via the poly-hash fake (oracle in
    __ray_entry__)."""
    frames = featurize_frames(sample_frames(synthetic_video(sf_dir)))
    return explode_features(frames, ["media_id", "frame_idx", "ts_ms"])


def payload_dup_groups(sf_dir: str):
    """(media_id, dup_group) — EXACT media dedup by content digest: every
    payload md5-hashes in-task (content hashing is inherently per-blob
    CPU — the one legitimate per-row loop in this module), identical
    digests group, and the group labels with its MIN media id. The binary
    analog of exact text dedup; at 100 TB the digest map is the cheap
    first stage before any perceptual/embedding dedup."""
    import hashlib

    from .agg import hash_groupby

    ds = synthetic_media(sf_dir)

    def digest(batch: pa.Table) -> "pd.DataFrame":
        import pandas as pd

        ids_ = batch.column("media_id").to_numpy(zero_copy_only=False)
        pays = batch.column("payload").to_pylist()
        return pd.DataFrame(
            {"media_id": ids_,
             "digest": [hashlib.md5(p or b"").hexdigest() for p in pays]}
        )

    def per_bucket(g):
        grp = g.groupby("digest")["media_id"].transform("min")
        import pandas as pd

        return pd.DataFrame(
            {"media_id": g["media_id"].astype("int64"),
             "dup_group": grp.astype("int64")}
        )

    return hash_groupby(
        ds.map_batches(digest, batch_format="pyarrow", batch_size=256),
        "digest",
        per_bucket,
    )


def media_stats(sf_dir: str):
    """(kind, n_items, total_bytes) — metadata rollup over the media table.
    The payload is the documents' utf-8 text, so total_bytes is
    SQL-expressible (octet_length) and the media schema/payload plumbing
    sits under the exact-hash oracle gate."""
    import pandas as pd

    from .agg import hash_agg

    ds = synthetic_media(sf_dir)

    def partial(batch: pa.Table) -> "pd.DataFrame":
        import pyarrow.compute as pc

        kinds = batch.column("kind").to_pylist()
        sizes = pc.binary_length(batch.column("payload")).to_pylist()
        g = pd.DataFrame({"kind": kinds, "b": sizes, "n": 1})
        return g.groupby("kind", as_index=False).agg(
            n_items=("n", "sum"), total_bytes=("b", "sum")
        )

    return hash_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "kind",
        n_items=("n_items", "sum"),
        total_bytes=("total_bytes", "sum"),
    )


CHUNK_BYTES = 64


def chunk_payloads(sf_dir: str, chunk_bytes: int = CHUNK_BYTES):
    """(media_id, chunk_idx, n_bytes, chunk_hash) — fixed-size payload
    chunking: each opaque binary payload splits into ``chunk_bytes``
    pieces, one row per chunk with its exact content hash. THE
    scale-survival primitive for wide binary columns: a 100-GB media
    payload cannot ride one Arrow block, so shipping/dedup/storage all
    operate on bounded chunk rows (the pack_chunks counterpart on the
    binary side). Pure map stage — no shuffle; chunk rows bound block
    width regardless of payload size.

    Content hashes use the SQL-expressible polynomial hash over the hex
    encoding (the media_features convention), so the oracle reproduces
    every chunk's hash bit-exactly."""
    import pandas as pd

    from .text import POLY_P31, poly_hash

    ds = synthetic_media(sf_dir)

    def chunks(batch: pa.Table) -> "pd.DataFrame":
        ids = batch.column("media_id").to_pylist()
        pays = batch.column("payload").to_pylist()
        mids: list = []
        idxs: list = []
        hxs: list = []
        for mid, p in zip(ids, pays):
            hx = (p or b"").hex()
            n = (len(p or b"") + chunk_bytes - 1) // chunk_bytes
            for i in range(n):
                mids.append(mid)
                idxs.append(i)
                hxs.append(hx[i * 2 * chunk_bytes:(i + 1) * 2 * chunk_bytes])
        h = poly_hash(pd.Series(hxs, dtype=object), mod=POLY_P31)
        return pd.DataFrame(
            {"media_id": np.array(mids, np.int64),
             "chunk_idx": np.array(idxs, np.int64),
             "n_bytes": np.array([len(x) // 2 for x in hxs], np.int64),
             "chunk_hash": h}
        )

    return ds.map_batches(chunks, batch_format="pyarrow", batch_size=256)
