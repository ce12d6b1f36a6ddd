"""Multimodal columns: opaque binary payloads with typed metadata.

At 100 TB a training-data pipeline carries images/audio/video as
opaque ``binary`` columns next to typed metadata structs; decode and
feature extraction run as Arrow-batched Python over ``mapInPandas``
(the only sane place for codec libraries in a Spark job).  The
image/audio libraries are not installed in this container, so the
DECODE step is stubbed: ``_try_real_decode`` attempts a real library
import and otherwise produces a clearly-marked deterministic fake.
Everything around the stub — schema, struct layout, partitioning,
UDF signatures, Arrow batch shapes — is real and tested.

Executor-memory note: with multi-MB payloads, the Arrow batch size is
the knob that bounds peak memory per task — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` so batch_rows ×
payload_bytes fits comfortably (e.g. 64 rows for ~10 MB images);
the default 10k rows is tuned for scalar columns, not blobs.
"""

from __future__ import annotations

import hashlib

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Typed metadata carried beside every binary payload.
MEDIA_META_DDL = "format string, width int, height int, n_frames int"

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, checksum string, mean_byte double, decoder string"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_checksum string, frame_len int"


def with_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a synthetic binary payload + metadata struct (UTF-8 bytes
    of the text stand in for image data; dimensions derived
    deterministically from content)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    width = (F.length(text_col) % 64 + 1).cast("int")
    return docs.select(
        "doc_id",
        payload.alias("media_bytes"),
        F.struct(
            F.lit("fake-png").alias("format"),
            width.alias("width"),
            (F.length(text_col) / (F.length(text_col) % 64 + 1)).cast("int").alias("height"),
            (F.length(text_col) % 7 + 1).cast("int").alias("n_frames"),
        ).alias("media_meta"),
    )


def _try_real_decode(data: bytes):
    """Attempt a real image decode; None if no codec library exists
    (the container ships none — the deterministic fake below is the
    tested path)."""
    try:  # pragma: no cover - PIL absent in this environment
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(data))
    except Exception:
        return None


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: one feature row per payload.

    The fake decoder derives features only from the bytes themselves
    (length, md5, mean byte value), so results are deterministic and
    schema-stable — swapping in a real decoder changes the values, not
    the plumbing."""

    def decode(batches):
        for pdf in batches:
            payloads = pdf["media_bytes"]
            real = payloads.map(lambda b: _try_real_decode(bytes(b)) is not None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int32"),
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "mean_byte": payloads.map(
                        lambda b: round(sum(bytes(b)) / max(len(b), 1), 6)
                    ),
                    "decoder": real.map({True: "pillow", False: "fake-deterministic"}.get),
                }
            )

    return media.mapInPandas(decode, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for 'video' payloads: split the byte stream into
    media_meta.n_frames equal frames, keep every ``every``-th (1 -> N
    expansion through mapInPandas — the Arrow batch shape a real
    ffmpeg-backed sampler would use)."""

    def frames(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_checksum": [], "frame_len": []}
            for doc_id, blob, meta in zip(
                pdf["doc_id"], pdf["media_bytes"], pdf["media_meta"]
            ):
                data = bytes(blob)
                n = max(int(meta["n_frames"]), 1)
                size = max(len(data) // n, 1)
                for i in range(0, n, every):
                    chunk = data[i * size : (i + 1) * size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_checksum"].append(hashlib.md5(chunk).hexdigest())
                    out["frame_len"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(frames, FRAME_SCHEMA)
