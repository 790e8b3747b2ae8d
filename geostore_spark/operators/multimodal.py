"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface (BASELINE.json): at 100 TB, media rows are
``(id, content binary, media_type, meta map)`` in parquet — never
materialized whole-table; decode/feature work happens in Arrow-batched
``mapInPandas`` so each task holds one batch of payloads at a time and
partitioning carries straight through.

The container has no image/audio libraries, so the *codec* step is a
clearly-marked deterministic STUB (``_stub_decode``) behind a real-codec
try-import — the Spark-side plumbing (schema, batch shape, UDF signatures,
partition behavior) is real and is what the tests pin down. Swapping the
stub for PIL/ffmpeg changes no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table

DECODED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_bytes long, "
    "feature array<float>"
)
FRAME_SCHEMA = "doc_id long, frame_index int, frame_bytes long, frame_hash string"

FEATURE_DIM = 8


def _pil_decode(payload: bytes) -> tuple[int, int]:
    """Real codec path: PIL header decode. Falls back to the stub for
    payloads PIL can't parse (the fixture payloads are text bytes, not
    real images) so a codec error never kills the batch."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height
    except Exception:
        return _stub_decode(payload)


def _select_decoder():
    """Pick the codec by importability — never raises. PIL present →
    header decode with per-payload stub fallback; absent → stub."""
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        return _pil_decode
    return _stub_decode


def _stub_decode(payload: bytes) -> tuple[int, int]:
    """STUB codec: deterministic fake dimensions derived from the content
    hash. A real deployment replaces this with PIL/libvips — see
    decode_media's try-import. NOT a real decoder."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height


def _stub_features(payload: bytes) -> list[float]:
    """STUB feature extractor: deterministic 8-dim summary of the bytes
    (chunk means), standing in for a CNN/CLIP embedding."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * FEATURE_DIM
    chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
    return [float(round(c.mean() if c.size else 0.0, 4)) for c in chunks]


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo payload builder: treats the document text bytes as an opaque
    media payload with typed metadata — the storage shape media rows use."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("content"),
        F.lit("image/stub").alias("media_type"),
        F.create_map(F.lit("source"), F.lit("documents.text")).alias("meta"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode + feature-extract in Arrow batches. Each task sees an
    iterator of pandas batches — memory is bounded by batch size, not
    partition size; partitioning of the input carries through unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _select_decoder()  # real codec when available; STUB otherwise
        for pdf in it:
            rows = []
            for doc_id, content, media_type in zip(
                pdf["doc_id"], pdf["content"], pdf["media_type"]
            ):
                payload = bytes(content)
                width, height = decode(payload)
                rows.append(
                    (doc_id, media_type, width, height, len(payload), _stub_features(payload))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "width", "height", "n_bytes", "feature"],
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, r_width int, r_height int, thumb_hash string"


def resize_media(df: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize step for image-shaped payloads: aspect-preserving bound to
    ``max_side``. The pixel work is the STUB codec (deterministic
    dimensions + a content-derived thumb hash standing in for resampled
    bytes); the Spark shape — mapInPandas over binary columns, metadata
    computed per batch — is the real plumbing a PIL/libvips swap-in
    keeps."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content)
                width, height = _stub_decode(payload)
                scale = min(max_side / width, max_side / height, 1.0)
                r_w, r_h = max(1, int(width * scale)), max(1, int(height * scale))
                thumb = hashlib.md5(payload + f"{r_w}x{r_h}".encode()).hexdigest()
                rows.append((doc_id, width, height, r_w, r_h, thumb))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "r_width", "r_height", "thumb_hash"],
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 4096, every_n: int = 2) -> DataFrame:
    """Frame sampling for video-shaped payloads: split the byte stream into
    fixed-size frames, keep every Nth. Same batch-bounded mapInPandas
    shape; a real build swaps the splitter for a container demuxer."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content)
                frames = [
                    payload[i : i + frame_size] for i in range(0, len(payload), frame_size)
                ]
                for idx in range(0, len(frames), every_n):
                    frame = frames[idx]
                    rows.append(
                        (doc_id, idx, len(frame), hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "frame_bytes", "frame_hash"]
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


@register(
    "x_mm_decode",
    "Multimodal decode + feature extraction over binary media columns via "
    "Arrow-batched mapInPandas (codec stubbed; plumbing real). Python-side "
    "compute → no SQL oracle; driver runs the rows-only check.",
    None,
)
def q_mm_decode(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, "documents", sf)
    decoded = decode_media(attach_binary(docs))
    # The raw feature array<float> stays internal: the driver canonicalizer
    # sorts/hashes columns via pandas, which cannot hash list cells. Expose
    # scalar projections instead — a digest of the vector (exact equality
    # check) and its dimensionality.
    return (
        decoded.select(
            "doc_id",
            "media_type",
            "width",
            "height",
            "n_bytes",
            F.md5(F.to_json(F.col("feature"))).alias("feature_digest"),
            F.size("feature").alias("n_features"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "x_mm_resize",
    "Aspect-preserving resize over binary media columns (mapInPandas; "
    "codec stubbed, plumbing real). Python-side → rows-only driver check.",
    None,
)
def q_mm_resize(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, "documents", sf)
    return (
        resize_media(attach_binary(docs))
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "x_mm_frames",
    "Frame sampling for video-shaped payloads: fixed-size byte frames, "
    "every-Nth kept (mapInPandas demux stand-in). Rows-only driver check.",
    None,
)
def q_mm_frames(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, "documents", sf)
    return (
        sample_frames(attach_binary(docs))
        .orderBy("doc_id", "frame_index")
        .limit(200)
    )
