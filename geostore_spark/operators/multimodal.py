"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface (BASELINE.json): at 100 TB, media rows are
``(id, content binary, media_type, meta map)`` in parquet — never
materialized whole-table; decode/feature work happens in Arrow-batched
``mapInPandas`` so each task holds one batch of payloads at a time and
partitioning carries straight through.

Two REAL codec paths run with nothing beyond the standard library:
``x_mm_wav_decode`` synthesizes and parses genuine RIFF/WAVE PCM16 via
the stdlib ``wave`` module, and ``x_mm_bmp_decode`` parses genuine
uncompressed 24-bit BMP headers + pixel arrays via ``struct`` — any
real mono PCM WAV / bottom-up 24-bit BMP decodes through the same
functions. The remaining three queries use a deterministic synthetic
container — ``GSM1|<width>|<height>|<body>`` — whose header the decode
step genuinely PARSES from the bytes: in every case the decode output
is a pure function of the payload, so a DuckDB SQL oracle reproduces
every field and the driver hash-checks all five queries end to end.
Heavier codecs (JPEG/MP4) remain a try-import away (``_select_decoder``
prefers PIL when the payload isn't GSM1-containerized); swapping them
in changes no plan shape — the mapInPandas schema, batch shape, and
partition behavior are the same tested plumbing.

Payload text is ASCII in the fixtures, so the oracle's char-indexed
``substr``/``strlen`` agree with Python's byte slicing; the Python side
itself is byte-correct for any input.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostore_spark.registry import register
from geostore_spark.sources.tables import load_table, load_table_for_compute

DECODED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_bytes long, "
    "body_digest string, feature array<float>"
)
FRAME_SCHEMA = "doc_id long, frame_index int, frame_bytes long, frame_hash string"
RESIZED_SCHEMA = (
    "doc_id long, width int, height int, r_width int, r_height int, thumb_hash string"
)

FEATURE_DIM = 8
MAGIC = b"GSM1"


def _parse_container(payload: bytes) -> tuple[int, int, bytes]:
    """Parse the GSM1 container: ``GSM1|<width>|<height>|<body>``.
    Raises ValueError on a non-GSM1 payload (callers fall back to a real
    codec or reject the row)."""
    magic, width, height, body = payload.split(b"|", 3)
    if magic != MAGIC:
        raise ValueError(f"not a GSM1 container: {magic!r}")
    return int(width), int(height), body


def _pil_decode(payload: bytes) -> tuple[int, int, bytes]:
    """Real codec path: PIL header decode (dimensions from the image
    header; body = the full payload). Used when the payload isn't a
    GSM1 container and PIL is importable."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height, payload


def _select_decoder():
    """GSM1 parse first (the fixture container); non-GSM1 payloads go to
    PIL when available. Never raises at selection time."""
    import importlib.util

    has_pil = importlib.util.find_spec("PIL") is not None

    def decode(payload: bytes) -> tuple[int, int, bytes]:
        try:
            return _parse_container(payload)
        except ValueError:
            if has_pil:
                return _pil_decode(payload)
            raise

    return decode


def _stub_features(body: bytes) -> list[float]:
    """STUB feature extractor: deterministic 8-dim summary of the body
    bytes (chunk means), standing in for a CNN/CLIP embedding."""
    arr = np.frombuffer(body, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * FEATURE_DIM
    chunks = np.array_split(arr.astype(np.float32), FEATURE_DIM)
    return [float(round(c.mean() if c.size else 0.0, 4)) for c in chunks]


# SQL fragment shared by the three oracles: rebuild the exact container
# each decode parses. Header fields are simple char-math on the text so
# BOTH engines derive identical payloads.
_ORACLE_MEDIA_CTE = """
m AS (
  SELECT doc_id,
         'image/gsm1' AS media_type,
         CAST(64 + (length(text) % 192) AS INT) AS width,
         CAST(64 + ((7 * length(text) + ascii(substr(text, 1, 1))) % 192)
              AS INT) AS height,
         text AS body
  FROM documents
),
p AS (
  SELECT doc_id, media_type, width, height, body,
         'GSM1|' || width || '|' || height || '|' || body AS payload
  FROM m
)"""


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Payload builder: wrap the document text bytes in the GSM1 media
    container — the storage shape media rows use (opaque binary + typed
    metadata). Header dimensions are deterministic char-math on the text
    so the decode output is oracle-reproducible."""
    width = (64 + F.pmod(F.length(text_col), F.lit(192))).cast("int")
    height = (
        64
        + F.pmod(
            7 * F.length(text_col) + F.ascii(F.substring(text_col, 1, 1)),
            F.lit(192),
        )
    ).cast("int")
    header = F.concat(
        F.lit("GSM1|"),
        width.cast("string"),
        F.lit("|"),
        height.cast("string"),
        F.lit("|"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.concat(header, F.col(text_col)).cast("binary").alias("content"),
        F.lit("image/gsm1").alias("media_type"),
        F.create_map(F.lit("source"), F.lit("documents.text")).alias("meta"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode + feature-extract in Arrow batches. Each task sees an
    iterator of pandas batches — memory is bounded by batch size, not
    partition size; partitioning of the input carries through unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _select_decoder()
        for pdf in it:
            rows = []
            for doc_id, content, media_type in zip(
                pdf["doc_id"], pdf["content"], pdf["media_type"]
            ):
                payload = bytes(content)
                width, height, body = decode(payload)
                rows.append(
                    (
                        doc_id,
                        media_type,
                        width,
                        height,
                        len(payload),
                        hashlib.md5(body).hexdigest(),
                        _stub_features(body),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "width", "height", "n_bytes",
                    "body_digest", "feature",
                ],
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


def resize_media(df: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize step for image-shaped payloads: aspect-preserving bound to
    ``max_side``. Dimensions come from the parsed container header; the
    resampled-bytes stand-in is a content-derived thumb hash. The Spark
    shape — mapInPandas over binary columns, metadata computed per
    batch — is the plumbing a PIL/libvips swap-in keeps."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _select_decoder()
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content)
                width, height, _body = decode(payload)
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


FRAME_SIZE = 128  # fixture docs are 48-553 chars → several frames each
FRAME_EVERY_N = 2


@register(
    "x_mm_decode",
    "Multimodal decode + feature extraction over binary media columns via "
    "Arrow-batched mapInPandas. The decode genuinely parses the GSM1 "
    "container header from the bytes, so every output field is a pure "
    "function of the payload and the oracle reproduces it from the same "
    "documents table — integer header fields + body content digest "
    "(features stay internal: chunk-mean arrays aren't SQL-expressible).",
    f"""WITH {_ORACLE_MEDIA_CTE}
       SELECT doc_id, media_type, width, height,
              CAST(strlen(payload) AS BIGINT) AS n_bytes,
              md5(body) AS body_digest,
              CAST({FEATURE_DIM} AS INT) AS n_features
       FROM p ORDER BY doc_id LIMIT 200""",
)
def q_mm_decode(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    decoded = decode_media(attach_binary(docs))
    return (
        decoded.select(
            "doc_id",
            "media_type",
            "width",
            "height",
            "n_bytes",
            "body_digest",
            F.size("feature").alias("n_features"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "x_mm_resize",
    "Aspect-preserving resize over binary media columns (mapInPandas over "
    "the GSM1 container): parsed header dimensions, truncating integer "
    "scale math, and a payload-derived thumb digest — all reproduced by "
    "the SQL oracle, so the driver hash-checks the full output.",
    f"""WITH {_ORACLE_MEDIA_CTE},
       r AS (
         SELECT doc_id, width, height,
                GREATEST(1, CAST(trunc(width * LEAST(64.0 / width,
                                                     64.0 / height,
                                                     1.0)) AS INT)) AS r_width,
                GREATEST(1, CAST(trunc(height * LEAST(64.0 / width,
                                                      64.0 / height,
                                                      1.0)) AS INT)) AS r_height,
                payload
         FROM p
       )
       SELECT doc_id, width, height, r_width, r_height,
              md5(payload || r_width || 'x' || r_height) AS thumb_hash
       FROM r ORDER BY doc_id LIMIT 200""",
)
def q_mm_resize(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    return resize_media(attach_binary(docs)).orderBy("doc_id").limit(200)


@register(
    "x_mm_frames",
    "Frame sampling for video-shaped payloads: fixed-size byte frames over "
    "the GSM1 container, every-Nth kept (mapInPandas demux stand-in). "
    "Frame boundaries, sizes and md5 digests are byte-deterministic, so "
    "the oracle regenerates them with substr windows over the same "
    "payload.",
    f"""WITH {_ORACLE_MEDIA_CTE},
       idx AS (
         SELECT doc_id, payload,
                CAST(unnest(range(0, CAST(ceil(strlen(payload) / {FRAME_SIZE}.0)
                                          AS BIGINT))) AS INT) AS frame_index
         FROM p
       ),
       f AS (
         SELECT doc_id, frame_index,
                substr(payload, frame_index * {FRAME_SIZE} + 1,
                       {FRAME_SIZE}) AS frame
         FROM idx
       )
       SELECT doc_id, frame_index,
              CAST(strlen(frame) AS BIGINT) AS frame_bytes,
              md5(frame) AS frame_hash
       FROM f WHERE frame_index % {FRAME_EVERY_N} = 0
       ORDER BY doc_id, frame_index LIMIT 200""",
)
def q_mm_frames(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    return (
        sample_frames(attach_binary(docs), frame_size=FRAME_SIZE, every_n=FRAME_EVERY_N)
        .orderBy("doc_id", "frame_index")
        .limit(200)
    )


# -- real codec paths: WAV (stdlib wave) and BMP (struct) --------------------
#
# The GSM1 container above is the toy fixture format; these two paths
# synthesize and decode REAL formats with nothing but the standard
# library: RIFF/WAVE PCM16 parsed by ``wave`` (any real mono PCM WAV
# decodes through the same function) and uncompressed 24-bit BMP parsed
# by ``struct`` from the actual BITMAPFILEHEADER/BITMAPINFOHEADER.
# Sample/pixel data derives deterministically from the document text
# bytes, so a closed-form SQL oracle reproduces every decoded statistic
# — the driver hash-checks a genuine codec round-trip end to end.

WAV_FRAMERATE = 8000
WAV_SCHEMA = (
    "doc_id long, n_channels int, sample_width int, framerate int, "
    "n_frames long, sum_sq long, rms double, duration_ms double"
)
BMP_SCHEMA = (
    "doc_id long, width int, height int, bpp int, file_size long, "
    "n_pixel_bytes long, pix_sum long, mean_gray double"
)


def _synth_wav(text: bytes) -> bytes:
    """Render text bytes as a real mono PCM16 WAV: sample_i =
    (byte_i - 128) * 256."""
    import io
    import wave as wave_mod

    samples = (np.frombuffer(text, dtype=np.uint8).astype(np.int16) - 128) * 256
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_FRAMERATE)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL codec: parse the RIFF/WAVE header and PCM frames with the
    stdlib ``wave`` module (works on any mono/stereo PCM WAV, not just
    the synthesized fixtures)."""
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        fr = w.getframerate()
        nf = w.getnframes()
        raw = w.readframes(nf)
    arr = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    return nch, sw, fr, nf, int((arr * arr).sum())


def wav_pipeline(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize → decode real WAV payloads in Arrow batches. The
    decode step never sees the source text — only the WAV bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                payload = _synth_wav(text.encode("utf-8"))
                nch, sw, fr, nf, sum_sq = _decode_wav(payload)
                rms = (sum_sq / nf) ** 0.5 if nf else 0.0
                rows.append(
                    (doc_id, nch, sw, fr, nf, sum_sq, rms, nf * 1000.0 / fr)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_channels", "sample_width", "framerate",
                    "n_frames", "sum_sq", "rms", "duration_ms",
                ],
            )

    return df.select("doc_id", text_col).mapInPandas(batches, WAV_SCHEMA)


def _synth_bmp(text: bytes) -> bytes:
    """Render text bytes as a real uncompressed 24-bit BMP. Width is a
    multiple of 4 so rows need no padding; pixel bytes tile the text
    cyclically."""
    import struct

    # empty payload → single NUL byte, so the cyclic tiling below never
    # divides by zero (the oracle substitutes chr(0) identically)
    text = text or b"\x00"
    length = len(text)
    width = 16 + 4 * (length % 8)
    height = 16 + (3 * length) % 32
    n = width * height * 3
    reps = -(-n // length)
    pixels = (text * reps)[:n]
    header = struct.pack("<2sIHHI", b"BM", 54 + n, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, n, 2835, 2835, 0, 0
    )
    return header + info + pixels


def _decode_bmp(payload: bytes) -> tuple[int, int, int, int, int, int]:
    """REAL codec: parse BITMAPFILEHEADER + BITMAPINFOHEADER with
    ``struct`` and read the pixel array at the declared offset (any
    uncompressed bottom-up 24-bit BMP decodes through this)."""
    import struct

    magic, file_size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP: {magic!r}")
    (_hsz, width, height, _planes, bpp, comp, img_size) = struct.unpack_from(
        "<IiiHHII", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} comp={comp}")
    n = img_size or width * abs(height) * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=offset).astype(
        np.int64
    )
    return width, abs(height), bpp, file_size, n, int(arr.sum())


def bmp_pipeline(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize → decode real BMP payloads in Arrow batches."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                payload = _synth_bmp(text.encode("utf-8"))
                width, height, bpp, fsz, n, pix_sum = _decode_bmp(payload)
                rows.append(
                    (doc_id, width, height, bpp, fsz, n, pix_sum, pix_sum / n)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bpp", "file_size",
                    "n_pixel_bytes", "pix_sum", "mean_gray",
                ],
            )

    return df.select("doc_id", text_col).mapInPandas(batches, BMP_SCHEMA)


@register(
    "x_mm_wav_decode",
    "REAL audio codec path: document bytes rendered as mono PCM16 "
    "RIFF/WAVE, then decoded by the stdlib wave parser inside "
    "Arrow-batched mapInPandas — header fields (channels, sample "
    "width, framerate, frame count) come from the actual WAV header, "
    "energy (sum of squared samples, RMS) from the actual PCM frames. "
    "Samples are a fixed affine map of text bytes, so the oracle "
    "reproduces every statistic in closed form. Batch-bounded memory, "
    "partitioning carries through — the same plan at 100 TB.",
    f"""WITH s AS (
         SELECT doc_id, strlen(text) AS nf,
                list_sum(list_transform(
                  range(1, strlen(text) + 1),
                  i -> CAST((ascii(substr(text, i, 1)) - 128) * 256 AS BIGINT)
                       * ((ascii(substr(text, i, 1)) - 128) * 256)
                )) AS sum_sq
         FROM documents
       )
       SELECT doc_id, 1 AS n_channels, 2 AS sample_width,
              {WAV_FRAMERATE} AS framerate,
              CAST(nf AS BIGINT) AS n_frames,
              CAST(sum_sq AS BIGINT) AS sum_sq,
              sqrt(CAST(sum_sq AS DOUBLE) / nf) AS rms,
              nf * 1000.0 / {WAV_FRAMERATE} AS duration_ms
       FROM s ORDER BY doc_id LIMIT 200""",
)
def q_mm_wav(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    return wav_pipeline(docs).orderBy("doc_id").limit(200)


@register(
    "x_mm_bmp_decode",
    "REAL image codec path: document bytes tiled into an uncompressed "
    "24-bit BMP, then decoded by parsing the genuine "
    "BITMAPFILEHEADER/BITMAPINFOHEADER with struct and reading the "
    "pixel array at the declared offset — width/height/bpp/file size "
    "from the real header, intensity statistics from the real pixel "
    "bytes. Cyclic tiling gives the oracle a closed form "
    "(full_cycles * byte_sum + prefix remainder). Same mapInPandas "
    "plumbing as every media op.",
    """WITH src AS (
         -- empty payload → single NUL byte, mirroring _synth_bmp's guard
         SELECT doc_id,
                CASE WHEN text IS NULL OR text = '' THEN chr(0) ELSE text END
                  AS text
         FROM documents
       ),
       b AS (
         SELECT doc_id, text, strlen(text) AS len,
                16 + 4 * (strlen(text) % 8) AS w,
                16 + (3 * strlen(text)) % 32 AS h,
                list_sum(list_transform(
                  range(1, strlen(text) + 1),
                  i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)
                )) AS byte_sum
         FROM src
       ),
       c AS (
         SELECT doc_id, text, w, h, len, byte_sum,
                CAST(w * h * 3 AS BIGINT) AS n
         FROM b
       ),
       p AS (
         SELECT doc_id, w, h, n,
                (n // len) * byte_sum
                + COALESCE(list_sum(list_transform(
                    range(1, CAST(n % len AS INT) + 1),
                    i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), 0)
                  AS pix_sum
         FROM c
       )
       SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
              24 AS bpp, CAST(54 + n AS BIGINT) AS file_size,
              n AS n_pixel_bytes, CAST(pix_sum AS BIGINT) AS pix_sum,
              CAST(pix_sum AS DOUBLE) / n AS mean_gray
       FROM p ORDER BY doc_id LIMIT 200""",
)
def q_mm_bmp(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf)
    return bmp_pipeline(docs).orderBy("doc_id").limit(200)


# -- windowed audio features over real decoded PCM ---------------------------

WAV_WIN = 64  # frames per feature window
WAV_WIN_DOCS = 40  # doc budget for the windowed-feature demo query
WAV_WIN_SCHEMA = (
    "doc_id long, win_idx int, n_frames int, sum_sq long, peak int"
)


def wav_window_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Frame-window features (energy, peak) over REAL decoded PCM: each
    WAV is synthesized, parsed by the stdlib ``wave`` codec, and its
    sample array is folded into fixed 64-frame windows with exact
    integer energy/peak per window — the spectrogram-adjacent feature
    grid an audio curation pipeline computes before filtering. The
    mapInPandas stage emits window ROWS, so downstream ops see an
    ordinary (doc, window) table; memory per task is one batch of
    payloads, and window math is vectorized numpy."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wave_mod

        for pdf in it:
            ids, wins, ns, sqs, pks = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                payload = _synth_wav(text.encode("utf-8"))
                with wave_mod.open(io.BytesIO(payload), "rb") as w:
                    nf = w.getnframes()
                    raw = w.readframes(nf)
                arr = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                for wi in range(0, (len(arr) + WAV_WIN - 1) // WAV_WIN):
                    seg = arr[wi * WAV_WIN : (wi + 1) * WAV_WIN]
                    ids.append(doc_id)
                    wins.append(wi)
                    ns.append(len(seg))
                    sqs.append(int((seg * seg).sum()))
                    pks.append(int(np.abs(seg).max()) if len(seg) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": wins,
                    "n_frames": ns,
                    "sum_sq": sqs,
                    "peak": pks,
                }
            )

    return df.select("doc_id", text_col).mapInPandas(batches, WAV_WIN_SCHEMA)


@register(
    "x_mm_wav_windows",
    "Windowed audio features over REAL decoded PCM frames: fixed "
    f"{WAV_WIN}-frame windows with exact integer energy and peak "
    "amplitude per window, from samples the stdlib wave codec actually "
    "parsed back out of the synthesized RIFF container. The affine "
    "byte→sample map gives the oracle a closed form per window. Demo "
    f"query bounds itself to doc_id < {WAV_WIN_DOCS} via a pushed scan "
    "predicate.",
    f"""WITH d AS (
         SELECT doc_id, text, strlen(text) AS nf
         FROM documents WHERE doc_id < {WAV_WIN_DOCS}
       ),
       w AS (
         SELECT doc_id, text, nf,
                unnest(range(0, CAST(ceil(nf / {WAV_WIN}.0) AS INT))) AS win_idx
         FROM d
       ),
       seg AS (
         SELECT doc_id, win_idx,
                CAST(LEAST({WAV_WIN}, nf - win_idx * {WAV_WIN}) AS INT)
                  AS n_frames,
                list_transform(
                  range(win_idx * {WAV_WIN} + 1,
                        CAST(LEAST((win_idx + 1) * {WAV_WIN}, nf) AS INT) + 1),
                  i -> CAST((ascii(substr(text, i, 1)) - 128) * 256 AS BIGINT)
                ) AS samples
         FROM w
       )
       SELECT doc_id, CAST(win_idx AS INT) AS win_idx, n_frames,
              CAST(list_sum(list_transform(samples, x -> x * x)) AS BIGINT)
                AS sum_sq,
              CAST(list_max(list_transform(samples, x -> abs(x))) AS INT)
                AS peak
       FROM seg ORDER BY doc_id, win_idx""",
)
def q_mm_wav_windows(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table_for_compute(spark, "documents", sf).filter(F.col("doc_id") < WAV_WIN_DOCS)
    return wav_window_features(docs).orderBy("doc_id", "win_idx")


# -- intensity histogram over real decoded pixels ----------------------------

BMP_HIST_DOCS = 50
BMP_HIST_BUCKETS = 4  # byte >> 6


@register(
    "x_mm_bmp_histogram",
    "Pixel-intensity histogram over REAL decoded BMP pixel arrays: the "
    "payload parses through the same struct-decoded "
    "BITMAPFILEHEADER/BITMAPINFOHEADER path as x_mm_bmp_decode, and "
    f"the {BMP_HIST_BUCKETS}-bucket histogram (byte >> 6) is computed "
    "from the actual pixel bytes with vectorized numpy bincount. "
    "Cyclic tiling gives the oracle a closed form: full_cycles x "
    "per-text bucket counts + the prefix remainder. Demo query bounds "
    f"itself to doc_id < {BMP_HIST_DOCS} via a pushed scan predicate.",
    f"""WITH src AS (
         SELECT doc_id,
                CASE WHEN text IS NULL OR text = '' THEN chr(0) ELSE text END
                  AS text
         FROM documents WHERE doc_id < {BMP_HIST_DOCS}
       ),
       g AS (
         SELECT doc_id, text, strlen(text) AS len,
                CAST((16 + 4 * (strlen(text) % 8))
                     * (16 + (3 * strlen(text)) % 32) * 3 AS BIGINT) AS n
         FROM src
       ),
       b AS (
         SELECT doc_id, n, u.bucket,
                (n // len) * len(list_filter(
                   range(1, CAST(len AS INT) + 1),
                   i -> ascii(substr(text, i, 1)) // 64 = u.bucket))
                + len(list_filter(
                   range(1, CAST(n % len AS INT) + 1),
                   i -> ascii(substr(text, i, 1)) // 64 = u.bucket))
                  AS n_px
         FROM g, (SELECT unnest(range(0, {BMP_HIST_BUCKETS})) AS bucket) u
       )
       SELECT doc_id, CAST(bucket AS INT) AS bucket,
              CAST(n_px AS BIGINT) AS n_px
       FROM b ORDER BY doc_id, bucket""",
)
def q_mm_bmp_histogram(spark: SparkSession, sf: str) -> DataFrame:
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, buckets, counts = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _synth_bmp(text.encode("utf-8"))
                # real header parse: pixel offset + declared image size
                _magic, _fs, _r1, _r2, offset = struct.unpack_from(
                    "<2sIHHI", payload, 0
                )
                (_hsz, w, h, _pl, _bpp, _comp, img_size) = struct.unpack_from(
                    "<IiiHHII", payload, 14
                )
                n = img_size or w * abs(h) * 3
                arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=offset)
                hist = np.bincount(arr >> 6, minlength=BMP_HIST_BUCKETS)
                for bkt in range(BMP_HIST_BUCKETS):
                    ids.append(doc_id)
                    buckets.append(bkt)
                    counts.append(int(hist[bkt]))
            yield pd.DataFrame({"doc_id": ids, "bucket": buckets, "n_px": counts})

    docs = load_table_for_compute(spark, "documents", sf).filter(F.col("doc_id") < BMP_HIST_DOCS)
    return (
        docs.select("doc_id", "text")
        .mapInPandas(batches, "doc_id long, bucket int, n_px long")
        .orderBy("doc_id", "bucket")
    )


# -- REAL PNG codec path (stdlib zlib) ----------------------------------------

PNG_DOCS = 60


def _synth_png(text: bytes) -> bytes:
    """Render text bytes as a real 8-bit grayscale PNG: proper signature,
    IHDR/IDAT/IEND chunks with CRCs, zlib-compressed scanlines with
    filter type 0. Any standards-compliant PNG reader decodes it."""
    import struct
    import zlib

    text = text or b"\x00"
    width = 16 + len(text) % 48
    height = -(-len(text) // width)
    rows = b""
    for r in range(height):
        row = text[r * width : (r + 1) * width]
        row += b"\x00" * (width - len(row))  # pad the final scanline
        rows += b"\x00" + row  # filter type 0 (None) per scanline

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray8
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[int, int, int, int]:
    """REAL codec: validate the PNG signature, walk the chunk stream
    (verifying lengths), parse IHDR, inflate the concatenated IDAT
    stream with zlib, and defilter type-0 scanlines. Returns
    (width, height, n_pixels, pixel_sum)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, interlace) != (8, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    total = 0
    stride = width + 1
    for r in range(height):
        line = raw[r * stride : (r + 1) * stride]
        if line[0] != 0:
            raise ValueError(f"unsupported filter {line[0]}")
        total += sum(line[1:])
    return width, height, width * height, total


@register(
    "x_mm_png_decode",
    "REAL image codec path #2: document bytes rendered as a genuine "
    "8-bit grayscale PNG (signature, IHDR/IDAT/IEND chunks with CRCs, "
    "zlib-deflated type-0-filtered scanlines) and decoded by walking "
    "the chunk stream, inflating IDAT with stdlib zlib, and "
    "defiltering — a compressed container round-trip, unlike the "
    "uncompressed BMP/WAV paths. Pixel sum has a closed form (text "
    "byte sum + zero padding), so the oracle reproduces every field "
    "without a zlib implementation.",
    f"""WITH src AS (
         SELECT doc_id,
                CASE WHEN text IS NULL OR text = '' THEN chr(0) ELSE text END
                  AS text
         FROM documents WHERE doc_id < {PNG_DOCS}
       ),
       g AS (
         SELECT doc_id, strlen(text) AS len,
                16 + strlen(text) % 48 AS w,
                CAST(ceil(strlen(text) / (16 + strlen(text) % 48.0)) AS BIGINT)
                  AS h,
                list_sum(list_transform(
                  range(1, strlen(text) + 1),
                  i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))) AS byte_sum
         FROM src
       )
       SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
              CAST(w * h AS BIGINT) AS n_pixels,
              CAST(byte_sum AS BIGINT) AS pixel_sum
       FROM g ORDER BY doc_id""",
)
def q_mm_png(spark: SparkSession, sf: str) -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _synth_png(text.encode("utf-8"))
                w, h, n_px, px_sum = _decode_png(payload)
                rows.append((doc_id, w, h, n_px, px_sum))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_pixels", "pixel_sum"]
            )

    docs = load_table_for_compute(spark, "documents", sf).filter(F.col("doc_id") < PNG_DOCS)
    return (
        docs.select("doc_id", "text")
        .mapInPandas(batches, "doc_id long, width int, height int, n_pixels long, pixel_sum long")
        .orderBy("doc_id")
    )
