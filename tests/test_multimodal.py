"""Multimodal plumbing tests: schema, batch shape, determinism, partition
carry-through. The codec is a stub; the Spark plumbing is what's pinned."""

from __future__ import annotations

from geostore_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_binary,
    decode_media,
    sample_frames,
)
from geostore_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_decode_schema_and_determinism(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(20)
    decoded = decode_media(attach_binary(docs))
    assert decoded.columns == [
        "doc_id", "media_type", "width", "height", "n_bytes", "body_digest", "feature",
    ]
    rows1 = {r["doc_id"]: r for r in decoded.collect()}
    rows2 = {r["doc_id"]: r for r in decode_media(attach_binary(docs)).collect()}
    assert len(rows1) == 20
    for doc_id, row in rows1.items():
        assert 64 <= row["width"] < 256 and 64 <= row["height"] < 256
        assert row["n_bytes"] > 0
        assert len(row["feature"]) == FEATURE_DIM
        assert rows2[doc_id]["feature"] == row["feature"]  # deterministic stub


def test_decode_preserves_partitioning(spark):
    docs = load_table(spark, "documents", SF_DIR).repartition(7)
    decoded = decode_media(attach_binary(docs))
    assert decoded.rdd.getNumPartitions() == 7  # mapInPandas is per-partition


def test_frame_sampling_keeps_every_nth(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(5)
    frames = sample_frames(attach_binary(docs), frame_size=100, every_n=2)
    rows = frames.collect()
    assert rows and all(r["frame_index"] % 2 == 0 for r in rows)
    assert all(r["frame_bytes"] <= 100 for r in rows)


def test_resize_bounds_and_aspect(spark):
    from geostore_spark.operators.multimodal import resize_media

    docs = load_table(spark, "documents", SF_DIR).limit(10)
    rows = resize_media(attach_binary(docs), max_side=64).collect()
    assert len(rows) == 10
    for r in rows:
        assert max(r["r_width"], r["r_height"]) <= 64
        # aspect preserved within integer truncation
        assert abs(r["r_width"] / r["r_height"] - r["width"] / r["height"]) < 0.1
        assert len(r["thumb_hash"]) == 32


def test_wav_codec_round_trip():
    """The WAV path writes and parses genuine RIFF/WAVE bytes."""
    from geostore_spark.operators.multimodal import _decode_wav, _synth_wav

    payload = _synth_wav(b"hello world")
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    nch, sw, fr, nf, sum_sq = _decode_wav(payload)
    assert (nch, sw, fr, nf) == (1, 2, 8000, 11)
    expected = sum(((b - 128) * 256) ** 2 for b in b"hello world")
    assert sum_sq == expected


def test_bmp_codec_round_trip():
    """The BMP path writes and parses a genuine 24-bit BMP header."""
    from geostore_spark.operators.multimodal import _decode_bmp, _synth_bmp

    text = b"x" * 50
    payload = _synth_bmp(text)
    assert payload[:2] == b"BM"
    width, height, bpp, fsz, n, pix_sum = _decode_bmp(payload)
    assert bpp == 24 and width % 4 == 0
    assert n == width * height * 3
    assert fsz == 54 + n == len(payload)
    assert pix_sum == ord("x") * n  # constant tile


def test_bmp_decoder_rejects_non_bmp():
    import pytest

    from geostore_spark.operators.multimodal import _decode_bmp

    with pytest.raises(ValueError, match="not a BMP"):
        _decode_bmp(b"PN" + b"\x00" * 60)
