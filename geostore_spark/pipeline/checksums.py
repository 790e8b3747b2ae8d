"""Multihash checksum verification (V6) — distributed, constant-memory.

Mirrors /root/reference/geostore/check_files_checksums/utils.py:27-31,89-129:
a multihash is ``<uvarint fn-code><uvarint digest-length><digest>`` hex
encoded (sha2-256 = ``1220`` + 64 hex chars); the file is streamed in
chunks so memory stays constant regardless of object size — at the 100 TB
design point the ``binaryFile`` source is unusable (it materializes whole
files), so the executor streams from the filesystem inside ``mapInPandas``.

The reference decodes arbitrary multihash fn codes through py-multihash's
``FUNCS`` table (utils.py:27-31,92-110) and records unknown codes as an
explicit UNKNOWN_MULTIHASH_ERROR failure row; this module reproduces that
breadth with a hashlib-backed code table (sha1/sha2/sha3/md5 plus the
blake2b/blake2s code *ranges*, where the fn code encodes the digest size)
and the same failed-row-not-exception contract.

The reference fanned this out as an AWS Batch array job with one container
per asset index (task.py:45-69); Spark's task scheduling over partitions
replaces the manual index arithmetic (op V7) — ``repartition`` on the
asset rows is the whole fan-out story.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHUNK_SIZE = 8 * 1024 * 1024  # constant-memory streaming; reference used 1 KiB
SHA2_256_PREFIX = "1220"

RESULT_SCHEMA = (
    "url string, multihash string, actual_digest string, "
    "check string, result string, message string"
)

# Fixed fn-code → hashlib constructor table (multiformats registry names).
_FIXED_FUNCS = {
    0x11: hashlib.sha1,
    0x12: hashlib.sha256,
    0x13: hashlib.sha512,
    0x14: hashlib.sha3_512,
    0x15: hashlib.sha3_384,
    0x16: hashlib.sha3_256,
    0x17: hashlib.sha3_224,
    0x20: hashlib.sha384,
    0xD5: hashlib.md5,
}
# blake2b-8..blake2b-512: code 0xb201..0xb240, digest size = code - 0xb200
# blake2s-8..blake2s-256: code 0xb241..0xb260, digest size = code - 0xb240
_BLAKE2B_BASE, _BLAKE2B_MAX = 0xB200, 0xB240
_BLAKE2S_BASE, _BLAKE2S_MAX = 0xB240, 0xB260


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    """Decode an unsigned varint at ``pos``; returns (value, next_pos)."""
    value = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        byte = data[pos]
        value |= (byte & 0x7F) << shift
        pos += 1
        if not byte & 0x80:
            return value, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def decode_multihash(hex_multihash: str):
    """Parse a hex multihash into (fn_code, expected_digest_hex, hasher).

    Raises ValueError on malformed input or an unregistered fn code —
    callers turn that into an explicit Failed row, mirroring the
    reference's UNKNOWN_MULTIHASH_ERROR path
    (check_files_checksums/utils.py:92-106).
    """
    raw = bytes.fromhex(hex_multihash)
    code, pos = _read_uvarint(raw, 0)
    length, pos = _read_uvarint(raw, pos)
    digest = raw[pos:]
    if len(digest) != length:
        raise ValueError(
            f"declared digest length {length} != actual {len(digest)}"
        )
    if code in _FIXED_FUNCS:
        hasher = _FIXED_FUNCS[code]()
    elif _BLAKE2B_BASE < code <= _BLAKE2B_MAX:
        hasher = hashlib.blake2b(digest_size=code - _BLAKE2B_BASE)
    elif _BLAKE2S_BASE < code <= _BLAKE2S_MAX:
        hasher = hashlib.blake2s(digest_size=code - _BLAKE2S_BASE)
    else:
        raise ValueError(f"unsupported multihash fn 0x{code:x}")
    if hasher.digest_size != length:
        raise ValueError(
            f"digest length {length} != {hasher.name} size {hasher.digest_size}"
        )
    return code, digest.hex(), hasher


def _make_verify_batch(openers: dict):
    """Closure factory: reads go through the shipped opener snapshot
    (pipeline/io.py), and every failure files under the reference's
    check kind with its message shape (check_files_checksums/
    utils.py:88-155): multihash decode error → UNKNOWN_MULTIHASH_ERROR,
    missing file → FILE_NOT_FOUND, any other IO error →
    UNKNOWN_CLIENT_ERROR, hash compare → CHECKSUM Passed/Failed."""
    from geostore_spark.pipeline.io import open_url
    from geostore_spark.pipeline.validation import (
        CHECK_CHECKSUM,
        CHECK_FILE_NOT_FOUND,
        CHECK_UNKNOWN_CLIENT_ERROR,
        CHECK_UNKNOWN_MULTIHASH_ERROR,
    )

    def _verify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, multihash in zip(pdf["url"], pdf["multihash"]):
                if multihash is None:
                    out.append(
                        (url, None, None, CHECK_CHECKSUM, "Failed",
                         "missing multihash")
                    )
                    continue
                try:
                    _, expected, digest = decode_multihash(multihash)
                except ValueError as err:
                    out.append(
                        (url, multihash, None, CHECK_UNKNOWN_MULTIHASH_ERROR,
                         "Failed",
                         f"Multihash library '{err.__class__.__name__}' "
                         f"error validating '{url}': '{err}'. See "
                         "<https://github.com/multiformats/multihash> "
                         "for details.")
                    )
                    continue
                try:
                    with open_url(url, "rb", openers) as f:
                        while True:
                            chunk = f.read(CHUNK_SIZE)
                            if not chunk:
                                break
                            digest.update(chunk)
                    actual = digest.hexdigest()
                except FileNotFoundError:
                    out.append(
                        (url, multihash, None, CHECK_FILE_NOT_FOUND, "Failed",
                         f"Could not find asset file '{url}' "
                         "in staging bucket or in the Geostore.")
                    )
                    continue
                except OSError as err:
                    out.append(
                        (url, multihash, None, CHECK_UNKNOWN_CLIENT_ERROR,
                         "Failed",
                         f"Unknown client error fetching '{url}': '{err}'")
                    )
                    continue
                if expected == actual:
                    out.append(
                        (url, multihash, actual, CHECK_CHECKSUM, "Passed", None)
                    )
                else:
                    out.append(
                        (url, multihash, actual, CHECK_CHECKSUM, "Failed",
                         f"Checksum mismatch: expected {expected}, "
                         f"got {actual}")
                    )
            yield pd.DataFrame(
                out,
                columns=["url", "multihash", "actual_digest", "check",
                         "result", "message"],
            )

    return _verify_batch


def verify_checksums(asset_rows: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Stream-hash every DATA asset row (url, multihash) and compare.

    Repartitioning spreads assets across executors — each file is hashed
    exactly once, in chunks, wherever its task lands.
    """
    from geostore_spark.pipeline.io import opener_snapshot

    df = asset_rows.select("url", "multihash")
    if parallelism:
        df = df.repartition(parallelism)
    return df.mapInPandas(_make_verify_batch(opener_snapshot()), RESULT_SCHEMA)


def sha256_multihash(payload: bytes) -> str:
    return SHA2_256_PREFIX + hashlib.sha256(payload).hexdigest()
