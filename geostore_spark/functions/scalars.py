"""Scalar Column functions — the reference's string/key/URL kit as
reusable, codegen-friendly expressions (SURVEY §2.7, F1-F11).

Every function is a pure ``Column -> Column`` built from
``pyspark.sql.functions`` built-ins only — no Python UDFs — so each stays
inside whole-stage codegen and is usable in any filter/projection at
100 TB without a serialization boundary.

Reference semantics mirrored (file:line in /root/reference):
- key encode/decode:   geostore/step_function.py:191-194, 153;
                       geostore/datasets_model.py:68-70
- basename/dirname:    geostore/check_stac_metadata/utils.py:60-67,174,187
- URL parse:           geostore/s3_utils.py:19-21
- s3-scheme guard:     geostore/check_stac_metadata/utils.py:70-75
- title pattern:       geostore/dataset_properties.py:3-4 (Te Reo Māori
                       macrons — Unicode-correct by construction)
- href rewrite:        geostore/import_metadata_file/task.py:61-73
- 3000-char truncate:  geostore/notify_status_update/task.py:137-141
- title-case:          geostore/step_function.py:122
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TITLE_PATTERN = r"^[āēīōūĀĒĪŌŪa-zA-Z0-9_-]+$"  # dataset_properties.py:3-4


def dataset_hash_key(dataset_id: Column, version_id: Column | None = None) -> Column:
    """F4: ``DATASET#<id>[#VERSION#<ver>]`` composite key."""
    parts = [F.lit("DATASET"), dataset_id.cast("string")]
    if version_id is not None:
        parts += [F.lit("VERSION"), version_id.cast("string")]
    return F.concat_ws("#", *parts)


def split_hash_key(key: Column, index: int) -> Column:
    """F1: 0-based segment of a ``#``-separated key."""
    return F.split(key, "#").getItem(index)


def basename(url: Column) -> Column:
    """F2: final path segment."""
    return F.regexp_extract(url, r"([^/]+)$", 1)


def dirname(url: Column) -> Column:
    """F2: everything before the final path segment (no trailing slash)."""
    return F.regexp_extract(url, r"^(.*)/[^/]+$", 1)


def parse_s3_bucket(url: Column) -> Column:
    """F3: bucket (netloc) of an s3:// URL."""
    return F.regexp_extract(url, r"^s3://([^/]+)", 1)


def parse_s3_key(url: Column) -> Column:
    """F3: key (path) of an s3:// URL."""
    return F.regexp_extract(url, r"^s3://[^/]+/(.*)$", 1)


def is_s3_url(url: Column) -> Column:
    """P5: scheme guard."""
    return url.startswith("s3://")


def valid_title(title: Column) -> Column:
    """P6: dataset-title alphabet check (macron-aware)."""
    return title.rlike(TITLE_PATTERN)


def hex_digest_32(col: Column) -> Column:
    """F6/F7: first 32 bits of md5 as a non-negative bigint — the shared
    shard/fingerprint primitive (same value in DuckDB via
    ('0x' || substring(md5(x),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("bigint")


def href_to_basename(doc_links: Column) -> Column:
    """F9: rewrite every link href in an ``array<struct<href,rel>>`` to its
    basename (higher-order transform; the import-time metadata rewrite)."""
    return F.transform(
        doc_links,
        lambda link: link.withField("href", basename(link.getField("href"))),
    )


def truncate_chars(col: Column, limit: int = 3000) -> Column:
    """F10: hard character cap (Slack block body)."""
    return F.substring(col, 1, limit)


def title_case(col: Column) -> Column:
    """F11: ``str.title()`` for single-word statuses — first char upper,
    rest lower."""
    return F.concat(
        F.upper(F.substring(col, 1, 1)),
        F.lower(col.substr(F.lit(2), F.length(col))),
    )
