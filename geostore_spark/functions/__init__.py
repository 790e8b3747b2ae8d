"""Reusable Column-function library (SURVEY §2.7 scalar surface)."""

from geostore_spark.functions.scalars import (  # noqa: F401
    basename,
    dataset_hash_key,
    dirname,
    hex_digest_32,
    href_to_basename,
    is_s3_url,
    parse_s3_bucket,
    parse_s3_key,
    split_hash_key,
    title_case,
    truncate_chars,
    valid_title,
)
