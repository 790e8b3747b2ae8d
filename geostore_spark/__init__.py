"""geostore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of linz/geostore, rebuilt Spark-first.

The reference (/root/reference, linz/geostore) is a serverless geospatial
data-lake manager: STAC metadata on S3, DynamoDB tables, Step Functions
pipeline. This engine re-expresses its semantics as declarative DataFrame /
SQL plans over Parquet/Delta-style tables so Catalyst + Tungsten own the
physical execution, and extends it with the LLM-training-data operators
(dedup, similarity search, multimodal columns, text analysis) needed at
100 TB scale.

Layout:
  session.py    — SparkSession factory tuned for the scale design point
  sources/      — table registry + readers (parquet fixtures, JSON docs, binary)
  functions/    — scalar/text/hash helpers (JVM-side first, pandas UDF second)
  operators/    — relational + north-star operators (dedup, ann, text stats)
  plans/        — canonical query plans from SURVEY.md §2 (the oracle surface)
  pipeline/     — STAC ingest lifecycle (traversal, validation, checksum, import)
  api/          — dataset CRUD with reference response envelopes
  streaming/    — Structured Streaming tail (status events, windows, dedup)
"""

__version__ = "0.1.0"
