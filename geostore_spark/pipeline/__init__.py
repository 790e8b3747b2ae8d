"""STAC dataset-version ingest lifecycle — the reference's flagship
pipeline (SURVEY §3.2) re-expressed as driver-orchestrated Spark jobs:

  traversal (V1) → validation (V2-V5, V9-V10) → checksum verify (V6)
  → summary (A2) → import + GC (V8, F9) → catalog merge (V11-V12)
  → status row (J5)

Stage boundaries are Spark jobs; the Step Functions state document becomes
plain Python values; Choice states become ``if``.
"""
