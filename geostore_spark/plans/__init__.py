from geostore_spark.plans.canonical import CANONICAL_QUERIES, CanonicalQuery

__all__ = ["CANONICAL_QUERIES", "CanonicalQuery"]
