from geostore_spark.registry import REGISTRY as CANONICAL_QUERIES
from geostore_spark.registry import RegisteredQuery as CanonicalQuery

__all__ = ["CANONICAL_QUERIES", "CanonicalQuery"]
