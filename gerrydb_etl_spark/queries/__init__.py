"""Import all query modules so their @query decorators populate REGISTRY."""

from gerrydb_etl_spark.queries import relational, windows  # noqa: F401
from gerrydb_etl_spark.queries.base import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
