"""Driver contract for the spark-graft builder (PySpark target).

Backed by the gerrydb_etl_spark package: every implemented operator
from SURVEY.md §2 registers a named (Spark callable, DuckDB oracle
SQL) pair in gerrydb_etl_spark.queries.REGISTRY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gerrydb_etl_spark.queries import REGISTRY

    return REGISTRY["pricing_summary"].spark(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gerrydb_etl_spark.queries import REGISTRY

    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted for non-SQL-expressible ops)."""
    from gerrydb_etl_spark.queries import REGISTRY

    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
