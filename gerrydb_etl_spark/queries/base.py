"""Query registry: one named entry per operator surface from SURVEY.md §2.

Each query is a (Spark callable, optional DuckDB oracle SQL) pair.
The driver contract (__spark_entry__.py) exposes the registry; tests
run both sides and compare. Queries without an oracle (approximate /
non-SQL-expressible operators) get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a named query; ``oracle`` is equivalent DuckDB SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle)
        return fn

    return deco
