"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; Spark's partial/final
aggregation over shuffled partitions sums in a different order than
a single-threaded oracle, so the low bits of a double sum differ
run-to-run and engine-to-engine. For oracle-comparable (and
reproducible-at-scale) aggregates we sum in DECIMAL — exact, order-
independent, and cheap in Tungsten — then cast the final result to
double. The reference's only numeric aggregation (`+=` over ints,
pl_geo.py:166-167) is exact for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for 100 TB-scale sums: 38 total digits, matching the
# max Spark/DuckDB decimal width after sum-promotion.
DEC = "decimal(18,2)"


def dec(c: str | Column, scale: int = 2) -> Column:
    """Cast a double column to an exact decimal for order-independent math."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


def dsum_expr(expr: Column) -> Column:
    """Exact sum of a decimal expression, surfaced as double."""
    return F.sum(expr).cast("double")
