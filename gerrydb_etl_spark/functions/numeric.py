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

# Element type for exact sums. 18 digits holds any single input value
# here (prices < 1e7); Spark's SUM promotes decimal(18,2) partials to
# decimal(28,2) (precision+10), so a 100 TB sum of ~1e12 rows x 1e7
# max value stays within range — overflow returns NULL loudly in the
# row-count/hash compare rather than silently drifting like doubles.
DEC_PRECISION = 18


def dec(c: str | Column, scale: int = 2) -> Column:
    """Cast a double column to an exact decimal for order-independent math."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({DEC_PRECISION},{scale})")


def dsum(expr: Column) -> Column:
    """Exact sum of a decimal expression, surfaced as double."""
    return F.sum(expr).cast("double")


def cents(c: str | Column) -> Column:
    """Canonical integer cents of a price: floor(v*100 + 0.5) as
    BIGINT — monotone (min/max commute with it) and half-up, the ONE
    spelling every cents-canonicalizing query and oracle mirrors
    (`CAST(floor(x * 100 + 0.5) AS BIGINT)` on the DuckDB side)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * 100 + F.lit(0.5)).cast("long")
