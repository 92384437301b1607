"""As-of (most-recent-match) join.

Spark has no ASOF JOIN operator. The naive spelling — a non-equi
range join + max() — explodes to O(left x right) per key under
Catalyst. This implements the scalable *union-and-carry* plan
instead: tag both inputs, union them, and carry the latest right-side
values forward with a window over (key, time). Cost: ONE shuffle on
the key (the window sort), linear in |left| + |right| — the plan
shape that survives 100 TB, equivalent to how kdb/QuestDB/DuckDB
execute ASOF natively.

Semantics match DuckDB's `ASOF JOIN ... ON l.key = r.key AND
l.ts >= r.ts`: each left row pairs with the right row having the
greatest ts <= left.ts (inner: unmatched left rows drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Most-recent right row (by ``ts``, per ``key``) for each left
    row. Right rows at exactly left.ts DO match (>=). ``how`` is
    'inner' (drop unmatched) or 'left' (keep with nulls)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    lcols = [c for c in left.columns]
    tagged_left = left.select(
        *lcols, F.lit(1).alias("__side")
    )
    tagged_right = right.select(
        F.col(key),
        F.col(ts),
        *[F.col(c) for c in right_value_cols],
        F.lit(0).alias("__side"),
    )
    # align schemas: left gets null right-value columns and vice versa
    for c in right_value_cols:
        tagged_left = tagged_left.withColumn(
            f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c])
        )
    tagged_right = tagged_right.select(
        F.col(key),
        F.col(ts),
        F.lit(None).cast("long").alias("__null_marker"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col("__side"),
    ).drop("__null_marker")
    unioned = tagged_left.select(
        *lcols, "__side", *[f"__r_{c}" for c in right_value_cols]
    ).unionByName(tagged_right, allowMissingColumns=True)

    # at equal ts the right row sorts first (__side 0 < 1), so a
    # same-instant quote is visible to the click — the >= contract.
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # carry ONE struct per right row, not per-column lasts: a right
    # row with a NULL value column must still be "the match" (DuckDB
    # ASOF semantics); independent ignorenulls carries would pair a
    # newer row's ts with an older row's non-null value.
    carry = F.last(
        F.when(
            F.col("__side") == 0,
            F.struct(
                F.col(ts).alias("__ts"),
                *[F.col(f"__r_{c}").alias(c) for c in right_value_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    carried = unioned.select(
        *lcols,
        "__side",
        carry["__ts"].alias("asof_ts"),
        *[carry[c].alias(f"asof_{c}") for c in right_value_cols],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out
