"""Source-layer breadth: multi-format I/O with explicit schemas,
bounded retry, the Census JSON shape (header row → schema), and
skip-list pruning (SURVEY.md §2.1).

Every read declares its schema — never infer (the reference declares
dtypes at read time, source_dtypes, __init__.py:87-93). JSON/CSV are
interchange formats here; parquet stays the performance path (the
only one with real pushdown), and `write_table` defaults to snappy
parquet for anything that will be re-read.
"""

from __future__ import annotations

import json
import logging
import time
from collections.abc import Callable, Sequence
from typing import TypeVar

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

log = logging.getLogger(__name__)

FORMATS = ("parquet", "json", "csv")

R = TypeVar("R")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Write a DataFrame in one of the supported interchange formats.
    CSV keeps a header (for the header→schema read path); JSON is
    line-delimited (sparkable at any scale)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    """Read with an EXPLICIT schema in any supported format — no
    inference pass, stable schema across scale factors."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)


def with_retry(
    fn: Callable[[], R],
    attempts: int = 5,
    backoff_s: float = 0.5,
    retry_on: tuple[type[BaseException], ...] = (IOError, OSError),
) -> R:
    """Bounded driver-side retry for flaky source fetches.

    Fixes the reference's two retry bugs (SURVEY.md §7): the bare
    `except:` at pl_geo.py:97 (here only `retry_on` exceptions
    retry), and the possibly-unbound `response` after five failures
    at pl_pop_tables.py:125-150 (here the last exception re-raises,
    so there is no fall-through to undefined state).
    """
    last: BaseException | None = None
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except retry_on as exc:
            last = exc
            log.warning("source fetch attempt %d/%d failed: %s", attempt, attempts, exc)
            if attempt < attempts:
                time.sleep(backoff_s * attempt)
    assert last is not None
    raise last


def census_rows_to_df(
    spark: SparkSession,
    rows: Sequence[Sequence[str]],
    int_columns: Sequence[str] = (),
) -> DataFrame:
    """Census API JSON shape → DataFrame: first row is the header,
    the rest are all-string cells (pl_pop_tables.py:152-153). Header
    becomes the schema; declared int columns are cast after load
    (the reference's post-hoc astype, pl_pop_tables.py:175-179).

    Driver-side by nature — one API response per (state, level,
    table) work unit is small; scale comes from running many units
    as partitions, not from one giant response.
    """
    if not rows:
        raise ValueError("empty Census response: no header row")
    header, data = list(rows[0]), rows[1:]
    lowered = [c.lower() for c in header]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in lowered])
    df = spark.createDataFrame([list(r) for r in data], schema)
    from pyspark.sql import functions as F

    for c in int_columns:
        df = df.withColumn(c.lower(), F.col(c.lower()).cast("long"))
    return df


def census_json_file_to_df(
    spark: SparkSession, path: str, int_columns: Sequence[str] = ()
) -> DataFrame:
    """Parse a staged Census API response file (JSON array of
    arrays) via census_rows_to_df."""
    with open(path) as f:
        return census_rows_to_df(spark, json.load(f), int_columns)


# -- skip-list pruning (pl_config.py:29-68, pl_geo.py:71-73) ----------

KNOWN_MISSING: frozenset[tuple[str, str, str]] = frozenset(
    {
        # (fips, level, year) work units known absent upstream; the
        # reference maintains 16 such entries for Census gaps.
    }
)


def should_skip(
    fips: str, level: str, year: str, missing: frozenset | None = None
) -> bool:
    """Zero-cost pruning of known-missing work units before any I/O."""
    return (fips, level, year) in (KNOWN_MISSING if missing is None else missing)
