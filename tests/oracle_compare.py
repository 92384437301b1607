"""Replicate the driver's oracle comparison: row count + schema +
order-insensitive value hash between a Spark result and DuckDB SQL.

Values are canonicalized to strings (floats via repr of the double,
timestamps via ISO format), columns sorted by name, rows sorted, and
the whole thing hashed — so any row order and engine-specific
container types compare equal while real value differences fail.
"""

from __future__ import annotations

import datetime as dt
import decimal
import hashlib
import math
from typing import Any


def _canon(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # DuckDB HUGEINT/DECIMAL surfaces as decimal128 through Arrow
        # and renders as float64 in the driver's canonicalizer — mimic
        # that so an uncast SUM(...) oracle mismatches int64 Spark
        # output LOCALLY the same way it does in the driver.
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def table_digest(columns: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()
    return len(rows), sorted(columns), h


def spark_digest(df) -> tuple[int, list[str], str]:
    rows = [tuple(r) for r in df.collect()]
    return table_digest(df.columns, rows)


def duck_digest(con, sql: str) -> tuple[int, list[str], str]:
    # Fetch through Arrow, not fetchall(): the driver's comparator
    # reads the oracle result through Arrow, where HUGEINT becomes
    # decimal128 (→ float64 rendering) instead of a lossless Python
    # int. Going through the same path makes oracle-SQL type bugs
    # (uncast SUMs) visible locally instead of only in the driver.
    tbl = con.execute(sql).fetch_arrow_table()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return table_digest(cols, rows)


def assert_matches_oracle(df, con, sql: str, name: str = "?") -> None:
    sn, scols, shash = spark_digest(df)
    dn, dcols, dhash = duck_digest(con, sql)
    assert sn == dn, f"{name}: row count {sn} != oracle {dn}"
    assert scols == dcols, f"{name}: columns {scols} != oracle {dcols}"
    assert shash == dhash, f"{name}: value hash mismatch ({sn} rows)"
