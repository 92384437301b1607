"""Scalar string functions from the reference, as Catalyst expressions.

Each mirrors a pandas lambda in the reference but stays JVM-side
(whole-stage codegen) instead of a per-row Python call.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def slash_to_dashes(col: Column) -> Column:
    """`/` -> `--` for path-safe identifiers.

    Reference: gerrydb_etl/bootstrap/pl_geo.py:103-107 and
    pl_pop_tables.py:155-159 apply this to every string cell via
    ``applymap``; here it is a per-column expression.
    """
    return F.regexp_replace(col, "/", "--")


def pathify(col: Column) -> Column:
    """Slugify: strip, lowercase, spaces->dashes, drop dots.

    Reference: gerrydb_etl/__init__.py:59-61.
    """
    return F.regexp_replace(F.regexp_replace(F.lower(F.trim(col)), " ", "-"), r"\.", "")


def prefixed_key(prefix: str, col: Column, sep: str = ":") -> Column:
    """Build `prefix:id` keys (reference pl_geo.py:140-145, 203;
    pl_pop_tables.py:163-170)."""
    return F.concat(F.lit(prefix), F.lit(sep), col.cast("string"))


def rstrip_charset(col: Column, charset: str) -> Column:
    """``str.rstrip(charset)`` equivalent (reference pl_geo.py:144).

    Each character is regex-escaped so charsets containing ']', '\\',
    '^', or '-' keep str.rstrip semantics inside the character class.
    """
    escaped = "".join(re.escape(ch) for ch in charset)
    return F.regexp_replace(col, f"[{escaped}]+$", "")


def trailing_class(col: Column, mapping: dict[str, str]) -> Column:
    """Classify by final character (reference pl_geo.py:132-138:
    geoids ending t->trust, r->reservation). Unmatched -> NULL, which
    callers turn into a validation failure (§2.11)."""
    if not mapping:
        raise ValueError("trailing_class requires a non-empty mapping")
    expr = None
    last = F.lower(F.substring(col, -1, 1))
    for ch, label in mapping.items():
        # the extracted char is lowercased, so keys must be too — an
        # uppercase key would silently never match
        cond = last == ch.lower()
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(F.lit(None).cast("string"))
