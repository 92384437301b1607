"""Templated tabular configs → generated Spark plans.

The reference hydrates frozen pydantic models from Jinja2-rendered
YAML (gerrydb_etl/__init__.py:64-93, templated_columns.py:30-37) and
uses them to drive projection/rename (pl_geo.py:210-214) and read
dtypes (source_dtypes, __init__.py:87-93). Here the same config
shape compiles to a Catalyst plan: declared types become an explicit
StructType (never infer) and the projection becomes one select of
alias+cast expressions — so config-driven pipelines get full
pushdown/pruning like hand-written ones.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml
from jinja2 import StrictUndefined, Template
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# logical type -> Spark type (the reference's BOOL/FLOAT/INT/STR
# vocabulary, gerrydb_etl/__init__.py:14-19)
TYPE_MAP: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "float": T.DoubleType(),
    "int": T.LongType(),
    "str": T.StringType(),
}


@dataclass(frozen=True)
class ColumnConfig:
    source: str
    target: str
    type: str
    kind: str = "attribute"
    aliases: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""

    def __post_init__(self):
        if self.type not in TYPE_MAP:
            raise ValueError(
                f"column {self.target!r}: unknown type {self.type!r}; "
                f"expected one of {sorted(TYPE_MAP)}"
            )


@dataclass(frozen=True)
class TabularConfig:
    columns: tuple[ColumnConfig, ...]
    source_url: str = ""


def render_config(template_text: str, **args) -> TabularConfig:
    """Jinja2-render a YAML config template and parse it. Undefined
    template variables raise (StrictUndefined) instead of silently
    rendering empty and corrupting column names."""
    template = Template(template_text, undefined=StrictUndefined)
    raw = yaml.safe_load(template.render(**args))
    cols = tuple(
        ColumnConfig(
            source=c["source"],
            target=c["target"],
            type=c["type"],
            kind=c.get("kind", "attribute"),
            aliases=tuple(c.get("aliases", ())),
            description=c.get("description", ""),
        )
        for c in raw["columns"]
    )
    return TabularConfig(columns=cols, source_url=raw.get("source_url", ""))


def source_struct(cfg: TabularConfig) -> T.StructType:
    """Declared read schema (the reference's source_dtypes)."""
    return T.StructType(
        [T.StructField(c.source, TYPE_MAP[c.type]) for c in cfg.columns]
    )


def apply_config(df: DataFrame, cfg: TabularConfig) -> DataFrame:
    """Compile the config to one select of alias+cast expressions.

    Columns whose source is absent from the frame are skipped — the
    reference's presence guard (pl_geo.py:210-214) — so one config
    can serve vintages with differing column sets."""
    exprs: list[Column] = []
    for c in cfg.columns:
        if c.source in df.columns:
            exprs.append(F.col(c.source).cast(TYPE_MAP[c.type]).alias(c.target))
    if not exprs:
        raise ValueError("config matches no columns in the input frame")
    return df.select(*exprs)
