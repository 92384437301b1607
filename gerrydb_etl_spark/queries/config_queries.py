"""Config-driven query: a Jinja2-templated YAML config compiled to a
select/alias/cast plan (SURVEY.md §2.1/§2.2 config rows, VERDICT
item 7). The oracle is the hand-written SQL the generated plan must
equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gerrydb_etl_spark.plans.config import apply_config, render_config
from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table

# Template exercises: rename, cast (int size -> float), jinja2
# variable substitution, and a column absent from the input frame
# (skipped by the presence guard, pl_geo.py:210-214).
PART_CONFIG_TEMPLATE = """
source_url: "config://{{ vintage }}/part"
columns:
  - source: p_partkey
    target: "{{ vintage }}_partkey"
    type: int
    kind: identifier
  - source: p_name
    target: name
    type: str
    aliases: [part_name]
  - source: p_size
    target: size_f
    type: float
  - source: p_missing_in_this_vintage
    target: ghost
    type: str
"""


@query(
    "config_driven_projection",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS y2020_partkey,
           p_name AS name,
           CAST(p_size AS DOUBLE) AS size_f
    FROM part
    """,
)
def config_driven_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render the template with vintage=y2020 and compile it: the
    resulting single select (alias + cast, absent column skipped)
    must equal the hand-written oracle. Because the plan is one
    narrow projection, Catalyst pushes pruning into the scan exactly
    as for hand-written queries."""
    cfg = render_config(PART_CONFIG_TEMPLATE, vintage="y2020")
    part = load_table(spark, sf_dir, "part")
    return apply_config(part, cfg)
