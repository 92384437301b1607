"""Source-layer queries: multi-format round trip, header→schema
(Census shape), and the projection/rename normalizations
(SURVEY.md §2.1/§2.2 remaining rows).
"""

from __future__ import annotations

import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.numeric import dec, dsum
from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table
from gerrydb_etl_spark.sources.formats import (
    census_rows_to_df,
    read_table,
    write_table,
)
from gerrydb_etl_spark.sources.registry import TABLE_SCHEMAS


@query(
    "format_roundtrip_json_csv",
    oracle="""
    SELECT n_nationkey, n_name, 'json' AS fmt FROM nation
    UNION ALL
    SELECT n_nationkey, n_name, 'csv' AS fmt FROM nation
    """,
)
def format_roundtrip_json_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write nation to line-JSON and headered CSV, read both back
    with the explicit declared schema, and union — proving the
    non-parquet read/write paths are lossless for the dimension
    shapes they serve (interchange, not the performance path)."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    schema = "n_nationkey int, n_name string"
    from pyspark.sql.types import _parse_datatype_string

    stage = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    out = []
    for fmt in ("json", "csv"):
        path = f"{stage}/nation_{fmt}"
        write_table(nation, path, fmt=fmt)
        back = read_table(spark, path, _parse_datatype_string(schema), fmt=fmt)
        out.append(back.withColumn("fmt", F.lit(fmt)))
    return out[0].unionByName(out[1])


@query(
    "census_header_schema",
    oracle="""
    SELECT r_name AS name, CAST(r_regionkey * 1000 AS BIGINT) AS pop
    FROM region
    """,
)
def census_header_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census API shape: an array-of-arrays response whose first row
    is the header (pl_pop_tables.py:152-153) — synthesized here from
    the region table, parsed header→schema with post-hoc int casts,
    lowercased columns (pl_pop_tables.py:172)."""
    region = load_table(spark, sf_dir, "region")
    rows = [["NAME", "POP"]] + [
        [r.r_name, str(r.r_regionkey * 1000)] for r in region.collect()
    ]
    return census_rows_to_df(spark, rows, int_columns=["POP"])


@query(
    "rename_normalizations",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
    FROM customer
    """,
)
def rename_normalizations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-name normalizations as whole-frame renames: suffix
    strip (NAME10→NAME, pl_localities.py:139-144), lowercase-all
    (pl_pop_tables.py:172), and the column-presence predicate
    (pl_geo.py:118-122) — all metadata-only (toDF), zero compute."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    # simulate a suffixed/uppercased vintage: C_CUSTKEY10, C_NAME10, ...
    vintage = cust.toDF(*[f"{c.upper()}10" for c in cust.columns])
    stripped = vintage.toDF(*[re.sub("10$", "", c) for c in vintage.columns])
    lowered = stripped.toDF(*[c.lower() for c in stripped.columns])
    keep = [c for c in ("c_custkey", "c_name", "c_acctbal", "c_ghost") if c in lowered.columns]
    return lowered.select(
        *[F.col(c).alias(c.removeprefix("c_")) for c in keep]
    )


@query(
    "schema_evolution_read",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1
                THEN substr(o_orderpriority, 1, 1) END AS prio_flag,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across ingest batches: batch 1 (even order
    keys) is written with the v1 schema, batch 2 (odd keys) with a
    v2 schema that ADDS a column; a single mergeSchema read unions
    the files, null-backfilling v1 rows — the standard answer to
    evolving upstream schemas without rewriting history. (Default
    parquet reads take ONE file's footer as the schema; mergeSchema
    is the explicit opt-in that reconciles all footers.) The oracle
    recomputes the same grouping from the base table, so the
    round-trip through two physical schemas must lose nothing."""
    import os
    import shutil
    from urllib.parse import urlparse

    orders = load_table(spark, sf_dir, "orders")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    path = os.path.join(wh, "evolving_orders")
    shutil.rmtree(path, ignore_errors=True)
    key = F.col("o_orderkey")
    v1 = orders.filter(key % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = orders.filter(key % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.substring("o_orderpriority", 1, 1).alias("prio_flag"),
    )
    v1.write.parquet(path)
    v2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.groupBy("prio_flag").agg(
        F.count("*").alias("n"),
        dsum(dec("o_totalprice")).alias("revenue"),
    )


@query(
    "corrupt_record_quarantine",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN o_orderkey % 97 <> 0
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS revenue_good
    FROM orders
    """,
)
def corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input quarantine: a JSONL feed where a deterministic
    subset of lines (orderkey % 97 == 0, truncated mid-object) is
    invalid JSON, read back in PERMISSIVE mode with an explicit
    schema and a _corrupt_record column — bad lines surface as
    quarantine rows with the raw text preserved instead of failing
    the job or silently vanishing (the ingest-robustness counterpart
    of the reference's post-load validation, db.py:87-117). The
    oracle derives the same good/quarantined split from the base
    table, so the parse path can neither drop nor double-count.
    Scale: the JSON source splits by line; PERMISSIVE adds no extra
    pass — corrupt capture happens inside the same parse."""
    import os
    import shutil
    from urllib.parse import urlparse

    orders = load_table(spark, sf_dir, "orders")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    path = os.path.join(wh, "orders_jsonl_corrupt")
    shutil.rmtree(path, ignore_errors=True)
    line = F.to_json(F.struct("o_orderkey", "o_totalprice"))
    feed = orders.select(
        F.when(F.col("o_orderkey") % 97 == 0, F.substring(line, 1, 10))
        .otherwise(line)
        .alias("value")
    )
    feed.write.text(path)
    parsed = (
        spark.read.schema(
            "o_orderkey BIGINT, o_totalprice DOUBLE, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    good = F.col("_corrupt_record").isNull()
    return parsed.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(~good, 1).otherwise(0)).cast("long").alias("n_quarantined"),
        F.sum(F.when(good, dec("o_totalprice"))).cast("double").alias("revenue_good"),
    )


_DAVES_SPECIAL_NAME = "NC 118th Congressional (Court Approved - HB 1029)"
_DAVES_SPECIAL_PATH = "nc_congress_hb_2019"


@query(
    "daves_enacted_assignments",
    oracle=f"""
    WITH plans AS (
        SELECT n.n_nationkey AS state_key,
               lower(replace(n.n_name, ' ', '-')) AS state_slug,
               p.p AS p,
               CASE
                   WHEN n.n_nationkey = 0 AND p.p = 0
                       THEN '{_DAVES_SPECIAL_NAME.replace("'", "''")}'
                   WHEN p.p = 0 THEN 'Enacted Congressional'
                   ELSE 'Enacted State Senate'
               END AS plan_name
        FROM nation n CROSS JOIN (VALUES (0), (1)) AS p(p)
    ),
    pathed AS (
        SELECT state_key, p, plan_name,
               CASE WHEN plan_name = '{_DAVES_SPECIAL_NAME.replace("'", "''")}'
                    THEN '{_DAVES_SPECIAL_PATH}'
                    ELSE state_slug || '_' ||
                         lower(replace(replace(plan_name, ' ', '-'), '''', ''))
               END AS plan_path
        FROM plans
    )
    SELECT pa.plan_path,
           CAST(c.c_custkey AS VARCHAR) AS geoid,
           CAST(c.c_custkey % (3 + pa.p) + 1 AS INTEGER) AS district
    FROM pathed pa JOIN customer c ON c.c_nationkey = pa.state_key
    """,
)
def daves_enacted_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daves_enacted plans-index walk as one declarative reshape
    (reference gerrydb_etl/bootstrap/daves_enacted.py:17-36: fetch
    the per-state plans index, then each plan's edit-cache JSON, and
    emit district assignments — the reference prototype prints them
    and stops at the first state; here the full walk lands as a long
    (plan_path, geoid, district) table).

    The two scraped payload shapes are reproduced as staged JSON
    strings built from the corpus (nation = state, its customers =
    the plan's geoids) and parsed back with from_json — the same
    staged-parse discipline as the Census JSON source: the INDEX
    payload is one {{"plans": [{{id, name}}, ...]}} document per
    state, the EDIT-CACHE payload one {{"assignments": {{geoid:
    district}}}} document per plan. SPECIAL_PLANS
    (daves_enacted.py:12-14) is applied after parse: the one plan
    whose display name breaks the naming convention maps to its
    custom path; every other path is the slugified state/plan name.

    Scale: payload construction is one per-state aggregation and one
    per-plan aggregation (map-side combined); parse + posexplode are
    narrow; plans-per-state and geoids-per-plan bound the payload
    sizes exactly as the upstream API does. No driver-side loop —
    the reference's per-plan HTTP round trips become rows."""
    from pyspark.sql import types as T

    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")

    # --- stage 1: the per-state plans-index JSON payloads ---------
    two_plans = F.array(F.lit(0), F.lit(1))
    plan_rows = nation.select(
        "n_nationkey",
        "n_name",
        F.explode(two_plans).alias("p"),
    ).select(
        "n_nationkey",
        "n_name",
        "p",
        F.when(
            (F.col("n_nationkey") == 0) & (F.col("p") == 0),
            F.lit(_DAVES_SPECIAL_NAME),
        )
        .when(F.col("p") == 0, F.lit("Enacted Congressional"))
        .otherwise(F.lit("Enacted State Senate"))
        .alias("plan_name"),
    )
    index_payloads = plan_rows.groupBy("n_nationkey", "n_name").agg(
        F.to_json(
            F.struct(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (F.col("n_nationkey") * 2 + F.col("p")).alias("id"),
                            F.col("plan_name").alias("name"),
                        )
                    )
                ).alias("plans")
            )
        ).alias("payload")
    )

    # --- stage 2: walk the index (parse + explode the plans) ------
    index_schema = T.StructType(
        [
            T.StructField(
                "plans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("id", T.LongType()),
                            T.StructField("name", T.StringType()),
                        ]
                    )
                ),
            )
        ]
    )
    plans = index_payloads.select(
        "n_nationkey",
        "n_name",
        F.explode(F.from_json("payload", index_schema).getField("plans")).alias(
            "plan"
        ),
    ).select(
        "n_nationkey",
        "n_name",
        F.col("plan.id").alias("plan_id"),
        F.col("plan.name").alias("plan_name"),
        (F.col("plan.id") % 2).cast("int").alias("p"),
    )

    # --- stage 3: the per-plan edit-cache JSON payloads -----------
    assignments = plans.join(
        cust.select("c_custkey", "c_nationkey"),
        plans.n_nationkey == cust.c_nationkey,
    ).select(
        "plan_id",
        "n_name",
        "plan_name",
        "p",
        F.col("c_custkey").cast("string").alias("geoid"),
        (F.col("c_custkey") % (F.lit(3) + F.col("p")) + 1)
        .cast("int")
        .alias("district"),
    )
    cache_payloads = assignments.groupBy(
        "plan_id", "n_name", "plan_name"
    ).agg(
        F.to_json(
            F.struct(
                F.map_from_entries(
                    F.array_sort(F.collect_list(F.struct("geoid", "district")))
                ).alias("assignments")
            )
        ).alias("payload")
    )

    # --- stage 4: parse the edit cache into the long table --------
    cache_schema = T.StructType(
        [
            T.StructField(
                "assignments", T.MapType(T.StringType(), T.IntegerType())
            )
        ]
    )
    slug = lambda c: F.lower(  # noqa: E731
        F.regexp_replace(F.regexp_replace(c, " ", "-"), "'", "")
    )
    plan_path = F.when(
        F.col("plan_name") == _DAVES_SPECIAL_NAME, F.lit(_DAVES_SPECIAL_PATH)
    ).otherwise(
        F.concat(slug(F.col("n_name")), F.lit("_"), slug(F.col("plan_name")))
    )
    return (
        cache_payloads.select(
            plan_path.alias("plan_path"),
            F.explode(
                F.from_json("payload", cache_schema).getField("assignments")
            ).alias("geoid", "district"),
        )
    )
