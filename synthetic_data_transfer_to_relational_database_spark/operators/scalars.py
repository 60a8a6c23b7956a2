"""Scalar function packs: string / date / math / JSON (SURVEY.md §2.3
rows ``scalar_string`` … ``scalar_json``).

These are the Spark-native equivalents of the reference's per-column
transforms: string truncation ``val[:length]`` (run_engine.py:251-253),
identifier rewrite (apply_mssql.py:87-89), decimal bounding
(run_engine.py:184-188), current-date generation (run_engine.py:190-191).
All JVM-side built-ins — whole-stage-codegen, no Python in the hot path.

Transcendental functions (sqrt/ln/exp) are deliberately excluded from
oracle-checked outputs: libm implementations differ across engines in the
last ulp. Everything here is exact IEEE arithmetic or integer ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import table
from ._registry import make_registry

QUERIES, ORACLE, q = make_registry()


@q(
    "scalar_string",
    sql="""
    SELECT p_partkey,
           SUBSTRING(p_name, 1, 8) AS name8,
           UPPER(p_brand) AS brand_u,
           LOWER(p_type) AS type_l,
           LENGTH(p_name) AS name_len,
           REPLACE(p_name, ' ', '_') AS name_snake,
           CONCAT(p_brand, '#', p_type) AS brand_type,
           TRIM(p_name) AS name_trim,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
    )


@q(
    "scalar_date",
    sql="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS odate,
           EXTRACT(YEAR FROM o_orderdate) AS oyear,
           EXTRACT(MONTH FROM o_orderdate) AS omonth,
           EXTRACT(DAY FROM o_orderdate) AS oday,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS omonth_start,
           DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # DATE values are emitted as midnight timestamps: both engines'
        # pandas clients then agree on dtype (datetime64), where raw DATE
        # becomes `datetime.date` objects on the Spark side only.
        F.col("o_orderdate").cast("date").cast("timestamp").alias("odate"),
        F.year("o_orderdate").cast("long").alias("oyear"),
        F.month("o_orderdate").cast("long").alias("omonth"),
        F.dayofmonth("o_orderdate").cast("long").alias("oday"),
        F.date_trunc("month", "o_orderdate").alias("omonth_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
    )


@q(
    "scalar_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_kfloor,
           l_partkey % 10 AS pk_mod10,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_kfloor"),
        (F.col("l_partkey") % 10).alias("pk_mod10"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * (F.lit(1) + F.col("l_tax"))).alias(
            "charged"
        ),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@q(
    "scalar_json",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@q(
    "scalar_null",
    sql="""
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'suppressed')
             AS seg_coalesced,
           (c_mktsegment IS NOT DISTINCT FROM NULLIF(c_mktsegment, 'BUILDING'))
             AS null_safe_eq,
           CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL
                THEN 0 ELSE 1 END AS nvl2_flag,
           GREATEST(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0)
             AS bal_floor_cents
    FROM customer
    """,
)
def scalar_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling pack: NULLIF / COALESCE / null-safe equality
    (Spark ``eqNullSafe`` ⇔ SQL ``IS NOT DISTINCT FROM``) / NVL2-style
    branching / GREATEST clamping — the null-discipline functions the
    reference's per-column IS_NULLABLE handling (run_engine.py:107-116)
    maps onto. The testdata carries no physical NULLs, so NULLIF
    manufactures them and every downstream function is exercised on
    real null inputs. Map-only projection, codegen'd."""
    c = table(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("suppressed")).alias("seg_coalesced"),
        F.col("c_mktsegment").eqNullSafe(seg_null).alias("null_safe_eq"),
        F.when(seg_null.isNull(), F.lit(0)).otherwise(F.lit(1)).alias("nvl2_flag"),
        F.greatest(
            F.round(F.col("c_acctbal") * 100).cast("long"), F.lit(0).cast("long")
        ).alias("bal_floor_cents"),
    )
