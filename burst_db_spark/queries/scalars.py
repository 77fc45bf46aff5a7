"""Scalar-function gauntlets (SURVEY.md §2.8): one query per family
(string / date-time / math / conditional), each exercising the expression
set the reference uses, with types pinned to match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.registry import register


@register(
    "f_string_gauntlet",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_name, 1, 5) AS name_pfx,
           lpad(CAST(p_partkey AS VARCHAR), 6, '0') AS key_pad,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_mask,
           string_split(p_name, ' ')[1] AS first_word,
           concat_ws('_', p_brand, replace(p_type, ' ', '-')) AS brand_type,
           printf('t%03d_%06d_iw1', p_size, p_partkey) AS burst_style_id
    FROM part
    """,
    tags=("F-string",),
)
def f_string_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substring/lpad/regexp_replace/split/concat_ws/zero-pad-printf —
    the burst_id_jpl construction family (build_frame_db.py:37-47,
    create_cslc_burst_catalog.py:70-76)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.lpad(F.col("p_partkey").cast("string"), 6, "0").alias("key_pad"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_mask"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.concat_ws(
            "_", F.col("p_brand"), F.regexp_replace("p_type", " ", "-")
        ).alias("brand_type"),
        F.format_string("t%03d_%06d_iw1", "p_size", "p_partkey").alias(
            "burst_style_id"
        ),
    )


@register(
    "f_date_gauntlet",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
               AS days_since_epoch0,
           strftime(o_orderdate, '%Y-%m') AS ym,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    """,
    tags=("F-date",),
)
def f_date_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/to_date/datediff/format/interval/last_day
    (create_cslc_burst_catalog.py:143-149, example-queries.sql:135,
    create_blackout_dates_s1.py:14-35)."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.to_date("o_orderdate").alias("order_day"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch0"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@register(
    "f_math_gauntlet",
    oracle="""
    SELECT p_partkey,
           CAST(floor(p_retailprice / 30.0) * 30 AS BIGINT) AS price_snap,
           CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
           abs(p_retailprice - 1000.0) AS dist_from_1k,
           pow(CAST(p_size AS DOUBLE), 3) AS size_cubed,
           CAST(p_partkey % 16 AS BIGINT) AS shard,
           round(p_retailprice, 1) AS price_r1
    FROM part
    """,
    tags=("F-math",),
)
def f_math_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor-snap / ceil-bucket / abs / pow / mod / round — the snap-to-grid
    and cubic-badness family (build_frame_db.py:439-444, frames.py:198-211)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        (F.floor(F.col("p_retailprice") / 30.0) * 30).cast("bigint").alias("price_snap"),
        F.ceil(F.col("p_retailprice") / 100.0).cast("bigint").alias("price_bucket"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_from_1k"),
        F.pow(F.col("p_size").cast("double"), 3).alias("size_cubed"),
        (F.col("p_partkey") % 16).cast("bigint").alias("shard"),
        F.round("p_retailprice", 1).alias("price_r1"),
    )


@register(
    "f_conditional_gauntlet",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           CASE WHEN c_nationkey IN (1, 2, 3) THEN 1 ELSE 0 END AS in_sample
    FROM customer
    """,
    tags=("F-cond",),
)
def f_conditional_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce/nullif, indicator columns
    (create_blackout_dates_s1.py:150-170, np.where family)."""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.when(F.col("c_nationkey").isin(1, 2, 3), 1).otherwise(0).alias("in_sample"),
    )
