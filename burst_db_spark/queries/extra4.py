"""CUBE grouping sets and rolling time-range window frames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.registry import register


@register(
    "a17_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("A17", "cube"),
)
def a17_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (beyond the reference's surface; the OLAP
    staple): all 4 grouping combinations in one pass — Spark expands to
    grouping sets with a single shuffle, NULL marks rolled-up dims."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


@register(
    "w_rolling_1d",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_day,
           max(value) OVER w AS max_last_day
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)
    """,
    tags=("W-rolling", "range-frame"),
)
def w_rolling_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24h window per key (RANGE frame over event time): count +
    max of the trailing day. Spark's rangeBetween works on the numeric
    order key, so the frame is expressed in integer microseconds —
    identical closed-interval semantics to DuckDB's INTERVAL frame."""
    ev = load(spark, sf_dir, "events")
    day_us = 86_400_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-day_us, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_day"),
        F.max("value").over(w).alias("max_last_day"),
    )
