"""Remaining window/array coverage: weekly tumbling windows with explicit
alignment, spatial-mean daily reduce, per-key array set algebra (U2's
array form — the join form is u2_reconcile_snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.registry import register

_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "a13_weekly_window",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // {_WEEK_US}) * {_WEEK_US})
               AS week_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           sum(value) AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
    tags=("A13", "window"),
)
def a13_weekly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly tumbling aggregation (snow_month_filter.py:55-66 '1W'
    resample) with EXPLICIT epoch alignment — Spark's window() and
    DuckDB's time_bucket use different origins, so the bucket id is
    computed as integer µs arithmetic identically on both sides."""
    ev = load(spark, sf_dir, "events")
    bucket = (F.unix_micros(F.col("ts")) / _WEEK_US).cast("bigint") * _WEEK_US
    return (
        ev.withColumn("week_start", F.timestamp_micros(bucket))
        .groupBy("week_start", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "a14_spatial_mean",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           avg(CASE WHEN value >= 50 THEN 1.0 ELSE 0.0 END) AS bad_fraction,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM events GROUP BY 1
    """,
    tags=("A14",),
)
def a14_spatial_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction-of-bad-pixels daily reduce (snow_month_filter.py:107-111):
    the grid dimensions collapse into an avg of an indicator per day."""
    ev = load(spark, sf_dir, "events")
    bad = F.when(F.col("value") >= 50, 1.0).otherwise(0.0)
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.avg(bad).alias("bad_fraction"),
            F.count("*").alias("n_cells"),
        )
    )


@register(
    "u2_array_ops",
    oracle="""
    WITH halves AS (
        SELECT user_id,
               COALESCE(list_sort(list(DISTINCT CAST(ts AS DATE))
                   FILTER (ts < TIMESTAMP '2024-01-16')),
                   CAST([] AS DATE[])) AS old_days,
               COALESCE(list_sort(list(DISTINCT CAST(ts AS DATE))
                   FILTER (ts >= TIMESTAMP '2024-01-16')),
                   CAST([] AS DATE[])) AS new_days
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(list_intersect(old_days, new_days)) AS INTEGER) AS n_common,
           CAST(len(list_filter(old_days, x -> NOT list_contains(new_days, x)))
                AS INTEGER) AS n_only_old,
           CAST(len(list_distinct(list_concat(old_days, new_days))) AS INTEGER)
                AS n_union
    FROM halves
    """,
    tags=("U2", "array"),
)
def u2_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key set algebra on ARRAY columns (the reconcile snapshot
    old ∩/∖/∪ new, reconcile_and_label_db.py:175-206) — the in-row form
    for small per-key sets; the join form (u2_reconcile_snapshots) is the
    scale path."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "ts"
    )
    halves = ev.groupBy("user_id").agg(
        F.sort_array(
            F.array_distinct(
                F.collect_list(F.when(F.col("ts") < "2024-01-16", F.col("day")))
            )
        ).alias("old_days"),
        F.sort_array(
            F.array_distinct(
                F.collect_list(F.when(F.col("ts") >= "2024-01-16", F.col("day")))
            )
        ).alias("new_days"),
    )
    return halves.select(
        "user_id",
        F.size(F.array_intersect("old_days", "new_days")).alias("n_common"),
        F.size(F.array_except("old_days", "new_days")).alias("n_only_old"),
        F.size(F.array_union("old_days", "new_days")).alias("n_union"),
    )
