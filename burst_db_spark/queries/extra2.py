"""Additional coverage: native batch session_window, exact percentiles,
regex field extraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.queries.windows import GAP_SECONDS, _SESSION_SQL
from burst_db_spark.registry import register


@register(
    "w2b_session_window_batch",
    oracle=f"""
    WITH s AS ({_SESSION_SQL})
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {GAP_SECONDS} SECONDS AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    tags=("W2", "session_window", "batch"),
)
def w2b_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window in a batch aggregation — same
    sessions as the lag/cumsum formulation (merge when gap < threshold;
    window end = last event + gap), cross-checked against the windowed
    SQL oracle."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), f"{GAP_SECONDS} seconds"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "a16_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS median_v,
           quantile_cont(value, 0.9) AS p90_v,
           min(value) AS min_v, max(value) AS max_v
    FROM events GROUP BY event_type
    """,
    tags=("A16", "percentile"),
)
def a16_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: same linear interpolation on sorted values).
    ``percentile_approx`` is the cluster-scale alternative when a sorted
    per-group pass is too expensive (sketch-based, not oracle-matchable)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_v"),
        F.expr("percentile(value, 0.9)").alias("p90_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


@register(
    "f_regex_extract",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\w+)\s', 1) AS first_token,
           regexp_extract(p_type || '#' || CAST(p_size AS VARCHAR),
                          '#(\d+)$', 1) AS size_str,
           CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER)
               AS brand_num
    FROM part
    """,
    tags=("F-string", "regex"),
)
def f_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction (the granule-id date-range parsing family,
    create_cslc_burst_catalog.py:380-384)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)\s", 1).alias("first_token"),
        F.regexp_extract(
            F.concat(F.col("p_type"), F.lit("#"), F.col("p_size").cast("string")),
            r"#(\d+)$",
            1,
        ).alias("size_str"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1)
        .cast("int")
        .alias("brand_num"),
    )
