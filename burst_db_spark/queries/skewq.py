"""Skew-management queries: the salted two-stage aggregation, checked
against the plain GROUP BY oracle (same answer, skew-proof plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from burst_db_spark.catalog import load
from burst_db_spark.operators.skew import salted_count
from burst_db_spark.registry import register


@register(
    "skew_salted_count",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    tags=("skew", "salting"),
)
def skew_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted count per key — identical answer to a plain
    groupBy, but a pathological hot key spreads over 16 reducers first.
    (AQE handles moderate skew; this is the explicit escape hatch.)"""
    ev = load(spark, sf_dir, "events")
    return salted_count(ev, "event_type")
