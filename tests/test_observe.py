"""df.observe(): data-quality counters collected in the SAME pass as
the real work — at 100 TB you cannot afford a second scan just to count
nulls/violations, so the quality gate rides the production action."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from tests.conftest import SF_DIR


def test_observe_quality_counters_single_pass(spark):
    obs = Observation("quality")
    ev = load(spark, SF_DIR, "events")
    gated = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_scanned"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.sum((F.col("value") < 0).cast("long")).alias("n_negative"),
        F.max("ts").alias("max_ts"),
    ).where(F.col("event_type") == "purchase")
    n_purchases = gated.count()  # ONE action drives result + counters

    got = obs.get
    n_total = ev.count()
    assert got["n_scanned"] == n_total          # counters saw every row,
    assert n_purchases < n_total                # not just the filtered ones
    assert got["n_null_value"] == ev.where(F.col("value").isNull()).count()
    assert got["n_negative"] == ev.where(F.col("value") < 0).count()
    assert got["max_ts"] == ev.agg(F.max("ts")).collect()[0][0]
