"""Partition-layout evidence: the per-date directory layout (the
reference's historical-bursts convention) must actually prune — both
statically (PartitionFilters) and dynamically (DPP from a dim filter)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.sinks import write_parquet
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_static_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    write_parquet(ev, out, partition_by=["day"])
    back = spark.read.parquet(out).where(F.col("day") == "2024-01-05")
    plan = _plan(back)
    assert "PartitionFilters" in plan
    # the filter must be in PartitionFilters (directory pruning), not a
    # post-scan Filter over all partitions
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line
    assert back.count() == ev.where(F.to_date("ts") == "2024-01-05").count()


def test_dynamic_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "li_by_flag")
    li = load(spark, SF_DIR, "lineitem")
    write_parquet(li, out, partition_by=["l_returnflag"])
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("A", "keep")], "l_returnflag string, tag string"
    )
    joined = fact.join(dim, "l_returnflag")
    plan = _plan(joined)
    # DPP: the partition filter is fed from the dim side at runtime
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(l_returnflag" in plan
    got = joined.count()
    want = li.where(F.col("l_returnflag") == "A").count()
    assert got == want
