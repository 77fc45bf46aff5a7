"""EP2 + reconcile pipeline tests over the domain fixtures, including the
JSON envelope artifact."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from burst_db_spark.plans import fixtures
from burst_db_spark.plans.blackout import yearly_windows
from burst_db_spark.plans.burst_catalog import (
    catalog_document,
    consistent_burst_catalog,
)
from burst_db_spark.plans.frame_db import build_frames
from burst_db_spark.plans.reconcile import (
    label_summary,
    reconcile_and_label,
    reconcile_snapshots,
)
from burst_db_spark.sources.json_docs import envelope_json


def _setup(spark):
    trip = fixtures.burst_triplets(spark, n_triplets=120, n_tracks=2)
    frames, bridge = build_frames(trip)
    acq = fixtures.acquisitions(spark, bridge, n_dates=40)
    return frames, bridge, acq


def test_ep2_catalog_and_document(spark, tmp_path):
    frames, bridge, acq = _setup(spark)
    season = frames.select(
        "frame_fid",
        F.lit(11).alias("start_month"), F.lit(1).alias("start_day"),
        F.lit(2).alias("end_month"), F.lit(28).alias("end_day"),
    ).where(F.col("frame_fid") % 2 == 0)
    bl = yearly_windows(season, first_year=2016, last_year=2020)
    catalog = consistent_burst_catalog(acq, frames, bl).cache()

    # one row per (frame, date); none inside a blackout window
    assert catalog.count() == catalog.select("frame_fid", "sensing_date").distinct().count()
    viol = catalog.join(
        bl, (catalog.frame_fid == bl.frame_fid)
        & (catalog.first_time >= bl.start_ts)
        & (catalog.first_time <= bl.end_ts),
    )
    assert viol.count() == 0
    # odd frames (no blackout) keep all 40 dates
    odd = catalog.where(F.col("frame_fid") % 2 == 1).groupBy("frame_fid").count()
    assert all(r["count"] == 40 for r in odd.collect())

    doc_rows = catalog_document(catalog, bridge)
    doc = json.loads(envelope_json(doc_rows, "frame_fid",
                                   ["burst_id_list", "sensing_time_list"]))
    some = next(iter(doc["data"].values()))
    assert some["burst_id_list"] == sorted(some["burst_id_list"])
    assert all("T" in t for t in some["sensing_time_list"])


def test_reconcile_keeps_new_and_missing_old(spark):
    old = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"), (1, "2020-02-01 00:00:00")],
        "frame_fid int, sensing_time string",
    ).withColumn("sensing_time", F.to_timestamp("sensing_time"))
    new = spark.createDataFrame(
        [(1, "2020-02-01 00:00:00"), (1, "2020-03-01 00:00:00")],
        "frame_fid int, sensing_time string",
    ).withColumn("sensing_time", F.to_timestamp("sensing_time"))
    merged = reconcile_snapshots(old, new, "frame_fid", "sensing_time")
    times = sorted(str(r.sensing_time) for r in merged.collect())
    assert times == [
        "2020-01-01 00:00:00", "2020-02-01 00:00:00", "2020-03-01 00:00:00",
    ]


def test_reconcile_date_only_missingness(spark):
    # reference rule (reconcile_and_label_db.py:199-206): same DATE with a
    # shifted hour is NOT missing — the old row must not be duplicated in.
    old = spark.createDataFrame(
        [(1, "2020-01-01 03:00:00"), (1, "2020-02-01 00:00:00")],
        "frame_fid int, sensing_time string",
    ).withColumn("sensing_time", F.to_timestamp("sensing_time"))
    new = spark.createDataFrame(
        [(1, "2020-01-01 09:30:00"), (1, "2020-03-01 00:00:00")],
        "frame_fid int, sensing_time string",
    ).withColumn("sensing_time", F.to_timestamp("sensing_time"))
    merged = reconcile_snapshots(old, new, "frame_fid", "sensing_time")
    times = sorted(str(r.sensing_time) for r in merged.collect())
    # 2020-01-01 appears ONCE (new's hour wins); 2020-02-01 re-added with
    # its original timestamp
    assert times == [
        "2020-01-01 09:30:00", "2020-02-01 00:00:00", "2020-03-01 00:00:00",
    ]


def test_reconcile_label_summary(spark):
    frames, bridge, acq = _setup(spark)
    old = acq.where(F.col("sensing_time") < "2017-06-01")
    new = acq.where(F.col("sensing_time") >= "2016-10-01")
    labeled = reconcile_and_label(old, new, gap_seconds=86400 * 400, batch_size=15)
    # reconcile restored the pre-October rows
    assert labeled.count() == acq.count()
    kinds = {r.kind for r in label_summary(labeled).collect()}
    assert "historical" in kinds
    assert kinds <= {"historical", "forward", "no_run"}
