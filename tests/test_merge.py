from __future__ import annotations

from pyspark.sql import functions as F

from burst_db_spark.operators.merge import merge_delete, merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k int, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}


def test_merge_delete(spark):
    target = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    tomb = spark.createDataFrame([(2,)], "k int")
    assert sorted(r.k for r in merge_delete(target, tomb, ["k"]).collect()) == [1, 3]


def test_scd2_apply(spark):
    hist = spark.createDataFrame(
        [(1, "v1", "2020-01-01 00:00:00", None, True)],
        "k int, attr string, effective_from string, effective_to string, is_current boolean",
    ).select(
        "k", "attr",
        F.to_timestamp("effective_from").alias("effective_from"),
        F.to_timestamp("effective_to").alias("effective_to"),
        "is_current",
    )
    upd = spark.createDataFrame(
        [(1, "v2", "2021-06-01 00:00:00")],
        "k int, attr string, effective_from string",
    ).withColumn("effective_from", F.to_timestamp("effective_from"))
    out = sorted(
        scd2_apply(hist, upd, "k").collect(), key=lambda r: r.effective_from
    )
    assert [r.attr for r in out] == ["v1", "v2"]
    assert str(out[0].effective_to) == "2021-06-01 00:00:00" and not out[0].is_current
    assert out[1].effective_to is None and out[1].is_current
