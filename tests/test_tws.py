"""transformWithStateInPandas (Spark 4 arbitrary state): the running
per-user stats processor must, after all batches, equal the batch
aggregate — and users fed in both micro-batches must emit twice
(proof the state actually carried across batches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from burst_db_spark.streaming import tws
from burst_db_spark.streaming.incremental import file_stream


@pytest.fixture()
def two_batch_dir(spark, tmp_path):
    rows = [
        # (user_id, event_type, value)
        (1, "view", 1.25),
        (1, "click", 2.50),
        (2, "view", 0.75),
        (1, "view", 4.00),  # batch 2
        (2, "purchase", 10.10),
        (3, "view", 0.05),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    in_dir = str(tmp_path / "in")
    df.limit(3).coalesce(1).write.parquet(in_dir)
    df.subtract(df.limit(3)).coalesce(1).write.mode("append").parquet(in_dir)
    return in_dir


def test_tws_fence_without_protobuf(spark, two_batch_dir):
    if tws.protobuf_available():
        pytest.skip("protobuf present - the real test below runs")
    stream = file_stream(
        spark, two_batch_dir, "user_id long, event_type string, value double"
    )
    with pytest.raises(NotImplementedError, match="protobuf"):
        tws.attach(stream)


def test_tws_running_stats_match_batch(spark, tmp_path, two_batch_dir):
    if not tws.protobuf_available():
        pytest.skip(
            "google.protobuf absent: Spark's TWS state protocol cannot "
            "start (fence verified in test_tws_fence_without_protobuf)"
        )
    stream = file_stream(
        spark, two_batch_dir, "user_id long, event_type string, value double"
    )
    out = tws.attach(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM tws_out")

    final = {
        r.user_id: (r.n_events, r.total_cents, r.n_types)
        for r in emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_cents").alias("total_cents"),
            F.max("n_types").alias("n_types"),
        )
        .collect()
    }
    batch = {
        r.user_id: (r.n, r.cents, r.t)
        for r in tws.cents_projection(
            spark.read.parquet(two_batch_dir)
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("cents"),
            F.countDistinct("event_type").alias("t"),
        )
        .collect()
    }
    assert final == batch

    # state carried across batches: users 1 and 2 appear in both
    # micro-batches -> two emissions each; user 3 only in the second
    n_emits = {
        r.user_id: r.c
        for r in emitted.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    assert n_emits[1] == 2 and n_emits[2] == 2 and n_emits[3] == 1
