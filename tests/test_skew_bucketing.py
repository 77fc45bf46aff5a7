"""Skew/shuffle management: salted join correctness, salted aggregation,
and bucketed joins actually eliminating the Exchange."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import skew
from tests.conftest import SF_DIR


def test_salted_join_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = load(spark, SF_DIR, "part").select("p_partkey", "p_brand")
    dim = part.withColumnRenamed("p_partkey", "l_partkey")
    plain = (
        li.join(dim, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        skew.salted_join(li, dim, "l_partkey", salt_buckets=8)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = {r.p_brand: (r.n, round(r.q, 6)) for r in plain.collect()}
    b = {r.p_brand: (r.n, round(r.q, 6)) for r in salted.collect()}
    assert a == b


def test_salted_count_matches_plain(spark):
    ev = load(spark, SF_DIR, "events")
    plain = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    salted = {r.event_type: r.n for r in skew.salted_count(ev, "event_type").collect()}
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    skew.write_bucketed(
        li, "li_b", "l_orderkey", n_buckets=4, path=str(tmp_path / "li_b")
    )
    skew.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b",
        "l_orderkey", n_buckets=4, path=str(tmp_path / "ord_b"),
    )
    joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == load(spark, SF_DIR, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_kmeans_codebook_invariants(spark):
    from pyspark.sql import functions as F

    from burst_db_spark.catalog import load
    from burst_db_spark.operators.similarity import assign_cells, kmeans_codebook

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    cb = kmeans_codebook(emb, k=4, iters=2)
    assert len(cb) == 4 and all(len(c) == 64 for c in cb)
    cells = assign_cells(emb, cb)
    # cells partition the corpus, ids in [1, k]
    dist = {r.cell: r["count"] for r in cells.groupBy("cell").count().collect()}
    assert sum(dist.values()) == emb.count()
    assert set(dist) <= {1, 2, 3, 4}
    # deterministic: retrain gives the identical codebook
    assert kmeans_codebook(emb, k=4, iters=2) == cb
    # more Lloyd iterations never increase inertia
    def inertia(cb_):
        a = assign_cells(emb, cb_)
        cdf = emb.sparkSession.createDataFrame([(cb_,)], "cents: array<array<double>>")
        return (
            a.crossJoin(F.broadcast(cdf))
            .select(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding"),
                        F.element_at(F.col("cents"), F.col("cell")),
                        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d2")
            )
            .agg(F.sum("d2"))
            .first()[0]
        )

    assert inertia(kmeans_codebook(emb, k=4, iters=3)) <= inertia(
        kmeans_codebook(emb, k=4, iters=1)
    ) + 1e-9


def test_lsh_params_scale_with_corpus():
    from burst_db_spark.operators.similarity import lsh_params_for

    n4, r4 = lsh_params_for(2_000)          # bench corpus: stays at r=4
    assert (n4, r4) == (64, 4)
    n_big, r_big = lsh_params_for(1_000_000_000)
    assert r_big > r4 and n_big == 16 * r_big
    # occupancy bound holds: N / 2^r <= target (up to the r>=4 floor)
    assert 1_000_000_000 / (2 ** r_big) <= 256


def test_embedding_lsh_recall_at_driver_sf(spark):
    """Recall of the LSH near-dup path vs the exact all-pairs set at the
    driver's SF (sf0.01, N=500): the 16-band default must recover at
    least 90% of true cos>=0.4 pairs (round-2's 8 bands measured 71%)."""
    import numpy as np

    from burst_db_spark.catalog import load
    from burst_db_spark.operators.similarity import lsh_near_dup_pairs

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    nrm = np.sqrt((x * x).sum(1))
    cos = (x @ x.T) / np.outer(nrm, nrm)
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = cos[ia, ib] >= 0.4
    exact = {
        (min(a, b), max(a, b)) for a, b in zip(ids[ia[keep]], ids[ib[keep]])
    }
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in lsh_near_dup_pairs(emb).collect()
    }
    assert got <= exact  # LSH candidates are verified: no false pairs
    assert len(got & exact) / len(exact) >= 0.9


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join evidence: a join with one hot key (80% of rows)
    gets its skewed shuffle partition SPLIT at runtime — the final
    adaptive plan marks the join ``skew=true``. Negative case: when the
    downstream aggregate requires the join's partitioning (groupBy on
    the join key), AQE skips the split rather than pay an extra
    exchange (forceOptimizeSkewedJoin=false default) — the reason
    explicit salting (above) still exists for skewed-key aggregation."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(400000).select(
            F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(2000).select(
            F.col("id").alias("k2"), F.lit("x").alias("tag")
        )
        joined = left.join(right, left.k == right.k2 % 100)

        df = joined.agg(F.sum("payload").alias("s"), F.count("*").alias("n"))
        df.collect()  # same QueryExecution -> final adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan

        df2 = joined.groupBy("k").count()
        df2.collect()
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan2
        assert "skew=true" not in plan2  # split skipped: agg reuses the
        # join's hash partitioning; splitting would force a re-shuffle
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
