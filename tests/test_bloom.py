"""Bloom filter: no false negatives, bounded false positives,
deterministic bits, map-side test plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from burst_db_spark.operators.bloom import bloom_contains, build_bloom

M = 1 << 14
K = 3


class TestBloom:
    def _keys(self, spark, lo, hi, name="k"):
        return spark.range(lo, hi).select(
            F.concat(F.lit("key-"), F.col("id")).alias(name)
        )

    def test_no_false_negatives(self, spark):
        train = self._keys(spark, 0, 500)
        bits = build_bloom(train, "k", M, K)
        got = train.select(
            "k", bloom_contains(spark, F.col("k"), bits, M, K).alias("hit")
        )
        assert all(r["hit"] for r in got.collect())

    def test_false_positive_rate_bounded(self, spark):
        train = self._keys(spark, 0, 500)
        bits = build_bloom(train, "k", M, K)
        probe = self._keys(spark, 10_000, 12_000)
        n_fp = (
            probe.select(bloom_contains(spark, F.col("k"), bits, M, K).alias("h"))
            .where("h")
            .count()
        )
        # kn/m = 1500/16384 → fill ≈ 0.088, fp ≈ 0.088^3 ≈ 7e-4
        assert n_fp / 2000 < 0.01

    def test_deterministic_across_partitionings(self, spark):
        a = build_bloom(self._keys(spark, 0, 300), "k", M, K)
        b = build_bloom(self._keys(spark, 0, 300).repartition(7), "k", M, K)
        assert a == b
        assert np.frombuffer(a, dtype=np.uint8).any()

    def test_membership_is_map_side(self, spark):
        bits = build_bloom(self._keys(spark, 0, 10), "k", M, K)
        probe = self._keys(spark, 0, 100)
        out = probe.where(bloom_contains(spark, F.col("k"), bits, M, K))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBloomContainedCount:
    def test_array_count_matches_scalar_contains(self, spark):
        from burst_db_spark.operators.bloom import bloom_contained_count

        keys = spark.range(0, 200).selectExpr("concat('k', id) AS k")
        bits = build_bloom(keys.where("id < 60"), "k", M, K)
        # per-row arrays mixing members and non-members, plus edge rows
        df = spark.createDataFrame(
            [
                (1, ["k1", "k2", "k100", "k199"]),   # 2 members
                (2, ["k59", "k60"]),                  # 1 member (k60 out)
                (3, []),                              # empty array
                (4, None),                            # null array
                (5, ["k0"] * 5),                      # duplicates count 5x
            ],
            "id int, arr array<string>",
        )
        got = {
            r["id"]: r["c"]
            for r in df.select(
                "id",
                bloom_contained_count(spark, F.col("arr"), bits, M, K).alias(
                    "c"
                ),
            ).collect()
        }
        # cross-check rows 1/2 against the scalar tester (same hash family)
        exploded = (
            df.where("id <= 2")
            .selectExpr("id", "explode(arr) AS k")
            .select(
                "id", bloom_contains(spark, F.col("k"), bits, M, K).alias("h")
            )
            .groupBy("id")
            .agg(F.sum(F.col("h").cast("int")).alias("c"))
        )
        scalar = {r["id"]: r["c"] for r in exploded.collect()}
        assert got[1] == scalar[1]
        assert got[2] == scalar[2]
        assert got[3] == 0 and got[4] == 0
        assert got[5] == 5
