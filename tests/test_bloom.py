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
