"""Round-3 pipeline operators: repetition statistics and deterministic
stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from burst_db_spark.operators.packing import assign_split, stratified_sample
from burst_db_spark.operators.text import repetition_features


def _row(out, doc_id):
    return {r["doc_id"]: r for r in out.collect()}[doc_id]


class TestRepetitionFeatures:
    def test_known_counts(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b a b a b"),  # 5 bigrams, top 'a b' x3; 2 distinct 5-grams
                (2, "x"),            # too short for any gram
                (3, "w w w w w w w w"),  # fully repetitive
            ],
            "doc_id long, text string",
        )
        out = repetition_features(df, "doc_id")
        r1 = _row(out, 1)
        assert r1["total_bigrams"] == 5
        assert r1["top_bigram_count"] == 3
        assert abs(r1["top_bigram_frac"] - 3 / 5) < 1e-12
        assert r1["total_5grams"] == 2
        assert r1["distinct_5grams"] == 2
        assert r1["dup_5gram_frac"] == 0.0
        assert r1["keep"] == 0  # top-bigram occupancy 0.6 > 0.2

        r2 = _row(out, 2)
        assert r2["total_bigrams"] == 0
        assert r2["top_bigram_frac"] == 0.0
        assert r2["keep"] == 1

        r3 = _row(out, 3)
        assert r3["top_bigram_count"] == 7 and r3["total_bigrams"] == 7
        assert r3["distinct_5grams"] == 1 and r3["total_5grams"] == 4
        assert abs(r3["dup_5gram_frac"] - 3 / 4) < 1e-12
        assert r3["keep"] == 0

    def test_every_doc_present(self, spark):
        df = spark.createDataFrame(
            [(i, "tok") for i in range(10)], "doc_id long, text string"
        )
        assert repetition_features(df, "doc_id").count() == 10


class TestStratifiedSample:
    def _frame(self, spark, n=2000):
        return spark.range(n).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 3 == 0, "en")
            .when(F.col("id") % 3 == 1, "de")
            .otherwise("zh")
            .alias("lang"),
        )

    def test_deterministic_and_thresholded(self, spark):
        df = self._frame(spark)
        fr = {"en": 0.5, "de": 0.25}
        a = sorted(r["k"] for r in stratified_sample(df, "k", "lang", fr, 0.1).collect())
        b = sorted(r["k"] for r in stratified_sample(df, "k", "lang", fr, 0.1).collect())
        assert a == b and len(a) > 0
        out = stratified_sample(df, "k", "lang", fr, 0.1)
        for r in out.collect():
            limit = {"en": 5000, "de": 2500}.get(r["lang"], 1000)
            assert 0 <= r["sample_bucket"] < limit

    def test_fractions_roughly_honored(self, spark):
        df = self._frame(spark, 3000)
        out = stratified_sample(df, "k", "lang", {"en": 0.5}, 0.1)
        got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # 1000 keys per stratum: md5 buckets ≈ uniform
        assert abs(got["en"] - 500) < 120
        assert abs(got.get("de", 0) - 100) < 60

    def test_no_shuffle_and_decorrelated_from_split(self, spark):
        df = self._frame(spark)
        out = stratified_sample(df, "k", "lang", {"en": 0.5}, 0.1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        # different salt family than assign_split: the sample must not be
        # a subset of any one split's hash range
        splits = {
            r["k"]: r["split"] for r in assign_split(df, "k").collect()
        }
        sampled = [r["k"] for r in out.collect()]
        assert len({splits[k] for k in sampled}) > 1
