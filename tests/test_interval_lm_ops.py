"""Round-4 operator tests: binned interval join semantics + trigram
stupid-backoff LM."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from burst_db_spark.operators.joins import binned_interval_join
from burst_db_spark.operators.lm import trigram_backoff_scores


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_binned_interval_join_half_open_and_unique(spark):
    facts = spark.createDataFrame(
        [
            Row(event_id=1, ts=_ts("2024-01-01 00:00:00")),  # == start: in
            Row(event_id=2, ts=_ts("2024-01-01 17:59:59")),  # inside
            Row(event_id=3, ts=_ts("2024-01-01 18:00:00")),  # == end: OUT
            Row(event_id=4, ts=_ts("2024-01-02 11:00:00")),  # no interval
            Row(event_id=5, ts=_ts("2024-01-02 12:30:00")),  # second interval
        ]
    )
    iv = spark.createDataFrame(
        [
            Row(interval_id=0, start_ts=_ts("2024-01-01 00:00:00"),
                end_ts=_ts("2024-01-01 18:00:00")),
            Row(interval_id=1, start_ts=_ts("2024-01-02 12:00:00"),
                end_ts=_ts("2024-01-02 13:00:00")),
        ]
    )
    out = binned_interval_join(facts, iv, "ts").select("event_id", "interval_id")
    got = sorted((r.event_id, r.interval_id) for r in out.collect())
    assert got == [(1, 0), (2, 0), (5, 1)]


def test_binned_interval_join_overlapping_intervals_multimatch(spark):
    facts = spark.createDataFrame([Row(event_id=1, ts=_ts("2024-01-01 06:00:00"))])
    iv = spark.createDataFrame(
        [
            Row(interval_id=0, start_ts=_ts("2024-01-01 00:00:00"),
                end_ts=_ts("2024-01-01 12:00:00")),
            Row(interval_id=1, start_ts=_ts("2024-01-01 05:00:00"),
                end_ts=_ts("2024-01-01 07:00:00")),
        ]
    )
    out = binned_interval_join(facts, iv, "ts")
    # one output row per overlapping interval, never duplicated per bin
    assert sorted(r.interval_id for r in out.collect()) == [0, 1]


def test_binned_interval_join_matches_naive_range_join(spark):
    # random-ish but deterministic facts/intervals; compare against the
    # nested-loop formulation
    facts = spark.range(200).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + F.col("id") * F.lit(977_000_000)
        ).alias("ts"),
    )
    iv = spark.range(7).select(
        F.col("id").alias("interval_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + F.col("id") * F.lit(25_000_000_000)
        ).alias("start_ts"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000)
            + F.col("id") * F.lit(25_000_000_000)
            + F.lit(11_000_000_000)
        ).alias("end_ts"),
    )
    fast = binned_interval_join(facts, iv, "ts", bin_us=3_600_000_000)
    naive = facts.join(
        iv,
        (facts.ts >= iv.start_ts) & (facts.ts < iv.end_ts),
    )
    key = lambda df: sorted((r.event_id, r.interval_id) for r in
                            df.select("event_id", "interval_id").collect())
    assert key(fast) == key(naive)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_trigram_backoff_levels(spark):
    train = _docs(
        spark,
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
        ],
    )
    # trigram "the cat sat" seen; "the cat ran": backoff to bigram
    # "cat ran" (unseen) -> unigram "ran" (unseen, c3=0 -> p=0 branch)
    score = _docs(spark, [(10, "the cat sat"), (11, "the cat ran")])
    out = {r.doc_id: r for r in
           trigram_backoff_scores(train, score, "doc_id").collect()}
    assert out[10].n_trigrams == 1
    assert out[10].n_tri_hits == 1
    # train: c("the cat sat")=1, c("the cat")=1 -> p=1.0
    assert out[10].mean_p == 1.0
    assert out[11].n_tri_hits == 0
    assert out[11].n_bigram_backoffs == 0  # "cat ran" bigram unseen
    assert out[11].mean_p == 0.0  # unigram "ran" unseen -> 0

    # bigram-level backoff: "dog sat on" IS in train; "cat sat under":
    # trigram unseen, bigram "sat under" unseen; "cat sat on": trigram
    # unseen ("cat sat on" -- wait, it IS in train doc1), pick
    # "dog ran on": trigram unseen, bigram "ran on" unseen, unigram "on"
    # seen (c=2, N=12) -> p = 0.16 * 2/12
    score2 = _docs(spark, [(12, "dog ran on")])
    r12 = trigram_backoff_scores(train, score2, "doc_id").collect()[0]
    assert r12.n_tri_hits == 0 and r12.n_bigram_backoffs == 0
    assert abs(r12.mean_p - 0.4 * 0.4 * 2 / 12) < 1e-12


def test_trigram_bigram_backoff_branch(spark):
    train = _docs(spark, [(1, "a b c"), (2, "x b c")])
    # "q b c": trigram "q b c" unseen; bigram (b, c) seen c23=2;
    # c2 = count of "b" = 2 -> p = 0.4 * 2/2 = 0.4
    score = _docs(spark, [(10, "q b c")])
    r = trigram_backoff_scores(train, score, "doc_id").collect()[0]
    assert r.n_tri_hits == 0 and r.n_bigram_backoffs == 1
    assert abs(r.mean_p - 0.4) < 1e-12


def test_binned_interval_join_property(spark):
    """Hypothesis: binned join == naive range join for arbitrary
    micro-offset facts and overlapping/abutting/zero-length intervals."""
    from hypothesis import given, settings, strategies as st

    base = 1_704_067_200_000_000

    @settings(max_examples=15, deadline=None)
    @given(
        fact_offs=st.lists(
            st.integers(min_value=0, max_value=400_000_000_000),
            min_size=1, max_size=30,
        ),
        ivs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=380_000_000_000),
                st.integers(min_value=0, max_value=30_000_000_000),
            ),
            min_size=1, max_size=8,
        ),
        bin_us=st.sampled_from([3_600_000_000, 6 * 3_600_000_000]),
    )
    def check(fact_offs, ivs, bin_us):
        facts = spark.createDataFrame(
            [(i, base + off) for i, off in enumerate(fact_offs)],
            "event_id long, us long",
        ).select("event_id", F.timestamp_micros(F.col("us")).alias("ts"))
        iv = spark.createDataFrame(
            [(i, base + s, base + s + d) for i, (s, d) in enumerate(ivs)],
            "interval_id long, s long, e long",
        ).select(
            "interval_id",
            F.timestamp_micros(F.col("s")).alias("start_ts"),
            F.timestamp_micros(F.col("e")).alias("end_ts"),
        )
        fast = binned_interval_join(facts, iv, "ts", bin_us=bin_us)
        naive = facts.join(iv, (facts.ts >= iv.start_ts) & (facts.ts < iv.end_ts))
        key = lambda df: sorted(
            (r.event_id, r.interval_id)
            for r in df.select("event_id", "interval_id").collect()
        )
        assert key(fast) == key(naive)

    check()
