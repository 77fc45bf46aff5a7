"""Deterministic weighted interleave: stride-scheduling invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators.packing import (
    grouped_hash_rank,
    interleave_by_weight,
)
from tests.conftest import SF_DIR


def test_grouped_hash_rank_equals_windowed_rank(spark):
    """hash-range decomposition == plain per-group row_number over the
    same md5 order, for every group."""
    docs = load(spark, SF_DIR, "documents").select("doc_id", "source")
    got = {
        (r["source"], r["doc_id"]): r["rank"]
        for r in grouped_hash_rank(
            docs, "doc_id", "s1", ["source"]
        ).collect()
    }
    from pyspark.sql import Window

    rk = F.md5(F.concat_ws(":", F.lit("s1"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(rk, "doc_id")
    expect = {
        (r["source"], r["doc_id"]): r["rank"]
        for r in docs.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        ).collect()
    }
    assert got == expect


def test_interleave_proportionality_invariant(spark):
    """Stride scheduling law: by any virtual time T, source s has
    emitted exactly min(floor(T / stride_s), n_s) documents — i.e.
    every prefix of the vtime-ordered stream is weight-proportional up
    to one stride per source."""
    docs = load(spark, SF_DIR, "documents").select("doc_id", "source")
    weights = {f"src{i}": 1 + (i % 3) for i in range(20)}
    lcm = 6
    out = interleave_by_weight(docs, "doc_id", "source", weights).collect()
    n_s: dict[str, int] = {}
    for r in out:
        n_s[r["source"]] = n_s.get(r["source"], 0) + 1
    times = sorted({r["vtime"] for r in out})
    for T in times[:: max(1, len(times) // 25)] + [times[-1]]:
        for s, w in weights.items():
            stride = lcm // w
            emitted = sum(
                1 for r in out if r["source"] == s and r["vtime"] <= T
            )
            assert emitted == min(T // stride, n_s.get(s, 0)), (s, T)


def test_interleave_deterministic_across_sessions(spark):
    """Same seed -> identical schedule on a re-run; different seed ->
    different permutation (almost surely) with identical vtime grid."""
    docs = load(spark, SF_DIR, "documents").select("doc_id", "source")
    weights = {f"src{i}": 1 + (i % 3) for i in range(20)}
    a = sorted(
        map(tuple, interleave_by_weight(docs, "doc_id", "source", weights).collect())
    )
    b = sorted(
        map(tuple, interleave_by_weight(docs, "doc_id", "source", weights).collect())
    )
    assert a == b
    c = interleave_by_weight(docs, "doc_id", "source", weights, seed="mix1")
    c_rows = sorted(map(tuple, c.collect()))
    assert c_rows != a
    assert {r[3] for r in c_rows} == {r[3] for r in a}
