"""Property tests for the round-9 primitives: two-phase bottom-k
mergeability, the two-pass exact lower median, and the vectorized
Bloom array count — each against its brute-force definition."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from burst_db_spark.queries.round8 import _lower_median_2pass


def test_two_phase_bottom_k_equals_global(spark):
    """dedup.two_phase_bottom_k == global bottom-k for every shard
    count (mergeable-monoid property the a32 / a36 / a38 /
    overlap-matrix builds rely on)."""
    from pyspark.sql.window import Window

    from burst_db_spark.operators.dedup import two_phase_bottom_k

    rng = random.Random(907)
    rows = [(f"g{gi}", f"{rng.getrandbits(128):032x}")
            for gi in range(3) for _ in range(rng.randint(5, 400))]
    df = spark.createDataFrame(rows, "grp string, h string").distinct()
    k = 16
    w_merge = Window.partitionBy("grp").orderBy("h")
    global_k = sorted(
        map(
            tuple,
            df.withColumn("rn", F.row_number().over(w_merge))
            .where(F.col("rn") <= k)
            .select("grp", "h")
            .collect(),
        )
    )
    for n_shards in (1, 4, 8):
        got = sorted(
            map(
                tuple,
                two_phase_bottom_k(df, ["grp"], "h", k, n_shards).collect(),
            )
        )
        assert got == global_k, n_shards


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-50_000, max_value=50_000), min_size=1,
        max_size=300,
    )
)
def test_two_pass_lower_median_matches_sorted(spark, vals):
    """_lower_median_2pass == element at rank ceil(n/2) of the sorted
    values, for any integer distribution (negatives included — the
    arithmetic shiftright bucketing must floor correctly)."""
    df = spark.createDataFrame(
        [("t", i, v) for i, v in enumerate(vals)],
        "event_type string, event_id long, cents long",
    )
    got = _lower_median_2pass(df, "cents", "med")
    expect = sorted(vals)[(len(vals) + 1) // 2 - 1]
    assert got.collect()[0]["med"] == expect


def test_bloom_array_count_matches_naive(spark):
    """Vectorized reduceat count == per-element membership sum for
    random ragged arrays (lengths 0..17, nulls interleaved)."""
    from burst_db_spark.operators.bloom import (
        bloom_contained_count,
        build_bloom,
    )

    rng = random.Random(31)
    member_keys = [f"m{i}" for i in range(80)]
    other_keys = [f"x{i}" for i in range(80)]
    bits = build_bloom(
        spark.createDataFrame([(k,) for k in member_keys], "k string"),
        "k", 1 << 14, 3,
    )
    rows = []
    for i in range(60):
        if i % 13 == 0:
            rows.append((i, None))
            continue
        arr = [rng.choice(member_keys + other_keys)
               for _ in range(rng.randint(0, 17))]
        if i % 7 == 0:
            arr.append(None)  # NULL elements must count as non-members
        rows.append((i, arr))
    df = spark.createDataFrame(rows, "id int, arr array<string>")
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id",
            bloom_contained_count(
                spark, F.col("arr"), bits, 1 << 14, 3
            ).alias("c"),
        ).collect()
    }
    # naive: explode + scalar bloom_contains (shares the hash family)
    from burst_db_spark.operators.bloom import bloom_contains

    # no NULL pre-filter: scalar bloom_contains now tests FALSE on NULL
    # keys itself (r9 ADVICE), so exploded-scalar must agree with the
    # array path on NULL-bearing rows without help
    naive = {
        r["id"]: r["c"]
        for r in df.selectExpr("id", "explode(arr) AS k")
        .select(
            "id",
            bloom_contains(spark, F.col("k"), bits, 1 << 14, 3)
            .cast("int")
            .alias("h"),
        )
        .groupBy("id")
        .agg(F.sum("h").alias("c"))
        .collect()
    }
    for i, c in got.items():
        assert c == naive.get(i, 0), (i, c, naive.get(i))


def test_bloom_contains_null_is_false(spark):
    """NULL keys test FALSE (not the hashed literal 'None') — shared
    NULL semantics with bloom_contained_count (r9 ADVICE)."""
    from burst_db_spark.operators.bloom import bloom_contains, build_bloom

    keys = spark.createDataFrame([("None",), ("a",)], "k string")
    bits = build_bloom(keys, "k", 1 << 12, 3)
    probe = spark.createDataFrame(
        [(1, "None"), (2, None), (3, "a")], "id int, k string"
    )
    got = {
        r["id"]: r["h"]
        for r in probe.select(
            "id", bloom_contains(spark, F.col("k"), bits, 1 << 12, 3).alias("h")
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True}


def test_two_phase_bottom_k_short_keys_and_column_collisions(spark):
    """Keys narrower than an md5 digest still shard (the old digest-tail
    substring sent every short key to one NULL shard), and caller
    columns named 'shard'/'rn' survive untouched (r9 ADVICE)."""
    from pyspark.sql.window import Window

    from burst_db_spark.operators.dedup import two_phase_bottom_k

    rng = random.Random(113)
    rows = [
        (f"g{gi}", f"{rng.getrandbits(24):06x}", gi, -gi)
        for gi in range(3)
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        rows, "grp string, h string, shard int, rn int"
    ).distinct()
    k = 16
    w = Window.partitionBy("grp").orderBy("h")
    expect = sorted(
        map(
            tuple,
            df.withColumn("gr", F.row_number().over(w))
            .where(F.col("gr") <= k)
            .select("grp", "h")
            .collect(),
        )
    )
    out = two_phase_bottom_k(
        df.select("grp", "h", "shard", "rn"), ["grp", "shard", "rn"], "h", k
    )
    # caller's shard/rn columns ride through as partition keys unharmed
    assert set(out.columns) == {"grp", "shard", "rn", "h"}
    got = sorted(map(tuple, out.select("grp", "h").collect()))
    assert got == expect
    # and the hash shard actually spreads short keys across shards
    n_shards = (
        df.select(F.pmod(F.xxhash64("h"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_shards > 1
