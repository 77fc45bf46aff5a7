"""Round-15 operator tests: hierarchical (funnel) codebook assignment
and the Aho-Corasick multi-pattern shorts path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import similarity as sim
from burst_db_spark.operators.multipattern import (
    AhoCorasick,
    contained_short_pairs,
)
from tests.conftest import SF_DIR


# -- AhoCorasick ---------------------------------------------------------------


def test_ac_basic_and_suffix_patterns():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    assert ac.contained("ushers") == {0, 1, 3}  # she, he (suffix), hers
    assert ac.contained("this") == {2}
    assert ac.contained("xyz") == set()


def test_ac_pattern_inside_pattern():
    # "ab" nested in "abc": both must be reported (the BNLJ-replacement
    # is lossless only if nested patterns are never shadowed)
    ac = AhoCorasick(["abc", "ab", "b"])
    assert ac.contained("abc") == {0, 1, 2}


def test_ac_repeated_chars():
    ac = AhoCorasick(["aa"])
    assert ac.contained("aaa") == {0}
    assert ac.contained("a") == set()


def test_ac_matches_bruteforce_on_random_strings():
    import random

    rng = random.Random(7)
    alphabet = "abc"
    pats = list(
        {"".join(rng.choice(alphabet) for _ in range(rng.randint(1, 4)))
         for _ in range(20)}
    )
    ac = AhoCorasick(pats)
    for _ in range(50):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        expect = {i for i, p in enumerate(pats) if p in text}
        assert ac.contained(text) == expect, (text, pats)


def test_contained_short_pairs_vs_bruteforce(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "quick brown"),
        (3, "own fox j"),
        (4, "zebra"),
        (5, "quick brown"),  # same length as 2 -> never contained in 2
        (6, "q"),
    ]
    base = spark.createDataFrame(rows, "doc_id long, text string")
    shorts = base.where(F.length("text") < 12).select(
        F.col("doc_id").alias("a_id"), F.col("text").alias("a_text")
    )
    got = {
        (r.a_id, r.b_id)
        for r in contained_short_pairs(base, shorts, chunk_size=2).collect()
    }
    expect = {
        (a, b)
        for a, ta in rows
        for b, tb in rows
        if a != b and len(ta) < len(tb) and len(ta) < 12 and ta in tb
    }
    assert got == expect


def test_contained_short_pairs_empty_shorts_returns_none(spark):
    base = spark.createDataFrame(
        [(1, "long enough text here")], "doc_id long, text string"
    )
    shorts = base.where(F.length("text") < 0).select(
        F.col("doc_id").alias("a_id"), F.col("text").alias("a_text")
    )
    assert contained_short_pairs(base, shorts) is None


# -- hierarchical assignment -----------------------------------------------------


def _codebook(spark, k):
    emb = load(spark, SF_DIR, "embeddings")
    h = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    seeds = (
        emb.select(
            F.col("embedding").alias("cv"),
            F.col("vec_id").alias("sid"),
            h.alias("h"),
        )
        .orderBy("h", "sid")
        .limit(k)
    )
    cents = seeds.withColumn(
        "cell", F.row_number().over(Window.orderBy("h", "sid"))
    ).select(
        "cell", F.transform("cv", lambda x: x.cast("double")).alias("cv")
    )
    return emb, cents


def test_hier_literal_and_frame_routes_agree(spark):
    """The driver-side (literal codebook) and executor-side (centroid
    frame) group constructions produce the SAME assignment — decimal
    group centers are bit-equal by construction."""
    emb, cents = _codebook(spark, 96)
    frame = sim.assign_cells_hier(
        emb, sim.hier_group_state(cents, 9), nprobe=3
    )
    cl = [[float(x) for x in r.cv] for r in cents.orderBy("cell").collect()]
    lit = sim.assign_cells(emb, cl, hier_threshold=64, nprobe=3)
    a = {r.vec_id: r.cell for r in frame.select("vec_id", "cell").collect()}
    b = {r.vec_id: r.cell for r in lit.select("vec_id", "cell").collect()}
    assert a == b and len(a) == emb.count()


def test_hier_close_to_flat_argmin(spark):
    """The funnel's recall floor, measured so a routing regression
    can't hide. The synthetic embeddings are near-random 64-d vectors —
    the ADVERSARIAL case for coarse routing (distances concentrate, so
    group centers barely discriminate); measured agreement with the
    flat argmin is 0.76 at nprobe=3/9 and rises with nprobe (0.86/4,
    0.92/5, 0.95/6). Real embedding corpora cluster far better; the
    knn_hier_assign ORACLE pins exact determinism regardless."""
    emb, cents = _codebook(spark, 96)
    hier = sim.assign_cells_hier(
        emb, sim.hier_group_state(cents, 9), nprobe=3
    ).select("vec_id", "cell")
    cl = [[float(x) for x in r.cv] for r in cents.orderBy("cell").collect()]
    flat = sim.assign_cells(emb, cl, hier_threshold=10**9).select(
        F.col("vec_id"), F.col("cell").alias("flat_cell")
    )
    j = hier.join(flat, "vec_id")
    n = j.count()
    agree = j.where(F.col("cell") == F.col("flat_cell")).count()
    assert agree / n >= 0.7, (agree, n)


def test_kmeans_unrolled_hier_path_deterministic(spark):
    """Unrolled Lloyd with the funnel OPTED IN (r13 ADVICE: the
    approximate route never engages implicitly — hier_threshold must
    be passed): two builds return identical stats (the hierarchical
    rounds are deterministic even though collect_list order is not)."""
    emb = load(spark, SF_DIR, "embeddings")
    s1 = sim.kmeans_unrolled_stats(emb, k=64, rounds=2, hier_threshold=64)
    s2 = sim.kmeans_unrolled_stats(emb, k=64, rounds=2, hier_threshold=64)
    r1 = sorted(map(tuple, s1.collect()))
    r2 = sorted(map(tuple, s2.collect()))
    assert r1 == r2
    assert sum(r[1] for r in r1) == emb.count()


def test_kmeans_unrolled_default_is_exact(spark):
    """Default hier_threshold=None takes the EXACT flat path even past
    the old implicit switch point: stats equal the funnel-disabled
    build (r13 ADVICE — no hidden size switch)."""
    emb = load(spark, SF_DIR, "embeddings")
    dflt = sorted(
        map(tuple, sim.kmeans_unrolled_stats(emb, k=64, rounds=1).collect())
    )
    exact = sorted(
        map(
            tuple,
            sim.kmeans_unrolled_stats(
                emb, k=64, rounds=1, hier_threshold=10**9
            ).collect(),
        )
    )
    assert dflt == exact


def test_hier2_deterministic_and_close_to_flat(spark):
    """Two-level funnel (VERDICT r13 #4): deterministic across builds,
    covers every vector exactly once, and stays within a measured
    agreement floor of the exact flat argmin on the adversarial
    near-random synthetic embeddings (measured 0.95 at k=512,
    g=64, g2=8, nprobe2=nprobe=3 on sf0.01; looser floor here for the
    sf0.001 slice)."""
    emb, cents = _codebook(spark, 64)
    st2 = sim.hier_group_state2(cents, g=16, g2=4)
    a = sim.assign_cells_hier2(emb, st2, 3, 3).select("vec_id", "cell")
    r1 = {r.vec_id: r.cell for r in a.collect()}
    r2 = {
        r.vec_id: r.cell
        for r in sim.assign_cells_hier2(emb, st2, 3, 3)
        .select("vec_id", "cell")
        .collect()
    }
    assert r1 == r2 and len(r1) == emb.count()
    cl = [[float(x) for x in r.cv] for r in cents.orderBy("cell").collect()]
    flat = {
        r.vec_id: r.cell
        for r in sim.assign_cells(emb, cl).select("vec_id", "cell").collect()
    }
    agree = sum(1 for k in flat if r1[k] == flat[k]) / len(flat)
    assert agree >= 0.6, agree


def test_hier2_members_match_hier1_members(spark):
    """The fine tier of the 2-level state is the SAME k-row member
    frame the 1-level route builds — only the coarse probe recursed."""
    _, cents = _codebook(spark, 64)
    m1, _ = sim.hier_group_state(cents, 16)
    m2, _ = sim.hier_group_state2(cents, g=16, g2=4)
    a = sorted((r.cell, r.gid) for r in m1.select("cell", "gid").collect())
    b = sorted((r.cell, r.gid) for r in m2.select("cell", "gid").collect())
    assert a == b


def test_ac_unicode_patterns():
    ac = AhoCorasick(["héllo", "wörld", "日本"])
    assert ac.contained("say héllo to the wörld") == {0, 1}
    assert ac.contained("日本語のテキスト") == {2}
    assert ac.contained("plain ascii") == set()
