"""Winnowing fingerprints (Schleimer et al. SIGMOD'03): bit-exact
cross-check against an independent pure-Python reference, the two
theorems of the scheme (window coverage, match-detection guarantee),
and the plan shape of the overlap join."""

from __future__ import annotations

import hashlib

import pytest

from burst_db_spark.operators.text import (
    WINNOW_POS_MAX,
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 8, 4


def py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, str]]:
    """Independent reference: explicit window scan, min hash with
    rightmost tie-break, exactly the published scheme."""
    t = text.strip().lower()
    grams = [t[i : i + k] for i in range(len(t) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest()[:15] for g in grams]
    out: set[tuple[int, str]] = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        m = min(win)
        # rightmost position holding the min
        p = j + max(i for i, h in enumerate(win) if h == m)
        out.add((p + 1, m))  # 1-based
    return out


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank."),
    (2, "the QUICK brown fox JUMPS over a sleepy dog by the river bank..."),
    (3, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate: all grams identical
    (4, "short"),  # below k + w - 1: no fingerprints
    (5, "exactly11ch"),  # == k + w - 1: exactly one window
    (6, "Numbers 12345 and symbols !@# $%^ mixed into prose text here."),
]


@pytest.fixture(scope="module")
def spark_fps(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = winnow_fingerprints(df, "doc_id", k=K, w=W).collect()
    got: dict[int, set[tuple[int, str]]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp"]))
    return got


def test_matches_python_reference_bit_exact(spark_fps):
    for doc_id, text in DOCS:
        assert spark_fps.get(doc_id, set()) == py_winnow(text), doc_id


def test_short_doc_emits_nothing(spark_fps):
    assert 4 not in spark_fps


def test_exact_threshold_doc_emits_one(spark_fps):
    assert len(spark_fps[5]) == 1


def test_degenerate_repeat_doc_selects_rightmost_per_window(spark_fps):
    # all hashes equal -> every window picks its rightmost position;
    # selected positions are w..m (1-based), the rightmost of each window
    t = DOCS[2][1]
    m = len(t) - K + 1
    assert {p for p, _ in spark_fps[3]} == set(range(W, m + 1))


def test_window_coverage_guarantee(spark_fps):
    """Every window of w consecutive grams contains >= 1 selected pos."""
    for doc_id, text in DOCS:
        t = text.strip().lower()
        m = len(t) - K + 1
        if m < W:
            continue
        pos = {p for p, _ in spark_fps[doc_id]}
        for j in range(1, m - W + 2):
            assert pos & set(range(j, j + W)), (doc_id, j)


def test_match_guarantee_shared_substring(spark):
    """Two docs sharing a substring of >= k + w - 1 chars share >= 1
    identical (fp, offset-in-substring) fingerprint."""
    shared = "zqxjkvbnmpwoeirutyalskdjfhg"  # 27 chars, no repeats
    df = spark.createDataFrame(
        [(1, "prefix one " + shared + " tail A"),
         (2, "another beginning " + shared + " different end")],
        ["doc_id", "text"],
    )
    rows = winnow_fingerprints(df, "doc_id", k=K, w=W).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


def test_density_is_near_two_over_w_plus_one(spark):
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(4000))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    n = winnow_fingerprints(df, "doc_id", k=K, w=W).count()
    m = len(text.strip()) - K + 1
    expect = 2.0 / (W + 1)
    assert 0.7 * expect <= n / m <= 1.3 * expect


def test_overlap_pairs_plan_is_equi_join(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = winnow_overlap_pairs(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pos_key_roundtrip_bound():
    # the reversed-position pad must cover any realistic doc length
    assert WINNOW_POS_MAX == 999_999_999
