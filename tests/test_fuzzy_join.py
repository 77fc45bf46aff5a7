"""fuzzy_string_self_join (FastSS deletion-neighborhood): the candidate
generation must be LOSSLESS vs the quadratic Levenshtein baseline on
arbitrary vocabularies — short strings, empty strings, duplicates,
unicode-ish chars, both max_dist settings."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from burst_db_spark.operators.joins import fuzzy_string_self_join

_ALPHA = "abcx"  # tiny alphabet => dense near-matches, worst case


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@st.composite
def _vocab(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    return [
        "".join(
            _ALPHA[draw(st.integers(min_value=0, max_value=len(_ALPHA) - 1))]
            for _ in range(draw(st.integers(min_value=0, max_value=6)))
        )
        for _ in range(n)
    ]


@settings(max_examples=12, deadline=None)
@given(vocab=_vocab(), max_dist=st.sampled_from([1, 2]))
def test_fuzzy_join_lossless_property(spark, vocab, max_dist):
    """Deletion-neighborhood candidates must recover EVERY pair within
    the edit-distance bound (the FastSS theorem), and the verify must
    drop every pair beyond it — equality with the brute-force pairs."""
    df = spark.createDataFrame([(v,) for v in vocab], "p_name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_string_self_join(df, "p_name", max_dist=max_dist).collect()
    }
    names = sorted(set(vocab))
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(names, 2)
        if _lev(a, b) <= max_dist
    }
    assert got == want


def test_fuzzy_join_rejects_bad_max_dist(spark):
    import pytest

    df = spark.createDataFrame([("x",)], "p_name string")
    with pytest.raises(ValueError):
        fuzzy_string_self_join(df, "p_name", max_dist=3)
