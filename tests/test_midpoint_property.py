"""Midpoint-distance property tests (VERDICT r13 #7): turn the old
"no rounding midpoint is ever in play" waiver PROSE into ASSERTIONS.

Background: CORRECTNESS_r13 had five hash-red rows; every one funneled a
round(double, n) into the hash surface, and rational pre-images (s/t
with a power-of-two t) land on EXACT n-dp midpoints where a HALF_UP
engine (Spark's BigDecimal) and a half-even engine legally diverge.
Round 14 reworked every exposed round→DECIMAL route onto integer /
fixed-point surfaces and retired the ARITH_EXPLAINED waiver class
(scripts/verify_strict.py now hard-fails that shape with an EMPTY
whitelist). The residual risk is round(double) columns emitted as plain
doubles. This module:

  1. asserts the hardened lint passes with zero waivers (the hard-fail
     is real, not aspirational);
  2. asserts the SAFE-GRID premise with data: every DECIMAL money/value
     column at sf0.01 sits exactly on its 2-dp grid;
  3. for EVERY oracle that still contains round(), re-runs it on DuckDB
     at sf0.01 with round() swapped for a recording UDF and checks each
     captured pre-image with EXACT Fraction arithmetic: no value may be
     an exact midpoint, nor within 1e-9 (relative) of one, unless it is
     exactly ON the target grid (zero fractional part — the rounding
     mode is never consulted).
"""

from __future__ import annotations

import re
from fractions import Fraction

import duckdb
import pytest

from burst_db_spark.registry import all_queries
from tests.conftest import SF_DIR_MID, TABLES

# pre-images captured by the recording round() replacement
_CAPTURED: list[tuple[float, int]] = []


def _recording_round(x: float, n: int) -> float:
    # record, then reproduce round-half-away-from-zero (what both this
    # container's DuckDB and Spark produce) so query semantics continue
    if x is None:
        return None
    _CAPTURED.append((x, n))
    f = Fraction(x) * 10**n
    q = f.numerator // f.denominator
    r2 = (f - q) * 2
    if x >= 0:
        q = q + 1 if r2 >= 1 else q
    else:
        q = q + 1 if r2 > 1 else q
    return float(Fraction(q, 10**n))


def _rewrite_rounds(sql: str) -> str:
    """Replace every round( call with mpdist(, normalizing to 2 args."""
    out = []
    i = 0
    pat = re.compile(r"\bround\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        out.append("mpdist(")
        # scan to the matching close paren, tracking top-level commas
        depth = 1
        j = m.end()
        has_comma = False
        while j < len(sql) and depth:
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                has_comma = True
            j += 1
        inner = sql[m.end() : j - 1]
        out.append(inner)
        if not has_comma:
            out.append(", 0")
        out.append(")")
        i = j
    return "".join(out)


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR_MID}/{t}.parquet'"
        )
    con.create_function(
        "mpdist",
        _recording_round,
        ["DOUBLE", "BIGINT"],
        "DOUBLE",
        null_handling="special",
    )
    return con


def test_lint_hard_fails_with_empty_whitelist():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_strict",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "verify_strict.py",
        ),
    )
    vs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vs)
    assert vs.ARITH_EXPLAINED == {}, "waiver class must stay retired"
    con = duckdb.connect()
    n = vs.run_arith_lint(all_queries(), con)
    assert n == 0, f"{n} oracles expose a rounded-double->decimal hash route"


def test_money_columns_sit_on_2dp_grid():
    """The SAFE-GRID claim as data: every decimal-family money column
    round-trips 2dp exactly after the double cast."""
    con = _con()
    checks = {
        "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
        "orders": ["o_totalprice"],
        "part": ["p_retailprice"],
        "supplier": ["s_acctbal"],
        "customer": ["c_acctbal"],
    }
    for t, cols in checks.items():
        for c in cols:
            dev = con.execute(
                f"SELECT max(abs(CAST({c} AS DOUBLE) * 100 - "
                f"round(CAST({c} AS DOUBLE) * 100))) FROM {t}"
            ).fetchone()[0]
            assert dev is not None and dev < 1e-6, (t, c, dev)


_ROUNDY = sorted(
    name
    for name, spec in all_queries().items()
    if spec.oracle is not None
    and re.search(r"\bround\s*\(", spec.oracle, re.IGNORECASE)
)


@pytest.mark.parametrize("name", _ROUNDY)
def test_no_rounding_midpoint_in_play(name):
    """Every value actually rounded by this oracle at sf0.01 is either
    exactly ON the target grid (no rounding consulted) or safely far
    from the nearest midpoint."""
    spec = all_queries()[name]
    con = _con()
    _CAPTURED.clear()
    con.execute(_rewrite_rounds(spec.oracle)).fetchall()
    bad = []
    for x, n in _CAPTURED:
        f = Fraction(abs(x)) * 10**n
        frac = f - (f.numerator // f.denominator)
        if frac == 0:
            continue  # exactly on-grid: rounding mode never consulted
        dist = abs(frac - Fraction(1, 2))
        tol = max(Fraction(abs(x)) * 10**n, Fraction(1)) * Fraction(
            1, 10**9
        )
        if dist <= tol:
            bad.append((x, n, float(dist)))
    assert not bad, (
        f"{name}: {len(bad)} rounded pre-image(s) at/near a midpoint — "
        f"engine-dependent hash surface: {bad[:5]}"
    )
