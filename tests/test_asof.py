"""ASOF join payload atomicity (operators/joins.py:asof_join).

The carried payload must be ONE struct: per-column last(ignorenulls)
would stitch values from different right rows whenever a right value
column is NULL, and a match test on value_cols[0] alone would drop left
rows whose true match has NULL there. DuckDB's native ASOF JOIN is the
semantics anchor (it carries whole rows)."""

from __future__ import annotations

import duckdb

from burst_db_spark.operators.joins import asof_join


def _fixture(spark):
    # right rows per key k=1:
    #   t=10 -> (v=100, w='a')
    #   t=20 -> (v=NULL, w='b')    <- null in the FIRST value column
    #   t=30 -> (v=300, w=NULL)   <- null in the second
    right = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 20, None, "b"), (1, 30, 300, None)],
        "k int, rt int, v int, w string",
    )
    left = spark.createDataFrame(
        [(1, 5), (1, 15), (1, 25), (1, 35)], "k int, lt int"
    )
    return left, right


def test_asof_payload_is_atomic_per_right_row(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, "k", "lt", "rt", ["v", "w"])
    got = {r.lt: (r.asof_v, r.asof_w) for r in out.collect()}
    # lt=5 precedes every right row -> dropped (inner-ASOF)
    assert 5 not in got
    # lt=15 matches t=10 exactly
    assert got[15] == (100, "a")
    # lt=25 matches t=20 whose v IS NULL: the row must NOT be dropped,
    # and w must come from the SAME row ('b'), never stitched with v=100
    assert got[25] == (None, "b")
    # lt=35 matches t=30: v=300 with w NULL from that same row
    assert got[35] == (300, None)


def test_asof_matches_duckdb_native(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, "k", "lt", "rt", ["v", "w"])
    got = sorted(
        (r.k, r.lt, r.asof_v, r.asof_w) for r in out.collect()
    )
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    want = sorted(
        tuple(None if x != x and isinstance(x, float) else x for x in row)
        for row in con.execute(
            """
            SELECT l.k, l.lt, r.v, r.w
            FROM l ASOF JOIN r ON l.k = r.k AND l.lt >= r.rt
            """
        ).fetchall()
    )
    norm = lambda rows: sorted(  # noqa: E731
        tuple(None if v is None else int(v) if isinstance(v, float) else v for v in t)
        for t in rows
    )
    assert norm(got) == norm(want)
