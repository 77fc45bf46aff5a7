"""Grid-cell spatial join vs naive baselines (operators/spatial_join.py).

Randomized rects/points exercise cell-boundary cases the registered
queries can't: boxes ending exactly on cell edges, negative coords,
boxes wider than a cell, probes whose nearest neighbor is outside the
3×3 neighborhood (fallback path)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from burst_db_spark.operators.spatial_join import grid_bbox_join, grid_nn_join


def test_grid_bbox_join_matches_naive(spark):
    rng = random.Random(7)
    lrows = []
    for i in range(120):
        x = rng.randint(-64, 64)
        y = rng.randint(-64, 64)
        lrows.append((i, x, y, x + rng.choice([0, 1, 8, 16, 33]), y + rng.randint(0, 9)))
    rrows = []
    for j in range(60):
        x = rng.randint(-64, 64)
        y = rng.randint(-64, 64)
        rrows.append((j, x, y, x + rng.randint(0, 20), y + rng.choice([0, 16, 32])))
    l = spark.createDataFrame(lrows, "lid int, xmin int, ymin int, xmax int, ymax int")
    r = spark.createDataFrame(rrows, "rid int, sxmin int, symin int, sxmax int, symax int")

    got = sorted(
        (row.lid, row.rid)
        for row in grid_bbox_join(
            l, r, ("xmin", "ymin", "xmax", "ymax"),
            ("sxmin", "symin", "sxmax", "symax"), cell_size=16.0
        ).collect()
    )
    want = sorted(
        (a[0], b[0])
        for a in lrows
        for b in rrows
        if a[1] <= b[3] and a[3] >= b[1] and a[2] <= b[4] and a[4] >= b[2]
    )
    assert got == want
    # exactly-once: no pair duplicated by multi-cell overlap
    assert len(got) == len(set(got))


def test_grid_nn_join_matches_naive_incl_fallback(spark):
    rng = random.Random(11)
    # sparse points force some probes through the exact-fallback branch
    probes = [(i, rng.randint(-100, 100), rng.randint(-100, 100)) for i in range(80)]
    points = [(j, rng.randint(-100, 100), rng.randint(-100, 100)) for j in range(6)]
    p = spark.createDataFrame(probes, "pid int, px int, py int")
    q = spark.createDataFrame(points, "qid int, sx int, sy int")
    out = grid_nn_join(
        p, q, probe_key="pid", probe_xy=("px", "py"), point_xy=("sx", "sy"),
        cell_size=16.0, point_cols=("qid",), tie_break="qid",
    )
    got = {row["pid"]: (row["qid"], row["__dist_sq"]) for row in out.collect()}

    def nn(px, py):
        return min(
            ((qx - px) ** 2 + (qy - py) ** 2, qid) for qid, qx, qy in points
        )

    assert len(got) == len(probes)
    for pid, px, py in probes:
        d, qid = nn(px, py)
        assert got[pid] == (qid, d), pid
