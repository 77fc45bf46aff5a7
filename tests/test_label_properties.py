"""Property tests: the window-based sessionize+label implementation vs an
independent pure-python executable spec of the reference's algorithm
(reconcile_and_label_db.py:290-412) on hypothesis-generated time series.

This is the SURVEY §7.4.1 hard part: full/partial batch logic × session
splits × numbering — off-by-ones hide here.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from burst_db_spark.operators.sessionize import sessionize_and_label

GAP = 3600.0  # 1h
BATCH = 4


def spec_labels(times: list[datetime], gap_s: float, batch: int) -> dict[datetime, str]:
    """Executable spec, written directly from the reference's described
    semantics (sorted; new group at gap >= threshold; groups numbered
    1..; group < batch → no_run; full batches historical_NN; tail
    forward_NN)."""
    if not times:
        return {}
    ts = sorted(times)
    groups: list[list[datetime]] = [[ts[0]]]
    for prev, cur in zip(ts, ts[1:]):
        if (cur - prev).total_seconds() >= gap_s:
            groups.append([cur])
        else:
            groups[-1].append(cur)
    out = {}
    for gnum, g in enumerate(groups, start=1):
        n = len(g)
        if n < batch:
            for t in g:
                out[t] = "no_run"
            continue
        full = n // batch
        for i, t in enumerate(g):
            if i // batch < full:
                out[t] = f"historical_{gnum:02d}"
            else:
                out[t] = f"forward_{gnum:02d}"
    return out


@st.composite
def time_series(draw):
    base = datetime(2024, 1, 1)
    n = draw(st.integers(min_value=1, max_value=40))
    # offsets in minutes; duplicates avoided so the ordering is total
    offs = draw(
        st.lists(
            st.integers(min_value=0, max_value=100_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    return [base + timedelta(minutes=o) for o in offs]


@settings(max_examples=12, deadline=None)
@given(series=st.lists(time_series(), min_size=1, max_size=4))
def test_labels_match_spec(spark, series):
    rows = [
        (key, t) for key, times in enumerate(series) for t in times
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize_and_label(df, "user_id", "ts", GAP, batch_size=BATCH)
    got = {
        (r.user_id, r.ts): r.label
        for r in out.select("user_id", "ts", "label").collect()
    }
    for key, times in enumerate(series):
        expected = spec_labels(times, GAP, BATCH)
        for t, lab in expected.items():
            assert got[(key, t)] == lab, (
                f"key={key} t={t}: got {got[(key, t)]}, spec {lab}"
            )


def test_curriculum_scalable_equals_global_ntile(spark):
    import random

    from pyspark.sql import functions as F

    from burst_db_spark.operators.text import (
        curriculum_buckets,
        curriculum_buckets_scalable,
    )

    rng = random.Random(5)
    rows = [(i, rng.randint(0, 50)) for i in range(337)]
    df = spark.createDataFrame(rows, "id long, score int")
    for n in (4, 7):
        a = {
            r.id: r.bucket
            for r in curriculum_buckets(
                df, F.col("score"), n_buckets=n, order_key=F.col("id")
            ).collect()
        }
        b = {
            r.id: r.bucket
            for r in curriculum_buckets_scalable(
                df, F.col("score"), n_buckets=n, order_key=F.col("id"), n_parts=5
            ).collect()
        }
        assert a == b, n
    # fewer rows than buckets: each row its own bucket
    tiny = spark.createDataFrame([(1, 9), (2, 3)], "id long, score int")
    got = {
        r.id: r.bucket
        for r in curriculum_buckets_scalable(
            tiny, F.col("score"), n_buckets=4, order_key=F.col("id"), n_parts=3
        ).collect()
    }
    assert got == {2: 1, 1: 2}


def test_cc_local_and_iterative_paths_agree(spark):
    """The gated local union-find and the distributed min-label loop
    must produce the identical (id, cluster_id) relation."""
    from burst_db_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    verts = spark.createDataFrame([(i,) for i in
        [1, 2, 3, 10, 11, 20, 21, 22, 99]], "doc_id long")
    local = {(r.doc_id, r.cluster_id) for r in
             connected_components(pairs, verts, "doc_id").collect()}
    dist = {(r.doc_id, r.cluster_id) for r in
            connected_components(pairs, verts, "doc_id",
                                 local_edge_gate=0).collect()}
    assert local == dist
    assert (99, 99) in local          # isolated vertex labels itself
    assert (3, 1) in local and (22, 20) in local
