"""Domain-pipeline tests: EP1 frame partitioning invariants (the
reference's own runtime checks, SURVEY.md §5), reference-date semantics
vs a hand-computed golden + the pure-python core, blackout windows."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from burst_db_spark.plans import fixtures
from burst_db_spark.plans.blackout import apply_blackouts, yearly_windows
from burst_db_spark.plans.frame_db import (
    MAX_FRAME,
    MIN_FRAME,
    build_frames,
    solve_frame_sizes,
)
from burst_db_spark.plans.reference_dates import (
    reference_dates,
    select_reference_dates,
)


# ---------------------------------------------------------------- DP solver


def test_solver_exact_target():
    # 17 triplets, target 9, overlap 1 → two slices of 9 (8 + overlap)
    slices = solve_frame_sizes(17)
    assert slices == [(0, 9), (8, 17)]


def test_solver_bounds_hold():
    for n in range(MIN_FRAME, 200):
        slices = solve_frame_sizes(n)
        assert slices, f"no slices for n={n}"
        # full coverage, consecutive with 1-triplet overlap (except last)
        assert slices[0][0] == 0 and slices[-1][1] == n
        for (s1, e1), (s2, _) in zip(slices, slices[1:]):
            assert s2 == e1 - 1  # one-burst overlap
        for k, (s, e) in enumerate(slices):
            size = e - s
            if k < len(slices) - 1:
                assert MIN_FRAME <= size <= MAX_FRAME
            else:
                assert size <= MAX_FRAME


def test_solver_tiny_run_fallback():
    assert solve_frame_sizes(3) == [(0, 3)]


# ---------------------------------------------------------------- EP1


@pytest.fixture(scope="module")
def frame_outputs(spark):
    trip = fixtures.burst_triplets(spark, n_triplets=240, n_tracks=4)
    frames, bridge = build_frames(trip)
    return trip, frames.cache(), bridge.cache()


def test_every_land_burst_in_a_frame(spark, frame_outputs):
    trip, frames, bridge = frame_outputs
    land = trip.where(F.col("is_land") == 1).select("burst_id")
    uncovered = land.join(bridge.select("burst_id"), "burst_id", "left_anti")
    assert uncovered.count() == 0


def test_frame_sizes_within_bounds(spark, frame_outputs):
    _, frames, _ = frame_outputs
    bad = frames.where(
        (F.col("n_triplets") < 2) | (F.col("n_triplets") > MAX_FRAME + 1)
    )
    assert bad.count() == 0


def test_overlap_bursts_in_two_frames(spark, frame_outputs):
    _, _, bridge = frame_outputs
    per_burst = bridge.groupBy("burst_id").agg(F.count("*").alias("n"))
    assert per_burst.agg(F.max("n")).collect()[0][0] <= 2


def test_frame_track_and_pass_consistent(spark, frame_outputs):
    trip, frames, bridge = frame_outputs
    joined = bridge.join(trip, "burst_id").join(
        frames.select("frame_fid", "relative_orbit_number"), "frame_fid"
    )
    mismatch = joined.where(F.col("track") != F.col("relative_orbit_number"))
    assert mismatch.count() == 0  # frames never straddle tracks


# ------------------------------------------------------- reference dates


def _times(start: str, n: int, cadence_days: int = 12):
    t0 = datetime.fromisoformat(start)
    return [t0 + timedelta(days=cadence_days * i) for i in range(n)]


def test_refdates_first_is_reference():
    refs = select_reference_dates(_times("2016-07-01", 5))
    assert refs == [datetime(2016, 7, 1)]  # interval never passes


def test_refdates_yearly_stretch():
    # 12-day cadence, 4 years ≈ 122 acqs: refs at ~1y, 2y, 3y... with the
    # interval measured from the FIRST ref and scaled by len(refs)
    times = _times("2016-07-01", 122)
    refs = select_reference_dates(times)
    assert refs[0] == datetime(2016, 7, 1)
    assert len(refs) >= 4
    for k, r in enumerate(refs[1:], start=1):
        assert (r - refs[0]).days >= k * 365


def test_refdates_min_acq_gate():
    # only 5 acquisitions in the second year → no new reference until
    # enough accumulate
    times = _times("2016-07-01", 10) + _times("2017-08-01", 4, 30)
    refs = select_reference_dates(times, min_acquisitions=15)
    assert len(refs) == 1


def test_refdates_event_date_merge():
    times = _times("2016-07-01", 6)
    event = {datetime(2016, 8, 18).date()}  # acq #5 lands on the event
    refs = select_reference_dates(times, event_dates=event, min_acquisitions=15)
    # not enough acqs → the last reference MOVES to the event date
    assert refs == [datetime(2016, 8, 18)]


def test_refdates_spark_matches_python(spark):
    trip = fixtures.burst_triplets(spark, n_triplets=60, n_tracks=2)
    frames, bridge = build_frames(trip)
    acq = fixtures.acquisitions(spark, bridge, n_dates=100)
    out = reference_dates(acq).collect()
    got_by_key: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["frame_fid"], r["ref_idx"])):
        got_by_key.setdefault(r["frame_fid"], []).append(r["ref_date"])
    # cross-check EVERY key against the pure-python core (keys with the
    # 900-day fixture gap exercise the stretching-interval rule hardest)
    times_by_key: dict[int, list] = {}
    for r in acq.collect():
        times_by_key.setdefault(r["frame_fid"], []).append(r["sensing_time"])
    assert set(got_by_key) == set(times_by_key)
    for key, times in times_by_key.items():
        assert got_by_key[key] == select_reference_dates(times), f"key {key}"


def test_refdates_cogrouped_matches_dict_path(spark):
    """The cogrouped (joinable-state) variant must agree row-for-row
    with the dict-parameter path on the same per-key event dates —
    including a key that has events but no acquisitions (must emit
    nothing) and a key with acquisitions but no events."""
    from burst_db_spark.plans.reference_dates import reference_dates_cogrouped

    acq = spark.createDataFrame(
        [(k, t) for k in (1, 2) for t in _times("2016-07-01", 40, 12)],
        "frame_fid int, sensing_time timestamp",
    )
    ev_map = {1: ["2016-08-18", "2016-10-05"]}  # key 2: no events
    ev_df = spark.createDataFrame(
        [(1, "2016-08-18"), (1, "2016-10-05"), (9, "2016-01-01")],
        "frame_fid int, event_date string",
    ).withColumn("event_date", F.to_date("event_date"))
    want = sorted(
        (r["frame_fid"], r["ref_idx"], r["ref_date"])
        for r in reference_dates(acq, event_dates_by_key=ev_map).collect()
    )
    got = sorted(
        (r["frame_fid"], r["ref_idx"], r["ref_date"])
        for r in reference_dates_cogrouped(acq, ev_df).collect()
    )
    assert got == want
    assert not any(k == 9 for k, _, _ in got)  # events-only key emits nothing


def test_refdates_ns_kernel_equals_datetime_reference():
    """The integer-ns hot kernel must be step-for-step identical to the
    pure-datetime reference implementation on randomized fixtures with
    INTRA-DAY times (the floor-division day-diff and the t.date()
    membership are the two places a naive rewrite could diverge)."""
    import random
    from datetime import timedelta

    from burst_db_spark.plans.reference_dates import (
        _DAY_NS,
        _EPOCH_ORD,
        _select_reference_ns,
        select_reference_dates,
    )

    rng = random.Random(0xA11CE)
    for trial in range(50):
        n = rng.randint(2, 80)
        t = datetime(2016, 7, 1) + timedelta(hours=rng.randint(0, 23))
        times = [t]
        for _ in range(n - 1):
            t = t + timedelta(
                days=rng.choice([5, 11, 12, 13, 30]),
                hours=rng.randint(0, 23),
                minutes=rng.randint(0, 59),
            )
            times.append(t)
        events = {
            rng.choice(times).date() for _ in range(rng.randint(0, 3))
        } or None
        interval = rng.choice([60, 120, 365])
        min_acq = rng.choice([2, 5, 15])
        want = select_reference_dates(times, events, interval, min_acq)
        ts_ns = sorted(
            int((x - datetime(1970, 1, 1)).total_seconds() * 1_000_000_000)
            for x in times
        )
        ev_days = (
            {d.toordinal() - _EPOCH_ORD for d in events} if events else None
        )
        got_ns = _select_reference_ns(ts_ns, ev_days, interval, min_acq)
        got = [
            datetime(1970, 1, 1) + timedelta(microseconds=x // 1000)
            for x in got_ns
        ]
        assert got == want, f"trial {trial}"
        assert all(x % _DAY_NS >= 0 for x in got_ns)


def test_refdates_three_paths_agree_randomized(spark):
    """Property test (VERDICT r11 #8): the dict path, the cogroup path,
    and the broadcast fast path must be byte-identical on a randomized
    fixture that forces the edge cases — an event before any reference
    interval elapses (MOVE rule at the start), an event ON the exact
    interval boundary, an event after the final acquisition (never
    seen), keys with empty event sets, and an events-only key."""
    import random
    from datetime import timedelta

    from burst_db_spark.plans.reference_dates import reference_dates_cogrouped

    rng = random.Random(0xEF12)
    base = datetime(2016, 7, 1)
    acq_rows, ev_rows, ev_map = [], [], {}
    for k in range(1, 9):
        n = rng.randint(16, 60)
        gaps = [rng.choice([6, 12, 12, 12, 24, 48]) for _ in range(n - 1)]
        times, t = [base], base
        for g in gaps:
            t = t + timedelta(days=g)
            times.append(t)
        acq_rows += [(k, t) for t in times]
        dates = []
        if k % 4 == 1:  # early event: MOVE rule with the first group
            dates.append(times[min(3, n - 1)].date())
        if k % 4 == 2:  # event exactly on an interval-boundary sample
            dates.append(times[n // 2].date())
            dates.append((times[-1] + timedelta(days=30)).date())  # unseen
        if k % 4 == 3:  # two events in one stretch
            dates += [times[5].date(), times[7].date()]
        # k % 4 == 0: no events at all
        if dates:
            ev_map[k] = [d.isoformat() for d in dates]
            ev_rows += [(k, d.isoformat()) for d in dates]
    ev_rows.append((99, "2016-01-01"))  # events-only key: emits nothing

    acq = spark.createDataFrame(acq_rows, "frame_fid int, sensing_time timestamp")
    ev_df = spark.createDataFrame(
        ev_rows, "frame_fid int, event_date string"
    ).withColumn("event_date", F.to_date("event_date"))

    want = sorted(
        (r["frame_fid"], r["ref_idx"], r["ref_date"])
        for r in reference_dates(
            acq, event_dates_by_key=ev_map, min_acquisitions=5
        ).collect()
    )
    for bcast in (False, True):
        got = sorted(
            (r["frame_fid"], r["ref_idx"], r["ref_date"])
            for r in reference_dates_cogrouped(
                acq, ev_df, min_acquisitions=5, broadcast_events=bcast
            ).collect()
        )
        assert got == want, f"broadcast_events={bcast}"
        assert not any(k == 99 for k, _, _ in got)


# ------------------------------------------------------------- blackout


def test_blackout_windows_and_apply(spark):
    frames = spark.createDataFrame(
        [(1, 11, 1, 5, 31), (2, 6, 1, 8, 31)],
        "frame_fid int, start_month int, start_day int, end_month int, end_day int",
    )
    win = yearly_windows(frames, first_year=2020, last_year=2021)
    rows = {(r.frame_fid, str(r.start_ts), str(r.end_ts)) for r in win.collect()}
    # frame 1 wraps the year boundary (Nov → May)
    assert (1, "2020-11-01 00:00:00", "2021-05-31 23:59:59") in rows
    assert (2, "2020-06-01 00:00:00", "2020-08-31 23:59:59") in rows

    acq = spark.createDataFrame(
        [(1, "2020-12-15 10:00:00"), (1, "2020-07-04 10:00:00")],
        "frame_fid int, sensing_time string",
    ).withColumn("sensing_time", F.to_timestamp("sensing_time"))
    kept = apply_blackouts(acq, win)
    assert [str(r.sensing_time) for r in kept.collect()] == ["2020-07-04 10:00:00"]


def test_enrich_frames(spark):
    from burst_db_spark.geo.predicates import envelope
    from burst_db_spark.plans.frame_db import enrich_frames

    trip = fixtures.burst_triplets(spark, n_triplets=120, n_tracks=2)
    frames, bridge = build_frames(trip)
    enriched = enrich_frames(frames)
    rows = enriched.collect()
    assert len(rows) == frames.count()
    for r in rows[:10]:
        # epsg valid for the centroid's hemisphere/latitude
        assert r.epsg in (3413, 3031) or 32601 <= r.epsg <= 32760
        # snapped bbox strictly contains the raw envelope
        ex0, ey0, ex1, ey1 = envelope(r.geom_wkt)
        assert r.sxmin <= ex0 and r.symin <= ey0
        assert r.sxmax >= ex1 and r.symax >= ey1

    # with member geometries: footprint is the multipolygon of members
    bursts = fixtures.burst_id_map(spark, n_triplets=120, n_tracks=2)
    member = bridge.join(bursts, "burst_id").select("frame_fid", "geom_wkt")
    enriched2 = enrich_frames(frames, member_geoms=member)
    row = enriched2.where(F.col("geom_wkt").isNotNull()).first()
    assert row.geom_wkt.startswith("MULTIPOLYGON")


def test_solver_optimality_vs_bruteforce():
    """DP cost equals exhaustive-enumeration optimum for small n."""
    from itertools import product
    from burst_db_spark.plans.frame_db import TARGET_FRAME

    def seg_cost(size):
        if (size + 1) > MAX_FRAME or (size + 1) < MIN_FRAME:
            return float("inf")
        return int(abs((size + 1) - TARGET_FRAME)) ** 3

    def brute_min(n):
        best = float("inf")
        # enumerate all compositions of n with parts in [MIN-1, MAX-1]
        def rec(rem, cost):
            nonlocal best
            if cost >= best:
                return
            if rem == 0:
                best = min(best, cost)
                return
            for size in range(MIN_FRAME - 1, MAX_FRAME):
                if size <= rem:
                    rec(rem - size, cost + seg_cost(size))
        rec(n, 0.0)
        return best

    for n in range(MIN_FRAME, 30):
        slices = solve_frame_sizes(n)
        # dp cost from the raw segment sizes (undo the +1 overlap added
        # to every emitted slice except the last)
        raw_sizes = [
            (e - s) if k == len(slices) - 1 else (e - s) - 1
            for k, (s, e) in enumerate(slices)
        ]
        dp_cost = sum(seg_cost(sz) for sz in raw_sizes)
        expected = brute_min(n)
        if expected == float("inf"):
            continue  # covered by the fallback path
        assert dp_cost == expected, f"n={n}: dp {dp_cost} vs brute {expected}"


def test_frames_carry_dissolved_union_geometry(spark):
    """The frames artifact's dissolved geometry (boundary-traced union)
    covers the same area as the exact dissolve stats of the member
    collection — the ST_UnaryUnion(ST_Collect) parity the collection
    alone doesn't give (build_frame_db.py:139-148)."""
    from burst_db_spark.geo import predicates as P
    from burst_db_spark.plans import fixtures
    from burst_db_spark.plans.frame_db import build_frames, enrich_frames

    trip = fixtures.burst_triplets(spark, n_triplets=120, n_tracks=2)
    bursts = fixtures.burst_id_map(spark, n_triplets=120, n_tracks=2)
    frames, bridge = build_frames(trip, 9, 5, 10)
    member_geoms = bridge.join(bursts, "burst_id").select("frame_fid", "geom_wkt")
    out = enrich_frames(frames, member_geoms=member_geoms)
    rows = out.select("frame_fid", "geom_wkt", "geom_dissolved_wkt").where(
        "geom_dissolved_wkt IS NOT NULL"
    ).collect()
    assert rows, "expected traced unions for rectangular burst footprints"
    for r in rows[:10]:
        traced = P.wkt_area_with_holes(r.geom_dissolved_wkt)
        stats, _, _ = P.dissolve_stats([r.geom_wkt])
        assert abs(traced - stats) < 1e-9, r.frame_fid
