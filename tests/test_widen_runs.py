"""Invariant tests for the W8 run-widening pre-pass
(frames.py:214-236 semantics)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from burst_db_spark.plans.frame_db import MIN_FRAME, widen_land_runs


def _runs(flags):
    out, i = [], 0
    while i < len(flags):
        j = i
        while j < len(flags) and flags[j] == flags[i]:
            j += 1
        out.append((flags[i], i, j))
        i = j
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=120))
def test_widen_invariants(flags):
    out = widen_land_runs(flags, MIN_FRAME)
    # monotone: land never becomes water
    for a, b in zip(flags, out):
        assert not (a and not b)
    runs = _runs(out)
    for is_land, i, j in runs:
        if is_land:
            # every land run reaches min_frame (or fills the whole track)
            assert (j - i) >= min(MIN_FRAME, len(out))
        else:
            # no short water run survives ANYWHERE — edges included,
            # matching the reference's fixpoint loop (frames.py:225-236)
            assert (j - i) >= MIN_FRAME


def test_widen_noop_when_already_wide():
    flags = [False] * 6 + [True] * 8 + [False] * 6 + [True] * 10 + [False] * 5
    assert widen_land_runs(flags, MIN_FRAME) == flags


def test_widen_absorbs_short_edge_water():
    # trailing water shorter than MIN_FRAME is converted to land, like the
    # reference's second pass (it slices without an interior guard)
    flags = [False] * 6 + [True] * 8 + [False] * 2
    out = widen_land_runs(flags, MIN_FRAME)
    assert all(out[6:])
    assert out[:6] == [False] * 6  # long edge water is untouched


def test_widen_grows_short_run():
    flags = [False] * 10 + [True] * 2 + [False] * 10
    out = widen_land_runs(flags, MIN_FRAME)
    land = sum(out)
    assert land >= MIN_FRAME
    assert out[10] and out[11]  # original land retained
