"""Custom stateful streaming operator: incremental reference-date
selection via applyInPandasWithState (SURVEY.md §2.5 W5 streaming twin).

The batch version (plans.reference_dates) re-scans each frame's history;
this operator carries (refs, pending-group count, first-ref date) as
GroupState so NEW acquisitions extend the selection incrementally — the
emission rule (interval ≥ len(refs)·interval_days, ≥ min_acqs per batch)
is the same code path as the batch core.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "frame_fid int, ref_idx int, ref_date timestamp"
STATE_SCHEMA = (
    "first_ref long, n_refs int, group_count int, last_ref long"
)


def _advance(
    first_ref_us: int | None,
    n_refs: int,
    group_count: int,
    last_ref_us: int | None,
    times_us: list[int],
    interval_days: int,
    min_acqs: int,
) -> tuple[int | None, int, int, int | None, list[int]]:
    """Pure transition function: feed sorted new acquisition times through
    the reference-date rule; returns updated state + newly emitted refs."""
    emitted: list[int] = []
    day_us = 86_400_000_000
    for t in times_us:
        if first_ref_us is None:
            first_ref_us = t
            last_ref_us = t
            n_refs = 1
            group_count = 1
            emitted.append(t)
            continue
        group_count += 1
        interval_passed = (t - first_ref_us) >= n_refs * interval_days * day_us
        if interval_passed and group_count >= min_acqs:
            n_refs += 1
            last_ref_us = t
            group_count = 0
            emitted.append(t)
    return first_ref_us, n_refs, group_count, last_ref_us, emitted


def reference_dates_stateful(
    interval_days: int = 365,
    min_acqs: int = 15,
):
    """Build the applyInPandasWithState function: each micro-batch's new
    rows per frame advance the state; emitted rows are the NEW reference
    dates only (append semantics)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            first_ref, n_refs, group_count, last_ref = state.get
        else:
            first_ref, n_refs, group_count, last_ref = 0, 0, 0, 0

        times: list[int] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["sensing_time"])
            times.extend(int(t.value // 1000) for t in ts)
        times.sort()

        fr = first_ref if first_ref != 0 else None
        lr = last_ref if last_ref != 0 else None
        fr, n_refs, group_count, lr, emitted = _advance(
            fr, n_refs, group_count, lr, times, interval_days, min_acqs
        )
        state.update((fr or 0, n_refs, group_count, lr or 0))

        if emitted:
            base = n_refs - len(emitted)
            yield pd.DataFrame(
                {
                    "frame_fid": [int(key[0])] * len(emitted),
                    "ref_idx": [base + i + 1 for i in range(len(emitted))],
                    "ref_date": [
                        datetime(1970, 1, 1) + timedelta(microseconds=t)
                        for t in emitted
                    ],
                }
            )

    return fn


def attach(stream, interval_days: int = 365, min_acqs: int = 15):
    """Wire the operator onto a (frame_fid, sensing_time) stream."""
    return (
        stream.groupBy("frame_fid")
        .applyInPandasWithState(
            reference_dates_stateful(interval_days, min_acqs),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
