"""transformWithStateInPandas: Spark 4's arbitrary-stateful streaming
operator — running per-user statistics with ValueState + MapState.

This is the modern replacement for applyInPandasWithState (which
`stateful.py` demonstrates for the reference-date selection,
reference src/burst_db/historical/reference_dates.py): typed state
handles, per-key row iterators, optional TTL and timers. Here the
processor keeps, per user:
  - ValueState "agg"   = (n_events, total_cents)  — running totals
  - MapState  "types"  = event_type -> count      — running histogram
and after each micro-batch's rows for a key emits the UPDATED snapshot
(n_events, total_cents, n_types). The final emission per user therefore
equals the batch aggregate over everything seen — which is exactly the
DuckDB-checkable invariant the driver row uses.

Determinism: money arrives as integer CENTS computed JVM-side with the
suite's decimal convention (CAST(value AS DECIMAL(18,2)) * 100 -> LONG)
BEFORE the Python processor, so the pandas-side folds are integer sums —
exact in any order. The processor never sees a double.

Scale notes: state is per-key-partitioned by the shuffle on user_id
(RocksDB-backed on a real cluster); the MapState's key domain is the
event-type vocabulary (small by construction). Emissions are
one row per (key, batch) — no per-row amplification.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_cents BIGINT, n_types BIGINT"
)


class RunningUserStats(StatefulProcessor):
    """Per-user running (count, cents total, distinct-type count)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n BIGINT, cents BIGINT"
        )
        self._types = handle.getMapState(
            "types", "t STRING", "c BIGINT"
        )

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: "TimerValues",
    ) -> Iterator[pd.DataFrame]:
        n, cents = (self._agg.get() or (0, 0)) if self._agg.exists() else (0, 0)
        for pdf in rows:
            n += int(len(pdf))
            cents += int(pdf["cents"].sum())
            for t, c in pdf.groupby("event_type").size().items():
                prev = (
                    self._types.getValue((t,))[0]
                    if self._types.containsKey((t,))
                    else 0
                )
                self._types.updateValue((t,), (prev + int(c),))
        self._agg.update((n, cents))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_cents": [cents],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def cents_projection(df: DataFrame) -> DataFrame:
    """JVM-side exact money projection: decimal-cast cents as LONG.

    Applied BEFORE the stateful operator so Python only folds integers
    (the suite's engine-portability convention for money)."""
    return df.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_type"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )


def protobuf_available() -> bool:
    """Spark's transformWithState state protocol is protobuf-based; the
    PySpark worker imports google.protobuf at query start."""
    try:  # pragma: no cover - trivially environment-dependent
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def attach(stream: DataFrame) -> DataFrame:
    """Wire the processor onto a stream of (user_id, event_type, value).

    CAPABILITY FENCE: raises if protobuf is absent — Spark's TWS driver
    worker crashes opaquely without it (StateMessage_pb2 import), so
    fail fast with the real reason instead."""
    if not protobuf_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package "
            "(pyspark's StateMessage_pb2 protocol); not installed in "
            "this environment"
        )
    return (
        cents_projection(stream)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
