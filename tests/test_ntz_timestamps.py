"""TIMESTAMP_NTZ robustness (round-3 driver regression).

The driver regenerated `events.parquet` with ``isAdjustedToUTC=false``;
Spark ≥3.4 infers that as TIMESTAMP_NTZ (``inferTimestampNTZ`` defaults
true), which is illegal in ``unix_micros`` and numeric casts — five
registered queries crashed. ``catalog.load`` now normalizes NTZ→TIMESTAMP
at the scan; these tests pin that behavior against BOTH timestamp flavors
so a driver-side flip can never break the window family again.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampNTZType, TimestampType

from burst_db_spark import catalog
from burst_db_spark.operators.sessionize import sessionize_and_label
from burst_db_spark.registry import all_queries

WINDOW_FAMILY = (
    "w2_sessionize",
    "w3_batch_labels",
    "w_lag_delta",
    "w_rolling_1d",
    "a13_weekly_window",
)


def _write_events(dirpath, tz):
    """Tiny events table with ts as timestamp[us, tz] (tz=None → NTZ,
    i.e. parquet isAdjustedToUTC=false — the driver's round-3 layout)."""
    base = datetime.datetime(2024, 1, 1)
    n = 40
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(hours=3 * i) for i in range(n)],
                pa.timestamp("us", tz=tz),
            ),
            "user_id": pa.array([i % 4 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)]),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(dirpath / "events.parquet"))
    meta = pq.ParquetFile(str(dirpath / "events.parquet")).metadata.schema
    lt = str(meta.column(1).logical_type)
    assert ("isAdjustedToUTC=false" in lt) == (tz is None), lt


@pytest.mark.parametrize("tz", [None, "UTC"], ids=["ntz", "ltz"])
def test_catalog_load_normalizes_to_ltz(spark, tmp_path, tz):
    _write_events(tmp_path, tz)
    df = catalog.load(spark, str(tmp_path), "events")
    ts_type = dict(df.dtypes)["ts"]
    assert ts_type == "timestamp", ts_type
    assert not isinstance(df.schema["ts"].dataType, TimestampNTZType)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # UTC session tz → NTZ reinterpret keeps wall-clock values bit-identical
    first = df.orderBy("event_id").select("ts").first()[0]
    assert first.replace(tzinfo=None) == datetime.datetime(2024, 1, 1)


@pytest.mark.parametrize("tz", [None, "UTC"], ids=["ntz", "ltz"])
def test_window_family_runs_on_both_flavors(spark, tmp_path, tz):
    _write_events(tmp_path, tz)
    specs = all_queries()
    for name in WINDOW_FAMILY:
        df = specs[name].build(spark, str(tmp_path))
        assert df.count() > 0, name


def test_sessionize_accepts_raw_ntz(spark, tmp_path):
    """Even WITHOUT catalog normalization (e.g. CLI reading user parquet),
    sessionize must not emit an NTZ-illegal cast."""
    _write_events(tmp_path, None)
    raw = spark.read.parquet(str(tmp_path / "events.parquet"))
    assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)
    out = sessionize_and_label(raw, "user_id", "ts", gap_seconds=6 * 3600,
                              batch_size=5, order_tiebreak="event_id")
    assert out.count() == 40
    assert out.select("label").distinct().count() >= 1
