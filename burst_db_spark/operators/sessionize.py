"""Gap-based sessionization + ministack batch labeling
(SURVEY.md §2.5 W2/W3; reference reconcile_and_label_db.py:290-412).

Reference semantics (assign_processing_modes / identify_time_groups):
- sort times per key; a new group starts when the gap from the previous
  time is >= ``gap_threshold_years * 365`` days;
- groups are numbered 1.. per key → suffix ``_NN``;
- a group with fewer than ``batch_size`` rows is entirely ``no_run``;
- otherwise rows in the first ``floor(n/B)`` full batches get
  ``historical_NN`` and the trailing partial batch gets ``forward_NN``.

Spark-first shape: lag → gap flag → running sum = session id (classic
sessionization); labels are pure window arithmetic over (key, session).
State per key is tiny (~400 rows max per frame in the reference), keys are
numerous (~47k frames / 150 users here) → partitions beautifully; no
driver loops, no UDFs, two window shuffles on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """W2: assign 1-based session ids per key; a new session starts when
    the gap from the previous row is >= ``gap_seconds``
    (reconcile_and_label_db.py:322-334 uses ``gap >= gap_threshold``)."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # unix_micros over a timestamp-cast column: legal for TIMESTAMP, DATE,
    # and TIMESTAMP_NTZ inputs alike (a direct cast-to-double is illegal on
    # NTZ — the round-3 driver parquet regression).
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6
    gap = sec - F.lag(sec).over(w)
    new_session = F.when(gap.isNull() | (gap >= gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )


def label_batches(
    df: DataFrame,
    key: str,
    ts_col: str,
    session_col: str = "session_id",
    batch_size: int = 15,
    label_col: str = "label",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """W3: ministack labels within each (key, session)
    (reconcile_and_label_db.py:341-412):

    - session size n < batch_size → ``no_run``
    - row index i (0-based, time order) with ``i // B < n // B`` →
      ``historical_{session:02d}``
    - else (trailing partial batch) → ``forward_{session:02d}``

    Shuffle shape: every window here partitions by ``key`` ONLY — the
    per-session index and size are derived from cumulative session-start
    markers (asc) and next-session-start markers (desc), so the whole
    sessionize→label chain reuses ONE exchange instead of re-shuffling
    on (key, session).
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    order_desc = [c.desc() for c in order]
    w_asc = Window.partitionBy(key).orderBy(*order)
    w_cum = w_asc.rowsBetween(Window.unboundedPreceding, 0)
    w_desc_excl = (
        Window.partitionBy(key)
        .orderBy(*order_desc)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_key = Window.partitionBy(key)

    rn = F.row_number().over(w_asc)
    changed = F.when(
        F.lag(session_col).over(w_asc).isNull()
        | (F.col(session_col) != F.lag(session_col).over(w_asc)),
        rn,
    )
    df = df.withColumn("__rn", rn).withColumn("__marker", changed)
    start_rn = F.max("__marker").over(w_cum)
    next_start_rn = F.coalesce(
        F.min("__marker").over(w_desc_excl),
        F.count("*").over(w_key) + 1,
    )
    df = (
        df.withColumn("__start", start_rn)
        .withColumn("__next", next_start_rn)
    )
    pos = F.col("__rn") - F.col("__start")  # 0-based index within session
    n = F.col("__next") - F.col("__start")  # session size
    is_full_batch = F.floor(pos / batch_size) < F.floor(n / batch_size)

    label = (
        F.when(n < batch_size, F.lit("no_run"))
        .when(is_full_batch, F.format_string("historical_%02d", F.col(session_col)))
        .otherwise(F.format_string("forward_%02d", F.col(session_col)))
    )
    return df.withColumn(label_col, label).drop("__rn", "__marker", "__start", "__next")


def sessionize_and_label(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: float,
    batch_size: int = 15,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """W2+W3 composed — the full reconcile-and-label per-key pipeline."""
    return label_batches(
        sessionize(df, key, ts_col, gap_seconds, order_tiebreak=order_tiebreak),
        key,
        ts_col,
        batch_size=batch_size,
        order_tiebreak=order_tiebreak,
    )
