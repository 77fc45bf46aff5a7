"""Snapshot reconcile + labeling — the reconcile_and_label_db workflow
(SURVEY.md §2.9 CDC-ish merge; reference reconcile_and_label_db.py:
145-287, 449-521).

Old and new catalog snapshots are long-form (key, sensing_time) tables:
- reconcile: keep every new row, re-add old rows whose time is missing
  from new (late-data rule, :199-206);
- label: sessionize + ministack labels over the reconciled series;
- summary: per-label counts (the logged stats, :465-521).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from burst_db_spark.operators.sessionize import sessionize_and_label

GAP_SECONDS_2Y = 2.0 * 365 * 86400  # reference gap_threshold_years=2 (:317)


def reconcile_snapshots(
    old: DataFrame, new: DataFrame, key: str, ts_col: str
) -> DataFrame:
    """new ∪ (old ∖ new) per key — anti-join + union, scale-safe.

    Missingness is decided on the DATE of ``ts_col``, not the full
    timestamp, matching the reference's ``get_date_only`` comparison
    (reconcile_and_label_db.py:199-206: "if the date matches but hours
    differ, we don't consider it missing"). Re-added old rows keep their
    ORIGINAL timestamp."""
    day = F.to_date(F.col(ts_col)).alias("__recon_day")
    new_days = new.select(F.col(key), day).distinct()
    missing = (
        old.select(key, ts_col)
        .withColumn("__recon_day", F.to_date(F.col(ts_col)))
        .join(new_days, [key, "__recon_day"], "left_anti")
        .drop("__recon_day")
    )
    return new.select(key, ts_col).unionByName(missing)


def reconcile_and_label(
    old: DataFrame,
    new: DataFrame,
    key: str = "frame_fid",
    ts_col: str = "sensing_time",
    gap_seconds: float = GAP_SECONDS_2Y,
    batch_size: int = 15,
) -> DataFrame:
    """(key, ts, session_id, label) over the reconciled series —
    the labeled-DB content (sensing_time_list values, :449-462)."""
    merged = reconcile_snapshots(old, new, key, ts_col)
    return sessionize_and_label(
        merged, key, ts_col, gap_seconds, batch_size=batch_size
    )


def label_summary(labeled: DataFrame, label_col: str = "label") -> DataFrame:
    """Per-label counts + per-kind rollup (the printed summary stats)."""
    kind = F.regexp_replace(F.col(label_col), r"_\d+$", "")
    return (
        labeled.withColumn("kind", kind)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_times"),
            F.countDistinct(label_col).alias("n_batches"),
        )
    )
