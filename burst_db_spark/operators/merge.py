"""MERGE / upsert / SCD2 emulation (SURVEY.md §2.9 CDC-ish merge).

Vanilla Spark has no MERGE INTO (that's Delta/Iceberg territory — their
jars aren't in this image), but the reference's reconcile workflow is a
snapshot MERGE at heart (reconcile_and_label_db.py:211-287). The
emulation is the standard pattern: anti-join + union for upsert,
window-closed validity intervals for SCD2. Both are full-recompute writes
— on a real lakehouse swap in `MERGE INTO` and keep the same call sites.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT:
    source rows win on key collision, unmatched target rows survive."""
    keys = list(keys)
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(source)


def merge_delete(target: DataFrame, tombstones: DataFrame, keys: Sequence[str]) -> DataFrame:
    """WHEN MATCHED THEN DELETE."""
    return target.join(tombstones.select(*list(keys)), list(keys), "left_anti")


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str = "effective_from",
    end_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: append the new versions, close
    the previously-open rows at the new version's effective_from.

    history: (key, attrs..., effective_from, effective_to, is_current)
    updates: (key, attrs..., effective_from)
    """
    upd = updates.withColumn(end_col, F.lit(None).cast("timestamp")).withColumn(
        current_col, F.lit(True)
    )
    all_rows = history.unionByName(upd)
    w = Window.partitionBy(key).orderBy(ts_col)
    # Only OPEN rows get closed by the next version's start; already-closed
    # intervals (including validity gaps from delete-then-reinsert) keep
    # their historical effective_to untouched.
    closed = all_rows.withColumn(
        end_col,
        F.when(F.col(end_col).isNull(), F.lead(ts_col).over(w)).otherwise(
            F.col(end_col)
        ),
    )
    return closed.withColumn(current_col, F.col(end_col).isNull())
