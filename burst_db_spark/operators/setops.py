"""Set operators (SURVEY.md §2.7, U1-U3) + sorts/top-k (§2.6).

U2 (the reconcile old-vs-new snapshot merge, reconcile_and_label_db.py:
175-206) is offered both as per-key ARRAY ops (data is small per key) and
as join-based set algebra (the shape that scales when per-key lists don't
fit in a row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_union_distinct(df: DataFrame, cols: Sequence[str], alias: str) -> DataFrame:
    """U1: unpivot N columns into one distinct column.

    The reference does ``SELECT min_frame_id UNION SELECT max_frame_id``
    (example-queries.sql:35-65); ``stack`` avoids scanning the input twice.
    """
    n = len(cols)
    stacked = df.selectExpr(f"stack({n}, {', '.join(cols)}) as {alias}")
    return stacked.where(F.col(alias).isNotNull()).distinct()


def reconcile_snapshots(
    old: DataFrame, new: DataFrame, key: str, value: str
) -> DataFrame:
    """U2 at scale, join-based: new ∪ (old rows whose (key,value) is
    missing from new) — the 'old sensing times re-added if missing'
    reconcile rule (reconcile_and_label_db.py:199-206)."""
    missing = old.join(new, [key, value], "left_anti")
    return new.select(key, value).unionByName(missing.select(key, value))


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """U3: UNION ALL by name (pd.concat analog)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def topk(df: DataFrame, order_cols: Sequence, k: int) -> DataFrame:
    """O4/top-k: LIMIT under a TOTAL order (deterministic).

    Spark plans this as TakeOrderedAndProject — a per-partition top-k then
    a k-row merge on the driver; no full sort, no full shuffle.
    """
    return df.orderBy(*order_cols).limit(k)


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence, k: int
) -> DataFrame:
    """Top-k per group via row_number window (the standard OLAP pattern)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
