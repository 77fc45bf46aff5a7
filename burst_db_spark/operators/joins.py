"""Join operators (SURVEY.md §2.3, J1-J11).

Scale notes baked in:
- The reference's signature 3-way join (frames ⋈ bridge ⋈ bursts,
  query_frame_db.py:34-50) has small dims → broadcast both, the fact
  table never shuffles.
- The 50M×1.1M fact-to-dim join (create_cslc_burst_catalog.py:84-103)
  broadcasts the dim (tens of MB); AQE's skew-join handles hot keys.
- "UPDATE ... FROM" (build_frame_db.py:321-335) has no in-place analog:
  recompute-by-join then overwrite — expressed here as update_join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def three_way_join(
    fact: DataFrame,
    bridge: DataFrame,
    dim: DataFrame,
    fact_key: str,
    bridge_fact_key: str,
    bridge_dim_key: str,
    dim_key: str,
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1: fact ⋈ bridge ⋈ dim through a many-to-many bridge table."""
    b = F.broadcast(bridge) if broadcast_dims else bridge
    d = F.broadcast(dim) if broadcast_dims else dim
    return fact.join(b, fact[fact_key] == bridge[bridge_fact_key]).join(
        d, bridge[bridge_dim_key] == dim[dim_key]
    )


def dim_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner", broadcast: bool = True) -> DataFrame:
    """J2/J3: big-fact ⋈ small-dim equi join; broadcast the dim side."""
    return fact.join(F.broadcast(dim) if broadcast else dim, on, how)


def left_join_fill(
    left: DataFrame, right: DataFrame, on, fill: dict, how: str = "left"
) -> DataFrame:
    """J6: left join + fillna (summarize_blackout_difference.py:95-99)."""
    return left.join(right, on, how).na.fill(fill)


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "inner",
) -> DataFrame:
    """J10: equi-key + ts∈[start,end] interval join, broadcast interval side."""
    cond = (
        (facts[key] == intervals[key])
        & (facts[ts_col] >= intervals[start_col])
        & (facts[ts_col] <= intervals[end_col])
    )
    joined = facts.join(F.broadcast(intervals), cond, how)
    # drop the duplicate key column from the interval side
    return joined.drop(intervals[key])


def update_join(
    target: DataFrame,
    source: DataFrame,
    on: str | Sequence[str],
    updates: dict[str, Column],
) -> DataFrame:
    """J9: UPDATE...FROM as recompute — join then overwrite columns.

    ``updates`` maps target column -> expression over the joined relation
    (use F.coalesce(new, old) for partial updates). Output keeps exactly
    the target's schema, so the result can overwrite the target table.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    joined = target.alias("t").join(F.broadcast(source).alias("s"), on_cols, "left")
    cols = []
    for c in target.columns:
        if c in updates:
            cols.append(updates[c].alias(c))
        elif c in on_cols:
            cols.append(F.col(c))
        else:
            cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*cols)
