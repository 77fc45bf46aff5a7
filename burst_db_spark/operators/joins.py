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


def binned_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """J13: interval containment join WITHOUT an equi key — the shape
    Spark would otherwise execute as a BroadcastNestedLoopJoin (or, when
    the interval side outgrows the broadcast threshold, a full cartesian
    product: the classic range-join scale killer).

    Binned rewrite: each interval explodes into the fixed-width time
    bins it overlaps (``sequence`` over bin ids — pure JVM, no UDF);
    each fact row computes its single bin id. The join becomes an
    EQUI-join on bin id plus a residual containment filter — a plain
    shuffled hash join that partitions on bin, so both sides scale out
    and skew lands in AQE's lap. Cost is O(intervals × span/bin) rows of
    expansion, tunable via ``bin_us``.

    Semantics: ts ∈ [start, end) — half-open, so abutting intervals
    never double-match. Each (fact, interval) pair appears exactly once:
    the fact's bin is deterministic and the interval lists each bin id
    once.
    """
    f_ts = F.col(ts_col).cast("timestamp")
    fact_bin = (F.unix_micros(f_ts) / F.lit(bin_us)).cast("bigint")
    # end is exclusive, so the last covered bin is bin(end - 1µs). For a
    # ZERO-LENGTH interval that lands BELOW the start bin, and Spark's
    # sequence(start, stop) with start > stop silently counts DOWN —
    # two spurious bins instead of none. Clamp stop to the start bin:
    # the degenerate interval then emits one candidate row, which the
    # residual containment filter (ts < end == start) always removes.
    start_bin = (
        F.unix_micros(F.col(start_col).cast("timestamp")) / F.lit(bin_us)
    ).cast("bigint")
    stop_bin = (
        F.unix_micros(
            F.col(end_col).cast("timestamp") - F.expr("INTERVAL 1 MICROSECOND")
        )
        / F.lit(bin_us)
    ).cast("bigint")
    iv_bins = F.sequence(start_bin, F.greatest(stop_bin, start_bin))
    iv = intervals.withColumn("__bin", F.explode(iv_bins))
    fx = facts.withColumn("__bin", fact_bin)
    joined = fx.join(iv, "__bin").where(
        (f_ts >= F.col(start_col)) & (f_ts < F.col(end_col))
    )
    return joined.drop("__bin")


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """AS-OF join — for each left row, the LATEST right row with
    right_ts <= left_ts on the same key. Spark has no native ASOF; the
    scale-correct formulation is union + ordered window carry-forward:

    tag both sides, sort per key by (time, side) — right rows first on
    ties so equality counts as "at or before" — and carry the last seen
    right payload forward onto every left row. ONE shuffle on the key,
    no range-explosion join, state bounded by a single row per
    partition stream. Left rows that precede every right row are
    dropped (inner-ASOF semantics, like DuckDB's ASOF JOIN).

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not
    (ties would be nondeterministic in any engine).

    The carried payload is ONE struct column, not per-column
    ``last(ignorenulls)`` — per-column carry would stitch values from
    DIFFERENT right rows whenever a right value column is NULL, and the
    match test would be wrong for rows whose true match has a NULL first
    value column. A struct is atomic: either the whole right row carried
    or none of it, and ``payload IS NOT NULL`` is the exact match test
    even when every value inside the matched row is NULL.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    lcols = [c for c in left.columns]
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"l_{c}") for c in lcols],
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}")
          for c in lcols],
        F.struct(*[F.col(c) for c in value_cols]).alias("__payload"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).select(
        "*",
        F.last("__payload", ignorenulls=True).over(w).alias("__asof"),
    )
    out = carried.where(
        (F.col("__is_left") == 1) & F.col("__asof").isNotNull()
    )
    return out.select(
        *[F.col(f"l_{c}").alias(c) for c in lcols],
        *[F.col("__asof")[c].alias(f"asof_{c}") for c in value_cols],
    )


def fuzzy_string_self_join(
    df: DataFrame, col: str, max_dist: int = 2
) -> DataFrame:
    """All pairs of DISTINCT values of ``col`` within Levenshtein
    distance ``max_dist`` (1 or 2), as (name_a, name_b, dist) with
    name_a < name_b — the FastSS / SymSpell deletion-neighborhood
    construction (Bocek et al. 2007, public literature):

      * each value emits every variant reachable by deleting up to
        ``max_dist`` characters (JVM higher-order functions — codegen'd,
        no Python in the hot path);
      * ed(a, b) <= k implies the <=k-deletion neighborhoods intersect,
        so an equi-join on xxhash64(variant) yields a lossless candidate
        superset in O(V * L^k) index rows — never O(V^2) compares and
        never a vocabulary broadcast;
      * candidates are deduped, pruned by the length bound
        (|len(a)-len(b)| <= k), and verified with exact levenshtein.

    Scale: the variant explode is map-side and linear in the vocabulary;
    the join shuffles on a 64-bit key whose groups are bounded by the
    local near-dup density, so the plan survives vocabulary growth that
    would OOM a broadcast nested-loop (tens of millions of names at
    100 TB). Reference semantics: fuzzy dedup of station/burst names —
    reference has no native analog; the quadratic definition is kept as
    the oracle twin in queries/round5b.py.
    """
    if max_dist not in (1, 2):
        raise ValueError("fuzzy_string_self_join supports max_dist in (1, 2)")
    names = df.select(F.col(col).alias("p_name")).where(
        F.col("p_name").isNotNull()
    ).distinct()
    del2 = (
        """,
            if(length(p_name) >= 2,
               flatten(transform(sequence(0, length(p_name) - 2), i ->
                   transform(sequence(i + 1, length(p_name) - 1), j ->
                       concat(substring(p_name, 1, i),
                              substring(p_name, i + 2, j - i - 1),
                              substring(p_name, j + 2))))),
               array())"""
        if max_dist >= 2
        else ""
    )
    # sequence() is guarded: sequence(0, -1) DESCENDS rather than being
    # empty, so short strings need explicit if() fences.
    variants = names.selectExpr(
        "p_name",
        f"""
        array_distinct(concat(
            array(p_name),
            if(length(p_name) >= 1,
               transform(sequence(0, length(p_name) - 1), i ->
                   concat(substring(p_name, 1, i), substring(p_name, i + 2))),
               array()){del2}
        )) AS dels
        """,
    ).select("p_name", F.explode("dels").alias("v"))
    idx = variants.select(
        "p_name", F.xxhash64("v").alias("k"), F.length("p_name").alias("ln")
    )
    a = idx.select(F.col("p_name").alias("name_a"), "k",
                   F.col("ln").alias("ln_a"))
    b = idx.select(F.col("p_name").alias("name_b"), "k",
                   F.col("ln").alias("ln_b"))
    cand = (
        a.join(b, "k")
        .where(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= max_dist)
        )
        .select("name_a", "name_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
        .where(F.col("dist") <= max_dist)
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_seconds: int,
) -> DataFrame:
    """LEFT-PRESERVING as-of join with a max-gap tolerance — pandas
    ``merge_asof(tolerance=...)`` semantics: every left row survives;
    the most recent right row at-or-before it (per key) is attached
    only when within ``tolerance_seconds``, else the payload columns
    are NULL (a stale quote is worse than no quote).

    Same single-shuffle union + ordered window carry as ``asof_join``
    (no range-explosion join), plus the right row's timestamp carried
    inside the payload so the gap mask is pure column math. At 100 TB
    this is one exchange on the key — the same plan as the tolerant
    variants in kdb/QuestDB-style tick stores.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    lcols = list(left.columns)
    payload_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
        + [T.StructField("__rt", right.schema[right_ts].dataType)]
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"l_{c}") for c in lcols],
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}")
          for c in lcols],
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_ts).alias("__rt"),
        ).alias("__payload"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).select(
        "*",
        F.last("__payload", ignorenulls=True).over(w).alias("__asof"),
    )
    in_tol = (
        F.col("__asof").isNotNull()
        & (
            F.col("__t").cast("double")
            - F.col("__asof")["__rt"].cast("double")
            <= F.lit(float(tolerance_seconds))
        )
    )
    out = carried.where(F.col("__is_left") == 1)
    return out.select(
        *[F.col(f"l_{c}").alias(c) for c in lcols],
        *[
            F.when(in_tol, F.col("__asof")[c]).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
