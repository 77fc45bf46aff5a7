"""Running aggregates and spatial nearest-neighbor join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.registry import register


@register(
    "w_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_so_far,
           CAST(CAST(sum(CAST(value AS DECIMAL(18, 6))) OVER w
                     AS DECIMAL(28, 6)) AS DOUBLE) AS value_so_far
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("W-running",),
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count + sum per key over time. The cumulative frame fixes
    the accumulation order on both engines (ts, event_id total order), and
    the sum runs in DECIMAL: DuckDB evaluates window aggregates with a
    segment tree (pairwise association), so double prefix sums drift a
    ulp even with a fixed frame order."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_so_far"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("decimal(28,6)")
        .cast("double")
        .alias("value_so_far"),
    )


@register(
    "j_spatial_knn",
    oracle="""
    WITH pc AS (
        SELECT p_partkey,
               (p_partkey * 7) % 340 - 170 AS px,
               (p_partkey * 13) % 160 - 80 AS py
        FROM part
    ), sc AS (
        SELECT s_suppkey,
               (s_suppkey * 29) % 340 - 170 AS sx,
               (s_suppkey * 17) % 160 - 80 AS sy
        FROM supplier
    )
    SELECT p_partkey, s_suppkey,
           CAST((px - sx) * (px - sx) + (py - sy) * (py - sy) AS BIGINT)
               AS dist_sq
    FROM pc CROSS JOIN sc
    QUALIFY row_number() OVER (
        PARTITION BY p_partkey ORDER BY dist_sq, s_suppkey
    ) = 1
    """,
    tags=("spatial", "knn-join"),
)
def j_spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor spatial join: each part point gets its closest
    supplier point (exact integer squared distance, deterministic
    tie-break), via GRID-CELL bucketing — probes equi-join points in
    their 3×3 cell neighborhood (one hash exchange), winners within the
    cell-size guarantee radius are provably global-nearest, and only the
    vanishing residual takes the exact fallback. Replaces the broadcast
    cross join + row_number shape, which was O(N·M) and memory-bound at
    scale."""
    from burst_db_spark.operators.spatial_join import grid_nn_join

    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    pc = part.select(
        "p_partkey",
        ((F.col("p_partkey") * 7) % 340 - 170).alias("px"),
        ((F.col("p_partkey") * 13) % 160 - 80).alias("py"),
    )
    sc = supp.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 29) % 340 - 170).alias("sx"),
        ((F.col("s_suppkey") * 17) % 160 - 80).alias("sy"),
    )
    out = grid_nn_join(
        pc,
        sc,
        probe_key="p_partkey",
        probe_xy=("px", "py"),
        point_xy=("sx", "sy"),
        cell_size=24.0,
        point_cols=("s_suppkey",),
        tie_break="s_suppkey",
    )
    return out.select(
        "p_partkey", "s_suppkey", F.col("__dist_sq").cast("bigint").alias("dist_sq")
    )


@register(
    "j12_asof_join",
    oracle="""
    WITH probes AS (
        SELECT o_orderkey,
               CAST(o_custkey % 150 + 1 AS BIGINT) AS probe_key,
               TIMESTAMP '2024-01-01'
                 + INTERVAL (o_orderkey % 40) DAY
                 + INTERVAL (o_orderkey % 24) HOUR AS probe_ts
        FROM orders
    ),
    ev AS (
        SELECT user_id, ts,
               max_by(event_id, event_id) AS event_id,
               max_by(value, event_id) AS value
        FROM events GROUP BY user_id, ts
    )
    SELECT p.o_orderkey, p.probe_key, p.probe_ts,
           e.event_id AS asof_event_id,
           CAST(e.value AS DOUBLE) AS asof_value
    FROM probes p
    ASOF JOIN ev e
      ON p.probe_key = e.user_id AND e.ts <= p.probe_ts
    """,
    tags=("J12", "asof", "timeseries"),
)
def j12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (the canonical timeseries operator Spark lacks): each
    order picks the latest same-customer event at or before its order
    date. Implemented as union + ordered window carry-forward (one
    shuffle, no range explosion); the oracle is DuckDB's NATIVE ASOF
    JOIN, so the two independent formulations must agree row-for-row.
    The right side dedups to one row per (key, ts) first — ties are
    nondeterministic in any engine."""
    from burst_db_spark.operators.joins import asof_join

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 150 + 1).cast("bigint").alias("probe_key"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(days=(F.col("o_orderkey") % 40).cast("int"))
            + F.make_interval(hours=(F.col("o_orderkey") % 24).cast("int"))
        ).alias("probe_ts"),
    )
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", F.col("event_id")).alias("event_id"),
            F.max_by("value", F.col("event_id")).alias("value"),
        )
    )
    out = asof_join(
        orders,
        ev.withColumnRenamed("user_id", "probe_key"),
        key="probe_key",
        left_ts="probe_ts",
        right_ts="ts",
        value_cols=["event_id", "value"],
    )
    return out.select(
        "o_orderkey", "probe_key", "probe_ts",
        F.col("asof_event_id"),
        F.col("asof_value").cast("double").alias("asof_value"),
    )
