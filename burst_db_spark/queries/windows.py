"""Window / sessionization queries (SURVEY.md §2.5) on the events table.

The events table plays the role of the per-frame sensing-time series
(reconcile_and_label_db.py): user_id ↔ frame_id, ts ↔ sensing_time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import sessionize as sz
from burst_db_spark.operators import windows as win
from burst_db_spark.registry import register

GAP_SECONDS = 43200  # 12 h — the events analog of the 2-year frame gap
BATCH = 15

_SESSION_SQL = f"""
    SELECT event_id, user_id, ts,
           CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS INTEGER) AS session_id
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                    OR epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))
                       >= {GAP_SECONDS}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
"""


@register(
    "w1_first_value",
    oracle="""
    SELECT user_id, event_type AS first_type
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
    """,
    tags=("W1",),
)
def w1_first_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE per key under a total order (build_frame_db.py:173-187)."""
    ev = load(spark, sf_dir, "events")
    return win.first_value_per_key(
        ev, "user_id", "event_type", ["ts", "event_id"], "first_type"
    )


@register(
    "w2_sessionize",
    oracle=_SESSION_SQL,
    tags=("W2",),
)
def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag → flag → running sum
    (reconcile_and_label_db.py:290-338)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sz.sessionize(
        ev, "user_id", "ts", GAP_SECONDS, order_tiebreak="event_id"
    )


@register(
    "w3_batch_labels",
    oracle=f"""
    WITH s AS ({_SESSION_SQL})
    SELECT event_id, user_id, ts, session_id,
           CASE
             WHEN count(*) OVER w_all < {BATCH} THEN 'no_run'
             WHEN (row_number() OVER w_ord - 1) // {BATCH}
                  < count(*) OVER w_all // {BATCH}
               THEN printf('historical_%02d', session_id)
             ELSE printf('forward_%02d', session_id)
           END AS label
    FROM s
    WINDOW w_ord AS (PARTITION BY user_id, session_id ORDER BY ts, event_id),
           w_all AS (PARTITION BY user_id, session_id)
    """,
    tags=("W3", "flagship"),
)
def w3_batch_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reconcile-and-label ministack semantics
    (reconcile_and_label_db.py:341-412): no_run / historical_NN / forward_NN."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sz.sessionize_and_label(
        ev, "user_id", "ts", GAP_SECONDS, batch_size=BATCH, order_tiebreak="event_id"
    )


@register(
    "w4_run_length",
    oracle="""
    WITH f AS (
        SELECT user_id, ts, CAST(value >= 50 AS INTEGER) AS flag
        FROM events
    ), b AS (
        SELECT user_id, ts, flag,
               CAST(sum(CASE WHEN prev IS NULL OR flag != prev THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS INTEGER) AS block_id
        FROM (SELECT *, lag(flag) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM f)
    )
    SELECT user_id, block_id, flag,
           min(ts) AS start_ts, max(ts) AS end_ts,
           CAST(count(*) AS BIGINT) AS run_len
    FROM b GROUP BY user_id, block_id, flag
    """,
    tags=("W4",),
)
def w4_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of a boolean series + per-run summary
    (snow_month_filter.py:345-355)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    blocks = win.run_length_blocks(ev, "user_id", "ts", F.col("value") >= 50)
    return win.block_summary(blocks, "user_id", "ts")


@register(
    "w6_water_year",
    oracle="""
    SELECT user_id,
           CAST(year(ts) + CASE WHEN month(ts) >= 10 THEN 1 ELSE 0 END
                AS INTEGER) AS water_year,
           CAST(count(*) AS BIGINT) AS n,
           sum(value) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("W6",),
)
def w6_water_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-year pivot grouping (snow_month_filter.py:329-336)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("water_year", win.water_year(F.col("ts"), 10).cast("int"))
        .groupBy("user_id", "water_year")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )


@register(
    "w7_first_significant_block",
    oracle="""
    WITH f AS (
        SELECT user_id, ts, CAST(value >= 50 AS INTEGER) AS flag FROM events
    ), b AS (
        SELECT user_id, ts, flag,
               CAST(sum(CASE WHEN prev IS NULL OR flag != prev THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS INTEGER) AS block_id
        FROM (SELECT *, lag(flag) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM f)
    ), runs AS (
        SELECT user_id, block_id, flag,
               min(ts) AS start_ts, max(ts) AS end_ts,
               CAST(count(*) AS BIGINT) AS run_len
        FROM b GROUP BY user_id, block_id, flag
    ), sig AS (
        SELECT user_id, min(start_ts) AS season_start
        FROM runs WHERE flag = 1 AND run_len >= 5 GROUP BY user_id
    ), last_bad AS (
        SELECT user_id, max(end_ts) AS season_end
        FROM runs WHERE flag = 1 GROUP BY user_id
    )
    SELECT s.user_id, s.season_start, l.season_end
    FROM sig s JOIN last_bad l ON s.user_id = l.user_id
    """,
    tags=("W7",),
)
def w7_first_significant_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First run of length >= N + last flagged ts per key
    (snow_month_filter.py:336-366, single season)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    blocks = win.run_length_blocks(ev, "user_id", "ts", F.col("value") >= 50)
    runs = win.block_summary(blocks, "user_id", "ts")
    flagged = runs.where(F.col("flag") == 1)
    sig = (
        flagged.where(F.col("run_len") >= 5)
        .groupBy("user_id")
        .agg(F.min("start_ts").alias("season_start"))
    )
    last_bad = flagged.groupBy("user_id").agg(F.max("end_ts").alias("season_end"))
    return sig.join(last_bad, "user_id")
