"""Core relational queries: scans, filters, joins, aggregations, set ops
(SURVEY.md §2.1-§2.4, §2.6-§2.7) bound to the synthetic star schema.

Every query here has a DuckDB oracle. Aliases match exactly on both sides;
aggregate types are pinned (BIGINT counts, DOUBLE sums-of-double, INT
casts) so the schema+hash compare is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import aggregates as agg
from burst_db_spark.operators import filters as flt
from burst_db_spark.operators import joins as jn
from burst_db_spark.operators import setops as so
from burst_db_spark.registry import register

# ---------------------------------------------------------------------------
# Flagship: the reference's signature lookup — 3-way join through a bridge,
# list-agg + min/max (query_frame_db.py:34-50, J1+A5+A7). orders↔lineitem↔part
# plays frames↔frames_bursts↔burst_id_map.
# ---------------------------------------------------------------------------


@register(
    "frame_lookup",
    oracle="""
    SELECT o.o_orderkey AS order_id,
           CAST(count(*) AS BIGINT) AS n_items,
           min(l.l_shipdate) AS first_ship,
           max(l.l_shipdate) AS last_ship,
           string_agg(p.p_brand, ',' ORDER BY p.p_brand) AS brands
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY o.o_orderkey
    """,
    tags=("J1", "A5", "A7", "flagship"),
)
def frame_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi join + order-stabilized string agg + min/max per key."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    # aggregate the fact table FIRST (one shuffle of the big side), then
    # validate keys against orders on the already-reduced result — the
    # inner join only keeps orders that have lineitems, same as joining
    # before the groupBy but without shuffling lineitem a second time.
    per_order = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(
            F.count("*").alias("n_items"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
            F.concat_ws(",", F.sort_array(F.collect_list("p_brand"))).alias("brands"),
        )
    )
    return per_order.join(
        orders.select(F.col("o_orderkey").alias("order_id")), "order_id"
    )


# ---------------------------------------------------------------------------
# §2.2 filters
# ---------------------------------------------------------------------------


@register(
    "p1_projection_minimal",
    oracle="""
    SELECT p_partkey, p_brand, CAST(trunc(p_retailprice) AS INTEGER) AS price_int
    FROM part
    """,
    tags=("P1",),
)
def p1_projection_minimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal projection + int cast (build_frame_db.py:453-480)."""
    part = load(spark, sf_dir, "part")
    out = flt.project_minimal(part, ["p_partkey", "p_brand", "p_retailprice"])
    return out.withColumn("price_int", F.col("p_retailprice").cast("int")).drop(
        "p_retailprice"
    )


@register(
    "p2_filter_isin",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R') AND l_linestatus = 'F'
    """,
    tags=("P2", "P5"),
)
def p2_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + equality filter, pushed to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    out = flt.filter_isin(li, "l_returnflag", ["A", "R"]).where(
        F.col("l_linestatus") == "F"
    )
    return out.select("l_orderkey", "l_linenumber", "l_returnflag")


@register(
    "p3_filter_range",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-06-30'
    """,
    tags=("P3",),
)
def p3_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-range filter (query_historical_bursts.py:203-239)."""
    orders = load(spark, sf_dir, "orders")
    return flt.filter_range(orders, "o_orderdate", "1996-01-01", "1997-06-30").select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "p4_filter_bool_combo",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE (c_acctbal > 5000 OR c_nationkey IN (1, 3, 5))
      AND c_mktsegment NOT IN ('MACHINERY', 'FURNITURE')
    """,
    tags=("P4",),
)
def p4_filter_bool_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(flag OR in-list) AND NOT in-list (create_cslc_burst_catalog.py:124-139)."""
    cust = load(spark, sf_dir, "customer")
    out = flt.filter_bool_combo(
        cust,
        F.col("c_acctbal") > 5000,
        F.col("c_nationkey").isin(1, 3, 5),
        F.col("c_mktsegment").isin("MACHINERY", "FURNITURE"),
    )
    return out.select("c_custkey", "c_name")


_INTERVALS_SQL = """
    SELECT event_type,
           min(ts) + INTERVAL 5 DAY AS start_ts,
           min(ts) + INTERVAL 12 DAY AS end_ts
    FROM events GROUP BY event_type
"""


def _event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived blackout-style interval table: one window per event_type."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        (F.min("ts") + F.expr("INTERVAL 5 DAYS")).alias("start_ts"),
        (F.min("ts") + F.expr("INTERVAL 12 DAYS")).alias("end_ts"),
    )


@register(
    "p7_blackout_anti_join",
    oracle=f"""
    WITH iv AS ({_INTERVALS_SQL})
    SELECT e.event_id, e.event_type, e.ts
    FROM events e
    WHERE NOT EXISTS (
        SELECT 1 FROM iv
        WHERE iv.event_type = e.event_type
          AND e.ts >= iv.start_ts AND e.ts <= iv.end_ts
    )
    """,
    tags=("P7", "J10"),
)
def p7_blackout_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blackout exclusion: anti range-join against a broadcast interval set
    (create_cslc_burst_catalog.py:172-183)."""
    ev = load(spark, sf_dir, "events")
    iv = _event_intervals(spark, sf_dir)
    kept = flt.anti_join_intervals(ev, iv, "event_type", "ts")
    return kept.select("event_id", "event_type", "ts")


@register(
    "p10_dedup_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("P10", "A12"),
)
def p10_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: distinct key projection."""
    li = load(spark, sf_dir, "lineitem")
    return flt.dedup_exact_keys(li, ["l_returnflag", "l_linestatus"])


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "j1_region_rollup",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           sum(c.c_acctbal) AS total_acctbal
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name
    """,
    tags=("J1", "A9"),
)
def j1_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way dim chain join + rollup (the frames⋈bridge⋈bursts shape)."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    joined = jn.three_way_join(
        cust, nation, region, "c_nationkey", "n_nationkey", "n_regionkey", "r_regionkey"
    )
    return joined.groupBy(F.col("r_name").alias("region_name")).agg(
        F.count("*").alias("n_customers"),
        F.sum("c_acctbal").alias("total_acctbal"),
    )


@register(
    "j2_fact_dim_broadcast",
    oracle="""
    SELECT p.p_brand AS brand,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("J2",),
)
def j2_fact_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-fact ⋈ broadcast-dim (the 50M×1.1M join shape,
    create_cslc_burst_catalog.py:84-103)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = jn.dim_join(li, part, li.l_partkey == part.p_partkey)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "j4_join_using",
    oracle="""
    SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("J4",),
)
def j4_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN USING(col) flavor (query_historical_bursts.py:227-231)."""
    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), "c_custkey")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "j6_left_join_fillna",
    oracle="""
    SELECT c.c_custkey, COALESCE(o.n, 0) AS n_orders
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
    tags=("J6",),
)
def j6_left_join_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + fillna(0) (summarize_blackout_difference.py:95-99)."""
    cust = load(spark, sf_dir, "customer")
    per_cust = (
        load(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count("*").alias("n"))
    )
    out = jn.left_join_fill(
        cust, per_cust, cust.c_custkey == per_cust.o_custkey, {"n": 0}
    )
    return out.select("c_custkey", F.col("n").alias("n_orders"))


@register(
    "j9_update_join",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           COALESCE(l.computed, o.o_totalprice) AS o_totalprice
    FROM orders o
    LEFT JOIN (
        SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS computed
        FROM lineitem GROUP BY l_orderkey
    ) l ON l.l_orderkey = o.o_orderkey
    """,
    tags=("J9",),
)
def j9_update_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE...FROM as recompute-by-join (build_frame_db.py:321-335):
    overwrite o_totalprice with the lineitem-derived value where present."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    per_order = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("computed"))
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    return jn.update_join(
        orders,
        per_order,
        "o_orderkey",
        {"o_totalprice": F.coalesce(F.col("s.computed"), F.col("t.o_totalprice"))},
    )


@register(
    "j10_range_join",
    oracle=f"""
    WITH iv AS ({_INTERVALS_SQL})
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_in_window,
           sum(e.value) AS value_in_window
    FROM events e
    JOIN iv ON iv.event_type = e.event_type
           AND e.ts >= iv.start_ts AND e.ts <= iv.end_ts
    GROUP BY e.event_type
    """,
    tags=("J10",),
)
def j10_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner interval-containment join, broadcast interval side."""
    ev = load(spark, sf_dir, "events")
    iv = _event_intervals(spark, sf_dir)
    joined = jn.range_join(ev, iv, "event_type", "ts")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_in_window"),
        F.sum("value").alias("value_in_window"),
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           avg(l_quantity) AS avg_qty,
           avg(l_discount) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A-multi", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped multi-aggregate scan — the bench headline."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18, 6))) AS DECIMAL(28, 6))
                AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    tags=("J1", "J2", "bench", "join-reorder"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join: local-supplier revenue per nation.

    The interesting part is the join GRAPH (lineitem⋈orders⋈customer +
    the s_nationkey = c_nationkey cross-dimension equality): declared
    declaratively, Catalyst broadcast-joins every dim and AQE reorders —
    nothing is hand-scheduled."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(
            F.col("r_name").isin("ASIA", "EUROPE")
            & (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
    )
    # decimal sum: rows arrive via a join whose probe order differs
    # between engines — double accumulation would drift a ulp
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        )
        .cast("decimal(28,6)")
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "a1_dedup_latest",
    oracle="""
    SELECT user_id, event_type,
           max(event_id) AS event_id,
           max_by(value, event_id) AS value,
           max_by(ts, event_id) AS ts
    FROM events
    GROUP BY user_id, event_type
    """,
    tags=("A1",),
)
def a1_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMR-style dedup: keep the payload at the max unique revision
    (create_cslc_burst_catalog.py:67-82)."""
    ev = load(spark, sf_dir, "events")
    return agg.dedup_latest(ev, ["user_id", "event_type"], "event_id", ["value", "ts"])


@register(
    "a4_round_avg_cast",
    oracle="""
    SELECT n_nationkey, CAST(round(avg(c_acctbal), 0) AS INTEGER) AS avg_bal_int
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("A4",),
)
def a4_round_avg_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST(ROUND(AVG(x)) AS INT) per group (build_frame_db.py:158-170)."""
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_nationkey")
        .agg(F.round(F.avg("c_acctbal"), 0).cast("int").alias("avg_bal_int"))
    )


@register(
    "a5_string_agg_distinct",
    oracle="""
    SELECT n_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("A5",),
)
def a5_string_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT(DISTINCT) with stable order (build_frame_db.py:499-517)."""
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return agg.string_agg_sorted(
        joined, ["n_nationkey"], "c_mktsegment", "segments", distinct=True
    )


@register(
    "a8_first_seen",
    oracle="""
    SELECT l_partkey, l_shipdate AS first_ship, l_orderkey, l_linenumber
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
    ) = 1
    """,
    tags=("A8",),
)
def a8_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen-per-key under a total order (example-queries.sql:1-12)."""
    li = load(spark, sf_dir, "lineitem")
    out = agg.first_seen(
        li,
        ["l_partkey"],
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        payload=["l_shipdate", "l_orderkey", "l_linenumber"],
    )
    return out.withColumnRenamed("l_shipdate", "first_ship")


@register(
    "a9_count_per_day",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, CAST(ts AS DATE)
    """,
    tags=("A9", "A13"),
)
def a9_count_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage counting per (key, day) (example-queries.sql:132-143)."""
    ev = load(spark, sf_dir, "events")
    return agg.count_per_day(ev, ["event_type"], "ts")


@register(
    "a10_multi_minmax",
    oracle="""
    SELECT l_suppkey,
           min(l_extendedprice) AS min_l_extendedprice,
           max(l_extendedprice) AS max_l_extendedprice,
           min(l_quantity) AS min_l_quantity,
           max(l_quantity) AS max_l_quantity,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_suppkey
    """,
    tags=("A10",),
)
def a10_multi_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalizing multi-min/max (export_denormalized_db.py:130-145)."""
    li = load(spark, sf_dir, "lineitem")
    return agg.multi_minmax(li, ["l_suppkey"], ["l_extendedprice", "l_quantity"])


@register(
    "a11_named_agg_pct",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(o_totalprice) AS total,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           100.0 * sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / count(*) AS pct_finished
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("A11",),
)
def a11_named_agg_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named aggs + derived pct column (summarize_blackout_difference.py:47-57)."""
    orders = load(spark, sf_dir, "orders")
    finished = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    out = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        F.sum("o_totalprice").alias("total"),
        F.sum(finished).alias("n_finished"),
    )
    return out.withColumn(
        "pct_finished", 100.0 * F.col("n_finished") / F.col("n_orders")
    )


@register(
    "a15_summary_stats",
    oracle="""
    SELECT event_type,
           CAST(count(value) AS BIGINT) AS cnt,
           min(value) AS min_v, max(value) AS max_v,
           avg(value) AS avg_v, sum(value) AS sum_v
    FROM events GROUP BY event_type
    """,
    tags=("A15",),
)
def a15_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """describe()-style summary per group."""
    ev = load(spark, sf_dir, "events")
    return agg.summary_stats(ev, ["event_type"], "value")


# ---------------------------------------------------------------------------
# §2.6 sorts / top-k, §2.7 set ops
# ---------------------------------------------------------------------------


@register(
    "o1_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("O1", "O4"),
)
def o1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k under a total order → TakeOrderedAndProject, no full sort."""
    orders = load(spark, sf_dir, "orders")
    return so.topk(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


@register(
    "u1_unpivot_union",
    oracle="""
    WITH mm AS (
        SELECT l_orderkey, min(l_partkey) AS min_pk, max(l_partkey) AS max_pk
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT DISTINCT pk FROM (
        SELECT min_pk AS pk FROM mm UNION ALL SELECT max_pk FROM mm
    ) WHERE pk IS NOT NULL
    """,
    tags=("U1",),
)
def u1_unpivot_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max unpivot → distinct (example-queries.sql:35-65), via stack()
    so the aggregate is scanned once."""
    li = load(spark, sf_dir, "lineitem")
    mm = li.groupBy("l_orderkey").agg(
        F.min("l_partkey").alias("min_pk"), F.max("l_partkey").alias("max_pk")
    )
    return so.unpivot_union_distinct(mm, ["min_pk", "max_pk"], "pk")


@register(
    "u2_reconcile_snapshots",
    oracle="""
    WITH old AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
                 WHERE ts < TIMESTAMP '2024-01-20' GROUP BY ALL),
         new AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
                 WHERE ts >= TIMESTAMP '2024-01-10' GROUP BY ALL)
    SELECT user_id, day FROM new
    UNION ALL
    SELECT o.user_id, o.day FROM old o
    WHERE NOT EXISTS (SELECT 1 FROM new n
                      WHERE n.user_id = o.user_id AND n.day = o.day)
    """,
    tags=("U2",),
)
def u2_reconcile_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Old-vs-new snapshot reconcile: new ∪ (old ∖ new) per key
    (reconcile_and_label_db.py:175-206), join-based so it scales."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day"), "ts")
    old = days.where(F.col("ts") < "2024-01-20").select("user_id", "day").distinct()
    new = days.where(F.col("ts") >= "2024-01-10").select("user_id", "day").distinct()
    return so.reconcile_snapshots(old, new, "user_id", "day")


@register(
    "u3_union_all",
    oracle="""
    SELECT c_custkey AS key, c_acctbal AS bal, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_suppkey AS key, s_acctbal AS bal, 'supplier' AS src FROM supplier
    """,
    tags=("U3",),
)
def u3_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name (pd.concat, _land_usgs.py:64)."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("bal"),
        F.lit("customer").alias("src"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("bal"),
        F.lit("supplier").alias("src"),
    )
    return so.union_all([cust, supp])
