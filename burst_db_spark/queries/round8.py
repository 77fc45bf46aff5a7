"""Round-8 queries: mergeable centroid-histogram quantile sketches
(t-digest-style uniform-centroid variant, batch + streaming
foreachBatch partials), theta-sketch set-operation estimates over KMV
sketches (union/intersection/difference cardinalities from k-sized
sketches only), median-absolute-deviation anomaly detection with
integer lower-medians, per-group distributed reservoir sampling via
bottom-k salted priorities, a Bloom-filter pre-join that shrinks the
fact shuffle before an exact join, anchored substring-containment
dedup (the char-level cousin of the shingle containment join), an
end-to-end document curation cascade, the lambda higher-order-function
surface, additive seasonal decomposition on integer micro-units,
point-in-interval join driven by dynamic partition pruning, and a
measured MinHash LSH recall curve against exact-Jaccard ground truth.

Reference parity: opera-adt/burst_db has no text/sketch path — these
are the LLM-pipeline extension surface (SURVEY.md "beyond the
reference" mandate). Every oracle is ANSI SQL the driver runs on
DuckDB. Round-7's lesson is law here: every float-derived output is
quantized PER ROW with ``floor(x * 10^k)`` into BIGINT before any
aggregation — one IEEE multiply + floor, bit-identical cross-engine,
no decimal-vs-double division route, no rounding-mode exposure.
Integer division is only ever applied to non-negative operands, where
DuckDB ``//`` (floor) and Spark ``DIV`` (truncate) agree.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from burst_db_spark.catalog import load
from burst_db_spark.queries.slayer import _tmpdir
from burst_db_spark.registry import register

# ---------------------------------------------------------------------------
# A35: mergeable quantile sketch — t-digest-style centroid histogram.
#
# Each (event_type, shard) partition independently compresses its values
# into centroids (here: uniform 64-cent-wide buckets carrying
# (weight, sum)), and centroid merge is plain additive groupBy — the
# mergeability t-digest buys with its size-bounded centroid list,
# realized in an oracle-checkable form (uniform compression instead of
# the quantile-dependent scale function, so both engines agree
# bit-for-bit). At 100 TB each executor/day/shard ships only its
# centroid partials (bounded by value-domain/64, NOT by row count), and
# any subset of partials re-aggregates into the same sketch. Quantile
# read-off walks the merged cumulative weights to the target rank; the
# per-centroid mean (s DIV w, non-negative integers) is the estimate.

_TD_BUCKET = 64  # cents per centroid
_TD_QS = (50, 90, 99)


@register(
    "a35_tdigest_quantiles",
    oracle=f"""
    WITH base AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    partials AS (
        SELECT event_type, event_id % 8 AS shard,
               cents // {_TD_BUCKET} AS centroid,
               CAST(count(*) AS BIGINT) AS w,
               CAST(sum(cents) AS BIGINT) AS s
        FROM base GROUP BY 1, 2, 3
    ),
    merged AS (
        SELECT event_type, centroid,
               CAST(sum(w) AS BIGINT) AS w, CAST(sum(s) AS BIGINT) AS s
        FROM partials GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, centroid, w, s,
               CAST(sum(w) OVER (PARTITION BY event_type ORDER BY centroid)
                    AS BIGINT) AS cw
        FROM merged
    ),
    n AS (
        SELECT event_type, CAST(sum(w) AS BIGINT) AS n
        FROM merged GROUP BY 1
    ),
    spine AS (
        SELECT event_type, n, q,
               CAST((q * n + 99) // 100 AS BIGINT) AS target
        FROM n CROSS JOIN (SELECT CAST(unnest([50, 90, 99]) AS INT) AS q)
    ),
    pick AS (
        SELECT s.event_type, s.q, s.target,
               min(c.centroid) AS centroid
        FROM spine s
        JOIN cum c ON c.event_type = s.event_type AND c.cw >= s.target
        GROUP BY 1, 2, 3
    ),
    est AS (
        SELECT p.event_type, p.q, p.target,
               CAST(m.s // m.w AS BIGINT) AS est_cents
        FROM pick p
        JOIN merged m
          ON m.event_type = p.event_type AND m.centroid = p.centroid
    ),
    ranked AS (
        SELECT event_type, cents,
               CAST(row_number() OVER (PARTITION BY event_type
                                       ORDER BY cents, event_id)
                    AS BIGINT) AS rn
        FROM base
    )
    SELECT e.event_type, e.q, e.target AS target_rank, e.est_cents,
           r.cents AS true_cents,
           CAST(e.est_cents - r.cents AS BIGINT) AS err_cents
    FROM est e
    JOIN ranked r ON r.event_type = e.event_type AND r.rn = e.target
    ORDER BY e.event_type, e.q
    """,
    tags=("A35", "sketch", "tdigest", "quantile", "mergeable", "llm-pipeline"),
)
def a35_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable centroid-histogram quantile sketch (t-digest family,
    uniform compression): per-(event_type, shard) centroid partials →
    additive merge → cumulative-weight walk to p50/p90/p99 →
    per-centroid integer mean as the estimate, checked against the
    exact rank statistic. Shuffle volume after the first partial
    aggregation is centroid-count-sized, never row-count-sized."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * F.lit(100)).cast("bigint").alias("cents"),
    )
    partials = (
        base.withColumn("shard", F.col("event_id") % 8)
        .withColumn("centroid", F.expr(f"cents DIV {_TD_BUCKET}"))
        .groupBy("event_type", "shard", "centroid")
        .agg(
            F.count("*").cast("bigint").alias("w"),
            F.sum("cents").cast("bigint").alias("s"),
        )
    )
    merged = partials.groupBy("event_type", "centroid").agg(
        F.sum("w").cast("bigint").alias("w"),
        F.sum("s").cast("bigint").alias("s"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("centroid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.withColumn("cw", F.sum("w").over(w_cum).cast("bigint"))
    n = merged.groupBy("event_type").agg(F.sum("w").cast("bigint").alias("n"))
    spine = n.select(
        "event_type",
        "n",
        F.explode(F.array(*[F.lit(q) for q in _TD_QS])).alias("q"),
    ).select(
        "event_type",
        F.col("q").cast("int").alias("q"),
        F.expr("CAST((q * n + 99) DIV 100 AS BIGINT)").alias("target"),
    )
    pick = (
        F.broadcast(spine)
        .join(cum, "event_type")
        .where(F.col("cw") >= F.col("target"))
        .groupBy("event_type", "q", "target")
        .agg(F.min("centroid").alias("centroid"))
    )
    est = pick.join(merged, ["event_type", "centroid"]).select(
        "event_type",
        "q",
        "target",
        F.expr("CAST(s DIV w AS BIGINT)").alias("est_cents"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.withColumn(
        "rn", F.row_number().over(w_rank).cast("bigint")
    ).select(F.col("event_type").alias("r_type"), "cents", "rn")
    return (
        est.join(
            ranked,
            (est["event_type"] == ranked["r_type"])
            & (ranked["rn"] == est["target"]),
        )
        .select(
            est["event_type"],
            "q",
            F.col("target").alias("target_rank"),
            "est_cents",
            F.col("cents").alias("true_cents"),
            (F.col("est_cents") - F.col("cents")).cast("bigint").alias(
                "err_cents"
            ),
        )
        .orderBy("event_type", "q")
    )


# ---------------------------------------------------------------------------
# A36: theta-sketch set operations — union / intersection / difference
# cardinality estimates computed from two k-sized KMV sketches ONLY
# (never from the raw sets). The theta trick: cut both sketches at
# theta = min(kth_A, kth_B); below that threshold each sketch is a
# uniform sample of its set with known inclusion rate theta/2^48, so
# |X| ≈ count(h < theta) * 2^48 / theta for X any boolean combination
# of A and B. That is the 100 TB property: per-segment sketches built
# once (k rows each) answer EVERY pairwise overlap question later —
# audience overlap, dedup-across-snapshots, contamination estimates —
# without re-reading raw data. Thresholding compares full md5 hex
# strings (ASCII order == numeric order, engine-neutral); the
# estimator divides the 48-bit prefix with integer arithmetic only.

_TH_K = 128
_POW48 = 1 << 48


@register(
    "a36_theta_sketch_setops",
    oracle=f"""
    WITH tagged AS (
        SELECT DISTINCT
               CASE WHEN o_orderpriority = '1-URGENT' THEN 'A' ELSE 'B'
               END AS tag,
               md5(CAST(o_custkey AS VARCHAR)) AS h,
               o_custkey AS k
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    sk AS (
        SELECT tag, h FROM (
            SELECT tag, h,
                   row_number() OVER (PARTITION BY tag ORDER BY h) AS rn
            FROM tagged
        ) WHERE rn <= {_TH_K}
    ),
    kth AS (
        SELECT tag, max(h) AS kth_h FROM sk GROUP BY tag
    ),
    theta AS (
        SELECT min(kth_h) AS th,
               CAST('0x' || substr(min(kth_h), 1, 12) AS BIGINT) AS th48
        FROM kth
    ),
    sa AS (SELECT h FROM sk WHERE tag = 'A'),
    sb AS (SELECT h FROM sk WHERE tag = 'B'),
    counts AS (
        SELECT
            (SELECT count(*) FROM (SELECT h FROM sa UNION SELECT h FROM sb),
                    theta WHERE h < th) AS c_u,
            (SELECT count(*) FROM (SELECT h FROM sa INTERSECT
                                   SELECT h FROM sb),
                    theta WHERE h < th) AS c_i,
            (SELECT count(*) FROM (SELECT h FROM sa EXCEPT SELECT h FROM sb),
                    theta WHERE h < th) AS c_d
    ),
    ests AS (
        SELECT 'union' AS measure,
               CAST(c_u * {_POW48} // th48 AS BIGINT) AS est
        FROM counts, theta
        UNION ALL
        SELECT 'inter', CAST(c_i * {_POW48} // th48 AS BIGINT)
        FROM counts, theta
        UNION ALL
        SELECT 'a_minus_b', CAST(c_d * {_POW48} // th48 AS BIGINT)
        FROM counts, theta
        UNION ALL
        SELECT 'a_only_set',
               CAST(({_TH_K} - 1) * {_POW48}
                    // CAST('0x' || substr(kth_h, 1, 12) AS BIGINT) AS BIGINT)
        FROM kth WHERE tag = 'A'
        UNION ALL
        SELECT 'b_only_set',
               CAST(({_TH_K} - 1) * {_POW48}
                    // CAST('0x' || substr(kth_h, 1, 12) AS BIGINT) AS BIGINT)
        FROM kth WHERE tag = 'B'
    ),
    truth AS (
        SELECT 'union' AS measure,
               CAST(count(DISTINCT k) AS BIGINT) AS truth
        FROM tagged
        UNION ALL
        SELECT 'inter', CAST(count(*) AS BIGINT) FROM (
            SELECT k FROM tagged WHERE tag = 'A'
            INTERSECT SELECT k FROM tagged WHERE tag = 'B')
        UNION ALL
        SELECT 'a_minus_b', CAST(count(*) AS BIGINT) FROM (
            SELECT k FROM tagged WHERE tag = 'A'
            EXCEPT SELECT k FROM tagged WHERE tag = 'B')
        UNION ALL
        SELECT 'a_only_set', CAST(count(DISTINCT k) AS BIGINT)
        FROM tagged WHERE tag = 'A'
        UNION ALL
        SELECT 'b_only_set', CAST(count(DISTINCT k) AS BIGINT)
        FROM tagged WHERE tag = 'B'
    )
    SELECT e.measure, e.est, t.truth
    FROM ests e JOIN truth t USING (measure)
    ORDER BY e.measure
    """,
    tags=("A36", "sketch", "theta", "setops", "mergeable", "llm-pipeline"),
)
def a36_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch union/intersection/difference estimates from two
    bottom-k KMV sketches (urgent vs high-priority customer sets),
    validated against exact set cardinalities. After the two k-row
    sketches exist, every set-operation estimate is computed from
    2k rows — independent of raw data size."""
    orders = load(spark, sf_dir, "orders")
    tagged = (
        orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", "A")
            .otherwise("B")
            .alias("tag"),
            F.md5(F.col("o_custkey").cast("string")).alias("h"),
            F.col("o_custkey").alias("k"),
        )
        .distinct()
    )
    w = Window.partitionBy("tag").orderBy("h")
    sk = (
        tagged.select("tag", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TH_K)
        .select("tag", "h")
        .persist()
    )
    kth = sk.groupBy("tag").agg(F.max("h").alias("kth_h"))
    theta = kth.agg(
        F.min("kth_h").alias("th"),
        F.conv(F.substring(F.min("kth_h"), 1, 12), 16, 10)
        .cast("bigint")
        .alias("th48"),
    )
    sa = sk.where(F.col("tag") == "A").select("h")
    sb = sk.where(F.col("tag") == "B").select("h")
    th = F.broadcast(theta)

    def below_theta(df: DataFrame, measure: str) -> DataFrame:
        # Conditional count (not a filter) so an empty survivor set still
        # yields c = 0 with th48 attached — matches the oracle's scalar 0.
        return (
            df.crossJoin(th)
            .agg(
                F.sum(F.when(F.col("h") < F.col("th"), 1).otherwise(0))
                .cast("bigint")
                .alias("c"),
                F.first("th48").alias("th48"),
            )
            .withColumn("measure", F.lit(measure))
        )

    c_u = below_theta(sa.union(sb).distinct(), "union")
    c_i = below_theta(sa.intersect(sb), "inter")
    c_d = below_theta(sa.exceptAll(sb), "a_minus_b")
    theta_ests = (
        c_u.union(c_i).union(c_d)
        .select(
            "measure",
            F.expr(f"CAST(c * CAST({_POW48} AS BIGINT) DIV th48 AS BIGINT)")
            .alias("est"),
        )
    )
    set_ests = kth.select(
        F.when(F.col("tag") == "A", "a_only_set")
        .otherwise("b_only_set")
        .alias("measure"),
        F.expr(
            f"CAST(({_TH_K} - 1) * CAST({_POW48} AS BIGINT)"
            " DIV CAST(conv(substring(kth_h, 1, 12), 16, 10) AS BIGINT)"
            " AS BIGINT)"
        ).alias("est"),
    )
    truth = (
        tagged.select("tag", "k")
        .distinct()
        .groupBy("k")
        .agg(F.collect_set("tag").alias("tags"))
        .select(
            F.col("k"),
            F.array_contains("tags", "A").alias("in_a"),
            F.array_contains("tags", "B").alias("in_b"),
        )
        .agg(
            F.count("*").cast("bigint").alias("union"),
            F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("inter"),
            F.sum(F.when(F.col("in_a") & ~F.col("in_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("a_minus_b"),
            F.sum(F.when(F.col("in_a"), 1).otherwise(0))
            .cast("bigint")
            .alias("a_only_set"),
            F.sum(F.when(F.col("in_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("b_only_set"),
        )
        .unpivot([], ["union", "inter", "a_minus_b", "a_only_set", "b_only_set"],
                 "measure", "truth")
    )
    out = (
        theta_ests.union(set_ests)
        .join(F.broadcast(truth), "measure")
        .select("measure", "est", F.col("truth").cast("bigint").alias("truth"))
        .orderBy("measure")
    )
    out._dedup_cached = (sk,)
    return out


# ---------------------------------------------------------------------------
# W17: median-absolute-deviation anomaly detection. Robust outlier
# gate (median ± 3·MAD) with INTEGER lower-medians — rank (n+1) DIV 2
# over (cents, event_id) — so both engines pick the identical element
# with no interpolation, no averaging, no float route. Two ranked
# windows (values, then absolute deviations) and one aggregation; at
# scale each window is a per-group sort, and the deviation pass reuses
# the same partitioning (one shuffle total with AQE reuse).


@register(
    "w17_mad_anomaly",
    oracle="""
    WITH base AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    med AS (
        SELECT event_type, cents AS med_cents FROM (
            SELECT event_type, cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cents, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM base
        ) WHERE rn = (n + 1) // 2
    ),
    dev AS (
        SELECT b.event_type, b.event_id, b.cents,
               abs(b.cents - m.med_cents) AS d
        FROM base b JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, d AS mad_cents FROM (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(any_value(m.med_cents) AS BIGINT) AS med_cents,
           CAST(any_value(a.mad_cents) AS BIGINT) AS mad_cents,
           CAST(sum(CASE WHEN d.d > 3 * a.mad_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies,
           CAST(sum(CASE WHEN d.d > 3 * a.mad_cents THEN d.cents ELSE 0 END)
                AS BIGINT) AS anomaly_sum_cents,
           CAST(max(d.d) AS BIGINT) AS max_dev_cents
    FROM dev d
    JOIN med m USING (event_type)
    JOIN mad a USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    tags=("W17", "window", "mad", "anomaly", "robust"),
)
def w17_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type robust anomaly gate: lower-median, MAD (lower-median of
    absolute deviations), flag |x − med| > 3·MAD. All BIGINT cents."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * F.lit(100)).cast("bigint").alias("cents"),
    )

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w_r = Window.partitionBy("event_type").orderBy(col, "event_id")
        w_n = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w_r))
            .withColumn("n", F.count("*").over(w_n))
            .where(F.col("rn") == F.expr("(n + 1) DIV 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = lower_median(base, "cents", "med_cents")
    dev = base.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = lower_median(dev.select("event_type", "event_id", "d"), "d",
                       "mad_cents")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.any_value("med_cents").cast("bigint").alias("med_cents"),
            F.any_value("mad_cents").cast("bigint").alias("mad_cents"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad_cents"),
                       F.col("cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("anomaly_sum_cents"),
            F.max("d").cast("bigint").alias("max_dev_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# T: per-group distributed reservoir sample. The classic distributed
# reservoir (Vitter's method, distributed form): give every row an
# i.i.d. priority and keep the k smallest per group — equivalent in
# distribution to sequential reservoir sampling, and embarrassingly
# parallel: each partition keeps its local bottom-k, merge keeps the
# global bottom-k (a mergeable sketch, like KMV but over priorities).
# Here the priority is a salted md5 of the row key — deterministic, so
# the driver can hash-check the exact sample. Complements
# t_weighted_sample (A-ES exponential-jump weighted variant).

_RSVP_K = 3
_RSVP_SALT = ":r8-reservoir"


@register(
    "t_reservoir_per_group",
    oracle=f"""
    WITH pri AS (
        SELECT source, doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR) || '{_RSVP_SALT}') AS pri,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS group_n
        FROM documents
    )
    SELECT source, CAST(rn AS INT) AS slot, doc_id, n_chars, group_n
    FROM (
        SELECT source, doc_id, n_chars, group_n,
               row_number() OVER (PARTITION BY source
                                  ORDER BY pri, doc_id) AS rn
        FROM pri
    )
    WHERE rn <= {_RSVP_K}
    ORDER BY source, slot
    """,
    tags=("T", "sampling", "reservoir", "mergeable", "llm-pipeline"),
)
def t_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source reservoir: bottom-k salted-md5
    priorities (k smallest per group == distributed reservoir). One
    shuffle on source; per-partition bottom-k pre-truncation happens
    for free in the window's sort."""
    docs = load(spark, sf_dir, "documents")
    w_n = Window.partitionBy("source")
    w_r = Window.partitionBy("source").orderBy("pri", "doc_id")
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(_RSVP_SALT))).alias("pri"),
        )
        .withColumn("group_n", F.count("*").over(w_n).cast("bigint"))
        .withColumn("rn", F.row_number().over(w_r))
        .where(F.col("rn") <= _RSVP_K)
        .select(
            "source",
            F.col("rn").cast("int").alias("slot"),
            "doc_id",
            "n_chars",
            "group_n",
        )
        .orderBy("source", "slot")
    )
