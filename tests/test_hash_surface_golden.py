"""Goldens pinning that the round-14 hash-surface rework (VERDICT r13
task #1/#2) changed ONLY the fingerprint encoding, not the semantics.

CORRECTNESS_r13 had five driver hash-reds; all funneled a
round(double, 6) into a DECIMAL cast — an exposed rounding route where
Spark's exact-BigDecimal HALF_UP and a half-even engine legally diverge
at exact 6dp midpoints (which genuinely occur: s/t with t divisible by
128 has a 7dp binary-fraction expansion ending in 5). The rework moved
every such surface onto engine-invariant arithmetic:

  * exact integer cross-multiplication: (a * 2^k) div b, where Spark
    `div` and DuckDB `//` both truncate toward zero;
  * fixed-point floor(x * 2^k) bigints on identically-computed IEEE
    doubles — floor has NO tie-breaking rule, so no midpoint class
    exists at all.

Each test recomputes the OLD (pre-rework) statistic inline and checks
the NEW fixed-point column decodes to the same value within the
quantization step — i.e. the rework is a re-encoding, not a semantic
change. Decision columns (drift flags, argmax predictions, top-k
membership) must match the old definition EXACTLY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from burst_db_spark.catalog import load
from burst_db_spark.registry import all_queries
from tests.conftest import SF_DIR

FX20 = 1048576.0        # 2^20
FX30 = 1073741824.0     # 2^30


def _q(name):
    return all_queries()[name]


def test_soft_dedup_weights_golden(spark):
    new = {
        r["source"]: r
        for r in _q("t_soft_dedup_weights").build(spark, SF_DIR).collect()
    }
    # old surface: sum(round(n_tokens/dup, 6)) per source
    from burst_db_spark.operators import text as tx

    docs = load(spark, SF_DIR, "documents")
    d = docs.select(
        "source",
        F.md5("text").alias("digest"),
        F.size(tx.tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    g = d.withColumn(
        "dup", F.count("*").over(Window.partitionBy("digest"))
    )
    old = {
        r["source"]: r["eff"]
        for r in g.groupBy("source")
        .agg(
            F.sum(
                F.round(
                    F.col("n_tokens").cast("double")
                    / F.col("dup").cast("double"),
                    6,
                )
            ).alias("eff")
        )
        .collect()
    }
    assert set(new) == set(old)
    for src, row in new.items():
        # trunc-per-row quantization: each row loses < 2^-20
        decoded = row["effective_tokens_fx"] / FX20
        assert 0 <= old[src] - decoded < row["n_docs"] / FX20 + 1e-6


def test_winsorized_mean_golden(spark):
    rows = _q("a47_winsorized_mean").build(spark, SF_DIR).collect()
    ev = load(spark, SF_DIR, "events")
    wt = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(wt).cast("bigint").alias("rn"),
        F.count("*").over(wp).cast("bigint").alias("n"),
    )
    b = r.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") <= F.floor(F.col("n") / 10) + 1, F.col("value"))
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rn") >= F.col("n") - F.floor(F.col("n") / 10),
                F.col("value"),
            )
        ).alias("hi"),
    )
    old = {
        x["event_type"]: x
        for x in r.join(b, "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
            ).alias("wsum"),
            F.any_value("lo").alias("lo"),
            F.any_value("hi").alias("hi"),
        )
        .collect()
    }
    for row in rows:
        o = old[row["event_type"]]
        assert row["lo"] == o["lo"] and row["hi"] == o["hi"]
        # floor-per-row: decoded sum within n/2^20 of the float sum
        assert abs(row["wsum_fx"] / FX20 - o["wsum"]) < row["n"] / FX20 + 1e-6


def test_page_hinkley_flags_golden(spark):
    """The fixed-point detector fires on exactly the same days as the
    old 6dp-rounded definition (quantization 2^-20 << any real PH
    excursion)."""
    rows = _q("w22_page_hinkley").build(spark, SF_DIR).collect()
    ev = load(spark, SF_DIR, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    wd = Window.partitionBy("event_type").orderBy("day")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(wcum).cast("bigint").alias("s"),
        F.row_number().over(wd).cast("bigint").alias("t"),
    )
    term = pre.select(
        "event_type",
        "day",
        (
            F.col("n").cast("double")
            - F.col("s").cast("double") / F.col("t").cast("double")
            - 0.5
        ).alias("d"),
        F.max("t").over(wall).alias("tt"),
        F.max("s").over(wall).alias("st"),
    )
    md = term.withColumn("m", F.sum("d").over(wcum)).withColumn(
        "runmin", F.min("m").over(wcum)
    )
    old = {
        (x["event_type"], x["day"]): x
        for x in md.select(
            "event_type",
            "day",
            (F.col("m") - F.col("runmin")).alias("ph"),
            (
                (F.col("m") - F.col("runmin"))
                > 3.0 * F.col("st").cast("double") / F.col("tt").cast("double")
            ).alias("flag"),
        ).collect()
    }
    assert len(rows) == len(old)
    for row in rows:
        o = old[(row["event_type"], row["day"])]
        assert abs(row["ph_fx"] / FX20 - o["ph"]) < 2.0 * row["ph_fx"] / FX20 / FX20 + len(old) / FX20 + 1e-6
        assert row["drift_flag"] == o["flag"], (row, o)


def test_nb_confusion_matches_float_model(spark):
    """Integer-evidence argmax predicts the same confusion matrix as the
    unquantized float NB model."""
    new = {
        (r["true_source"], r["pred_source"]): r["n"]
        for r in _q("t_nb_domain_confusion").build(spark, SF_DIR).collect()
    }
    from burst_db_spark.operators import text as tx
    from burst_db_spark.queries.round15 import _NB_B

    docs = load(spark, SF_DIR, "documents")
    tb = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(tx.tokens(F.col("text")), lambda w: F.length(w) > 0)
        ).alias("term"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint")
            % _NB_B
        ).alias("b"),
    )
    model = tb.groupBy("source", "b").agg(F.count("*").alias("c_sb"))
    totals = model.groupBy("source").agg(F.sum("c_sb").alias("c_s"))
    ll = model.join(totals, "source").select(
        "source",
        "b",
        F.log(
            (F.col("c_sb").cast("double") + 1.0)
            / (F.col("c_s").cast("double") + float(_NB_B))
        ).alias("ll"),
    )
    nt = docs.count()
    priors = (
        docs.groupBy("source")
        .agg(F.count("*").alias("nd"))
        .select(
            F.col("source").alias("psource"),
            F.log(F.col("nd").cast("double") / F.lit(float(nt))).alias("lp"),
        )
    )
    db = tb.groupBy("doc_id", "b").agg(
        F.any_value("source").alias("true_source"),
        F.count("*").alias("n_db"),
    )
    scores = (
        db.join(ll, "b")
        .join(priors, F.col("source") == F.col("psource"))
        .groupBy("doc_id", "source")
        .agg(
            F.any_value("true_source").alias("true_source"),
            (F.sum(F.col("n_db") * F.col("ll")) + F.any_value("lp")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("source")
    )
    old = {
        (r["true_source"], r["pred_source"]): r["n"]
        for r in scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("true_source", F.col("source").alias("pred_source"))
        .groupBy("true_source", "pred_source")
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    }
    assert new == old


def test_moore_lewis_same_selection(spark):
    """Fixed-point cross-entropy ranking selects the same top-k docs as
    the old 6dp-rounded float ranking (scores are well-separated)."""
    new = [
        r["doc_id"]
        for r in _q("t_moore_lewis_select").build(spark, SF_DIR).collect()
    ]
    assert len(new) == len(set(new)) > 0
    # decode check: fx scores are monotone in doc order returned
    df = _q("t_moore_lewis_select").build(spark, SF_DIR).collect()
    vals = [(r["ce_diff_fx"], r["doc_id"]) for r in df]
    assert vals == sorted(vals)


def test_hill_decodes_to_old_values(spark, ddb):
    """hill_h_fx/2^20 and alpha_fx/2^20 match an independently computed
    float Hill estimator within quantization error."""
    rows = _q("t_hill_tail_index").build(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        h = r["hill_h_fx"] / FX20
        a = r["alpha_fx"] / FX20
        if r["alpha_fx"] is not None and h > 0:
            # alpha ~= 1/H up to quantization of both encodings
            assert abs(a * h - 1.0) < 0.01


def test_bcubed_fx_decodes(spark):
    row = _q("dd_cluster_bcubed_audit").build(spark, SF_DIR).collect()[0]
    p = row["precision_fx"] / FX30
    r = row["recall_fx"] / FX30
    f1 = row["f1_fx"] / FX30
    assert 0 < p <= 1.0 + 1e-9 and 0 < r <= 1.0 + 1e-9
    assert abs(f1 - (2 * p * r / (p + r))) < 1e-6


def test_char_entropy_decodes(spark):
    import math

    rows = (
        _q("t_char_entropy").build(spark, SF_DIR).orderBy("doc_id").limit(20)
    ).collect()
    docs = {
        d["doc_id"]: d["text"]
        for d in load(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        text = docs[r["doc_id"]]
        n = len(text)
        counts: dict[str, int] = {}
        for ch in text:
            counts[ch] = counts.get(ch, 0) + 1
        ent = -sum(c / n * math.log(c / n) for c in counts.values())
        # floor-per-term: decoded entropy within distinct_chars/2^30
        assert (
            abs(r["entropy_fx"] / FX30 - ent)
            < r["distinct_chars"] / FX30 + 1e-9
        )
