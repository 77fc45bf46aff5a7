"""Round-9 queries: the end-to-end document curation cascade (quality
gate → exact dedup → MinHash-LSH fuzzy dedup → Bloom decontamination,
one Catalyst plan, per-stage funnel accounting), a point-in-interval
join whose fact scan is pruned at runtime by dynamic partition pruning
(the anti-join answer derived from totals minus the pruned inner join),
and the measured MinHash-LSH recall curve against exact-Jaccard ground
truth (the audit that justifies the banding parameters).

Reference parity: opera-adt/burst_db has no text/curation path — these
extend the LLM-pipeline surface (SURVEY.md "beyond the reference"
mandate); j18 extends the reference's blackout-interval anti-join
(reference src/burst_db/ interval filters) with the partitioned-scan
execution a 100 TB fact table needs. Every oracle is ANSI SQL the
driver runs on DuckDB. Float discipline (round-7 law): every
float-derived aggregate is quantized PER ROW with ``floor(x * 10^k)``
into BIGINT before summing; the only double outputs are divisions and
multiplications written with the identical operand order in both
engines (IEEE ops are deterministic; only routes differ, so we pin the
route).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import dedup as dd
from burst_db_spark.operators import text as tx
from burst_db_spark.queries.round4 import _minhash_pair_ctes
from burst_db_spark.queries.slayer import _tmpdir
from burst_db_spark.queries.textops import _SHINGLES_CTE, _TOKS
from burst_db_spark.registry import register

# ---------------------------------------------------------------------------
# DD: the full curation cascade. Every large-scale pretraining corpus
# runs this funnel; each stage here is the scale path of its standalone
# query (quality gate t_quality_filter, exact dedup dd_exact, fuzzy
# dedup dd_lsh_cluster_dedup, decontamination t_decontaminate_bloom),
# chained WITHOUT materialization so Catalyst sees one plan and the
# per-stage manifest falls out as five tiny aggregates. Benchmark
# sources (src0/src1) are held out up front and their shingles build
# the 128 Kbit broadcast Bloom filter the survivors are scrubbed
# against — the train⋈benchmark shuffle never happens, which is what
# survives when the corpus is 100 TB.

_CASCADE_BENCH = ("src0", "src1")
_CB_M = 1 << 17
_CB_K = 3


@register(
    "dd_docs_cascade_pipeline",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    corpus AS (
        SELECT doc_id FROM documents
        WHERE source NOT IN ('src0', 'src1')
    ),
    q AS (
        SELECT d.doc_id,
               CASE WHEN len({_TOKS}) < 5 THEN 0.0
                    ELSE 1.0 - least(1.0,
                         length(regexp_replace(text, '[^.!?,;]', '', 'g'))
                         / greatest(len({_TOKS}), 1))
               END AS quality_score
        FROM documents d JOIN corpus USING (doc_id)
    ),
    kept0 AS (SELECT doc_id FROM q WHERE quality_score >= 0.5),
    kept1 AS (
        SELECT min(d.doc_id) AS doc_id
        FROM documents d JOIN kept0 USING (doc_id)
        GROUP BY md5(lower(trim(d.text)))
    ),
    {_minhash_pair_ctes("kept1")},
    edges AS (SELECT id_a AS src, id_b AS dst FROM lsh_pairs
              UNION SELECT id_b, id_a FROM lsh_pairs),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM kept1
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    assign AS (SELECT src AS doc_id, min(dst) AS cluster_id
               FROM reach GROUP BY src),
    kept2 AS (SELECT doc_id FROM assign WHERE doc_id = cluster_id),
    bench AS (SELECT DISTINCT s.shingle FROM sh s
              JOIN documents d USING (doc_id)
              WHERE d.source IN ('src0', 'src1')),
    js AS (SELECT unnest([0, 1, 2]) AS j),
    tpos AS (SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || shingle),
                       1, 8)) AS BIGINT) % {_CB_M} AS pos
             FROM bench CROSS JOIN js),
    cpos AS (SELECT s.doc_id, s.shingle,
                 CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || shingle),
                       1, 8)) AS BIGINT) % {_CB_M} AS pos
             FROM sh s JOIN kept2 USING (doc_id) CROSS JOIN js),
    flag AS (
        SELECT doc_id, shingle,
               count(DISTINCT c.pos) AS np,
               count(DISTINCT CASE WHEN t.pos IS NOT NULL THEN c.pos END) AS ni
        FROM cpos c LEFT JOIN tpos t ON t.pos = c.pos
        GROUP BY 1, 2
    ),
    contaminated AS (
        SELECT doc_id FROM flag WHERE np = ni
        GROUP BY doc_id HAVING count(*) >= 5
    ),
    kept3 AS (SELECT k.doc_id FROM kept2 k
              WHERE NOT EXISTS (SELECT 1 FROM contaminated c
                                WHERE c.doc_id = k.doc_id))
    SELECT stage,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (
        SELECT 'stage0_raw' AS stage, count(*) AS n_docs,
               sum(len({_TOKS})) AS n_tokens
        FROM documents d JOIN corpus USING (doc_id)
        UNION ALL
        SELECT 'stage1_quality', count(*), sum(len({_TOKS}))
        FROM documents d JOIN kept0 USING (doc_id)
        UNION ALL
        SELECT 'stage2_exact', count(*), sum(len({_TOKS}))
        FROM documents d JOIN kept1 USING (doc_id)
        UNION ALL
        SELECT 'stage3_fuzzy', count(*), sum(len({_TOKS}))
        FROM documents d JOIN kept2 USING (doc_id)
        UNION ALL
        SELECT 'stage4_decontam', count(*), sum(len({_TOKS}))
        FROM documents d JOIN kept3 USING (doc_id)
    )
    ORDER BY stage
    """,
    tags=("dedup", "pipeline", "cascade", "bloom", "llm-pipeline"),
)
def dd_docs_cascade_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation cascade with per-stage funnel accounting:
    benchmark sources held out → quality gate (score ≥ 0.5) → exact
    dedup (min doc_id per content digest) → MinHash-LSH cluster dedup
    (min-id survivor) → Bloom decontamination against benchmark
    shingles (≥5 flagged shingles drops the doc). Output is the
    5-stage manifest (stage, n_docs, n_tokens). Scale shape: each
    stage is its standalone query's production path — no all-pairs
    join anywhere, the Bloom bitset is a 16 KB broadcast tested
    map-side, and stage manifests are 1-row aggregates."""
    docs = load(spark, sf_dir, "documents")
    corpus = docs.where(~F.col("source").isin(*_CASCADE_BENCH))
    corpus_ids = corpus.select("doc_id")

    q = tx.quality_features(corpus.select("doc_id", "text"))
    kept0 = q.where(F.col("quality_score") >= 0.5).select("doc_id")
    d0 = corpus.join(kept0, "doc_id", "left_semi")
    kept1 = dd.exact_duplicates(d0, "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    d1 = corpus.join(kept1, "doc_id", "left_semi")
    pairs = dd.minhash_lsh_dedup(d1, "doc_id", threshold=0.5)
    cc = dd.connected_components(pairs, d1, "doc_id")
    kept2 = cc.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")

    from burst_db_spark.operators.bloom import bloom_contains, build_bloom

    sh_all = dd.doc_shingles(docs, "doc_id")
    bench_ids = docs.where(F.col("source").isin(*_CASCADE_BENCH)).select(
        "doc_id"
    )
    bench_sh = (
        sh_all.join(F.broadcast(bench_ids), "doc_id")
        .select("shingle")
        .distinct()
    )
    bits = build_bloom(bench_sh, "shingle", _CB_M, _CB_K)
    kept2_sh = sh_all.join(kept2, "doc_id", "left_semi")
    contaminated = (
        kept2_sh.where(
            bloom_contains(spark, F.col("shingle"), bits, _CB_M, _CB_K)
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("nf"))
        .where(F.col("nf") >= 5)
        .select("doc_id")
    )
    kept3 = kept2.join(contaminated, "doc_id", "left_anti")

    def stage_row(ids: DataFrame, name: str) -> DataFrame:
        return (
            docs.join(ids, "doc_id", "left_semi")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum(tx.token_count(F.col("text")))
                .cast("bigint")
                .alias("n_tokens"),
            )
            .select(F.lit(name).alias("stage"), "n_docs", "n_tokens")
        )

    return (
        stage_row(corpus_ids, "stage0_raw")
        .unionAll(stage_row(kept0, "stage1_quality"))
        .unionAll(stage_row(kept1, "stage2_exact"))
        .unionAll(stage_row(kept2, "stage3_fuzzy"))
        .unionAll(stage_row(kept3, "stage4_decontam"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# J18: point-in-interval join driven by dynamic partition pruning.
# The blackout anti-join (P7/J10 semantics) executed the way a
# date-partitioned 100 TB fact table wants it: the heavy per-row work
# (timestamp bounds check + value quantization) runs ONLY on the
# partitions the runtime DPP filter keeps (the dates any blackout
# interval covers, ~17% here), and the anti-join answer falls out as
# per-type totals (a column-pruned count) minus the in-interval counts
# — the complement is never scanned for. Extends p12 (round7.py:431):
# there the dim filter prunes for an aggregate; here it drives a
# point-in-interval containment join.


def _j18_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write events date-partitioned + a per-type interval dim (two
    'blackout' windows and one 'maintenance' window per event_type,
    anchored at the type's first event date); deterministic content,
    throwaway location."""
    base = _tmpdir("j18")
    fact_path = _os.path.join(base, "fact")
    iv_path = _os.path.join(base, "intervals")
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(fact_path)
    d0 = ev.groupBy("event_type").agg(F.min("event_date").alias("d0"))
    windows = [
        ("blackout", 78, 162),     # day 3 06:00 .. day 6 18:00
        ("blackout", 312, 372),    # day 13 00:00 .. day 15 12:00
        ("maintenance", 480, 528),  # day 20 .. day 22 (filtered out)
    ]
    iv = d0.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(kind).alias("kind"),
                        F.expr(
                            f"CAST(d0 AS TIMESTAMP) + INTERVAL {s} HOUR"
                        ).alias("start_ts"),
                        F.expr(
                            f"CAST(d0 AS TIMESTAMP) + INTERVAL {e} HOUR"
                        ).alias("end_ts"),
                    )
                    for kind, s, e in windows
                ]
            )
        ).alias("w"),
    ).select("event_type", "w.kind", "w.start_ts", "w.end_ts")
    iv.write.mode("overwrite").parquet(iv_path)
    return fact_path, iv_path


@register(
    "j18_point_in_interval_dpp",
    oracle="""
    WITH d0 AS (
        SELECT event_type,
               CAST(min(CAST(ts AS DATE)) AS TIMESTAMP) AS t0
        FROM events GROUP BY 1
    ),
    iv AS (
        SELECT event_type, t0 + INTERVAL 78 HOUR AS s,
               t0 + INTERVAL 162 HOUR AS e
        FROM d0
        UNION ALL
        SELECT event_type, t0 + INTERVAL 312 HOUR,
               t0 + INTERVAL 372 HOUR
        FROM d0
    ),
    ins AS (
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n_in,
               CAST(sum(CAST(floor(e.value * 1e6) AS BIGINT)) AS BIGINT)
                   AS sum_micros
        FROM events e
        JOIN iv ON iv.event_type = e.event_type
               AND e.ts >= iv.s AND e.ts < iv.e
        GROUP BY 1
    ),
    tot AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
        FROM events GROUP BY 1
    )
    SELECT t.event_type,
           CAST(COALESCE(i.n_in, 0) AS BIGINT) AS n_in_blackout,
           CAST(COALESCE(i.sum_micros, 0) AS BIGINT)
               AS sum_micros_in_blackout,
           CAST(t.n_total - COALESCE(i.n_in, 0) AS BIGINT) AS n_outside
    FROM tot t LEFT JOIN ins i USING (event_type)
    ORDER BY t.event_type
    """,
    tags=("J18", "interval-join", "dpp", "partition-pruning", "anti-join"),
)
def j18_point_in_interval_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type blackout accounting over a date-partitioned fact: the
    interval dim (filtered to kind='blackout' at runtime) explodes into
    the dates it covers, the broadcast join on (event_type, event_date)
    lets dynamic partition pruning skip every fact partition no
    interval touches, the exact ts-bounds predicate trims day-boundary
    events post-join, and the anti-join side (n_outside) is computed as
    the column-pruned per-type total minus the in-interval count — the
    complement partitions are never scanned for their values. The
    oracle recomputes the same intervals from the raw events table."""
    fact_path, iv_path = _j18_fixture(spark, sf_dir)
    fact = spark.read.parquet(fact_path)
    iv = spark.read.parquet(iv_path).where(F.col("kind") == "blackout")
    ivd = iv.withColumn(
        "event_date",
        F.explode(
            F.expr("sequence(CAST(start_ts AS DATE), CAST(end_ts AS DATE))")
        ),
    )
    ins = (
        fact.join(F.broadcast(ivd), ["event_type", "event_date"])
        .where(
            (F.col("ts") >= F.col("start_ts"))
            & (F.col("ts") < F.col("end_ts"))
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_in"),
            F.sum(F.floor(F.col("value") * F.lit(1e6)).cast("bigint"))
            .cast("bigint")
            .alias("sum_micros"),
        )
    )
    tot = fact.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_total")
    )
    return (
        tot.join(ins, "event_type", "left")
        .select(
            "event_type",
            F.coalesce(F.col("n_in"), F.lit(0))
            .cast("bigint")
            .alias("n_in_blackout"),
            F.coalesce(F.col("sum_micros"), F.lit(0))
            .cast("bigint")
            .alias("sum_micros_in_blackout"),
            (F.col("n_total") - F.coalesce(F.col("n_in"), F.lit(0)))
            .cast("bigint")
            .alias("n_outside"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# T: measured MinHash-LSH recall curve. The audit that justifies the
# banding parameters (16 hashes, 4 bands × 4 rows): exact Jaccard
# pairs (lossless prefix-filter join, threshold 0.05 — low enough to
# capture the non-duplicate background, where recall SHOULD be ~0) are
# binned by true similarity (0.05-wide bins) and each bin reports the
# fraction the banded LSH candidate generation actually recovered,
# next to the theoretical S-curve 1 - (1 - s^r)^b at the bin midpoint.
# At 100 TB this is how LSH parameters are chosen and defended:
# measure recall on a corpus slice against the exact join, read the
# curve, move the knee. The exact side stays the lossless prefix
# filter (at τ=0.05 the prefix is ~95% of each set, so this audit is
# priced like the quadratic join it checks — run it on a slice, which
# is why bench pins it to sf0.01); the ORACLE runs the quadratic
# shingle join.

_RC_THRESHOLD = 0.05


@register(
    "t_minhash_recall_curve",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
              FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    exact_pairs AS (
        SELECT id_a, id_b,
               common / (sa.n_sh + sb.n_sh - common) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE common / (sa.n_sh + sb.n_sh - common) >= {_RC_THRESHOLD}
    ),
    {_minhash_pair_ctes(None)},
    binned AS (
        SELECT CAST(floor(jaccard * 20) AS BIGINT) AS bin, id_a, id_b
        FROM exact_pairs
    ),
    hit AS (
        SELECT b.bin,
               CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM binned b
        LEFT JOIN cand c ON c.id_a = b.id_a AND c.id_b = b.id_b
    ),
    curve AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_exact,
               CAST(sum(hit) AS BIGINT) AS n_lsh_hit
        FROM hit GROUP BY bin
    ),
    sc AS (SELECT bin, n_exact, n_lsh_hit,
                  least((bin + 0.5) / 20.0, 1.0) AS s
           FROM curve),
    s4c AS (SELECT bin, n_exact, n_lsh_hit, s * s * s * s AS s4 FROM sc),
    tc AS (SELECT bin, n_exact, n_lsh_hit, 1.0 - s4 AS t FROM s4c)
    SELECT bin, n_exact, n_lsh_hit,
           CAST(n_lsh_hit AS DOUBLE) / n_exact AS recall,
           1.0 - t * t * t * t AS expected_recall
    FROM tc
    ORDER BY bin
    """,
    tags=("text", "dedup", "lsh", "recall", "audit", "llm-pipeline"),
)
def t_minhash_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-similarity-bin (0.05-wide) LSH candidate recall against the
    exact Jaccard ≥ 0.05 pair set (lossless prefix-filter join), with
    the theoretical banding S-curve 1-(1-s^4)^4 at each bin midpoint
    for comparison. The expected-recall expression is written with the
    identical IEEE operation order in both engines (explicit repeated
    multiplication, no pow), so the doubles match bit-for-bit."""
    docs = load(spark, sf_dir, "documents")
    exact = dd.jaccard_prefix_pairs(docs, "doc_id",
                                    threshold=_RC_THRESHOLD)
    sigs = dd.minhash_signatures(docs, "doc_id")
    cands = dd.lsh_candidate_pairs(sigs, "doc_id")
    binned = exact.select(
        F.floor(F.col("jaccard") * 20).cast("bigint").alias("bin"),
        "id_a",
        "id_b",
    )
    hit = binned.join(
        cands.withColumn("hit", F.lit(1)), ["id_a", "id_b"], "left"
    ).select("bin", F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
    curve = hit.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_exact"),
        F.sum("hit").cast("bigint").alias("n_lsh_hit"),
    )
    sc = curve.withColumn(
        "s", F.least((F.col("bin") + F.lit(0.5)) / F.lit(20.0), F.lit(1.0))
    )
    s4c = sc.withColumn(
        "s4", F.col("s") * F.col("s") * F.col("s") * F.col("s")
    )
    tc = s4c.withColumn("t", F.lit(1.0) - F.col("s4"))
    return tc.select(
        "bin",
        "n_exact",
        "n_lsh_hit",
        (F.col("n_lsh_hit").cast("double") / F.col("n_exact")).alias(
            "recall"
        ),
        (
            F.lit(1.0)
            - F.col("t") * F.col("t") * F.col("t") * F.col("t")
        ).alias("expected_recall"),
    ).orderBy("bin")
