"""End-to-end training-data curation queries: corpus dedup decision,
train/eval decontamination, quantile quality filtering — the composed
forms of the dedup/text operators, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import dedup as dd
from burst_db_spark.operators import text as tx
from burst_db_spark.queries.textops import _SHINGLES_CTE, _TOKS
from burst_db_spark.registry import register


@register(
    "dd_corpus_survivors",
    oracle=f"""
    WITH RECURSIVE
    {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
              FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.2
    ),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    clusters AS (
        SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    )
    SELECT d.doc_id, d.lang, d.source,
           CAST(sz.n AS BIGINT) AS cluster_size
    FROM documents d
    JOIN clusters c ON c.doc_id = d.doc_id AND c.cluster_id = d.doc_id
    JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n
          FROM clusters GROUP BY cluster_id) sz
      ON sz.cluster_id = d.doc_id
    """,
    tags=("dedup", "pipeline"),
)
def dd_corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup DECISION: near-dup pairs → clusters → keep one doc
    per cluster (the min id) with its cluster size — i.e. the deduplicated
    corpus manifest a 100 TB curation job materializes."""
    docs = load(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, "doc_id", threshold=0.2)
    clusters = dd.connected_components(pairs, docs, "doc_id")
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    survivors = clusters.where(F.col("doc_id") == F.col("cluster_id"))
    return (
        docs.join(survivors.select("doc_id"), "doc_id")
        .join(
            sizes.withColumnRenamed("cluster_id", "doc_id"),
            "doc_id",
        )
        .select("doc_id", "lang", "source", "cluster_size")
    )


@register(
    "t_decontaminate",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    train AS (SELECT s.doc_id, s.shingle FROM sh s
              JOIN documents d ON d.doc_id = s.doc_id
              WHERE d.source IN ('src0', 'src1', 'src2')),
    eval_ AS (SELECT s.doc_id, s.shingle FROM sh s
              JOIN documents d ON d.doc_id = s.doc_id
              WHERE d.source NOT IN ('src0', 'src1', 'src2')),
    hits AS (
        SELECT e.doc_id AS eval_doc,
               CAST(count(DISTINCT e.shingle) AS BIGINT) AS n_shared
        FROM eval_ e JOIN train t ON e.shingle = t.shingle
        GROUP BY e.doc_id
    )
    SELECT eval_doc, n_shared FROM hits WHERE n_shared >= 5
    """,
    tags=("text", "decontamination", "pipeline"),
)
def t_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: eval docs sharing ≥5 distinct 3-gram
    shingles with ANY train doc. The join touches only co-occurring
    shingles (semi-join shape), never the doc cross product."""
    docs = load(spark, sf_dir, "documents")
    sh = dd.doc_shingles(docs, "doc_id")
    train_ids = docs.where(F.col("source").isin("src0", "src1", "src2")).select(
        "doc_id"
    )
    eval_ids = docs.join(train_ids, "doc_id", "left_anti").select("doc_id")
    train_sh = sh.join(F.broadcast(train_ids), "doc_id").select("shingle").distinct()
    eval_sh = sh.join(F.broadcast(eval_ids), "doc_id")
    hits = (
        eval_sh.join(train_sh, "shingle")
        .groupBy(F.col("doc_id").alias("eval_doc"))
        .agg(F.count_distinct("shingle").alias("n_shared"))
        .where(F.col("n_shared") >= 5)
    )
    return hits


_BLOOM_M = 1 << 17
_BLOOM_K = 3


@register(
    "t_decontaminate_bloom",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    train AS (SELECT DISTINCT s.shingle FROM sh s
              JOIN documents d ON d.doc_id = s.doc_id
              WHERE d.source IN ('src0', 'src1', 'src2')),
    eval_ AS (SELECT DISTINCT s.doc_id, s.shingle FROM sh s
              JOIN documents d ON d.doc_id = s.doc_id
              WHERE d.source NOT IN ('src0', 'src1', 'src2')),
    js AS (SELECT unnest([0, 1, 2]) AS j),
    tpos AS (SELECT DISTINCT
                 CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || shingle),
                       1, 8)) AS BIGINT) % {_BLOOM_M} AS pos
             FROM train CROSS JOIN js),
    cand AS (SELECT doc_id, shingle,
                 CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || shingle),
                       1, 8)) AS BIGINT) % {_BLOOM_M} AS pos
             FROM eval_ CROSS JOIN js),
    flag AS (
        SELECT doc_id, shingle,
               count(DISTINCT c.pos) AS np,
               count(DISTINCT CASE WHEN t.pos IS NOT NULL THEN c.pos END) AS ni
        FROM cand c LEFT JOIN tpos t ON t.pos = c.pos
        GROUP BY 1, 2
    )
    SELECT doc_id AS eval_doc, CAST(count(*) AS BIGINT) AS n_flagged
    FROM flag WHERE np = ni
    GROUP BY 1
    HAVING count(*) >= 5
    """,
    tags=("text", "decontamination", "bloom", "pipeline"),
)
def t_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination, the broadcast-Bloom way: train shingles build a
    128 Kbit array (distributed partial bitsets, OR-reduced, broadcast);
    eval shingles are tested MAP-SIDE — no train⋈eval shuffle at all,
    which is what survives when the train side is 100 TB. The md5-seeded
    bit positions make the filter's false positives deterministic, so the
    oracle reproduces the flagged set exactly — mistakes included."""
    from burst_db_spark.operators.bloom import bloom_contains, build_bloom

    docs = load(spark, sf_dir, "documents")
    sh = dd.doc_shingles(docs, "doc_id")
    train_ids = docs.where(F.col("source").isin("src0", "src1", "src2")).select(
        "doc_id"
    )
    train_sh = (
        sh.join(F.broadcast(train_ids), "doc_id").select("shingle").distinct()
    )
    bits = build_bloom(train_sh, "shingle", _BLOOM_M, _BLOOM_K)
    eval_sh = sh.join(F.broadcast(train_ids), "doc_id", "left_anti")
    flagged = eval_sh.where(
        bloom_contains(spark, F.col("shingle"), bits, _BLOOM_M, _BLOOM_K)
    )
    return (
        flagged.groupBy(F.col("doc_id").alias("eval_doc"))
        .agg(F.count("*").alias("n_flagged"))
        .where(F.col("n_flagged") >= 5)
    )


@register(
    "t_repetition_stats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS g FROM toks),
    g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                     t[i+3] || ' ' || t[i+4])) AS g FROM toks),
    c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
    a2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_bigrams,
                  CAST(max(c) AS BIGINT) AS top_bigram_count
           FROM c2 GROUP BY 1),
    c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
    a5 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_5grams,
                  CAST(count(*) AS BIGINT) AS distinct_5grams
           FROM c5 GROUP BY 1),
    j AS (
        SELECT d.doc_id,
               COALESCE(total_bigrams, 0) AS total_bigrams,
               COALESCE(top_bigram_count, 0) AS top_bigram_count,
               COALESCE(total_5grams, 0) AS total_5grams,
               COALESCE(distinct_5grams, 0) AS distinct_5grams
        FROM documents d
        LEFT JOIN a2 ON a2.doc_id = d.doc_id
        LEFT JOIN a5 ON a5.doc_id = d.doc_id
    ),
    f AS (
        SELECT *,
               CASE WHEN total_bigrams > 0
                    THEN top_bigram_count / total_bigrams
                    ELSE 0.0 END AS top_bigram_frac,
               CASE WHEN total_5grams > 0
                    THEN (total_5grams - distinct_5grams) / total_5grams
                    ELSE 0.0 END AS dup_5gram_frac
        FROM j
    )
    SELECT doc_id, total_bigrams, top_bigram_count, total_5grams,
           distinct_5grams, top_bigram_frac, dup_5gram_frac,
           CAST(CASE WHEN top_bigram_frac <= 0.2 AND dup_5gram_frac <= 0.3
                     THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM f
    """,
    tags=("text", "repetition", "quality", "pipeline"),
)
def t_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals: top-2-gram occupancy and
    duplicate-5-gram fraction per document, plus the keep decision at the
    published thresholds (0.2 / 0.3)."""
    docs = load(spark, sf_dir, "documents")
    return tx.repetition_features(docs, "doc_id")


@register(
    "t_stratified_sample",
    oracle="""
    WITH b AS (
        SELECT doc_id, lang,
               CAST(CAST(('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)),
                          1, 8)) AS BIGINT) % 10000 AS INTEGER) AS sample_bucket
        FROM documents
    )
    SELECT doc_id, lang, sample_bucket FROM b
    WHERE sample_bucket < CASE lang WHEN 'en' THEN 5000
                                    WHEN 'de' THEN 2500
                                    ELSE 1000 END
    """,
    tags=("pipeline", "sampling", "stratified"),
)
def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing by deterministic stratified sampling: keep 50% of
    English, 25% of German, 10% of everything else — each row's fate a
    pure function of (salt, doc_id), so re-runs and engine changes keep
    the identical sample. Plan is a map-side filter: zero shuffles."""
    from burst_db_spark.operators.packing import stratified_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.25}, default_fraction=0.1
    )


@register(
    "t_temperature_mix",
    oracle="""
    WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang),
    m AS (SELECT max(n) AS mx FROM c),
    thr AS (SELECT lang,
                   CAST(floor(sqrt(n / mx) * 10000) AS INTEGER) AS t
            FROM c CROSS JOIN m),
    b AS (SELECT doc_id, lang,
                 CAST(CAST(('0x' || substr(md5('temp:' || CAST(doc_id AS VARCHAR)),
                            1, 8)) AS BIGINT) % 10000 AS INTEGER) AS sample_bucket
          FROM documents)
    SELECT b.doc_id, b.lang, b.sample_bucket
    FROM b JOIN thr ON thr.lang = b.lang
    WHERE b.sample_bucket < thr.t
    """,
    tags=("pipeline", "sampling", "temperature"),
)
def t_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature rebalancing over the corpus: each language keeps
    sqrt(n_lang / n_largest) of its documents — the standard multilingual
    upweighting of tail languages, computed entirely relationally (counts
    → broadcast max → thresholds) with the deterministic salted-bucket
    keep rule. English (largest) keeps everything; tails keep more than
    their proportional share."""
    from burst_db_spark.operators.packing import temperature_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_sample(docs, "doc_id", "lang").select(
        "doc_id", "lang", "sample_bucket"
    )


@register(
    "t_cap_per_source",
    oracle="""
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, source FROM r WHERE rk <= 10
    """,
    tags=("pipeline", "sampling", "cap"),
)
def t_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (keep ≤10 docs per source): a
    deterministic reservoir ordered by salted md5 — the standard rule
    that stops a single domain from dominating a web corpus, stable
    across re-runs and engines. WindowGroupLimit prunes beyond rank k
    map-side, so oversized groups never cross the exchange whole."""
    from burst_db_spark.operators.packing import cap_per_group

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_group(docs, "doc_id", "source", k=10)


@register(
    "t_quality_filter",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, source,
               CASE WHEN len({_TOKS}) < 5 THEN 0.0
                    ELSE 1.0 - least(1.0,
                         length(regexp_replace(text, '[^.!?,;]', '', 'g'))
                         / greatest(len({_TOKS}), 1))
               END AS quality_score
        FROM documents
    ),
    cut AS (
        SELECT source, quantile_cont(quality_score, 0.5) AS median_q
        FROM q GROUP BY source
    )
    SELECT q.doc_id, q.source, q.quality_score
    FROM q JOIN cut ON cut.source = q.source
    WHERE q.quality_score >= cut.median_q
    """,
    tags=("text", "quality", "pipeline"),
)
def t_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile quality gate: keep docs at or above their source's median
    quality score (exact percentile, broadcast per-source cuts)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    q = tx.quality_features(docs).select("doc_id", "source", "quality_score")
    cut = q.groupBy("source").agg(
        F.expr("percentile(quality_score, 0.5)").alias("median_q")
    )
    return (
        q.join(F.broadcast(cut), "source")
        .where(F.col("quality_score") >= F.col("median_q"))
        .select("doc_id", "source", "quality_score")
    )
