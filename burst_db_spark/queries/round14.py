"""Round-14-era queries (added in build round 12): data-pruning and
corpus-diagnostics operators from the LLM curation literature —

- D4 diversification (Tirumala et al., NeurIPS 2023): SemDeDup within
  k-means cells, then drop the most PROTOTYPICAL survivors per cell
  (closest to their centroid) — dedup removes copies, prototype pruning
  removes redundancy.
- Oracle-checked UNROLLED k-means (fixed Lloyd rounds, decimal-mean
  centroids): the training loop itself hash-checks against DuckDB —
  the first k-means in this repo whose UPDATE step is cross-engine
  verified, not just its downstream search.
- SoftDeDup reweighting (He et al., 2024): keep duplicates, down-weight
  them 1/|dup group| — the gradient-preserving alternative to dropping.
- Hill tail-index (Hill 1975): the heavy-tail exponent of the token
  frequency distribution per language — complements the Zipf-slope OLS
  with an estimator that uses only the top-k order statistics.
- CCNet perplexity buckets (Wenzek et al., LREC 2020): per-language
  head/middle/tail terciles of an LM quality score, with the per-GROUP
  exact-ntile computed by the distributed global-rank pattern
  (operators/text.grouped_ntile_scalable), not a one-task-per-language
  window.
- Gopher rule battery (Rae et al. 2021) — all-integer ratio tests;
  character entropy (spam/junk signal); B-cubed cluster-quality audit
  (Bagga & Baldwin 1998) of the production LSH clusters vs exact gold;
  exact weighted median; CUSUM drift (Page 1954) via the prefix-sum
  identity; token-Gini concentration; Hilbert-vs-Morton layout quality
  measured as contiguous code runs per bbox query.

Reference parity: opera-adt/burst_db has no corpus layer — these extend
the LLM-pipeline surface (SURVEY.md "beyond the reference" mandate).

Cross-engine determinism: counts/ranks are exact integers; cosines and
L2 distances are ascending-dim folds (bit-identical per the
similarity-family precedent); centroid means accumulate in
DECIMAL(38,12) (order-free); every transcendental output (ln, norms)
is rounded to 6 decimals on both engines; ties break on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import dedup as dd
from burst_db_spark.operators import lm
from burst_db_spark.operators import similarity as sim
from burst_db_spark.operators import text as tx
from burst_db_spark.queries.similarity import _cos_sql
from burst_db_spark.queries.textops import _TOKS
from burst_db_spark.registry import register

# -- D4: SemDeDup + prototype pruning over TRAINED cells ------------------------

_D4_TAU = 0.5
# drop the top 1/4 most-prototypical survivors per cell: rn*4 <= n
_D4_DROP_NUM, _D4_DROP_DEN = 1, 4


# -- Oracle-checked unrolled k-means -------------------------------------------

_KM_K = 16
_KM_ROUNDS = 2
_KM_SEED_H = (
    "CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)"
)
_KM_DIST = (
    "list_reduce(list_transform(range(1, 65), i -> "
    "(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])), (x, y) -> x + y)"
)


def _km_round_ctes(rnd: int, cent_src: str) -> str:
    """One assign+update Lloyd round as CTEs a{rnd}/c{rnd}."""
    return f"""
    a{rnd} AS (
        SELECT id, cell, v FROM (
            SELECT e.id, c.cell, e.v, {_KM_DIST} AS dist
            FROM e CROSS JOIN {cent_src} c
        )
        QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, cell) = 1
    ),
    c{rnd} AS (
        SELECT cell, list(m ORDER BY dim) AS cv
        FROM (
            SELECT cell, dim,
                   CAST(sum(CAST(x AS DECIMAL(38, 12))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS m
            FROM (SELECT cell, unnest(v) AS x,
                         unnest(range(1, 65)) AS dim
                  FROM a{rnd})
            GROUP BY cell, dim
        ) GROUP BY cell
    )"""


@register(
    "knn_kmeans_unrolled",
    oracle=f"""
    WITH e AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeds AS (
        SELECT v AS cv, id AS sid, {_KM_SEED_H} AS h
        FROM e ORDER BY h, sid LIMIT {_KM_K}
    ),
    c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY h, sid) AS INTEGER) AS cell,
               cv
        FROM seeds
    ),
    {_km_round_ctes(1, "c0")},
    {_km_round_ctes(2, "c1")}
    SELECT a.cell, CAST(count(*) AS BIGINT) AS n_members,
           round(sqrt(list_reduce(
               list_prepend(0.0, list_transform(c.cv, x -> x * x)),
               (x, y) -> x + y)), 6) AS cnorm6
    FROM a2 a JOIN c2 c USING (cell)
    GROUP BY a.cell, c.cv
    """,
    tags=("knn", "kmeans", "embedding", "oracle-checked-training"),
)
def knn_kmeans_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds, fully relational and HASH-CHECKED end-to-end
    (operators/similarity.kmeans_unrolled_stats): deterministic md5
    seeds, broadcast-frame assignment (min(struct(dist, cell)) — agg
    with map-side combine, no per-vector window), DECIMAL(38,12)
    centroid means so the update step is shuffle-order-free and
    bit-equal on any engine. The driver-paced ``kmeans_codebook``
    variant stays for open-ended convergence (its consumer is the
    documented rows-only row); THIS row proves the training arithmetic."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.kmeans_unrolled_stats(emb, k=_KM_K, rounds=_KM_ROUNDS)


@register(
    "dd_d4_diversify",
    oracle=f"""
    WITH e AS (
        SELECT vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    seeds AS (
        SELECT v AS cv, id AS sid, {_KM_SEED_H} AS h
        FROM e ORDER BY h, sid LIMIT {_KM_K}
    ),
    c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY h, sid) AS INTEGER) AS cell,
               cv
        FROM seeds
    ),
    {_km_round_ctes(1, "c0")},
    {_km_round_ctes(2, "c1")},
    drops AS (
        SELECT DISTINCT y.id
        FROM a2 AS x JOIN a2 AS y ON x.cell = y.cell AND x.id < y.id
        WHERE {_cos_sql("x.v", "y.v")} >= {_D4_TAU!r}
    ),
    f AS (
        SELECT a.id, a.cell, (drops.id IS NOT NULL) AS dropped,
               {_cos_sql("a.v", "c.cv")} AS proto
        FROM a2 a JOIN c2 c USING (cell)
        LEFT JOIN drops ON a.id = drops.id
    ),
    surv AS (
        SELECT id,
               CAST(row_number() OVER (
                   PARTITION BY cell ORDER BY proto DESC, id
               ) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY cell) AS BIGINT) AS n
        FROM f WHERE NOT dropped
    )
    SELECT f.id AS vec_id, f.cell,
           CASE WHEN f.dropped THEN 'semdedup'
                WHEN s.rn * {_D4_DROP_DEN} <= s.n * {_D4_DROP_NUM}
                    THEN 'prototype'
                ELSE 'kept' END AS status,
           round(f.proto, 6) AS proto6
    FROM f LEFT JOIN surv s ON f.id = s.id
    """,
    tags=("dedup", "semantic", "embedding", "d4", "pruning",
          "trained-cells"),
)
def dd_d4_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 (Tirumala et al. 2023), the paper's ACTUAL pipeline end-to-end
    and fully hash-checked: k-means cells (two unrolled Lloyd rounds —
    the oracle replays the training CTEs of knn_kmeans_unrolled), then
    SemDeDup within cells (cosine >= tau, min-id survives), then
    PROTOTYPE PRUNING — drop the quarter of survivors per cell CLOSEST
    to their trained centroid (rn·4 <= n, pure ints).

    TRAINED cells are load-bearing at scale, not a nicety: with
    data-blind hyperplane "centroids" the 10x probe measured occupancy
    sum-of-squares growing 37x (one cell held 62% of the corpus — the
    within-cell pair join goes quadratic); under trained cells max
    occupancy stayed ~constant and Σ|cell|² grew exactly linearly
    (SCALING.md d4 rung). k ∝ N is the knob; the dd_semdedup row keeps
    the given-codebook form for externally-trained centroids."""
    emb = load(spark, sf_dir, "embeddings")
    asg, cents = sim.kmeans_unrolled_state(emb, k=_KM_K, rounds=_KM_ROUNDS)
    # Optimization r14 (guide §2.3 — compute shared subtrees once): the
    # final assignment feeds BOTH pair-join sides AND the prototype
    # scoring, and the k=16 training DAG is deliberately uncached inside
    # the operator — so each reference re-ran the full 2-round Lloyd
    # pipeline (the before-plan replicates the training subtree 4x: 124
    # exchanges). Training arithmetic is exact (DECIMAL centroid sums,
    # min-struct argmin), so cached vs recomputed values are identical;
    # released by the session-level clearCache the registry contract
    # documents.
    asg = asg.persist()
    cents = cents.persist()
    # norms hoisted out of the pair predicate (once per vector, not per
    # pair — bit-equal arithmetic, see similarity.semdedup_flags), and
    # the pair join chunk-fans-out exactly like semdedup_flags: k=16
    # cells would otherwise funnel the Sigma|cell|^2 predicate through a
    # handful of tasks (AQE coalesces the tiny-byte inputs). C derives
    # from defaultParallelism and degenerates to 1 past 2*cores cells;
    # every unordered pair is still generated exactly once, predicate
    # untouched -> identical surviving id set.
    n_parts = spark.sparkContext.defaultParallelism
    chunks = max(1, -(-2 * n_parts // _KM_K))
    a = asg.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        sim._norm(F.col("v")).alias("na"),
        "cell",
        F.pmod(F.xxhash64(F.col("id")), F.lit(chunks)).alias("__chunk"),
    )
    b = asg.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        sim._norm(F.col("v")).alias("nb"),
        "cell",
        F.explode(
            F.sequence(F.lit(0), F.lit(chunks - 1)).cast("array<bigint>")
        ).alias("__chunk"),
    )
    join_keys = ["cell", "__chunk"] if chunks > 1 else ["cell"]
    if chunks > 1:
        a = a.repartition(n_parts, "cell", "__chunk")
        b = b.repartition(n_parts, "cell", "__chunk")
    sim_pairs = (
        a.join(b, join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            sim._dot(F.col("va"), F.col("vb"))
            / (F.col("na") * F.col("nb"))
            >= F.lit(_D4_TAU)
        )
        .select("id_b")
        .distinct()
    )
    proto = (
        asg.join(F.broadcast(cents), "cell")
        .join(
            sim_pairs.withColumnRenamed("id_b", "id").withColumn(
                "__drop", F.lit(True)
            ),
            "id",
            "left",
        )
        .select(
            "id",
            "cell",
            F.coalesce(F.col("__drop"), F.lit(False)).alias("dropped"),
            sim.cosine(F.col("v"), F.col("cv")).alias("proto"),
        )
    )
    wr = Window.partitionBy("cell").orderBy(F.col("proto").desc(), "id")
    wc = Window.partitionBy("cell")
    surv = (
        proto.where(~F.col("dropped"))
        .withColumn("rn", F.row_number().over(wr).cast("bigint"))
        .withColumn("n", F.count("*").over(wc).cast("bigint"))
        .select("id", "rn", "n")
    )
    return proto.join(surv, "id", "left").select(
        F.col("id").alias("vec_id"),
        "cell",
        F.when(F.col("dropped"), F.lit("semdedup"))
        .when(
            F.col("rn") * _D4_DROP_DEN <= F.col("n") * _D4_DROP_NUM,
            F.lit("prototype"),
        )
        .otherwise(F.lit("kept"))
        .alias("status"),
        F.round("proto", 6).alias("proto6"),
    )


# -- SoftDeDup: duplicate reweighting instead of dropping ----------------------


@register(
    "t_soft_dedup_weights",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, md5(text) AS digest,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    g AS (
        SELECT *, CAST(count(*) OVER (PARTITION BY digest) AS BIGINT) AS dup
        FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT digest) AS BIGINT) AS n_unique_texts,
           CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
           CAST(sum((n_tokens * 1048576) // dup) AS BIGINT)
               AS effective_tokens_fx
    FROM g GROUP BY source
    """,
    tags=("dedup", "soft-dedup", "reweighting", "tokens"),
)
def t_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup (He et al. 2024): instead of DROPPING exact duplicates,
    down-weight every copy by 1/|dup group| so the group contributes one
    document's worth of gradient. Per-source ledger: raw vs effective
    token mass (the gap IS the duplication tax). Per-doc weighted tokens
    are fixed-point-quantized IN EXACT INTEGER ARITHMETIC —
    (n_tokens·2^20) div dup, both operands bigint — then bigint-summed:
    no float or decimal rounding exists anywhere on the hash surface
    (r13 post-mortem: round(double,6)→DECIMAL hits an exact 6dp
    midpoint whenever dup is a power of two, where Spark HALF_UP and
    DuckDB half-even legally diverge). effective_tokens_fx is in 2^-20
    token units; Spark `div` and DuckDB `//` both truncate toward zero
    and all values here are non-negative.

    Scale shape: one digest count (window over the dup key — the same
    shuffle the dedup would need anyway) + one per-source rollup; no
    pair join at all."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("digest"),
        F.size(tx.tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    g = d.withColumn(
        "dup", F.count("*").over(Window.partitionBy("digest")).cast("bigint")
    )
    eff = F.expr("(n_tokens * CAST(1048576 AS BIGINT)) div dup")
    return g.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("digest").cast("bigint").alias("n_unique_texts"),
        F.sum("n_tokens").cast("bigint").alias("raw_tokens"),
        F.sum(eff).cast("bigint").alias("effective_tokens_fx"),
    )


# -- Hill tail-index of the token frequency distribution -----------------------

_HILL_K = 50


@register(
    "t_hill_tail_index",
    oracle=f"""
    WITH toks AS (
        SELECT lang, unnest({_TOKS}) AS term FROM documents
    ),
    freq AS (
        SELECT lang, term, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY lang, term
    ),
    ranked AS (
        SELECT lang, c,
               CAST(row_number() OVER (
                   PARTITION BY lang ORDER BY c DESC, term
               ) AS BIGINT) AS r
        FROM freq
        QUALIFY r <= {_HILL_K} + 1
    ),
    kth AS (
        SELECT lang, c AS ck1,
               CAST(r - 1 AS BIGINT) AS k_used
        FROM ranked
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY r DESC) = 1
    ),
    terms AS (
        SELECT r.lang, k.k_used,
               CAST(floor(ln(CAST(r.c AS DOUBLE) / CAST(k.ck1 AS DOUBLE))
                          * 1048576.0) AS BIGINT) AS ln_fx
        FROM ranked r JOIN kth k USING (lang)
        WHERE r.r <= k.k_used
    )
    SELECT lang, CAST(min(k_used) AS BIGINT) AS k_used,
           CAST(sum(ln_fx) // min(k_used) AS BIGINT) AS hill_h_fx,
           CAST((min(k_used) * 1099511627776) // nullif(sum(ln_fx), 0)
                AS BIGINT) AS alpha_fx
    FROM terms
    WHERE k_used >= 1
    GROUP BY lang
    """,
    tags=("text", "statistics", "heavy-tail", "hill"),
)
def t_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill (1975) tail-index per language over the top-k token
    frequencies: H = (1/k) Σ ln(f_i / f_{k+1}), α = 1/H — the standard
    heavy-tail exponent estimator from order statistics alone.
    Complements the Zipf OLS (which fits ALL top ranks): a diverging
    gap between α and the Zipf slope flags a distorted head (template
    spam inflates a few ranks without bending the tail).

    Determinism: ln terms quantize as floor(ln·2^20) bigints then
    bigint-sum (order-free); H and α are single integer divisions of
    that exact sum (values in 2^-20 units; α scales by 2^40 before the
    div so the quotient stays in 2^-20 units). floor on the
    identically-computed IEEE double has no tie-breaking rule — no
    decimal-midpoint exposure (the r13 failure class). The per-language
    rank window partitions by lang over the vocab-sized frequency
    frame — per-group TakeOrdered at scale; k+1 rows per language
    survive."""
    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select("lang", F.explode(tx.tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wr = Window.partitionBy("lang").orderBy(F.col("c").desc(), "term")
    ranked = (
        freq.withColumn("r", F.row_number().over(wr).cast("bigint"))
        .where(F.col("r") <= _HILL_K + 1)
        .select("lang", "c", "r")
    )
    wlast = Window.partitionBy("lang").orderBy(F.col("r").desc())
    kth = (
        ranked.withColumn("rn", F.row_number().over(wlast))
        .where(F.col("rn") == 1)
        .select(
            "lang",
            F.col("c").alias("ck1"),
            (F.col("r") - 1).cast("bigint").alias("k_used"),
        )
    )
    ln_fx = F.floor(
        F.log(F.col("c").cast("double") / F.col("ck1").cast("double"))
        * F.lit(1048576.0)
    ).cast("bigint")
    terms = (
        ranked.join(kth, "lang")
        .where(F.col("r") <= F.col("k_used"))
        .select("lang", "k_used", ln_fx.alias("ln_fx"))
    )
    return (
        terms.where(F.col("k_used") >= 1)
        .groupBy("lang")
        .agg(
            F.min("k_used").cast("bigint").alias("k_used"),
            F.expr("sum(ln_fx) div min(k_used)")
            .cast("bigint")
            .alias("hill_h_fx"),
            F.expr(
                "(min(k_used) * CAST(1099511627776 AS BIGINT))"
                " div nullif(sum(ln_fx), 0)"
            )
            .cast("bigint")
            .alias("alpha_fx"),
        )
    )


# -- CCNet head/middle/tail perplexity buckets ---------------------------------


@register(
    "t_ccnet_buckets",
    oracle=f"""
    WITH {lm.bigram_lm_ctes(_TOKS)},
    scores AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
                           (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS mean_p
        FROM contrib GROUP BY doc_id
    ),
    b AS (
        SELECT s.doc_id, d.lang, s.n_bigrams, s.mean_p,
               CAST(ntile(3) OVER (
                   PARTITION BY d.lang ORDER BY s.mean_p DESC, s.doc_id
               ) AS INTEGER) AS bucket
        FROM scores s JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket_label,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
           min(mean_p) AS min_p,
           max(mean_p) AS max_p
    FROM b GROUP BY lang, bucket
    """,
    tags=("text", "ccnet", "perplexity", "ntile", "grouped-scalable"),
)
def t_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet (Wenzek et al. 2020) quality bucketing: per-language
    head/middle/tail TERCILES of the LM score (higher mean transition
    probability = lower perplexity = head). The per-group exact ntile
    runs through operators/text.grouped_ntile_scalable — range-partition
    on (lang, score), per-(partition, lang) offsets, parallel local
    ranks — NEVER a one-task-per-language window (the straggler a
    Window.partitionBy(lang) would create when one language dominates
    a 100 TB crawl). Per (lang, bucket) rollup with exact counts; the
    min/max score bounds are straight copies of the cross-engine-equal
    fold doubles."""
    docs = load(spark, sf_dir, "documents")
    scores = lm.bigram_lm_scores(docs, "doc_id").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    bucketed = tx.grouped_ntile_scalable(
        scores,
        "lang",
        [F.col("mean_p").desc(), F.col("doc_id")],
        n_buckets=3,
    )
    return bucketed.groupBy(
        "lang",
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
        .alias("bucket_label"),
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("sum_bigrams"),
        F.min("mean_p").alias("min_p"),
        F.max("mean_p").alias("max_p"),
    )


# -- Gopher quality rules --------------------------------------------------------

# Rae et al. 2021 (Gopher), Appendix A filter battery. Thresholds are the
# paper's; every ratio test is an INTEGER cross-multiplication so both
# engines compare exact ints, never floats.
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "t_gopher_rules",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    feats AS (
        SELECT doc_id, source,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(list_reduce(list_prepend(0, list_transform(
                   toks, t -> len(t))), (x, y) -> x + y) AS BIGINT)
                   AS sum_word_len,
               CAST(len(list_filter(toks,
                   t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
                   AS n_alpha_words,
               CAST(len(list_filter(toks,
                   t -> t LIKE '%#%' OR t LIKE '%...%')) AS BIGINT)
                   AS n_symbol_words,
               CAST(len(list_filter(list_transform(toks, t -> lower(t)),
                   t -> t IN {_GOPHER_STOPS!r})) AS BIGINT)
                   AS n_stop_hits
        FROM w
    ),
    flags AS (
        SELECT doc_id, source, n_words,
               (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
                   AS ok_word_count,
               (sum_word_len >= 3 * n_words
                AND sum_word_len <= 10 * n_words) AS ok_mean_word_len,
               (n_symbol_words * 10 <= n_words) AS ok_symbol_ratio,
               (n_alpha_words * 10 >= n_words * 8) AS ok_alpha_words,
               (n_stop_hits >= 2) AS ok_stopwords
        FROM feats
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ok_word_count AND ok_mean_word_len
                          AND ok_symbol_ratio AND ok_alpha_words
                          AND ok_stopwords THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass,
           CAST(sum(CASE WHEN NOT ok_word_count THEN 1 ELSE 0 END)
               AS BIGINT) AS fail_word_count,
           CAST(sum(CASE WHEN NOT ok_mean_word_len THEN 1 ELSE 0 END)
               AS BIGINT) AS fail_mean_word_len,
           CAST(sum(CASE WHEN NOT ok_symbol_ratio THEN 1 ELSE 0 END)
               AS BIGINT) AS fail_symbol_ratio,
           CAST(sum(CASE WHEN NOT ok_alpha_words THEN 1 ELSE 0 END)
               AS BIGINT) AS fail_alpha_words,
           CAST(sum(CASE WHEN NOT ok_stopwords THEN 1 ELSE 0 END)
               AS BIGINT) AS fail_stopwords
    FROM flags GROUP BY source
    """,
    tags=("text", "quality", "gopher", "rules"),
)
def t_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher (Rae et al. 2021) repetition-free quality rule battery,
    per-source attrition ledger: word-count bounds, mean word length in
    [3, 10], symbol-to-word ratio <= 0.1 (# / ellipsis), >= 80% words
    with an alphabetic character, >= 2 canonical stopwords. Every ratio
    is an integer cross-multiplication (sum_word_len >= 3*n_words, not
    a float mean) — no float ever crosses the engine boundary.

    Scale shape: a pure map over docs (one tokens() projection, array
    lambdas) + one per-source rollup; no UDF, no shuffle beyond the
    final groupBy."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = docs.select(
        "doc_id", "source", tx.tokens(F.col("text")).alias("toks")
    )
    n_words = F.size("toks").cast("bigint")
    sum_word_len = F.aggregate(
        F.transform("toks", F.length), F.lit(0), lambda a, x: a + x
    ).cast("bigint")
    n_alpha = F.size(
        F.filter("toks", lambda t: t.rlike("[A-Za-z]"))
    ).cast("bigint")
    n_symbol = F.size(
        F.filter(
            "toks", lambda t: t.contains("#") | t.contains("...")
        )
    ).cast("bigint")
    n_stop = F.size(
        F.filter(
            F.transform("toks", F.lower),
            lambda t: t.isin(*_GOPHER_STOPS),
        )
    ).cast("bigint")
    flags = toks.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        n_words.between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS).alias(
            "ok_word_count"
        ),
        (
            (sum_word_len >= 3 * n_words) & (sum_word_len <= 10 * n_words)
        ).alias("ok_mean_word_len"),
        (n_symbol * 10 <= n_words).alias("ok_symbol_ratio"),
        (n_alpha * 10 >= n_words * 8).alias("ok_alpha_words"),
        (n_stop >= 2).alias("ok_stopwords"),
    )
    ok_all = (
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords")
    )

    def _fails(c: str) -> F.Column:
        return F.sum((~F.col(c)).cast("int")).cast("bigint")

    return flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(ok_all.cast("int")).cast("bigint").alias("n_pass"),
        _fails("ok_word_count").alias("fail_word_count"),
        _fails("ok_mean_word_len").alias("fail_mean_word_len"),
        _fails("ok_symbol_ratio").alias("fail_symbol_ratio"),
        _fails("ok_alpha_words").alias("fail_alpha_words"),
        _fails("ok_stopwords").alias("fail_stopwords"),
    )


# -- Character-entropy quality signal --------------------------------------------


@register(
    "t_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(text) + 1),
                                     i -> text[i])) AS ch
        FROM documents
    ),
    counts AS (
        SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        FROM chars GROUP BY doc_id, ch
    ),
    tot AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS distinct_chars
        FROM counts GROUP BY doc_id
    ),
    terms AS (
        SELECT c.doc_id,
               CAST(floor(-(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                          * ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                          * 1073741824.0) AS BIGINT) AS term_fx
        FROM counts c JOIN tot t USING (doc_id)
    )
    SELECT t.doc_id, t.n AS n_chars, t.distinct_chars,
           CAST(sum(s.term_fx) AS BIGINT) AS entropy_fx
    FROM tot t JOIN terms s ON t.doc_id = s.doc_id
    GROUP BY t.doc_id, t.n, t.distinct_chars
    """,
    tags=("text", "quality", "entropy"),
)
def t_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap spam /
    binary-junk / keyboard-mash detector (low entropy = repeated
    characters, high entropy near log(alphabet) = random bytes). Terms
    -p·ln(p) quantize as floor(x·2^30) bigints then bigint-sum
    (order-free; floor has no tie-breaking — no decimal-midpoint
    exposure, the r13 failure class); entropy_fx is in 2^-30 nats.

    Scale shape: one char explode (output size = corpus chars — the
    same cost as any tokenize), one (doc, char) count with map-side
    combine, one per-doc rollup. No UDF."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # fan the char explode across all cores (doc_shingles device; r14)
    chars = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text")),
                lambda i: F.col("text").substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("distinct_chars"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term_fx = F.floor(-p * F.log(p) * F.lit(1073741824.0)).cast("bigint")
    terms = counts.join(tot, "doc_id").select(
        "doc_id", term_fx.alias("term_fx")
    )
    return (
        tot.join(
            terms.groupBy("doc_id").agg(
                F.sum("term_fx").cast("bigint").alias("s")
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            F.col("n").alias("n_chars"),
            "distinct_chars",
            F.col("s").alias("entropy_fx"),
        )
    )


# -- B-cubed extrinsic cluster-quality audit --------------------------------------

_B3_TAU = 0.5
_B3_MAX_DF = 50


def _bcubed_oracle_sql() -> str:
    # round4 precedes round14 in the package import order, so the banded
    # minhash CTE builder is importable at module load
    from burst_db_spark.queries.round4 import _minhash_pair_ctes
    from burst_db_spark.queries.textops import _SHINGLES_CTE

    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_minhash_pair_ctes(None, _B3_TAU)},
    shg AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, shingle,
                   count(*) OVER (PARTITION BY shingle) AS df
            FROM sh
        ) WHERE df <= {_B3_MAX_DF}
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
              FROM shg GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS common
        FROM shg a JOIN shg b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    gold_pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE common / (sa.n_sh + sb.n_sh - common) >= {_B3_TAU}
    ),
    pe AS (SELECT id_a AS src, id_b AS dst FROM lsh_pairs
           UNION SELECT id_b, id_a FROM lsh_pairs),
    ge AS (SELECT id_a AS src, id_b AS dst FROM gold_pairs
           UNION SELECT id_b, id_a FROM gold_pairs),
    preach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM preach r JOIN pe e ON r.dst = e.src
    ),
    greach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.dst FROM greach r JOIN ge e ON r.dst = e.src
    ),
    plabels AS (SELECT src AS doc_id, min(dst) AS pred_id
                FROM preach GROUP BY src),
    glabels AS (SELECT src AS doc_id, min(dst) AS gold_id
                FROM greach GROUP BY src),
    jj AS (SELECT p.doc_id, p.pred_id, g.gold_id
           FROM plabels p JOIN glabels g USING (doc_id)),
    cells AS (
        SELECT pred_id, gold_id, CAST(count(*) AS BIGINT) AS cnt
        FROM jj GROUP BY pred_id, gold_id
    ),
    sp AS (SELECT pred_id, sum(cnt) AS size_p FROM cells GROUP BY pred_id),
    sg AS (SELECT gold_id, sum(cnt) AS size_g FROM cells GROUP BY gold_id),
    terms AS (
        SELECT
            CAST((cnt * cnt * 1073741824) // size_p AS BIGINT) AS p_fx,
            CAST((cnt * cnt * 1073741824) // size_g AS BIGINT) AS r_fx
        FROM cells JOIN sp USING (pred_id) JOIN sg USING (gold_id)
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT pred_id) AS BIGINT) AS n_pred_clusters,
               CAST(count(DISTINCT gold_id) AS BIGINT) AS n_gold_clusters
        FROM jj
    ),
    sums AS (
        SELECT CAST(sum(p_fx) AS BIGINT) AS ps,
               CAST(sum(r_fx) AS BIGINT) AS rs
        FROM terms
    ),
    means AS (
        SELECT n_docs, n_pred_clusters, n_gold_clusters,
               CAST(ps // n_docs AS BIGINT) AS precision_fx,
               CAST(rs // n_docs AS BIGINT) AS recall_fx
        FROM tot CROSS JOIN sums
    )
    SELECT n_docs, n_pred_clusters, n_gold_clusters,
           precision_fx, recall_fx,
           CAST((2 * precision_fx * recall_fx)
                // nullif(precision_fx + recall_fx, 0) AS BIGINT) AS f1_fx
    FROM means
    """


@register(
    "dd_cluster_bcubed_audit",
    oracle=_bcubed_oracle_sql(),
    tags=("dedup", "audit", "bcubed", "cluster-quality"),
)
def dd_cluster_bcubed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) of the
    PRODUCTION MinHash-LSH dedup clusters against the exact-Jaccard gold
    clusters at the same threshold — CLUSTER-level quality where
    dd_lsh_quality_audit measures PAIR-level recall: B³ penalizes
    over-merging (precision) and over-splitting (recall) per document,
    so a single bridged mega-cluster shows up here even when pair recall
    looks fine.

    Per doc d: P(d) = |C(d) ∩ L(d)| / |C(d)|, R(d) = same / |L(d)|;
    reported as corpus means. Computed cell-wise: Σ cnt²/|C| over the
    (pred, gold) contingency cells — each term the EXACT integer
    (cnt²·2^30) div size, bigint-summed (order-free), means and F1 by
    integer cross-multiplication: no float or decimal rounding on the
    hash surface at all (r13 failure class). *_fx values are in 2^-30
    units; exactness bound: cnt ≤ ~2.9e6 keeps cnt²·2^30 inside
    int64 — far above any verification SF (audits at 100 TB run on
    cluster samples).

    Scale shape: two pair joins (banded LSH + df-guarded exact), two
    min-label CCs, one contingency groupBy — every stage is the
    already-rung-measured machinery; the contingency table is
    cluster-count-sized."""
    docs = load(spark, sf_dir, "documents")
    # Optimization r14 (guide §2.3 + §2.6): the LSH and gold pipelines
    # both shingle the same corpus — materialize ONE shared shingle
    # frame first, then run the two independent pair+CC pipelines (each
    # eager: connected_components counts/collects its edge list at
    # build time) in two driver threads so their jobs overlap instead
    # of serializing ~5 s of per-job latency. Each pipeline's output is
    # deterministic and independent of scheduling, so the labels — and
    # the query result — are identical to the sequential form.
    from concurrent.futures import ThreadPoolExecutor

    sh = dd.doc_shingles(docs, "doc_id").persist()
    sh.count()

    def _pred() -> DataFrame:
        lsh_pairs = dd.minhash_lsh_dedup(
            docs, "doc_id", threshold=_B3_TAU, shingles=sh
        )
        out = dd.connected_components(
            lsh_pairs.select("id_a", "id_b"), docs, "doc_id"
        ).select("doc_id", F.col("cluster_id").alias("pred_id"))
        dd.release_dedup(lsh_pairs)
        return out

    def _gold() -> DataFrame:
        gold_pairs = dd.ngram_jaccard_pairs(
            docs, "doc_id", threshold=_B3_TAU, max_df=_B3_MAX_DF, shingles=sh
        )
        out = dd.connected_components(
            gold_pairs.select("id_a", "id_b"), docs, "doc_id"
        ).select("doc_id", F.col("cluster_id").alias("gold_id"))
        dd.release_dedup(gold_pairs)
        return out

    with ThreadPoolExecutor(max_workers=2) as pool:
        fp, fg = pool.submit(_pred), pool.submit(_gold)
        pred, gold = fp.result(), fg.result()
    sh.unpersist()
    j = pred.join(gold, "doc_id")
    cells = j.groupBy("pred_id", "gold_id").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    sp = cells.groupBy("pred_id").agg(F.sum("cnt").alias("size_p"))
    sg = cells.groupBy("gold_id").agg(F.sum("cnt").alias("size_g"))
    terms = (
        cells.join(sp, "pred_id")
        .join(sg, "gold_id")
        .select(
            F.expr(
                "(cnt * cnt * CAST(1073741824 AS BIGINT)) div size_p"
            ).alias("p_fx"),
            F.expr(
                "(cnt * cnt * CAST(1073741824 AS BIGINT)) div size_g"
            ).alias("r_fx"),
        )
    )
    tot = j.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("pred_id").cast("bigint").alias("n_pred_clusters"),
        F.countDistinct("gold_id").cast("bigint").alias("n_gold_clusters"),
    )
    sums = terms.agg(
        F.sum("p_fx").cast("bigint").alias("ps"),
        F.sum("r_fx").cast("bigint").alias("rs"),
    )
    out = tot.join(sums)
    return out.select(
        "n_docs",
        "n_pred_clusters",
        "n_gold_clusters",
        F.expr("ps div n_docs").cast("bigint").alias("precision_fx"),
        F.expr("rs div n_docs").cast("bigint").alias("recall_fx"),
    ).withColumn(
        "f1_fx",
        F.expr(
            "(2 * precision_fx * recall_fx)"
            " div nullif(precision_fx + recall_fx, 0)"
        ).cast("bigint"),
    )


# -- Exact weighted median per group ---------------------------------------------


@register(
    "a46_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               CAST(l_quantity AS BIGINT) AS wt, l_orderkey, l_linenumber
        FROM lineitem
    ),
    c AS (
        SELECT flag, v, wt,
               sum(wt) OVER (PARTITION BY flag
                             ORDER BY v, l_orderkey, l_linenumber
                             ROWS UNBOUNDED PRECEDING) AS cum,
               sum(wt) OVER (PARTITION BY flag) AS tot
        FROM w
    )
    SELECT flag,
           CAST(min(tot) AS BIGINT) AS total_weight,
           min(CASE WHEN 2 * cum >= tot THEN v END) AS weighted_median
    FROM c GROUP BY flag
    """,
    tags=("aggregate", "weighted-median", "robust-statistics"),
)
def a46_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per group: the smallest value whose
    cumulative weight reaches half the group total (2·cum >= tot — pure
    integer compare, no float quantile interpolation). The robust
    location statistic quality pipelines prefer over the mean when a
    few giant documents would dominate.

    Scale shape: one cumulative-sum window over the group's value order
    (a per-group sort — the same cost as any exact quantile; the
    sketch family a19/a35 covers the approximate path at 100 TB)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    wc = Window.partitionBy("flag").orderBy("v", "l_orderkey", "l_linenumber")
    wt = Window.partitionBy("flag")
    c = li.withColumn(
        "cum", F.sum("wt").over(wc.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("wt").over(wt))
    return c.groupBy("flag").agg(
        F.min("tot").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("v"))).alias(
            "weighted_median"
        ),
    )


# -- CUSUM drift detector (Page 1954) --------------------------------------------

_CUSUM_BASE_DAYS = 7


@register(
    "w21_cusum_drift",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS sum_base
        FROM (
            SELECT event_type, n,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        ) WHERE rn <= {_CUSUM_BASE_DAYS}
        GROUP BY event_type
    ),
    dev AS (
        SELECT d.event_type, d.day,
               {_CUSUM_BASE_DAYS} * d.n - b.sum_base AS x
        FROM daily d JOIN base b USING (event_type)
    ),
    psum AS (
        SELECT event_type, day,
               sum(x) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS p
        FROM dev
    ),
    pref AS (
        SELECT event_type, day, p,
               LEAST(0, min(p) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS UNBOUNDED PRECEDING)) AS runmin
        FROM psum
    ),
    base2 AS (SELECT event_type, sum_base FROM base)
    SELECT p.event_type, p.day,
           CAST(p.p - p.runmin AS BIGINT) AS cusum_scaled,
           (p.p - p.runmin) > 2 * b.sum_base AS drift_flag
    FROM pref p JOIN base2 b USING (event_type)
    """,
    tags=("window", "cusum", "drift", "changepoint"),
)
def w21_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector (Page 1954) on per-type daily
    counts, ALL-INTEGER: deviations are scaled by the baseline window
    length (x_t = 7·n_t − Σ first-7-days) so no division ever happens,
    and the sequential recursion S_t = max(0, S_{t-1} + x_t) is
    computed by the prefix-sum identity S_t = P_t − min(0, min_{j≤t}
    P_j) — two stacked windows instead of an un-parallelizable scan.
    Flags when the cumulated positive drift exceeds 2 baseline-weeks.
    Complements w20's two-window mean-shift: CUSUM accumulates SMALL
    persistent shifts the flank comparison misses."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    wd = Window.partitionBy("event_type").orderBy("day")
    base = (
        daily.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") <= _CUSUM_BASE_DAYS)
        .groupBy("event_type")
        .agg(F.sum("n").cast("bigint").alias("sum_base"))
    )
    dev = daily.join(F.broadcast(base), "event_type").withColumn(
        "x", _CUSUM_BASE_DAYS * F.col("n") - F.col("sum_base")
    )
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    pref = dev.withColumn("p", F.sum("x").over(wcum)).withColumn(
        "runmin", F.least(F.lit(0), F.min("p").over(wcum))
    )
    return pref.select(
        "event_type",
        "day",
        (F.col("p") - F.col("runmin")).cast("bigint").alias("cusum_scaled"),
        ((F.col("p") - F.col("runmin")) > 2 * F.col("sum_base")).alias(
            "drift_flag"
        ),
    )


# -- Gini concentration of the token distribution ---------------------------------


@register(
    "t_token_gini",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS}) AS term FROM documents
    ),
    freq AS (
        SELECT source, term, CAST(count(*) AS BIGINT) AS f
        FROM toks GROUP BY source, term
    ),
    ranked AS (
        SELECT source, f,
               CAST(row_number() OVER (PARTITION BY source
                                       ORDER BY f, term) AS BIGINT) AS i,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n,
               CAST(sum(f) OVER (PARTITION BY source) AS BIGINT) AS tot
        FROM freq
    )
    SELECT source,
           CAST(min(n) AS BIGINT) AS vocab,
           CAST(min(tot) AS BIGINT) AS n_tokens,
           CAST(sum((2 * i - n - 1) * f) AS BIGINT) AS gini_num,
           CAST(min(n) * min(tot) AS BIGINT) AS gini_den,
           round(CAST(sum((2 * i - n - 1) * f) AS DOUBLE)
                 / CAST(min(n) * min(tot) AS DOUBLE), 6) AS gini6
    FROM ranked GROUP BY source
    """,
    tags=("text", "statistics", "gini", "concentration"),
)
def t_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the token-frequency distribution per source —
    the concentration complement to the Rényi/Zipf diagnostics (G near 1
    = a few terms dominate = template spam; G near 0 = uniform). The
    numerator Σ(2i−n−1)·f over ascending-frequency ranks is EXACT
    BIGINT arithmetic; only the final ratio is a single rounded
    division, so the row hash-checks without any fold-order care."""
    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select("source", F.explode(tx.tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    wr = Window.partitionBy("source").orderBy("f", "term")
    ws = Window.partitionBy("source")
    ranked = (
        freq.withColumn("i", F.row_number().over(wr).cast("bigint"))
        .withColumn("n", F.count("*").over(ws).cast("bigint"))
        .withColumn("tot", F.sum("f").over(ws).cast("bigint"))
    )
    num = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("f")).cast("bigint")
    return ranked.groupBy("source").agg(
        F.min("n").cast("bigint").alias("vocab"),
        F.min("tot").cast("bigint").alias("n_tokens"),
        num.alias("gini_num"),
        (F.min("n") * F.min("tot")).cast("bigint").alias("gini_den"),
        F.round(
            num.cast("double") / (F.min("n") * F.min("tot")).cast("double"), 6
        ).alias("gini6"),
    )


# -- Space-filling-curve layout quality: Hilbert vs Morton -------------------------

_SFC_BITS = 8  # 256x256 grid -> 16-bit codes
# probe bbox in GRID coordinates (a 64 x 100 rectangle chosen off the
# power-of-two lattice, where curve locality differences actually show)
_SFC_GX0, _SFC_GX1, _SFC_GY0, _SFC_GY1 = 10, 73, 100, 199


def _sfc_oracle_sql() -> str:
    from burst_db_spark.operators.hilbert import hilbert_sql_query
    from burst_db_spark.operators.zorder import morton_sql

    cells = """
        SELECT CAST(i // 256 AS BIGINT) AS gx, CAST(i % 256 AS BIGINT) AS gy
        FROM range(0, 65536) t(i)
    """
    hq = hilbert_sql_query(cells, "gx", "gy", ["gx", "gy"], bits=_SFC_BITS)
    return f"""
    WITH coded AS (
        SELECT gx, gy, hcode,
               {morton_sql("gx", "gy", _SFC_BITS)} AS mcode
        FROM ({hq})
    ),
    sel AS (
        SELECT * FROM coded
        WHERE gx BETWEEN {_SFC_GX0} AND {_SFC_GX1}
          AND gy BETWEEN {_SFC_GY0} AND {_SFC_GY1}
    ),
    h AS (
        SELECT 'hilbert' AS curve,
               CAST(count(*) AS BIGINT) AS n_in_bbox,
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM sel p WHERE p.hcode = sel.hcode - 1
               ) THEN 1 ELSE 0 END) AS BIGINT) AS code_runs,
               CAST(max(hcode) - min(hcode) AS BIGINT) AS code_span
        FROM sel
    ),
    m AS (
        SELECT 'morton' AS curve,
               CAST(count(*) AS BIGINT) AS n_in_bbox,
               CAST(sum(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM sel p WHERE p.mcode = sel.mcode - 1
               ) THEN 1 ELSE 0 END) AS BIGINT) AS code_runs,
               CAST(max(mcode) - min(mcode) AS BIGINT) AS code_span
        FROM sel
    )
    SELECT * FROM h UNION ALL SELECT * FROM m
    """


@register(
    "o7_hilbert_layout",
    oracle=_sfc_oracle_sql(),
    tags=("layout", "hilbert", "zorder", "space-filling-curve"),
)
def o7_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-filling-curve LAYOUT quality, measured head-to-head: code
    every cell of a 256x256 grid under BOTH curves (Hilbert via
    operators/hilbert — per-level projected columns, linear plan size;
    Morton via operators/zorder), take a bbox query, and report per
    curve the number of CONTIGUOUS CODE RUNS its rows occupy — the
    number of range scans (seeks) a curve-sorted table needs for that
    query — plus the code span. Runs are counted RELATIONALLY: a run
    starts at every code whose predecessor (code-1) is outside the
    selection — one self anti-join on an integer key, no sort, no
    window. Hilbert has no Morton seams, so it needs ~2x fewer runs on
    the probe bbox (47 vs 109) at ~0.6x the span: that ratio IS the
    row-group pruning advantage an OPTIMIZE-style curve sort buys at
    100 TB. All-integer end to end; both curve codes hash-check."""
    from burst_db_spark.operators.hilbert import with_hilbert_code
    from burst_db_spark.operators.zorder import morton_code

    grid = spark.range(0, 65536).select(
        (F.col("id") / 256).cast("bigint").alias("gx"),
        (F.col("id") % 256).cast("bigint").alias("gy"),
    )
    coded = with_hilbert_code(
        grid, F.col("gx"), F.col("gy"), _SFC_BITS, out="hcode"
    ).withColumn("mcode", morton_code(F.col("gx"), F.col("gy"), _SFC_BITS))
    sel = coded.where(
        F.col("gx").between(_SFC_GX0, _SFC_GX1)
        & F.col("gy").between(_SFC_GY0, _SFC_GY1)
    ).persist()

    def stats(code: str, label: str) -> DataFrame:
        pred = sel.select((F.col(code) + 1).alias(code))
        starts = sel.join(pred, code, "left_anti")
        agg = sel.agg(
            F.count("*").cast("bigint").alias("n_in_bbox"),
            (F.max(code) - F.min(code)).cast("bigint").alias("code_span"),
        )
        runs = starts.agg(F.count("*").cast("bigint").alias("code_runs"))
        return agg.join(runs).select(
            F.lit(label).alias("curve"), "n_in_bbox", "code_runs", "code_span"
        )

    return stats("hcode", "hilbert").unionByName(stats("mcode", "morton"))


# -- Streaming CUSUM: state maintenance + the w21 detector ------------------------


@register(
    "stream_cusum",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS sum_base
        FROM (
            SELECT event_type, n,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        ) WHERE rn <= {_CUSUM_BASE_DAYS}
        GROUP BY event_type
    ),
    dev AS (
        SELECT d.event_type, d.day,
               {_CUSUM_BASE_DAYS} * d.n - b.sum_base AS x
        FROM daily d JOIN base b USING (event_type)
    ),
    psum AS (
        SELECT event_type, day,
               sum(x) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS p
        FROM dev
    ),
    pref AS (
        SELECT event_type, day, p,
               LEAST(0, min(p) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS UNBOUNDED PRECEDING)) AS runmin
        FROM psum
    ),
    base2 AS (SELECT event_type, sum_base FROM base)
    SELECT p.event_type, p.day,
           CAST(p.p - p.runmin AS BIGINT) AS cusum_scaled,
           (p.p - p.runmin) > 2 * b.sum_base AS drift_flag
    FROM pref p JOIN base2 b USING (event_type)
    """,
    tags=("streaming", "cusum", "drift", "oracle-checked"),
)
def stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-on CUSUM drift monitoring: Structured Streaming maintains
    the per-type DAILY COUNT state (tumbling 1-day windows, complete
    mode, availableNow drain) and the w21 detector — the prefix-sum
    identity over ALL-INTEGER scaled deviations — runs over the
    maintained snapshot. Same state-maintenance/detector split as
    stream_mean_shift (the detector's running min needs the full
    ordered series, so it reads the snapshot); the CUSUM accumulates
    SMALL persistent shifts the flank comparison misses, so the two
    monitors are complements on the same maintained state. Must equal
    w21_cusum_drift's oracle exactly — streamed counts are integers,
    stream task order cannot perturb anything."""
    import tempfile
    import uuid

    from burst_db_spark.streaming import incremental as st

    src = load(spark, sf_dir, "events").select("event_type", "ts")
    tmp = tempfile.mkdtemp(prefix="bds_stream_cusum_")
    data_dir = f"{tmp}/in"
    src.write.parquet(data_dir)
    stream = st.file_stream(spark, data_dir, src.schema)
    agg = (
        stream.groupBy(F.window(F.col("ts"), "1 day"), F.col("event_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "event_type",
            F.to_date(F.col("window.start")).alias("day"),
            "n",
        )
    )
    name = f"cusum_{uuid.uuid4().hex[:8]}"
    # r15 (guide §2.2/§5): data-derived state partitions for the drain.
    from burst_db_spark.streaming import drain_shuffle

    with drain_shuffle(spark, data_dir):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    daily = spark.table(name)

    wd = Window.partitionBy("event_type").orderBy("day")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    # baseline over the SAME frame (no second scan of the memory table)
    base = F.sum(
        F.when(F.row_number().over(wd) <= _CUSUM_BASE_DAYS, F.col("n"))
    ).over(
        Window.partitionBy("event_type").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    ).cast("bigint")
    dev = daily.withColumn("sum_base", base).withColumn(
        "x", _CUSUM_BASE_DAYS * F.col("n") - F.col("sum_base")
    )
    pref = dev.withColumn("p", F.sum("x").over(wcum)).withColumn(
        "runmin", F.least(F.lit(0), F.min("p").over(wcum))
    )
    return pref.select(
        "event_type",
        "day",
        (F.col("p") - F.col("runmin")).cast("bigint").alias("cusum_scaled"),
        ((F.col("p") - F.col("runmin")) > 2 * F.col("sum_base")).alias(
            "drift_flag"
        ),
    )
