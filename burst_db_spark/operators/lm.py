"""Corpus-trained bigram language-model scoring — the CCNet-style
"perplexity bucket" quality signal, re-expressed relationally.

Train and score are ONE pass each over the corpus:
- train: explode adjacent token pairs → two groupBy counts (unigram,
  bigram). At 100 TB the model tables are corpus-distinct-sized (word
  types, not tokens) and shuffle on their own keys; partial aggregation
  does the heavy lifting map-side.
- score: re-derive each doc's bigrams with positions, equi-join the two
  count tables (broadcast when the vocabulary is small, shuffle join when
  not), and fold the per-bigram probabilities per doc.

Cross-engine determinism (the DuckDB oracle): add-one-smoothed
``P(w2|w1) = (c12 + 1) / (c1 + V)`` is a single double division of
integers — bit-exact in both engines. The per-doc mean folds the
probabilities in POSITION order (``F.aggregate`` over an array ordered by
position ≡ DuckDB ``list_reduce(list(p ORDER BY pos))``), so float
addition order is pinned and the mean is bit-identical, not merely close.

We score mean transition probability rather than log-perplexity: ``ln``
differs in the last ulp between JVM and libm, while the mean is
rank-equivalent for same-length filtering buckets and exactly portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from burst_db_spark.operators.text import tokens


def doc_bigrams(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, pos, w1, w2) for every adjacent token pair; docs with < 2
    tokens contribute no rows. pos is 1-based.

    The token array is materialized as a projected column BEFORE the
    transform: referencing the raw ``tokens(text)`` expression inside the
    lambda makes codegen re-evaluate the regex split per ``F.get`` — 2-3
    splits per n-gram, measured ~9× slower at sf0.1."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    t = F.col("__toks")
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.struct(
                (i + 1).cast("int").alias("pos"),
                F.get(t, i).alias("w1"),
                F.get(t, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,w1:string,w2:string>>"))
    return (
        base.select(F.col(id_col), F.explode(pairs).alias("bg"))
        .select(id_col, "bg.pos", "bg.w1", "bg.w2")
    )


def train_bigram_lm(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(unigram counts, bigram counts, 1-row vocab size) from the corpus."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count("*").cast("bigint").alias("c1"))
    bg = doc_bigrams(df, id_col, text_col)
    bi = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c12"))
    vocab = uni.agg(F.count("*").cast("bigint").alias("v"))
    return uni, bi, vocab


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-doc mean add-one-smoothed transition probability.

    Output: (id, n_bigrams, mean_p) for every doc with >= 1 bigram —
    a deterministic row set (no float threshold in the row predicate).
    """
    uni, bi, vocab = train_bigram_lm(df, id_col, text_col)
    bg = doc_bigrams(df, id_col, text_col)
    joined = (
        bg.join(bi, ["w1", "w2"])  # every (w1,w2) of a doc exists in the model
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .join(F.broadcast(vocab))
    )
    p = (F.col("c12") + F.lit(1)).cast("double") / (
        (F.col("c1") + F.col("v")).cast("double")
    )
    contrib = joined.select(F.col(id_col), F.col("pos"), p.alias("p"))
    return (
        contrib.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.array_sort(F.collect_list(F.struct("pos", "p"))).alias("__c"),
        )
        .select(
            id_col,
            "n_bigrams",
            (
                F.aggregate("__c", F.lit(0.0), lambda acc, x: acc + x["p"])
                / F.col("n_bigrams").cast("double")
            ).alias("mean_p"),
        )
    )


def doc_trigrams(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, pos, w1, w2, w3) for every adjacent token triple; pos 1-based.
    Token array materialized first — see :func:`doc_bigrams`."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    t = F.col("__toks")
    triples = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.struct(
                (i + 1).cast("int").alias("pos"),
                F.get(t, i).alias("w1"),
                F.get(t, i + 1).alias("w2"),
                F.get(t, i + 2).alias("w3"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<pos:int,w1:string,w2:string,w3:string>>")
    )
    return (
        base.select(F.col(id_col), F.explode(triples).alias("tg"))
        .select(id_col, "tg.pos", "tg.w1", "tg.w2", "tg.w3")
    )


def trigram_backoff_scores(
    train: DataFrame,
    score: DataFrame,
    id_col: str,
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Held-out trigram scoring with stupid backoff (Brants et al. 2007):

        p(w3|w1,w2) = c123/c12              if the trigram is in the model
                    = α · c23/c2            else if the (w2,w3) bigram is
                    = α² · c3/N             else (unigram; 0 if unseen)

    All model tables come from ``train`` only, so scoring ``score`` docs
    genuinely exercises every backoff level. Counts are exact integers;
    each probability is one double division (+ a constant multiply), and
    the per-doc mean folds in POSITION order — bit-identical across
    engines, same as :func:`bigram_lm_scores`. No logs on purpose: ``ln``
    drifts in the last ulp between JVM and libm (module docstring).

    Scale shape: three groupBy counts over the train corpus (model-sized
    outputs), then the score side equi-joins the model tables — broadcast
    when the vocabulary is small, shuffled hash join when it isn't. No
    driver state, no UDFs.

    Output: (id, n_trigrams, n_tri_hits, n_bigram_backoffs, mean_p).
    """
    tg_train = doc_trigrams(train, id_col, text_col)
    tri = tg_train.groupBy("w1", "w2", "w3").agg(
        F.count("*").cast("bigint").alias("c123")
    )
    bg_train = doc_bigrams(train, id_col, text_col)
    bi = bg_train.groupBy("w1", "w2").agg(
        F.count("*").cast("bigint").alias("c12")
    )
    toks = train.select(F.explode(tokens(F.col(text_col))).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").cast("bigint").alias("c3"))
    total = toks.agg(F.count("*").cast("bigint").alias("n_tok"))

    tg = doc_trigrams(score, id_col, text_col)
    joined = (
        tg.join(tri, ["w1", "w2", "w3"], "left")
        .join(bi, ["w1", "w2"], "left")
        .join(
            bi.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                F.col("c12").alias("c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(uni.select(F.col("w").alias("w3"), "c3"), "w3", "left")
        .join(F.broadcast(total))
    )
    a = F.lit(alpha)
    p = (
        F.when(
            F.col("c123").isNotNull(),
            F.col("c123").cast("double") / F.col("c12").cast("double"),
        )
        .when(
            F.col("c23").isNotNull(),
            a * F.col("c23").cast("double") / F.col("c2").cast("double"),
        )
        .otherwise(
            a * a * F.coalesce(F.col("c3"), F.lit(0)).cast("double")
            / F.col("n_tok").cast("double")
        )
    )
    # c2 = train unigram count of w2 (the backoff context)
    joined = joined.join(
        uni.select(F.col("w").alias("w2"), F.col("c3").alias("c2")), "w2", "left"
    )
    contrib = joined.select(
        F.col(id_col),
        F.col("pos"),
        p.alias("p"),
        F.col("c123").isNotNull().alias("tri_hit"),
        (F.col("c123").isNull() & F.col("c23").isNotNull()).alias("bi_backoff"),
    )
    return (
        contrib.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            F.sum(F.col("tri_hit").cast("int")).cast("bigint").alias("n_tri_hits"),
            F.sum(F.col("bi_backoff").cast("int")).cast("bigint").alias(
                "n_bigram_backoffs"
            ),
            F.array_sort(F.collect_list(F.struct("pos", "p"))).alias("__c"),
        )
        .select(
            id_col,
            "n_trigrams",
            "n_tri_hits",
            "n_bigram_backoffs",
            (
                F.aggregate("__c", F.lit(0.0), lambda acc, x: acc + x["p"])
                / F.col("n_trigrams").cast("double")
            ).alias("mean_p"),
        )
    )


def bigram_lm_ctes(toks_expr: str) -> str:
    """The CTE chain of :func:`bigram_lm_oracle_sql` up to ``contrib``
    (no WITH keyword, no trailing comma) — composable into larger
    oracles (t_ccnet_buckets builds per-language buckets on top)."""
    return f"""toks AS (
        SELECT doc_id, unnest({toks_expr}) AS w FROM documents
    ),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM toks GROUP BY w),
    vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
    t AS (SELECT doc_id, {toks_expr} AS t FROM documents),
    bg AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               t[i] AS w1, t[i + 1] AS w2
        FROM t, unnest(range(1, len(t))) AS r(i)
        WHERE len(t) >= 2
    ),
    bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM bg GROUP BY w1, w2),
    contrib AS (
        SELECT bg.doc_id, bg.pos,
               CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE) AS p
        FROM bg JOIN bi USING (w1, w2)
        JOIN uni ON bg.w1 = uni.w
        CROSS JOIN vocab
    )"""


def bigram_lm_oracle_sql(toks_expr: str) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` — same smoothing, same
    position-ordered fold, same final division."""
    return f"""
    WITH {bigram_lm_ctes(toks_expr)}
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
                       (x, y) -> x + y)
               / CAST(count(*) AS DOUBLE) AS mean_p
    FROM contrib GROUP BY doc_id
    """


