"""Text-retrieval operators: inverted index build and BM25 scoring.

A corpus-scale search layer over the ``documents`` table — the retrieval
side of a training-data pipeline (dedup against a query set, quality probes,
contamination search all reduce to "score docs against terms").

Scale shape: everything is explode → hash-partitioned groupBy — the same
one-shuffle-per-aggregation pattern as TF-IDF. Postings lists are built
per-term (the natural parallel unit of an inverted index: a term's posting
list lives in one reducer); BM25 scoring filters tokens to the query's
terms BEFORE the shuffle, so a k-term query moves only matching tokens.

Determinism across engines (the DuckDB oracle gate):
- idf uses the *rational* Robertson form ``(N - df + 0.5)/(df + 0.5) + 1``
  (no log: libm vs JVM log differs in the last ulp) — rank-equivalent to
  the log form per term since ``ln`` is monotone.
- per-doc scores are summed in *term order* via an ordered-list fold
  (``F.aggregate(array_sort(...))`` / DuckDB ``list_reduce(list_prepend(
  0.0, list(... ORDER BY term)))``) so float addition order is pinned
  left-to-right in both engines — bit-identical doubles, not merely close.

Reference parity: the reference has no retrieval layer; this extends the
LLM-pipeline suite (SURVEY.md "beyond the reference" mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from burst_db_spark.operators.text import tokens


def term_frequencies(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, term, tf) — one shuffle on (id, term)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    return toks.groupBy(id_col, "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )


def inverted_index(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Posting lists: term → df, total_tf, and a doc-ordered postings string.

    Postings are serialized ``doc:tf`` joined with ``,`` in doc-id order —
    a deterministic, engine-portable surface (the driver's hash compares
    strings, not nested arrays). One term = one reducer group; skewed
    (stop-)terms are bounded by corpus df, and the string form is the
    compact wire format a downstream searcher would mmap.
    """
    tf = term_frequencies(df, id_col, text_col)
    entry = F.concat_ws(":", F.col(id_col).cast("string"), F.col("tf").cast("string"))
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("d"), entry.alias("e")))
            ).alias("__p"),
        )
        .select(
            "term",
            "df",
            "total_tf",
            F.concat_ws(",", F.transform("__p", lambda s: s["e"])).alias("postings"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 of every matching doc against a literal term list.

    Plan: map-side token filter to the query terms (a k-term query ships
    only matching tokens into the shuffle) → (doc, term, tf) groupBy →
    broadcast of the tiny per-term df/idf frame → ordered per-doc fold.
    Doc length and the corpus avgdl come from a separate map-side count +
    single-row broadcast join.
    """
    terms = sorted(set(query_terms))
    toks_all = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    # doc length over ALL tokens (BM25 normalizes by full doc length)
    dl = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("dl"),
    )
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )

    toks = toks_all.where(F.col("term").isin(*terms))
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .join(dl, id_col)
    )
    n = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n
    idf = (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    denom = tf_d + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * (dl_d / avgdl))
    per_term = idf * (tf_d * F.lit(k1 + 1.0)) / denom

    contrib = scored.select(
        F.col(id_col),
        F.col("term"),
        per_term.alias("s"),
    )
    # ordered fold: sum per-term contributions in term order (bit-stable)
    return (
        contrib.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.array_sort(
                F.collect_list(F.struct("term", "s"))
            ).alias("__c"),
        )
        .select(
            id_col,
            "n_matched",
            F.aggregate(
                "__c",
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("bm25"),
        )
    )


def bm25_oracle_sql(
    query_terms: list[str],
    toks_expr: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_scores` (same parenthesization, same
    ordered fold via ``list(... ORDER BY term)`` + ``list_aggregate``)."""
    terms = sorted(set(query_terms))
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest({toks_expr}) AS term FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len({toks_expr}) AS BIGINT) AS dl
           FROM documents),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks WHERE term IN ({in_list}) GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM tf GROUP BY term),
    contrib AS (
        SELECT tf.doc_id, tf.term,
               ((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * {k1 + 1.0!r})
               / (CAST(tf AS DOUBLE) + {k1!r} * (1.0 - {b!r} + {b!r} *
                  (CAST(dl.dl AS DOUBLE)
                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
                   AS s
        FROM tf JOIN dfreq USING (term)
        CROSS JOIN stats JOIN dl USING (doc_id)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_matched,
           list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                       (x, y) -> x + y) AS bm25
    FROM contrib GROUP BY doc_id
    """
