"""Retrieval + language-model-signal queries over the documents table:
inverted index, BM25 search, corpus bigram-LM scoring, span-level dedup.

These extend the LLM-pipeline suite (no reference counterpart — the
reference has no text layer; SURVEY.md "beyond the reference" mandate).
Float results are ordered-fold sums (see operators/retrieval.py and
operators/lm.py) so the DuckDB oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import dedup as dd
from burst_db_spark.operators import lm
from burst_db_spark.operators import retrieval as ret
from burst_db_spark.registry import register

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

# the query: frequent-ish engine words (they exist in the synthetic corpus)
_QUERY_TERMS = ["merge", "vector", "window", "spark"]
_SPAN_LEN = 10


@register(
    "t_inverted_index",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term)
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
    FROM tf GROUP BY term
    """,
    tags=("retrieval", "index"),
)
def t_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: term → df, total_tf, doc-ordered postings string.
    One reducer group per term — the natural parallel unit of index
    construction."""
    docs = load(spark, sf_dir, "documents")
    return ret.inverted_index(docs, "doc_id")


@register(
    "t_bm25_search",
    oracle=ret.bm25_oracle_sql(_QUERY_TERMS, _TOKS),
    tags=("retrieval", "bm25"),
)
def t_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scores for a literal term query: map-side token filter →
    tiny df/idf broadcast → term-ordered per-doc fold (bit-stable sum)."""
    docs = load(spark, sf_dir, "documents")
    return ret.bm25_scores(docs, _QUERY_TERMS, "doc_id")


@register(
    "t_bigram_lm_score",
    oracle=lm.bigram_lm_oracle_sql(_TOKS),
    tags=("text", "lm", "quality"),
)
def t_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal: corpus-trained add-one bigram
    model, per-doc mean transition probability (position-ordered fold)."""
    docs = load(spark, sf_dir, "documents")
    return lm.bigram_lm_scores(docs, "doc_id")


@register(
    "dd_span_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    spans AS (
        SELECT doc_id,
               CAST(i AS INTEGER) AS span_idx,
               array_to_string(t[i * {_SPAN_LEN} + 1 : i * {_SPAN_LEN} + {_SPAN_LEN}], ' ')
                   AS span
        FROM t, unnest(range(0, CAST(ceil(len(t) / {_SPAN_LEN}.0) AS BIGINT))) AS r(i)
    ),
    freq AS (
        SELECT span, CAST(count(*) AS BIGINT) AS n_docs_with
        FROM (SELECT DISTINCT doc_id, span FROM spans) GROUP BY span
    ),
    marked AS (SELECT spans.doc_id, n_docs_with
               FROM spans JOIN freq USING (span))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           CAST(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS dup_frac,
           (CAST(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) <= 0.5 AS keep
    FROM marked GROUP BY doc_id
    """,
    tags=("dedup", "span"),
)
def dd_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity dedup (Dolma-style) on fixed token windows:
    per-doc duplicated-span fraction + keep decision."""
    docs = load(spark, sf_dir, "documents")
    return dd.span_dup_stats(docs, "doc_id", span_len=_SPAN_LEN, max_dup_frac=0.5)
