"""Round-12-era queries (added in build round 11): the C4 span-removal
TRANSFORM — corpus-wide deletion of repeated spans with in-order
document reassembly (Raffel et al. JMLR'20 §2.2's "discard all but one
of any three-sentence span occurring more than once" rule, adapted to
fixed token windows on a corpus with no sentence delimiters).

Reference parity: opera-adt/burst_db has no text path — this extends
the LLM-pipeline surface (SURVEY.md "beyond the reference" mandate).
``dd_span_dedup`` (retrieval.py) reports the per-doc duplicated-span
STATISTIC; this is the transform a pipeline actually applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from burst_db_spark.catalog import load
from burst_db_spark.operators import dedup as dd
from burst_db_spark.queries.textops import _TOKS
from burst_db_spark.registry import register

_SPAN_LEN = 10
_MAX_SPAN_DF = 1  # remove every span seen in >= 2 distinct docs


@register(
    "t_span_scrub",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    spans AS (
        SELECT doc_id,
               CAST(i AS INTEGER) AS span_idx,
               array_to_string(
                   t[i * {_SPAN_LEN} + 1 : i * {_SPAN_LEN} + {_SPAN_LEN}],
                   ' ') AS span
        FROM t,
             unnest(range(0, CAST(ceil(len(t) / {_SPAN_LEN}.0) AS BIGINT)))
                 AS r(i)
    ),
    freq AS (
        SELECT span, CAST(count(*) AS BIGINT) AS span_df
        FROM (SELECT DISTINCT doc_id, span FROM spans) GROUP BY span
    ),
    kept AS (
        SELECT s.doc_id, s.span_idx, s.span
        FROM spans s JOIN freq USING (span)
        WHERE span_df <= {_MAX_SPAN_DF}
    ),
    rebuilt AS (
        SELECT doc_id,
               string_agg(span, ' ' ORDER BY span_idx) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_spans_kept
        FROM kept GROUP BY doc_id
    ),
    totals AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id
    )
    SELECT totals.doc_id,
           COALESCE(clean_text, '') AS clean_text,
           n_spans,
           COALESCE(n_spans_kept, 0) AS n_spans_kept
    FROM totals LEFT JOIN rebuilt USING (doc_id)
    """,
    tags=("dedup", "span", "transform", "llm-pipeline"),
)
def t_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span removal + reassembly: every 10-token span occurring
    in >= 2 distinct documents is deleted from ALL of them, and each
    document's surviving spans are re-joined in position order
    (operators/dedup.span_scrub). The reassembly is a per-doc
    array_sort(collect_list(struct)) — never a window or global sort;
    fully-scrubbed docs surface with empty clean_text via the doc-spine
    left join."""
    docs = load(spark, sf_dir, "documents")
    return dd.span_scrub(
        docs, "doc_id", span_len=_SPAN_LEN, max_span_df=_MAX_SPAN_DF
    )
