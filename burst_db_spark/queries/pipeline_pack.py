"""Dataset-assembly queries: deterministic split assignment + sequence
packing over the documents table (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators.packing import assign_split, pack_sequences
from burst_db_spark.registry import register

_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)


@register(
    "t_split_assign",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_BUCKET} < 98 THEN 'train'
                WHEN {_BUCKET} < 99 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("pipeline", "split", "hash"),
)
def t_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test assignment by md5-hash
    percentile of the document id — stable across runs/engines/cluster
    sizes, no sampling state, no global sort."""
    docs = load(spark, sf_dir, "documents")
    return assign_split(docs, "doc_id").select("doc_id", "split")


@register(
    "t_pack_sequences",
    oracle="""
    WITH d AS (
        SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    laid AS (
        SELECT *, CAST(COALESCE(sum(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start_offset
        FROM d
    )
    SELECT doc_id, shard, n_tokens, start_offset,
           CAST(floor(start_offset / 4096) AS BIGINT) AS first_chunk,
           CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 4096)
                AS BIGINT) AS last_chunk
    FROM laid
    """,
    tags=("pipeline", "packing"),
)
def t_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 4096-token context windows, sharded
    so the layout parallelizes (one window shuffle per shard, no global
    sort). Emits each document's offset and chunk span."""
    docs = load(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", context=4096)


@register(
    "t_redact_pii",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]+', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
               '\\+?[0-9]{1,2}[- ]?\\(?[0-9]{3}\\)?[- ][0-9]{3}[- ][0-9]{4}',
               '<PHONE>', 'g'),
             '(https?://|www\\.)[^ ]+', '<URL>', 'g') AS redacted
    FROM documents
    """,
    tags=("pipeline", "redaction"),
)
def t_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing (emails, SSN-shaped ids, phone numbers, URLs)
    as chained JVM regexp_replace — streams at scan speed; the patterns
    live in the Spark/DuckDB-portable regex subset so both engines
    rewrite identically."""
    from burst_db_spark.operators.text import redact

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", redact(F.col("text")).alias("redacted"))


@register(
    "t_curriculum_buckets",
    oracle="""
    SELECT doc_id,
           CAST(ntile(4) OVER (ORDER BY length(text), doc_id) AS INTEGER)
               AS bucket
    FROM documents
    """,
    tags=("pipeline", "curriculum", "ntile"),
)
def t_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-schedule bucketing: quartiles of a difficulty proxy
    (text length) under a TOTAL order (score, doc_id) — the unique
    tiebreak is what makes ntile deterministic across engines. Runs the
    SCALABLE formulation (range partitions + offset ranks, no
    single-partition window); the oracle stays the plain global NTILE,
    so the driver proves the two formulations identical."""
    from burst_db_spark.operators.text import curriculum_buckets_scalable

    docs = load(spark, sf_dir, "documents")
    out = curriculum_buckets_scalable(
        docs, F.length("text"), n_buckets=4, order_key=F.col("doc_id")
    )
    return out.select("doc_id", "bucket")
