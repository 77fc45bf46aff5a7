"""Text-analysis + deduplication queries over the documents table —
the training-data-pipeline operator suite (exact dedup, n-gram Jaccard,
MinHash+LSH, SimHash, token stats, quality, language-ID, fingerprints).

Every hash is md5-derived so the DuckDB oracle reproduces the exact same
values; no engine-private hash functions anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import dedup as dd
from burst_db_spark.operators import text as tx
from burst_db_spark.registry import register

# DuckDB fragments reused across oracles -----------------------------------

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_SHINGLES_CTE = f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
           FROM toks)
"""

_EN = "('the', 'a', 'of', 'and', 'to', 'in', 'is')"
_ES = "('el', 'la', 'de', 'y', 'en', 'es', 'que')"


@register(
    "t_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_ish,
           CAST(length(text) AS INTEGER) AS n_chars_computed
    FROM documents
    """,
    tags=("text", "tokenize"),
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting, char counts."""
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(text).alias("n_tokens"),
        tx.bpe_ish_count(text).alias("n_bpe_ish"),
        F.length(text).cast("int").alias("n_chars_computed"),
    )


@register(
    "t_quality_score",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(length(regexp_replace(text, '[^.!?,;]', '', 'g'))
                    AS INTEGER) AS n_punct,
               CAST(len(list_filter({_TOKS}, x -> x IN {_EN}))
                    AS INTEGER) AS n_stopwords,
               length(regexp_replace(trim(text), '\\s+', '', 'g'))
                   / len({_TOKS}) AS avg_token_len
        FROM documents
    )
    SELECT doc_id, n_tokens, n_punct, n_stopwords, avg_token_len,
           CASE WHEN n_tokens < 5 THEN 0.0
                ELSE 1.0 - least(1.0, n_punct / greatest(n_tokens, 1))
           END AS quality_score
    FROM f
    """,
    tags=("text", "quality"),
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/punctuation/stopword quality features + composite score."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = tx.quality_features(docs)
    return out.select(
        "doc_id", "n_tokens", "n_punct", "n_stopwords", "avg_token_len", "quality_score"
    )


@register(
    "t_lang_guess",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, lang,
               CAST(len(list_filter({_TOKS}, x -> x IN {_EN})) AS INTEGER) AS en,
               CAST(len(list_filter({_TOKS}, x -> x IN {_ES})) AS INTEGER) AS es
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN en = 0 AND es = 0 THEN 'und'
                WHEN en >= es THEN 'en' ELSE 'es' END AS lang_guess
    FROM c
    """,
    tags=("text", "langid"),
)
def t_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language-ID heuristic next to the labeled lang."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", tx.lang_guess(F.col("text")).alias("lang_guess")
    )


@register(
    "t_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS digest,
           CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT)
               AS digest60
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content digest + 60-bit numeric fingerprint (portable md5 prefix)."""
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        tx.fingerprint(text).alias("digest"),
        tx.fingerprint64(text).alias("digest60"),
    )


@register(
    "t_top_tfidf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
    n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
          FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               tf.tf * n.n_docs / dfreq.df AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id,
           CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term
           ) AS INTEGER) AS rank,
           term, tf, df, score
    FROM scored
    QUALIFY rank <= 3
    """,
    tags=("text", "tfidf"),
)
def t_top_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by rational tf-idf (tf·N/df:
    rank-equivalent to log idf, exact across engines)."""
    docs = load(spark, sf_dir, "documents")
    return tx.top_tfidf_terms(docs, "doc_id", k=3)


@register(
    "dd_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS digest,
           min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY 1
    """,
    tags=("dedup", "exact"),
)
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-digest groupBy (one shuffle on the digest)."""
    docs = load(spark, sf_dir, "documents")
    return dd.exact_duplicates(docs, "doc_id")


@register(
    "dd_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    shf AS (
        SELECT * FROM sh WHERE shingle IN (
            SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50)
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM shf GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS common
        FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, common,
           common / (sa.n_sh + sb.n_sh - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.2
    """,
    tags=("dedup", "jaccard"),
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs with the ``max_df`` hot-shingle
    guard engaged (a shingle shared by k docs emits k² candidate pairs;
    df>50 shingles are excluded from the vocabulary on BOTH engine sides,
    capping the blowup at scale — result-identical on this corpus, whose
    max shingle df is 7). MinHash+LSH below is the sketch-based 100 TB
    path."""
    docs = load(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, "doc_id", threshold=0.2, max_df=50)


def _duckdb_minhash_sql(num_hashes: int = dd.NUM_HASHES, band_rows: int = dd.BAND_ROWS,
                        threshold: float = 0.5) -> str:
    n_bands = num_hashes // band_rows
    # hash j = slice j%4 of md5 seeded by j//4 (matches operators.dedup
    # _md5_hash32_sliced: 4 hashes per md5 evaluation)
    h_cols = ",\n           ".join(
        f"min(CAST(('0x' || substr(md5('{j // 4}:' || shingle), "
        f"{1 + 8 * (j % 4)}, 8)) AS BIGINT)) AS h{j}"
        for j in range(num_hashes)
    )
    band_cols = ",\n           ".join(
        "md5(concat_ws(','"
        + "".join(
            f", CAST(h{b * band_rows + r} AS VARCHAR)" for r in range(band_rows)
        )
        + f")) AS band{b}"
        for b in range(n_bands)
    )
    band_joins = "\n        UNION ALL\n".join(
        f"        SELECT l.doc_id AS id_a, r.doc_id AS id_b FROM bands l "
        f"JOIN bands r ON l.band{b} = r.band{b} AND l.doc_id < r.doc_id"
        for b in range(n_bands)
    )
    agree = " + ".join(
        f"CASE WHEN a.h{j} = b.h{j} THEN 1 ELSE 0 END" for j in range(num_hashes)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sig AS (
        SELECT doc_id,
           {h_cols}
        FROM sh GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id,
           {band_cols}
        FROM sig
    ),
    cand AS (
        SELECT DISTINCT id_a, id_b FROM (
{band_joins}
        )
    ),
    est AS (
        SELECT c.id_a, c.id_b, ({agree}) / {float(num_hashes)} AS est_sim
        FROM cand c
        JOIN sig a ON a.doc_id = c.id_a
        JOIN sig b ON b.doc_id = c.id_b
    )
    SELECT id_a, id_b, est_sim FROM est WHERE est_sim >= {threshold}
    """


@register(
    "dd_minhash_lsh",
    oracle=_duckdb_minhash_sql(),
    tags=("dedup", "minhash", "lsh"),
)
def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 md5-derived hashes) + banded LSH (4×4) near-dup pairs —
    the sub-quadratic dedup path for 100 TB corpora."""
    docs = load(spark, sf_dir, "documents")
    return dd.minhash_lsh_dedup(docs, "doc_id", threshold=0.5)


@register(
    "dd_dedup_clusters",
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
    )
    SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
    """,
    tags=("dedup", "clustering", "connected-components"),
)
def dd_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: near-dup pairs (3-gram Jaccard ≥ 0.2)
    → connected components → every doc labeled with the min doc_id of its
    cluster. Spark side: iterative min-label propagation (O(log diameter)
    join rounds); oracle: recursive-CTE transitive closure."""
    docs = load(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, "doc_id", threshold=0.2)
    return dd.connected_components(pairs, docs, "doc_id")


@register(
    "dd_simhash",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    th AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('0:' || tok), 1, 8)) AS BIGINT) AS th
        FROM toks
    ),
    votes AS (
        SELECT doc_id, b.bit,
               CAST(sum((th >> b.bit) & 1) AS BIGINT) AS ones,
               CAST(count(*) AS BIGINT) AS n
        FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS bit) b
        GROUP BY doc_id, b.bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN ones * 2 > n
                         THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
    tags=("dedup", "simhash"),
)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (majority vote over token-hash bits)."""
    docs = load(spark, sf_dir, "documents")
    out = dd.simhash_fingerprints(docs, "doc_id")
    return out.withColumn("simhash", F.col("simhash").cast("bigint"))
