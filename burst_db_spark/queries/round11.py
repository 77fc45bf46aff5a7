"""Round-11 queries: winnowing document fingerprints (Schleimer,
Wilkerson, Aiken — SIGMOD 2003, the MOSS local fingerprinting scheme)
— the rolling-hash fingerprint family the LLM-pipeline surface still
lacked (t_fingerprint is a WHOLE-document digest; winnowing selects
position-local k-gram fingerprints with a detection guarantee for
shared substrings >= k + w - 1 chars).

Reference parity: opera-adt/burst_db has no text path — these extend
the LLM-pipeline surface (SURVEY.md "beyond the reference" mandate).
The (hash asc, pos desc) window argmin is encoded into a sortable
string key so BOTH engines compute it with a plain MIN() window — the
oracles replicate the scheme bit-for-bit in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import text as tx
from burst_db_spark.registry import register

_K = 8  # gram width (noise threshold)
_W = 4  # window width; guarantee threshold t = _K + _W - 1 = 11 chars

# Shared oracle CTE: the winnowed (doc, fp, pos) selection, exactly
# mirroring operators/text.winnow_fingerprints (k=8, w=4).
_WINNOW_SEL_CTES = f"""
    d AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
    dm AS (SELECT doc_id, t, length(t) - {_K - 1} AS m FROM d),
    g AS (
        SELECT doc_id, m, t,
               CAST(unnest(range(1, m + 1)) AS INTEGER) AS pos
        FROM dm WHERE m >= {_W}
    ),
    kg AS (
        SELECT doc_id, m, pos,
               substr(md5(substr(t, pos, {_K})), 1, 15)
               || lpad(CAST({tx.WINNOW_POS_MAX} - pos AS VARCHAR), 9, '0')
                   AS key
        FROM g
    ),
    wm AS (
        SELECT doc_id, pos, m,
               min(key) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING
               ) AS wkey
        FROM kg
    ),
    sel AS (
        SELECT DISTINCT doc_id, wkey FROM wm WHERE pos <= m - {_W - 1}
    )
"""


@register(
    "t_winnow_fingerprints",
    oracle=f"""
    WITH {_WINNOW_SEL_CTES}
    SELECT doc_id,
           substr(wkey, 1, 15) AS fp,
           CAST({tx.WINNOW_POS_MAX}
                - CAST(substr(wkey, 16, 9) AS INTEGER) AS INTEGER) AS fp_pos,
           CAST(('0x' || substr(wkey, 1, 15)) AS BIGINT) AS fp60
    FROM sel
    """,
    tags=("text", "fingerprint", "winnowing", "llm-pipeline"),
)
def t_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed k-gram fingerprints of every document (k=8, w=4):
    each window of 4 consecutive gram hashes contributes its minimum
    (rightmost on ties), so any substring shared between two documents
    of length >= 11 chars is guaranteed to surface as an identical
    selected fingerprint in both (operators/text.winnow_fingerprints;
    Schleimer et al. SIGMOD'03 §3). ONE per-doc window min + distinct —
    no join, no UDF; a hash match here proves the whole scheme (gram
    hashing, window argmin, tie-break, position recovery) bit-identical
    across engines."""
    docs = load(spark, sf_dir, "documents")
    return tx.winnow_fingerprints(docs, "doc_id", k=_K, w=_W)


@register(
    "dd_winnow_overlap",
    oracle=f"""
    WITH {_WINNOW_SEL_CTES},
    fps AS (SELECT DISTINCT doc_id, substr(wkey, 1, 15) AS fp FROM sel),
    guard AS (
        SELECT * FROM fps WHERE fp IN (
            SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50)
    ),
    sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
        FROM guard GROUP BY doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS shared_fps
        FROM guard a JOIN guard b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 10
    )
    SELECT id_a, id_b, shared_fps,
           sa.nfp AS nfp_a, sb.nfp AS nfp_b,
           CAST(shared_fps AS DOUBLE)
               / CAST(least(sa.nfp, sb.nfp) AS DOUBLE) AS overlap_frac
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    """,
    tags=("dedup", "fingerprint", "winnowing", "llm-pipeline"),
)
def dd_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap detection: document pairs sharing >= 10
    winnowed fingerprints, with shared / min(|fp|) containment fraction
    (operators/text.winnow_overlap_pairs). Candidate generation is the
    fingerprint EQUI-join over per-doc distinct fingerprint sets with
    the df<=50 hot-fingerprint guard (boilerplate headers at corpus
    scale would otherwise fan out df² pairs per bucket) — never an
    all-pairs comparison, the same occupancy-bounded join family as the
    shingle/LSH dedups."""
    docs = load(spark, sf_dir, "documents")
    return tx.winnow_overlap_pairs(
        docs, "doc_id", k=_K, w=_W, min_shared=10, max_df=50
    )
