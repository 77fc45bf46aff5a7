"""Deduplication operators for training-data pipelines (SURVEY.md §7.2
step 11): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- exact dedup = hash-groupBy (one shuffle on the 32-hex digest);
- n-gram Jaccard = the EXACT baseline — shingle explode + self-equi-join
  on shingle; quadratic in the worst case, use at audit scale;
- MinHash+LSH = the 100 TB path: K min-hashes per doc (one shuffle),
  banded LSH buckets (B small self-joins on band keys), verify on the
  signature only — never a full cross join;
- all hash functions are md5-derived so a DuckDB oracle reproduces them
  bit-for-bit (no engine-private hash()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from burst_db_spark.operators.text import shingles, tokens

NUM_HASHES = 16
BAND_ROWS = 4  # 16 hashes → 4 bands of 4


def _md5_hash32(value: Column, seed: int) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5(seed ':' value)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), value)), 1, 8), 16, 10
    ).cast("bigint")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup via content digest: one row per distinct text with the
    surviving (min) id and the duplicate count."""
    digest = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(F.col(id_col), digest.alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) long form — distinct n-gram shingles per doc."""
    return df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard via shingle self-join.

    jaccard(a,b) = |Sa ∩ Sb| / (|Sa| + |Sb| - |Sa ∩ Sb|); only pairs
    sharing ≥1 shingle are ever materialized (never a cross join).
    """
    sh = doc_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "common", "jaccard")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    n: int = 3,
) -> DataFrame:
    """K md5-derived min-hashes per document (wide: h0..h{K-1}).

    One explode + one groupBy — the shuffle moves (id, K longs) only.
    """
    sh = doc_shingles(df, id_col, text_col, n)
    aggs = [
        F.min(_md5_hash32(F.col("shingle"), j)).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become a candidate pair."""
    n_bands = num_hashes // band_rows
    bands = sigs.select(
        F.col(id_col),
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * band_rows + r}").cast("string")
                        for r in range(band_rows)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(n_bands)
        ],
    )
    pair_sets = []
    for b in range(n_bands):
        l, r = bands.alias("l"), bands.alias("r")
        pair_sets.append(
            l.join(
                r,
                (F.col(f"l.band{b}") == F.col(f"r.band{b}"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
            ).select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
            )
        )
    out = pair_sets[0]
    for p in pair_sets[1:]:
        out = out.unionByName(p)
    return out.distinct()


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with estimated similarity
    (fraction of agreeing min-hashes) ≥ threshold."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, band_rows)
    sa = sigs.select(
        F.col(id_col).alias("id_a"), *[F.col(f"h{j}").alias(f"a{j}") for j in range(num_hashes)]
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"), *[F.col(f"h{j}").alias(f"b{j}") for j in range(num_hashes)]
    )
    agree = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(num_hashes)
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_sim", agree / F.lit(float(num_hashes)))
        .where(F.col("est_sim") >= threshold)
        .select("id_a", "id_b", "est_sim")
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash over distinct tokens: bit k of the fingerprint is the
    majority vote of token-hash bit k.

    Relational shape: explode tokens → explode bit positions → count votes
    per (doc, bit) → weighted sum — associative all the way down.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    )
    h = _md5_hash32(F.col("tok"), 0)
    toks = toks.select(F.col(id_col), h.alias("th"))
    bits_df = toks.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        F.col("th"),
    ).withColumn("vote", F.expr("shiftright(th, bit) & 1"))
    per_bit = bits_df.groupBy(id_col, "bit").agg(
        F.sum("vote").alias("ones"), F.count("*").alias("n")
    )
    # 2^bit via pow (exact for bit < 53) — portable to the DuckDB oracle
    fp_bit = F.when(
        F.col("ones") * 2 > F.col("n"), F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    return per_bit.groupBy(id_col).agg(F.sum(fp_bit).alias("simhash"))
