"""Round-7 queries: mergeable KMV (bottom-k) distinct sketches,
intra-document repeated-line removal (the Gopher-style repetition
scrub, reference parity: opera-adt/burst_db has no text path — this is
the LLM-pipeline extension surface), a lossless prefix-filtered
containment join (near-superset detection), int8 scalar-quantized ANN
with exact rerank, dynamic partition pruning over a date-partitioned
fact, distributed global ranking without a single-partition window,
the map higher-order-function surface, and stride frame-sampling over
synthetic video containers.

Every oracle is ANSI SQL the driver runs on DuckDB; float outputs are
ordered folds (bit-exact cross-engine), counts/codes are integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from burst_db_spark.catalog import load
from burst_db_spark.registry import register

# ---------------------------------------------------------------------------
# A32: KMV / bottom-k distinct sketch — the mergeable-cardinality property.
#
# Each (priority, shard) partition builds an independent bottom-k sketch of
# md5(custkey); merging = union + distinct-hash + re-take bottom-k. That is
# the 100 TB shape: partial sketches per executor/day/shard re-aggregate
# without touching raw data, exactly like the HLL row (a27) but with a
# sketch whose merge is expressible in pure ANSI SQL, so the driver can
# hash-check the WHOLE pipeline, estimate included. The estimate uses the
# classic (k-1)/r_k KMV estimator on the 48-bit hash prefix with INTEGER
# division only — no float rounding to drift cross-engine.

_KMV_K = 64
_POW48 = 1 << 48  # 281474976710656


@register(
    "a32_kmv_distinct",
    oracle=f"""
    WITH hashed AS (
        SELECT o_orderpriority AS priority,
               o_orderkey % 4 AS shard,
               md5(CAST(o_custkey AS VARCHAR)) AS h
        FROM orders
    ),
    shard_sketch AS (
        SELECT priority, shard, h
        FROM (SELECT priority, shard, h,
                     row_number() OVER (PARTITION BY priority, shard
                                        ORDER BY h) AS rn
              FROM (SELECT DISTINCT priority, shard, h FROM hashed))
        WHERE rn <= {_KMV_K}
    ),
    merged AS (
        SELECT priority, h,
               row_number() OVER (PARTITION BY priority ORDER BY h) AS rn
        FROM (SELECT DISTINCT priority, h FROM shard_sketch)
    ),
    kth AS (
        SELECT priority, h AS kth_hash,
               CAST('0x' || substr(h, 1, 12) AS BIGINT) AS r48
        FROM merged WHERE rn = {_KMV_K}
    ),
    truth AS (
        SELECT o_orderpriority AS priority,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS true_distinct
        FROM orders GROUP BY 1
    )
    SELECT t.priority, kth_hash,
           CAST(({_KMV_K} - 1) * {_POW48} // r48 AS BIGINT) AS est_distinct,
           true_distinct
    FROM truth t JOIN kth USING (priority)
    ORDER BY t.priority
    """,
    tags=("A32", "sketch", "kmv", "mergeable", "llm-pipeline"),
)
def a32_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) distinct-count sketch with a real merge step:
    4 shard sketches per priority (shard = o_orderkey % 4, so the SAME
    custkey lands in MANY shards — the merge must dedupe by hash) are
    unioned and re-cut to the k smallest hashes. est = (k-1)*2^48 div
    r_k over the 48-bit hash prefix: integer-exact in both engines.
    Plan: one partial-aggregating distinct per shard, window top-k per
    tiny group, no driver-side state — partials the size of k, not of
    the data, which is why this re-aggregates for free at 100 TB."""
    orders = load(spark, sf_dir, "orders")
    hashed = orders.select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_orderkey") % 4).alias("shard"),
        F.md5(F.col("o_custkey").cast("string")).alias("h"),
    )
    w_shard = Window.partitionBy("priority", "shard").orderBy("h")
    shard_sketch = (
        hashed.distinct()
        .withColumn("rn", F.row_number().over(w_shard))
        .where(F.col("rn") <= _KMV_K)
        .drop("rn", "shard")
    )
    w_merge = Window.partitionBy("priority").orderBy("h")
    kth = (
        shard_sketch.distinct()
        .withColumn("rn", F.row_number().over(w_merge))
        .where(F.col("rn") == _KMV_K)
        .select(
            "priority",
            F.col("h").alias("kth_hash"),
            F.conv(F.substring("h", 1, 12), 16, 10).cast("bigint").alias("r48"),
        )
    )
    truth = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").cast("bigint").alias("true_distinct")
    )
    return (
        truth.join(kth, "priority")
        .select(
            "priority",
            "kth_hash",
            F.expr(
                f"CAST(({_KMV_K} - 1) * CAST({_POW48} AS BIGINT) DIV r48 AS BIGINT)"
            ).alias("est_distinct"),
            "true_distinct",
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# T: intra-document repeated-line removal (Gopher-style repetition scrub).
# Distinct from dd_span_dedup (which counts spans repeated ACROSS docs):
# this one removes duplicate lines WITHIN each document, keeps the first
# occurrence, and reassembles the text — the order-preserving rewrite is
# the hard part. "Lines" are 2-word windows because the synthetic corpus
# is single-line; 2 is the smallest unit that actually repeats (250
# duplicate lines at sf0.01, 3 at window=3).

_LINE_WORDS = 2


@register(
    "t_paragraph_dedup",
    oracle=rf"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents),
    words AS (SELECT doc_id, w[i] AS word, i
              FROM t, unnest(range(1, len(w) + 1)) AS r(i)),
    lines AS (SELECT doc_id, (i - 1) // {_LINE_WORDS} AS line_no,
                     string_agg(word, ' ' ORDER BY i) AS line
              FROM words GROUP BY doc_id, (i - 1) // {_LINE_WORDS}),
    kept AS (
        SELECT doc_id, line_no, line,
               min(line_no) OVER (PARTITION BY doc_id, line) AS first_no
        FROM lines
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN line_no = first_no THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           md5(string_agg(CASE WHEN line_no = first_no THEN line END,
                          ' ' ORDER BY line_no)) AS new_md5
    FROM kept
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "dedup", "repetition", "llm-pipeline"),
)
def t_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving intra-doc duplicate-line removal: split → window
    into lines → keep each line's first occurrence → reassemble in
    original order; outputs the rebuilt text's md5 so the driver checks
    the REASSEMBLY, not just the counts. Everything is built-ins
    (posexplode / min-over / array_sort fold): one shuffle on
    (doc_id, line_no), one on doc_id — no Python in the path, and the
    per-doc state is bounded by document length, so a 100 TB corpus
    partitions by doc_id and never skews."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("pos", "word"),
    )
    lines = (
        words.groupBy("doc_id", (F.col("pos") / _LINE_WORDS).cast("bigint").alias("line_no"))
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
            ).alias("line")
        )
    )
    kept = lines.withColumn(
        "first_no", F.min("line_no").over(Window.partitionBy("doc_id", "line"))
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum((F.col("line_no") == F.col("first_no")).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("line_no") == F.col("first_no"),
                                    F.struct("line_no", "line"),
                                )
                            )
                        ),
                        lambda s: s["line"],
                    ),
                )
            ).alias("new_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# T: lossless containment join (near-superset detection).
# Containment C(A,B) = |A∩B| / |A| is the asymmetric cousin of Jaccard:
# it finds documents whose shingle set is mostly swallowed by another
# (quote-with-additions, boilerplate-plus-payload). Prefix theorem for
# containment: if C(A,B) >= t then A and B share a shingle among A's
# (|A| - ceil(t*|A|) + 1) RAREST shingles — so only A's prefix explodes;
# B indexes all shingles. Lossless: the verify is an exact
# array_intersect on the candidate pairs, and the oracle IS the
# quadratic definition.

_CONT_T10 = 6  # containment threshold, tenths (0.6)
_SHINGLE_SQL = (
    "list_distinct(list_transform(range(1, len(w) - 1), "
    "i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))"
)


@register(
    "t_containment_join",
    oracle=rf"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents),
    sh AS (SELECT doc_id, {_SHINGLE_SQL} AS s FROM t)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_size,
           CAST(len(a.s) AS BIGINT) AS a_size
    FROM sh a JOIN sh b ON a.doc_id != b.doc_id
    WHERE len(list_intersect(a.s, b.s)) * 10 >= {_CONT_T10} * len(a.s)
    ORDER BY a_id, b_id
    """,
    tags=("text", "dedup", "containment", "prefix-filter", "llm-pipeline"),
)
def t_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered containment join over 3-word shingle sets.
    Candidate generation explodes only each A-doc's rarity-ordered
    prefix (|A| - ceil(0.6|A|) + 1 shingles) against a full inverted
    index of B — an equi-join on shingle, never an all-pairs — then an
    exact array_intersect verify on the distinct candidate pairs.
    Same scale family as dd_jaccard_prefix_join (AllPairs/PPJoin,
    Bayardo et al. 2007; Chaudhuri et al. 2006 for the containment
    prefix bound): candidates grow with shared-rare-shingle density,
    not quadratically."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    ).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("w", i + 1),
                    F.element_at("w", i + 2),
                    F.element_at("w", i + 3),
                ),
            )
        ).alias("s"),
    )
    sets = toks.withColumn("a_size", F.size("s"))

    # global rarity order: document frequency per shingle
    index = sets.select("doc_id", F.explode("s").alias("shingle"))
    df_counts = index.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        index.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("by_rarity")
        )
    )
    pref = (
        sets.join(ranked, "doc_id")
        .select(
            F.col("doc_id").alias("a_id"),
            F.col("a_size"),
            F.explode(
                F.slice(
                    "by_rarity",
                    1,
                    F.col("a_size")
                    - F.ceil(F.col("a_size") * _CONT_T10 / 10).cast("int")
                    + 1,
                )
            ).alias("shingle"),
        )
    )
    cands = (
        pref.join(index.select(F.col("doc_id").alias("b_id"), "shingle"), "shingle")
        .where(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", "a_size")
        .distinct()
    )
    a_sets = sets.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    b_sets = sets.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    return (
        cands.join(a_sets, "a_id")
        .join(b_sets, "b_id")
        .withColumn(
            "inter_size", F.size(F.array_intersect("sa", "sb")).cast("bigint")
        )
        .where(F.col("inter_size") * 10 >= _CONT_T10 * F.col("a_size"))
        .select("a_id", "b_id", "inter_size", F.col("a_size").cast("bigint"))
        .orderBy("a_id", "b_id")
    )
