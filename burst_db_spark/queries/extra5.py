"""Round-4 scale-path queries: SemDeDup, product-quantization ADC search,
Z-order clustering codes, and distributed BPE merge training.

All float math is ordered-fold / literal-table arithmetic so the DuckDB
oracles hash bit-identically (see operators/pq.py, operators/zorder.py,
operators/similarity.py:semdedup_flags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import pq as pqo
from burst_db_spark.operators import similarity as sim
from burst_db_spark.operators import zorder as zo
from burst_db_spark.operators.bpe import train_bpe
from burst_db_spark.plans.bpe_oracle import (
    bpe_merges_oracle_sql as _bpe_merges_oracle_sql,
)
from burst_db_spark.registry import register

# -- SemDeDup ---------------------------------------------------------------

_SEM_K = 16  # coarse cells; Σ|cell|² bounds the pair work (not N²)
_SEM_TAU = 0.4
_SEM_CENTS = sim.lsh_planes(_SEM_K, dim=64)

_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"{dot} / (sqrt({na}) * sqrt({nb}))"


def _cent_dist_sql(c: list[float]) -> str:
    lit = "[" + ", ".join(repr(x) for x in c) + "]"
    return (
        "list_reduce(list_transform(range(1, 65), i -> "
        f"(CAST(embedding[i] AS DOUBLE) - ({lit})[i]) * "
        f"(CAST(embedding[i] AS DOUBLE) - ({lit})[i])), (x, y) -> x + y)"
    )


_SEM_DISTS = "[" + ",\n           ".join(_cent_dist_sql(c) for c in _SEM_CENTS) + "]"


@register(
    "dd_semdedup",
    oracle=f"""
    WITH d AS (
        SELECT vec_id, embedding, {_SEM_DISTS} AS dists FROM embeddings
    ),
    a AS (SELECT vec_id AS id, embedding AS v,
                 CAST(list_position(dists, list_min(dists)) AS INTEGER) AS cell
          FROM d),
    drops AS (
        SELECT DISTINCT y.id
        FROM a AS x JOIN a AS y ON x.cell = y.cell AND x.id < y.id
        WHERE {_cos_sql("x.v", "y.v")} >= {_SEM_TAU!r}
    )
    SELECT a.id AS vec_id, a.cell,
           (drops.id IS NOT NULL) AS dropped
    FROM a LEFT JOIN drops ON a.id = drops.id
    """,
    tags=("dedup", "semantic", "embedding"),
)
def dd_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: within-coarse-cell cosine dedup, min-id survivor —
    the cluster-then-compare semantic twin of MinHash-LSH's banding.

    This row is the GIVEN-CODEBOOK form (centroids supplied by the
    caller, here fixed hyperplane literals). At scale the codebook must
    be TRAINED or occupancy skews — the d4 probe measured Σ|cell|²
    growing 37x at 10x data under data-blind centroids vs exactly
    linear under trained cells (SCALING.md) — so the production path is
    ``dd_d4_diversify``'s unrolled-k-means cells; this row pins the
    operator's behavior when the codebook comes from outside."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.semdedup_flags(emb, _SEM_CENTS, tau=_SEM_TAU)


# -- Product quantization ---------------------------------------------------

_PQ_M, _PQ_K, _PQ_DIM = 4, 16, 64
_PQ_BOOKS = pqo.pq_codebooks(m=_PQ_M, dim=_PQ_DIM, k=_PQ_K)
# deterministic literal query vector (not a corpus row: ADC is asymmetric)
_PQ_QUERY = sim.lsh_planes(_PQ_M * _PQ_K + 1, dim=_PQ_DIM)[-1]
_PQ_TOPK = 5


def _pq_encode_sql() -> tuple[list[str], list[str]]:
    """(code_exprs, table_literals) for the DuckDB oracle — identical
    literals to the Spark side (same LCG, same Python-computed tables)."""
    sub = _PQ_DIM // _PQ_M
    code_exprs = []
    tables = []
    for j, book in enumerate(_PQ_BOOKS):
        dists = []
        for e in book:
            lit = "[" + ", ".join(repr(x) for x in e) + "]"
            dists.append(
                f"list_reduce(list_transform(range(1, {sub} + 1), i -> "
                f"(CAST(embedding[{j * sub} + i] AS DOUBLE) - ({lit})[i]) * "
                f"(CAST(embedding[{j * sub} + i] AS DOUBLE) - ({lit})[i])), "
                "(x, y) -> x + y)"
            )
        darr = "[" + ", ".join(dists) + "]"
        code_exprs.append(
            f"CAST(list_position({darr}, list_min({darr})) AS INTEGER)"
        )
        qseg = _PQ_QUERY[j * sub : (j + 1) * sub]
        tab = []
        for e in book:
            acc = 0.0
            for x, y in zip(qseg, e):
                acc = acc + (x - y) * (x - y)
            tab.append(acc)
        # CAST each entry: a bare decimal-point literal is DECIMAL in
        # DuckDB, and decimal sums would hash-mismatch Spark's DOUBLE
        tables.append(
            "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in tab) + "]"
        )
    return code_exprs, tables


_PQ_CODES, _PQ_TABLES = _pq_encode_sql()
_PQ_ADC = " + ".join(
    f"({t})[code_{j}]" for j, t in enumerate(_PQ_TABLES)
)


@register(
    "knn_pq_adc",
    oracle=f"""
    WITH coded AS (
        SELECT vec_id,
               {", ".join(f"{c} AS code_{j}" for j, c in enumerate(_PQ_CODES))}
        FROM embeddings
    )
    SELECT vec_id,
           {", ".join(f"code_{j}" for j in range(_PQ_M))},
           {_PQ_ADC} AS adc_dist
    FROM coded
    QUALIFY row_number() OVER (ORDER BY adc_dist, vec_id) <= {_PQ_TOPK}
    """,
    tags=("similarity", "ann", "pq"),
)
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ + asymmetric-distance top-k: encode is a shuffle-free
    projection against literal codebooks; search is a literal lookup
    table + TakeOrdered. 256 B/vector → 4 B/vector."""
    emb = load(spark, sf_dir, "embeddings")
    return pqo.pq_adc_topk(emb, _PQ_QUERY, _PQ_BOOKS, k=_PQ_TOPK)


# -- Z-order ----------------------------------------------------------------

_Z_BITS = 16


@register(
    "geo_zorder_code",
    oracle=f"""
    WITH pts AS (
        SELECT p_partkey,
               CAST((p_partkey * 13) % 360 - 180 + 0.5 AS DOUBLE) AS lon,
               CAST((p_partkey * 19) % 170 - 85 + 0.5 AS DOUBLE) AS lat
        FROM part
    ),
    q AS (
        SELECT p_partkey,
               {zo.quantize_sql("lon", -180.0, 180.0, _Z_BITS)} AS qx,
               {zo.quantize_sql("lat", -90.0, 90.0, _Z_BITS)} AS qy
        FROM pts
    )
    SELECT p_partkey, qx, qy,
           {zo.morton_sql("qx", "qy", _Z_BITS)} AS zcode
    FROM q
    """,
    tags=("spatial", "zorder", "layout"),
)
def geo_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton codes for part coordinates — the clustering key behind
    Z-order data layout (zorder_write); pure codegen'd bit math."""
    part = load(spark, sf_dir, "part")
    lon = ((F.col("p_partkey") * 13) % 360 - 180 + 0.5).cast("double")
    lat = ((F.col("p_partkey") * 19) % 170 - 85 + 0.5).cast("double")
    pts = part.select("p_partkey", lon.alias("lon"), lat.alias("lat"))
    qx = zo.quantize(F.col("lon"), -180.0, 180.0, _Z_BITS)
    qy = zo.quantize(F.col("lat"), -90.0, 90.0, _Z_BITS)
    return (
        pts.withColumn("qx", qx)
        .withColumn("qy", qy)
        .select(
            "p_partkey",
            "qx",
            "qy",
            zo.morton_code(F.col("qx"), F.col("qy"), _Z_BITS).alias("zcode"),
        )
    )


# -- BPE --------------------------------------------------------------------


@register(
    "t_bpe_merges",
    # HASH-CHECKED since build round 13 (VERDICT r12 #5): the trainer is
    # driver-paced but each round is relational, so 8 rounds unroll into
    # CTEs — the greedy merge is a sentinel-string replace()
    # (plans/bpe_oracle.py). Also pinned by the pytest golden vs an
    # independent pure-Python BPE.
    oracle=_bpe_merges_oracle_sql(8),
    tags=("text", "tokenizer", "bpe"),
)
def t_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges learned from the corpus word-type table —
    each round: pair-count groupBy (map-side partials) + 1-row collect."""
    docs = load(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=8)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )
