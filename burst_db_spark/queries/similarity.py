"""Similarity-search queries over the embeddings table (array<float>).

Cross-engine float determinism: both sides compute dot products as an
element-ordered left fold in DOUBLE (Spark ``aggregate`` with 0.0 init ≡
DuckDB ``list_reduce`` — the 0.0+x1 first step is exact), so cosine values
match bit-for-bit and rank ties break on neighbor_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import similarity as sim
from burst_db_spark.registry import register

N_QUERIES = 10
TOP_K = 3

_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"{dot} / (sqrt({na}) * sqrt({nb}))"


@register(
    "knn_cosine_brute",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id, {_cos_sql("qv", "cv")} AS cos
        FROM c CROSS JOIN q
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id
           ) AS INTEGER) AS rank,
           cos
    FROM scored
    QUALIFY rank <= {TOP_K}
    """,
    tags=("similarity", "knn"),
)
def knn_cosine_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the query set, stream the
    candidates, one bounded top-k window at the end."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return sim.cosine_topk(emb, queries, k=TOP_K)


@register(
    "knn_cosine_ivf",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qcell
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS ccell
          FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id, {_cos_sql("qv", "cv")} AS cos
        FROM c JOIN q ON c.ccell = q.qcell
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id
           ) AS INTEGER) AS rank,
           cos
    FROM scored
    QUALIFY rank <= {TOP_K}
    """,
    tags=("similarity", "ann", "ivf"),
)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: restrict candidates to the query's coarse cell
    (the label column stands in for a k-means cell id) — the pruned scale
    path; at 100 TB the cell comes from a broadcast codebook argmin."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return sim.cosine_topk_partitioned(emb, queries, k=TOP_K)


@register(
    "knn_cosine_ivf_learned",
    oracle=None,
    tags=("similarity", "ann", "ivf", "kmeans", "rows-only"),
)
def knn_cosine_ivf_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED codebook: Lloyd's k-means over the corpus
    (deterministic md5 seeding, broadcast-codebook argmin assignment,
    one posexplode shuffle per iteration), then the cell-restricted
    top-k search. Rows-only: the iterative trainer isn't
    SQL-expressible; determinism is pinned by the seeded init, so row
    counts and values are stable across runs."""
    from burst_db_spark.operators.similarity import (
        assign_cells,
        cosine_topk_partitioned,
        kmeans_codebook,
    )

    emb = load(spark, sf_dir, "embeddings")
    codebook = kmeans_codebook(emb, k=8, iters=2)
    cells = assign_cells(emb, codebook)
    queries = cells.where(F.col("vec_id") < 20)
    return cosine_topk_partitioned(cells, queries, cell_col="cell", k=3)
