"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products are pure Column expressions (zip_with + aggregate), JVM-side.
- ``cosine_topk_partitioned``: the scale path — a coarse partition
  (IVF-style cell id; here the precomputed ``label`` column stands in for
  a k-means cell) restricts each query to its cell, pruning candidates by
  ~n_cells×. At 100 TB the cell id comes from a trained codebook
  (broadcast centroids + argmin), the join below is identical.

Float determinism: accumulation is element-ordered left-fold in both
Spark (``aggregate``) and the DuckDB oracle (``list_sum`` over
``list_transform``), so cross-engine results match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force).

    ``queries`` is small (broadcast); candidates stream partition-local, so
    the only shuffle is the final per-query top-k (row_number window over
    |queries|·k-bounded groups).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos")
    )


def cosine_topk_partitioned(
    emb: DataFrame,
    queries: DataFrame,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """IVF-style ANN: candidates restricted to the query's coarse cell."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(cell_col).alias("qcell"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col(cell_col).alias("ccell"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("qcell") == F.col("ccell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("cos", cosine(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos")
    )
