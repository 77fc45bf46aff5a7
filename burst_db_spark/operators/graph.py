"""Graph analytics over edge DataFrames: bounded-iteration PageRank.

Connected components (operators/dedup.py) covers reachability; this adds
the importance-propagation family. PageRank here is the POWER-ITERATION
formulation as pure DataFrame ops:

    p_{k+1}(v) = (1-d)/N + d · Σ_{u→v} p_k(u) / outdeg(u)

- Each iteration is ONE shuffle: edges join current ranks on src
  (broadcast when the rank table is small, shuffled hash join at scale),
  then a groupBy on dst.
- Dangling mass: nodes with no outgoing edges leak rank in the plain
  formulation; the canonical fix redistributes their mass uniformly.
  For bounded-iteration ORACLE parity we keep the simple leak semantics
  (both engines compute the identical thing) — callers wanting the
  stochastic-matrix variant pass ``redistribute_dangling=True`` (not
  SQL-mirrored; pytest-covered).
- Cross-engine determinism: the per-target sum folds contributions in
  SOURCE-ID order (array_sort + F.aggregate ≡ DuckDB list_reduce over
  list(... ORDER BY src)), so float addition order is pinned and the
  ranks are bit-identical, not merely close — same discipline as the
  BM25/LM scorers.

At 100 TB scale the rank table is node-sized and the edge table
edge-sized; k iterations = k bounded shuffles. No driver state beyond
the iteration counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    redistribute_dangling: bool = False,
) -> DataFrame:
    """(id, rank) after ``iterations`` power steps from the uniform
    start. ``edges`` rows must be distinct (dedup upstream)."""
    n_nodes = nodes.count()  # driver scalar: one number, sizes the teleport
    teleport = (1.0 - damping) / n_nodes

    deg = edges.groupBy(src).agg(F.count("*").cast("long").alias("__deg")).persist()
    ranks = nodes.select(
        F.col(id_col).alias("__v"),
        F.lit(1.0 / n_nodes).alias("__p"),
    )
    prev = None
    for _ in range(iterations):
        contribs = (
            edges.join(ranks.withColumnRenamed("__v", src), src)
            .join(deg, src)
            .select(
                F.col(dst).alias("__v"),
                F.col(src).alias("__src"),
                (F.col("__p") / F.col("__deg")).alias("__c"),
            )
        )
        summed = (
            contribs.groupBy("__v")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("__src", "__c"))
                ).alias("__cs")
            )
            .select(
                "__v",
                F.aggregate(
                    "__cs", F.lit(0.0), lambda acc, x: acc + x["__c"]
                ).alias("__in"),
            )
        )
        new_ranks = (
            ranks.join(summed, "__v", "left")
            .select(
                "__v",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("__p"),
            )
        )
        if redistribute_dangling:
            dangling = (
                ranks.join(deg.withColumnRenamed(src, "__v"), "__v", "left_anti")
                .agg(F.sum("__p"))
                .first()[0]
                or 0.0
            )
            new_ranks = new_ranks.select(
                "__v",
                (
                    F.col("__p") + F.lit(damping * dangling / n_nodes)
                ).alias("__p"),
            )
        # materialize each step: without this, step k's lazy plan
        # recomputes steps 1..k-1 (O(k²) shuffles total instead of O(k))
        new_ranks = new_ranks.persist()
        new_ranks.count()
        if prev is not None:
            prev.unpersist()
        prev = new_ranks
        ranks = new_ranks
    deg.unpersist()
    return ranks.select(F.col("__v").alias(id_col), F.col("__p").alias("rank"))


def pagerank_oracle_sql(
    edges_sql: str,
    nodes_sql: str,
    iterations: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB twin: the power iteration unrolled into ``iterations``
    CTE layers, contributions folded in src order (list_reduce) so the
    doubles match Spark's bit-for-bit."""
    # CAST the damping literal to DOUBLE: DuckDB parses bare `0.85` as
    # DECIMAL(3,2), making `1.0 - 0.85` EXACTLY 0.15 — while Spark/Python
    # compute the IEEE double 0.15000000000000002. The cast reproduces
    # the double-arithmetic bit pattern.
    d_lit = f"CAST({damping} AS DOUBLE)"
    it_ctes = []
    prev = "p0"
    for k in range(1, iterations + 1):
        it_ctes.append(f"""
    s{k} AS (
        SELECT e.dst AS v,
               list_reduce(list_prepend(0.0,
                   list(p.p / d.deg ORDER BY e.src)), (a, b) -> a + b)
                   AS inflow
        FROM edges e
        JOIN {prev} p ON p.v = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ),
    p{k} AS (
        SELECT n.v,
               (CAST(1.0 AS DOUBLE) - {d_lit}) / nn.n
                   + {d_lit} * coalesce(s{k}.inflow, 0.0) AS p
        FROM nodes_v n CROSS JOIN nn LEFT JOIN s{k} ON s{k}.v = n.v
    )""")
        prev = f"p{k}"
    return f"""
    WITH edges AS ({edges_sql}),
    nodes_v AS (SELECT v FROM ({nodes_sql})),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes_v),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
    p0 AS (SELECT v, 1.0 / nn.n AS p FROM nodes_v CROSS JOIN nn),
    {",".join(it_ctes)}
    SELECT v AS id, p AS rank FROM {prev}
    """
