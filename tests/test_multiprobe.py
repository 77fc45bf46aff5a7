"""Multi-probe IVF: probe selection invariants + recall vs single-probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


def _topk_pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


class TestProbeCells:
    def test_probes_distinct_and_first_is_argmin(self, spark):
        emb = load(spark, SF_DIR, "embeddings").limit(50)
        cents = sim.lsh_planes(8, dim=64)
        probed = sim.probe_cells(emb, cents, nprobe=3)
        single = sim.assign_cells(emb, cents, out_col="cell").select("vec_id", "cell")
        joined = {r["vec_id"]: r for r in probed.join(single, "vec_id").collect()}
        for r in joined.values():
            assert len(r["probes"]) == 3
            assert len(set(r["probes"])) == 3
            assert r["probes"][0] == r["cell"]

    def test_nprobe_bounds(self, spark):
        emb = load(spark, SF_DIR, "embeddings").limit(5)
        cents = sim.lsh_planes(4, dim=64)
        import pytest

        with pytest.raises(ValueError):
            sim.probe_cells(emb, cents, nprobe=5)


class TestMultiProbeRecall:
    def test_recall_not_below_single_probe(self, spark):
        emb = load(spark, SF_DIR, "embeddings")
        cents = sim.lsh_planes(8, dim=64)
        queries = emb.where(F.col("vec_id") < 25)
        exact = _topk_pairs(sim.cosine_topk(emb, queries, k=3))

        cand = sim.assign_cells(emb, cents, out_col="ccell")
        qp = sim.probe_cells(queries, cents, nprobe=2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.explode("probes").alias("pcell"),
        )

        def search(q):
            from pyspark.sql import Window

            scored = (
                cand.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("cv"),
                    "ccell",
                )
                .join(
                    F.broadcast(q),
                    (F.col("ccell") == F.col("pcell"))
                    & (F.col("neighbor_id") != F.col("query_id")),
                )
                .withColumn("cos", sim.cosine(F.col("qv"), F.col("cv")))
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("cos").desc(), F.col("neighbor_id")
            )
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= 3)
                .select("query_id", "neighbor_id")
            )

        multi = _topk_pairs(search(qp))
        single = _topk_pairs(search(qp.where(F.col("pcell").isNotNull()).join(
            sim.assign_cells(queries, cents, out_col="own").select(
                F.col("vec_id").alias("query_id"), "own"
            ),
            "query_id",
        ).where(F.col("pcell") == F.col("own")).drop("own")))

        r_single = len(single & exact) / len(exact)
        r_multi = len(multi & exact) / len(exact)
        # more probed cells can only widen the candidate pool, so recall
        # never drops (top-k membership itself may reshuffle)
        assert r_multi >= r_single
        assert r_multi > 0


class TestQueryDirectedProbing:
    """max_probe_bits: fixed-budget margin-directed probing
    (Lv et al. 2007) — the knob that keeps probe volume independent
    of r at scale (SCALING.md round-9 rung)."""

    def _emb(self, spark):
        from burst_db_spark.catalog import load
        from tests.conftest import SF_DIR

        return load(spark, SF_DIR, "embeddings").select(
            "vec_id", "embedding"
        )

    def test_budget_at_or_above_r_is_exact_flip_all(self, spark):
        """T >= r takes the DIRECTED kernel (clamped to r); its
        margin-ranked masks are then exactly the r single-bit flips, so
        the pair set must equal the static flip-all branch. r9 ADVICE:
        the old gate (directed only when T < r) sent both calls down
        the flip-all branch and compared flip-all to itself."""
        from burst_db_spark.operators.similarity import (
            lsh_near_dup_pairs_multiprobe as mp,
        )

        emb = self._emb(spark)
        base = {(r.id_a, r.id_b) for r in mp(emb).collect()}
        for t in (4, 7):  # exactly r, and clamped-above-r
            got = {
                (r.id_a, r.id_b)
                for r in mp(emb, max_probe_bits=t).collect()
            }
            assert got == base, t

    def test_budgeted_pairs_are_subset_with_recall(self, spark):
        from burst_db_spark.operators.similarity import (
            lsh_near_dup_pairs_multiprobe as mp,
        )

        emb = self._emb(spark)
        base = {(r.id_a, r.id_b) for r in mp(emb).collect()}
        t2 = {
            (r.id_a, r.id_b) for r in mp(emb, max_probe_bits=2).collect()
        }
        assert t2 <= base
        # the directed budget flips the MOST uncertain bits first, so
        # it keeps the bulk of flip-all's recall (measured 100% on the
        # synthetic corpus; gate loosely to stay robust to fixtures)
        assert len(t2) >= 0.8 * len(base)
