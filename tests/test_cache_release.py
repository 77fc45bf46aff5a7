"""Cache-release hygiene: every operator that persists an intermediate
must hand its caller a way to free it without nuking the whole session
cache. VERDICT r5 flagged the three dedup persists (shingle frame,
prefix doc frame, minhash signatures) as leak sites in long-lived
sessions; release_dedup() mirrors release_grid_nn/release_pagerank."""

from __future__ import annotations

from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators.dedup import (
    containment_prefix_pairs,
    jaccard_prefix_pairs,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    release_dedup,
)
from tests.conftest import SF_DIR


def _cached_ids(spark) -> set[int]:
    return {
        info.id()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_release_dedup_frees_all_cached_blocks(spark):
    """A long-lived session running all three dedup paths back-to-back
    must end with NO NET cached RDD blocks after release_dedup — no
    reliance on session-wide clearCache. Tracked by RDD-id SET, not
    count: earlier tests in the same session can leave localCheckpoint
    RDDs that clearCache legitimately cannot free, and the
    ContextCleaner may free those asynchronously mid-test — neither
    event touches the ids the dedup builders create, which is the
    contract under test."""
    spark.catalog.clearCache()
    base = _cached_ids(spark)
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")

    for build in (
        lambda: ngram_jaccard_pairs(docs, "doc_id", threshold=0.5),
        lambda: jaccard_prefix_pairs(docs, "doc_id", threshold=0.5),
        lambda: minhash_lsh_dedup(docs, "doc_id", threshold=0.5),
        lambda: containment_prefix_pairs(docs, "doc_id", threshold=0.6),
    ):
        res = build()
        res.count()  # materialize (populates the persisted frames)
        assert _cached_ids(spark) - base  # the persist actually happened
        release_dedup(res)
        # every block this builder cached is freed (stale pre-test ids
        # may come and go underneath; they are not ours to clean)
        assert not (_cached_ids(spark) - base)


def test_release_dedup_is_safe_on_foreign_frames(spark):
    """release_dedup on a frame that never came from a dedup builder is
    a no-op, not an error (same contract as release_grid_nn)."""
    df = load(spark, SF_DIR, "region")
    release_dedup(df)
    release_dedup(df.select(F.col("r_regionkey")))


def test_release_query_level_persists(spark):
    """r15 (VERDICT r14 item 6): the four QUERY-level persists flagged
    as leak sites also hand back release handles via the same
    `_dedup_cached` convention, so release_dedup(result) leaves no net
    cached blocks. (Persisted-but-unmaterialized entries unpersist
    cleanly too, so the test materializes through the query's own
    action path first.)"""
    from burst_db_spark.registry import all_queries

    specs = all_queries()
    spark.catalog.clearCache()
    base = _cached_ids(spark)
    for name in (
        "dd_lsh_quality_audit",
        "t_docs_minhash_pipeline",
        "t_cluster_safe_splits",
        "knn_ivf_learned_exhaustive",
        "dd_docs_cascade_pipeline",
    ):
        res = specs[name].build(spark, SF_DIR)
        res.count()
        assert getattr(res, "_dedup_cached", ()), name
        assert _cached_ids(spark) - base, name
        release_dedup(res)
        leftover = _cached_ids(spark) - base
        assert not leftover, (name, leftover)
