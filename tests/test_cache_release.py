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


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_release_dedup_frees_all_cached_blocks(spark):
    """A long-lived session running all three dedup paths back-to-back
    must end with NO NET cached RDD blocks after release_dedup — no
    reliance on session-wide clearCache. Delta-based (not absolute
    zero): earlier tests in the same session can leave localCheckpoint
    RDDs that clearCache legitimately cannot free, and those are not
    this contract's to clean (they release via the ContextCleaner when
    their DataFrames are collected)."""
    spark.catalog.clearCache()
    base = _n_cached(spark)
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")

    for build in (
        lambda: ngram_jaccard_pairs(docs, "doc_id", threshold=0.5),
        lambda: jaccard_prefix_pairs(docs, "doc_id", threshold=0.5),
        lambda: minhash_lsh_dedup(docs, "doc_id", threshold=0.5),
        lambda: containment_prefix_pairs(docs, "doc_id", threshold=0.6),
    ):
        res = build()
        res.count()  # materialize (populates the persisted frames)
        assert _n_cached(spark) > base  # the persist actually happened
        release_dedup(res)
        assert _n_cached(spark) == base  # and the release freed it all


def test_release_dedup_is_safe_on_foreign_frames(spark):
    """release_dedup on a frame that never came from a dedup builder is
    a no-op, not an error (same contract as release_grid_nn)."""
    df = load(spark, SF_DIR, "region")
    release_dedup(df)
    release_dedup(df.select(F.col("r_regionkey")))
