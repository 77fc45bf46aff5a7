"""A/B timing harness for bench-drift adjudication (VERDICT r13 #5).

Round 13's common-subset bench regressed 1.18x vs round 12 with a
near-uniform spread and zero spread-aware suspects — consistent with
sandbox noise, but two noisy rounds must not compound into a silent
1.4x. This script times an explicit query list against ONE repo tree
(pass the tree root as argv[1]) so the driver-of-record can run it
back-to-back against HEAD and a worktree pinned at the r12 commit
(a81e44f) on an otherwise-quiet machine:

    git worktree add /tmp/r12tree a81e44f
    python scripts/ab_drift.py /root/repo      > /tmp/ab_head.json
    python scripts/ab_drift.py /tmp/r12tree    > /tmp/ab_r12.json
    python scripts/ab_drift.py /root/repo      > /tmp/ab_head2.json  # ABA

One JSON line: {"tree": ..., "sf": ..., "queries": {name: best_sec},
"spread": {name: [s1, s2, s3]}}. Interleave/repeat (ABA) to separate
machine drift from code drift.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: the eight >1.3x movers from BENCH_DELTA (r12 -> r13 common subset)
MOVERS = [
    "stream_minhash_incremental",
    "dd_cluster_incremental",
    "dd_winnow_clusters",
    "t_docs_minhash_pipeline",
    "j17_bloom_prejoin",
    "t_dsir_importance",
    "t_dsir_bucket_audit",
    "f_recursive_cte_gapfill",
]


def main() -> None:
    tree = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else os.getcwd()
    sys.path.insert(0, tree)
    from burst_db_spark.registry import all_queries
    from burst_db_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(app_name="ab_drift")
    specs = all_queries()
    # same warmup as bench.py so JIT/footer caches don't bias run 1
    specs["p10_dedup_distinct"].build(spark, sf_dir).count()

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in MOVERS:
        if name not in specs:
            continue
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            specs[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(samples)
        spreads[name] = samples
    print(
        json.dumps(
            {
                "tree": tree,
                "sf": sf_dir,
                "queries": timings,
                "spread": spreads,
                "total": round(sum(timings.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
