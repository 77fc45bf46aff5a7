#!/usr/bin/env python
"""Scale probe: replicate the sf0.1 tables ~10x (≈ sf1: 6M lineitem rows,
100k events-per-day equivalent, 50k docs) into /tmp and measure how the
headline operators scale vs sf0.1. Linear-ish ratios (≈10x work in ≈10x
time or less on fixed cores) are the evidence that the plans hold at
scale; superlinear blowups flag quadratic candidates.

Usage: python scale_probe.py [replication_factor]
Writes one JSON line: {"sf0.1_sec": {...}, "sf1_sec": {...}, "ratio": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from burst_db_spark.catalog import TABLES, load
from burst_db_spark.registry import all_queries
from burst_db_spark.session import get_spark

PROBE_QUERIES = [
    "q1_pricing_summary",
    "frame_lookup",
    "j2_fact_dim_broadcast",
    "w3_batch_labels",
    "ep2_burst_catalog",
    "dd_exact",
    "dd_minhash_lsh",
    "t_quality_score",
    "q5_local_supplier_volume",
    "dd_embedding_nn",
    "a3_dissolve_union_area",
    "t_pack_sequences",
    "t_split_assign",
]

# keys to shift per replica so replicated rows don't collapse into the
# same groups (they stay distinct entities, growing the key space too)
KEY_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": [],
    "supplier": [],
    "nation": [],
    "region": [],
}
SHIFT = 10_000_000


def replicate(spark, src_dir: str, out_dir: str, factor: int) -> None:
    for t in TABLES:
        df = load(spark, src_dir, t)
        if not KEY_SHIFTS.get(t):
            df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
            continue
        reps = []
        for r in range(factor):
            cur = df
            for k in KEY_SHIFTS[t]:
                cur = cur.withColumn(k, F.col(k) + F.lit(r * SHIFT))
            reps.append(cur)
        out = reps[0]
        for cur in reps[1:]:
            out = out.unionByName(cur)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


def time_queries(spark, specs, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in PROBE_QUERIES:
        spark.catalog.clearCache()
        df = specs[name].build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale_probe")
    specs = all_queries()
    base = "/root/testdata/sf0.1"
    big = tempfile.mkdtemp(prefix="bds_sf1_")
    try:
        replicate(spark, base, big, factor)
        small = time_queries(spark, specs, base)
        large = time_queries(spark, specs, big)
        ratio = {
            k: round(large[k] / small[k], 1) if small[k] > 0 else None
            for k in small
        }
        print(
            json.dumps(
                {
                    "factor": factor,
                    "sf0.1_sec": small,
                    f"sf{factor / 10:g}_sec": large,
                    "ratio": ratio,
                }
            )
        )
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
