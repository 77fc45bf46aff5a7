"""Deterministic Bloom filter for membership pruning at corpus scale.

The decontamination join (eval shingles ⋈ train shingles,
queries/pipeline_text.py) shuffles BOTH shingle sets at 100 TB. The
Bloom path replaces it: build a fixed-size bit array from the train
side (distributed partial bitsets, OR-reduced), broadcast it, and test
eval shingles map-side — the train side is never shuffled again and the
eval side never shuffles at all. False positives are the documented
trade (rate ≈ (1 - e^{-kn/m})^k); false negatives are impossible.

Every hash is the repo's portable md5 family (seed j → md5("j:" + key),
first 8 hex digits, mod m), so the EXACT bit positions — and therefore
the exact false-positive set — are reproducible relationally in the
DuckDB oracle. A Bloom filter whose mistakes the correctness gate can
predict is a Bloom filter you can regression-test.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(values: pd.Series, seed: int, m_bits: int) -> np.ndarray:
    return np.fromiter(
        (
            int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:8], 16) % m_bits
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


def build_bloom(
    df: DataFrame, key_col: str, m_bits: int = 1 << 17, k_hashes: int = 3
) -> bytes:
    """Build the packed bit array from a key column, distributed.

    Each partition sets bits into its own m/8-byte array (numpy,
    Arrow-batched); the driver ORs the per-partition arrays. At 100 TB
    the array count equals the partition count, so the driver fold is
    partitions × m/8 bytes — for bigger m, OR in a treeAggregate; the
    per-partition build is unchanged.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.zeros(m_bits // 8, dtype=np.uint8)
        for pdf in batches:
            for j in range(k_hashes):
                pos = _positions(pdf[key_col], j, m_bits)
                np.bitwise_or.at(arr, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        yield pd.DataFrame({"bits": [arr.tobytes()]})

    parts = df.select(key_col).mapInPandas(build, "bits binary").collect()
    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
    return acc.tobytes()


def bloom_contains(
    spark,
    key: Column,
    bits: bytes,
    m_bits: int = 1 << 17,
    k_hashes: int = 3,
) -> Column:
    """Map-side membership test against a broadcast bit array.

    The bitset rides to executors as a real Spark broadcast (one copy
    per executor, not per task); the test is an Arrow-batched pandas
    UDF — all-k-bits-set, vectorized over the batch.
    """
    bc = spark.sparkContext.broadcast(bits)
    m, k = m_bits, k_hashes

    @F.pandas_udf("boolean")
    def _test(vals: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        ok = np.ones(len(vals), dtype=bool)
        for j in range(k):
            pos = _positions(vals, j, m)
            ok &= (arr[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
        return pd.Series(ok)

    return _test(key)


def bloom_contained_count(
    spark,
    keys_array: Column,
    bits: bytes,
    m_bits: int = 1 << 17,
    k_hashes: int = 3,
) -> Column:
    """Row-local membership COUNT over an array column: how many
    elements of ``keys_array`` test positive against the broadcast bit
    array. Same md5 position family as ``bloom_contains`` (so the same
    deterministic false positives), but evaluated per ROW over the
    whole array — no explode, no downstream aggregation. This is what
    makes a per-document decision (>= N contaminated shingles) a
    STATELESS map: the streaming decontamination path needs exactly one
    stateful operator (its final rollup), not two.
    """
    bc = spark.sparkContext.broadcast(bits)
    m, k = m_bits, k_hashes

    @F.pandas_udf("int")
    def _count(arrays: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)

        def one(vals) -> int:
            if vals is None or len(vals) == 0:
                return 0
            ok = np.ones(len(vals), dtype=bool)
            for j in range(k):
                pos = _positions(pd.Series(list(vals)), j, m)
                ok &= (arr[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
            return int(ok.sum())

        return arrays.map(one).astype("int32")

    return _count(keys_array)
