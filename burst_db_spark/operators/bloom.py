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

    NULL keys test FALSE — the same semantics as
    :func:`bloom_contained_count`, which drops NULL array elements
    (a NULL can't be a member; previously the f-string hashed None into
    the literal key ``"None"``, so a scalar probe and an exploded array
    probe could disagree on NULL rows).
    """
    bc = spark.sparkContext.broadcast(bits)
    m, k = m_bits, k_hashes

    @F.pandas_udf("boolean")
    def _test(vals: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        ok = vals.notna().to_numpy(dtype=bool)
        safe = vals.fillna("")
        for j in range(k):
            pos = _positions(safe, j, m)
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

    Split execution: the k md5 bit POSITIONS per element are computed
    JVM-side in whole-stage codegen (``transform`` + ``md5`` +
    ``conv`` — identical values to the Python ``_positions`` family,
    so oracle parity holds), and the Arrow UDF only gathers bits from
    the broadcast array and reduces per row in numpy. Hashing in the
    Python worker measured ~10x slower than this split on the same
    data (per-string hashlib + object conversion dominated).
    """
    bc = spark.sparkContext.broadcast(bits)
    k = k_hashes

    def per_key(s: Column) -> Column:
        return F.array(
            *[
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), s)), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % m_bits
                for j in range(k_hashes)
            ]
        )

    # NULL elements can't be members — drop them JVM-side, otherwise
    # md5(concat(.., NULL)) yields NULL positions that crash the numpy
    # int64 conversion in the worker
    positions = F.flatten(
        F.transform(
            F.filter(keys_array, lambda s: s.isNotNull()), per_key
        )
    )

    @F.pandas_udf("int")
    def _count(pos_arrays: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        lengths = np.fromiter(
            (0 if v is None else len(v) for v in pos_arrays),
            dtype=np.int64,
            count=len(pos_arrays),
        )
        counts = np.zeros(len(pos_arrays), dtype=np.int64)
        total = int(lengths.sum())
        if total:
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in pos_arrays
                 if v is not None and len(v)]
            )
            hit = (arr[flat // 8] & (1 << (flat % 8)).astype(np.uint8)) != 0
            # element i of a row is flagged iff ALL its k consecutive
            # position bits are set
            ok = hit.reshape(-1, k).all(axis=1).astype(np.int64)
            nz = np.nonzero(lengths)[0]
            starts = (np.cumsum(lengths) - lengths) // k
            counts[nz] = np.add.reduceat(ok, starts[nz])
        return pd.Series(counts.astype("int32"))

    return _count(positions)
