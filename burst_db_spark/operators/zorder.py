"""Z-order (Morton) clustering: interleave the bits of quantized x/y so
spatially-near rows sort near each other — the data-layout half of a
spatial engine (Delta/Iceberg ``OPTIMIZE ZORDER BY``, Hudi space-curves).

Why it matters at 100 TB: parquet prunes row groups by min/max stats.
A bbox predicate over randomly-ordered data touches every file; after a
Z-order sort, the same predicate's x and y ranges map to a contiguous
Morton range, so file/row-group min/max stats eliminate most of the scan.
``zorder_write`` is repartitionByRange + sortWithinPartitions on the
code — a single range exchange, the same cost as any global sort, paid
once at write time.

The code itself is pure integer bit arithmetic (shift/and/or unrolled per
bit) — whole-stage-codegen'd in Spark and bit-identical in the DuckDB
oracle, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of two non-negative ints:
    result bit 2i = x bit i, bit 2i+1 = y bit i."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(1), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y.cast("bigint"), i).bitwiseAND(1), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out.cast("bigint")


def morton_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_code` (same unrolled bit arithmetic)."""
    # fully parenthesize each term: DuckDB gives | and << EQUAL
    # precedence (left-assoc, Postgres-style), so an unwrapped
    # `a << i | b << j` parses as `((a << i) | b) << j`
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " | ".join(parts) + " AS BIGINT)"


def quantize(v: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a double in [lo, hi] onto the integer grid [0, 2^bits - 1]."""
    cells = (1 << bits) - 1
    scaled = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells + 1))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)).cast("bigint")


def quantize_sql(v: str, lo: float, hi: float, bits: int = 16) -> str:
    cells = (1 << bits) - 1
    return (
        f"CAST(least(greatest(floor(({v} - {lo!r}) / {hi - lo!r} * "
        f"{float(cells + 1)!r}), 0), {cells}) AS BIGINT)"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    lo: float,
    hi: float,
    bits: int = 16,
    n_files: int = 8,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` parquet clustered by Morton code: one range exchange
    (repartitionByRange on the code → equal-depth files) + an in-partition
    sort, so every file owns a compact Morton interval and its x/y min/max
    stats are tight."""
    code = morton_code(
        quantize(F.col(x_col), lo, hi, bits),
        quantize(F.col(y_col), lo, hi, bits),
        bits,
    )
    (
        df.withColumn("__z", code)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.options(**(writer_options or {}))
        .mode("overwrite")
        .parquet(path)
    )
