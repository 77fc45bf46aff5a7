"""Sort-by-filter-column layout → parquet row-group statistics become
disjoint → pushed predicates skip whole row groups at scan time. The
100 TB scan lever that partition pruning (p12) doesn't cover: WITHIN-file
skipping on a non-partition column.

Evidence pinned here, without trusting any single layer blindly:
1. Spark pushes the range predicate into the scan (PushedFilters).
2. The sorted layout's row-group [min,max] ranges intersect a narrow
   range predicate in only a small fraction of row groups; the shuffled
   layout's row groups ALL intersect it (every group spans the full
   value range), so nothing can be skipped no matter how good the
   reader is. Layout, not reader cleverness, is what buys the skip.
"""

from __future__ import annotations

import contextlib
import io
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from tests.conftest import SF_DIR


def _candidate_row_groups(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(intersecting, total) row groups across all parquet parts."""
    total = inter = 0
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st.min <= hi and st.max >= lo:
                inter += 1
    return inter, total


def test_sorted_layout_enables_row_group_skipping(spark):
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    base = tempfile.mkdtemp(prefix="bds_layout_")
    sorted_path = os.path.join(base, "sorted")
    shuffled_path = os.path.join(base, "shuffled")
    # small row groups so even sf0.001 yields several per file
    rg_conf = {"parquet.block.size": 64 * 1024}
    (
        li.repartitionByRange(4, "l_extendedprice")
        .sortWithinPartitions("l_extendedprice")
        .write.options(**rg_conf)
        .mode("overwrite")
        .parquet(sorted_path)
    )
    li.repartition(4).write.options(**rg_conf).mode("overwrite").parquet(
        shuffled_path
    )

    lo, hi = 30000.0, 31000.0
    s_inter, s_total = _candidate_row_groups(sorted_path, "l_extendedprice", lo, hi)
    r_inter, r_total = _candidate_row_groups(
        shuffled_path, "l_extendedprice", lo, hi
    )
    assert s_total >= 4 and r_total >= 4
    # shuffled: every row group spans the value range -> zero skippable
    assert r_inter == r_total
    # sorted: the narrow band lives in a small minority of row groups
    assert s_inter <= max(1, s_total // 3), (s_inter, s_total)

    # and Spark actually pushes the predicate into the scan
    df = spark.read.parquet(sorted_path).where(
        (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") < hi)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_extendedprice" in plan
    # both layouts agree on the answer, obviously
    n_sorted = df.count()
    n_shuffled = (
        spark.read.parquet(shuffled_path)
        .where((F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") < hi))
        .count()
    )
    assert n_sorted == n_shuffled
