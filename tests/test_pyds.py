"""Python DataSource API (sources/pyds.py): the zarr_py registered
format must infer the schema from .zarray, declare one InputPartition
per chunk, and return exactly what the mapInPandas reader returns."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.sources.pyds import ZarrPyDataSource, register_zarr_py
from burst_db_spark.sources.zarr import read_zarr_array, write_zarr_cube
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def cube_store(spark):
    store = os.path.join(tempfile.mkdtemp(prefix="pyds_"), "cube")
    li = load(spark, SF_DIR, "lineitem")
    cells = (
        li.select(
            ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate") - 1).alias(
                "t"
            ),
            (F.col("l_suppkey") % 8).alias("si"),
            (F.col("l_partkey") % 8).alias("pi"),
            F.floor("l_quantity").cast("bigint").alias("q"),
        )
        .groupBy("t", "si", "pi")
        .agg(F.sum("q").cast("bigint").alias("v"))
    )
    write_zarr_cube(
        cells,
        store,
        ["t", "si", "pi"],
        "v",
        shape=(84, 8, 8),
        chunks=(12, 8, 8),
        compressor={"id": "zlib", "level": 6},
    )
    register_zarr_py(spark)
    return store


def test_schema_inferred_and_partition_per_chunk(spark, cube_store):
    df = (
        spark.read.format("zarr_py")
        .option("store", cube_store)
        .option("dims", "t,si,pi")
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<t:bigint,si:bigint,pi:bigint,value:bigint>"
    )
    # 84/12 = 7 time chunks, 1 chunk per other dim
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 84 * 8 * 8


def test_matches_mapinpandas_reader(spark, cube_store):
    via_ds = (
        spark.read.format("zarr_py")
        .option("store", cube_store)
        .option("dims", "t,si,pi")
        .load()
    )
    via_fn = read_zarr_array(spark, cube_store, dim_names=["t", "si", "pi"])
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, via_fn.collect())
    )


def test_value_col_and_missing_store_errors(spark, cube_store):
    df = (
        spark.read.format("zarr_py")
        .option("store", cube_store)
        .option("value_col", "qty")
        .load()
    )
    assert df.columns == ["i0", "i1", "i2", "qty"]
    with pytest.raises(Exception):
        spark.read.format("zarr_py").load().collect()


def test_datasource_name():
    assert ZarrPyDataSource.name() == "zarr_py"


def test_stream_reader_incremental_append(spark, cube_store, tmp_path):
    """DataSourceStreamReader: run availableNow over the existing
    t-chunks, append a whole chunk row along dim 0 (+ patch .zarray),
    restart from the same checkpoint — only the NEW chunk's rows are
    emitted (offset = processed t-chunk count), no duplicates, and the
    final sink equals a batch read of the grown store."""
    import json
    import shutil

    # work on a private copy: this test mutates the store
    store = str(tmp_path / "cube")
    shutil.copytree(cube_store, store)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("zarr_py")
            .option("store", store)
            .option("dims", "t,si,pi")
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == 84 * 8 * 8

    # append one whole t-chunk row: clone t-chunk 0's single file (the
    # chunk grid is (7, 1, 1)) and grow the declared shape 84 -> 96
    shutil.copyfile(os.path.join(store, "0.0.0"), os.path.join(store, "7.0.0"))
    zarray = os.path.join(store, ".zarray")
    meta = json.load(open(zarray))
    meta["shape"][0] = 96
    json.dump(meta, open(zarray, "w"))

    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 96 * 8 * 8
    assert got.groupBy("t", "si", "pi").count().where("count > 1").count() == 0
    # the streamed union equals a batch read of the grown store
    batch = (
        spark.read.format("zarr_py")
        .option("store", store)
        .option("dims", "t,si,pi")
        .load()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_reader_partial_chunk_growth(spark, cube_store, tmp_path):
    """ADVICE r5: rows appended INSIDE an already-partial edge chunk
    must not be skipped. Row-based offsets carry the .zarray snapshot
    that defined them, so batch N+1 re-enters the same chunk index with
    the in-chunk row range [old_shape, new_shape). Sequence: declare a
    partial edge chunk (78 of 84 rows), drain, grow it to full (84),
    drain, then append a whole new chunk (96) — every drain emits
    exactly the delta, no dupes, final sink == batch read."""
    import json
    import shutil

    store = str(tmp_path / "cube")
    shutil.copytree(cube_store, store)
    zarray = os.path.join(store, ".zarray")

    def set_shape(n):
        meta = json.load(open(zarray))
        meta["shape"][0] = n
        json.dump(meta, open(zarray, "w"))

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("zarr_py")
            .option("store", store)
            .option("dims", "t,si,pi")
            .load()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    set_shape(78)  # edge chunk 6 only partially filled (72..77)
    run_once()
    assert spark.read.parquet(sink).count() == 78 * 8 * 8

    set_shape(84)  # the partial chunk fills up — 6 new rows in chunk 6
    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 84 * 8 * 8
    assert got.groupBy("t", "si", "pi").count().where("count > 1").count() == 0

    # then a whole appended chunk still works on top
    shutil.copyfile(os.path.join(store, "0.0.0"), os.path.join(store, "7.0.0"))
    set_shape(96)
    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 96 * 8 * 8
    assert got.groupBy("t", "si", "pi").count().where("count > 1").count() == 0
    batch = (
        spark.read.format("zarr_py")
        .option("store", store)
        .option("dims", "t,si,pi")
        .load()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
