"""r15: data-derived shuffle/state partition counts for one-shot
micro-batch drains (burst_db_spark.streaming.drain_shuffle).

The derivation must be a pure function of the staged INPUT DATA — never
of the core count — so the driver's 8-core and 32-core bench runs
execute the identical streaming shape, and at large volume the byte
term grows the parallelism back."""

from __future__ import annotations

import os

from burst_db_spark.streaming import (
    _DRAIN_MAX_PARTITIONS,
    _DRAIN_TARGET_BYTES,
    drain_partitions,
    drain_shuffle,
)


def _stage(tmp_path, name: str, n_files: int, bytes_per_file: int) -> str:
    d = tmp_path / name
    d.mkdir()
    for i in range(n_files):
        (d / f"part-{i:05d}.parquet").write_bytes(b"\0" * bytes_per_file)
    # metadata files must NOT count
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".part-00000.crc").write_bytes(b"\0" * 1024)
    return str(d)


def test_file_count_floor(tmp_path):
    p = _stage(tmp_path, "tiny", 4, 1024)
    assert drain_partitions(p) == 4  # 4 staged files, bytes ~0


def test_byte_term_grows_with_volume(tmp_path):
    small = _stage(tmp_path, "small", 1, 1024)
    big = _stage(tmp_path, "big", 1, 3 * _DRAIN_TARGET_BYTES + 1)
    assert drain_partitions(small) == 1
    assert drain_partitions(big) == 4  # ceil(3*64MiB+1 / 64MiB)


def test_cap(tmp_path):
    lots = _stage(tmp_path, "lots", 4097, 1)
    assert drain_partitions(lots) == _DRAIN_MAX_PARTITIONS


def test_multiple_paths_sum(tmp_path):
    a = _stage(tmp_path, "a", 2, 1024)
    b = _stage(tmp_path, "b", 3, 1024)
    assert drain_partitions(a, b) == 5


def test_core_count_independent(tmp_path, monkeypatch):
    # the derivation must not consult the scheduler/core count at all
    p = _stage(tmp_path, "x", 2, 1024)
    monkeypatch.setattr(os, "cpu_count", lambda: 999)
    assert drain_partitions(p) == 2


def test_conf_scoping_restores(spark, tmp_path):
    p = _stage(tmp_path, "y", 3, 1024)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with drain_shuffle(spark, p) as n:
        assert n == 3
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_conf_restored_on_error(spark, tmp_path):
    p = _stage(tmp_path, "z", 1, 1024)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with drain_shuffle(spark, p):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
