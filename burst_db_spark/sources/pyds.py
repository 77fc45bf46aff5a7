"""Spark 4 Python DataSource API surface: the zarr v2 store exposed as
a REGISTERED source — ``spark.read.format("zarr_py").option("store",
...).load()`` — instead of a helper function.

Why both this and ``sources/zarr.read_zarr_array`` (mapInPandas): the
DataSource API is the idiomatic Spark-4 integration point — schema
inference happens in ``schema()`` (driver reads only ``.zarray``),
parallelism is declared via ``partitions()`` (one InputPartition per
chunk, so a 1000-executor cluster fans chunks out with locality-free
scheduling), and workers stream ``pyarrow.RecordBatch``es straight into
the scan (Arrow path, no pickled rows). Column pruning and filtering
stay in Spark on top of the scan, exactly like any V2 source.

Reference parity: reference reads GFS cubes via xr.open_zarr
(egms-snow-comparison-data-prep.ipynb cells 3-9); here the store itself
is a first-class Spark source.

Cluster note: workers import this module by name, so on a real cluster
the package ships via ``spark.submit.pyFiles`` (local mode shares the
driver's path). The store must be on shared storage — same requirement
as every file-based source.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class ZarrPyDataSource(DataSource):
    """``format("zarr_py")`` — options:

    - ``store`` (required): path to the zarr v2 array directory;
    - ``dims`` (optional): comma-separated dim column names (default
      ``i0,i1,...``);
    - ``value_col`` (optional): value column name (default ``value``).
    """

    @classmethod
    def name(cls) -> str:
        return "zarr_py"

    def _meta(self) -> tuple[dict, list[str], str]:
        from burst_db_spark.sources.zarr import _load_meta, _SPARK_TYPES

        store = self.options.get("store")
        if not store:
            raise ValueError("zarr_py requires .option('store', <path>)")
        meta = _load_meta(store)
        ndim = len(meta["shape"])
        dims_opt = self.options.get("dims")
        dims = (
            [d.strip() for d in dims_opt.split(",")]
            if dims_opt
            else [f"i{d}" for d in range(ndim)]
        )
        if len(dims) != ndim:
            raise ValueError(f"{len(dims)} dim names for {ndim}-d array")
        import numpy as np

        kind = np.dtype(meta["dtype"]).str[1:]
        spark_vt = _SPARK_TYPES.get(kind)
        if spark_vt is None:
            raise NotImplementedError(
                f"zarr dtype {meta['dtype']!r} not supported"
            )
        return meta, dims, spark_vt

    def schema(self) -> str:
        meta, dims, spark_vt = self._meta()
        value_col = self.options.get("value_col", "value")
        return ", ".join(f"{d} bigint" for d in dims) + f", {value_col} {spark_vt}"

    def reader(self, schema) -> "ZarrPyReader":
        meta, dims, _ = self._meta()
        return ZarrPyReader(
            self.options["store"], meta, dims, self.options.get("value_col", "value")
        )

    def streamReader(self, schema) -> "ZarrPyStreamReader":
        _, dims, _ = self._meta()
        return ZarrPyStreamReader(
            self.options["store"], dims, self.options.get("value_col", "value")
        )


class ZarrPyReader(DataSourceReader):
    def __init__(
        self, store: str, meta: dict, dims: Sequence[str], value_col: str = "value"
    ) -> None:
        self.store = store
        self.meta = meta
        self.dims = list(dims)
        self.value_col = value_col

    def partitions(self) -> list[InputPartition]:
        import itertools

        shape, chunks = self.meta["shape"], self.meta["chunks"]
        grid = [
            range((shape[d] + chunks[d] - 1) // chunks[d])
            for d in range(len(shape))
        ]
        return [InputPartition(list(t)) for t in itertools.product(*grid)]

    def read(self, partition: InputPartition) -> Iterator:
        """Executor-side: decode ONE chunk, yield one Arrow batch."""
        yield from _decode_chunk(
            self.store, self.meta, partition.value, self.dims, self.value_col
        )


def _decode_chunk(
    store: str,
    meta: dict,
    cidx: list,
    dims: list,
    value_col: str,
    t_range: tuple[int, int] | None = None,
) -> Iterator:
    """Decode one zarr chunk into (at most) one Arrow RecordBatch —
    shared by the batch reader and the stream reader. ``t_range``
    optionally restricts dim-0 to in-chunk rows [lo, hi) — the stream
    reader uses it to read exactly an offset-delimited row span of a
    partial edge chunk."""
    import os

    import numpy as np
    import pyarrow as pa

    from burst_db_spark.sources.zarr import _chunk_path, _decompress

    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    np_dtype = dtype.newbyteorder("=")
    ndim = len(shape)
    path = _chunk_path(store, cidx, meta.get("dimension_separator", "."))
    if os.path.exists(path):
        with open(path, "rb") as f:
            raw = _decompress(f.read(), meta.get("compressor"))
        arr = np.frombuffer(raw, dtype=dtype).reshape(
            chunks, order=meta.get("order", "C")
        )
        arr = arr.astype(np_dtype, copy=False)
    else:
        arr = np.full(chunks, meta.get("fill_value", 0), dtype=np_dtype)
    # trim edge-chunk overhang beyond the array bounds
    slices = tuple(
        slice(0, min(chunks[d], shape[d] - cidx[d] * chunks[d]))
        for d in range(ndim)
    )
    arr = arr[slices]
    t_lo = 0
    if t_range is not None:
        t_lo, t_hi = t_range
        arr = arr[t_lo : min(t_hi, arr.shape[0])]
    if arr.size == 0:
        return
    idx = np.indices(arr.shape).reshape(ndim, -1)
    cols = [
        pa.array(
            idx[d] + cidx[d] * chunks[d] + (t_lo if d == 0 else 0),
            type=pa.int64(),
        )
        for d in range(ndim)
    ] + [pa.array(arr.reshape(-1))]
    yield pa.RecordBatch.from_arrays(cols, names=dims + [value_col])


class ZarrPyStreamReader(DataSourceStreamReader):
    """Incremental zarr source: the store APPENDS rows along dim 0 (the
    time axis — how a satellite-product cube actually grows), and each
    micro-batch reads exactly the newly-appeared dim-0 rows. The offset
    is ROW-based — {"t_rows": shape[0], "meta": <.zarray snapshot>} —
    and the snapshot that observed the offset rides inside it, so
    ``partitions(start, end)`` plans with the EXACT shape latestOffset
    saw: a partial edge chunk that grows between latestOffset and
    partitions (or across a restart replay) cannot skip or double-read
    rows — the next batch picks up the same chunk index with the
    in-chunk row range [old_shape, new_shape). This closes the
    whole-chunk-multiple assumption the chunk-counting offset of
    round 5 carried (ADVICE r5). Exactly-once across restarts comes
    from the engine checkpointing the offset + commit log; legacy
    {"t_chunks": n} offsets from old checkpoints are converted with the
    old skip semantics (n * chunk_rows)."""

    def __init__(self, store: str, dims: Sequence[str], value_col: str) -> None:
        self.store = store
        self.dims = list(dims)
        self.value_col = value_col

    def _snapshot(self) -> dict:
        from burst_db_spark.sources.zarr import _load_meta

        return _load_meta(self.store)

    @staticmethod
    def _rows(off: dict, meta: dict) -> int:
        if "t_rows" in off:
            return off["t_rows"]
        return off.get("t_chunks", 0) * meta["chunks"][0]  # legacy offsets

    def initialOffset(self) -> dict:
        return {"t_rows": 0}

    def latestOffset(self) -> dict:
        meta = self._snapshot()
        return {"t_rows": meta["shape"][0], "meta": meta}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        import itertools

        # plan with the snapshot that DEFINED the end offset; only
        # legacy/initial offsets without one fall back to a fresh read
        meta = end.get("meta") or self._snapshot()
        cs = meta["chunks"][0]
        r0, r1 = self._rows(start, meta), self._rows(end, meta)
        rest = [
            range((meta["shape"][d] + meta["chunks"][d] - 1) // meta["chunks"][d])
            for d in range(1, len(meta["shape"]))
        ]
        return [
            InputPartition(
                {
                    "meta": meta,
                    "cidx": [t, *tail],
                    "t_range": [max(r0 - t * cs, 0), min(r1 - t * cs, cs)],
                }
            )
            for t in range(r0 // cs, (r1 + cs - 1) // cs)
            for tail in itertools.product(*rest)
        ]

    def read(self, partition: InputPartition) -> Iterator:
        p = partition.value
        yield from _decode_chunk(
            self.store,
            p["meta"],
            p["cidx"],
            self.dims,
            self.value_col,
            t_range=tuple(p["t_range"]),
        )

    def commit(self, end: dict) -> None:
        pass


def register_zarr_py(spark) -> None:
    """Idempotent registration of the zarr_py source on a session."""
    try:
        spark.dataSource.register(ZarrPyDataSource)
    except Exception as e:  # already registered
        if "already" not in str(e).lower():
            raise
