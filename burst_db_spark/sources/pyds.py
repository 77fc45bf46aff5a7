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
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)


class ZarrPyDataSource(DataSource):
    """``format("zarr_py")`` — READ options:

    - ``store`` (required): path to the zarr v2 array directory;
    - ``dims`` (optional): comma-separated dim column names (default
      ``i0,i1,...``);
    - ``value_col`` (optional): value column name (default ``value``).

    WRITE options (``df.write`` / ``writeStream``): ``store``, ``dims``
    and the cube geometry ``shape``/``chunks`` (comma-separated ints)
    are required; ``value_col``, ``dtype`` (numpy spec, default
    ``<i8``), ``compressor`` (JSON, e.g. ``{"id":"zlib","level":6}``)
    and ``fill`` are optional. Input must be partitioned so no chunk
    spans two tasks — use ``sources.zarr.chunk_repartitioned``; the
    commit verifies the contract.
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

    def writer(self, schema, overwrite: bool) -> "ZarrPyWriter":
        return ZarrPyWriter(
            _parse_write_options(self.options, schema), overwrite
        )

    def streamWriter(self, schema, overwrite: bool) -> "ZarrPyStreamWriter":
        return ZarrPyStreamWriter(_parse_write_options(self.options, schema))


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


# ---------------------------------------------------------------------------
# Write path: DataSourceArrowWriter (batch) + DataSourceStreamArrowWriter
# (append streaming) — the other half of the V2 surface, so
# ``df.write.format("zarr_py")`` / ``writeStream.format("zarr_py")`` work
# symmetrically with the readers above.


def _parse_write_options(options, schema) -> dict:
    """Validate and normalize writer options into a picklable spec."""
    import json as _json

    import numpy as np

    store = options.get("store")
    if not store:
        raise ValueError("zarr_py writer requires .option('store', <path>)")
    dims_opt = options.get("dims")
    if not dims_opt:
        raise ValueError("zarr_py writer requires .option('dims', 'a,b,...')")
    dims = [d.strip() for d in dims_opt.split(",")]
    value_col = options.get("value_col", "value")
    cols = set(schema.fieldNames())
    missing = [c for c in [*dims, value_col] if c not in cols]
    if missing:
        raise ValueError(f"zarr_py writer: columns {missing} not in input")
    shape_opt, chunks_opt = options.get("shape"), options.get("chunks")
    if not shape_opt or not chunks_opt:
        raise ValueError(
            "zarr_py writer requires .option('shape', 'n,...') and "
            ".option('chunks', 'c,...') (the logical cube geometry)"
        )
    shape = [int(x) for x in shape_opt.split(",")]
    chunks = [int(x) for x in chunks_opt.split(",")]
    if not (len(shape) == len(chunks) == len(dims)):
        raise ValueError("dims/shape/chunks rank mismatch")
    dtype = options.get("dtype", "<i8")
    np.dtype(dtype)  # validate early, on the driver
    comp = options.get("compressor")
    return {
        "store": store,
        "dims": dims,
        "value_col": value_col,
        "shape": shape,
        "chunks": chunks,
        "dtype": dtype,
        "compressor": _json.loads(comp) if comp else None,
        "fill": int(options.get("fill", "0")),
    }


def _write_task_chunks(spec: dict, staging: str, batches) -> list[str]:
    """Executor-side: assemble this task's rows into FULL chunk blocks
    and write them into the staging dir. Returns chunk file names.

    Contract (verified at commit): the input is partitioned so that no
    chunk's rows span two tasks — ``chunk_repartitioned`` (sources/
    zarr.py) produces exactly that layout with one hash exchange."""
    import os

    import numpy as np

    from burst_db_spark.sources.zarr import _compress

    chunks_t = tuple(spec["chunks"])
    np_dtype = np.dtype(spec["dtype"])
    ndim = len(chunks_t)
    blocks: dict[tuple, "np.ndarray"] = {}
    for rb in batches:
        cols = {
            rb.schema.names[j]: rb.column(j).to_numpy(zero_copy_only=False)
            for j in range(rb.num_columns)
        }
        idx = [cols[d].astype(np.int64, copy=False) for d in spec["dims"]]
        vals = cols[spec["value_col"]]
        cidx = np.stack([idx[d] // chunks_t[d] for d in range(ndim)], axis=1)
        order = np.lexsort(cidx.T[::-1])
        cidx, vals = cidx[order], vals[order]
        idx = [a[order] for a in idx]
        uniq, starts = np.unique(cidx, axis=0, return_index=True)
        bounds = [*starts.tolist(), len(vals)]
        for u, lo, hi in zip(uniq, bounds[:-1], bounds[1:]):
            key = tuple(int(x) for x in u)
            blk = blocks.get(key)
            if blk is None:
                blk = blocks[key] = np.full(
                    chunks_t, spec["fill"], dtype=np_dtype
                )
            local = tuple(
                idx[d][lo:hi] - key[d] * chunks_t[d] for d in range(ndim)
            )
            blk[local] = vals[lo:hi].astype(np_dtype, copy=False)
    written = []
    for key, blk in blocks.items():
        name = ".".join(str(k) for k in key)
        with open(os.path.join(staging, name), "wb") as f:
            f.write(_compress(blk.tobytes(order="C"), spec["compressor"]))
        written.append(name)
    return written


class _ZarrCommit(WriterCommitMessage):
    def __init__(self, chunks: list[str]) -> None:
        self.chunks = chunks


def _check_disjoint(messages) -> list[str]:
    seen: dict[str, int] = {}
    for i, m in enumerate(messages):
        for c in getattr(m, "chunks", []) or []:
            if c in seen:
                raise ValueError(
                    f"zarr_py writer: chunk {c} written by two tasks "
                    f"({seen[c]} and {i}) — repartition the input by the "
                    "chunk key first (sources.zarr.chunk_repartitioned)"
                )
            seen[c] = i
    return list(seen)


def _publish(spec: dict, staging: str, names: list[str]) -> None:
    """Driver-side atomic-ish publish: move staged chunk files into the
    store and (re)write .zarray. Renames are per-chunk atomic on a
    POSIX filesystem; readers racing a publish see old or new chunks,
    never torn ones."""
    import json as _json
    import os
    import shutil

    os.makedirs(spec["store"], exist_ok=True)
    for n in names:
        os.replace(os.path.join(staging, n), os.path.join(spec["store"], n))
    meta = {
        "zarr_format": 2,
        "shape": spec["shape"],
        "chunks": spec["chunks"],
        "dtype": spec["dtype"],
        "compressor": spec["compressor"],
        "fill_value": spec["fill"],
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    with open(os.path.join(spec["store"], ".zarray"), "w") as f:
        _json.dump(meta, f)
    shutil.rmtree(staging, ignore_errors=True)


class ZarrPyWriter(DataSourceArrowWriter):
    """Batch writer with a real two-phase commit: tasks stage full chunk
    files (no coordination — the partitioning contract makes chunk
    ownership exclusive, and commit() VERIFIES it), the driver then
    publishes staged chunks + .zarray or aborts and deletes the staging
    dir. ``mode("overwrite")`` replaces the store; ``append`` merges new
    chunk files over existing ones (unwritten chunks keep their data)."""

    def __init__(self, spec: dict, overwrite: bool) -> None:
        import os
        import uuid

        self.spec = spec
        self.overwrite = overwrite
        self.staging = os.path.join(
            os.path.dirname(spec["store"].rstrip("/")) or ".",
            f".zarr_staging_{uuid.uuid4().hex[:12]}",
        )
        os.makedirs(self.staging, exist_ok=True)

    def write(self, iterator) -> _ZarrCommit:
        return _ZarrCommit(
            _write_task_chunks(self.spec, self.staging, iterator)
        )

    def commit(self, messages) -> None:
        import os
        import shutil

        names = _check_disjoint(messages)
        if self.overwrite and os.path.isdir(self.spec["store"]):
            shutil.rmtree(self.spec["store"])
        _publish(self.spec, self.staging, names)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class ZarrPyStreamWriter(DataSourceStreamArrowWriter):
    """Streaming APPEND sink: each micro-batch stages its chunk files,
    and per-batch commit publishes them and GROWS shape[0] to cover the
    largest written t index (the same whole-rows-along-dim-0 growth
    model the stream READER consumes). Exactly-once across restarts:
    commit(batchId) is recorded in .zarr_stream_commits inside the
    store; a replayed batch re-stages identical chunk content but the
    already-committed batchId publishes idempotently (same bytes, same
    names) and the shape monotonically covers it."""

    def __init__(self, spec: dict) -> None:
        import os

        self.spec = spec
        # DETERMINISTIC staging path: Spark's streaming sink re-creates
        # the Python writer in a separate commit-runner process, so a
        # uuid chosen at construction would differ between the write
        # tasks and commit() — batches run sequentially and commit moves
        # only the files its messages name, so one shared dir is safe
        self.staging = spec["store"].rstrip("/") + ".staging"
        os.makedirs(self.staging, exist_ok=True)

    def write(self, iterator) -> _ZarrCommit:
        return _ZarrCommit(
            _write_task_chunks(self.spec, self.staging, iterator)
        )

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os

        names = _check_disjoint(messages)
        # grow the declared shape to the t extent this batch reaches
        t_hi = 0
        cs = self.spec["chunks"][0]
        for n in names:
            t_hi = max(t_hi, (int(n.split(".")[0]) + 1) * cs)
        spec = dict(self.spec)
        prev = 0
        marker = os.path.join(spec["store"], ".zarr_stream_commits")
        if os.path.exists(marker):
            prev = _json.load(open(marker)).get("t_rows", 0)
        spec["shape"] = [max(t_hi, prev, spec["shape"][0]),
                        *spec["shape"][1:]]
        _publish(spec, self.staging, names)
        with open(marker, "w") as f:
            _json.dump({"batch_id": batchId, "t_rows": spec["shape"][0]}, f)

    def abort(self, messages, batchId: int) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)
