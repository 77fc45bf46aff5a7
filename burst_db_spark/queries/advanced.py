"""Queries that started life rows-only and were promoted to DERIVED
ORACLES round by round:

- w5_reference_dates: stateful scan whose emission rule depends on prior
  emissions (reference_dates.py:105-157) → applyInPandas; since r10 the
  state machine is replayed by a DuckDB recursive CTE, so the row set is
  hash-checked, not just counted.
- mm_features: multimodal binary plumbing; the deterministic md5 stub
  features are reproduced byte-exactly in SQL.
(stream_session_counts and stream_daily_counts were never rows-only:
driven in COMPLETE mode their streamed output equals the batch SQL
exactly, so both carry real oracles.)
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.catalog import load
from burst_db_spark.operators import multimodal as mm
from burst_db_spark.plans.reference_dates import reference_dates
from burst_db_spark.registry import register


# W5 promoted from rows-only to a DERIVED ORACLE (VERDICT r9 item #2):
# the reference's stateful emission loop (reference_dates.py:105-157)
# carries state (n_refs, first_ref, group_count) that a DuckDB recursive
# CTE threads through per-key ordered rows — every key advances in
# lockstep on row_number, so the recursion depth is max acquisitions per
# key, not total rows. With no per-frame event dates the merge rule is
# inert and the transition is exactly:
#   emit at t  ⟺  floor((t - first_ref)/1d) >= n_refs*interval
#                 AND group_count+1 >= min_acquisitions.
# The state machine is a function of the sorted VALUE sequence only, so
# tie order between equal timestamps cannot diverge from Python's
# stable sort. interval_days=7, min_acquisitions=5 (the registry
# binding below).
_W5_ORACLE = """
    WITH RECURSIVE ord AS (
        SELECT CAST(user_id AS INTEGER) AS frame_fid, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        FROM events
    ),
    walk AS (
        SELECT frame_fid, rn, ts,
               1 AS n_refs, ts AS first_ref, 1 AS grp, TRUE AS is_ref
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.frame_fid, o.rn, o.ts,
               CASE WHEN CAST(floor((epoch(o.ts) - epoch(w.first_ref))
                                    / 86400.0) AS BIGINT) >= w.n_refs * 7
                         AND w.grp + 1 >= 5
                    THEN w.n_refs + 1 ELSE w.n_refs END,
               w.first_ref,
               CASE WHEN CAST(floor((epoch(o.ts) - epoch(w.first_ref))
                                    / 86400.0) AS BIGINT) >= w.n_refs * 7
                         AND w.grp + 1 >= 5
                    THEN 0 ELSE w.grp + 1 END,
               CAST(floor((epoch(o.ts) - epoch(w.first_ref))
                          / 86400.0) AS BIGINT) >= w.n_refs * 7
                   AND w.grp + 1 >= 5
        FROM walk w JOIN ord o
          ON o.frame_fid = w.frame_fid AND o.rn = w.rn + 1
    )
    SELECT frame_fid, CAST(n_refs AS INTEGER) AS ref_idx, ts AS ref_date
    FROM walk WHERE is_ref
    """


@register(
    "w5_reference_dates",
    oracle=_W5_ORACLE,
    tags=("W5", "applyInPandas", "derived-oracle", "recursive-cte"),
)
def w5_reference_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-date selection per user over the events stream (7-day
    stretching interval, ≥5 acquisitions per batch) — the reference's
    core stateful product, hash-checked against a recursive-CTE replay
    of the same state machine (the kmeans-IVF derived-oracle trick)."""
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("int").alias("frame_fid"),
        F.col("ts").alias("sensing_time"),
    )
    return reference_dates(ev, interval_days=7, min_acquisitions=5)


@register(
    "mm_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(('0x' || substr(md5(text || chr(0)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS f0,
           CAST(('0x' || substr(md5(text || chr(3)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS f3
    FROM documents
    """,
    tags=("multimodal", "mapInPandas"),
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata + deterministic (stub) feature vectors —
    now ORACLE-CHECKED: the md5-derived fake features are integers over
    2^32 (an exact power-of-two quotient, so the doubles are identical),
    and DuckDB reproduces the byte-level md5 seeding with chr(i)
    concatenation over the same UTF-8 payload bytes."""
    docs = load(spark, sf_dir, "documents")
    media = mm.attach_binary_payload(docs, "doc_id")
    feats = mm.extract_features(media, dim=4)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.element_at("features", 1).alias("f0"),
        F.element_at("features", 4).alias("f3"),
    )


@register(
    "stream_session_counts",
    oracle="""
    WITH s AS (
        SELECT user_id, ts,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INTEGER) AS session_id
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                        OR epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id))
                           >= 43200
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        )
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 43200 SECONDS AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    tags=("streaming", "session_window", "oracle-checked"),
)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window streaming aggregation driven with
    trigger(availableNow) in COMPLETE output mode — every session
    emitted, none held back by a watermark — so the streamed result must
    equal the batch gap-sessionization bit-for-bit. The oracle is the
    same lag/cumsum session SQL that anchors w2_sessionize (session end
    = last event + gap, new session when gap >= 12 h), making this the
    streaming twin of w2 with a REAL correctness row instead of
    rows-only."""
    from burst_db_spark.streaming import incremental as st

    src = load(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="bds_stream_")
    data_dir = f"{tmp}/in"
    src.write.parquet(data_dir)
    schema = src.schema
    stream = st.file_stream(spark, data_dir, schema)
    agg = (
        stream.groupBy(
            F.session_window(F.col("ts"), "43200 seconds"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    # r15 (guide §2.2/§5): data-derived state partitions for the drain.
    from burst_db_spark.streaming import drain_shuffle

    with drain_shuffle(spark, data_dir):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "mm_wav_roundtrip",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(least(greatest(floor(value * 10 + 0.5), -32000), 32000)
                    AS INTEGER) AS smp
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(smp) AS BIGINT) AS sum_s,
           CAST(min(smp) AS INTEGER) AS min_s,
           CAST(max(smp) AS INTEGER) AS max_s,
           CAST(sum(smp) AS DOUBLE) / count(*) AS mean_s
    FROM s GROUP BY user_id
    """,
    tags=("multimodal", "audio", "real-decode"),
)
def mm_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode end-to-end: per-user event values quantized to
    PCM16, encoded into actual WAV containers (stdlib wave), carried as a
    binary column, decoded back by decode_media's magic-byte dispatch,
    and reduced to integer sample statistics. The oracle reproduces the
    quantization relationally, so the decoded aggregates hash-match —
    proof the binary path is a real format round-trip, not a stub."""
    ev = load(spark, sf_dir, "events")
    return mm.audio_roundtrip_features(ev, key="user_id", value_col="value",
                                       order_col="event_id")


@register(
    "stream_corpus_dedup",
    oracle="""
    SELECT md5(lower(trim(text))) AS digest,
           min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY 1
    """,
    tags=("streaming", "dedup", "pipeline", "oracle-checked"),
)
def stream_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion + exact dedup: the documents table
    arrives as files, the digest groupBy runs as a streaming aggregation
    in COMPLETE mode driven to completion with trigger(availableNow) —
    and must equal the BATCH dd_exact manifest bit-for-bit. This is the
    ingest shape of a continuously-fed training corpus: the dedup
    manifest stays current as shards land, with state keyed by digest."""
    import uuid as _uuid

    from burst_db_spark.streaming import incremental as st

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="bds_corpus_stream_")
    data_dir = f"{tmp}/in"
    docs.write.parquet(data_dir)
    stream = st.file_stream(spark, data_dir, docs.schema)
    agg = (
        stream.select(
            "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("digest")
        )
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )
    name = f"corpus_{_uuid.uuid4().hex[:8]}"
    # r15 (guide §2.2/§5): data-derived state partitions for the drain.
    from burst_db_spark.streaming import drain_shuffle

    with drain_shuffle(spark, data_dir):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(0,
               greatest(octet_length(encode(text)) // 100 - 1, 0), 10))
               AS frame_idx
    FROM documents
    """,
    tags=("multimodal", "video", "frame-sample"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling PLAN for video-like payloads: every 10th frame
    index, derived from byte-length metadata alone — the cheap planning
    pass that decides which frames a later decode stage touches (the
    decode itself never runs here). Pure column arithmetic, so the
    oracle reproduces the sampled index set exactly."""
    docs = load(spark, sf_dir, "documents")
    media = mm.attach_binary_payload(docs, "doc_id")
    return mm.frame_sample_plan(media, every_n=10).select(
        "doc_id", F.col("frame_idx").cast("bigint").alias("frame_idx")
    )


@register(
    "mm_bmp_resize",
    oracle="""
    WITH s AS (
        SELECT s_suppkey AS doc_id,
               5 + s_suppkey % 7 AS h, 6 + s_suppkey % 5 AS w
        FROM supplier
    ),
    g AS (
        SELECT doc_id, h, w, r.r, c.c, k.k
        FROM s
        CROSS JOIN (SELECT unnest(range(16)) AS r) r
        CROSS JOIN (SELECT unnest(range(16)) AS c) c
        CROSS JOIN (SELECT unnest(range(3)) AS k) k
    ),
    v AS (
        SELECT doc_id,
               (doc_id * 7 + ((r * h) // 16) * 5 + ((c * w) // 16) * 3 + k)
                   % 256 AS px
        FROM g
    )
    SELECT doc_id, CAST(sum(px) AS BIGINT) AS sum_px,
           CAST(min(px) AS INTEGER) AS min_px,
           CAST(max(px) AS INTEGER) AS max_px
    FROM v GROUP BY doc_id
    """,
    tags=("multimodal", "image", "resize", "real-decode"),
)
def mm_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image pipeline end-to-end: deterministic RGB images (pixel =
    affine function of doc id and coordinates) are encoded into actual
    24-bit BMP containers, carried as a binary column, decoded by
    decode_media's magic-byte dispatch, nearest-neighbor resized to
    16×16 with the integer floor index map, and reduced to pixel stats.
    The oracle recomputes every resized pixel relationally — the hash
    match proves container encode, decode, and resample are all exact."""
    import numpy as np
    import pandas as pd

    from burst_db_spark.operators.multimodal import encode_bmp, image_resize_stats

    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("doc_id"),
        (5 + F.col("s_suppkey") % 7).cast("int").alias("h"),
        (6 + F.col("s_suppkey") % 5).cast("int").alias("w"),
    )

    def _make(batches):
        for pdf in batches:
            rows = []
            for doc_id, h, w in zip(pdf["doc_id"], pdf["h"], pdf["w"]):
                r = np.arange(h).reshape(h, 1, 1)
                c = np.arange(w).reshape(1, w, 1)
                k = np.arange(3).reshape(1, 1, 3)
                img = ((int(doc_id) * 7 + r * 5 + c * 3 + k) % 256).astype(np.uint8)
                rows.append({"doc_id": doc_id, "payload": encode_bmp(img)})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    media = supp.mapInPandas(_make, "doc_id long, payload binary")
    return image_resize_stats(media, 16, 16)


@register(
    "stream_daily_counts",
    oracle="""
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18, 6))) AS DECIMAL(28, 6))
                AS DOUBLE) AS total_value
    FROM events GROUP BY user_id, date_trunc('day', ts)
    """,
    tags=("streaming", "window", "oracle-checked"),
)
def stream_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregation with a REAL
    oracle: daily counts + sums driven to completion with
    trigger(availableNow) in COMPLETE output mode (every window emitted,
    none held back by a watermark), so the streamed result must equal
    the batch GROUP BY bit-for-bit. The sum accumulates in DECIMAL
    (stream task order is nondeterministic) and lands as DOUBLE on both
    engine sides. Spark's window('1 day') is epoch-aligned = UTC
    date_trunc."""
    from burst_db_spark.streaming import incremental as st

    src = load(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="bds_stream_daily_")
    data_dir = f"{tmp}/in"
    src.write.parquet(data_dir)
    stream = st.file_stream(spark, data_dir, src.schema)
    agg = (
        stream.groupBy(F.window(F.col("ts"), "1 day"), F.col("user_id"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("window.start").alias("day_start"),
            "n",
            "total_value",
        )
    )
    name = f"daily_{uuid.uuid4().hex[:8]}"
    # r15 (guide §2.2/§5): data-derived state partitions for the drain.
    from burst_db_spark.streaming import drain_shuffle

    with drain_shuffle(spark, data_dir):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
