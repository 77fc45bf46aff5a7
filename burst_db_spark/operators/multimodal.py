"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract as mapInPandas stages.

The decode step is STUBBED (no image/audio libs in this container): the
real decoder raises NotImplementedError; ``fake_features`` is a
deterministic md5-derived stand-in so the Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signature — is real and tested.
At scale the pattern is: binary parquet column (or binaryFile source) →
repartition to spread blobs → mapInPandas decode → feature columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes int, sha1 string"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Make an opaque binary column + typed metadata from existing data
    (stands in for image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("application/octet-stream").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
        F.sha1(payload).alias("sha1"),
    )


def decode_media(payload: bytes) -> object:
    """The real decoder hook (PIL/librosa/ffmpeg territory)."""
    raise NotImplementedError(
        "media decoding needs image/audio libraries not present in this "
        "image; wire PIL/soundfile here and keep extract_features as-is"
    )


def _fake_feature_vector(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in features: md5-derived floats in [0, 1)."""
    out = []
    seed = payload or b""
    for i in range(dim):
        h = hashlib.md5(seed + bytes([i])).digest()
        out.append(int.from_bytes(h[:4], "big") / 2**32)
    return out


FEATURE_SCHEMA = "doc_id long, n_bytes int, features array<double>"


def extract_features(media: DataFrame, dim: int = 8, use_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``use_decoder=True`` routes through decode_media (raises until a real
    decoder is wired); default uses the deterministic fake so batch shape
    and schema are exercised end-to-end.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if use_decoder:
                    decode_media(raw)
                feats.append(_fake_feature_vector(raw, dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: deterministic
    sample indices from metadata only (no decode needed to PLAN the
    sampling; the decode of selected frames happens in extract_features)."""
    n_frames = (F.col("n_bytes") / 100).cast("int")  # fake frame count
    idx = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return media.select("doc_id", F.explode(idx).alias("frame_idx"))
