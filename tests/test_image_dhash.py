"""Perceptual dHash + pigeonhole Hamming join: brute-force recall
equivalence, the perceptual invariance that motivates dHash, and the
guard on the pigeonhole precondition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from burst_db_spark.operators.multimodal import (
    DHASH_N_BANDS,
    decode_bmp,
    dhash_neardup_pairs,
    encode_bmp,
    image_dhash,
)


def _img(seed: int, h: int = 20, w: int = 24, shift: int = 0) -> np.ndarray:
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    k = np.arange(3).reshape(1, 1, 3)
    return (
        ((r * 13 + c * 29 + k * 17) * (1 + 2 * (seed % 13)) + seed * 41 + shift)
        % 256
    ).astype(np.uint8)


def _media(spark, imgs):
    pdf = pd.DataFrame(
        [{"doc_id": i, "payload": encode_bmp(im)} for i, im in imgs]
    )
    return spark.createDataFrame(pdf)


def test_bmp_roundtrip_preserves_pixels():
    im = _img(5)
    assert (decode_bmp(encode_bmp(im))["pixels"] == im).all()


def test_uniform_brightness_shift_keeps_hash_close(spark):
    """The dHash property: a small uniform brightness change flips at
    most the wrap-boundary comparison bits."""
    imgs = [(1, _img(3, shift=0)), (2, _img(3, shift=2))]
    hs = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(_media(spark, imgs)).collect()
    }
    assert bin(hs[1] ^ hs[2]).count("1") <= 3


def test_different_images_are_far(spark):
    imgs = [(1, _img(3)), (2, _img(4))]
    hs = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(_media(spark, imgs)).collect()
    }
    assert bin(hs[1] ^ hs[2]).count("1") > 10


def test_banded_join_equals_brute_force(spark):
    """Pigeonhole recall is EXACT: banded candidates + popcount verify
    == the quadratic definition, for every pair."""
    imgs = []
    did = 0
    for seed in range(12):
        for shift in range(3):
            did += 1
            imgs.append((did, _img(seed, h=16 + seed % 5, w=18 + seed % 7,
                                    shift=shift)))
    hashes = image_dhash(_media(spark, imgs))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_neardup_pairs(hashes, max_hamming=3).collect()
    }
    hs = {r["doc_id"]: r["dhash"] for r in hashes.collect()}
    want = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hs[a] ^ hs[b]).count("1")
            if d <= 3:
                want.add((a, b, d))
    assert got == want
    assert want  # non-vacuous: the fixture contains true near-dups


def test_pigeonhole_precondition_guard(spark):
    imgs = [(1, _img(1))]
    hashes = image_dhash(_media(spark, imgs))
    with pytest.raises(ValueError):
        dhash_neardup_pairs(hashes, max_hamming=DHASH_N_BANDS)


def test_banded_join_plan_is_equi_join(spark):
    imgs = [(1, _img(1)), (2, _img(2))]
    plan = (
        dhash_neardup_pairs(image_dhash(_media(spark, imgs)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Audio energy-profile hash (the 1-D analog, same pairing operator)

from burst_db_spark.operators.multimodal import (  # noqa: E402
    AUDIO_HASH_WINDOW,
    AUDIO_HASH_WINDOWS,
    audio_energy_hash,
    decode_wav,
    encode_wav_pcm16,
)


def _wave(seed: int, tail_shift: int = 0) -> list[int]:
    n = AUDIO_HASH_WINDOW * AUDIO_HASH_WINDOWS
    out = []
    for t in range(n):
        x = ((t * (3 + seed % 11) + (t * t) // (7 + seed % 13) + seed * 97)
             % 4001) - 2000
        if t >= n - AUDIO_HASH_WINDOW:
            x += tail_shift
        out.append(x)
    return out


def _wav_media(spark, waves):
    pdf = pd.DataFrame(
        [{"doc_id": i, "payload": encode_wav_pcm16(w)} for i, w in waves]
    )
    return spark.createDataFrame(pdf)


def test_wav_roundtrip_preserves_samples():
    w = _wave(3)
    assert list(decode_wav(encode_wav_pcm16(w))["samples"]) == w


def test_audio_hash_matches_python_reference(spark):
    """Independent recompute of the energy-profile hash."""
    waves = [(1, _wave(4)), (2, _wave(9))]
    got = {
        r["doc_id"]: r["dhash"]
        for r in audio_energy_hash(_wav_media(spark, waves)).collect()
    }
    for doc_id, w in waves:
        en = [
            sum(abs(x) for x in w[i * AUDIO_HASH_WINDOW:(i + 1) * AUDIO_HASH_WINDOW])
            for i in range(AUDIO_HASH_WINDOWS)
        ]
        want = sum(
            1 << i for i in range(AUDIO_HASH_WINDOWS - 1) if en[i + 1] > en[i]
        )
        assert got[doc_id] == want


def test_audio_tail_perturbation_is_near(spark):
    waves = [(1, _wave(5)), (2, _wave(5, tail_shift=2))]
    got = {
        r["doc_id"]: r["dhash"]
        for r in audio_energy_hash(_wav_media(spark, waves)).collect()
    }
    assert bin(got[1] ^ got[2]).count("1") <= 1


def test_audio_different_waves_are_far(spark):
    waves = [(1, _wave(5)), (2, _wave(6))]
    got = {
        r["doc_id"]: r["dhash"]
        for r in audio_energy_hash(_wav_media(spark, waves)).collect()
    }
    assert bin(got[1] ^ got[2]).count("1") > 10


# ---------------------------------------------------------------------------
# mapInArrow zero-copy blob stats

from burst_db_spark.operators.multimodal import blob_byte_stats  # noqa: E402


def test_blob_byte_stats_matches_python(spark):
    payloads = [b"", b"\x00", b"abc", bytes(range(256)), b"\xff" * 1000]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["byte_sum"])
        for r in blob_byte_stats(df).collect()
    }
    want = {i: (len(p), sum(p)) for i, p in enumerate(payloads)}
    assert got == want


def test_blob_byte_stats_many_rows_multibatch(spark):
    rows = [(i, bytes([i % 256]) * (i % 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(4)
    got = {
        r["doc_id"]: (r["n_bytes"], r["byte_sum"])
        for r in blob_byte_stats(df).collect()
    }
    want = {i: (len(p), sum(p)) for i, p in rows}
    assert got == want


def test_blob_byte_stats_all_empty_column(spark):
    """An all-empty binary column may carry a None Arrow data buffer —
    must report n_bytes=0, never crash in np.frombuffer."""
    df = spark.createDataFrame(
        [(1, b""), (2, b"")], "doc_id long, payload binary"
    ).coalesce(1)
    got = {r["doc_id"]: r["n_bytes"] for r in blob_byte_stats(df).collect()}
    assert got == {1: 0, 2: 0}


def test_blob_byte_stats_rejects_null_payload(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "doc_id long, payload binary"
    ).coalesce(1)
    with pytest.raises(Exception, match="null payloads"):
        blob_byte_stats(df).collect()


def test_audio_hash_short_clip_raises_clearly(spark):
    short = [(1, _wave(3)[: AUDIO_HASH_WINDOW * 2])]  # far below the floor
    with pytest.raises(Exception, match="samples"):
        audio_energy_hash(_wav_media(spark, short)).collect()
