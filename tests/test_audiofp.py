"""Audio fingerprinting: volume/requantization robustness, Spark pair
mining, hot-hash guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.operators.audio import decode_wav, encode_wav
from iceberg_python_spark.operators.audiofp import (
    audio_fingerprints,
    audio_neardup_pairs,
    fingerprint_samples,
)

RATE = 8000


def _clip(key, amp=0.5):
    rng = np.random.RandomState(key)
    t = np.arange(RATE * 2) / RATE
    x = np.zeros_like(t)
    for _ in range(4):
        f0, sweep = rng.uniform(300, 2000), rng.uniform(-400, 400)
        x += np.sin(2 * np.pi * (f0 + sweep * t) * t + rng.uniform(0, 6)) * rng.uniform(0.3, 1.0)
    seg = RATE // 8
    env = np.repeat(rng.uniform(0.2, 1.0, len(t) // seg + 1), seg)[: len(t)]
    x = x * env
    return x / np.max(np.abs(x)) * amp


def test_fingerprint_volume_invariant_and_discriminative():
    """Volume change + 16-bit WAV requantization keep most frame
    hashes; different content shares none; short clips yield none."""
    def hs(key, amp):
        dec, r = decode_wav(encode_wav(_clip(key, amp), RATE))
        return set(fingerprint_samples(dec, r).tolist())

    for key in (3, 11, 29):
        base, loud, other = hs(key, 0.5), hs(key, 0.9), hs(key + 50, 0.5)
        assert len(base & loud) >= 12
        assert len(base & other) == 0
    assert len(fingerprint_samples(np.zeros(100), RATE)) == 0


def test_audio_neardup_pairs_clusters_by_content(spark):
    rows = []
    for i in range(24):
        key, amp = i % 6, (0.9 if i >= 12 else 0.5)
        rows.append((i, bytearray(encode_wav(_clip(key, amp), RATE))))
    df = spark.createDataFrame(rows, "id: long, payload: binary")
    fps = audio_fingerprints(df, "id", "payload")
    pairs = audio_neardup_pairs(fps, min_shared=12).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(x, y) for x in range(24) for y in range(x + 1, 24) if x % 6 == y % 6}
    assert got == want  # every same-content pair, no cross-content pair
    # corrupt payload isolates to its marker row
    bad = spark.createDataFrame(
        [(0, bytearray(encode_wav(_clip(0), RATE))), (1, bytearray(b"not audio"))],
        "id: long, payload: binary",
    )
    out = audio_fingerprints(bad, "id", "payload")
    assert out.where("clip_id = 1").collect()[0]["decode_ok"] is False
    assert out.where("clip_id = 0 AND decode_ok").count() > 0


def test_audio_neardup_hot_hash_guard(spark):
    """A hash shared by every clip (boilerplate/silence analog) must
    be dropped by max_bucket before the self-join explodes."""
    rows = [(i, j, 777, True) for i in range(40) for j in range(3)]  # hot hash
    rows += [(i, 99, 1000 + i, True) for i in range(40)]  # unique per clip
    fps = spark.createDataFrame(rows, "clip_id: long, frame_idx: int, hash: long, decode_ok: boolean")
    pairs = audio_neardup_pairs(fps, min_shared=1, max_bucket=10)
    assert pairs.count() == 0  # hot hash dropped, uniques don't pair
    pairs2 = audio_neardup_pairs(fps, min_shared=1, max_bucket=1000)
    assert pairs2.count() == 40 * 39 // 2  # without the guard: full clique
