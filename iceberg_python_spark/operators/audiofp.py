"""Audio fingerprinting and near-duplicate detection.

Completes the near-dup trilogy — MinHash-LSH for text, pHash banding
for images, and THIS for audio: a Haitsma-Kalker / Shazam-family
spectral fingerprint (sign of the band-energy delta across time and
frequency — the published robust-hash recipe, resilient to volume
change, requantization, mild noise; NOT to time-stretching, which is
out of scope like rotation is for pHash). One honest limit inherited
from the whole delta-sign family: on near-STATIONARY content (pure
held tones, silence) the time deltas are noise-dominated and frame
hashes won't reproduce across requantization — real speech/music is
non-stationary, which is what the bits measure.

Per clip: mono mix → framed FFT (Hann window) → log-spaced band
energies → one 31-bit frame hash per hop,
``bit[b] = (E[b,t] − E[b,t−1]) − (E[b+1,t] − E[b+1,t−1]) > 0``.
Frame hashes are the join currency: two clips match when they share
enough exact frame hashes — candidate generation is an equi-join on
the hash value (the text-LSH analysis carries over: hot hashes =
silence/boilerplate frames; drop or salt).

Spark shape: fingerprinting is one Arrow-batched pass per payload
(numpy FFT, no Python per frame); the pair join keys on (hash) and
aggregates shared-frame counts per pair — candidate volume is bounded
by hash-bucket occupancy, never |clips|².
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["fingerprint_samples", "audio_fingerprints", "audio_neardup_pairs"]


def fingerprint_samples(
    x: np.ndarray,
    rate: int,
    n_bands: int = 32,
    frame: int = 1024,
    hop: int = 512,
) -> np.ndarray:
    """Frame hashes (int64 array, one 31-bit value per hop) for float
    samples shaped (n,) or (n_frames, n_channels)."""
    if x.ndim == 2:
        x = x.mean(axis=1)
    x = np.asarray(x, dtype=np.float64)
    if len(x) < frame + hop:
        return np.zeros(0, dtype=np.int64)
    n_hops = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_hops)[:, None]
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    # log-spaced band edges over [300 Hz, rate/2) — the speech/music band
    lo = max(1, int(300 * frame / rate))
    hi = spec.shape[1] - 1
    edges = np.unique(
        np.round(np.geomspace(lo, hi, n_bands + 2)).astype(int)
    )
    if len(edges) < 3:
        return np.zeros(0, dtype=np.int64)
    # segment j sums spec[edges[j]:edges[j+1]); drop reduceat's final
    # to-end overflow segment
    e = np.add.reduceat(spec, edges[:-1], axis=1)[:, :-1]
    # sign of the time-delta difference between adjacent bands
    dt = np.diff(e, axis=0)  # (hops-1, bands)
    bits = (dt[:, :-1] - dt[:, 1:]) > 0  # (hops-1, bands-1)
    nb = min(31, bits.shape[1])
    weights = (1 << np.arange(nb, dtype=np.int64))[None, :]
    return (bits[:, :nb].astype(np.int64) * weights).sum(axis=1)


def audio_fingerprints(
    df: DataFrame, id_col: str, binary_col: str, n_bands: int = 32,
    frame: int = 1024, hop: int = 512,
) -> DataFrame:
    """One row per (clip, frame index) with the 31-bit frame hash —
    the exploded, joinable fingerprint table (persistable exactly like
    BM25 postings / the LSH index). Corrupt payloads yield zero rows
    for that clip plus a ``decode_ok=false`` marker row at index −1."""
    from .audio import decode_audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for cid, payload in zip(b[id_col], b[binary_col]):
                cid = int(cid)
                try:
                    x, rate = decode_audio(bytes(payload))
                    hs = fingerprint_samples(x, rate, n_bands, frame, hop)
                    rows.extend(
                        {"clip_id": cid, "frame_idx": int(i), "hash": int(h), "decode_ok": True}
                        for i, h in enumerate(hs)
                    )
                except (ValueError, NotImplementedError):
                    rows.append(
                        {"clip_id": cid, "frame_idx": -1, "hash": None, "decode_ok": False}
                    )
            yield pd.DataFrame(
                rows, columns=["clip_id", "frame_idx", "hash", "decode_ok"]
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema="clip_id long, frame_idx int, hash long, decode_ok boolean"
    )


def audio_neardup_pairs(
    fps: DataFrame,
    min_shared: int = 16,
    max_bucket: int = 1024,
) -> DataFrame:
    """Near-duplicate clip pairs from a fingerprint table: clips
    sharing at least ``min_shared`` exact (hash, frame-offset-agnostic)
    frame hashes. Hash values occurring in more than ``max_bucket``
    DISTINCT CLIPS are dropped before the self-join (the count runs
    after the per-clip distinct, so a clip repeating one hash
    thousands of times never trips the guard — join fan-out is
    clips², which is exactly what the threshold bounds) — the
    silence/boilerplate guard every hash-bucket join needs (same knob
    as text LSH's over-full buckets). Returns (id_a, id_b,
    shared_frames) with id_a < id_b."""
    src = fps.where(F.col("decode_ok") & F.col("hash").isNotNull()).select(
        "clip_id", "hash"
    )
    # distinct hash per clip: repeated frames inside one clip must not
    # inflate the shared count quadratically
    src = src.distinct()
    hot = src.groupBy("hash").agg(F.count("*").alias("_n")).where(
        F.col("_n") > max_bucket
    )
    src = src.join(hot.select("hash"), "hash", "left_anti")
    a, b = src.alias("a"), src.alias("b")
    return (
        a.join(
            b,
            (F.col("a.hash") == F.col("b.hash"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .groupBy(
            F.col("a.clip_id").alias("id_a"), F.col("b.clip_id").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("shared_frames"))
        .where(F.col("shared_frames") >= min_shared)
    )
