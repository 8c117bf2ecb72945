"""IMA (DVI) and Microsoft ADPCM WAV codecs — stdlib + numpy.

The two dominant COMPRESSED WAV layouts in legacy speech corpora and
telephony dumps (WAV fmt codes 0x11 and 0x02). Both are block codecs:
every `block_align`-byte block restarts the predictor from an in-block
header, so blocks decode independently — the decoders below run the
short in-block sample loop in Python but vectorize every step across
(blocks × channels) with numpy, which is also the honest distributed
shape (payloads decode whole inside Arrow batches; blocks inside a
payload are data-parallel).

Encoders exist so oracle rows and tests can synthesize deterministic
compressed payloads without any audio dependency (the same
encoder-for-oracle pattern as imaging/audio/video/flac).

References: IMA ADPCM step/index tables from the IMA Digital Audio
Compatibility Project spec; MS ADPCM coefficient/adaptation tables from
the Microsoft WAVE documentation (both public, reproduced in
multimedia-format references such as the libsndfile and FFmpeg docs).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)

_MS_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230],
    dtype=np.int32,
)
_MS_COEFS = np.array(
    [[256, 0], [512, -256], [0, 0], [192, 64], [240, 0], [460, -208], [392, -232]],
    dtype=np.int32,
)


def _ima_step(pred: np.ndarray, idx: np.ndarray, nib: np.ndarray) -> np.ndarray:
    """One IMA update, vectorized over (blocks, channels); mutates
    pred/idx in place and returns the new samples."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    diff += np.where(nib & 1, step >> 2, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 4, step, 0)
    np.copyto(pred, np.clip(np.where(nib & 8, pred - diff, pred + diff), -32768, 32767))
    np.copyto(idx, np.clip(idx + _IMA_INDEX[nib & 7], 0, 88))
    return pred.copy()


def decode_ima_adpcm(payload: bytes, n_ch: int, block_align: int) -> np.ndarray:
    """WAV IMA ADPCM (fmt 0x11) → int16 (n_frames, n_ch). Per-channel
    4-byte block headers (initial sample + step index), then 4-byte
    nibble groups interleaved channel-by-channel, low nibble first."""
    if block_align <= 4 * n_ch or (block_align - 4 * n_ch) % (4 * n_ch):
        raise ValueError("corrupt IMA ADPCM: bad block_align")
    nb = len(payload) // block_align
    if nb == 0:
        return np.zeros((0, n_ch), dtype=np.int16)
    blocks = np.frombuffer(payload[: nb * block_align], dtype=np.uint8).reshape(nb, block_align)
    hdr = blocks[:, : 4 * n_ch].reshape(nb, n_ch, 4)
    pred = (hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8)).astype(np.int16).astype(np.int32)
    idx = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)
    # data region: groups of 4 bytes per channel, channels interleaved
    n_groups = (block_align - 4 * n_ch) // (4 * n_ch)
    data = blocks[:, 4 * n_ch :].reshape(nb, n_groups, n_ch, 4)
    # nibble order within each byte: LOW first -> (nb, groups, ch, 8)
    nibs = np.stack([data & 0x0F, data >> 4], axis=-1).reshape(nb, n_groups, n_ch, 8)
    spb = 1 + n_groups * 8
    out = np.empty((nb, spb, n_ch), dtype=np.int16)
    out[:, 0, :] = pred.astype(np.int16)  # the header sample IS sample 0
    s = 1
    for g in range(n_groups):
        for k in range(8):
            out[:, s, :] = _ima_step(pred, idx, nibs[:, g, :, k].astype(np.int32))
            s += 1
    return out.reshape(nb * spb, n_ch)


def encode_ima_adpcm(
    pcm: np.ndarray, n_ch: int, samples_per_block: int = 505
) -> Tuple[bytes, int, int]:
    """int16 (n_frames, n_ch) → (payload, block_align,
    samples_per_block). samples_per_block must be 1 + a multiple of 8;
    the tail block is zero-padded (decoders emit the pad — callers
    track n_frames via the fact chunk, as WAV writers do)."""
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + 8k")
    x = np.asarray(pcm, dtype=np.int32).reshape(-1, n_ch)
    n = x.shape[0]
    nb = max(1, -(-n // samples_per_block))
    pad = nb * samples_per_block - n
    if pad:
        x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)]) if n else np.zeros((nb * samples_per_block, n_ch), np.int32)
    x = x.reshape(nb, samples_per_block, n_ch)
    n_groups = (samples_per_block - 1) // 8
    block_align = 4 * n_ch + 4 * n_ch * n_groups
    pred = x[:, 0, :].copy()
    # seed each block's step index near the block's mean sample delta —
    # legal (the decoder reads it from the header) and avoids the
    # attack transient of restarting every block at step 7
    mean_d = np.abs(np.diff(x, axis=1)).mean(axis=1) if samples_per_block > 1 else np.zeros((nb, n_ch))
    idx = np.clip(np.searchsorted(_IMA_STEPS, mean_d), 0, 88).astype(np.int32)
    idx0 = idx.copy()
    nibs = np.empty((nb, n_groups, n_ch, 8), dtype=np.uint8)
    s = 1
    for g in range(n_groups):
        for k in range(8):
            target = x[:, s, :]
            step = _IMA_STEPS[idx]
            delta = target - pred
            nib = np.where(delta < 0, 8, 0)
            ad = np.abs(delta)
            nib = nib | np.where(ad >= step, 4, 0)
            ad = ad - np.where(ad >= step, step, 0)
            half = step >> 1
            nib = nib | np.where(ad >= half, 2, 0)
            ad = ad - np.where(ad >= half, half, 0)
            quarter = step >> 2
            nib = nib | np.where(ad >= quarter, 1, 0)
            nibs[:, g, :, k] = nib.astype(np.uint8)
            _ima_step(pred, idx, nib)
            s += 1
    hdr = np.zeros((nb, n_ch, 4), dtype=np.uint8)
    first = x[:, 0, :].astype(np.int32) & 0xFFFF
    hdr[:, :, 0] = first & 0xFF
    hdr[:, :, 1] = first >> 8
    hdr[:, :, 2] = idx0.astype(np.uint8)
    data = (nibs[..., 0::2] | (nibs[..., 1::2] << 4)).reshape(nb, n_groups, n_ch, 4)
    blocks = np.concatenate([hdr.reshape(nb, -1), data.reshape(nb, -1)], axis=1)
    return blocks.astype(np.uint8).tobytes(), block_align, samples_per_block


def decode_ms_adpcm(payload: bytes, n_ch: int, block_align: int, coefs: np.ndarray | None = None) -> np.ndarray:
    """WAV Microsoft ADPCM (fmt 0x02) → int16 (n_frames, n_ch). Block
    header: per-channel coef index, initial delta, sample1, sample2
    (sample2 is OLDER and emitted first); then one signed nibble per
    channel, high nibble = channel 0."""
    coefs = _MS_COEFS if coefs is None else np.asarray(coefs, dtype=np.int32)
    hdr_bytes = 7 * n_ch
    if block_align <= hdr_bytes:
        raise ValueError("corrupt MS ADPCM: bad block_align")
    nb = len(payload) // block_align
    if nb == 0:
        return np.zeros((0, n_ch), dtype=np.int16)
    blocks = np.frombuffer(payload[: nb * block_align], dtype=np.uint8).reshape(nb, block_align)
    ci = np.minimum(blocks[:, :n_ch].astype(np.int64), len(coefs) - 1)
    c1, c2 = coefs[ci, 0], coefs[ci, 1]  # (nb, ch)

    def _i16(off):
        lo = blocks[:, off : off + 2 * n_ch : 2].astype(np.int32)
        hi = blocks[:, off + 1 : off + 2 * n_ch : 2].astype(np.int32)
        return ((lo | (hi << 8)).astype(np.int16)).astype(np.int32)

    idelta = _i16(n_ch)
    s1 = _i16(3 * n_ch)
    s2 = _i16(5 * n_ch)
    data = blocks[:, hdr_bytes:]
    n_nib = data.shape[1] * 2 // n_ch  # samples per channel after the header pair
    # nibble order: HIGH first; channels alternate nibble-by-nibble
    nib_stream = np.stack([data >> 4, data & 0x0F], axis=-1).reshape(nb, -1)
    nib = nib_stream.reshape(nb, n_nib, n_ch).astype(np.int32)
    nib_signed = np.where(nib > 7, nib - 16, nib)
    spb = 2 + n_nib
    out = np.empty((nb, spb, n_ch), dtype=np.int16)
    out[:, 0, :] = s2.astype(np.int16)
    out[:, 1, :] = s1.astype(np.int16)
    for k in range(n_nib):
        # the spec's predictor is C integer division by 256 —
        # truncation toward ZERO, not a floor shift: a negative
        # (s1*c1 + s2*c2) under >>8 would come out one low and the
        # error would propagate through the rest of the block
        # (coef pairs like (512,-256) go negative on real signals;
        # our encoder's pair 0 is exactly divisible, so round trips
        # cannot catch this)
        p = s1 * c1 + s2 * c2
        predictor = np.sign(p) * (np.abs(p) >> 8)
        s = np.clip(predictor + nib_signed[:, k, :] * idelta, -32768, 32767)
        out[:, 2 + k, :] = s.astype(np.int16)
        s2, s1 = s1, s
        idelta = np.maximum(16, (_MS_ADAPT[nib[:, k, :]] * idelta) >> 8)
    return out.reshape(nb * spb, n_ch)


def encode_ms_adpcm(
    pcm: np.ndarray, n_ch: int, samples_per_block: int = 500
) -> Tuple[bytes, int, int]:
    """int16 (n_frames, n_ch) → (payload, block_align,
    samples_per_block) using coefficient pair 0 (pure first-order,
    c1=256) with delta seeded from the block's mean step — a valid MS
    ADPCM stream any conforming decoder reads."""
    if samples_per_block < 4 or (samples_per_block - 2) % 2:
        raise ValueError("samples_per_block must be 2 + 2k")
    x = np.asarray(pcm, dtype=np.int32).reshape(-1, n_ch)
    n = x.shape[0]
    nb = max(1, -(-n // samples_per_block))
    pad = nb * samples_per_block - n
    if pad:
        x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)]) if n else np.zeros((nb * samples_per_block, n_ch), np.int32)
    x = x.reshape(nb, samples_per_block, n_ch)
    n_nib = samples_per_block - 2
    s2 = x[:, 0, :].copy()
    s1 = x[:, 1, :].copy()
    idelta = np.maximum(16, (np.abs(np.diff(x, axis=1)).mean(axis=1)).astype(np.int32) >> 2)
    idelta0 = idelta.copy()
    nibs = np.empty((nb, n_nib, n_ch), dtype=np.uint8)
    for k in range(n_nib):
        predictor = (s1 * 256 + s2 * 0) >> 8
        delta = x[:, 2 + k, :] - predictor
        q = np.clip(np.round(delta / np.maximum(idelta, 1)).astype(np.int32), -8, 7)
        s = np.clip(predictor + q * idelta, -32768, 32767)
        nibs[:, k, :] = (q & 0x0F).astype(np.uint8)
        s2, s1 = s1, s
        idelta = np.maximum(16, (_MS_ADAPT[q & 0x0F] * idelta) >> 8)
    hdr = np.zeros((nb, 7 * n_ch), dtype=np.uint8)
    # per-channel: coef index 0 (already zero)
    def _put16(off, vals):
        v = vals.astype(np.int32) & 0xFFFF
        hdr[:, off : off + 2 * n_ch : 2] = (v & 0xFF).astype(np.uint8)
        hdr[:, off + 1 : off + 2 * n_ch : 2] = (v >> 8).astype(np.uint8)

    _put16(n_ch, idelta0)
    _put16(3 * n_ch, x[:, 1, :])
    _put16(5 * n_ch, x[:, 0, :])
    flat = nibs.reshape(nb, -1)
    data = ((flat[:, 0::2] << 4) | flat[:, 1::2]).astype(np.uint8)
    blocks = np.concatenate([hdr, data], axis=1)
    return blocks.tobytes(), 7 * n_ch + n_nib * n_ch // 2, samples_per_block


def encode_wav_adpcm(samples: np.ndarray, rate: int, codec: str = "ima") -> bytes:
    """Float samples in [-1, 1] → a complete WAV file in IMA (fmt
    0x11) or MS (fmt 0x02) ADPCM layout, with the fact chunk real
    decoders expect for compressed WAVs."""
    import struct

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    if codec == "ima":
        payload, block_align, spb = encode_ima_adpcm(pcm, n_ch)
        code = 0x11
        ext = struct.pack("<HH", 2, spb)
    elif codec == "ms":
        payload, block_align, spb = encode_ms_adpcm(pcm, n_ch)
        code = 0x02
        ext = struct.pack("<HHH", 4 + 4 * len(_MS_COEFS), spb, len(_MS_COEFS))
        for c1, c2 in _MS_COEFS:
            ext += struct.pack("<hh", int(c1), int(c2))
    else:
        raise ValueError("codec must be 'ima' or 'ms'")
    bits = 4
    byte_rate = rate * block_align // spb if spb else rate
    fmt = struct.pack("<HHIIHH", code, n_ch, rate, byte_rate, block_align, bits) + ext
    fact = struct.pack("<I", pcm.shape[0])
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<I", len(fact)) + fact
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
