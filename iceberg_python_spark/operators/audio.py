"""Stdlib + numpy audio codec and features (the audio half of the
multimodal pillar, real for the formats this container can honestly
decode).

- **WAV (RIFF/WAVE)**: full PCM decode — 8-bit unsigned, 16/24/32-bit
  signed, 32/64-bit float, any channel count/rate, chunk-walk parsing
  (fmt/data chunks in any order, extra chunks skipped). Pure
  ``struct`` + ``numpy.frombuffer``; 24-bit widened vectorized.
- **Encoders** (:func:`encode_wav`) so tests and oracle rows can
  synthesize deterministic tones without any audio dependency.
- **Features** (:func:`audio_stats`): duration, sample rate, channels,
  RMS energy, zero-crossing rate, spectral centroid (numpy rFFT) —
  the standard cheap descriptors a corpus-curation pipeline filters
  on (silence/clipping detection, bandwidth sanity).

MP3/FLAC/OGG genuinely need external codecs and raise
NotImplementedError naming them; inside
:func:`~.multimodal.extract_audio_stats` that surfaces as
``decode_ok=false`` per row instead of failing the job.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode RIFF/WAVE bytes → (float64 samples in [-1, 1] shaped
    (n_frames, n_channels), sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    fmt_body = b""
    payload = None
    fact_frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            payload = body
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack("<I", body[:4])
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # the real format lives in the SubFormat GUID at fmt-extension
        # bytes 24..40; its Data1 low word is the classic format code.
        # Assuming PCM here would run a float-subformat payload through
        # the int32 path and emit garbage with decode_ok=true (ADVICE
        # r10) — dispatch on the verified GUID or refuse.
        if len(fmt_body) < 40:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk too short for SubFormat")
        guid = fmt_body[24:40]
        if guid[2:16] != b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71":
            raise NotImplementedError(
                f"WAV extensible SubFormat GUID {guid.hex()} is not a known "
                "PCM/IEEE-float subformat (needs an external codec)"
            )
        (audio_format,) = struct.unpack("<H", guid[:2])
        if audio_format not in (1, 2, 3, 6, 7, 0x11):
            raise NotImplementedError(
                f"WAV extensible subformat code {audio_format} (compressed) "
                "needs an external codec"
            )
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM is not a WAV spec width")
    elif audio_format == 7:  # µ-law (G.711 — telephony speech corpora)
        u = ~np.frombuffer(payload, dtype=np.uint8)
        sign = np.where(u & 0x80, -1, 1).astype(np.int32)
        exp = ((u >> 4) & 0x07).astype(np.int32)
        mant = (u & 0x0F).astype(np.int32)
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        x = (sign * mag).astype(np.float64) / 32124.0
    elif audio_format == 6:  # A-law (G.711 — note: sign bit SET means positive)
        al = np.frombuffer(payload, dtype=np.uint8) ^ 0x55
        sign = np.where(al & 0x80, 1, -1).astype(np.int32)
        exp = ((al >> 4) & 0x07).astype(np.int32)
        mant = (al & 0x0F).astype(np.int32)
        mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
        x = (sign * mag).astype(np.float64) / 32768.0
    elif audio_format == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(payload, dtype=dt).astype(np.float64)
    elif audio_format in (0x11, 2):  # IMA / Microsoft ADPCM (block codecs)
        from .adpcm import decode_ima_adpcm, decode_ms_adpcm

        n_ch = max(1, n_ch)
        if audio_format == 0x11:
            pcm = decode_ima_adpcm(payload, n_ch, _block_align)
        else:
            coefs = None  # custom coefficient table from the fmt extension
            if len(fmt_body) >= 22:
                (ncoef,) = struct.unpack("<H", fmt_body[20:22])
                if ncoef and len(fmt_body) >= 22 + 4 * ncoef:
                    coefs = (
                        np.frombuffer(fmt_body[22 : 22 + 4 * ncoef], dtype="<i2")
                        .reshape(ncoef, 2)
                        .astype(np.int32)
                    )
            pcm = decode_ms_adpcm(payload, n_ch, _block_align, coefs)
        if fact_frames is not None:  # trim the final block's pad
            pcm = pcm[:fact_frames]
        return pcm.astype(np.float64) / 32768.0, int(rate)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format} (compressed) needs an external codec"
        )
    n_ch = max(1, n_ch)
    x = x[: len(x) - len(x) % n_ch]
    return x.reshape(-1, n_ch), int(rate)


def decode_audio(data: bytes) -> Tuple[np.ndarray, int]:
    """Magic-byte dispatch; MP3/OGG raise naming the real codec."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    if data[:4] == b"fLaC":
        # r11: real lossless decode in flac.py (subframes, Rice
        # residuals, stereo decorrelation, CRC-verified)
        from .flac import decode_flac

        x, rate, bps = decode_flac(data)
        return x.astype(np.float64) / float(1 << (bps - 1)), int(rate)
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3"):
        raise NotImplementedError("MP3 decode needs an external codec (e.g. pydub/ffmpeg)")
    if data[:4] == b"OggS":
        raise NotImplementedError("OGG decode needs an external codec (e.g. soundfile)")
    raise NotImplementedError("unsupported audio magic (RIFF/WAVE and FLAC decode here)")


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Minimal PCM WAV writer for float samples in [-1, 1] shaped
    (n,) or (n_frames, n_channels)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    if bits == 16:
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (np.clip(np.round(x * 127.0), -128, 127) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("encode_wav supports 8/16-bit PCM")
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def encode_wav_g711(samples: np.ndarray, rate: int, law: str = "ulaw") -> bytes:
    """G.711 µ-law / A-law WAV writer (fmt codes 7 / 6) — the
    telephony speech-corpus layouts `decode_wav` reads. Float samples
    in [-1, 1], (n,) or (n_frames, n_channels); standard companding
    (µ: bias 0x84, clip 32635; A: ^0x55 with sign bit SET positive)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int32).reshape(-1)
    mag = np.abs(pcm)
    if law == "ulaw":
        sign = np.where(pcm < 0, 0x80, 0)
        m = np.minimum(mag, 32635) + 0x84
        exp = (np.floor(np.log2(m)).astype(np.int32) - 7).clip(0, 7)
        mant = (m >> (exp + 3)) & 0x0F
        enc = (~(sign | (exp << 4) | mant)) & 0xFF
        code = 7
    elif law == "alaw":
        sign = np.where(pcm >= 0, 0x80, 0)
        m = np.minimum(mag, 32767)
        exp = np.where(m < 256, 0, (np.floor(np.log2(np.maximum(m, 1))).astype(np.int32) - 7).clip(0, 7))
        mant = np.where(exp == 0, m >> 4, (m >> (exp + 3)) & 0x0F)
        enc = (sign | (exp << 4) | mant) ^ 0x55
        code = 6
    else:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    payload = enc.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", code, n_ch, rate, rate * n_ch, n_ch, 8)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def audio_stats(x: np.ndarray, rate: int) -> dict:
    """Cheap curation descriptors over (n_frames, n_channels) floats."""
    mono = x.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    centroid = 0.0
    if n > 1 and rms > 0:
        mag = np.abs(np.fft.rfft(mono))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        s = mag.sum()
        if s > 0:
            centroid = float((freqs * mag).sum() / s)
    return {
        "n_frames": n,
        "n_channels": int(x.shape[1]),
        "sample_rate": int(rate),
        "duration_ms": int(round(n * 1000.0 / rate)) if rate else 0,
        "rms": rms,
        "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid,
    }
