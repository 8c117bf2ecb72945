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

- **Legacy speech-corpus containers** (late r12): AIFF/AIFF-C (BE PCM,
  sowt, fl32/fl64, ulaw/alaw — 80-bit extended sample rates), Sun/NeXT
  AU (all BE PCM widths, floats, G.711), NIST SPHERE (TIMIT/
  Switchboard: pcm either byte order, µ-law/A-law, and — r14 — the
  dominant EMBEDDED-SHORTEN payload, decoded exactly by the from-spec
  shorten v2 codec in ``operators/shorten.py``) — thin headers over
  the same vectorized PCM/G.711 expansion, each with a matching
  encoder for oracle rows.

MP3/OGG genuinely need external codecs and raise
NotImplementedError naming them; inside
:func:`~.multimodal.extract_audio_stats` that surfaces as
``decode_ok=false`` per row instead of failing the job. FLAC decodes
for real in ``flac.py``.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def _ulaw_expand(u: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → float64 in [-1, 1] (bias 0x84 companding)."""
    u = ~np.asarray(u, dtype=np.uint8)
    sign = np.where(u & 0x80, -1, 1).astype(np.int32)
    exp = ((u >> 4) & 0x07).astype(np.int32)
    mant = (u & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return (sign * mag).astype(np.float64) / 32124.0


def _alaw_expand(al: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → float64 in [-1, 1] (^0x55, sign SET = +)."""
    al = np.asarray(al, dtype=np.uint8) ^ 0x55
    sign = np.where(al & 0x80, 1, -1).astype(np.int32)
    exp = ((al >> 4) & 0x07).astype(np.int32)
    mant = (al & 0x0F).astype(np.int32)
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return (sign * mag).astype(np.float64) / 32768.0


def _ulaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int32 PCM (16-bit range) → µ-law bytes."""
    mag = np.abs(pcm)
    sign = np.where(pcm < 0, 0x80, 0)
    m = np.minimum(mag, 32635) + 0x84
    exp = (np.floor(np.log2(m)).astype(np.int32) - 7).clip(0, 7)
    mant = (m >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def _alaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int32 PCM (16-bit range) → A-law bytes."""
    mag = np.abs(pcm)
    sign = np.where(pcm >= 0, 0x80, 0)
    m = np.minimum(mag, 32767)
    exp = np.where(
        m < 256, 0, (np.floor(np.log2(np.maximum(m, 1))).astype(np.int32) - 7).clip(0, 7)
    )
    mant = np.where(exp == 0, m >> 4, (m >> (exp + 3)) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


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
    was_extensible = audio_format == 0xFFFE
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
        x = _ulaw_expand(np.frombuffer(payload, dtype=np.uint8))
    elif audio_format == 6:  # A-law (G.711 — note: sign bit SET means positive)
        x = _alaw_expand(np.frombuffer(payload, dtype=np.uint8))
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
            # classic fmt: cbSize@16, nCoef@20, table@22.  Extensible
            # fmt (0xFFFE): bytes 18..40 hold validBits/channelMask/
            # GUID, so the classic offsets would read the channel mask
            # (e.g. stereo=3) as a coef count and the GUID bytes as
            # coefficients — silently wrong samples with decode_ok
            # (ADVICE r12).  Re-base past the 22-byte extensible
            # header: nCoef@40, table@42.
            ncoef_off = 40 if was_extensible else 20
            if len(fmt_body) >= ncoef_off + 2:
                (ncoef,) = struct.unpack("<H", fmt_body[ncoef_off : ncoef_off + 2])
                if ncoef and len(fmt_body) >= ncoef_off + 2 + 4 * ncoef:
                    coefs = (
                        np.frombuffer(
                            fmt_body[ncoef_off + 2 : ncoef_off + 2 + 4 * ncoef], dtype="<i2"
                        )
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
    """Magic-byte dispatch. Native decode: WAV family, FLAC (bare and
    Ogg-mapped), AIFF, AU, SPHERE(+Shorten), Ogg Vorbis.
    Recognized-but-unsupported codecs
    (MP3, Ogg Opus/Speex/Theora) raise NotImplementedError
    NAMING the codec; malformed bytes after a known magic raise
    ValueError — struct truncations from the byte parsers are
    converted at this boundary (crafted-input contract, r16)."""
    try:
        return _decode_audio_dispatch(data)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt audio stream: {exc}") from exc


def _decode_audio_dispatch(data: bytes) -> Tuple[np.ndarray, int]:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    if data[:4] == b"fLaC":
        # r11: real lossless decode in flac.py (subframes, Rice
        # residuals, stereo decorrelation, CRC-verified)
        from .flac import decode_flac

        x, rate, bps = decode_flac(data)
        return x.astype(np.float64) / float(1 << (bps - 1)), int(rate)
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return decode_aiff(data)
    if data[:4] == b".snd":
        return decode_au(data)
    if data[:8] == b"NIST_1A\n":
        return decode_sphere(data)
    if data[:3] == b"ID3" or data[:2] in (b"\xff\xfb", b"\xff\xf3"):
        # DOCUMENTED CEILING (r15): MPEG-1 Layer III decode requires
        # ~1,300 entries of normative TABLE DATA (ISO 11172-3 Table
        # B.7's 34 Huffman code tables and the 512-coefficient
        # synthesis window of Table B.3) that are data, not formulas.
        # This sandbox has no codec binary, no network, and no
        # conformance stream to validate a from-memory transcription
        # against, and the repo's own shorten lesson (ADVICE r14 #2)
        # is that mirrored encoder/decoder table errors pass every
        # self-made fixture — an unvalidatable decoder is worse than
        # this loud gate. FLAC/JPEG/Shorten were implementable because
        # their tables are parametric or travel inside the stream.
        raise NotImplementedError(
            "MP3 decode needs an external codec (e.g. pydub/ffmpeg): the Layer III "
            "Huffman tables + synthesis window are normative table data that cannot "
            "be validated in this environment"
        )
    if data[:4] == b"OggS":
        # Route by the FIRST PACKET's codec id header (r16, restoring
        # the probe<->decoder contract): Vorbis decodes natively
        # (codebooks travel IN the stream, window/MDCT are closed
        # formulas — vorbis.py); recognized-but-unsupported codecs get
        # a NotImplementedError NAMING the codec; malformed bytes
        # after the OggS magic stay ValueError (the FLAC junk-magic
        # precedent). The peek shares ogg_pages' CRC/lacing checks.
        from .vorbis import decode_ogg_vorbis, ogg_first_packet_magic

        magic = ogg_first_packet_magic(data)
        if magic[:7] == b"\x01vorbis":
            return decode_ogg_vorbis(data)
        if magic[:8] == b"OpusHead":
            # DOCUMENTED CEILING (r16): Opus (RFC 6716) is the same
            # unvalidatable-table-data class as MP3 — SILK's PDF/
            # codebook tables and CELT's band allocation + PVQ spread
            # tables are normative DATA, not formulas, and this
            # sandbox has no conformance vector to validate a
            # transcription against (the shorten lesson: mirrored
            # table errors pass every self-made fixture). probe_media
            # still reads OpusHead metadata (rate/channels/duration).
            raise NotImplementedError(
                "Ogg Opus decode needs an external codec (e.g. opuslib/ffmpeg): "
                "RFC 6716's SILK codebooks and CELT allocation/PVQ tables are "
                "normative table data that cannot be validated in this environment"
            )
        if magic[:5] == b"\x7fFLAC":
            # r16: real decode — the FLAC→Ogg mapping is pure container
            # plumbing (xiph mapping spec / RFC 9639 App. A): validate
            # the signature packet, drop the header packets, and hand
            # the reassembled bare fLaC stream to the existing lossless
            # decoder. Exact integers, both CRCs verified.
            from .flac import decode_ogg_flac

            x, rate, bps = decode_ogg_flac(data)
            return x.astype(np.float64) / float(1 << (bps - 1)), int(rate)
        if magic[:8] == b"Speex   ":
            raise NotImplementedError("Ogg Speex decode needs an external codec")
        if magic[:7] == b"\x80theora":
            raise NotImplementedError("Ogg Theora is a video codec (no audio decode)")
        raise NotImplementedError(
            f"unknown Ogg codec id packet {bytes(magic[:8])!r}"
        )
    raise NotImplementedError(
        "unsupported audio magic (RIFF/WAVE, FLAC, AIFF, AU, SPHERE decode here)"
    )


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
    if law == "ulaw":
        enc, code = _ulaw_compress(pcm), 7
    elif law == "alaw":
        enc, code = _alaw_compress(pcm), 6
    else:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    payload = enc.tobytes()
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


# ---------------------------------------------------------------------------
# Legacy speech-corpus containers: AIFF/AIFF-C, Sun/NeXT AU, NIST SPHERE
# ---------------------------------------------------------------------------
# The formats the classic LDC-era speech corpora actually ship in
# (TIMIT/Switchboard: SPHERE; NeXT/Sun recordings: .au; Mac-originated
# collections: AIFF). All are thin headers over PCM or G.711 payloads,
# so they reuse the vectorized expansion helpers above; each has a
# matching encoder so oracle rows can synthesize deterministic files.
# SPHERE's embedded-Shorten compression is honestly gated (a real
# entropy codec, same class as the FLAC work — not a header variant).


def _parse_extended80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (AIFF sample rates)."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _pack_extended80(v: float) -> bytes:
    if v == 0:
        return b"\x00" * 10
    import math

    exp = math.floor(math.log2(v))
    mant = int(v / 2.0**exp * (1 << 63))
    if mant >= 1 << 64:
        mant >>= 1
        exp += 1
    return struct.pack(">HQ", exp + 16383, mant)


def _pcm_be(payload: bytes, bits: int) -> np.ndarray:
    if bits == 8:  # AIFF 8-bit PCM is SIGNED
        return np.frombuffer(payload, dtype=np.int8).astype(np.float64) / 128.0
    if bits == 16:
        return np.frombuffer(payload, dtype=">i2").astype(np.float64) / 32768.0
    if bits == 24:
        raw = np.frombuffer(payload, dtype=np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.int32)
        val = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        return np.where(val >= 1 << 23, val - (1 << 24), val).astype(np.float64) / float(
            1 << 23
        )
    if bits == 32:
        return np.frombuffer(payload, dtype=">i4").astype(np.float64) / float(1 << 31)
    raise NotImplementedError(f"{bits}-bit big-endian PCM")


def decode_aiff(data: bytes) -> Tuple[np.ndarray, int]:
    """AIFF / AIFF-C → (float64 (n_frames, n_channels), rate).
    Compression types: NONE (BE PCM 8/16/24/32), sowt (LE 16), fl32 /
    FL32, fl64, ulaw/ULAW, alaw/ALAW; others raise naming the type."""
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFF-C stream")
    is_aifc = data[8:12] == b"AIFC"
    pos, comm, payload = 12, None, None
    comp = b"NONE"
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            n_ch, n_frames, bits = struct.unpack(">hIh", body[:8])
            rate = _parse_extended80(body[8:18])
            comm = (n_ch, n_frames, bits, rate)
            if is_aifc and size >= 22:
                comp = body[18:22]
        elif cid == b"SSND":
            off, _blk = struct.unpack(">II", body[:8])
            payload = body[8 + off :]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or payload is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    n_ch, n_frames, bits, rate = comm
    n_ch = max(1, n_ch)
    if comp in (b"NONE", b"twos"):
        # AIFF stores 1-32-bit samples LEFT-JUSTIFIED in ceil(bits/8)
        # bytes, so decoding at the container width yields the exact
        # normalized value (a 12-bit sample is its 16-bit container
        # value << 4, and v<<4 / 2^15 == v / 2^11) — old sampler gear
        # really ships 12-bit AIFF
        if not 1 <= bits <= 32:
            raise ValueError(f"AIFF sample width {bits}")
        x = _pcm_be(payload, ((bits + 7) // 8) * 8)
    elif comp == b"sowt":  # little-endian PCM (QuickTime)
        x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    elif comp in (b"fl32", b"FL32"):
        x = np.frombuffer(payload, dtype=">f4").astype(np.float64)
    elif comp in (b"fl64", b"FL64"):
        x = np.frombuffer(payload, dtype=">f8").astype(np.float64)
    elif comp in (b"ulaw", b"ULAW"):
        x = _ulaw_expand(np.frombuffer(payload, dtype=np.uint8))
    elif comp in (b"alaw", b"ALAW"):
        x = _alaw_expand(np.frombuffer(payload, dtype=np.uint8))
    else:
        raise NotImplementedError(
            f"AIFF-C compression {comp!r} needs an external codec (e.g. soundfile)"
        )
    x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch)
    return x[:n_frames], int(round(rate))


def encode_aiff(
    samples: np.ndarray, rate: int, bits: int = 16, compression: str = "NONE"
) -> bytes:
    """AIFF (NONE, BE PCM 16/8) or AIFF-C (sowt / fl32 / ulaw / alaw)
    writer for float samples in [-1, 1]."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, n_ch = x.shape
    flat = x.reshape(-1)
    if compression == "NONE":
        if bits == 16:
            payload = np.clip(np.round(flat * 32767.0), -32768, 32767).astype(">i2").tobytes()
        elif bits == 8:
            payload = np.clip(np.round(flat * 127.0), -128, 127).astype(np.int8).tobytes()
        else:
            raise ValueError("AIFF NONE writer supports 8/16-bit")
    elif compression == "sowt":
        bits = 16
        payload = np.clip(np.round(flat * 32767.0), -32768, 32767).astype("<i2").tobytes()
    elif compression == "fl32":
        bits = 32
        payload = flat.astype(">f4").tobytes()
    elif compression in ("ulaw", "alaw"):
        pcm = np.clip(np.round(flat * 32767.0), -32768, 32767).astype(np.int32)
        payload = (_ulaw_compress(pcm) if compression == "ulaw" else _alaw_compress(pcm)).tobytes()
        bits = 16  # convention: ulaw/alaw COMM records the DECODED width
    else:
        raise ValueError(f"unsupported AIFF compression {compression}")
    is_aifc = compression != "NONE"
    comm = struct.pack(">hIh", n_ch, n_frames, bits) + _pack_extended80(float(rate))
    if is_aifc:
        comm += compression.encode() + b"\x00\x00"  # empty pstring, padded
    chunks = b""
    if is_aifc:
        chunks += b"FVER" + struct.pack(">I", 4) + struct.pack(">I", 0xA2805140)
    chunks += b"COMM" + struct.pack(">I", len(comm)) + comm
    if len(comm) & 1:
        chunks += b"\x00"
    ssnd = struct.pack(">II", 0, 0) + payload
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    form_type = b"AIFC" if is_aifc else b"AIFF"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks


_AU_ENCODINGS = {1: "ulaw", 2: "pcm8", 3: "pcm16", 4: "pcm24", 5: "pcm32", 6: "f32", 7: "f64", 27: "alaw"}


def decode_au(data: bytes) -> Tuple[np.ndarray, int]:
    """Sun/NeXT .au → (float64 (n_frames, n_channels), rate). All PCM
    widths are big-endian; 8-bit linear is SIGNED (unlike WAV)."""
    if data[:4] != b".snd":
        raise ValueError("not an AU stream")
    off, size, enc, rate, n_ch = struct.unpack(">IIIII", data[4:24])
    payload = data[off : off + size] if size not in (0, 0xFFFFFFFF) else data[off:]
    kind = _AU_ENCODINGS.get(enc)
    if kind == "ulaw":
        x = _ulaw_expand(np.frombuffer(payload, dtype=np.uint8))
    elif kind == "alaw":
        x = _alaw_expand(np.frombuffer(payload, dtype=np.uint8))
    elif kind == "pcm8":
        x = np.frombuffer(payload, dtype=np.int8).astype(np.float64) / 128.0
    elif kind in ("pcm16", "pcm24", "pcm32"):
        x = _pcm_be(payload, int(kind[3:]))
    elif kind == "f32":
        x = np.frombuffer(payload, dtype=">f4").astype(np.float64)
    elif kind == "f64":
        x = np.frombuffer(payload, dtype=">f8").astype(np.float64)
    else:
        raise NotImplementedError(f"AU encoding {enc} (e.g. G.721/G.723 ADPCM) needs an external codec")
    n_ch = max(1, n_ch)
    x = x[: len(x) - len(x) % n_ch]
    return x.reshape(-1, n_ch), int(rate)


def encode_au(samples: np.ndarray, rate: int, encoding: str = "pcm16") -> bytes:
    """AU writer: pcm16 (BE), pcm8 (signed), ulaw, alaw, f32."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    flat = x.reshape(-1)
    pcm = np.clip(np.round(flat * 32767.0), -32768, 32767).astype(np.int32)
    if encoding == "pcm16":
        payload, code = pcm.astype(">i2").tobytes(), 3
    elif encoding == "pcm8":
        payload, code = np.clip(np.round(flat * 127.0), -128, 127).astype(np.int8).tobytes(), 2
    elif encoding == "ulaw":
        payload, code = _ulaw_compress(pcm).tobytes(), 1
    elif encoding == "alaw":
        payload, code = _alaw_compress(pcm).tobytes(), 27
    elif encoding == "f32":
        payload, code = flat.astype(">f4").tobytes(), 6
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    hdr = b".snd" + struct.pack(">IIIII", 24, len(payload), code, rate, n_ch)
    return hdr + payload


def decode_sphere(data: bytes) -> Tuple[np.ndarray, int]:
    """NIST SPHERE (TIMIT / Switchboard / LDC) → (float64
    (n_frames, n_channels), rate). PCM (either byte order, via
    sample_byte_format 01/10), µ-law/A-law, and embedded-Shorten
    (``*,embedded-shorten-v2.*`` — decoded by operators/shorten.py,
    exact integer recovery) all decode."""
    if data[:8] != b"NIST_1A\n":
        raise ValueError("not a NIST SPHERE stream")
    try:
        hdr_size = int(data[8:16].decode("ascii").strip())
    except ValueError as e:
        raise ValueError("bad SPHERE header size") from e
    fields = {}
    for line in data[16:hdr_size].decode("ascii", "replace").split("\n"):
        parts = line.strip().split(None, 2)
        if not parts or parts[0] == "end_head":
            break
        if len(parts) == 3 and parts[1].startswith("-"):
            fields[parts[0]] = parts[2]
    n_ch = int(fields.get("channel_count", 1))
    rate = int(fields.get("sample_rate", 8000))
    n_bytes = int(fields.get("sample_n_bytes", 2))
    coding = fields.get("sample_coding", "pcm")
    byte_fmt = fields.get("sample_byte_format", "01")
    n_samples = int(fields.get("sample_count", 0)) or None
    payload = data[hdr_size:]
    if "shorten" in coding:
        # TIMIT/Switchboard's dominant payload: sample_coding
        # "pcm,embedded-shorten-v2.00" (or "ulaw,embedded-shorten-*"),
        # payload = an ajkg stream. Decode the shorten integers, then
        # map them exactly like the uncompressed coding would
        from .shorten import TYPE_ALAW, TYPE_ULAW, decode_shorten

        ints, ftype = decode_shorten(payload)
        if coding.startswith("ulaw") or coding.startswith("mu-law") or ftype == TYPE_ULAW:
            x = _ulaw_expand(ints.astype(np.uint8).reshape(-1))
        elif coding.startswith("alaw") or ftype == TYPE_ALAW:
            x = _alaw_expand(ints.astype(np.uint8).reshape(-1))
        elif n_bytes == 2:
            x = ints.reshape(-1).astype(np.float64) / 32768.0
        elif n_bytes == 1:
            x = ints.reshape(-1).astype(np.float64) / 128.0
        else:
            raise NotImplementedError(f"SPHERE shortened sample_n_bytes={n_bytes}")
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch)
        if n_samples is not None:
            x = x[:n_samples]
        return x, rate
    if coding.startswith("pcm"):
        if n_bytes == 2:
            dt = "<i2" if byte_fmt == "01" else ">i2"
            x = np.frombuffer(payload, dtype=dt).astype(np.float64) / 32768.0
        elif n_bytes == 1:
            x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        else:
            raise NotImplementedError(f"SPHERE pcm sample_n_bytes={n_bytes}")
    elif coding.startswith("ulaw") or coding.startswith("mu-law"):
        x = _ulaw_expand(np.frombuffer(payload, dtype=np.uint8))
    elif coding.startswith("alaw"):
        x = _alaw_expand(np.frombuffer(payload, dtype=np.uint8))
    else:
        raise NotImplementedError(f"SPHERE sample_coding {coding!r}")
    x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch)
    if n_samples is not None:
        x = x[:n_samples]
    return x, rate


def encode_sphere(
    samples: np.ndarray, rate: int, coding: str = "pcm", byte_format: str = "01"
) -> bytes:
    """SPHERE writer: pcm16 (01=LE / 10=BE) or ulaw, 1024-byte padded
    ASCII header — the layout sph2pipe emits."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, n_ch = x.shape
    flat = x.reshape(-1)
    pcm = np.clip(np.round(flat * 32767.0), -32768, 32767).astype(np.int32)
    if coding == "pcm":
        payload = pcm.astype("<i2" if byte_format == "01" else ">i2").tobytes()
        n_bytes = 2
    elif coding == "ulaw":
        payload, n_bytes, byte_format = _ulaw_compress(pcm).tobytes(), 1, "1"
    elif coding == "shorten":
        # sph2pipe's embedded layout: coding advertises the UNDERLYING
        # pcm plus the shorten marker; payload is the ajkg stream
        from .shorten import TYPE_S16LH, encode_shorten

        payload = encode_shorten(
            pcm.astype(np.int32).reshape(n_frames, n_ch), ftype=TYPE_S16LH
        )
        n_bytes, coding = 2, "pcm,embedded-shorten-v2.00"
    else:
        raise ValueError(f"unsupported SPHERE coding {coding}")
    lines = [
        "NIST_1A",
        "   1024",
        f"channel_count -i {n_ch}",
        f"sample_count -i {n_frames}",
        f"sample_rate -i {rate}",
        f"sample_n_bytes -i {n_bytes}",
        f"sample_byte_format -s{len(byte_format)} {byte_format}",
        f"sample_coding -s{len(coding)} {coding}",
        "end_head",
    ]
    hdr = ("\n".join(lines) + "\n").encode("ascii")
    return hdr + b" " * (1024 - len(hdr)) + payload
