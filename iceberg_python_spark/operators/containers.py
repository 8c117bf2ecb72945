"""Deterministic container SYNTHESIZERS for the header-only probe
surface (``operators/probe.py``) — the encoder-for-oracle pattern the
codec modules use (``imaging.encode_png`` etc.), applied to formats
whose MEDIA decode is honestly gated (H.264/VP9/MP3 need external
codecs) but whose CONTAINER layer is fully public spec:

- :func:`synthesize_mp4` — ISO/IEC 14496-12 box tree: ftyp + moov
  {mvhd, trak{tkhd, mdia{mdhd, hdlr, minf{stbl{stsd}}}}} + an mdat of
  deterministic junk. Every header field (timescale, duration, 16.16
  track dims, sample-entry fourcc/rate/channels) is real; the mdat
  payload is NOT a valid elementary stream and is never claimed to be.
- :func:`synthesize_webm` — RFC 8794 EBML: header(DocType) + Segment
  {Info{TimestampScale, Duration}, Tracks{TrackEntry{...}}, Cluster
  (junk SimpleBlock)}.
- :func:`synthesize_mp3` — valid MPEG1 Layer III frame HEADERS with
  zeroed side-info/main data; optional Xing (VBR) tag in the first
  frame. A VBR sequence cycles bitrates so the CBR byte-estimate is
  provably wrong and only the Xing frame count gives the duration.

These exist so probe claims are testable against files the probe
author did NOT hand-align: tests also cross-check against fixed byte
layouts from the specs (64-bit mvhd, unknown-size EBML segments).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# ISO-BMFF (MP4 / M4A)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def synthesize_mp4(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    codec: bytes = b"avc1",
    sample_rate: int = 0,
    channels: int = 0,
    mdat_bytes: int = 256,
    mvhd_version: int = 0,
    fragmented: bool = False,
    seed: int = 0,
) -> bytes:
    """A structurally-valid MP4: video track when ``width`` is set
    (tkhd 16.16 dims + a ``codec`` VisualSampleEntry), audio track when
    ``sample_rate`` is set (mp4a AudioSampleEntry). ``mvhd_version=1``
    exercises the 64-bit create/modify/duration layout.
    ``fragmented`` emits the DASH/CMAF shape: mvhd duration 0 with the
    real total duration in mvex/mehd."""
    ts = 1000  # movie timescale: 1 tick = 1 ms
    real_dur = int(duration_ms)
    dur = 0 if fragmented else real_dur
    if mvhd_version == 1:
        mvhd = _full(
            b"mvhd", 1, 0,
            struct.pack(">QQIQ", 0, 0, ts, dur)
            + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100) + b"\x00" * 10
            + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 3),
        )
    else:
        mvhd = _full(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, ts, dur)
            + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100) + b"\x00" * 10
            + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 3),
        )
    traks = b""
    if width:
        entry = _box(
            codec,
            b"\x00" * 6 + struct.pack(">H", 1)  # SampleEntry preamble
            + b"\x00" * 16  # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + struct.pack(">I", 0) + struct.pack(">H", 1)
            + b"\x00" * 32  # compressorname
            + struct.pack(">Hh", 24, -1),
        )
        traks += _trak(1, dur, b"vide", entry, width=width, height=height)
    if sample_rate:
        entry = _box(
            b"mp4a",
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HH", channels or 2, 16)
            + struct.pack(">I", 0)
            + struct.pack(">I", sample_rate << 16),
        )
        traks += _trak(2, dur, b"soun", entry)
    mvex = b""
    if fragmented:
        mehd = _full(b"mehd", 0, 0, struct.pack(">I", real_dur))
        trex = _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 0, 0, 0))
        mvex = _box(b"mvex", mehd + trex)
    rng = np.random.default_rng(seed)
    mdat = _box(b"mdat", rng.integers(0, 256, mdat_bytes, dtype=np.uint8).tobytes())
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + _box(b"moov", mvhd + traks + mvex) + mdat


_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _trak(
    track_id: int, dur: int, handler: bytes, sample_entry: bytes,
    width: int = 0, height: int = 0,
) -> bytes:
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, track_id, 0, dur)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, dur) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00")
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


# ---------------------------------------------------------------------------
# EBML (WebM / Matroska)
# ---------------------------------------------------------------------------


def _ebml_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _ebml_size(n: int, width: int = 0) -> bytes:
    """EBML size vint: marker bit in the top byte. ``width`` forces a
    longer encoding (some muxers always use 8-byte sizes). A w-byte
    size encodes at most 2^(7w)-2 — the all-ones value means
    "unknown" — so the width bumps when n would collide with it."""
    w = width
    if not w:
        w = 1
        while n >= (1 << (7 * w)) - 1:
            w += 1
    return ((1 << (7 * w)) | n).to_bytes(w, "big")


def _el(eid: int, payload: bytes, size_width: int = 0) -> bytes:
    return _ebml_id(eid) + _ebml_size(len(payload), size_width) + payload


def _uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def synthesize_webm(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    codec_id: bytes = b"V_VP9",
    sample_rate: int = 0,
    channels: int = 0,
    timestamp_scale_ns: int = 1_000_000,
    doc_type: bytes = b"webm",
    unknown_segment_size: bool = False,
    seed: int = 0,
) -> bytes:
    """A structurally-valid WebM/Matroska file: EBML header + Segment
    {Info, Tracks, one Cluster with a junk SimpleBlock}. Duration is
    written as an 8-byte float in ``timestamp_scale_ns`` ticks.
    ``unknown_segment_size`` emits the live-muxing all-ones Segment
    size the probe must treat as to-end-of-file."""
    header = _el(
        0x1A45DFA3,
        _el(0x4286, _uint(1)) + _el(0x42F7, _uint(1)) + _el(0x42F2, _uint(4))
        + _el(0x42F3, _uint(8)) + _el(0x4282, doc_type)
        + _el(0x4287, _uint(2)) + _el(0x4285, _uint(2)),
    )
    ticks = duration_ms * 1_000_000 / timestamp_scale_ns
    info = _el(
        0x1549A966,
        _el(0x2AD7B1, _uint(timestamp_scale_ns)) + _el(0x4489, struct.pack(">d", ticks)),
    )
    track = _el(0xD7, _uint(1)) + _el(0x73C5, _uint(1))
    if width:
        track += _el(0x83, _uint(1)) + _el(0x86, codec_id)
        track += _el(0xE0, _el(0xB0, _uint(width)) + _el(0xBA, _uint(height)))
    else:
        track += _el(0x83, _uint(2)) + _el(0x86, codec_id)
        track += _el(
            0xE1,
            _el(0xB5, struct.pack(">d", float(sample_rate or 48000)))
            + _el(0x9F, _uint(channels or 2)),
        )
    tracks = _el(0x1654AE6B, _el(0xAE, track))
    rng = np.random.default_rng(seed)
    block = b"\x81" + struct.pack(">h", 0) + b"\x80" + rng.integers(
        0, 256, 64, dtype=np.uint8
    ).tobytes()
    cluster = _el(0x1F43B675, _el(0xE7, _uint(0)) + _el(0xA3, block))
    body = info + tracks + cluster
    if unknown_segment_size:
        return header + _ebml_id(0x18538067) + b"\xff" + body
    return header + _el(0x18538067, body, size_width=8)


# ---------------------------------------------------------------------------
# MP3 (MPEG1 Layer III frame headers)
# ---------------------------------------------------------------------------

_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATE_IDX = {44100: 0, 48000: 1, 32000: 2}


def _mp3_frame(bitrate_kbps: int, rate: int, mono: bool, crc: bool = False) -> bytearray:
    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    sr_idx = _MP3_RATE_IDX[rate]
    n = 144 * bitrate_kbps * 1000 // rate  # no padding bit
    hdr = bytearray(n)
    hdr[0] = 0xFF
    # protection bit CLEAR (0xFA) means a 16-bit CRC sits between the
    # header and the side info, shifting everything after it by 2
    hdr[1] = 0xFA if crc else 0xFB  # MPEG1, Layer III
    hdr[2] = (br_idx << 4) | (sr_idx << 2)
    hdr[3] = 0xC0 if mono else 0x00  # channel mode
    return hdr


def synthesize_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    rate: int = 44100,
    mono: bool = False,
    vbr: bool = False,
    id3_bytes: int = 0,
    crc: bool = False,
) -> bytes:
    """``n_frames`` MPEG1 Layer III frames with valid headers and
    zeroed audio payload (1152 samples each — the true duration is
    ``n_frames * 1152 / rate``). ``vbr=True`` prepends a Xing-tagged
    first frame and cycles the data-frame bitrates through
    {64, 128, 256} so a CBR byte estimate is wrong by construction.
    ``id3_bytes`` prepends a zero-padded ID3v2 tag the probe must
    skip via its syncsafe length."""
    out = bytearray()
    if id3_bytes:
        body = id3_bytes - 10
        out += b"ID3\x04\x00\x00" + bytes(
            [(body >> 21) & 0x7F, (body >> 14) & 0x7F, (body >> 7) & 0x7F, body & 0x7F]
        )
        out += b"\x00" * body
    if vbr:
        first = _mp3_frame(bitrate_kbps, rate, mono, crc)
        off = 4 + (2 if crc else 0) + (17 if mono else 32)
        first[off : off + 4] = b"Xing"
        first[off + 4 : off + 8] = struct.pack(">I", 1)  # flags: frames
        first[off + 8 : off + 12] = struct.pack(">I", n_frames)
        out += first
        rates = [64, 128, 256]
        for i in range(n_frames - 1):
            out += _mp3_frame(rates[i % 3], rate, mono, crc)
    else:
        for _ in range(n_frames):
            out += _mp3_frame(bitrate_kbps, rate, mono, crc)
    return bytes(out)
