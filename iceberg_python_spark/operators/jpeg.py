"""Baseline sequential JPEG codec — stdlib + numpy only (VERDICT r10
"What's missing #1": JPEG is the dominant crawl-image format; the
multimodal pillar needs it decoded for real, same honest-floor pattern
as the PNG/WAV/Y4M codecs).

Everything here derives from the PUBLIC spec, ITU-T T.81 (ISO/IEC
10918-1): baseline DCT process (SOF0), the example quantization and
Huffman tables of Annex K, and JFIF's full-range YCbCr. There is no
reference-repo counterpart — the reference has no image surface at all.

Decoder (:func:`decode_jpeg`):

- markers: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/EOI; SOF1 (extended
  sequential Huffman) shares the baseline path. SOF2 (progressive) and
  arithmetic coding (SOF9/10, DAC) raise ``NotImplementedError`` naming
  PIL — per-row error capture upstream turns that into
  ``decode_ok=false`` instead of a failed job.
- entropy: canonical Huffman per T.81 F.2.2 (MINCODE/MAXCODE walk),
  byte-stuffing removal, restart-marker segmentation with DC-predictor
  reset.
- components: any sampling factors h,v ∈ {1,2} (4:4:4, 4:2:2, 4:2:0,
  4:4:0), grayscale or 3-component YCbCr; chroma upsampled
  nearest-neighbor.
- the per-symbol entropy walk is a Python loop (inherently
  bit-serial), but dequantize + inverse zigzag + IDCT run as ONE
  batched numpy einsum over all blocks of a component — the O(pixels)
  math is vectorized, only the O(symbols) bit walk is not.

Encoder (:func:`encode_jpeg`): the matching writer used by tests and
oracle rows to synthesize deterministic JPEGs — Annex K example tables
scaled by libjpeg's quality curve, 4:4:4 or grayscale, level shift →
8×8 DCT (matrix form) → quantize → zigzag → DC-difference + AC
run-length → Huffman, with 0xFF byte stuffing.

At 100 TB both run per-payload inside Arrow-batched ``mapInPandas``
(operators/multimodal.py) — a corrupt file costs one row, never the
job.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# zigzag[i] = natural (row*8+col) index of the i-th coefficient in
# zigzag order (T.81 figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# T.81 Annex K.1 example quantization tables (zigzag order NOT applied;
# these are natural row-major order)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# T.81 Annex K.3 example Huffman tables: (BITS counts per code length
# 1..16, HUFFVAL symbol list)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    i = np.arange(8)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / 16.0) * 0.5
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scale curve over the Annex K tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    """Collects (value, length) emissions; ``flush`` packs the whole
    entropy segment in one vectorized pass (bit matrix -> packbits ->
    byte stuffing) instead of a Python bit loop per symbol."""

    def __init__(self) -> None:
        self._vals: List[int] = []
        self._lens: List[int] = []

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._vals.append(value)
        self._lens.append(length)

    def flush(self) -> bytes:
        if not self._lens:
            return b""
        lens = np.asarray(self._lens, dtype=np.int64)
        vals = np.asarray(self._vals, dtype=np.int64) & ((np.int64(1) << lens) - 1)
        pad = int(-lens.sum()) % 8
        if pad:  # pad with 1s per spec
            vals = np.append(vals, (1 << pad) - 1)
            lens = np.append(lens, pad)
        width = int(lens.max())
        bitmat = (vals[:, None] >> np.arange(width - 1, -1, -1, dtype=np.int64)) & 1
        mask = np.arange(width)[None, :] >= (width - lens[:, None])
        packed = np.packbits(bitmat[mask].astype(np.uint8))
        ff = np.flatnonzero(packed == 0xFF)
        if ff.size:  # byte stuffing
            packed = np.insert(packed, ff + 1, 0)
        return packed.tobytes()


def _huff_encode_table(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) via canonical code assignment (T.81 C.2)."""
    table: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> Tuple[int, int]:
    """(size category, value bits) for DC/AC coefficient coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_blocks(bw: _BitWriter, blocks: np.ndarray, dc_tbl, ac_tbl, pred: int) -> int:
    """Entropy-encode zigzag-ordered (n, 64) blocks; returns new DC pred."""
    for blk in blocks:
        t, bits = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        code, ln = dc_tbl[t]
        bw.put(code, ln)
        bw.put(bits, t)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tbl[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            t, bits = _magnitude(v)
            code, ln = ac_tbl[(run << 4) | t]
            bw.put(code, ln)
            bw.put(bits, t)
            run = 0
        if last < 63:
            code, ln = ac_tbl[0x00]  # EOB
            bw.put(code, ln)
    return pred


def _to_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(H, W) float plane → quantized zigzag (n, 64) int blocks, all
    DCTs in one einsum."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    b = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coef = np.einsum("ij,njk,lk->nil", _DCT, b - 128.0, _DCT)
    q = np.round(coef.reshape(-1, 64) / qtbl[None, :]).astype(np.int64)
    return q[:, ZIGZAG]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def default_dht_segments() -> bytes:
    """The four T.81 Annex K.3 example Huffman tables as DHT marker
    segments. MJPEG-in-AVI frames routinely omit DHT (the OpenDML
    'AVI1' convention); omitted tables are defined to be exactly
    these."""
    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return _marker(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    return (
        dht(0, 0, _DC_LUM)
        + dht(1, 0, _AC_LUM)
        + dht(0, 1, _DC_CHR)
        + dht(1, 1, _AC_CHR)
    )


def ensure_dht(data: bytes) -> bytes:
    """Return ``data`` with the Annex-K default Huffman tables spliced
    in front of the first SOS if the stream defines NO DHT before it —
    the normalization that makes DHT-less MJPEG frames plain baseline
    JPEGs. Streams that already carry tables pass through untouched."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if tag == 0xC4:  # has its own tables
            return data
        if tag == 0xDA:  # SOS reached with no DHT seen
            return data[:pos] + default_dht_segments() + data[pos:]
        if tag == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2:
            raise ValueError("corrupt JPEG: marker segment length < 2")
        pos += 2 + seglen
    return data


def _emit_ac_first(bw: _BitWriter, ac_tbl, blk, ss: int, se: int, al: int) -> None:
    """Progressive AC first scan for one block (T.81 G.1.2.2): values
    are abs>>Al with sign, zero runs + per-block EOB0 (no cross-block
    EOB runs — valid, marginally larger)."""
    r = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        if a == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_tbl[0xF0]
            bw.put(code, ln)
            r -= 16
        t = a.bit_length()
        bits = a if v > 0 else (1 << t) - 1 - a  # magnitude coding of -a
        code, ln = ac_tbl[(r << 4) | t]
        bw.put(code, ln)
        bw.put(bits, t)
        r = 0
        emitted = True
    if r > 0 or not emitted:
        code, ln = ac_tbl[0x00]  # EOB0
        bw.put(code, ln)


def _emit_ac_refine(bw: _BitWriter, ac_tbl, blk, ss: int, se: int, al: int) -> None:
    """Progressive AC refinement for one block (T.81 G.1.2.3, per-block
    EOB): mirrors the DECODER's walk exactly — newly-nonzero
    coefficients (abs>>Al == 1) emit (zero_run<<4)|1 + a sign bit;
    every nonzero-history coefficient the walk passes contributes its
    bit-Al correction in walk order; a ZRL consumes exactly 16
    zero-history positions (history free-riders between them ride that
    ZRL's bit stream, later ones wait for the next symbol); the
    trailing EOB0 carries corrections for the positions after the last
    new coefficient."""
    # classify each position the way the decoder's walk sees it
    events = []  # (kind, payload): 'zero' | ('hist', bit) | ('new', signbit)
    last_new = -1
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        if a == 1:
            last_new = k
    for k in range(ss, (last_new if last_new >= 0 else ss - 1) + 1):
        v = int(blk[k])
        a = abs(v) >> al
        if a == 0:
            events.append(("zero", 0))
        elif a > 1:
            events.append(("hist", (abs(v) >> al) & 1))
        else:
            events.append(("new", 1 if v > 0 else 0))
    i, n = 0, len(events)
    while i < n:
        zeros_to_new = 0
        j = i
        while events[j][0] != "new":
            if events[j][0] == "zero":
                zeros_to_new += 1
            j += 1
        if zeros_to_new > 15:
            # ZRL: consume exactly 16 zero-history positions from i
            code, ln = ac_tbl[0xF0]
            bw.put(code, ln)
            consumed = 0
            while consumed < 16:
                kind, payload = events[i]
                if kind == "zero":
                    consumed += 1
                else:  # hist rides this ZRL's walk
                    bw.put(payload, 1)
                i += 1
        else:
            code, ln = ac_tbl[(zeros_to_new << 4) | 1]
            bw.put(code, ln)
            bw.put(events[j][1], 1)  # sign of the new coefficient
            for kind, payload in events[i:j]:
                if kind == "hist":
                    bw.put(payload, 1)
            i = j + 1
    # EOB processing covers positions after the last new coefficient
    k0 = (last_new + 1) if last_new >= 0 else ss
    if k0 <= se:
        code, ln = ac_tbl[0x00]
        bw.put(code, ln)
        for k in range(k0, se + 1):
            if abs(int(blk[k])) >> al > 1:
                bw.put((abs(int(blk[k])) >> al) & 1, 1)


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    progressive: bool = False,
    exif_orientation: int = 1,
    separate_scans: bool = False,
) -> bytes:
    """Encode (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8 as a
    baseline sequential (or PROGRESSIVE) JFIF JPEG with Annex K tables.

    ``subsampling``: ``"4:4:4"`` (one block per component per MCU) or
    ``"4:2:0"`` (4 luma + 1 Cb + 1 Cr per MCU, chroma box-averaged 2×2
    — the dominant web layout, ~½ the bytes). ``restart_interval`` > 0
    emits DRI + RSTn markers every N MCUs (what real encoders do for
    error resilience; also exercises the decoder's restart path).

    ``progressive=True`` emits an SOF2 progression over the SAME
    quantized coefficients — interleaved DC first (Al=1) + DC
    refinement, then per-component spectral-selection AC scans (bands
    1-5 and 6-63, Al=1) and their successive-approximation refinements
    — so the decode is BIT-IDENTICAL to the baseline encode's decode
    (the exactness oracle the tests pin). 4:4:4/grayscale only, no
    restart markers (the decoder handles both for foreign files).

    ``separate_scans=True`` emits a BASELINE frame as one ns=1 scan
    per component (T.81 allows it; some encoders do this) — each scan
    walks the component's own nbw*nbh data units, NOT the MCU grid,
    which for a subsampled component differ. Decodes bit-identically
    to the interleaved encode."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r} (4:4:4 or 4:2:0)")
    sub420 = subsampling == "4:2:0" and not gray
    if progressive and sub420:
        raise ValueError("progressive encode supports 4:4:4/grayscale (decode handles 4:2:0)")
    if progressive and restart_interval:
        raise ValueError("progressive encode does not emit restart markers")
    if separate_scans and (progressive or restart_interval):
        raise ValueError("separate_scans is a baseline layout without restart markers")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum = _quality_scaled(_Q_LUM, quality)
    qchr = _quality_scaled(_Q_CHR, quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if exif_orientation != 1:
        if not 1 <= exif_orientation <= 8:
            raise ValueError("exif_orientation must be 1-8")
        # minimal EXIF: one-IFD TIFF with tag 274 (what cameras write —
        # the pixels stay unrotated, the decoder applies the view)
        tiff = struct.pack("<2sHI", b"II", 42, 8)
        tiff += struct.pack("<H", 1)
        tiff += struct.pack("<HHIHH", 274, 3, 1, exif_orientation, 0)
        tiff += struct.pack("<I", 0)
        out += _marker(0xE1, b"Exif\x00\x00" + tiff)
    out += _marker(0xDB, b"\x00" + bytes(int(v) for v in qlum[ZIGZAG]))
    if not gray:
        out += _marker(0xDB, b"\x01" + bytes(int(v) for v in qchr[ZIGZAG]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    lum_hv = 0x22 if sub420 else 0x11
    for cid in range(1, ncomp + 1):
        sof += struct.pack(">BBB", cid, lum_hv if cid == 1 else 0x11, 0 if cid == 1 else 1)
    out += _marker(0xC2 if progressive else 0xC0, sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return _marker(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    if not gray:
        out += dht(0, 1, _DC_CHR) + dht(1, 1, _AC_CHR)
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))

    dc_lum = _huff_encode_table(*_DC_LUM)
    ac_lum = _huff_encode_table(*_AC_LUM)
    comp_blocks = None
    if gray:
        # per-MCU layout: one luma block
        comp_blocks = [_to_blocks(px.astype(np.float64), qlum)]
        mcu_iter = [[(blk, 0)] for blk in comp_blocks[0]]
        comps_tbl = [(dc_lum, ac_lum)]
        scan_grids = [(comp_blocks[0], -(-w // 8), -(-w // 8), -(-h // 8))]
    else:
        ycc = _rgb_to_ycbcr(px)
        dc_chr = _huff_encode_table(*_DC_CHR)
        ac_chr = _huff_encode_table(*_AC_CHR)
        comps_tbl = [(dc_lum, ac_lum), (dc_chr, ac_chr), (dc_chr, ac_chr)]
        if sub420:
            # pad to 16x16 MCUs; chroma = 2x2 box average
            ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
            ypad = np.pad(ycc[..., 0], ((0, ph - h), (0, pw - w)), mode="edge")
            cbp = np.pad(ycc[..., 1], ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(ycc[..., 2], ((0, ph - h), (0, pw - w)), mode="edge")
            cb_s = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr_s = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            yb = _to_blocks(ypad, qlum)
            cbb = _to_blocks(cb_s, qchr)
            crb = _to_blocks(cr_s, qchr)
            mx, my = pw // 16, ph // 16
            ybw = pw // 8
            mcu_iter = []
            for r in range(my):
                for c in range(mx):
                    blocks = [
                        (yb[(2 * r + dv) * ybw + 2 * c + dh], 0)
                        for dv in (0, 1)
                        for dh in (0, 1)
                    ]
                    blocks.append((cbb[r * mx + c], 1))
                    blocks.append((crb[r * mx + c], 2))
                    mcu_iter.append(blocks)
            # per-component unit grids for ns=1 scans: luma walks
            # ceil(w/8) x ceil(h/8) units inside the 16-padded grid;
            # chroma walks ceil(ceil(w/2)/8) x ceil(ceil(h/2)/8)
            cw, ch2 = -(-w // 2), -(-h // 2)
            cnbw, cnbh = -(-cw // 8), -(-ch2 // 8)
            scan_grids = [
                (yb, ybw, -(-w // 8), -(-h // 8)),
                (cbb, mx, cnbw, cnbh),
                (crb, mx, cnbw, cnbh),
            ]
        else:
            comp_blocks = [
                _to_blocks(ycc[..., 0], qlum),
                _to_blocks(ycc[..., 1], qchr),
                _to_blocks(ycc[..., 2], qchr),
            ]
            mcu_iter = [
                [(comp_blocks[c][i], c) for c in range(3)]
                for i in range(comp_blocks[0].shape[0])
            ]
            gw = -(-w // 8)
            scan_grids = [(comp_blocks[c], gw, gw, -(-h // 8)) for c in range(3)]

    if progressive:
        return bytes(_encode_progressive(out, comp_blocks, comps_tbl, ncomp))

    if separate_scans:
        for ci in range(ncomp):
            blocks, gw, nbw, nbh = scan_grids[ci]
            cid = ci + 1
            sos = struct.pack(">BBB", 1, cid, 0x00 if cid == 1 else 0x11) + b"\x00\x3f\x00"
            out += _marker(0xDA, sos)
            bw = _BitWriter()
            pred = 0
            dct, act = comps_tbl[ci]
            for by in range(nbh):
                for bx in range(nbw):
                    pred = _encode_blocks(bw, blocks[by * gw + bx][None, :], dct, act, pred)
            out += bw.flush()
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = struct.pack(">B", ncomp)
    for cid in range(1, ncomp + 1):
        sos += struct.pack(">BB", cid, 0x00 if cid == 1 else 0x11)
    sos += b"\x00\x3f\x00"
    out += _marker(0xDA, sos)
    bw = _BitWriter()
    preds = [0] * len(comps_tbl)
    rst = 0
    for i, blocks in enumerate(mcu_iter):
        if restart_interval and i and i % restart_interval == 0:
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(comps_tbl)
        for blk, c in blocks:
            dct, act = comps_tbl[c]
            preds[c] = _encode_blocks(bw, blk[None, :], dct, act, preds[c])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_progressive(out: bytearray, comp_blocks, comps_tbl, ncomp: int) -> bytearray:
    """Emit the progressive scan sequence over pre-quantized zigzag
    blocks: DC first (interleaved, Al=1), DC refinement (raw bits), AC
    spectral bands (1-5, 6-63) first at Al=1 per component, then their
    refinements to Al=0."""

    def sos_marker(comp_ids, ss_, se_, ah_, al_) -> bytes:
        body = struct.pack(">B", len(comp_ids))
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            body += struct.pack(">BB", ci + 1, (td << 4) | td)
        body += bytes([ss_, se_, (ah_ << 4) | al_])
        return _marker(0xDA, body)

    nblocks = comp_blocks[0].shape[0]
    # scan 1: DC first, interleaved, point transform = arithmetic >> 1
    out += sos_marker(list(range(ncomp)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    for i in range(nblocks):
        for c in range(ncomp):
            v = int(comp_blocks[c][i][0]) >> 1
            t, bits = _magnitude(v - preds[c])
            preds[c] = v
            code, ln = comps_tbl[c][0][t]
            bw.put(code, ln)
            bw.put(bits, t)
    out += bw.flush()
    # scan 2: DC refinement — one raw bit per block, no Huffman
    out += sos_marker(list(range(ncomp)), 0, 0, 1, 0)
    bw = _BitWriter()
    for i in range(nblocks):
        for c in range(ncomp):
            bw.put(int(comp_blocks[c][i][0]) & 1, 1)
    out += bw.flush()
    # AC spectral-selection first scans at Al=1, then refinements
    for ss_, se_ in ((1, 5), (6, 63)):
        for c in range(ncomp):
            out += sos_marker([c], ss_, se_, 0, 1)
            bw = _BitWriter()
            for blk in comp_blocks[c]:
                _emit_ac_first(bw, comps_tbl[c][1], blk, ss_, se_, 1)
            out += bw.flush()
    for ss_, se_ in ((1, 5), (6, 63)):
        for c in range(ncomp):
            out += sos_marker([c], ss_, se_, 1, 0)
            bw = _BitWriter()
            for blk in comp_blocks[c]:
                _emit_ac_refine(bw, comps_tbl[c][1], blk, ss_, se_, 0)
            out += bw.flush()
    out += b"\xff\xd9"
    return out


# ---------------------------------------------------------------- decoder


# peek-16-bits decode LUTs keyed by the DHT spec: entry = (symbol << 8)
# | code_length; 0 marks a prefix belonging to no code (> 16 bits) and
# 0xFF a declared code with no symbol behind it. The Annex-K defaults
# dominate real streams, so the tables are shared process-wide.
_HUFF_LUT_CACHE: Dict[Tuple[Tuple[int, ...], Tuple[int, ...]], List[int]] = {}


class _HuffDecoder:
    """Canonical Huffman decode per T.81 F.2.2.3, via a 16-bit peek
    table: one lookup per symbol instead of one compare per bit."""

    def __init__(self, bits: List[int], vals: List[int]) -> None:
        key = (tuple(bits), tuple(vals))
        lut = _HUFF_LUT_CACHE.get(key)
        if lut is None:
            arr = np.zeros(1 << 16, dtype=np.int32)
            code = 0
            k = 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    start = code << (16 - ln)
                    # a corrupt DHT can define codes with no symbol
                    ent = ((vals[k] << 8) | ln) if k < len(vals) else 0xFF
                    arr[start : start + (1 << (16 - ln))] = ent
                    code += 1
                    k += 1
                code <<= 1
            lut = arr.tolist()
            if len(_HUFF_LUT_CACHE) > 64:
                _HUFF_LUT_CACHE.clear()
            _HUFF_LUT_CACHE[key] = lut
        self.lut = lut

    def decode(self, br: "_BitReader") -> int:
        acc, n = br._acc, br._n
        if n < 16:
            acc &= (1 << n) - 1  # shed consumed high bits
            buf, pos, ln = br.buf, br.pos, len(br.buf)
            while n < 16 and pos < ln:
                acc = (acc << 8) | buf[pos]
                pos += 1
                n += 8
            br._acc, br._n, br.pos = acc, n, pos
        window = ((acc << (16 - n)) if n < 16 else (acc >> (n - 16))) & 0xFFFF
        ent = self.lut[window]
        length = ent & 0xFF
        if length == 0xFF:
            raise ValueError("corrupt JPEG: huffman code has no symbol")
        if length == 0:
            raise ValueError("corrupt JPEG: huffman code overruns 16 bits")
        if length > n:
            raise ValueError("corrupt JPEG: entropy stream exhausted")
        br._n = n - length
        return ent >> 8


class _BitReader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("corrupt JPEG: entropy stream exhausted")
            self._acc = self.buf[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        acc, have = self._acc, self._n
        if have < n:
            acc &= (1 << have) - 1  # shed consumed high bits
            buf, pos, ln = self.buf, self.pos, len(self.buf)
            while have < n:
                if pos >= ln:
                    raise ValueError("corrupt JPEG: entropy stream exhausted")
                acc = (acc << 8) | buf[pos]
                pos += 1
                have += 8
            self.pos = pos
        self._acc, self._n = acc, have - n
        return (acc >> (have - n)) & ((1 << n) - 1)


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0/SOF1) or PROGRESSIVE (SOF2)
    JPEG bytes → (H, W) or (H, W, 3) uint8 (RGB for 3-component YCbCr,
    JFIF full range). Progressive scans — interleaved DC first/refine,
    non-interleaved AC spectral-selection first scans with EOB runs,
    and AC successive-approximation refinement (T.81 G.2) — accumulate
    into per-component coefficient arrays; dequant + IDCT run once at
    EOI. Arithmetic coding and hierarchical frames still gate on PIL."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    saw_scan = False
    orientation = 1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if tag == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if tag == 0xE1 and body[:6] == b"Exif\x00\x00":
            # EXIF rides a TIFF structure; crawl JPEGs use tag 274
            # (orientation) to store rotation the pixels don't have —
            # apply it so downstream pHash/dedup see the VISUAL image
            try:
                orientation = _exif_orientation(body[6:])
            except Exception:
                pass  # malformed EXIF never fails the decode
        elif tag == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables need PIL")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat
                p += 65
        elif tag == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif tag in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline/extended, SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG sample precision needs PIL")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = _init_frame(h, w, comps, progressive=(tag == 0xC2))
        elif tag in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/lossless/hierarchical JPEG needs PIL (baseline "
                "sequential SOF0/SOF1 and progressive SOF2 decode here)"
            )
        elif tag == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = body[0]
            scan_sel = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan_sel.append((cs, tdta >> 4, tdta & 0xF))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _decode_scan(
                data, pos, frame, scan_sel, huff, restart_interval, ss, se, ah, al
            )
            saw_scan = True
    if frame is None or not saw_scan:
        raise ValueError("corrupt JPEG: no scan data")
    return _apply_orientation(_reconstruct(frame, qtables), orientation)


def _exif_orientation(tiff_bytes: bytes) -> int:
    """Orientation (tag 274) from the EXIF TIFF structure's first IFD."""
    from .tiff import _read_ifd

    if tiff_bytes[:2] not in (b"II", b"MM"):
        return 1
    fmt = "<" if tiff_bytes[:2] == b"II" else ">"
    (off,) = struct.unpack_from(fmt + "I", tiff_bytes, 4)
    tags, _ = _read_ifd(tiff_bytes, fmt, off)
    v = tags.get(274, [1])[0]
    return int(v) if 1 <= int(v) <= 8 else 1


def _apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    if orientation == 1:
        return px
    if orientation == 2:
        return px[:, ::-1].copy()
    if orientation == 3:
        return px[::-1, ::-1].copy()
    if orientation == 4:
        return px[::-1].copy()
    axes = (1, 0) if px.ndim == 2 else (1, 0, 2)
    t = px.transpose(axes)
    if orientation == 5:
        return t.copy()
    if orientation == 6:  # rotate 90° clockwise
        return t[:, ::-1].copy()
    if orientation == 7:
        return t[::-1, ::-1].copy()
    return t[::-1].copy()  # 8: rotate 90° counter-clockwise


def _init_frame(h_img: int, w_img: int, comps: List[Dict[str, Any]], progressive: bool):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2x2 need PIL")
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        # non-interleaved scans walk only the blocks covering the
        # component's actual pixel area (T.81 A.2.2), not the MCU grid
        comp_w = -(-w_img * c["h"] // hmax)
        comp_h = -(-h_img * c["v"] // vmax)
        c["nbw"] = -(-comp_w // 8)
        c["nbh"] = -(-comp_h // 8)
    return {
        "h": h_img, "w": w_img, "comps": comps, "progressive": progressive,
        "hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
        "eobrun": 0,
    }


def _scan_segments(data: bytes, pos: int) -> Tuple[List[bytes], int]:
    """Split one scan's entropy stream at restart markers (un-stuffing
    0xFF00); returns (segments, position of the terminating marker).
    Jumps between 0xFF positions (numpy scan) instead of walking every
    byte — entropy bytes between markers/stuffing copy as slices."""
    n = len(data)
    segments: List[bytes] = []
    parts: List[bytes] = []
    run_start = pos
    ffs = np.flatnonzero(np.frombuffer(data, dtype=np.uint8)[pos:] == 0xFF)
    for q in ffs:
        q += pos
        if q < run_start:
            continue  # second byte of an already-consumed pair
        if q + 1 >= n:
            break  # trailing 0xFF with no marker byte: plain data
        nxt = data[q + 1]
        if nxt == 0x00:  # byte-stuffed 0xFF
            parts.append(data[run_start : q + 1])
            run_start = q + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            parts.append(data[run_start:q])
            segments.append(b"".join(parts))
            parts = []
            run_start = q + 2
        else:  # any other marker ends the scan
            parts.append(data[run_start:q])
            segments.append(b"".join(parts))
            return segments, q
    parts.append(data[run_start:n])
    segments.append(b"".join(parts))
    return segments, n


def _decode_scan(data, pos, frame, scan_sel, huff, restart_interval, ss, se, ah, al):
    segments, end_pos = _scan_segments(data, pos)
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    scan_comps = []
    for cs, td, ta in scan_sel:
        c = by_id.get(cs)
        if c is None:
            raise ValueError("corrupt JPEG: scan references unknown component")
        c["td"], c["ta"] = td, ta
        scan_comps.append(c)
    progressive = frame["progressive"]
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
    frame["eobrun"] = 0

    interleaved = len(scan_comps) > 1
    if interleaved and ss != 0:
        raise ValueError("corrupt JPEG: interleaved AC scan")
    if not progressive:
        _decode_baseline_scan(segments, frame, scan_comps, huff, restart_interval)
        return end_pos
    seg_i = 0
    br = _BitReader(segments[0])
    preds = {c["id"]: 0 for c in scan_comps}

    def restart_if_due(unit: int) -> None:
        nonlocal seg_i, br, preds
        if restart_interval and unit and unit % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("corrupt JPEG: missing restart segment")
            br = _BitReader(segments[seg_i])
            preds = {c["id"]: 0 for c in scan_comps}
            frame["eobrun"] = 0

    # only progressive scans reach here (baseline dispatched above)
    if interleaved:
        mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
        for mcu in range(mcus_x * mcus_y):
            restart_if_due(mcu)
            my, mx = divmod(mcu, mcus_x)
            for c in scan_comps:
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = c["coef"][(my * c["v"] + v) * c["bw"] + (mx * c["h"] + hh)]
                        _decode_dc(br, huff, c, blk, preds, ah, al)
    else:
        # ns=1 scans walk the component's own nbw*nbh data units
        # (T.81 A.2.2), not the MCU grid
        c = scan_comps[0]
        nbw, nbh = c["nbw"], c["nbh"]
        for i in range(nbw * nbh):
            restart_if_due(i)
            by, bx = divmod(i, nbw)
            blk = c["coef"][by * c["bw"] + bx]
            if ss == 0:
                _decode_dc(br, huff, c, blk, preds, ah, al)
                if se != 0:
                    raise ValueError("corrupt JPEG: progressive DC scan with Se > 0")
            elif ah == 0:
                _decode_ac_first(br, huff, c, blk, frame, ss, se, al)
            else:
                _decode_ac_refine(br, huff, c, blk, frame, ss, se, al)
    return end_pos


def _decode_baseline_scan(segments, frame, scan_comps, huff, restart_interval) -> None:
    """Baseline-sequential scan decode (T.81 F.2.2), fused.

    Bit-for-bit the same stream semantics as _HuffDecoder.decode +
    _BitReader.receive walked per coefficient, but the accumulator
    lives in locals for the whole scan and decoded coefficients are
    collected into per-component (block, k, value) lists that scatter
    into the coef arrays with ONE numpy assignment each — the
    per-coefficient method calls and numpy scalar stores were the
    remaining hot path after the peek-16 LUT landed."""
    # decode-order unit pattern: per MCU for interleaved scans, per
    # component data unit for ns=1 scans (T.81 A.2.2)
    if len(scan_comps) > 1:
        units = frame["mcus_x"] * frame["mcus_y"]
        pattern = [
            (ci, v, hh, c["v"], c["h"], c["bw"])
            for ci, c in enumerate(scan_comps)
            for v in range(c["v"])
            for hh in range(c["h"])
        ]
        mcus_x = frame["mcus_x"]
    else:
        c = scan_comps[0]
        units = c["nbw"] * c["nbh"]
        pattern = [(0, 0, 0, 1, 1, c["bw"])]
        mcus_x = c["nbw"]

    # huffman LUTs resolved lazily at each component's FIRST block so a
    # missing-DHT error keeps its position relative to stream errors
    luts = [None] * len(scan_comps)
    ids = [c["id"] for c in scan_comps]
    nseg = len(segments)
    buf = segments[0]
    ln = len(buf)
    pos = acc = n = 0
    seg_i = 0
    # DC predictors keyed by component ID, exactly like the per-block
    # path (duplicate selectors in a corrupt scan share one predictor)
    preds = {i: 0 for i in ids}
    outi = [[] for _ in scan_comps]  # flat coef indices (block*64 + k)
    outv = [[] for _ in scan_comps]

    for unit in range(units):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_i += 1
            if seg_i >= nseg:
                raise ValueError("corrupt JPEG: missing restart segment")
            buf = segments[seg_i]
            ln = len(buf)
            pos = acc = n = 0
            preds = {i: 0 for i in ids}
        my, mx = divmod(unit, mcus_x)
        for ci, v, hh, cv, ch, bw in pattern:
            tabs = luts[ci]
            if tabs is None:
                cc = scan_comps[ci]
                dc_t = huff.get((0, cc["td"]))
                ac_t = huff.get((1, cc["ta"]))
                if dc_t is None or ac_t is None:
                    raise ValueError("corrupt JPEG: scan references missing DHT")
                tabs = luts[ci] = (dc_t.lut, ac_t.lut)
            dc_lut, ac_lut = tabs
            cid = ids[ci]
            base = ((my * cv + v) * bw + mx * ch + hh) << 6
            oi, ov = outi[ci], outv[ci]

            # DC: huffman symbol = magnitude category t, then t raw bits
            if n < 16:
                acc &= (1 << n) - 1
                while n < 16 and pos < ln:
                    acc = (acc << 8) | buf[pos]
                    pos += 1
                    n += 8
            window = ((acc << (16 - n)) if n < 16 else (acc >> (n - 16))) & 0xFFFF
            ent = dc_lut[window]
            t = ent & 0xFF
            if t == 0xFF:
                raise ValueError("corrupt JPEG: huffman code has no symbol")
            if t == 0:
                raise ValueError("corrupt JPEG: huffman code overruns 16 bits")
            if t > n:
                raise ValueError("corrupt JPEG: entropy stream exhausted")
            n -= t
            t = ent >> 8
            if t:
                if n < t:
                    acc &= (1 << n) - 1
                    while n < t:
                        if pos >= ln:
                            raise ValueError("corrupt JPEG: entropy stream exhausted")
                        acc = (acc << 8) | buf[pos]
                        pos += 1
                        n += 8
                n -= t
                diff = (acc >> n) & ((1 << t) - 1)
                if diff < (1 << (t - 1)):
                    diff += 1 - (1 << t)
                preds[cid] += diff
            pv = preds[cid]
            if not (-9223372036854775808 <= pv <= 9223372036854775807):
                # the per-block path stored into the int64 coef array
                # immediately; keep its overflow behavior (a corrupt DHT
                # can define DC categories > 63 bits)
                raise OverflowError("Python int too large to convert to C long")
            oi.append(base)
            ov.append(pv)

            # AC: (run, size) symbols until EOB or k > 63
            k = 1
            while k < 64:
                if n < 16:
                    acc &= (1 << n) - 1
                    while n < 16 and pos < ln:
                        acc = (acc << 8) | buf[pos]
                        pos += 1
                        n += 8
                window = ((acc << (16 - n)) if n < 16 else (acc >> (n - 16))) & 0xFFFF
                ent = ac_lut[window]
                length = ent & 0xFF
                if length == 0xFF:
                    raise ValueError("corrupt JPEG: huffman code has no symbol")
                if length == 0:
                    raise ValueError("corrupt JPEG: huffman code overruns 16 bits")
                if length > n:
                    raise ValueError("corrupt JPEG: entropy stream exhausted")
                n -= length
                rs = ent >> 8
                s = rs & 0xF
                if s == 0:
                    if rs == 0xF0:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("corrupt JPEG: AC index overrun")
                if n < s:
                    acc &= (1 << n) - 1
                    while n < s:
                        if pos >= ln:
                            raise ValueError("corrupt JPEG: entropy stream exhausted")
                        acc = (acc << 8) | buf[pos]
                        pos += 1
                        n += 8
                n -= s
                val = (acc >> n) & ((1 << s) - 1)
                if val < (1 << (s - 1)):
                    val += 1 - (1 << s)
                oi.append(base + k)
                ov.append(val)
                k += 1

    for ci, c in enumerate(scan_comps):
        if outi[ci]:
            c["coef"].reshape(-1)[outi[ci]] = outv[ci]


def _decode_dc(br, huff, c, blk, preds, ah, al) -> None:
    if ah == 0:  # first DC scan: diff coding in the point-transformed domain
        dc_t = huff.get((0, c["td"]))
        if dc_t is None:
            raise ValueError("corrupt JPEG: scan references missing DHT")
        t = dc_t.decode(br)
        preds[c["id"]] += _extend(br.receive(t), t)
        blk[0] = preds[c["id"]] << al
    else:  # refinement: one raw bit per block
        if br.read_bit():
            blk[0] |= 1 << al


def _decode_ac_first(br, huff, c, blk, frame, ss, se, al) -> None:
    if frame["eobrun"] > 0:
        frame["eobrun"] -= 1
        return
    ac_t = huff.get((1, c["ta"]))
    if ac_t is None:
        raise ValueError("corrupt JPEG: scan references missing DHT")
    k = ss
    while k <= se:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of 2^r + receive(r) blocks ending here
                frame["eobrun"] = (1 << r) - 1 + (br.receive(r) if r else 0)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC index overrun")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1


def _decode_ac_refine(br, huff, c, blk, frame, ss, se, al) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3 / libjpeg
    jdphuff): newly-nonzero coefficients arrive as ±1<<Al; every
    already-nonzero coefficient passed over receives one correction
    bit."""
    p1, m1 = 1 << al, -1 << al

    def correct(k: int) -> None:
        if br.read_bit() and not (blk[k] & p1):
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if frame["eobrun"] == 0:
        ac_t = huff.get((1, c["ta"]))
        if ac_t is None:
            raise ValueError("corrupt JPEG: scan references missing DHT")
        while k <= se:
            rs = ac_t.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:  # EOBn — remaining history coefficients below
                    frame["eobrun"] = (1 << r) + (br.receive(r) if r else 0)
                    break
                val = 0  # ZRL: skip 16 zero-history positions
            elif s == 1:
                val = p1 if br.read_bit() else m1
            else:
                raise ValueError("corrupt JPEG: refinement magnitude > 1")
            # walk forward: corrections for nonzero history, r counts
            # zero-history positions; place val when r hits 0
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if s:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
            else:
                break
    if frame["eobrun"] > 0:
        # EOB processing: remaining nonzero-history coefficients still
        # receive their correction bits
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        frame["eobrun"] -= 1


def _reconstruct(frame, qtables) -> np.ndarray:
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]

    planes = []
    for c in comps:
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("corrupt JPEG: frame references missing DQT")
        nat = np.zeros_like(c["coef"])
        nat[:, ZIGZAG] = c["coef"]  # inverse zigzag, all blocks at once
        deq = (nat * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ji,njk,kl->nil", _DCT, deq, _DCT) + 128.0
        grid = px.reshape(c["bh"], c["bw"], 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(c["bh"] * 8, c["bw"] * 8)
        # nearest-neighbor chroma upsample to full resolution
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h_img, :w_img])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
