"""Stdlib + numpy WebP-LOSSLESS (VP8L) codec — closes the WEBP image
gate for the lossless half of the format. Everything derives from the
PUBLIC "WebP Lossless Bitstream Specification" (Google / RFC 9649):
LSB-first bit packing with DEFLATE-style MSB-first canonical Huffman
codes, the code-length code (symbols 16/17/18 with extra bits), simple
2-symbol codes, five Huffman codes per meta-group (green+length+cache,
red, blue, alpha, distance), LZ77 backward references with the 120
two-dimensional short-distance mappings, the color cache
(multiplicative hash), meta-Huffman tiling, and all four inverse
transforms (predictor with 14 modes, cross-color, subtract-green,
color-indexing with sub-byte pixel bundling).

Decoder: :func:`decode_webp` → (H, W, C) uint8 (C = 3 without alpha
hint, 4 with). r16: the EXTENDED container (VP8X) decodes too — still
VP8X unwraps to its VP8L payload, and animations composite ANMF
rectangles per the container spec's blend/dispose rules
(:func:`decode_webp_frames` returns every composited RGBA canvas +
delays, the GIF-decoder shape). VP8 (lossy) payloads raise
NotImplementedError naming PIL (RFC 6386 normative table data — the
documented ceiling) — per-row error capture upstream turns that into
``decode_ok=false``.

Encoder: :func:`encode_webp` — the deterministic synthesis half for
tests and oracle rows. It emits literal ARGB with flat 8-bit Huffman
codes (a complete 256×8-bit canonical code), optionally behind the
subtract-green transform, a color-indexing palette, or the
left-predictor transform — enough to exercise every inverse-transform
path with EXACT round trips (VP8L is lossless: equality oracles, no
tolerances). :func:`encode_webp_anim` / :func:`encode_webp_extended`
write the VP8X container (ANIM/ANMF with per-frame offsets, blend and
dispose flags; EXIF/XMP metadata chunks) around VP8L payloads.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np


_REV8 = [int(f"{b:08b}"[::-1], 2) for b in range(256)]


class _LsbReader:
    """LSB-first bit reader (VP8L packing) over a bit accumulator;
    Huffman codes arrive code-MSB-first within the LSB-first stream."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self._acc = 0  # upcoming bits, stream bit i at acc bit i
        self._n = 0

    def read(self, n: int) -> int:
        acc, have = self._acc, self._n
        if have < n:
            buf, pos, ln = self.buf, self.pos, len(self.buf)
            while have < n:
                if pos >= ln:
                    raise ValueError("corrupt VP8L: bitstream exhausted")
                acc |= buf[pos] << have
                pos += 1
                have += 8
            self.pos = pos
        self._acc = acc >> n
        self._n = have - n
        return acc & ((1 << n) - 1)


class _LsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, n: int) -> None:
        """Huffman CODES enter the stream most-significant-bit first
        (everything else is plain LSB-first little-endian) — one
        bit-reversed write instead of n single-bit writes."""
        rev = ((_REV8[code & 0xFF] << 8) | _REV8[(code >> 8) & 0xFF]) >> (16 - n)
        self.write(rev, n)

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _Huff:
    """Canonical Huffman from code lengths (DEFLATE assignment). An
    8-bit stream-order peek table resolves short codes (the common
    case) in one lookup; longer codes fall back to the bitwise walk."""

    _PEEK = 8

    def __init__(self, lengths: List[int]) -> None:
        self.single: Optional[int] = None
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("corrupt VP8L: empty huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        # canonical codes, shorter first, then by symbol
        self.tree: dict = {}
        code = 0
        prev_len = 0
        peek = [0] * (1 << self._PEEK)
        for ln, sym in sorted(nz):
            code <<= ln - prev_len
            prev_len = ln
            self.tree[(ln, code)] = sym
            if ln <= self._PEEK:
                # stream-order pattern: first code bit (its MSB) is the
                # lowest stream bit
                rev = ((_REV8[code & 0xFF] << 8) | _REV8[(code >> 8) & 0xFF]) >> (16 - ln)
                ent = (sym << 8) | ln
                for t in range(1 << (self._PEEK - ln)):
                    peek[rev | (t << ln)] = ent
            code += 1
        self.peek = peek
        self.max_len = max(ln for ln, _ in nz)

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        acc, have = br._acc, br._n
        if have < 8:
            buf, pos, ln = br.buf, br.pos, len(br.buf)
            while have < 8 and pos < ln:
                acc |= buf[pos] << have
                pos += 1
                have += 8
            br._acc, br._n, br.pos = acc, have, pos
        ent = self.peek[acc & 0xFF] if have >= 8 else self.peek[(acc & ((1 << have) - 1))]
        length = ent & 0xFF
        if ent and length <= have:
            br._acc = acc >> length
            br._n = have - length
            return ent >> 8
        # long code (or short window at stream end): bitwise walk
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.tree.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt VP8L: bad huffman code")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_code_lengths(br: _LsbReader, n_symbols: int) -> List[int]:
    """One Huffman code: simple (1-2 symbols) or code-length coded."""
    if br.read(1):  # simple code
        n = br.read(1) + 1
        first_8 = br.read(1)
        s0 = br.read(8 if first_8 else 1)
        lengths = [0] * n_symbols
        if n == 2:
            s1 = br.read(8)
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            lengths[s0] = 1  # single-symbol code: zero bits read per use
        return lengths
    n_codes = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(n_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Huff(clc_lengths)
    # optional limit on the number of coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = n_symbols
    lengths = [0] * n_symbols
    prev = 8
    i = 0
    while i < n_symbols and max_symbol > 0:
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[i : i + rep] = [prev] * rep
            i += rep
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return lengths[:n_symbols]


def _prefix_value(br: _LsbReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec: 40 prefix codes)."""
    if code < 4:
        return code + 1
    extra = (code >> 1) - 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# the 120 short-distance 2D offsets (spec table): (dx, dy)
_DIST_MAP: List[Tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (8, 7),
]


def _plane_distance(dist_code: int, width: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * width + dx
    return max(d, 1)


def _color_cache_hash(argb: int, bits: int) -> int:
    return ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - bits)


def _read_entropy_image(br: _LsbReader, w: int, h: int, allow_meta: bool):
    """Decode one 'entropy-coded image' of w*h ARGB pixels; returns the
    pixel array (h, w, 4 uint8 as A,R,G,B)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("corrupt VP8L: bad color cache size")
    n_groups = 1
    meta = None
    tile_bits = 0
    if allow_meta and br.read(1):  # meta-huffman image present
        tile_bits = br.read(3) + 2
        mw = -(-w >> tile_bits)
        mh = -(-h >> tile_bits)
        meta_px = _read_entropy_image(br, mw, mh, allow_meta=False)
        meta = (meta_px[:, :, 1].astype(np.int64) << 8) | meta_px[:, :, 2]
        n_groups = int(meta.max()) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _Huff(_read_code_lengths(br, green_size))
        r = _Huff(_read_code_lengths(br, 256))
        b = _Huff(_read_code_lengths(br, 256))
        a = _Huff(_read_code_lengths(br, 256))
        d = _Huff(_read_code_lengths(br, 40))
        groups.append((g, r, b, a, d))
    cache = [0] * (1 << cache_bits) if cache_bits else None
    out: List[tuple] = [None] * (h * w)  # A,R,G,B tuples
    i = 0
    n = h * w
    while i < n:
        if meta is not None:
            y, x = divmod(i, w)
            gidx = int(meta[y >> tile_bits, x >> tile_bits])
            gh, rh, bh, ah, dh = groups[gidx]
        else:
            gh, rh, bh, ah, dh = groups[0]
        s = gh.decode(br)
        if s < 256:  # literal: G then R, B, A
            g = s
            r = rh.decode(br)
            b = bh.decode(br)
            a = ah.decode(br)
            out[i] = (a, r, g, b)
            if cache is not None:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[_color_cache_hash(argb, cache_bits)] = argb
            i += 1
        elif s < 256 + 24:  # LZ77 backref
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, dh.decode(br))
            dist = _plane_distance(dist_code, w)
            if dist > i:
                raise ValueError("corrupt VP8L: backref before start")
            for _ in range(length):
                if i >= n:
                    break
                out[i] = out[i - dist]
                if cache is not None:
                    a_, r_, g_, b_ = out[i]
                    argb = (a_ << 24) | (r_ << 16) | (g_ << 8) | b_
                    cache[_color_cache_hash(argb, cache_bits)] = argb
                i += 1
        else:  # color cache reference
            argb = cache[s - 256 - 24]
            out[i] = ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
            i += 1
    return np.asarray(out, dtype=np.uint8).reshape(h, w, 4)


def _inv_subtract_green(px: np.ndarray) -> None:
    g = px[:, :, 2].astype(np.uint16)
    px[:, :, 1] = ((px[:, :, 1] + g) & 0xFF).astype(np.uint8)
    px[:, :, 3] = ((px[:, :, 3] + g) & 0xFF).astype(np.uint8)


def _inv_predictor(px: np.ndarray, modes: np.ndarray, tile_bits: int) -> None:
    # plain-int row lists: the reconstruction is pixel-sequential (L is
    # the just-written neighbor), and per-pixel numpy vector ops cost
    # ~10x a four-int Python loop at this granularity
    h, w = px.shape[:2]
    p = px.astype(np.int32).tolist()
    mrows = modes.tolist()
    for y in range(h):
        row = p[y]
        above = p[y - 1] if y else None
        mrow = mrows[y >> tile_bits] if y else None
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = row[x - 1]
            elif x == 0:
                pred = above[0]
            else:
                mode = mrow[x >> tile_bits]
                L = row[x - 1]
                T = above[x]
                # rightmost column: libwebp's contiguous row buffer makes
                # top[x+1] at x==w-1 land on the CURRENT row's first pixel
                # (already reconstructed, since x > 0 in this branch)
                if mode == 0:
                    pred = (255, 0, 0, 0)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = above[x + 1] if x + 1 < w else row[0]
                elif mode == 4:
                    pred = above[x - 1]
                elif mode == 5:
                    TR = above[x + 1] if x + 1 < w else row[0]
                    pred = [(((a + b) // 2) + c) // 2 for a, b, c in zip(L, TR, T)]
                elif mode == 6:
                    TL = above[x - 1]
                    pred = [(a + b) // 2 for a, b in zip(L, TL)]
                elif mode == 7:
                    pred = [(a + b) // 2 for a, b in zip(L, T)]
                elif mode == 8:
                    TL = above[x - 1]
                    pred = [(a + b) // 2 for a, b in zip(TL, T)]
                elif mode == 9:
                    TR = above[x + 1] if x + 1 < w else row[0]
                    pred = [(a + b) // 2 for a, b in zip(T, TR)]
                elif mode == 10:
                    TL = above[x - 1]
                    TR = above[x + 1] if x + 1 < w else row[0]
                    pred = [
                        ((a + b) // 2 + (c + d) // 2) // 2
                        for a, b, c, d in zip(L, TL, T, TR)
                    ]
                elif mode == 11:  # Select
                    TL = above[x - 1]
                    pl = sum(abs(a - b) for a, b in zip(T, TL))
                    pt = sum(abs(a - b) for a, b in zip(L, TL))
                    pred = L if pl < pt else T
                elif mode == 12:  # ClampAddSubtractFull
                    TL = above[x - 1]
                    pred = [
                        min(255, max(0, a + b - c)) for a, b, c in zip(L, T, TL)
                    ]
                elif mode == 13:  # ClampAddSubtractHalf
                    # half-delta uses C integer division (truncate toward
                    # zero), not Python floor division
                    TL = above[x - 1]
                    pred = []
                    for a, b, c in zip(L, T, TL):
                        m = (a + b) // 2
                        d = m - c
                        half = (abs(d) // 2) if d >= 0 else -(abs(d) // 2)
                        pred.append(min(255, max(0, m + half)))
                else:
                    raise ValueError("corrupt VP8L: bad predictor mode")
            cur = row[x]
            row[x] = [
                (cur[0] + pred[0]) & 0xFF,
                (cur[1] + pred[1]) & 0xFF,
                (cur[2] + pred[2]) & 0xFF,
                (cur[3] + pred[3]) & 0xFF,
            ]
    px[:] = np.asarray(p, dtype=np.int32).astype(np.uint8)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inv_color_transform(px: np.ndarray, elems: np.ndarray, tile_bits: int) -> None:
    """Cross-color inverse (spec 4.2.3): the tile pixel stores
    red_to_blue in RED, green_to_blue in GREEN, green_to_red in BLUE;
    deltas are (int8 coefficient * int8 channel) >> 5. Red depends only
    on green and blue only on (green, new red), so the whole image
    vectorizes: expand the tile coefficients to the pixel grid and
    apply both channel updates as array expressions (numpy's arithmetic
    >> IS the spec's floor shift)."""
    h, w = px.shape[:2]
    ys = np.arange(h) >> tile_bits
    xs = np.arange(w) >> tile_bits
    e = elems[ys[:, None], xs[None, :]].astype(np.int32)  # (h, w, 3)
    r2b, g2b, g2r = (e[:, :, 0] - ((e[:, :, 0] >= 128) << 8),
                     e[:, :, 1] - ((e[:, :, 1] >= 128) << 8),
                     e[:, :, 2] - ((e[:, :, 2] >= 128) << 8))
    g = px[:, :, 2].astype(np.int32)
    g -= (g >= 128) << 8  # int8 view of the green channel
    r = (px[:, :, 1].astype(np.int32) + ((g2r * g) >> 5)) & 0xFF
    r_s = r - ((r >= 128) << 8)
    b = (px[:, :, 3].astype(np.int32) + ((g2b * g) >> 5) + ((r2b * r_s) >> 5)) & 0xFF
    px[:, :, 1] = r.astype(np.uint8)
    px[:, :, 3] = b.astype(np.uint8)


def _inv_color_indexing(px: np.ndarray, palette: np.ndarray, pack_bits: int, width: int) -> np.ndarray:
    h = px.shape[0]
    if pack_bits == 0:
        idx = px[:, :, 2]
        return palette[np.minimum(idx, len(palette) - 1)]
    # sub-byte bundling: each stored green byte packs 8>>? pixels
    per = 1 << pack_bits  # pixels per byte = 8 / bits_per_pixel; pack_bits in {1,2,3}
    bits = 8 >> pack_bits
    packed = px[:, :, 2]
    out = np.zeros((h, width, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(width):
            byte = packed[y, x >> pack_bits]
            shift = (x & (per - 1)) * bits
            v = (byte >> shift) & ((1 << bits) - 1)
            out[y, x] = palette[min(v, len(palette) - 1)]
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP file → (H, W, 3|4) uint8. VP8L decodes natively;
    VP8X (extended, r16) unwraps to its VP8L payload — for animations
    the return is the FIRST composited canvas (RGBA), mirroring the
    GIF decoder; :func:`decode_webp_frames` yields them all. Lossy VP8
    payloads stay a documented table-data ceiling."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP stream")
    chunk = data[12:16]
    if chunk == b"VP8X":
        frames, _delays = _decode_vp8x(data)
        return frames[0]
    if chunk == b"VP8 ":
        # DOCUMENTED CEILING (r15, same class as the MP3 gate in
        # audio.decode_audio): VP8 intra decode requires RFC 6386's
        # normative TABLE DATA — the default coefficient-probability
        # tables (~2k entries), token trees, and quantizer lookup
        # tables — which are data, not formulas; with no codec binary,
        # no network, and no conformance bitstream in this sandbox a
        # from-memory transcription is unvalidatable, and mirrored
        # encoder/decoder table errors pass every self-made fixture.
        # VP8L (lossless) decodes natively here because its entropy
        # codes travel in-stream.
        raise NotImplementedError(
            "lossy WebP (VP8) needs PIL: RFC 6386's probability/quantizer tables "
            "are normative table data that cannot be validated in this environment "
            "— only VP8L decodes natively here"
        )
    if chunk != b"VP8L":
        raise ValueError("corrupt WEBP: unknown chunk")
    (ln,) = struct.unpack("<I", data[16:20])
    body = data[20 : 20 + ln]
    return _decode_vp8l(body)


def _decode_vp8l(body: bytes) -> np.ndarray:
    """Decode one VP8L chunk body → (H, W, 3|4) uint8."""
    if not body or body[0] != 0x2F:
        raise ValueError("corrupt VP8L: bad signature")
    br = _LsbReader(body)
    br.read(8)  # signature
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError("corrupt VP8L: bad version")
    # transforms (reverse-order application)
    transforms = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 0:  # predictor
            tb = br.read(3) + 2
            mw, mh = -(-xsize >> tb), -(-h >> tb)
            timg = _read_entropy_image(br, mw, mh, allow_meta=False)
            transforms.append(("predictor", tb, timg[:, :, 2].copy()))
        elif ttype == 1:  # cross-color
            tb = br.read(3) + 2
            mw, mh = -(-xsize >> tb), -(-h >> tb)
            timg = _read_entropy_image(br, mw, mh, allow_meta=False)
            # (r2b, g2b, g2r) live in (R, G, B) of the tile pixel
            transforms.append(("color", tb, timg[:, :, 1:4].copy()))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract-green",))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_px = _read_entropy_image(br, n_colors, 1, allow_meta=False)[0]
            # palette entries are delta-coded component-wise
            pal = np.cumsum(pal_px.astype(np.uint16), axis=0).astype(np.uint8)
            pack_bits = 0
            if n_colors <= 2:
                pack_bits = 3
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            transforms.append(("palette", pal, pack_bits, xsize))
            if pack_bits:
                xsize = -(-xsize >> pack_bits)
    px = _read_entropy_image(br, xsize, h, allow_meta=True)
    for t in reversed(transforms):
        if t[0] == "palette":
            px = _inv_color_indexing(px, t[1], t[2], t[3])
        elif t[0] == "subtract-green":
            _inv_subtract_green(px)
        elif t[0] == "predictor":
            _inv_predictor(px, t[2], t[1])
        else:
            _inv_color_transform(px, t[2], t[1])
    rgb = px[:, :, 1:4]
    if has_alpha:
        return np.concatenate([rgb, px[:, :, 0:1]], axis=2)
    return rgb.copy()


# ------------------------------------------------ VP8X container (r16)


def _riff_chunks(data: bytes, start: int = 12):
    """Yield (fourcc, payload) for each RIFF sub-chunk (odd sizes are
    padded per RIFF)."""
    pos = start
    while pos + 8 <= len(data):
        four = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) < ln:
            raise ValueError("corrupt WEBP: truncated chunk")
        yield four, payload
        pos += 8 + ln + (ln & 1)


def _frame_pixels(chunks) -> np.ndarray:
    """Decode the image payload among a chunk list: VP8L natively,
    VP8/ALPH gate with the lossy table-data rationale."""
    for four, payload in chunks:
        if four == b"VP8L":
            return _decode_vp8l(payload)
        if four in (b"VP8 ", b"ALPH"):
            raise NotImplementedError(
                "lossy WebP (VP8/ALPH) inside VP8X needs PIL: RFC 6386 table data "
                "— only VP8L payloads decode natively here"
            )
    raise ValueError("corrupt WEBP: VP8X frame without an image chunk")


def _decode_vp8x(data: bytes):
    """Decode an extended (VP8X) WebP → (frames, delays_ms). Still
    images return one frame with delay 0; animations composite each
    ANMF rectangle onto the canvas per the container spec's blending
    (alpha-blend or overwrite) and disposal (none or
    dispose-to-background) rules, returning RGBA canvases."""
    chunks = list(_riff_chunks(data))
    if not chunks or chunks[0][0] != b"VP8X":
        raise ValueError("corrupt WEBP: VP8X chunk missing")
    head = chunks[0][1]
    if len(head) < 10:
        raise ValueError("corrupt WEBP: short VP8X header")
    flags = head[0]
    if flags & 0xC1:
        raise ValueError("corrupt WEBP: reserved VP8X flag bits set")
    animated = bool(flags & 0x02)
    cw = int.from_bytes(head[4:7], "little") + 1
    ch = int.from_bytes(head[7:10], "little") + 1
    # crafted-canvas cap: each side within the VP8L payload limit
    # (16384) and the pixel count within 2^24 (64 MB RGBA canvas) —
    # every decodable (lossless-payload) file fits; a flipped dims
    # field can't force gigabyte memsets per ANMF frame
    if cw > 16384 or ch > 16384 or cw * ch > 1 << 24:
        raise ValueError("corrupt WEBP: implausible VP8X canvas size")
    if not animated:
        px = _frame_pixels(chunks[1:])
        if px.shape[0] != ch or px.shape[1] != cw:
            raise ValueError("corrupt WEBP: still VP8X image does not fill the canvas")
        return [px], [0]
    bg = np.array([255, 255, 255, 255], dtype=np.uint8)
    for four, payload in chunks:
        if four == b"ANIM":
            if len(payload) < 6:
                raise ValueError("corrupt WEBP: short ANIM chunk")
            b_, g_, r_, a_ = payload[0], payload[1], payload[2], payload[3]
            bg = np.array([r_, g_, b_, a_], dtype=np.uint8)  # stored BGRA
    canvas = np.broadcast_to(bg, (ch, cw, 4)).copy()
    frames: List[np.ndarray] = []
    delays: List[int] = []
    for four, payload in chunks:
        if four != b"ANMF":
            continue
        if len(payload) < 16:
            raise ValueError("corrupt WEBP: short ANMF header")
        fx = int.from_bytes(payload[0:3], "little") * 2
        fy = int.from_bytes(payload[3:6], "little") * 2
        fw = int.from_bytes(payload[6:9], "little") + 1
        fh = int.from_bytes(payload[9:12], "little") + 1
        dur = int.from_bytes(payload[12:15], "little")
        fflags = payload[15]
        no_blend = bool(fflags & 0x02)
        dispose_bg = bool(fflags & 0x01)
        if fx + fw > cw or fy + fh > ch:
            raise ValueError("corrupt WEBP: ANMF rectangle exceeds the canvas")
        px = _frame_pixels(list(_riff_chunks(payload, start=16)))
        if px.shape[:2] != (fh, fw):
            raise ValueError("corrupt WEBP: ANMF payload dims disagree with its header")
        if px.shape[2] == 3:
            px = np.concatenate([px, np.full((fh, fw, 1), 255, np.uint8)], axis=2)
        rect = canvas[fy : fy + fh, fx : fx + fw]
        if no_blend:
            rect[:] = px
        else:  # source-over alpha blend (container spec §Animation)
            fa = px[:, :, 3:4].astype(np.float64) / 255.0
            ca = rect[:, :, 3:4].astype(np.float64) / 255.0
            oa = fa + ca * (1.0 - fa)
            rgb = px[:, :, :3].astype(np.float64) * fa + rect[:, :, :3].astype(
                np.float64
            ) * ca * (1.0 - fa)
            safe = np.where(oa > 0, oa, 1.0)
            rect[:, :, :3] = np.round(rgb / safe).astype(np.uint8)
            rect[:, :, 3:4] = np.round(oa * 255.0).astype(np.uint8)
        frames.append(canvas.copy())
        delays.append(dur)
        if dispose_bg:
            canvas[fy : fy + fh, fx : fx + fw] = bg
    if not frames:
        raise ValueError("corrupt WEBP: animation without ANMF frames")
    return frames, delays


def decode_webp_frames(data: bytes) -> Tuple[List[np.ndarray], List[int]]:
    """Decode any WebP → (composited frames, per-frame delays in ms) —
    the GIF-decoder shape. Single-image files return one frame with
    delay 0."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP stream")
    if data[12:16] == b"VP8X":
        return _decode_vp8x(data)
    return [decode_webp(data)], [0]


# ---------------------------------------------------------------- encoder


def _write_flat_code(bw: _LsbWriter, n_symbols: int) -> None:
    """A complete flat 8-bit code over the first 256 symbols via the
    code-length code (symbol '8' + repeat-16 tokens). When the alphabet
    is larger than 256 (the green code), the max-symbol limit stops the
    reader exactly after our tokens so the remaining lengths stay 0."""
    bw.write(0, 1)  # not simple
    # code-length code over symbols {8, 16}: both length 1
    order_pos = {s: i for i, s in enumerate(_CLC_ORDER)}
    n_codes = max(order_pos[8], order_pos[16]) + 1
    bw.write(n_codes - 4, 4)
    for i in range(n_codes):
        s = _CLC_ORDER[i]
        bw.write(1 if s in (8, 16) else 0, 3)
    # tokens: one '8' then repeat-16s covering the other 255 entries
    reps = []
    left = 255
    while left > 0:
        rep = min(6, left)
        if rep < 3:
            reps.extend([None] * rep)  # literal '8's
            left = 0
        else:
            reps.append(rep)
            left -= rep
    n_tokens = 1 + len(reps)
    if n_symbols > 256:
        bw.write(1, 1)  # max-symbol limit present
        bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
        bw.write(n_tokens - 2, 8)  # max_symbol = 2 + x = token count
    else:
        bw.write(0, 1)
    # canonical over {8,16}: 8 -> code 0, 16 -> code 1 (1 bit each)
    bw.write(0, 1)  # symbol 8
    for rep in reps:
        if rep is None:
            bw.write(0, 1)  # literal '8'
        else:
            bw.write(1, 1)  # symbol 16
            bw.write(rep - 3, 2)


def _write_single_code(bw: _LsbWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def _forward_predict(p: np.ndarray, mode: int) -> np.ndarray:
    """Spec-semantics forward predictor over ORIGINAL pixel values
    (lossless: reconstructed == original), written independently of
    `_inv_predictor` so encoder/decoder round trips cross-check both.
    Edge rules per the VP8L spec / libwebp's contiguous row buffer:
    top-left seeds [255,0,0,0]; first row predicts from the left;
    first column from directly above; TR on the last column is the
    CURRENT row's first pixel."""
    h, w = p.shape[:2]
    pred = np.zeros_like(p)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred[y, x] = (255, 0, 0, 0)
            elif y == 0:
                pred[y, x] = p[0, x - 1]
            elif x == 0:
                pred[y, x] = p[y - 1, 0]
            else:
                L, T, TL = p[y, x - 1], p[y - 1, x], p[y - 1, x - 1]
                TR = p[y - 1, x + 1] if x + 1 < w else p[y, 0]
                if mode == 0:
                    pred[y, x] = (255, 0, 0, 0)
                elif mode == 1:
                    pred[y, x] = L
                elif mode == 2:
                    pred[y, x] = T
                elif mode == 3:
                    pred[y, x] = TR
                elif mode == 4:
                    pred[y, x] = TL
                elif mode == 5:
                    pred[y, x] = ((L + TR) // 2 + T) // 2
                elif mode == 6:
                    pred[y, x] = (L + TL) // 2
                elif mode == 7:
                    pred[y, x] = (L + T) // 2
                elif mode == 8:
                    pred[y, x] = (TL + T) // 2
                elif mode == 9:
                    pred[y, x] = (T + TR) // 2
                elif mode == 10:
                    pred[y, x] = ((L + TL) // 2 + (T + TR) // 2) // 2
                elif mode == 11:  # Select
                    pred[y, x] = L if np.abs(T - TL).sum() < np.abs(L - TL).sum() else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred[y, x] = np.clip(L + T - TL, 0, 255)
                else:  # 13: ClampAddSubtractHalf, half-delta truncates toward zero
                    av = (L + T) // 2
                    d = av - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred[y, x] = np.clip(av + half, 0, 255)
    return pred


def _encode_vp8l_body(
    px: np.ndarray,
    subtract_green: bool = False,
    palette: bool = False,
    predict_left: bool = False,
    cross_color: bool = False,
    rle: bool = False,
    predict_mode: int | None = None,
) -> bytes:
    """Encode (H, W, 3|4) uint8 as a VP8L chunk body: literal ARGB
    under flat 8-bit codes, optionally behind the subtract-green,
    color-indexing (≤256 colors, no bundling — the decoder handles
    bundled foreign files), or predictor transform. `predict_left`
    keeps the fast vectorized mode-1 path; `predict_mode=0..13`
    emulates a foreign encoder via an independent scalar forward
    predictor (spec semantics written separately from the decoder's
    inverse, so round trips cross-check both). Lossless: the decode
    reproduces the input exactly."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("encode_webp needs (H, W, 3|4) uint8")
    h, w = px.shape[:2]
    has_alpha = px.shape[2] == 4
    a = px[:, :, 3].astype(np.uint16) if has_alpha else np.full((h, w), 255, np.uint16)
    r = px[:, :, 0].astype(np.uint16)
    g = px[:, :, 1].astype(np.uint16)
    b = px[:, :, 2].astype(np.uint16)
    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)

    if palette and (predict_left or subtract_green):
        raise ValueError("palette mode composes with no other encoder transform")
    if palette:
        flat = np.stack([a, r, g, b], axis=2).reshape(-1, 4)
        pal_arr, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(pal_arr) > 256:
            raise ValueError("palette mode needs <=256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(len(pal_arr) - 1, 8)
        # palette itself: delta-coded entropy image of (n,1)
        deltas = np.diff(np.vstack([[[0, 0, 0, 0]], pal_arr.astype(np.int32)]), axis=0) & 0xFF
        _write_argb_literals(bw, deltas.astype(np.uint8))
        idx = inverse.reshape(h, w).astype(np.uint16)
        # sub-byte bundling is IMPLIED by palette size — the decoder
        # derives it, so the encoder must pack accordingly
        n = len(pal_arr)
        pack_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if pack_bits:
            per, bits = 1 << pack_bits, 8 >> pack_bits
            pw = -(-w >> pack_bits)
            packed = np.zeros((h, pw), np.uint16)
            for x in range(w):
                packed[:, x >> pack_bits] |= idx[:, x] << ((x & (per - 1)) * bits)
            idx = packed
        hw = idx.shape
        a = np.full(hw, 255, np.uint16)
        r = np.zeros(hw, np.uint16)
        g = idx
        b = np.zeros(hw, np.uint16)
    if predict_left and predict_mode is None:
        predict_mode = 1
    if predict_mode is not None:
        if not 0 <= predict_mode <= 13:
            raise ValueError("predict_mode must be 0..13")
        bw.write(1, 1)
        bw.write(0, 2)  # predictor transform
        bw.write(2, 3)  # tile bits 4 -> read(3)+2... write 2 => tile_bits 4
        tb = 4
        mw, mh = -(-w >> tb), -(-h >> tb)
        # one mode everywhere: tile pixels carry mode in GREEN
        modes = np.zeros((mh, mw, 4), dtype=np.uint8)
        modes[:, :, 2] = predict_mode
        modes[:, :, 0] = 255
        _write_argb_literals(bw, modes.reshape(-1, 4))
        planes = np.stack([a, r, g, b], axis=2).astype(np.int32)
        if predict_left:
            # fast vectorized mode-1 residuals
            res = planes.copy()
            res[0, 0] -= np.array([255, 0, 0, 0])
            if w > 1:
                res[0, 1:] -= planes[0, :-1]
            if h > 1:
                res[1:, 0] -= planes[:-1, 0]
                res[1:, 1:] -= planes[1:, :-1]
        else:
            res = planes - _forward_predict(planes, predict_mode)
        res &= 0xFF
        a, r, g, b = (res[:, :, i].astype(np.uint16) for i in range(4))
    if cross_color:
        if palette:
            raise ValueError("palette mode composes with no other encoder transform")
        # constant coefficients over one whole-image tile (forward =
        # exact inverse of _inv_color_transform's delta order)
        g2r, g2b, r2b = 17, -9, 5
        bw.write(1, 1)
        bw.write(1, 2)  # cross-color transform
        tb = 9 - 2  # tile_bits = read(3)+2 = 9 -> one tile up to 512px
        bw.write(tb, 3)
        tile = np.zeros((-(-h >> (tb + 2)), -(-w >> (tb + 2)), 4), dtype=np.uint8)
        tile[:, :, 0] = 255
        tile[:, :, 1] = r2b & 0xFF
        tile[:, :, 2] = g2b & 0xFF
        tile[:, :, 3] = g2r & 0xFF
        _write_argb_literals(bw, tile.reshape(-1, 4))
        for y in range(h):
            for x in range(w):
                gs = _s8(int(g[y, x]))
                r_new = int(r[y, x])
                r[y, x] = (r_new - ((g2r * gs) >> 5)) & 0xFF
                b[y, x] = (
                    int(b[y, x]) - ((g2b * gs) >> 5) - ((r2b * _s8(r_new)) >> 5)
                ) & 0xFF
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw.write(0, 1)  # no more transforms
    _write_argb_literals(
        bw,
        np.stack([a, r, g, b], axis=2).reshape(-1, 4).astype(np.uint8),
        top_level=True,
        rle=rle,
    )
    return bw.bytes()


def _chunk(four: bytes, payload: bytes) -> bytes:
    return four + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")


def _riff_wrap(chunks: bytes) -> bytes:
    riff = b"WEBP" + chunks
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_webp(
    px: np.ndarray,
    subtract_green: bool = False,
    palette: bool = False,
    predict_left: bool = False,
    cross_color: bool = False,
    rle: bool = False,
    predict_mode: int | None = None,
) -> bytes:
    """Encode (H, W, 3|4) uint8 as a simple WebP-lossless (VP8L) file —
    see :func:`_encode_vp8l_body` for the transform options."""
    body = _encode_vp8l_body(
        px, subtract_green, palette, predict_left, cross_color, rle, predict_mode
    )
    return _riff_wrap(_chunk(b"VP8L", body))


def _vp8x_header(w: int, h: int, animated: bool, has_alpha: bool,
                 has_exif: bool = False, has_xmp: bool = False) -> bytes:
    flags = (
        (0x10 if has_alpha else 0) | (0x08 if has_exif else 0)
        | (0x04 if has_xmp else 0) | (0x02 if animated else 0)
    )
    return _chunk(
        b"VP8X",
        bytes([flags, 0, 0, 0])
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little"),
    )


def encode_webp_extended(px: np.ndarray, exif: bytes = b"", xmp: bytes = b"") -> bytes:
    """Still extended WebP: VP8X header (+ optional EXIF/XMP metadata
    chunks) wrapping one VP8L payload."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    out = _vp8x_header(w, h, False, px.ndim == 3 and px.shape[2] == 4,
                       bool(exif), bool(xmp))
    out += _chunk(b"VP8L", _encode_vp8l_body(px))
    if exif:
        out += _chunk(b"EXIF", exif)
    if xmp:
        out += _chunk(b"XMP ", xmp)
    return _riff_wrap(out)


def encode_webp_anim(
    frames,
    delays_ms=None,
    loop_count: int = 0,
    background=(255, 255, 255, 255),
    offsets=None,
    no_blend=None,
    dispose_bg=None,
    canvas_size: Optional[Tuple[int, int]] = None,
) -> bytes:
    """Animated WebP (container spec): VP8X + ANIM + one ANMF per frame,
    each carrying a lossless VP8L payload. ``offsets`` are per-frame
    (x, y) canvas positions (even values — the container stores them
    halved); ``no_blend`` / ``dispose_bg`` are per-frame booleans for
    the ANMF flag bits; ``background`` is RGBA. Lossless payloads, so
    composited round trips are exact."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("animation needs at least one frame")
    n = len(frames)
    delays_ms = list(delays_ms) if delays_ms is not None else [100] * n
    offsets = list(offsets) if offsets is not None else [(0, 0)] * n
    no_blend = list(no_blend) if no_blend is not None else [True] + [False] * (n - 1)
    dispose_bg = list(dispose_bg) if dispose_bg is not None else [False] * n
    if not (len(delays_ms) == len(offsets) == len(no_blend) == len(dispose_bg) == n):
        raise ValueError("per-frame lists must match the frame count")
    cw = ch = 0
    for f, (x, y) in zip(frames, offsets):
        if x % 2 or y % 2 or x < 0 or y < 0:
            raise ValueError("frame offsets must be even and non-negative")
        cw = max(cw, x + f.shape[1])
        ch = max(ch, y + f.shape[0])
    if canvas_size is not None:
        if canvas_size[0] < cw or canvas_size[1] < ch:
            raise ValueError("canvas_size smaller than the frame extents")
        cw, ch = canvas_size
    has_alpha = any(f.ndim == 3 and f.shape[2] == 4 for f in frames)
    r_, g_, b_, a_ = background
    out = _vp8x_header(cw, ch, True, has_alpha)
    out += _chunk(b"ANIM", bytes([b_, g_, r_, a_]) + struct.pack("<H", loop_count))
    for f, d, (x, y), nb, db in zip(frames, delays_ms, offsets, no_blend, dispose_bg):
        fh, fw = f.shape[:2]
        head = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(d).to_bytes(3, "little")
            + bytes([(0x02 if nb else 0) | (0x01 if db else 0)])
        )
        out += _chunk(b"ANMF", head + _chunk(b"VP8L", _encode_vp8l_body(f)))
    return _riff_wrap(out)


def _write_green_rle_code(bw: _LsbWriter) -> None:
    """Green code for the RLE mode: 256 literal symbols at 9 bits plus
    symbol 256 (length prefix 0 — a length-1 backref) at 1 bit; Kraft
    256·2⁻⁹ + 2⁻¹ = 1, so the code is complete. Canonical assignment:
    symbol 256 → code 0 (1 bit), literal s → code 256+s (9 bits)."""
    bw.write(0, 1)  # not simple
    order_pos = {s: i for i, s in enumerate(_CLC_ORDER)}
    n_codes = max(order_pos[1], order_pos[9], order_pos[16]) + 1
    bw.write(n_codes - 4, 4)
    # clc lengths: {16: 1, 1: 2, 9: 2} -> codes 16:'0', 1:'10', 9:'11'
    clc_len = {16: 1, 1: 2, 9: 2}
    for i in range(n_codes):
        bw.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    reps = []
    left = 255
    while left > 0:
        rep = min(6, left)
        if rep < 3:
            reps.extend([None] * rep)
            left = 0
        else:
            reps.append(rep)
            left -= rep
    n_tokens = 2 + len(reps)  # '9', repeats..., '1'
    bw.write(1, 1)
    bw.write(3, 3)  # length_nbits = 8
    bw.write(n_tokens - 2, 8)
    bw.write_code(0b11, 2)  # symbol 9
    for rep in reps:
        if rep is None:
            bw.write_code(0b11, 2)
        else:
            bw.write_code(0b0, 1)  # symbol 16
            bw.write(rep - 3, 2)
    bw.write_code(0b10, 2)  # symbol 1 (for green symbol 256)


def _write_argb_literals(
    bw: _LsbWriter, argb_rows: np.ndarray, top_level: bool = False, rle: bool = False
) -> None:
    """One entropy-coded image: no cache, flat 8-bit R/B/A codes, and a
    green code that is either flat literals or the RLE variant
    (length-1 backrefs at distance 1 for repeated pixels — exercises
    the decoder's LZ77 path with the 2D short-distance map). Only the
    TOP-LEVEL image carries the meta-huffman presence bit
    (transform/palette sub-images are read with allow_meta=False)."""
    bw.write(0, 1)  # no color cache
    if top_level:
        bw.write(0, 1)  # no meta-huffman
    if rle:
        _write_green_rle_code(bw)
    else:
        _write_flat_code(bw, 256 + 24)  # green: flat over first 256
    _write_flat_code(bw, 256)  # red
    _write_flat_code(bw, 256)  # blue
    _write_flat_code(bw, 256)  # alpha
    # distance code: single symbol -> zero bits per use. Prefix code 1
    # = distance code 2 = 2D offset (1, 0) = "previous pixel".
    _write_single_code(bw, 1 if rle else 0)
    prev = None
    for row in argb_rows:
        a_, r_, g_, b_ = (int(v) for v in row)
        if rle and prev == (a_, r_, g_, b_):
            bw.write_code(0, 1)  # green symbol 256: length-1 backref
            continue
        if rle:
            bw.write_code(256 + g_, 9)
        else:
            bw.write_code(g_, 8)  # flat code: canonical code of s IS s
        bw.write_code(r_, 8)
        bw.write_code(b_, 8)
        bw.write_code(a_, 8)
        prev = (a_, r_, g_, b_)
