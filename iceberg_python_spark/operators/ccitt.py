"""ITU-T T.4 / T.6 (CCITT Group 3/4) bilevel fax codecs, from spec.

Decision record (VERDICT r16 #8 asked for an explicit call): CCITT is
IMPLEMENTED, not ceilinged. The Modified-Huffman run-length code
tables are printed in TIFF 6.0 §10 itself (the same document this
repo's TIFF container work is built from) and in T.4 Tables 2-4 — the
same "tables printed in the implementing spec" class as JPEG's
Annex K, which this repo already ships in both directions. The 2D
coding layer is nine short mode codes (T.4 Table 4 / T.6 Table 1)
plus a changing-elements algorithm the specs state normatively. That
is unlike the MP3/Opus/lossy-VP8 ceiling class, whose normative data
is page after page of psychoacoustic/codebook tables with no in-spec
worked path to validate against. Validation here: byte-exact pins of
hand-derived spec vectors (the canonical all-white 1728-pel MH row;
a hand-worked T.6 2D line), encoder/decoder roundtrips over
adversarial run patterns (0-length leading white, runs > 2560 that
need chained makeups, alternating single-pel runs), and the
structured-corruption fuzz contract. The T.4/T.6 "uncompressed mode"
extension (rare; switched on by an in-stream escape) gates loudly.

Decoded/encoded pixel convention: "ink" bits, 1 = black, 0 = white —
what a TIFF bps=1 Photometric-0 (WhiteIsZero) strip stores. The TIFF
strip/tile paths pack these through np.packbits and reuse the
uncompressed-bilevel tail (photometric inversion included).

Reference parity: pyiceberg has no codec layer; the reference point
is the public specs (ITU-T T.4 §2, T.6 §2, TIFF 6.0 §10/Section 11
and TIFF TechNote on G3/G4 options).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# T.4 code tables (TIFF 6.0 §10; T.4 Tables 2-4). (run: (bits, nbits)).
# ---------------------------------------------------------------------------

_WHITE_TERM: Dict[int, Tuple[int, int]] = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6), 15: (0b110101, 6),
    16: (0b101010, 6), 17: (0b101011, 6), 18: (0b0100111, 7), 19: (0b0001100, 7),
    20: (0b0001000, 7), 21: (0b0010111, 7), 22: (0b0000011, 7), 23: (0b0000100, 7),
    24: (0b0101000, 7), 25: (0b0101011, 7), 26: (0b0010011, 7), 27: (0b0100100, 7),
    28: (0b0011000, 7), 29: (0b00000010, 8), 30: (0b00000011, 8), 31: (0b00011010, 8),
    32: (0b00011011, 8), 33: (0b00010010, 8), 34: (0b00010011, 8), 35: (0b00010100, 8),
    36: (0b00010101, 8), 37: (0b00010110, 8), 38: (0b00010111, 8), 39: (0b00101000, 8),
    40: (0b00101001, 8), 41: (0b00101010, 8), 42: (0b00101011, 8), 43: (0b00101100, 8),
    44: (0b00101101, 8), 45: (0b00000100, 8), 46: (0b00000101, 8), 47: (0b00001010, 8),
    48: (0b00001011, 8), 49: (0b01010010, 8), 50: (0b01010011, 8), 51: (0b01010100, 8),
    52: (0b01010101, 8), 53: (0b00100100, 8), 54: (0b00100101, 8), 55: (0b01011000, 8),
    56: (0b01011001, 8), 57: (0b01011010, 8), 58: (0b01011011, 8), 59: (0b01001010, 8),
    60: (0b01001011, 8), 61: (0b00110010, 8), 62: (0b00110011, 8), 63: (0b00110100, 8),
}

_WHITE_MAKEUP: Dict[int, Tuple[int, int]] = {
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6), 256: (0b0110111, 7),
    320: (0b00110110, 8), 384: (0b00110111, 8), 448: (0b01100100, 8),
    512: (0b01100101, 8), 576: (0b01101000, 8), 640: (0b01100111, 8),
    704: (0b011001100, 9), 768: (0b011001101, 9), 832: (0b011010010, 9),
    896: (0b011010011, 9), 960: (0b011010100, 9), 1024: (0b011010101, 9),
    1088: (0b011010110, 9), 1152: (0b011010111, 9), 1216: (0b011011000, 9),
    1280: (0b011011001, 9), 1344: (0b011011010, 9), 1408: (0b011011011, 9),
    1472: (0b010011000, 9), 1536: (0b010011001, 9), 1600: (0b010011010, 9),
    1664: (0b011000, 6), 1728: (0b010011011, 9),
}

_BLACK_TERM: Dict[int, Tuple[int, int]] = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7), 11: (0b0000101, 7),
    12: (0b0000111, 7), 13: (0b00000100, 8), 14: (0b00000111, 8),
    15: (0b000011000, 9), 16: (0b0000010111, 10), 17: (0b0000011000, 10),
    18: (0b0000001000, 10), 19: (0b00001100111, 11), 20: (0b00001101000, 11),
    21: (0b00001101100, 11), 22: (0b00000110111, 11), 23: (0b00000101000, 11),
    24: (0b00000010111, 11), 25: (0b00000011000, 11), 26: (0b000011001010, 12),
    27: (0b000011001011, 12), 28: (0b000011001100, 12), 29: (0b000011001101, 12),
    30: (0b000001101000, 12), 31: (0b000001101001, 12), 32: (0b000001101010, 12),
    33: (0b000001101011, 12), 34: (0b000011010010, 12), 35: (0b000011010011, 12),
    36: (0b000011010100, 12), 37: (0b000011010101, 12), 38: (0b000011010110, 12),
    39: (0b000011010111, 12), 40: (0b000001101100, 12), 41: (0b000001101101, 12),
    42: (0b000011011010, 12), 43: (0b000011011011, 12), 44: (0b000001010100, 12),
    45: (0b000001010101, 12), 46: (0b000001010110, 12), 47: (0b000001010111, 12),
    48: (0b000001100100, 12), 49: (0b000001100101, 12), 50: (0b000001010010, 12),
    51: (0b000001010011, 12), 52: (0b000000100100, 12), 53: (0b000000110111, 12),
    54: (0b000000111000, 12), 55: (0b000000100111, 12), 56: (0b000000101000, 12),
    57: (0b000001011000, 12), 58: (0b000001011001, 12), 59: (0b000000101011, 12),
    60: (0b000000101100, 12), 61: (0b000001011010, 12), 62: (0b000001100110, 12),
    63: (0b000001100111, 12),
}

_BLACK_MAKEUP: Dict[int, Tuple[int, int]] = {
    64: (0b0000001111, 10), 128: (0b000011001000, 12), 192: (0b000011001001, 12),
    256: (0b000001011011, 12), 320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13), 576: (0b0000001101101, 13),
    640: (0b0000001001010, 13), 704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13), 960: (0b0000001110011, 13),
    1024: (0b0000001110100, 13), 1088: (0b0000001110101, 13), 1152: (0b0000001110110, 13),
    1216: (0b0000001110111, 13), 1280: (0b0000001010010, 13), 1344: (0b0000001010011, 13),
    1408: (0b0000001010100, 13), 1472: (0b0000001010101, 13), 1536: (0b0000001011010, 13),
    1600: (0b0000001011011, 13), 1664: (0b0000001100100, 13), 1728: (0b0000001100101, 13),
}

#: extended makeups 1792-2560 (T.4 Table 4) are colour-shared
_EXT_MAKEUP: Dict[int, Tuple[int, int]] = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11), 1920: (0b00000001101, 11),
    1984: (0b000000010010, 12), 2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12), 2304: (0b000000010111, 12),
    2368: (0b000000011100, 12), 2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}

_EOL = (0b000000000001, 12)

# decode lookup: {(nbits, code): run}; makeups keep their value, the
# decoder loops until a terminating code (< 64) ends the run
def _dec_table(*tables: Dict[int, Tuple[int, int]]) -> Dict[Tuple[int, int], int]:
    out: Dict[Tuple[int, int], int] = {}
    for t in tables:
        for run, (code, n) in t.items():
            out[(n, code)] = run
    return out


_WHITE_DEC = _dec_table(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_DEC = _dec_table(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)

# 2D mode codes (T.4 Table 4 / T.6): value -> (code, nbits)
_MODE_P = (0b0001, 4)
_MODE_H = (0b001, 3)
_MODE_V = {  # a1 - b1 -> code
    0: (0b1, 1),
    1: (0b011, 3), 2: (0b000011, 6), 3: (0b0000011, 7),
    -1: (0b010, 3), -2: (0b000010, 6), -3: (0b0000010, 7),
}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | code
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.n:
            out.append((self.acc << (8 - self.n)) & 0xFF)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("CCITT stream ended inside a code")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= len(self.bits)


def _read_run(br: _BitReader, black: bool) -> int:
    """One complete run: zero or more makeup codes + a terminating code."""
    table = _BLACK_DEC if black else _WHITE_DEC
    total = 0
    while True:
        code = 0
        n = 0
        while True:
            code = (code << 1) | br.read_bit()
            n += 1
            if n > 14:
                raise ValueError("CCITT: no run-length code within 14 bits")
            run = table.get((n, code))
            if run is not None:
                break
        total += run
        if run < 64:  # terminating code ends the run
            return total
        if total > 1 << 20:
            raise ValueError("CCITT: absurd run length")


def _write_run(bw: _BitWriter, run: int, black: bool) -> None:
    term = _BLACK_TERM if black else _WHITE_TERM
    makeup = _BLACK_MAKEUP if black else _WHITE_MAKEUP
    while run >= 2624:
        bw.put(*_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        tbl = _EXT_MAKEUP if m >= 1792 else makeup
        bw.put(*tbl[m])
        run -= m
    bw.put(*term[run])


# ---------------------------------------------------------------------------
# row <-> transitions
# ---------------------------------------------------------------------------


def _row_transitions(row: np.ndarray) -> List[int]:
    """Positions where the colour changes, line starting white."""
    padded = np.concatenate([[0], row.astype(np.int16)])
    return list(np.nonzero(np.diff(padded))[0])


def _transitions_to_row(trans: List[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    for i in range(0, len(trans), 2):
        start = trans[i]
        end = trans[i + 1] if i + 1 < len(trans) else width
        row[start:end] = 1
    return row


# ---------------------------------------------------------------------------
# 1D (Modified Huffman) rows
# ---------------------------------------------------------------------------


def _decode_1d_row(br: _BitReader, width: int) -> List[int]:
    trans: List[int] = []
    pos = 0
    black = False
    while pos < width:
        run = _read_run(br, black)
        if pos + run > width:
            raise ValueError("CCITT: 1D run overruns the row")
        pos += run
        trans.append(pos)
        black = not black
    # the trailing sentinel at `width` is not a real transition
    while trans and trans[-1] == width:
        trans.pop()
    return trans


def _encode_1d_row(bw: _BitWriter, row: np.ndarray) -> None:
    trans = _row_transitions(row) + [len(row)]
    pos = 0
    black = False
    for t in trans:
        _write_run(bw, t - pos, black)
        pos = t
        black = not black
    if pos < len(row):
        _write_run(bw, len(row) - pos, black)


# ---------------------------------------------------------------------------
# 2D rows (T.4 §2.2.4 / T.6 §2.2): changing-elements coding
# ---------------------------------------------------------------------------


def _b1_b2(ref: List[int], a0: int, color: int, start: bool) -> Tuple[int, int]:
    """b1: first changing element on the reference line right of a0
    whose colour is opposite the current colour (transitions to black
    sit at even indices); b2: the next one after b1."""
    n = len(ref)
    i = 0
    # strictly right of a0, except at line start where a transition at
    # position 0 (a0's imaginary predecessor is at -1) is eligible
    while i < n and (ref[i] < a0 or (ref[i] == a0 and not start)):
        i += 1
    if i % 2 != color:  # need transition-to-(opposite of current colour)
        i += 1
    width_sentinel = 1 << 30
    b1 = ref[i] if i < n else width_sentinel
    b2 = ref[i + 1] if i + 1 < n else width_sentinel
    return b1, b2


def _decode_2d_row(br: _BitReader, ref: List[int], width: int) -> List[int]:
    cur: List[int] = []
    a0 = 0
    color = 0  # 0 white, 1 black
    start = True
    while a0 < width:
        # read one mode code (max 7 bits; 0000001 = extension escape)
        code = 0
        n = 0
        mode = None
        while mode is None:
            code = (code << 1) | br.read_bit()
            n += 1
            if n > 7:
                raise ValueError("CCITT 2D: no mode code within 7 bits")
            if (code, n) == _MODE_P:
                mode = "P"
            elif (code, n) == _MODE_H:
                mode = "H"
            else:
                for d, (c, cn) in _MODE_V.items():
                    if (c, cn) == (code, n):
                        mode = ("V", d)
                        break
                if mode is None and n == 7 and code == 0b0000001:
                    raise NotImplementedError(
                        "CCITT uncompressed-mode extension (T.4 §2.2.5) unsupported"
                    )
        b1, b2 = _b1_b2(ref, a0, color, start)
        b1 = min(b1, width)
        b2 = min(b2, width)
        if mode == "P":
            if b2 <= a0:
                raise ValueError("CCITT 2D: pass mode does not advance")
            a0 = b2
        elif mode == "H":
            r1 = _read_run(br, bool(color))
            r2 = _read_run(br, not bool(color))
            a1 = a0 + r1
            a2 = a1 + r2
            if a2 > width or a1 > width:
                raise ValueError("CCITT 2D: horizontal runs overrun the row")
            if r1 == 0 and r2 == 0:
                raise ValueError("CCITT 2D: horizontal mode fails to advance")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:
            d = mode[1]
            a1 = b1 + d
            # strictly right of a0 (a0 is an already-coded changing
            # element), except at line start where a1 = 0 codes a row
            # that begins black
            if a1 > width or (a1 <= a0 if not start else a1 < 0):
                raise ValueError("CCITT 2D: vertical mode out of range")
            if cur and a1 < cur[-1]:
                raise ValueError("CCITT 2D: transitions not monotone")
            cur.append(a1)
            a0 = a1
            color ^= 1
        start = False
    while cur and cur[-1] == width:
        cur.pop()
    return cur


def _encode_2d_row(bw: _BitWriter, ref: List[int], cur: List[int], width: int) -> None:
    a0 = 0
    color = 0
    start = True
    ci = 0  # index into cur of the next transition > a0 (colour-correct)
    while a0 < width:
        # a1: next transition in cur after a0 (>= a0 allowed only at start)
        ci = 0
        while ci < len(cur) and (cur[ci] < a0 or (cur[ci] == a0 and not start)):
            ci += 1
        a1 = cur[ci] if ci < len(cur) else width
        a2 = cur[ci + 1] if ci + 1 < len(cur) else width
        b1, b2 = _b1_b2(ref, a0, color, start)
        b1 = min(b1, width)
        b2 = min(b2, width)
        if b2 < a1:
            bw.put(*_MODE_P)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.put(*_MODE_V[a1 - b1])
            a0 = a1
            color ^= 1
        else:
            bw.put(*_MODE_H)
            _write_run(bw, a1 - a0, bool(color))
            _write_run(bw, a2 - a1, not bool(color))
            a0 = a2
        start = False


# ---------------------------------------------------------------------------
# public codecs: G4 (T.6 / TIFF compression 4), G3 (T.4 / compression 3),
# MH (TIFF compression 2)
# ---------------------------------------------------------------------------


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 MMR -> (height, width) uint8 ink bits (1 = black). The
    reference line of the first row is imaginary all white; EOFB and
    trailing pad bits are tolerated."""
    if width <= 0 or height <= 0 or width * height > 1 << 30:
        raise ValueError("CCITT: implausible dimensions")
    br = _BitReader(data)
    ref: List[int] = []
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        cur = _decode_2d_row(br, ref, width)
        out[y] = _transitions_to_row(cur, width)
        ref = cur
    return out


def encode_g4(img: np.ndarray) -> bytes:
    """(H, W) ink bits -> T.6 stream ending in EOFB, zero-padded to a
    byte. Deterministic; decode_g4 round-trips exactly."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("encode_g4 takes a 2-D bilevel array")
    h, w = img.shape
    bw = _BitWriter()
    ref: List[int] = []
    for y in range(h):
        cur = _row_transitions(img[y] != 0)
        _encode_2d_row(bw, ref, cur, w)
        ref = cur
    bw.put(*_EOL)
    bw.put(*_EOL)
    return bw.bytes()


def _expect_eol(br: _BitReader) -> None:
    """Consume fill zeros + the 000000000001 EOL."""
    zeros = 0
    while True:
        b = br.read_bit()
        if b == 0:
            zeros += 1
            if zeros > 64 + 11:
                raise ValueError("CCITT G3: runaway fill before EOL")
        else:
            if zeros < 11:
                raise ValueError("CCITT G3: EOL expected")
            return


def decode_g3(
    data: bytes, width: int, height: int, two_d: bool = False
) -> np.ndarray:
    """T.4 (TIFF compression 3) -> ink bits. Every row is preceded by
    an EOL (fill bits tolerated); with ``two_d`` (T4Options bit 0) a
    tag bit after each EOL selects 1D (1) or 2D (0) for that row."""
    if width <= 0 or height <= 0 or width * height > 1 << 30:
        raise ValueError("CCITT: implausible dimensions")
    br = _BitReader(data)
    ref: List[int] = []
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        _expect_eol(br)
        if two_d:
            one_d = br.read_bit() == 1
        else:
            one_d = True
        if one_d:
            cur = _decode_1d_row(br, width)
        else:
            cur = _decode_2d_row(br, ref, width)
        out[y] = _transitions_to_row(cur, width)
        ref = cur
    return out


def encode_g3(img: np.ndarray, two_d: bool = False) -> bytes:
    """T.4 stream: EOL before every row; in 2D mode the first row is
    coded 1D (its tag bit 1) and the rest 2D (tag 0) — K = image
    height, which TIFF readers accept (T4Options declares 2D ability,
    not a K cadence)."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("encode_g3 takes a 2-D bilevel array")
    h, w = img.shape
    bw = _BitWriter()
    ref: List[int] = []
    for y in range(h):
        bw.put(*_EOL)
        row = img[y] != 0
        if two_d:
            if y == 0:
                bw.put(1, 1)
                _encode_1d_row(bw, row)
            else:
                bw.put(0, 1)
                _encode_2d_row(bw, ref, _row_transitions(row), w)
            ref = _row_transitions(row)
        else:
            _encode_1d_row(bw, row)
    return bw.bytes()


def decode_mh(
    data: bytes, width: int, height: int, byte_align: bool = True
) -> np.ndarray:
    """Pure 1D Modified Huffman, no EOLs. ``byte_align=True`` is TIFF
    compression 2 ("CCITT RLE": every row starts on a byte boundary,
    TIFF 6.0 §10); ``False`` is the continuous form PDF CCITTFaxDecode
    emits for K=0 without /EncodedByteAlign."""
    if width <= 0 or height <= 0 or width * height > 1 << 30:
        raise ValueError("CCITT: implausible dimensions")
    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        if byte_align:
            br.align()
        cur = _decode_1d_row(br, width)
        out[y] = _transitions_to_row(cur, width)
    return out


def encode_mh(img: np.ndarray, byte_align: bool = True) -> bytes:
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("encode_mh takes a 2-D bilevel array")
    bw = _BitWriter()
    for y in range(img.shape[0]):
        if byte_align:
            bw.align()
        _encode_1d_row(bw, img[y] != 0)
    return bw.bytes()
