"""Ogg Vorbis I decoder + minimal spec-faithful encoder.

The second-most-common web-crawl audio container after MP3. Unlike
MPEG-1 Layer III — whose 34 normative Huffman tables and synthesis
window are unverifiable TABLE DATA in this sandbox (see the documented
ceiling in ``audio.decode_audio``) — Vorbis is decodable from first
principles: every Huffman codebook travels INSIDE the stream's setup
header (codeword assignment is the spec's canonical
lowest-unused-codeword rule over transmitted lengths), and the window
(``sin(π/2·sin²(π(i+½)/n))``) and MDCT are closed formulas. Same
class of work as the FLAC decoder (`operators/flac.py`).

Implemented from the public Vorbis I specification (Xiph.Org,
"Vorbis I specification"; Ogg framing per RFC 3533):

- Ogg page parse with CRC-32 (poly 0x04c11db7, unreflected) verified
  per page; packet reassembly across lacing segments and page spans.
- Setup: codebooks (ordered/unordered, sparse, VQ lookup types 0/1/2
  with ``float32_unpack`` and ``lookup1_values``), floor type 1
  (partition classes, X-list, neighbor/render-point amplitude
  synthesis), residue types 0/1/2 (cascade passes, classword
  decode), mappings (channel coupling via square polar), modes.
- Synthesis: floor curve in the inverse-dB domain (geometric curve
  pinned to the spec endpoints 1.0649863e-07 → 1.0; Vorbis is lossy,
  claims are tolerance-based), dot product, IMDCT
  ``y[j] = Σ X[k]·cos(π/(2n)(2j+1+n/2)(2k+1))`` (cached cosine
  matrix), windowing incl. long/short lap geometry, overlap-add.

The encoder writes genuinely conformant streams (tiny custom
codebooks, floor1, residue 1/2, optional coupling) so oracle rows and
tests can synthesize deterministic payloads; because every table the
decoder uses is parsed back OUT of those streams, a header misparse
desyncs loudly instead of mirroring an encoder bug (the shorten
lesson, ADVICE r14 #2).

Crafted-input contract: malformed structure raises ValueError (never
MemoryError/RecursionError) — header caps mirror shorten.py's.

No reference counterpart (the reference gates all audio decode on
external codecs; this is part of the multimodal ingest surface the
LLM-pipeline side needs).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_CRC_TABLE = None


def _ogg_crc(data: bytes) -> int:
    """Ogg CRC-32: poly 0x04c11db7, init 0, no reflection, no final
    xor (RFC 3533 / libogg os_checksum)."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
                r &= 0xFFFFFFFF
            tbl.append(r)
        _CRC_TABLE = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def ogg_pages(data: bytes):
    """Yield (header_type, granule, serial, seq, [segment bytes])
    per CRC-verified page."""
    pos = 0
    while pos < len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: lost page sync")
        if len(data) < pos + 27:
            raise ValueError("ogg: truncated page header")
        (ver, htype, granule, serial, seq, crc, nsegs) = struct.unpack(
            "<BBqIIIB", data[pos + 4 : pos + 27]
        )
        if ver != 0:
            raise ValueError(f"ogg: stream structure version {ver}")
        lacing = data[pos + 27 : pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(lacing)
        end = pos + 27 + nsegs + body_len
        if end > len(data):
            raise ValueError("ogg: truncated page body")
        page = bytearray(data[pos:end])
        page[22:26] = b"\0\0\0\0"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("ogg: page CRC mismatch")
        segs, off = [], pos + 27 + nsegs
        for ln in lacing:
            segs.append((data[off : off + ln], ln))
            off += ln
        yield htype, granule, serial, seq, segs
        pos = end


def ogg_first_packet_magic(data: bytes) -> bytes:
    """First 16 bytes of the first page's first segment — enough to
    identify every registered Ogg codec id header (``\\x01vorbis``,
    ``OpusHead``, ``\\x7fFLAC``, ``Speex   ``, ``\\x80theora``).
    Shares ``ogg_pages``'s validation, so malformed bytes after the
    ``OggS`` magic raise ValueError exactly like the full decode."""
    for _htype, _gran, _serial, _seq, segs in ogg_pages(data):
        for seg, _ln in segs:
            return bytes(seg[:16])
        return b""
    return b""


def ogg_packets(data: bytes) -> List[bytes]:
    """Reassemble the logical packets of the FIRST logical stream."""
    return _ogg_demux(data)[0]


def _ogg_demux(data: bytes) -> Tuple[List[bytes], Optional[int]]:
    """Packets of the first logical stream + the TERMINAL granule
    position (last page of that stream that completes a packet and
    carries a granule != -1) — the value the Vorbis I spec (App. A)
    says truncates the decoder's lap padding to the true length."""
    out: List[bytes] = []
    cur = bytearray()
    serial0: Optional[int] = None
    open_packet = False
    final_granule: Optional[int] = None
    for htype, gran, serial, _seq, segs in ogg_pages(data):
        if serial0 is None:
            serial0 = serial
        if serial != serial0:
            continue
        if not (htype & 0x01):  # not a continuation page
            if open_packet:
                raise ValueError("ogg: packet spans into a non-continuation page")
        completed = False
        for seg, ln in segs:
            cur += seg
            open_packet = True
            if ln < 255:  # packet ends here
                out.append(bytes(cur))
                cur = bytearray()
                open_packet = False
                completed = True
        if completed and gran >= 0:  # -1 = no packet completes here
            final_granule = gran
    if open_packet:
        raise ValueError("ogg: final packet unterminated")
    return out, final_granule


class EndOfPacket(ValueError):
    """Bit reads ran past the packet end. During HEADER decode this is
    a hard error (it subclasses ValueError so truncation contracts
    hold); during AUDIO packet decode the spec makes it a NOMINAL
    occurrence (§1.3.2: floor → channel unused, residue → remaining
    values zero) and the decode loop catches it."""


class _BitReader:
    """Vorbis bit packing: LSB-first within each byte."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.pos + i
            byte = p >> 3
            if byte >= len(self.data):
                raise EndOfPacket("vorbis: packet exhausted")
            v |= ((self.data[byte] >> (p & 7)) & 1) << i
        self.pos += n
        return v

    def remaining(self) -> int:
        return len(self.data) * 8 - self.pos


class _BitWriter:
    def __init__(self):
        self.bits: List[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def bytes_(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def ilog(x: int) -> int:
    """Spec ilog: position of the highest set bit (ilog(0)=0)."""
    return max(x, 0).bit_length()


def float32_unpack(x: int) -> float:
    """Vorbis packed float: 21-bit mantissa, sign, 10-bit exponent."""
    mant = x & 0x1FFFFF
    if x & 0x80000000:
        mant = -mant
    exp = (x >> 21) & 0x3FF
    return float(mant) * (2.0 ** (exp - 788))


def float32_pack(v: float) -> int:
    """Inverse of float32_unpack for encoder use (exact for the small
    integers fixtures quantize with)."""
    sign = 0
    if v < 0:
        sign, v = 0x80000000, -v
    if v == 0:
        return 0
    exp = 788
    m = v
    while m != int(m) and exp > 0:
        m *= 2.0
        exp -= 1
    m = int(m)
    while m > 0x1FFFFF:
        if m & 1:
            raise ValueError("float32_pack: value needs >21 mantissa bits")
        m >>= 1
        exp += 1
    return sign | (exp << 21) | m


def lookup1_values(entries: int, dims: int) -> int:
    """Greatest integer v with v**dims <= entries."""
    v = 1
    while (v + 1) ** dims <= entries:
        v += 1
    return v


def assign_codewords(lengths: Sequence[int]) -> Dict[int, Tuple[int, int]]:
    """Canonical Vorbis codeword assignment: each used entry (in
    order) receives the LOWEST-valued unused codeword of its length,
    codewords ordered as binary fractions (first-read bit = MSB).
    Implemented directly as the tree-splitting rule — an available
    node at depth d extends with zeros to the target length, releasing
    each sibling along the path. Returns {entry: (code, len)}."""
    avail: List[Tuple[int, int]] = [(0, 0)]  # (code, depth), root free
    out: Dict[int, Tuple[int, int]] = {}
    for i, l in enumerate(lengths):
        if l <= 0:
            continue
        if not 1 <= l <= 32:
            raise ValueError(f"vorbis: codeword length {l}")
        # lowest codeword of length l reachable from any free node of
        # depth <= l: minimize code as a binary fraction
        best = None
        for idx, (c, d) in enumerate(avail):
            if d > l:
                continue
            val = c << (l - d)  # extend with zeros
            if best is None or val < best[0]:
                best = (val, idx, c, d)
        if best is None:
            raise ValueError("vorbis: over-specified codebook (no free node)")
        val, idx, c, d = best
        avail.pop(idx)
        # descend, freeing the 1-sibling at each level
        code = c
        for depth in range(d, l):
            code <<= 1
            avail.append((code | 1, depth + 1))
        out[i] = (code, l)
    # (a codebook with a single used entry is special-cased by the
    # spec as codeword 0; this construction already yields (0, l) for
    # it — the decoder reads `lengths[e]` bits of zeros)
    return out


class Codebook:
    def __init__(self, dims, entries, lengths, lookup_type, min_v=0.0,
                 delta_v=0.0, seq_p=0, mults=None, value_bits=0):
        self.dims, self.entries = dims, entries
        self.lengths = lengths
        self.codes = assign_codewords(lengths)
        self.decode_map = {cl: e for e, cl in self.codes.items()}
        self.lookup_type = lookup_type
        self.min_v, self.delta_v, self.seq_p = min_v, delta_v, seq_p
        self.mults = mults or []
        self.value_bits = value_bits
        self.vectors: Optional[List[List[float]]] = None
        if lookup_type == 1:
            lv = lookup1_values(entries, dims)
            vecs = []
            for e in range(entries):
                last, idx_div, vec = 0.0, 1, []
                for _d in range(dims):
                    off = (e // idx_div) % lv
                    v = self.mults[off] * delta_v + min_v + last
                    vec.append(v)
                    if seq_p:
                        last = v
                    idx_div *= lv
                vecs.append(vec)
            self.vectors = vecs
        elif lookup_type == 2:
            vecs = []
            for e in range(entries):
                last, vec = 0.0, []
                for d in range(dims):
                    v = self.mults[e * dims + d] * delta_v + min_v + last
                    vec.append(v)
                    if seq_p:
                        last = v
                vecs.append(vec)
            self.vectors = vecs

    def decode_scalar(self, br: _BitReader) -> int:
        code, ln = 0, 0
        for _ in range(33):
            code = (code << 1) | br.read(1)
            ln += 1
            e = self.decode_map.get((code, ln))
            if e is not None:
                return e
        raise ValueError("vorbis: codeword longer than 32 bits")

    def decode_vector(self, br: _BitReader) -> List[float]:
        if self.vectors is None:
            raise ValueError("vorbis: scalar codebook used in VQ context")
        return self.vectors[self.decode_scalar(br)]


def _read_codebook(br: _BitReader) -> Codebook:
    if br.read(24) != 0x564342:
        raise ValueError("vorbis: codebook sync lost")
    dims = br.read(16)
    entries = br.read(24)
    if dims == 0 or entries == 0 or dims * entries > 1 << 22:
        raise ValueError("vorbis: implausible codebook dims/entries")
    ordered = br.read(1)
    lengths = []
    if not ordered:
        sparse = br.read(1)
        for _ in range(entries):
            if sparse:
                lengths.append(br.read(5) + 1 if br.read(1) else 0)
            else:
                lengths.append(br.read(5) + 1)
    else:
        cur_len = br.read(5) + 1
        cur = 0
        while cur < entries:
            num = br.read(ilog(entries - cur))
            if cur + num > entries:
                raise ValueError("vorbis: ordered codebook overrun")
            lengths += [cur_len] * num
            cur += num
            cur_len += 1
    lookup = br.read(4)
    if lookup == 0:
        return Codebook(dims, entries, lengths, 0)
    if lookup not in (1, 2):
        raise ValueError(f"vorbis: codebook lookup type {lookup}")
    min_v = float32_unpack(br.read(32))
    delta_v = float32_unpack(br.read(32))
    value_bits = br.read(4) + 1
    seq_p = br.read(1)
    n_vals = lookup1_values(entries, dims) if lookup == 1 else entries * dims
    mults = [br.read(value_bits) for _ in range(n_vals)]
    return Codebook(dims, entries, lengths, lookup, min_v, delta_v, seq_p, mults, value_bits)


class Floor1:
    def __init__(self, br: _BitReader, n_books: int):
        parts = br.read(5)
        self.partition_classes = [br.read(4) for _ in range(parts)]
        maxc = max(self.partition_classes) if parts else -1
        self.class_dims, self.class_subs, self.class_master, self.sub_books = [], [], [], []
        for _ in range(maxc + 1):
            self.class_dims.append(br.read(3) + 1)
            subs = br.read(2)
            self.class_subs.append(subs)
            self.class_master.append(br.read(8) if subs else -1)
            books = []
            for _ in range(1 << subs):
                books.append(br.read(8) - 1)  # -1 = unused
            self.sub_books.append(books)
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        xs = [0, 1 << rangebits]
        for pc in self.partition_classes:
            for _ in range(self.class_dims[pc]):
                xs.append(br.read(rangebits))
        if len(set(xs)) != len(xs):
            raise ValueError("vorbis: floor1 X list not unique")
        self.x_list = xs
        for b in self.class_master + [bb for bs in self.sub_books for bb in bs]:
            if b >= n_books:
                raise ValueError("vorbis: floor1 references missing codebook")


class Residue:
    def __init__(self, rtype: int, br: _BitReader, n_books: int):
        self.rtype = rtype
        self.begin = br.read(24)
        self.end = br.read(24)
        self.part_size = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        cascades = []
        for _ in range(self.classifications):
            high, low = 0, br.read(3)
            if br.read(1):
                high = br.read(5)
            cascades.append((high << 3) | low)
        self.cascades = cascades
        self.books: List[List[int]] = []
        for c in range(self.classifications):
            row = []
            for pas in range(8):
                row.append(br.read(8) if (cascades[c] >> pas) & 1 else -1)
            self.books.append(row)
        if self.classbook >= n_books:
            raise ValueError("vorbis: residue classbook missing")
        # every referenced pass book must exist (r16 review: an 8-bit
        # book number past the codebook count crashed decode with
        # IndexError instead of the contract's ValueError)
        for row in self.books:
            for b in row:
                if b >= n_books:
                    raise ValueError("vorbis: residue pass book missing")


class Mapping:
    def __init__(self, br: _BitReader, channels: int, n_floors: int, n_residues: int):
        self.submaps = br.read(4) + 1 if br.read(1) else 1
        self.coupling: List[Tuple[int, int]] = []
        if br.read(1):
            steps = br.read(8) + 1
            bits = ilog(channels - 1)
            for _ in range(steps):
                m, a = br.read(bits), br.read(bits)
                if m == a or m >= channels or a >= channels:
                    raise ValueError("vorbis: bad coupling step")
                self.coupling.append((m, a))
        if br.read(2) != 0:
            raise ValueError("vorbis: reserved mapping bits set")
        self.mux = [br.read(4) for _ in range(channels)] if self.submaps > 1 else [0] * channels
        if any(m >= self.submaps for m in self.mux):
            raise ValueError("vorbis: channel mux references missing submap")
        self.submap_floor, self.submap_residue = [], []
        for _ in range(self.submaps):
            br.read(8)  # unused time config
            f = br.read(8)
            r = br.read(8)
            if f >= n_floors or r >= n_residues:
                raise ValueError("vorbis: mapping references missing floor/residue")
            self.submap_floor.append(f)
            self.submap_residue.append(r)


class VorbisSetup:
    def __init__(self, channels: int, rate: int, bs0: int, bs1: int):
        self.channels, self.rate = channels, rate
        self.blocksizes = (bs0, bs1)
        self.codebooks: List[Codebook] = []
        self.floors: List[Floor1] = []
        self.residues: List[Residue] = []
        self.mappings: List[Mapping] = []
        self.modes: List[Tuple[int, int]] = []  # (blockflag, mapping)


# --- floor 1 amplitude rendering (spec §7.2.3-7.2.4) -------------------------

#: geometric inverse-dB curve pinned to the spec endpoints
#: (1.0649863e-07 at 0, 1.0 at 255). Vorbis is lossy and every claim
#: downstream is tolerance-based, so the per-entry rounding of the
#: spec's printed table (<0.1% relative) is immaterial here.
_INV_DB = np.exp(np.log(1.0649863e-07) * (255 - np.arange(256)) / 255.0)


def _neighbors(xs: List[int], x: int) -> Tuple[int, int]:
    lo, hi = None, None
    for i in range(x):
        if xs[i] < xs[x] and (lo is None or xs[i] > xs[lo]):
            lo = i
        if xs[i] > xs[x] and (hi is None or xs[i] < xs[hi]):
            hi = i
    if lo is None or hi is None:
        raise ValueError("vorbis: floor1 X list lacks neighbors")
    return lo, hi


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy, adx = y1 - y0, x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int, out: np.ndarray, n: int) -> None:
    dy, adx = y1 - y0, x1 - x0
    # spec/libvorbis integer division TRUNCATES TOWARD ZERO; Python //
    # floors toward -inf, which mis-rendered every negative-slope
    # segment where adx does not divide dy (base one too low, ady
    # negative so the Bresenham error term never fired) — r16 review.
    # Spec check: (0,10)->(8,7) must render 10,10,10,9,9,9,8,8.
    if adx:
        base = abs(dy) // adx
        if dy < 0:
            base = -base
    else:
        base = 0
    sy = base - 1 if dy < 0 else base + 1
    x, y, err = x0, y0, 0
    ady = abs(dy) - abs(base) * adx
    if 0 <= x0 < n:
        out[x0] = _INV_DB[min(max(y0, 0), 255)]
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out[x] = _INV_DB[min(max(y, 0), 255)]


def _decode_floor1(fl: Floor1, br: _BitReader, books: List[Codebook], n2: int) -> Optional[np.ndarray]:
    if not br.read(1):
        return None  # unaudible channel this frame
    rng = [256, 128, 86, 64][fl.multiplier - 1]
    ys = [br.read(ilog(rng - 1)), br.read(ilog(rng - 1))]
    for pc in fl.partition_classes:
        cdim, cbits = fl.class_dims[pc], fl.class_subs[pc]
        csub = (1 << cbits) - 1
        cval = 0
        if cbits:
            cval = books[fl.class_master[pc]].decode_scalar(br)
        for _ in range(cdim):
            book = fl.sub_books[pc][cval & csub]
            cval >>= cbits
            ys.append(books[book].decode_scalar(br) if book >= 0 else 0)
    # amplitude value synthesis (spec §7.2.4 step 1)
    xs = fl.x_list
    n_vals = len(xs)
    final_y = [0] * n_vals
    step2 = [False] * n_vals
    final_y[0], final_y[1] = ys[0], ys[1]
    step2[0] = step2[1] = True
    for i in range(2, n_vals):
        lo, hi = _neighbors(xs, i)
        pred = _render_point(xs[lo], final_y[lo], xs[hi], final_y[hi], xs[i])
        val = ys[i]
        high_room = rng - pred
        low_room = pred
        room = min(high_room, low_room) * 2
        if val:
            step2[lo] = step2[hi] = step2[i] = True
            if val >= room:
                final_y[i] = (val - low_room + pred) if high_room > low_room else (
                    pred - (val - high_room) - 1
                )
            elif val & 1:
                final_y[i] = pred - ((val + 1) // 2)
            else:
                final_y[i] = pred + val // 2
        else:
            step2[i] = False
            final_y[i] = pred
    # curve synthesis (step 2): piecewise lines over sorted X between
    # step2-flagged points, in the multiplied dB domain
    order = sorted(range(n_vals), key=lambda i: xs[i])
    out = np.zeros(n2, dtype=np.float64)
    lx, ly = 0, final_y[order[0]] * fl.multiplier
    hx, hy = lx, ly
    for i in order[1:]:
        if step2[i]:
            hx, hy = xs[i], final_y[i] * fl.multiplier
            if lx < n2:
                _render_line(lx, ly, hx, hy, out, n2)
            lx, ly = hx, hy
    if hx < n2:  # horizontal fill to the block edge
        out[max(hx, 0) : n2] = _INV_DB[min(max(hy, 0), 255)]
    return out


# --- residue decode (spec §8.6) ----------------------------------------------

def _decode_residue(res: Residue, br: _BitReader, books: List[Codebook],
                    do_not_decode: List[bool], n2: int) -> np.ndarray:
    ch = len(do_not_decode)
    if res.rtype == 2:
        vec = _decode_residue_core(res, br, books, [all(do_not_decode)], n2 * ch)
        out = np.zeros((ch, n2))
        for j in range(ch):
            out[j] = vec[0][j::ch]
        return out
    return _decode_residue_core(res, br, books, do_not_decode, n2)


def _decode_residue_core(res: Residue, br: _BitReader, books: List[Codebook],
                         do_not_decode: List[bool], n: int) -> np.ndarray:
    ch = len(do_not_decode)
    out = np.zeros((ch, n), dtype=np.float64)
    begin, end = min(res.begin, n), min(res.end, n)
    if end <= begin:
        return out
    psize = res.part_size
    parts = (end - begin) // psize
    classbook = books[res.classbook]
    cw = classbook.dims
    classifs = [[0] * (parts + cw) for _ in range(ch)]
    try:
        _residue_passes(res, br, books, do_not_decode, out, classifs,
                        classbook, cw, begin, parts, psize, n)
    except EndOfPacket:
        # spec §1.3.2 / §8.6.2: EOP mid-residue is nominal — the values
        # decoded so far stand, the rest stay zero
        pass
    return out


def _residue_passes(res: Residue, br: _BitReader, books: List[Codebook],
                    do_not_decode: List[bool], out: np.ndarray,
                    classifs: List[List[int]], classbook: Codebook, cw: int,
                    begin: int, parts: int, psize: int, n: int) -> None:
    ch = len(do_not_decode)
    for pas in range(8):
        # pass 0 ALWAYS decodes the classwords (spec §8.6.2) — even
        # when every cascade's pass-0 bit is clear and no values
        # decode this pass; skipping it would desync streams whose
        # books live only in later passes
        if pas > 0 and not any((c >> pas) & 1 for c in res.cascades):
            continue
        p = 0
        while p < parts:
            if pas == 0:
                for j in range(ch):
                    if do_not_decode[j]:
                        continue
                    temp = classbook.decode_scalar(br)
                    for i in range(cw - 1, -1, -1):
                        classifs[j][p + i] = temp % res.classifications
                        temp //= res.classifications
            for i in range(cw):
                if p >= parts:
                    break
                for j in range(ch):
                    if do_not_decode[j]:
                        continue
                    c = classifs[j][p]
                    book = res.books[c][pas]
                    if book < 0:
                        continue
                    cb = books[book]
                    off = begin + p * psize
                    if res.rtype == 0:
                        step = psize // cb.dims
                        for k in range(step):
                            v = cb.decode_vector(br)
                            for d in range(cb.dims):
                                out[j][off + k + d * step] += v[d]
                    else:  # types 1 and (flattened) 2
                        k = 0
                        while k < psize:
                            v = cb.decode_vector(br)
                            for d in range(cb.dims):
                                # clamp at n (libvorbis behavior): a
                                # stream whose value-book dims do not
                                # divide part_size, or whose residue
                                # end is not dims-aligned, must not
                                # overrun the row (crafted-input
                                # contract: structure errors are
                                # ValueError, never IndexError)
                                if off + k + d >= n:
                                    break
                                out[j][off + k + d] += v[d]
                            k += cb.dims
                p += 1


# --- synthesis ----------------------------------------------------------------

_IMDCT_CACHE: Dict[int, np.ndarray] = {}


def _imdct_matrix(n: int) -> np.ndarray:
    """Dense IMDCT cosine matrix (n × n/2). Used by the encoders'
    exact forward MDCT (M.T, scale 4/n) and as the FFT path's unit-test
    ground truth. Cached only for modest sizes so a max-blocksize
    stream can't pin a ~268 MB matrix for the process lifetime."""
    M = _IMDCT_CACHE.get(n)
    if M is None:
        j = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        M = np.cos(np.pi / (2 * n) * (2 * j + 1 + n // 2) * (2 * k + 1))
        if n <= 2048:
            _IMDCT_CACHE[n] = M
    return M


def _imdct_ref(spec: np.ndarray) -> np.ndarray:
    """Direct O(n²) IMDCT — ground truth for the FFT path's tests."""
    return _imdct_matrix(len(spec) * 2) @ spec


def _imdct(spec: np.ndarray) -> np.ndarray:
    """Vorbis IMDCT: y[j] = Σ_k X[k]·cos(π/(2n)·(2j+1+n/2)·(2k+1)),
    n = 2·len(spec), via one real FFT — O(n log n), no cached matrix
    (r16: the dense matrix was O(n²) per block and pinned ~268 MB for
    a bs=8192 stream).

    Derivation: with m = j + n/4 the kernel is cos(2π/n·(m+½)(k+½)),
    the DCT-IV_{n2} kernel; its index extensions fold back with sign
    flips, so y is three shuffled/negated slices of c = DCT-IV(X).
    DCT-IV via FFT: c[m] = Re(rfft(g)[2m+1]) where g is X spread onto
    the odd indices of a zero array of length 8·n2 (verified ≤1e-10
    against the direct matrix for every block size in tests)."""
    n2 = len(spec)
    n = n2 * 2
    q = n // 4
    g = np.zeros(8 * n2)
    g[1 : 2 * n2 : 2] = spec
    c = np.fft.rfft(g)[1 : 2 * n2 : 2].real
    y = np.empty(n)
    # j in [0, n/4): m = j + n/4 < n/2  -> direct
    y[:q] = c[q : 2 * q]
    # j in [n/4, 3n/4): m = n/2 + p     -> -c[n/2 - 1 - p]
    y[q : 3 * q] = -c[::-1]
    # j in [3n/4, n): m = n + q'        -> -c[q']
    y[3 * q :] = -c[:q]
    return y


def _vorbis_window(n: int) -> np.ndarray:
    i = np.arange(n)
    return np.sin(0.5 * np.pi * np.sin(np.pi / n * (i + 0.5)) ** 2)


def decode_ogg_vorbis(data: bytes) -> Tuple[np.ndarray, int]:
    """Ogg Vorbis stream → (float64 samples (n_frames, n_channels) in
    [-1, 1], rate)."""
    packets, final_granule = _ogg_demux(data)
    if len(packets) < 4:
        raise ValueError("vorbis: need ident/comment/setup + audio packets")
    setup = _parse_headers(packets[0], packets[1], packets[2])
    ch = setup.channels
    bs = setup.blocksizes
    # incremental overlap-add state: acc[:, i] holds absolute sample
    # position origin + i; blocks are NOT retained (peak memory is the
    # real output extent + one block, not 2x)
    acc: Optional[np.ndarray] = None
    origin = 0
    length = 0
    start = 0
    prev_n: Optional[int] = None
    n_blocks = 0
    first_center: Optional[int] = None
    total_samples = 0
    for pkt in packets[3:]:
        if not pkt:
            continue  # zero-length packets are legal Ogg; skipped (libvorbis)
        br = _BitReader(pkt)
        try:
            if br.read(1) != 0:
                raise ValueError("vorbis: audio packet with header packtype")
            mode_i = br.read(ilog(len(setup.modes) - 1)) if len(setup.modes) > 1 else 0
        except EndOfPacket:
            continue  # EOP before the mode resolves: packet discarded (spec §4.3.1)
        if mode_i >= len(setup.modes):
            raise ValueError("vorbis: packet mode out of range")
        blockflag, map_i = setup.modes[mode_i]
        n = bs[blockflag]
        # crafted-stream amplification cap: a few-byte audio packet
        # expands to blocksize×channels floats; bound the expansion so
        # a malicious stream raises ValueError instead of exhausting
        # memory (same contract as the shorten header caps). Charges
        # the ACTUAL block size from the mode bits (ADVICE r15 —
        # charging blocksizes[1] rejected legitimate mostly-short
        # streams at a fraction of the cap)
        total_samples += n * ch
        if total_samples > 200_000_000:
            raise ValueError("vorbis: stream exceeds the decode size cap")
        long_prev = long_next = 1
        try:
            if blockflag:
                long_prev = br.read(1)
                long_next = br.read(1)
        except EndOfPacket:
            continue  # EOP before the window info resolves: discarded
        mapping = setup.mappings[map_i]
        n2 = n // 2
        floors: List[Optional[np.ndarray]] = []
        no_residue = []
        residues = np.zeros((ch, n2))
        try:
            for c in range(ch):
                sub = mapping.mux[c]
                fl = setup.floors[mapping.submap_floor[sub]]
                f = _decode_floor1(fl, br, setup.codebooks, n2)
                floors.append(f)
                no_residue.append(f is None)
            # coupling: a coupled pair decodes if EITHER side is audible
            for (m, a) in mapping.coupling:
                if not (no_residue[m] and no_residue[a]):
                    no_residue[m] = no_residue[a] = False
            for sub in range(mapping.submaps):
                idx = [c for c in range(ch) if mapping.mux[c] == sub]
                dnd = [no_residue[c] for c in idx]
                res = setup.residues[mapping.submap_residue[sub]]
                dec = _decode_residue(res, br, setup.codebooks, dnd, n2)
                for k, c in enumerate(idx):
                    residues[c] = dec[k]
        except EndOfPacket:
            # spec §1.3.2: EOP during floor/residue decode is NOMINAL —
            # synthesis proceeds with the partial data (undecoded
            # floors = unused channels, undecoded residue = zeros)
            while len(floors) < ch:
                floors.append(None)
        # inverse coupling (square polar, spec §4.3.5), last step first
        for (mi, ai) in reversed(mapping.coupling):
            M, A = residues[mi], residues[ai]
            newM, newA = M.copy(), M.copy()
            pos = M > 0
            apos = A > 0
            newA[pos & apos] = M[pos & apos] - A[pos & apos]
            newM[pos & ~apos] = M[pos & ~apos] + A[pos & ~apos]
            newA[~pos & apos] = M[~pos & apos] + A[~pos & apos]
            newM[~pos & ~apos] = M[~pos & ~apos] - A[~pos & ~apos]
            residues[mi], residues[ai] = newM, newA
        # dot product + IMDCT + window
        win = _window_for(n, bs[0], blockflag, long_prev, long_next)
        pcm = np.zeros((ch, n))
        for c in range(ch):
            if floors[c] is None:
                continue
            pcm[c] = _imdct(residues[c] * floors[c]) * win
        # absolute placement: consecutive block centers advance by
        # n_prev/4 + n_cur/4, so start_{i+1} = start_i + 3n_prev/4 − n_cur/4
        if prev_n is not None:
            start = start + 3 * prev_n // 4 - n // 4
        prev_n = n
        n_blocks += 1
        if first_center is None:
            first_center = n // 2  # absolute (first block starts at 0)
        # fold the block in immediately; a short→long transition can
        # extend BEFORE the current origin (start goes negative), so
        # the buffer grows at the front too — geometric growth at the
        # back keeps the total copy cost linear
        if acc is None:
            acc = pcm.copy()
            origin, length = start, n
        else:
            if start < origin:
                acc = np.concatenate(
                    [np.zeros((ch, origin - start)), acc[:, :length]], axis=1
                )
                length += origin - start
                origin = start
            rel_end = start - origin + n
            if rel_end > acc.shape[1]:
                grow = max(rel_end, 2 * acc.shape[1])
                acc = np.concatenate(
                    [acc, np.zeros((ch, grow - acc.shape[1]))], axis=1
                )
            length = max(length, rel_end)
            acc[:, start - origin : start - origin + n] += pcm
    if n_blocks < 2 or acc is None:
        return np.zeros((0, ch)), setup.rate
    # valid data spans center of the first block to center of the last
    # (absolute coordinates — correct even when the timeline extends
    # before the first block's start)
    last_center = start + prev_n // 2
    out = acc[:, first_center - origin : last_center - origin].T
    # Vorbis I App. A: the terminal granule states the stream's TRUE
    # sample count — encoders pad to block boundaries, and the decoder
    # truncates the lap padding here (r16: previously the padding was
    # returned, disagreeing with every reference decoder and the probe)
    # (a ZERO terminal granule on a stream with audio packets is a
    # lazy muxer, not a zero-length claim — ignored, like granule -1)
    if final_granule is not None and 0 < final_granule < out.shape[0]:
        out = out[:final_granule]
    return np.clip(out, -1.0, 1.0), setup.rate


def _window_for(n: int, n_short: int, blockflag: int, long_prev: int, long_next: int) -> np.ndarray:
    """Block window with lap slopes shaped by the neighbor flags
    (spec §4.3.1): a long block lapped against a short neighbor
    compresses that slope to the short width, centered on the
    quarter-points, with zeros outside and ones between."""
    full = _vorbis_window(n)
    if not blockflag or (long_prev and long_next):
        return full
    w = np.ones(n)
    s = _vorbis_window(n_short)
    if long_prev:
        w[: n // 2] = full[: n // 2]
    else:
        ls = n // 4 - n_short // 4
        w[:ls] = 0.0
        w[ls : ls + n_short // 2] = s[: n_short // 2]
    if long_next:
        w[n // 2 :] = full[n // 2 :]
    else:
        rs = 3 * n // 4 - n_short // 4
        w[rs : rs + n_short // 2] = s[n_short // 2 :]
        w[rs + n_short // 2 :] = 0.0
    return w


def _parse_headers(ident: bytes, comment: bytes, setup_pkt: bytes) -> VorbisSetup:
    if ident[:7] != b"\x01vorbis":
        raise ValueError("vorbis: bad identification header")
    if comment[:7] != b"\x03vorbis":
        raise ValueError("vorbis: bad comment header")
    if setup_pkt[:7] != b"\x05vorbis":
        raise ValueError("vorbis: bad setup header")
    br = _BitReader(ident[7:])
    if br.read(32) != 0:
        raise ValueError("vorbis: stream version != 0")
    channels = br.read(8)
    rate = br.read(32)
    if not 1 <= channels <= 32 or not 1 <= rate <= 768000:
        raise ValueError("vorbis: implausible channels/rate")
    br.read(32), br.read(32), br.read(32)  # bitrate max/nominal/min
    bs0 = 1 << br.read(4)
    bs1 = 1 << br.read(4)
    if not (64 <= bs0 <= 8192 and bs0 <= bs1 <= 8192):
        raise ValueError("vorbis: bad blocksizes")
    if br.read(1) != 1:
        raise ValueError("vorbis: ident framing bit unset")
    st = VorbisSetup(channels, rate, bs0, bs1)
    br = _BitReader(setup_pkt[7:])
    n_books = br.read(8) + 1
    for _ in range(n_books):
        st.codebooks.append(_read_codebook(br))
    for _ in range(br.read(6) + 1):  # time transforms (placeholders)
        if br.read(16) != 0:
            raise ValueError("vorbis: nonzero time transform")
    for _ in range(br.read(6) + 1):
        ftype = br.read(16)
        if ftype == 0:
            # floor 0 (LSP) is a real, recognized-but-unimplemented
            # spec feature; types >= 2 are reserved = malformed stream
            raise NotImplementedError("vorbis: floor type 0 (LSP) not implemented")
        if ftype != 1:
            raise ValueError(f"vorbis: reserved floor type {ftype}")
        st.floors.append(Floor1(br, len(st.codebooks)))
    for _ in range(br.read(6) + 1):
        rtype = br.read(16)
        if rtype not in (0, 1, 2):
            raise ValueError(f"vorbis: residue type {rtype}")
        st.residues.append(Residue(rtype, br, len(st.codebooks)))
    for _ in range(br.read(6) + 1):
        mtype = br.read(16)
        if mtype != 0:
            raise ValueError(f"vorbis: mapping type {mtype}")
        st.mappings.append(Mapping(br, channels, len(st.floors), len(st.residues)))
    for _ in range(br.read(6) + 1):
        blockflag = br.read(1)
        if br.read(16) != 0 or br.read(16) != 0:
            raise ValueError("vorbis: nonzero mode window/transform type")
        mapping = br.read(8)
        if mapping >= len(st.mappings):
            raise ValueError("vorbis: mode references missing mapping")
        st.modes.append((blockflag, mapping))
    if br.read(1) != 1:
        raise ValueError("vorbis: setup framing bit unset")
    return st


# --- minimal spec-faithful encoder (fixture/oracle payloads) -------------------

def _wcode(bw: _BitWriter, code: int, ln: int) -> None:
    """Emit a Huffman codeword: the decoder folds stream bits MSB-first
    (code = code<<1 | bit), so the encoder writes MSB..LSB."""
    for i in range(ln - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _lacing(n: int) -> bytes:
    segs = [255] * (n // 255) + [n % 255]
    return bytes(segs)


def _ogg_wrap(packets: Sequence[bytes], serial: int = 0x5047,
              granules: Optional[Sequence[int]] = None) -> bytes:
    """One packet per page; BOS on the first, EOS on the last.
    ``granules[i]`` is page i's spec granule position (RFC 3533 /
    Vorbis I A.2: cumulative complete PCM samples decodable through
    that page's last packet; header pages 0) so real Ogg tools read
    correct duration/seek points from the fixtures. Defaults to 0
    everywhere — correct for header-only streams."""
    out = bytearray()
    for i, pkt in enumerate(packets):
        htype = (0x02 if i == 0 else 0) | (0x04 if i == len(packets) - 1 else 0)
        granule = int(granules[i]) if granules is not None else 0
        lac = _lacing(len(pkt))
        head = b"OggS" + struct.pack("<BBqIIIB", 0, htype, granule, serial, i, 0, len(lac))
        page = bytearray(head + lac + pkt)
        crc = _ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        out += page
    return bytes(out)


def _write_codebook(bw: _BitWriter, dims: int, entries: int, lengths: Sequence[int],
                    lookup: int, min_v: float = 0.0, delta_v: float = 0.0,
                    value_bits: int = 0, mults: Sequence[int] = ()) -> None:
    bw.write(0x564342, 24)
    bw.write(dims, 16)
    bw.write(entries, 24)
    bw.write(0, 1)  # not ordered
    bw.write(0, 1)  # not sparse
    for l in lengths:
        bw.write(l - 1, 5)
    bw.write(lookup, 4)
    if lookup:
        bw.write(float32_pack(min_v), 32)
        bw.write(float32_pack(delta_v), 32)
        bw.write(value_bits - 1, 4)
        bw.write(0, 1)  # sequence_p
        for m in mults:
            bw.write(m, value_bits)


def encode_ogg_vorbis(
    samples: np.ndarray,
    rate: int,
    blocksize: int = 256,
    q_bits: int = 6,
    coupling: bool = False,
) -> bytes:
    """Conformant single-mode Ogg Vorbis writer: long blocks only,
    floor1 as a constant gain line, residues quantized to a 2^q_bits
    integer codebook (residue type 1, or type 2 when ``coupling`` —
    magnitude = the mono mix, angle = 0, i.e. the square-polar pair
    that decodes to identical L/R). Analysis is the exact forward MDCT
    (scale 4/n, numerically verified TDAC inverse of the decoder), so
    decode(encode(x)) ≈ x to quantization error — an SNR claim against
    the ORIGINAL signal, not a mirrored round trip."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, n2 = blocksize, blocksize // 2
    ch = x.shape[1]
    if coupling and ch != 2:
        raise ValueError("coupling fixture needs exactly 2 channels")
    if n & (n - 1) or not 64 <= n <= 8192:
        raise ValueError("blocksize must be a power of two in [64, 8192]")
    # pad both ends by n2 (the decoder discards the outer half-blocks)
    pad = (-len(x)) % n2
    xp = np.concatenate([np.zeros((n2, ch)), x, np.zeros((pad + n2, ch))])
    nblocks = len(xp) // n2 - 1
    w = _vorbis_window(n)
    M = _imdct_matrix(n)
    spectra = np.zeros((nblocks, ch, n2))
    for t in range(nblocks):
        blk = xp[t * n2 : t * n2 + n]
        spectra[t] = (4.0 / n) * (M.T @ (w[:, None] * blk)).T
    if coupling:
        # magnitude = mean(L, R) of the (identical-channel) fixture;
        # angle = 0 decodes back to L = R = magnitude
        mono = spectra.mean(axis=1)
        spectra = np.stack([mono, np.zeros_like(mono)], axis=1)
    qmax = (1 << (q_bits - 1)) - 1
    peak = float(np.max(np.abs(spectra))) if spectra.size else 0.0
    req = peak / qmax if qmax else 0.0
    g_idx = int(np.searchsorted(_INV_DB, req)) if req > 0 else 0
    g_idx = min(g_idx, 255)
    gain = float(_INV_DB[g_idx])
    res = np.clip(np.round(spectra / gain), -(qmax + 1), qmax).astype(np.int64)

    rtype = 2 if coupling else 1
    psize = min(n2, 16)
    parts = (n2 * ch) // psize if rtype == 2 else n2 // psize
    entries = 1 << q_bits
    # codebook 0: classbook (one classword covers every partition)
    # codebook 1: scalar residue values -2^(q-1) .. 2^(q-1)-1
    rangebits = n2.bit_length() - 1  # x1 == n2: the line spans the block

    bw = _BitWriter()
    bw.write(2 - 1, 8)  # codebook count - 1
    _write_codebook(bw, dims=parts, entries=1, lengths=[1], lookup=0)
    _write_codebook(
        bw, dims=1, entries=entries, lengths=[q_bits] * entries, lookup=2,
        min_v=float(-(qmax + 1)), delta_v=1.0, value_bits=q_bits,
        mults=list(range(entries)),
    )
    bw.write(0, 6)  # time count - 1
    bw.write(0, 16)
    bw.write(0, 6)  # floor count - 1
    bw.write(1, 16)  # floor type 1
    bw.write(0, 5)  # 0 partitions
    bw.write(0, 2)  # multiplier - 1
    bw.write(rangebits, 4)
    bw.write(0, 6)  # residue count - 1
    bw.write(rtype, 16)
    bw.write(0, 24)  # begin
    bw.write(n2 * ch if rtype == 2 else n2, 24)  # end
    bw.write(psize - 1, 24)
    bw.write(0, 6)  # classifications - 1
    bw.write(0, 8)  # classbook = codebook 0
    bw.write(1, 3)  # cascade low bits: pass 0 only
    bw.write(0, 1)  # no high bits
    bw.write(1, 8)  # pass-0 book = codebook 1
    bw.write(0, 6)  # mapping count - 1
    bw.write(0, 16)  # mapping type 0
    bw.write(0, 1)  # one submap
    if coupling:
        bw.write(1, 1)
        bw.write(0, 8)  # one coupling step
        bits = ilog(ch - 1)
        bw.write(0, bits)  # magnitude = ch 0
        bw.write(1, bits)  # angle = ch 1
    else:
        bw.write(0, 1)
    bw.write(0, 2)  # reserved
    bw.write(0, 8)  # time config (unused)
    bw.write(0, 8)  # submap floor
    bw.write(0, 8)  # submap residue
    bw.write(0, 6)  # mode count - 1
    bw.write(0, 1)  # blockflag 0
    bw.write(0, 16)
    bw.write(0, 16)
    bw.write(0, 8)  # mapping 0
    bw.write(1, 1)  # framing
    setup_pkt = b"\x05vorbis" + bw.bytes_()

    bw = _BitWriter()
    bw.write(0, 32)
    bw.write(ch, 8)
    bw.write(rate, 32)
    bw.write(0, 32), bw.write(0, 32), bw.write(0, 32)
    bw.write(n.bit_length() - 1, 4)
    bw.write(n.bit_length() - 1, 4)
    bw.write(1, 1)
    ident_pkt = b"\x01vorbis" + bw.bytes_()

    vendor = b"iceberg_python_spark vorbis fixture"
    bw = _BitWriter()
    bw.write(len(vendor), 32)
    for b in vendor:
        bw.write(b, 8)
    bw.write(0, 32)  # no user comments
    bw.write(1, 1)
    comment_pkt = b"\x03vorbis" + bw.bytes_()

    value_codes = assign_codewords([q_bits] * entries)
    class_code = assign_codewords([1])[0]
    packets = [ident_pkt, comment_pkt, setup_pkt]
    for t in range(nblocks):
        bw = _BitWriter()
        bw.write(0, 1)  # audio packtype
        # 1 mode -> 0 mode bits; blockflag 0 -> no window flags
        for _c in range(ch):  # floor: constant line y0 = y1 = g_idx
            bw.write(1, 1)
            bw.write(g_idx, 8)
            bw.write(g_idx, 8)
        if rtype == 2:
            vec = res[t].T.reshape(-1)  # interleave channels
            _wcode(bw, *class_code)  # one classword, one "channel"
            for i in range(parts):
                for v in vec[i * psize : (i + 1) * psize]:
                    c, ln = value_codes[int(v) + qmax + 1]
                    _wcode(bw, c, ln)
        else:
            for _c in range(ch):
                _wcode(bw, *class_code)
            for i in range(parts):
                for c_i in range(ch):
                    for v in res[t][c_i][i * psize : (i + 1) * psize]:
                        c, ln = value_codes[int(v) + qmax + 1]
                        _wcode(bw, c, ln)
        packets.append(b"" + bw.bytes_())
    # fixed-size lapped blocks: audio packet j (1-based) completes
    # (j-1)·n/2 samples; the TERMINAL granule states the true input
    # length (spec App. A) so decoders — ours included — truncate the
    # final block's lap padding and probes read the true duration
    granules = [0, 0, 0] + [a * n2 for a in range(nblocks)]
    granules[-1] = max(granules[-2], min(granules[-1], x.shape[0]))
    return _ogg_wrap(packets, granules=granules)


def encode_ogg_vorbis_mixed(
    samples: np.ndarray,
    rate: int,
    long_blocksize: int = 256,
    short_blocksize: int = 64,
    pattern: Sequence[int] = (1, 1, 0, 0, 1),
    q_bits: int = 8,
) -> bytes:
    """Two-mode (long/short block) mono writer exercising the decode
    paths the single-mode encoder cannot: window-flag shaping of long
    blocks lapped against short neighbors, the variable-start
    overlap-add geometry (a short→long transition starts BEFORE the
    previous block's origin), and floor1's partition/class/sub-book
    decode (one partition, two zero-offset points — the curve stays
    the constant gain line but travels the full decode path). The
    analysis MDCT uses the same shaped windows, so TDAC reconstruction
    is exact (verified to 1e-13 in tests) and decode(encode(x)) is an
    SNR claim against the original signal."""
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    N, s = long_blocksize, short_blocksize
    for b in (N, s):
        if b & (b - 1) or not 64 <= b <= 8192:
            raise ValueError("blocksizes must be powers of two in [64, 8192]")
    if s >= N:
        raise ValueError("short blocksize must be smaller than long")
    psize = min(s // 2, 16)
    if (N // 2) % psize or (s // 2) % psize:
        raise ValueError("partition size must divide both half-blocks")
    # build the block-size sequence until it covers the signal
    sizes: List[int] = [N]  # lead with a long block (its left half is lap-discarded)
    starts = [0]
    total_needed = None
    i = 0
    while True:
        n_i = N if pattern[i % len(pattern)] else s
        starts.append(starts[-1] + 3 * sizes[-1] // 4 - n_i // 4)
        sizes.append(n_i)
        i += 1
        first_c = starts[0] + sizes[0] // 2
        last_c = starts[-1] + sizes[-1] // 2
        if last_c - first_c >= len(x) + N:
            total_needed = max(st + n for st, n in zip(starts, sizes))
            break
        if i > 16 + 4 * (len(x) // max(s // 2, 1)):
            raise ValueError("mixed encoder failed to cover the signal")
    sizes.append(N)  # trail with a long block
    starts.append(starts[-1] + 3 * sizes[-2] // 4 - N // 4)
    total_needed = max(total_needed, starts[-1] + N)
    shift = -min(starts)
    starts = [st + shift for st in starts]
    total_needed += shift
    xp = np.zeros(total_needed)
    first_c = starts[0] + sizes[0] // 2
    xp[first_c : first_c + len(x)] = x

    spectra = []
    for k, (st, n) in enumerate(zip(starts, sizes)):
        flag = 1 if n == N else 0
        lp = 1 if (k == 0 or sizes[k - 1] == N) else 0
        ln_ = 1 if (k == len(sizes) - 1 or sizes[k + 1] == N) else 0
        w = _window_for(n, s, flag, lp, ln_)
        spectra.append((4.0 / n) * (_imdct_matrix(n).T @ (w * xp[st : st + n])))
    qmax = (1 << (q_bits - 1)) - 1
    peak = max((float(np.max(np.abs(sp))) for sp in spectra), default=0.0)
    g_idx = min(int(np.searchsorted(_INV_DB, peak / qmax)) if peak > 0 else 0, 255)
    gain = float(_INV_DB[g_idx])
    entries = 1 << q_bits
    cw = (N // 2) // psize
    rangebits = (N // 2).bit_length() - 1
    xr = 1 << rangebits

    bw = _BitWriter()
    bw.write(3 - 1, 8)  # three codebooks
    _write_codebook(bw, dims=cw, entries=1, lengths=[1], lookup=0)  # classbook
    _write_codebook(
        bw, dims=1, entries=entries, lengths=[q_bits] * entries, lookup=2,
        min_v=float(-(qmax + 1)), delta_v=1.0, value_bits=q_bits,
        mults=list(range(entries)),
    )
    _write_codebook(bw, dims=1, entries=1, lengths=[1], lookup=0)  # floor offsets
    bw.write(0, 6)
    bw.write(0, 16)  # one time transform
    bw.write(0, 6)  # one floor
    bw.write(1, 16)  # floor type 1
    bw.write(1, 5)  # ONE partition
    bw.write(0, 4)  # its class = 0
    bw.write(2 - 1, 3)  # class 0: two dimensions
    bw.write(0, 2)  # zero subclass bits -> no masterbook
    bw.write(2 + 1, 8)  # sub book = codebook 2 (stored +1)
    bw.write(0, 2)  # multiplier - 1
    bw.write(rangebits, 4)
    bw.write(xr // 4, rangebits)  # two extra X points
    bw.write(xr // 2, rangebits)
    bw.write(0, 6)  # one residue
    bw.write(1, 16)  # residue type 1
    bw.write(0, 24)
    bw.write(N // 2, 24)
    bw.write(psize - 1, 24)
    bw.write(0, 6)
    bw.write(0, 8)  # classbook 0
    bw.write(1, 3)
    bw.write(0, 1)
    bw.write(1, 8)  # pass-0 value book
    bw.write(0, 6)  # one mapping
    bw.write(0, 16)
    bw.write(0, 1)  # one submap
    bw.write(0, 1)  # no coupling
    bw.write(0, 2)
    bw.write(0, 8)
    bw.write(0, 8)
    bw.write(0, 8)
    bw.write(1, 6)  # TWO modes
    bw.write(0, 1)  # mode 0: short
    bw.write(0, 16), bw.write(0, 16), bw.write(0, 8)
    bw.write(1, 1)  # mode 1: long
    bw.write(0, 16), bw.write(0, 16), bw.write(0, 8)
    bw.write(1, 1)
    setup_pkt = b"\x05vorbis" + bw.bytes_()

    bw = _BitWriter()
    bw.write(0, 32)
    bw.write(1, 8)
    bw.write(rate, 32)
    bw.write(0, 32), bw.write(0, 32), bw.write(0, 32)
    bw.write(s.bit_length() - 1, 4)
    bw.write(N.bit_length() - 1, 4)
    bw.write(1, 1)
    ident_pkt = b"\x01vorbis" + bw.bytes_()
    bw = _BitWriter()
    bw.write(0, 32)
    bw.write(0, 32)
    bw.write(1, 1)
    comment_pkt = b"\x03vorbis" + bw.bytes_()

    value_codes = assign_codewords([q_bits] * entries)
    one_bit = assign_codewords([1])[0]
    packets = [ident_pkt, comment_pkt, setup_pkt]
    for k, (st, n) in enumerate(zip(starts, sizes)):
        flag = 1 if n == N else 0
        lp = 1 if (k == 0 or sizes[k - 1] == N) else 0
        ln_ = 1 if (k == len(sizes) - 1 or sizes[k + 1] == N) else 0
        res = np.clip(np.round(spectra[k] / gain), -(qmax + 1), qmax).astype(np.int64)
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(flag, 1)  # mode number (ilog(1) = 1 bit)
        if flag:
            bw.write(lp, 1)
            bw.write(ln_, 1)
        # floor: nonzero, y0, y1, then two zero offsets via codebook 2
        bw.write(1, 1)
        bw.write(g_idx, 8)
        bw.write(g_idx, 8)
        _wcode(bw, *one_bit)
        _wcode(bw, *one_bit)
        # residue: one classword, then the clamped partitions
        _wcode(bw, *one_bit)
        parts_here = (n // 2) // psize
        for i in range(parts_here):
            for v in res[i * psize : (i + 1) * psize]:
                c, ln2 = value_codes[int(v) + qmax + 1]
                _wcode(bw, c, ln2)
        packets.append(bw.bytes_())
    # variable blocks: packet j completes (n_{j-1} + n_j)/4 samples
    # beyond packet j-1 (the lapped-MDCT advance); first packet 0
    granules, cum = [0, 0, 0], 0
    for k in range(len(sizes)):
        if k > 0:
            cum += (sizes[k - 1] + sizes[k]) // 4
        granules.append(cum)
    # terminal granule = true input length (spec App. A truncation)
    granules[-1] = max(granules[-2], min(granules[-1], len(x)))
    return _ogg_wrap(packets, granules=granules)
