"""Stdlib + numpy baseline TIFF codec — the document/scan-dataset
format (OCR corpora ship TIFF the way web crawls ship JPEG).
Everything derives from the PUBLIC TIFF 6.0 specification: both byte
orders (II/MM), IFD tag walking, strip-based layout, bilevel/gray/
palette/RGB(A) photometric interpretations, 1/8/16-bit samples, and
the three baseline compressions — none (1), CCITT-free PackBits
(32773), and TIFF-variant LZW (5: MSB-first codes, early code-size
change, CLEAR/EOI semantics — the variant GIF's LSB-first LZW cannot
read).

Decoder: :func:`decode_tiff` → (H, W[, C]) uint8 (first IFD only;
multi-page files decode their first page — page count surfaces via
:func:`tiff_page_count`). r12: horizontal-differencing predictor
(tag 317=2, per-row per-channel cumsum — scanner LZW files) and
PlanarConfiguration=2 (one sample plane per strip run) decode too.
Tiled layout, JPEG-in-TIFF, and CCITT fax compressions raise
NotImplementedError naming PIL.

Encoder: :func:`encode_tiff` — deterministic synthesis for tests and
oracle rows (uncompressed, PackBits, or LZW strips; gray/RGB/RGBA).
TIFF is lossless: round trips assert EXACT equality.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("corrupt TIFF: PackBits strip ended early")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            nxt_run = 1
            while i + nxt_run < n and nxt_run < 3 and data[i + nxt_run] == data[i]:
                nxt_run += 1
            if nxt_run >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW (spec §13): MSB-first variable-width codes, table
    reset at CLEAR (256), EOI (257), and the EARLY code-width bump
    (width grows at table size 2^w - 1, one entry sooner than GIF)."""
    out = bytearray()
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    acc = 0
    nbits = 0
    prev = b""
    pos = 0
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("corrupt TIFF: LZW strip ended early")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # CLEAR
            table = list(base)
            width = 9
            prev = b""
            continue
        if code == 257:  # EOI
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF: LZW code out of range")
        out += entry
        if prev:
            table.append(prev + entry[:1])
        prev = entry
        # EARLY change, adjusted for the decoder's one-entry lag: the
        # writer has already assigned the entry for the code we just
        # read, so its counter is len(table)+1; it bumped when that
        # counter + 1 reached 2^width
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # CLEAR
    w = b""
    for bch in data:
        wk = w + bytes([bch])
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        table[wk] = next_code
        next_code += 1
        # EARLY code-size change (TIFF's famous off-by-one): bump when
        # the NEXT code to assign is 2^width - 1
        if next_code + 1 >= (1 << width):
            if width < 12:
                width += 1
            else:
                put(256, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = bytes([bch])
    if w:
        put(table[w], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _read_ifd(data: bytes, fmt: str, off: int):
    (n,) = struct.unpack_from(fmt + "H", data, off)
    tags = {}
    type_sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", data, off + 2 + 12 * i)
        vo = off + 2 + 12 * i + 8
        size = type_sizes.get(typ, 1) * cnt
        if size > 4:
            (ptr,) = struct.unpack_from(fmt + "I", data, vo)
            raw = data[ptr : ptr + size]
        else:
            raw = data[vo : vo + size]
        if typ == 3:
            vals = list(struct.unpack(fmt + "H" * cnt, raw[: 2 * cnt]))
        elif typ == 4:
            vals = list(struct.unpack(fmt + "I" * cnt, raw[: 4 * cnt]))
        elif typ == 1:
            vals = list(raw[:cnt])
        else:
            vals = [raw]
        tags[tag] = vals
    (nxt,) = struct.unpack_from(fmt + "I", data, off + 2 + 12 * n)
    return tags, nxt


def tiff_page_count(data: bytes) -> int:
    fmt = "<" if data[:2] == b"II" else ">"
    (off,) = struct.unpack_from(fmt + "I", data, 4)
    n = 0
    while off:
        _, off = _read_ifd(data, fmt, off)
        n += 1
    return n


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode the first IFD of a baseline TIFF → (H, W[, C]) uint8."""
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF stream")
    fmt = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(fmt + "H", data, 2)
    if magic != 42:
        raise ValueError("corrupt TIFF: bad magic")
    (off,) = struct.unpack_from(fmt + "I", data, 4)
    tags, _ = _read_ifd(data, fmt, off)
    w = tags[256][0]
    h = tags[257][0]
    bits = tags.get(258, [1])
    spp = tags.get(277, [1])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF needs PIL (strip layout decodes here)")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (CCITT/JPEG/deflate) needs PIL — "
            "none/LZW/PackBits decode here"
        )
    bps = bits[0]
    if bps not in (1, 8, 16) or any(b != bps for b in bits):
        raise NotImplementedError(f"TIFF {bits}-bit samples need PIL")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2) or (predictor == 2 and bps == 1):
        raise NotImplementedError(f"TIFF predictor {predictor} at {bps}-bit needs PIL")
    planar = tags.get(284, [1])[0]
    if planar not in (1, 2) or (planar == 2 and bps == 1 and spp > 1):
        raise NotImplementedError(f"TIFF PlanarConfiguration {planar} at {bps}-bit needs PIL")
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, [h])[0]
    per_plane = planar == 2 and spp > 1
    # planar strips carry ONE sample plane each (all plane-0 strips,
    # then plane 1, ...), so a strip row holds w samples, not w*spp
    row_bytes = (w * bps + 7) // 8 if per_plane else (w * spp * bps + 7) // 8
    strips_per_plane = -(-h // rows_per_strip) if rows_per_strip else 1
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = bytes(data[so : so + sc])
        row0 = (si % strips_per_plane if per_plane else si) * rows_per_strip
        nrows = min(rows_per_strip, h - row0)
        expected = nrows * row_bytes
        if comp == 5:
            strip = _tiff_lzw_decode(strip, expected)
        elif comp == 32773:
            strip = _packbits_decode(strip, expected)
        raw += strip[:expected]
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    if bps == 1:
        bits_arr = np.unpackbits(arr.reshape(h, row_bytes), axis=1)[:, : w * spp]
        px = (bits_arr * 255).astype(np.uint8).reshape(h, w, spp)
        if photo == 0:  # WhiteIsZero
            px = 255 - px
    elif bps == 16:
        shape = (spp, h, w, 2) if per_plane else (h, w, spp, 2)
        v = arr.reshape(shape).astype(np.uint32)
        hi, lo = (v[..., 0], v[..., 1]) if fmt == ">" else (v[..., 1], v[..., 0])
        val = hi << 8 | lo
        if per_plane:
            val = val.transpose(1, 2, 0)
        if predictor == 2:  # horizontal differencing, per channel per row
            val = np.cumsum(val, axis=1, dtype=np.uint32) & 0xFFFF
        px = ((val * 255 + 32767) // 65535).astype(np.uint8)
        if photo == 0:
            px = 255 - px
    else:
        if per_plane:
            px = arr.reshape(spp, h, w).transpose(1, 2, 0).copy()
        else:
            px = arr.reshape(h, w, spp).copy()
        if predictor == 2:
            px = (np.cumsum(px, axis=1, dtype=np.uint32) & 0xFF).astype(np.uint8)
        if photo == 0:
            px = 255 - px
    if photo == 3:  # palette
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("corrupt TIFF: palette image without ColorMap")
        cm = np.array(cmap, dtype=np.uint32).reshape(3, -1)  # 16-bit per entry
        pal = ((cm * 255 + 32767) // 65535).astype(np.uint8).T  # (n, 3)
        px = pal[np.minimum(px[:, :, 0], len(pal) - 1)]
    if px.shape[2] == 1:
        return px[:, :, 0].copy()
    return px


def encode_tiff(
    px: np.ndarray,
    compression: str = "none",
    big_endian: bool = False,
    predictor: bool = False,
    planar: bool = False,
) -> bytes:
    """Encode (H, W[, C]) uint8 as a baseline strip TIFF
    (``compression``: none | packbits | lzw; ``predictor`` emits
    horizontal differencing, tag 317=2 — what scanner LZW files use;
    ``planar`` emits PlanarConfiguration=2 with one sample plane per
    strip run). Lossless — exact round trips."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    fmt = ">" if big_endian else "<"
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    src = px
    if predictor:  # per-row per-channel differences (inverse of cumsum)
        src = np.concatenate([px[:, :1, :], np.diff(px.astype(np.int16), axis=1)], axis=1)
        src = (src & 0xFF).astype(np.uint8)
    rows_per_strip = max(1, 8192 // max(1, w * spp))
    strips: List[bytes] = []
    planes = src.transpose(2, 0, 1)[..., None] if planar and spp > 1 else [src]
    for plane in planes:
        for y0 in range(0, h, rows_per_strip):
            body = plane[y0 : y0 + rows_per_strip].tobytes()
            if compression == "packbits":
                body = _packbits_encode(body)
            elif compression == "lzw":
                body = _tiff_lzw_encode(body)
            strips.append(body)
    header = struct.pack(fmt + "2sHI", b"II" if fmt == "<" else b"MM", 42, 8)
    # layout: header(8) IFD data-area strips
    entries = []

    def entry(tag: int, typ: int, vals: List[int]):
        entries.append((tag, typ, vals))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [comp_code])
    entry(262, 3, [2 if spp >= 3 else 1])  # RGB or BlackIsZero
    entry(277, 3, [spp])
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    entry(273, 4, [0] * len(strips))  # patched below
    if spp == 4:
        entry(338, 3, [2])  # unassociated alpha
    if predictor:
        entry(317, 3, [2])
    if planar and spp > 1:
        entry(284, 3, [2])
    entries.sort()
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    # first pass: compute out-of-line value area
    extra = bytearray()
    type_size = {3: 2, 4: 4}
    packed = []
    for tag, typ, vals in entries:
        size = type_size[typ] * len(vals)
        if size <= 4:
            packed.append((tag, typ, vals, None))
        else:
            packed.append((tag, typ, vals, data_off + len(extra)))
            extra += struct.pack(fmt + ("H" if typ == 3 else "I") * len(vals), *vals)
    strips_off = data_off + len(extra)
    offs = []
    cur = strips_off
    for s in strips:
        offs.append(cur)
        cur += len(s)
    # rebuild with real strip offsets
    out = bytearray(header)
    out += struct.pack(fmt + "H", n)
    extra = bytearray()
    for tag, typ, vals, ptr in packed:
        if tag == 273:
            vals = offs
        code = "H" if typ == 3 else "I"
        size = type_size[typ] * len(vals)
        out += struct.pack(fmt + "HHI", tag, typ, len(vals))
        if size <= 4:
            raw = struct.pack(fmt + code * len(vals), *vals)
            out += raw + b"\x00" * (4 - len(raw))
        else:
            out += struct.pack(fmt + "I", data_off + len(extra))
            extra += struct.pack(fmt + code * len(vals), *vals)
    out += struct.pack(fmt + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
