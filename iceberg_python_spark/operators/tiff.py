"""Stdlib + numpy baseline TIFF codec — the document/scan-dataset
format (OCR corpora ship TIFF the way web crawls ship JPEG).
Everything derives from the PUBLIC TIFF 6.0 specification: both byte
orders (II/MM), IFD tag walking, strip-based layout, bilevel/gray/
palette/RGB(A) photometric interpretations, 1/8/16-bit samples, and
the baseline compressions — none (1), CCITT-free PackBits
(32773), TIFF-variant LZW (5: MSB-first codes, early code-size
change, CLEAR/EOI semantics — the variant GIF's LSB-first LZW cannot
read), and Deflate (8 / legacy 32946, r16 — zlib streams, the PNG
precedent).

Decoder: :func:`decode_tiff` → (H, W[, C]) uint8 (first IFD only;
multi-page files decode their first page — page count surfaces via
:func:`tiff_page_count`). r12: horizontal-differencing predictor
(tag 317=2, per-row per-channel cumsum — scanner LZW files) and
PlanarConfiguration=2 (one sample plane per strip run) decode too.
r16: the §15 TILED layout (tags 322-325, per-tile predictor restart,
planar tile grids) and new-style JPEG-in-TIFF (compression 7 with the
tag-347 JPEGTables splice, TIFF TechNote 2 — segments decode through
jpeg.py). CCITT fax and old-style JPEG (comp 6) raise
NotImplementedError naming PIL.

Encoder: :func:`encode_tiff` — deterministic synthesis for tests and
oracle rows (uncompressed, PackBits, LZW, Deflate, or JPEG segments;
strip or tile layout; gray/RGB/RGBA). Non-JPEG compressions are
lossless: round trips assert EXACT equality.
"""

from __future__ import annotations

import struct
import zlib
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


def _tiff_lzw_decode(data: bytes, expected: int, early: int = 1) -> bytes:
    """TIFF LZW (spec §13): MSB-first variable-width codes, table
    reset at CLEAR (256), EOI (257), and the EARLY code-width bump
    (width grows at table size 2^w - 1, one entry sooner than GIF).
    ``early`` is PDF's /EarlyChange knob: 1 (TIFF/PDF default) bumps
    one entry sooner, 0 at the exact table-full point."""
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
        if len(table) + 1 + early >= (1 << width) and width < 12:
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
        if typ in (3, 4):
            # bound cnt by the bytes actually present BEFORE building
            # the unpack format — a crafted count field would otherwise
            # allocate a multi-GB format string (fuzz finding, r16)
            unit = 2 if typ == 3 else 4
            if len(raw) < unit * cnt:
                raise ValueError("corrupt TIFF: tag value runs past the buffer")
            vals = list(struct.unpack(fmt + ("H" if typ == 3 else "I") * cnt, raw[: unit * cnt]))
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


def _tag_int(tags, tag: int, default=None) -> int:
    """Integer tag value with the crafted-input contract: a missing
    required tag or a non-integer value field is corrupt structure
    (ValueError), never a KeyError/TypeError escaping the dispatch."""
    vals = tags.get(tag)
    if vals is None:
        if default is None:
            raise ValueError(f"corrupt TIFF: required tag {tag} missing")
        return default
    if not vals or not isinstance(vals[0], int):
        raise ValueError(f"corrupt TIFF: tag {tag} has a non-integer value")
    return vals[0]


def _tag_ints(tags, tag: int):
    vals = tags.get(tag)
    if not vals or not all(isinstance(v, int) for v in vals):
        raise ValueError(f"corrupt TIFF: tag {tag} missing or non-integer")
    return vals


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
    w = _tag_int(tags, 256)
    h = _tag_int(tags, 257)
    if w <= 0 or h <= 0 or w * h > 1 << 30:
        raise ValueError("corrupt TIFF: implausible image dimensions")
    bits = tags.get(258, [1])
    if not all(isinstance(b, int) for b in bits):
        raise ValueError("corrupt TIFF: non-integer BitsPerSample")
    spp = _tag_int(tags, 277, 1)
    comp = _tag_int(tags, 259, 1)
    photo = _tag_int(tags, 262, 1)
    if comp == 7:
        # r16: new-style JPEG-in-TIFF (TIFF TechNote 2) — each strip or
        # tile is a complete (possibly abbreviated) JPEG datastream;
        # tag 347 JPEGTables carries the shared DQT/DHT prologue. Pure
        # container plumbing onto the existing jpeg.py decoder.
        return _decode_jpeg_tiff(data, fmt, tags, w, h, spp, photo)
    if comp in (2, 3, 4):
        # r17: CCITT G3/G4 fax decode from spec (operators/ccitt.py —
        # decision record there: TIFF 6.0 §10 prints the MH tables)
        return _decode_ccitt_tiff(data, fmt, tags, w, h, spp, comp, photo)
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {comp} (old-JPEG) needs PIL — "
            "none/LZW/PackBits/Deflate/new-JPEG/CCITT decode here"
        )
    bps = bits[0]
    if bps not in (1, 8, 16) or any(b != bps for b in bits):
        raise NotImplementedError(f"TIFF {bits}-bit samples need PIL")
    predictor = _tag_int(tags, 317, 1)
    if predictor not in (1, 2) or (predictor == 2 and bps == 1):
        raise NotImplementedError(f"TIFF predictor {predictor} at {bps}-bit needs PIL")
    planar = _tag_int(tags, 284, 1)
    if planar not in (1, 2) or (planar == 2 and bps == 1 and spp > 1):
        raise NotImplementedError(f"TIFF PlanarConfiguration {planar} at {bps}-bit needs PIL")
    if 322 in tags or 324 in tags:
        px = _decode_tiles(data, fmt, tags, w, h, bps, spp, comp, predictor, planar)
        return _finish_pixels(px, photo, tags)
    offsets = _tag_ints(tags, 273)
    counts = _tag_ints(tags, 279)
    rows_per_strip = _tag_int(tags, 278, h)
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
        elif comp in (8, 32946):  # Adobe deflate / old deflate code
            try:  # cap expansion at the strip's declared pixel bytes
                strip = zlib.decompressobj().decompress(strip, expected)
            except zlib.error as exc:
                raise ValueError(f"corrupt TIFF: bad deflate strip: {exc}") from exc
        if len(strip) < expected:
            raise ValueError("corrupt TIFF: strip data ended early")
        raw += strip[:expected]
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    if bps == 1:
        bits_arr = np.unpackbits(arr.reshape(h, row_bytes), axis=1)[:, : w * spp]
        px = (bits_arr * 255).astype(np.uint8).reshape(h, w, spp)
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
    else:
        if per_plane:
            px = arr.reshape(spp, h, w).transpose(1, 2, 0).copy()
        else:
            px = arr.reshape(h, w, spp).copy()
        if predictor == 2:
            px = (np.cumsum(px, axis=1, dtype=np.uint32) & 0xFF).astype(np.uint8)
    return _finish_pixels(px, photo, tags)


def _finish_pixels(px: np.ndarray, photo: int, tags) -> np.ndarray:
    """Shared photometric tail for the strip and tile paths: WhiteIsZero
    inversion, palette expansion, single-channel squeeze."""
    if photo == 0:  # WhiteIsZero
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


#: 256-entry per-byte bit-reversal for FillOrder 2 fax strips
_BITREV = bytes(int(f"{b:08b}"[::-1], 2) for b in range(256))


def _decode_ccitt_tiff(
    data: bytes, fmt: str, tags, w: int, h: int, spp: int, comp: int, photo: int,
) -> np.ndarray:
    """CCITT strips (compressions 2=MH, 3=T.4, 4=T.6) -> pixels. Each
    strip is an independent fax stream covering its rows (2D reference
    lines never cross strips, TIFF 6.0 §11)."""
    from . import ccitt as _ccitt

    bits = tags.get(258, [1])
    if bits != [1] or spp != 1:
        raise NotImplementedError("CCITT TIFF must be 1-bit single-sample")
    if photo not in (0, 1):
        raise ValueError("CCITT TIFF with a non-bilevel PhotometricInterpretation")
    fill_order = _tag_int(tags, 266, 1)
    if fill_order not in (1, 2):
        raise ValueError("corrupt TIFF: FillOrder must be 1 or 2")
    if 322 in tags or 324 in tags:
        raise NotImplementedError("tiled CCITT TIFF needs PIL")
    t4 = _tag_int(tags, 292, 0) if comp == 3 else 0
    if comp == 3 and t4 & 2:
        raise NotImplementedError("T.4 uncompressed mode (T4Options bit 1)")
    offsets = _tag_ints(tags, 273)
    counts = _tag_ints(tags, 279)
    rows_per_strip = _tag_int(tags, 278, h)
    ink = np.zeros((h, w), dtype=np.uint8)
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        row0 = si * rows_per_strip
        nrows = min(rows_per_strip, h - row0)
        if nrows <= 0:
            break
        seg = bytes(data[so : so + sc])
        if fill_order == 2:
            # lsb-first bit packing (common in real fax TIFFs): reverse
            # the bits of every byte, then decode msb-first as usual
            seg = bytes(_BITREV[b] for b in seg)
        if comp == 4:
            ink[row0 : row0 + nrows] = _ccitt.decode_g4(seg, w, nrows)
        elif comp == 3:
            ink[row0 : row0 + nrows] = _ccitt.decode_g3(seg, w, nrows, two_d=bool(t4 & 1))
        else:
            ink[row0 : row0 + nrows] = _ccitt.decode_mh(seg, w, nrows)
    # stored sample value: WhiteIsZero stores ink directly; BlackIsZero
    # stores the complement. _finish_pixels applies the photo-0 inversion.
    stored = ink if photo == 0 else 1 - ink
    return _finish_pixels((stored * 255).astype(np.uint8)[:, :, None], photo, tags)


def _decode_jpeg_tiff(
    data: bytes, fmt: str, tags, w: int, h: int, spp: int, photo: int,
) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7, TIFF TechNote 2): every
    strip/tile holds one JPEG datastream; when tag 347 (JPEGTables)
    exists its SOI..EOI body is spliced ahead of each abbreviated
    segment. The photometric is already resolved by the JPEG decoder
    (YCbCr→RGB), so photo 2/6 pass through; photo 0 inverts."""
    from .jpeg import decode_jpeg

    if spp not in (1, 3):
        raise NotImplementedError(f"JPEG-in-TIFF with {spp} samples/pixel needs PIL")
    tables = tags.get(347, [b""])[0]
    if not isinstance(tables, (bytes, bytearray)):
        raise ValueError("corrupt TIFF: JPEGTables has a non-byte value")
    if tables and (tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9"):
        raise ValueError("corrupt TIFF: JPEGTables is not an SOI..EOI stream")

    def seg_pixels(so: int, sc: int) -> np.ndarray:
        seg = bytes(data[so : so + sc])
        if seg[:2] != b"\xff\xd8":
            raise ValueError("corrupt TIFF: JPEG segment missing SOI")
        if tables:  # splice: tables' SOI + tables body + segment body
            seg = tables[:-2] + seg[2:]
        px = decode_jpeg(seg)
        return px[:, :, None] if px.ndim == 2 else px

    tiled = 322 in tags or 324 in tags
    if tiled:
        if not all(t in tags for t in (322, 323, 324, 325)):
            raise ValueError("corrupt TIFF: incomplete tile tag set")
        tw, tl = _tag_int(tags, 322), _tag_int(tags, 323)
        if tw <= 0 or tl <= 0:
            raise ValueError("corrupt TIFF: bad tile dimensions")
        offsets, counts = _tag_ints(tags, 324), _tag_ints(tags, 325)
        across, down = -(-w // tw), -(-h // tl)
        if down * tl * across * tw * 3 > 1 << 31:
            raise ValueError("corrupt TIFF: implausible tile grid size")
        if len(offsets) < across * down:
            raise ValueError("corrupt TIFF: tile count below the grid size")
        canvas = None
        for ti in range(across * down):
            v = seg_pixels(offsets[ti], counts[ti])
            if canvas is None:
                canvas = np.zeros((down * tl, across * tw, v.shape[2]), dtype=np.uint8)
            ty, tx = divmod(ti, across)
            canvas[ty * tl : ty * tl + v.shape[0], tx * tw : tx * tw + v.shape[1]] = v[
                :tl, :tw
            ]
        px = canvas[:h, :w, :]
    else:
        offsets, counts = _tag_ints(tags, 273), _tag_ints(tags, 279)
        rows_per_strip = _tag_int(tags, 278, h) or h
        canvas = None
        for si, (so, sc) in enumerate(zip(offsets, counts)):
            v = seg_pixels(so, sc)
            if canvas is None:
                canvas = np.zeros((h, w, v.shape[2]), dtype=np.uint8)
            y0 = si * rows_per_strip
            nr = min(v.shape[0], h - y0)
            canvas[y0 : y0 + nr, : min(w, v.shape[1])] = v[:nr, :w]
        px = canvas
    if px is None:
        raise ValueError("corrupt TIFF: no JPEG segments")
    if photo == 0:
        px = 255 - px
    if px.shape[2] == 1:
        return px[:, :, 0].copy()
    return px


def _decode_tiles(
    data: bytes, fmt: str, tags, w: int, h: int, bps: int, spp: int,
    comp: int, predictor: int, planar: int,
) -> np.ndarray:
    """Tiled layout (TIFF 6.0 §15): TileWidth/TileLength (322/323) pad
    the image to a full tile grid; TileOffsets/TileByteCounts (324/325)
    list tiles left-to-right, top-to-bottom, one full grid per sample
    plane when PlanarConfiguration=2. Each tile decompresses
    independently and the predictor restarts at every tile row, so the
    decode pastes per-tile pixel blocks into a padded canvas and crops."""
    if 322 not in tags or 323 not in tags or 324 not in tags or 325 not in tags:
        raise ValueError("corrupt TIFF: incomplete tile tag set")
    tw, tl = _tag_int(tags, 322), _tag_int(tags, 323)
    if tw <= 0 or tl <= 0:
        raise ValueError("corrupt TIFF: bad tile dimensions")
    offsets, counts = _tag_ints(tags, 324), _tag_ints(tags, 325)
    across, down = -(-w // tw), -(-h // tl)
    if down * tl * across * tw * max(spp, 1) > 1 << 31:
        raise ValueError("corrupt TIFF: implausible tile grid size")
    per_plane = planar == 2 and spp > 1
    nplanes = spp if per_plane else 1
    sppe = 1 if per_plane else spp
    n_grid = across * down
    if len(offsets) < n_grid * nplanes or len(counts) < n_grid * nplanes:
        raise ValueError("corrupt TIFF: tile count below the grid size")
    tile_row_bytes = (tw * sppe * bps + 7) // 8
    expected = tl * tile_row_bytes
    dtype = np.uint16 if bps == 16 else np.uint8
    canvas = np.zeros((down * tl, across * tw, nplanes * sppe), dtype=dtype)
    for ti in range(n_grid * nplanes):
        so, sc = offsets[ti], counts[ti]
        tile = bytes(data[so : so + sc])
        if comp == 5:
            tile = _tiff_lzw_decode(tile, expected)
        elif comp == 32773:
            tile = _packbits_decode(tile, expected)
        elif comp in (8, 32946):
            try:
                tile = zlib.decompressobj().decompress(tile, expected)
            except zlib.error as exc:
                raise ValueError(f"corrupt TIFF: bad deflate tile: {exc}") from exc
        if len(tile) < expected:
            raise ValueError("corrupt TIFF: tile data ended early")
        arr = np.frombuffer(tile[:expected], dtype=np.uint8)
        if bps == 1:
            bits_arr = np.unpackbits(arr.reshape(tl, tile_row_bytes), axis=1)
            v = (bits_arr[:, : tw * sppe] * 255).astype(np.uint8).reshape(tl, tw, sppe)
        elif bps == 16:
            b2 = arr.reshape(tl, tw, sppe, 2).astype(np.uint32)
            hi, lo = (b2[..., 0], b2[..., 1]) if fmt == ">" else (b2[..., 1], b2[..., 0])
            v = hi << 8 | lo
            if predictor == 2:
                v = np.cumsum(v, axis=1, dtype=np.uint32) & 0xFFFF
            v = v.astype(np.uint16)
        else:
            v = arr.reshape(tl, tw, sppe)
            if predictor == 2:
                v = (np.cumsum(v, axis=1, dtype=np.uint32) & 0xFF).astype(np.uint8)
        plane, k = divmod(ti, n_grid)
        ty, tx = divmod(k, across)
        canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw,
               plane * sppe : (plane + 1) * sppe] = v
    px = canvas[:h, :w, :]
    if bps == 16:
        px = ((px.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    return px


def _factor_jpeg_tables(segments: List[bytes]) -> Tuple[bytes, List[bytes]]:
    """Split shared DQT/DHT markers out of complete JPEG segments into
    a JPEGTables blob (SOI + tables + EOI) and abbreviated per-segment
    streams (SOI + everything else), per TIFF TechNote 2."""
    tables = b""
    out: List[bytes] = []
    for seg in segments:
        if seg[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG segment")
        kept = bytearray(b"\xff\xd8")
        this_tables = bytearray()
        pos = 2
        while pos + 4 <= len(seg):
            if seg[pos] != 0xFF:
                raise ValueError("corrupt JPEG segment: lost marker sync")
            marker = seg[pos + 1]
            if marker == 0xDA:  # SOS: entropy data follows, copy the rest
                kept += seg[pos:]
                break
            (ln,) = struct.unpack(">H", seg[pos + 2 : pos + 4])
            chunk = seg[pos : pos + 2 + ln]
            if marker in (0xDB, 0xC4):  # DQT / DHT → shared tables
                this_tables += chunk
            else:
                kept += chunk
            pos += 2 + ln
        if not tables:
            tables = bytes(this_tables)
        elif bytes(this_tables) != tables:
            raise ValueError("JPEG segments disagree on tables; cannot factor")
        out.append(bytes(kept))
    return (b"\xff\xd8" + tables + b"\xff\xd9") if tables else b"", out


def encode_tiff(
    px: np.ndarray,
    compression: str = "none",
    big_endian: bool = False,
    predictor: bool = False,
    planar: bool = False,
    tiled: bool = False,
    tile_size: Tuple[int, int] = (16, 16),
    jpeg_quality: int = 95,
    jpeg_tables: bool = False,
    fill_order: int = 1,
) -> bytes:
    """Encode (H, W[, C]) uint8 as a baseline TIFF
    (``compression``: none | packbits | lzw | deflate | jpeg; ``predictor`` emits
    horizontal differencing, tag 317=2 — what scanner LZW files use;
    ``planar`` emits PlanarConfiguration=2 with one sample plane per
    strip/tile run; ``tiled`` emits the §15 tile layout with
    ``tile_size`` = (width, length), both multiples of 16 per spec).
    ``jpeg`` writes new-style JPEG-in-TIFF (compression 7) segments —
    lossy; ``jpeg_tables=True`` factors shared DQT/DHT into tag 347 and
    writes abbreviated segments. Other compressions are lossless —
    exact round trips."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    fmt = ">" if big_endian else "<"
    comp_code = {
        "none": 1, "packbits": 32773, "lzw": 5, "deflate": 8, "jpeg": 7,
        "ccitt-mh": 2, "ccitt-g3": 3, "ccitt-g3-2d": 3, "ccitt-g4": 4,
    }[compression]
    ccitt_kind = compression if compression.startswith("ccitt") else None
    if ccitt_kind and (predictor or planar or tiled or spp != 1):
        raise ValueError("CCITT: single-sample bilevel strips only")
    if fill_order == 2 and not ccitt_kind:
        raise ValueError("FillOrder 2 is only written for CCITT strips")
    if compression == "jpeg" and (predictor or planar or spp not in (1, 3)):
        raise ValueError("JPEG-in-TIFF: chunky layout, no predictor, 1 or 3 samples")
    src = px
    if predictor and not tiled:  # per-row differences (inverse of cumsum)
        src = np.concatenate([px[:, :1, :], np.diff(px.astype(np.int16), axis=1)], axis=1)
        src = (src & 0xFF).astype(np.uint8)
    rows_per_strip = max(1, 8192 // max(1, w * spp))
    if compression == "jpeg":
        rows_per_strip = max(8, rows_per_strip - rows_per_strip % 8)
    if ccitt_kind:
        rows_per_strip = h  # one strip: 2D rows reference the previous row

    def _compress(block: np.ndarray) -> bytes:
        if compression == "jpeg":
            from .jpeg import encode_jpeg

            return encode_jpeg(
                block[:, :, 0] if block.shape[2] == 1 else block, quality=jpeg_quality
            )
        body = block.tobytes()
        if compression == "packbits":
            return _packbits_encode(body)
        if compression == "lzw":
            return _tiff_lzw_encode(body)
        if compression == "deflate":
            return zlib.compress(body, 6)
        return body

    strips: List[bytes] = []
    if ccitt_kind:
        from . import ccitt as _ccitt

        ink = (src[:, :, 0] != 0).astype(np.uint8)  # nonzero = black ink
        payload = {
            "ccitt-mh": _ccitt.encode_mh,
            "ccitt-g3": _ccitt.encode_g3,
            "ccitt-g4": _ccitt.encode_g4,
        }.get(ccitt_kind, lambda a: _ccitt.encode_g3(a, two_d=True))(ink)
        if fill_order == 2:
            payload = bytes(_BITREV[b] for b in payload)
        strips = [payload]
    planes = src.transpose(2, 0, 1)[..., None] if planar and spp > 1 else [src]
    if ccitt_kind:
        pass
    elif tiled:
        tw, tl = tile_size
        if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
            raise ValueError("tile dimensions must be positive multiples of 16")
        across, down = -(-w // tw), -(-h // tl)
        for plane in planes:
            padded = np.zeros((down * tl, across * tw, plane.shape[2]), dtype=np.uint8)
            padded[:h, :w] = plane
            for ty in range(down):
                for tx in range(across):
                    blk = padded[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                    if predictor:  # restarts at every tile row (§15)
                        blk = np.concatenate(
                            [blk[:, :1, :], np.diff(blk.astype(np.int16), axis=1)], axis=1
                        )
                        blk = (blk & 0xFF).astype(np.uint8)
                    strips.append(_compress(blk))
    else:
        for plane in planes:
            for y0 in range(0, h, rows_per_strip):
                strips.append(_compress(plane[y0 : y0 + rows_per_strip]))
    tables_blob = b""
    if compression == "jpeg" and jpeg_tables:
        tables_blob, strips = _factor_jpeg_tables(strips)
    header = struct.pack(fmt + "2sHI", b"II" if fmt == "<" else b"MM", 42, 8)
    # layout: header(8) IFD data-area strips
    entries = []

    def entry(tag: int, typ: int, vals: List[int]):
        entries.append((tag, typ, vals))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [1] if ccitt_kind else [8] * spp)
    entry(259, 3, [comp_code])
    # JPEG segments carry YCbCr (photo 6) when color; CCITT fax is
    # WhiteIsZero (photo 0) by convention; else RGB/gray
    photo_code = (
        0 if ccitt_kind
        else 6 if (compression == "jpeg" and spp == 3)
        else (2 if spp >= 3 else 1)
    )
    entry(262, 3, [photo_code])
    if ccitt_kind and fill_order == 2:
        entry(266, 3, [2])
    if ccitt_kind == "ccitt-g3":
        entry(292, 4, [0])
    elif ccitt_kind == "ccitt-g3-2d":
        entry(292, 4, [1])
    elif ccitt_kind == "ccitt-g4":
        entry(293, 4, [0])
    entry(277, 3, [spp])
    if tables_blob:
        entry(347, 7, tables_blob)
    if tiled:
        entry(322, 4, [tile_size[0]])
        entry(323, 4, [tile_size[1]])
        entry(325, 4, [len(s) for s in strips])
        entry(324, 4, [0] * len(strips))  # patched below
    else:
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
    type_size = {3: 2, 4: 4, 7: 1}
    packed = []
    for tag, typ, vals in entries:
        size = type_size[typ] * len(vals)
        if size <= 4:
            packed.append((tag, typ, vals, None))
        else:
            packed.append((tag, typ, vals, data_off + len(extra)))
            if typ == 7:  # UNDEFINED: raw bytes
                extra += bytes(vals)
            else:
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
        if tag == (324 if tiled else 273):
            vals = offs
        code = "H" if typ == 3 else "I"
        size = type_size[typ] * len(vals)
        out += struct.pack(fmt + "HHI", tag, typ, len(vals))
        if size <= 4:
            raw = bytes(vals) if typ == 7 else struct.pack(fmt + code * len(vals), *vals)
            out += raw + b"\x00" * (4 - len(raw))
        else:
            out += struct.pack(fmt + "I", data_off + len(extra))
            if typ == 7:
                extra += bytes(vals)
            else:
                extra += struct.pack(fmt + code * len(vals), *vals)
    out += struct.pack(fmt + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
