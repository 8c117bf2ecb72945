"""Stdlib + numpy GIF codec (GIF87a/GIF89a) — the last common
crawl-image format behind a gate (PNG/JPEG/PPM/BMP decode since
r10/r11). Everything derives from the PUBLIC GIF89a specification:
logical screen descriptor, global/local color tables, variable-width
LZW with CLEAR/END codes and a 4096-entry dictionary cap, interlaced
row order, Graphic Control Extensions (frame delays, transparency,
disposal methods 0-3), and multi-frame animation composited onto the
logical screen.

Decoder: :func:`decode_gif` → (frames as (H, W, 3) uint8 RGB on the
full logical screen, per-frame delays in ms). :func:`sample_frames`
mirrors the Y4M sampler's (idx, t_ms, rgb) generator so animated GIFs
ride the existing ``extract_video_frames`` plumbing; still GIFs decode
through ``decode_image`` like any other image.

Encoder: :func:`encode_gif` — the deterministic synthesis half tests
and oracle rows rely on (palette built from the frames' distinct
colors, ≤256 of them; real LZW compression with dictionary resets).
GIF is palette-based and LOSSLESS over its palette, so
decode(encode(frames)) reproduces the input arrays exactly — the
round-trip oracle is equality, not a tolerance.

The LZW loops are per-payload Python inside Arrow-batched
``mapInPandas`` like every codec here — O(pixels) per payload is the
honest floor; a corrupt file costs one row, never the job.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Tuple

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW → index stream (uint8 array)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    # dictionary: code -> byte sequence; seed with literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes = b""
    pos = 0
    while pos < len(data) or nbits >= width:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits  # LSB-first packing
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = b""
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        if n_out + len(entry) > n_pixels:
            entry = entry[: n_pixels - n_out]
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if prev and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if n_out >= n_pixels:
            break
    if n_out < n_pixels:
        raise ValueError("corrupt GIF: LZW stream ended early")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF variable-width LZW compressor (dictionary reset at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    put(clear, width)
    w = b""
    for b in indices.tobytes():
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        put(table[w], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    chunks = []
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        pos += n
    return b"".join(chunks), pos


def decode_gif(data: bytes) -> Tuple[List[np.ndarray], List[int]]:
    """Decode GIF bytes → (frames composited on the logical screen as
    (H, W, 3) uint8 RGB, per-frame delays in ms)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: List[np.ndarray] = []
    delays: List[int] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    delay_ms = 0
    transparent = -1
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control
                gflags, delay_cs, tindex = struct.unpack("<BHB", body[:4])
                disposal = (gflags >> 2) & 0x7
                transparent = tindex if gflags & 1 else -1
                delay_ms = delay_cs * 10
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        il, it, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("corrupt GIF: image without any color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(lzw, mcs, iw * ih).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: reorder rows
            ordered = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE:
                rows = range(start, ih, step)
                for y in rows:
                    ordered[y] = idx[src]
                    src += 1
            idx = ordered
        prev = canvas.copy()
        region = canvas[it : it + ih, il : il + iw]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore background in the frame's region
            canvas[it : it + ih, il : il + iw] = (
                gct[bg] if gct is not None and bg < len(gct) else 0
            )
        elif disposal == 3:  # restore previous
            canvas = prev
        delay_ms = 0
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames, delays


def encode_gif(
    frames,
    delays_ms=None,
    interlace: bool = False,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB frame(s) as GIF89a. The palette is
    built from the distinct colors across all frames (≤256 — GIF is
    palette-bound; quantize upstream if needed), so the round trip is
    EXACT. One frame → still GIF; several → animation with per-frame
    delays (default 100 ms)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stack, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 distinct colors, got {len(palette)}")
    depth = max(1, int(len(palette) - 1).bit_length())
    table_size = 1 << depth
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (table_size - len(palette)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += pal_bytes
    delays = delays_ms or [100] * len(frames)
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    offset = 0
    mcs = max(2, depth)
    for fi, f in enumerate(frames):
        n_px = h * w
        idx = inverse[offset : offset + n_px].astype(np.uint8).reshape(h, w)
        offset += n_px
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delays[fi] // 10, 0) + b"\x00"
        if interlace:
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, h, step))
            idx = idx[rows]
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        out += bytes([mcs])
        lzw = _lzw_encode(idx.reshape(-1), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def sample_frames(data: bytes, every_n_ms: int = 1000) -> Iterator[Tuple[int, int, np.ndarray]]:
    """Yield (frame_idx, t_ms, rgb) sampled every ``every_n_ms`` of
    animation time (frame 0 always included) — the GIF twin of
    ``video.sample_frames``, so animated GIFs ride the same
    ``extract_video_frames`` plumbing."""
    frames, delays = decode_gif(data)
    t = 0
    next_t = 0
    for i, (f, d) in enumerate(zip(frames, delays)):
        if t >= next_t:
            yield i, t, f
            next_t = t + every_n_ms
        t += max(d, 10)  # browsers clamp 0-delay frames; so do we
