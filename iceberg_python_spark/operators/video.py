"""Stdlib + numpy video codecs: Y4M (YUV4MPEG2) and — r16 —
UNCOMPRESSED AVI frame decode/sampling, the two containers a
stdlib-only environment can honestly parse (raw YUV planes behind a
text header; BI_RGB DIB or raw-I420 frames behind RIFF plumbing).
MP4/WebM and compressed AVI fourccs need real codecs and raise naming
them; inside :func:`~.multimodal.extract_video_frames` that surfaces
per row as ``decode_ok=false``.

Decode: header `YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<fmt>` then
`FRAME\\n` + raw planes. 4:2:0 (C420*, chroma upsampled 2×2), 4:2:2,
4:4:4 and mono supported; BT.601 limited-range YUV→RGB in one
vectorized numpy expression per frame.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np


def _parse_header(data: bytes) -> Tuple[dict, int]:
    eol = data.find(b"\n")
    if eol < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    params: dict = {"C": "420jpeg"}
    for tok in data[9:eol].split():
        key, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        params[key] = val
    w, h = int(params["W"]), int(params["H"])
    num, den = (params.get("F", "25:1").split(":") + ["1"])[:2]
    params.update(width=w, height=h, fps=float(num) / float(den or 1))
    return params, eol + 1


def _frame_geometry(fmt: str, w: int, h: int) -> Tuple[int, Tuple[int, int]]:
    if fmt.startswith("420"):
        return w * h + 2 * ((w // 2) * (h // 2)), (2, 2)
    if fmt.startswith("422"):
        return w * h + 2 * ((w // 2) * h), (1, 2)
    if fmt.startswith("444"):
        return 3 * w * h, (1, 1)
    if fmt.startswith("mono"):
        return w * h, (0, 0)
    raise NotImplementedError(f"Y4M chroma format C{fmt}")


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    # BT.601 limited range
    yf = (y.astype(np.float64) - 16.0) * (255.0 / 219.0)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_y4m(data: bytes) -> Tuple[List[np.ndarray], float]:
    """All frames as (H, W, 3) uint8 RGB (mono replicated), plus fps."""
    if data[:4] in (b"\x00\x00\x00\x18", b"\x00\x00\x00\x20") or data[4:8] == b"ftyp":
        raise NotImplementedError("MP4 decode needs an external codec (ffmpeg/decord)")
    if data[:4] == b"\x1a\x45\xdf\xa3":
        raise NotImplementedError("WebM/MKV decode needs an external codec (ffmpeg/decord)")
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        # r16: UNCOMPRESSED AVI decodes natively (BI_RGB DIB frames and
        # raw I420 planes — pure RIFF plumbing); compressed fourccs
        # gate inside decode_avi naming the codec
        return decode_avi(data)
    params, pos = _parse_header(data)
    w, h, fmt = params["width"], params["height"], params["C"]
    fsize, (cy, cx) = _frame_geometry(fmt, w, h)
    frames: List[np.ndarray] = []
    while pos < len(data):
        eol = data.find(b"\n", pos)
        if eol < 0 or not data[pos:eol].startswith(b"FRAME"):
            break
        pos = eol + 1
        raw = np.frombuffer(data, dtype=np.uint8, count=fsize, offset=pos)
        pos += fsize
        y = raw[: w * h].reshape(h, w)
        if cy == 0:  # mono
            frames.append(np.repeat(y[:, :, None], 3, axis=2).copy())
            continue
        cw, ch = w // cx, h // cy
        u = raw[w * h : w * h + cw * ch].reshape(ch, cw)
        v = raw[w * h + cw * ch : w * h + 2 * cw * ch].reshape(ch, cw)
        u = np.repeat(np.repeat(u, cy, axis=0), cx, axis=1)[:h, :w]
        v = np.repeat(np.repeat(v, cy, axis=0), cx, axis=1)[:h, :w]
        frames.append(_yuv_to_rgb(y, u, v))
    return frames, params["fps"]


def encode_y4m(frames: List[np.ndarray], fps: int = 25) -> bytes:
    """Minimal 4:4:4 Y4M writer for (H, W, 3) RGB frames (inverse
    BT.601), for deterministic test/oracle synthesis."""
    h, w = frames[0].shape[:2]
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for fr in frames:
        rgb = fr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        # exact inverse of the decoder's BT.601 equations, so a
        # round-trip differs only by plane quantization (±3)
        yf = 0.299 * r + 0.587 * g + 0.114 * b
        y = 16.0 + yf * (219.0 / 255.0)
        u = 128.0 + (b - yf) / 1.772
        v = 128.0 + (r - yf) / 1.402
        out.append(b"FRAME\n")
        for plane in (y, u, v):
            out.append(np.clip(np.round(plane), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


def _avi_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, start, size) for each RIFF
    chunk in [pos, end)."""
    while pos + 8 <= end:
        four = data[pos : pos + 4]
        (size,) = np.frombuffer(data[pos + 4 : pos + 8], dtype="<u4")
        size = int(size)
        if pos + 8 + size > len(data):
            raise ValueError("corrupt AVI: truncated chunk")
        ltype = data[pos + 8 : pos + 12] if four == b"LIST" else None
        yield four, ltype, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes) -> Tuple[List[np.ndarray], float]:
    """Decode an AVI (OpenDML/AVI 1.0 RIFF layout) → ((H, W, 3) uint8
    RGB frames, fps). Supported stream formats: BI_RGB DIB frames at
    24/32 bpp (bottom-up BGR rows, the Windows bitmap convention;
    top-down via negative biHeight), raw I420 planes, and MJPG
    Motion-JPEG (r17: per-frame baseline T.81 JPEGs through the in-repo
    decoder; DHT-less 'AVI1' frames get the Annex-K defaults). Other
    fourccs raise NotImplementedError NAMING the codec — real video
    codecs are the same table-data ceiling class as MP4."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    rate = scale = None
    w = h = None
    bpp = 24
    compression = 0
    fourcc_handler = b""
    got_video = False
    movi: List[bytes] = []

    def walk(pos: int, end: int, in_strl: bool = False) -> None:
        nonlocal rate, scale, w, h, bpp, compression, fourcc_handler, got_video
        stream_is_video = False
        for four, ltype, start, size in _avi_chunks(data, pos, end):
            if four == b"LIST":
                if ltype == b"movi":
                    for f2, lt2, s2, sz2 in _avi_chunks(data, start + 4, start + size):
                        if f2 == b"LIST" and lt2 == b"rec ":
                            for f3, _l3, s3, sz3 in _avi_chunks(data, s2 + 4, s2 + sz2):
                                if f3[2:4] in (b"db", b"dc"):
                                    movi.append(data[s3 : s3 + sz3])
                        elif f2[2:4] in (b"db", b"dc"):
                            movi.append(data[s2 : s2 + sz2])
                else:
                    walk(start + 4, start + size, in_strl=ltype == b"strl")
            elif four == b"strh" and not got_video:
                if data[start : start + 4] == b"vids":
                    stream_is_video = True
                    fourcc_handler = bytes(data[start + 4 : start + 8])
                    scale, rate = np.frombuffer(
                        data[start + 20 : start + 28], dtype="<u4"
                    )
                    scale, rate = int(scale), int(rate)
            elif four == b"strf" and in_strl and stream_is_video and not got_video:
                # BITMAPINFOHEADER
                bw, bh = np.frombuffer(data[start + 4 : start + 12], dtype="<i4")
                (bc,) = np.frombuffer(data[start + 14 : start + 16], dtype="<u2")
                (comp,) = np.frombuffer(data[start + 16 : start + 20], dtype="<u4")
                w, h, bpp, compression = int(bw), int(bh), int(bc), int(comp)
                got_video = True

    walk(12, len(data))
    if not got_video or w is None:
        raise ValueError("corrupt AVI: no video stream header")
    if w <= 0 or h == 0 or w * abs(h) > 1 << 30:
        raise ValueError("corrupt AVI: implausible frame dimensions")
    fps = (rate / scale) if rate and scale else 25.0
    top_down = h < 0
    h = abs(h)
    frames: List[np.ndarray] = []
    if compression == 0x30323449:  # 'I420' raw planes
        for raw in movi:
            if len(raw) < w * h * 3 // 2:
                raise ValueError("corrupt AVI: short I420 frame")
            a = np.frombuffer(raw, dtype=np.uint8)
            y = a[: w * h].reshape(h, w)
            cw, ch2 = w // 2, h // 2
            u = a[w * h : w * h + cw * ch2].reshape(ch2, cw)
            v = a[w * h + cw * ch2 : w * h + 2 * cw * ch2].reshape(ch2, cw)
            u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
            v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
            frames.append(_yuv_to_rgb(y, u, v))
        return frames, fps
    if compression in (0x47504A4D, 0x67706A6D):  # 'MJPG' / 'mjpg'
        # r17: Motion-JPEG — every movi chunk is a standalone baseline
        # T.81 JPEG (the in-repo decoder); DHT-less frames (the OpenDML
        # 'AVI1' convention) imply the Annex-K default tables, which
        # ensure_dht splices in before decode.
        from .jpeg import decode_jpeg, ensure_dht

        for raw in movi:
            px = decode_jpeg(ensure_dht(bytes(raw)))
            if px.ndim == 2:
                px = np.stack([px] * 3, axis=-1)
            if px.shape[0] != h or px.shape[1] != w:
                raise ValueError("corrupt AVI: MJPEG frame dims disagree with strf")
            frames.append(px)
        return frames, fps
    if compression != 0:  # BI_RGB/I420/MJPG only; anything else is a codec
        name = fourcc_handler.decode("ascii", "replace").strip() or hex(compression)
        raise NotImplementedError(
            f"compressed AVI ({name}) needs an external codec (ffmpeg/decord) — "
            "uncompressed BI_RGB, I420 and MJPG decode here"
        )
    if bpp not in (24, 32):
        raise NotImplementedError(f"AVI BI_RGB at {bpp} bpp needs PIL/ffmpeg")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # DIB rows pad to 4 bytes
    for raw in movi:
        if len(raw) < stride * h:
            raise ValueError("corrupt AVI: short DIB frame")
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h).reshape(h, stride)
        px = rows[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            px = px[::-1]  # bottom-up storage
        frames.append(px[:, :, 2::-1].copy())  # BGR(X) -> RGB
    return frames, fps


def encode_avi(
    frames: List[np.ndarray],
    fps: int = 25,
    bpp: int = 24,
    codec: str = "raw",
    mjpg_quality: int = 90,
    mjpg_omit_dht: bool = False,
) -> bytes:
    """Minimal AVI writer for deterministic test/oracle synthesis.
    ``codec="raw"``: BI_RGB bottom-up DIB frames at 24/32 bpp —
    lossless, decode_avi(encode_avi(x)) == x. ``codec="mjpg"``: each
    frame a standalone baseline JPEG ('00dc' chunks, strf compression
    'MJPG'); ``mjpg_omit_dht=True`` strips the Huffman tables from
    every frame (the real-world 'AVI1' layout), exercising the
    decoder's Annex-K default-table splice."""
    h, w = frames[0].shape[:2]
    import struct as _s

    def chunk(four: bytes, payload: bytes) -> bytes:
        return four + _s.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    frame_bytes = []
    if codec == "mjpg":
        from .jpeg import default_dht_segments, encode_jpeg

        for fr in frames:
            jb = encode_jpeg(np.asarray(fr, dtype=np.uint8), quality=mjpg_quality)
            if mjpg_omit_dht:
                jb = jb.replace(default_dht_segments(), b"")
            frame_bytes.append(jb)
        nch, stride = 3, w * 3
        compression, handler, tag = 0x47504A4D, b"MJPG", b"00dc"
        buf_size = max(len(fb) for fb in frame_bytes)
        bpp = 24
    elif codec == "raw":
        if bpp not in (24, 32):
            raise ValueError("encode_avi writes 24 or 32 bpp BI_RGB")
        nch = bpp // 8
        stride = (w * nch + 3) & ~3
        for fr in frames:
            px = np.asarray(fr, dtype=np.uint8)
            bgr = px[:, :, 2::-1]
            if nch == 4:
                bgr = np.concatenate([bgr, np.zeros((h, w, 1), np.uint8)], axis=2)
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * nch] = bgr.reshape(h, w * nch)
            frame_bytes.append(rows[::-1].tobytes())  # bottom-up
        compression, handler, tag = 0, b"DIB ", b"00db"
        buf_size = stride * h
    else:
        raise ValueError("encode_avi codec must be raw or mjpg")
    avih = _s.pack(
        "<14I", int(1_000_000 / fps), buf_size * fps, 0, 0x10, len(frames),
        0, 1, buf_size, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + handler + _s.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), buf_size, 0, 0, 0)
    strf = _s.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression, stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b"".join(chunk(tag, fb) for fb in frame_bytes)
    movi = lst(b"movi", movi_payload)
    idx = bytearray()
    off = 4
    for fb in frame_bytes:
        idx += tag + _s.pack("<III", 0x10, off, len(fb))
        off += 8 + len(fb) + (len(fb) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + _s.pack("<I", len(body)) + body


def sample_frames(data: bytes, every_n_ms: int = 1000) -> Iterator[Tuple[int, int, np.ndarray]]:
    """Yield (frame_idx, t_ms, rgb) sampled every ``every_n_ms`` of
    stream time (frame 0 always included). Animated GIFs (r11: real
    LZW decode) ride the same generator shape via gif.sample_frames."""
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import sample_frames as _gif_sample

        yield from _gif_sample(data, every_n_ms)
        return
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        # r17: animated PNG rides the same cadence model as GIF
        from .imaging import decode_apng_frames

        frames, delays = decode_apng_frames(data)
        t = 0
        next_t = 0
        for i, (f, d) in enumerate(zip(frames, delays)):
            if t >= next_t:
                yield i, t, (f if f.ndim == 3 else f[:, :, None])[:, :, :3]
                next_t = t + every_n_ms
            t += max(d, 10)
        return
    frames, fps = decode_y4m(data)
    step = max(1, int(round(every_n_ms * fps / 1000.0)))
    for i in range(0, len(frames), step):
        yield i, int(round(i * 1000.0 / fps)), frames[i]
