"""Stdlib + numpy video codec: Y4M (YUV4MPEG2) frame decode/sampling —
the video third of the multimodal pillar, real for the one container a
stdlib-only environment can honestly parse (uncompressed YUV planes
behind a text header; the interchange format ffmpeg/x264 pipelines
use). MP4/WebM/AVI need real codecs and raise naming them; inside
:func:`~.multimodal.extract_video_frames` that surfaces per row as
``decode_ok=false``.

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
        raise NotImplementedError("AVI decode needs an external codec (ffmpeg/decord)")
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


def sample_frames(data: bytes, every_n_ms: int = 1000) -> Iterator[Tuple[int, int, np.ndarray]]:
    """Yield (frame_idx, t_ms, rgb) sampled every ``every_n_ms`` of
    stream time (frame 0 always included). Animated GIFs (r11: real
    LZW decode) ride the same generator shape via gif.sample_frames."""
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import sample_frames as _gif_sample

        yield from _gif_sample(data, every_n_ms)
        return
    frames, fps = decode_y4m(data)
    step = max(1, int(round(every_n_ms * fps / 1000.0)))
    for i in range(0, len(frames), step):
        yield i, int(round(i * 1000.0 / fps)), frames[i]
