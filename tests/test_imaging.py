"""Stdlib+numpy image codec tests (no Spark): PNG round-trips across
color types, decode of externally-filtered PNGs (Sub/Up/Average/Paeth),
palette PNGs, PPM/BMP, stats, and pHash behavior."""

import struct
import zlib

import numpy as np
import pytest

from iceberg_python_spark.operators.imaging import (
    decode_image,
    encode_png,
    encode_ppm,
    hamming,
    image_stats,
    phash,
)


def _chunk(t, p):
    return struct.pack(">I", len(p)) + t + p + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)


SIG = b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize("shape", [(37, 53, 3), (10, 20, 1), (8, 8, 4), (5, 3, 2)])
def test_png_roundtrip(shape):
    px = np.random.default_rng(42).integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(px)), px)


def test_ppm_roundtrip_and_comment_header():
    px = np.random.default_rng(1).integers(0, 256, (6, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(px)), px)
    with_comment = b"P6\n# a comment\n4 6\n255\n" + px.tobytes()
    assert np.array_equal(decode_image(with_comment), px)


def test_png_all_filters_decode():
    """Scanlines filtered with Sub/Up/Average/Paeth (encoded by an
    independent reference filterer here) reconstruct exactly."""
    rng = np.random.default_rng(3)
    h, w, ch = 4, 5, 3
    raw = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)

    def filt_row(y, ftype):
        row = raw[y].reshape(-1).astype(int)
        prev = raw[y - 1].reshape(-1).astype(int) if y > 0 else np.zeros(w * ch, int)
        out = np.zeros(w * ch, int)
        for x in range(w * ch):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                out[x] = row[x]
            elif ftype == 1:
                out[x] = (row[x] - a) % 256
            elif ftype == 2:
                out[x] = (row[x] - b) % 256
            elif ftype == 3:
                out[x] = (row[x] - (a + b) // 2) % 256
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (row[x] - pr) % 256
        return bytes([ftype]) + bytes(out.astype(np.uint8))

    scan = b"".join(filt_row(y, ft) for y, ft in zip(range(h), [1, 2, 3, 4]))
    png = (
        SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(png), raw)


def test_palette_png():
    rng = np.random.default_rng(5)
    plte = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (6, 7, 1), dtype=np.uint8)
    scan = b"".join(bytes([0]) + bytes(idx[y].reshape(-1)) for y in range(6))
    png = (
        SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(png), plte[idx[:, :, 0]])


def _encode_bmp(px):
    h, w = px.shape[:2]
    rb = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):
        row = px[y][:, [2, 1, 0]].tobytes()
        body += row + b"\x00" * (rb - len(row))
    off = 54
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + body


def test_bmp_decode():
    px = np.random.default_rng(9).integers(0, 256, (11, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_encode_bmp(px)), px)


def test_stats_and_phash_properties():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    h, w, ch, means, stds = image_stats(px)
    assert (h, w, ch) == (37, 53, 3)
    assert abs(means[2] - px[:, :, 2].mean()) < 1e-9 and abs(stds[0] - px[:, :, 0].std()) < 1e-9
    p1 = phash(px)
    assert p1 == phash(px.copy()) and len(p1) == 16
    # one-pixel nudge: tiny hamming distance; unrelated image: large
    noisy = px.copy()
    noisy[0, 0, 0] = (int(noisy[0, 0, 0]) + 8) % 256
    other = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    assert hamming(p1, phash(noisy)) <= 6
    assert hamming(p1, phash(other)) > 10


def test_unsupported_formats_raise_naming_pil():
    # JPEG now DECODES (jpeg.py, r11) — a corrupt stream is a
    # ValueError, while the still-gated GIF keeps naming PIL
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_image(b"\xff\xd8\xff\xe0\x00\x04xx jpeg-ish-but-broken")
    with pytest.raises(ValueError):  # GIF decodes since r11; garbage = corrupt
        decode_image(b"GIF89a rest-of-gif")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(NotImplementedError, match="PIL"):
        # sub-byte PNG depths stay gated (16-bit + Adam7 decode since r11)
        png = (
            SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 6))
            + _chunk(b"IEND", b"")
        )
        decode_image(png)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.integers(1, 40), st.integers(1, 40), st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**31 - 1)
)
@settings(max_examples=25, deadline=None)
def test_png_roundtrip_property(h, w, ch, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(px)), px)


def _png_file(width, height, depth, ctype, interlace, raw_bytes):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, interlace)
    return (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw_bytes))
        + _chunk(b"IEND", b"")
    )


def test_png_16bit_decodes_with_exact_scaling():
    """r11: 16-bit PNGs decode (big-endian samples, byte-wise filters)
    and scale to 8 bits exactly as round(v * 255 / 65535)."""
    rng = np.random.default_rng(2)
    img16 = rng.integers(0, 65536, (5, 7, 3), dtype=np.uint16)
    raw = b"".join(b"\x00" + img16[y].astype(">u2").tobytes() for y in range(5))
    px = decode_image(_png_file(7, 5, 16, 2, 0, raw))
    want = ((img16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(px, want)
    # boundary samples: 0 -> 0, 65535 -> 255, 32768 -> 128
    flat = np.array([[[0, 32768, 65535]]], dtype=np.uint16)
    raw = b"\x00" + flat[0].astype(">u2").tobytes()
    assert decode_image(_png_file(1, 1, 16, 2, 0, raw)).tolist() == [[[0, 128, 255]]]


def test_png_adam7_interlaced_matches_plain():
    """r11: Adam7 interlaced PNGs reassemble to exactly the plain-scan
    pixels (seven independently filtered sub-images scattered back)."""
    from iceberg_python_spark.operators.imaging import _ADAM7

    rng = np.random.default_rng(4)
    for h, w, ch, ct in [(13, 11, 3, 2), (8, 8, 1, 0), (3, 2, 4, 6), (1, 9, 3, 2)]:
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        passes = []
        for x0, xs, y0, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            passes.append(b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])))
        enc = _png_file(w, h, 8, ct, 1, b"".join(passes))
        got = decode_image(enc)
        assert np.array_equal(got, img), (h, w, ch)
    # 16-bit + Adam7 compose
    img16 = rng.integers(0, 65536, (6, 5, 1), dtype=np.uint16)
    passes = []
    for x0, xs, y0, ys in _ADAM7:
        sub = img16[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        passes.append(b"".join(b"\x00" + sub[y].astype(">u2").tobytes() for y in range(sub.shape[0])))
    got = decode_image(_png_file(5, 6, 16, 0, 1, b"".join(passes)))
    want = ((img16.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(got, want)
