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
        # sub-byte TRUECOLOR is not a PNG layout and stays gated
        # (1/2/4-bit gray/palette decode since r12)
        png = (
            SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0))
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


def _png_chunk(t, b):
    import struct
    import zlib

    return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))


def _build_png(w, h, depth, ctype, rows_packed, plte=None):
    import struct
    import zlib

    out = b"\x89PNG\r\n\x1a\n"
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0))
    if plte is not None:
        out += _png_chunk(b"PLTE", plte.tobytes())
    out += _png_chunk(b"IDAT", zlib.compress(b"".join(b"\x00" + r for r in rows_packed)))
    out += _png_chunk(b"IEND", b"")
    return out


def _pack_row(row, d):
    bits = ((row[:, None] >> np.arange(d - 1, -1, -1)) & 1).astype(np.uint8).reshape(-1)
    return np.packbits(bits).tobytes()


def test_png_sub_byte_depths():
    """1/2/4-bit gray and palette PNGs (hand-built foreign layouts —
    icons and scanned documents): MSB-first packing, byte-unit
    filtering, exact 255/(2^d-1) gray scaling."""
    rows = np.array(
        [[1, 0, 1, 0, 1, 0, 1, 0, 1, 1], [0, 1, 1, 1, 0, 0, 0, 1, 0, 1],
         [1, 1, 1, 1, 1, 0, 0, 0, 0, 0]], dtype=np.uint8)
    px = decode_image(_build_png(10, 3, 1, 0, [np.packbits(r).tobytes() for r in rows]))
    assert px.shape == (3, 10, 1) and np.array_equal(px[:, :, 0], rows * 255)
    vals = np.array([[0, 1, 2, 3, 3], [3, 2, 1, 0, 1]], dtype=np.uint8)
    px = decode_image(_build_png(5, 2, 2, 0, [_pack_row(r, 2) for r in vals]))
    assert np.array_equal(px[:, :, 0], vals.astype(np.uint16) * 255 // 3)
    g4 = np.array([[0, 15, 8, 4, 2, 1, 11], [7, 3, 12, 15, 0, 5, 9]], dtype=np.uint8)
    px = decode_image(_build_png(7, 2, 4, 0, [_pack_row(r, 4) for r in g4]))
    assert np.array_equal(px[:, :, 0], g4.astype(np.uint16) * 255 // 15)
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = np.array([[0, 5, 15, 7, 3], [9, 9, 1, 14, 2]], dtype=np.uint8)
    px = decode_image(_build_png(5, 2, 4, 3, [_pack_row(r, 4) for r in idx], plte=pal))
    assert px.shape == (2, 5, 3) and np.array_equal(px, pal[idx])
    # sub-byte RGB stays honestly gated (not a PNG layout)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_image(_build_png(4, 1, 4, 2, [b"\x00\x00"]))


def _build_bmp(width, height, bpp, compression, pal, body):
    hdr_size = 40
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    offset = 14 + hdr_size + len(pal_bytes)
    info = struct.pack("<IiiHHIIiiII", hdr_size, width, height, 1, bpp, compression,
                       len(body), 2835, 2835, len(pal), 0)
    return struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset) + info + pal_bytes + body


def test_bmp_palette_and_rle():
    """r12: palette BMPs (1/4/8-bit) and RLE8/RLE4 compression —
    legacy-corpus layouts; encoded runs, absolute word-padded runs,
    EOL/EOF escapes, bottom-up order, row padding."""
    pal = [(250, 10, 10), (10, 250, 10), (10, 10, 250), (200, 200, 0)]
    body = bytes([3, 0, 4, 1, 0, 0,  # bottom row: 3x idx0, 4x idx1, EOL
                  0, 3, 2, 3, 0, 0,  # absolute run [2,3,0] (word-padded)
                  4, 3, 0, 1])       # 4x idx3, EOF
    px = decode_image(_build_bmp(7, 2, 8, 1, pal, body))
    assert px.shape == (2, 7, 3)
    assert [tuple(p) for p in px[1]] == [pal[0]] * 3 + [pal[1]] * 4
    assert [tuple(p) for p in px[0]] == [pal[2], pal[3], pal[0]] + [pal[3]] * 4
    # RLE4: run of 5 alternates the value's two nibbles
    px = decode_image(_build_bmp(6, 1, 4, 2, pal, bytes([5, 0x12, 1, 0x30, 0, 1])))
    assert [tuple(p) for p in px[0]] == [pal[1], pal[2], pal[1], pal[2], pal[1], pal[3]]
    # uncompressed 8-bit palette with 4-byte row padding, bottom-up
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], dtype=np.uint8)
    rows = b"".join(bytes(r) + b"\x00" * 3 for r in idx[::-1])
    px = decode_image(_build_bmp(5, 2, 8, 0, pal, rows))
    assert np.array_equal(px, np.array(pal, dtype=np.uint8)[idx])
    # uncompressed 1-bit, MSB-first packing
    bits = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1], [0, 1, 0, 0, 1, 1, 0, 1, 0]], dtype=np.uint8)
    rows1 = b"".join(np.packbits(r).tobytes() + b"\x00" * 2 for r in bits[::-1])
    px = decode_image(_build_bmp(9, 2, 1, 0, pal[:2], rows1))
    assert np.array_equal(px, np.array(pal[:2], dtype=np.uint8)[bits])
    # bitfields (compression 3) stays gated
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(_build_bmp(2, 1, 16, 3, [], b"\x00" * 8))


def test_apng_roundtrip_blend_dispose_and_sampling():
    """r17: APNG (acTL/fcTL/fdAT) — full-canvas roundtrip, RGBA
    over-blend on a sub-region, dispose-to-background, cadence
    sampling via video.sample_frames, and the probe's frame count."""
    import struct
    import zlib

    from iceberg_python_spark.operators.imaging import (
        _PNG_SIG,
        _png_chunk,
        decode_apng_frames,
        decode_image,
        encode_apng,
    )
    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.video import sample_frames

    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, (12, 17, 3), dtype=np.uint8) for _ in range(4)]
    data = encode_apng(frames, [40, 60, 80, 100])
    assert encode_apng(frames, [40, 60, 80, 100]) == data
    out, delays = decode_apng_frames(data)
    assert delays == [40, 60, 80, 100]
    assert all((a == b).all() for a, b in zip(out, frames))
    assert (decode_image(data) == frames[0]).all()  # still path = default image
    pr = probe_media(data)
    assert pr["decodable"] is True and pr["n_frames"] == 4
    assert "n_frames" not in probe_media(
        __import__("iceberg_python_spark.operators.imaging", fromlist=["encode_png"]).encode_png(frames[0])
    )
    sampled = list(sample_frames(data, every_n_ms=100))
    assert [i for i, _, _ in sampled] == [0, 2]  # 0ms and 100ms marks

    def scanb(px):
        h, w, c = px.shape
        rows = np.concatenate([np.zeros((h, 1), np.uint8), px.reshape(h, w * c)], axis=1)
        return zlib.compress(rows.tobytes(), 6)

    f0 = np.zeros((6, 8, 4), np.uint8)
    f0[:, :, 0] = 200
    f0[:, :, 3] = 255
    sub = np.zeros((2, 3, 4), np.uint8)
    sub[:, :, 1] = 100
    sub[:, :, 3] = 128
    d = bytearray(_PNG_SIG)
    d += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 6, 8, 6, 0, 0, 0))
    d += _png_chunk(b"acTL", struct.pack(">II", 3, 0))
    d += _png_chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 8, 6, 0, 0, 50, 1000, 0, 0))
    d += _png_chunk(b"IDAT", scanb(f0))
    d += _png_chunk(b"fcTL", struct.pack(">IIIIIHHBB", 1, 3, 2, 2, 1, 50, 1000, 1, 1))
    d += _png_chunk(b"fdAT", struct.pack(">I", 2) + scanb(sub))
    d += _png_chunk(b"fcTL", struct.pack(">IIIIIHHBB", 3, 1, 1, 0, 0, 50, 1000, 0, 0))
    d += _png_chunk(b"fdAT", struct.pack(">I", 4) + scanb(np.full((1, 1, 4), 9, np.uint8)))
    d += _png_chunk(b"IEND", b"")
    fr, _dl = decode_apng_frames(bytes(d))
    px = fr[1][1, 2]
    assert abs(int(px[0]) - 100) <= 1 and abs(int(px[1]) - 50) <= 1
    # dispose 1 cleared the sub-region before frame 3 composited
    assert (fr[2][1, 2] == 0).all() and (fr[2][0, 0] == 9).all()
    # sequence-number violation raises
    bad = bytes(d).replace(struct.pack(">IIIIIHHBB", 3, 1, 1, 0, 0, 50, 1000, 0, 0),
                           struct.pack(">IIIIIHHBB", 9, 1, 1, 0, 0, 50, 1000, 0, 0))
    with pytest.raises(ValueError, match="sequence"):
        decode_apng_frames(bad)
    # a plain PNG is not an APNG
    with pytest.raises(ValueError, match="acTL"):
        decode_apng_frames(
            __import__("iceberg_python_spark.operators.imaging", fromlist=["encode_png"]).encode_png(frames[0])
        )
