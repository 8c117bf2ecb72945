"""Baseline TIFF codec tests (stdlib + numpy). TIFF is lossless —
round trips assert EXACT equality across compressions and byte
orders."""

import struct

import numpy as np
import pytest

from iceberg_python_spark.operators.imaging import decode_image
from iceberg_python_spark.operators.tiff import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
    tiff_page_count,
)


def test_tiff_roundtrips_all_compressions_and_endians():
    rng = np.random.default_rng(31)
    for shape in [(100, 90, 3), (40, 30), (12, 7, 4), (1, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for comp in ("none", "packbits", "lzw"):
            for be in (False, True):
                got = decode_tiff(encode_tiff(img, compression=comp, big_endian=be))
                assert np.array_equal(got, img), (shape, comp, be)


def test_tiff_lzw_early_change_and_dictionary_reset():
    """A strip long enough to march the LZW width through 10/11/12 bits
    and force a dictionary reset must reconstruct exactly (the TIFF
    'early change' off-by-one is the classic interop bug)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 512, 3), dtype=np.uint8)  # ~98 KB strips
    assert np.array_equal(decode_tiff(encode_tiff(img, compression="lzw")), img)


def test_tiff_compression_actually_compresses():
    flat = np.tile(np.arange(90, dtype=np.uint8), (60, 3)).reshape(60, 90, 3)
    n, pb, lz = (len(encode_tiff(flat, compression=c)) for c in ("none", "packbits", "lzw"))
    assert lz < 0.3 * n
    assert np.array_equal(decode_tiff(encode_tiff(flat, compression="lzw")), flat)


def test_tiff_packbits_spec_cases():
    # literal run, repeat run, and the 128 no-op byte
    assert _packbits_decode(_packbits_encode(b"aaaa"), 4) == b"aaaa"
    assert _packbits_decode(_packbits_encode(b"abcd"), 4) == b"abcd"
    assert _packbits_decode(b"\x80" + _packbits_encode(b"xy"), 2) == b"xy"  # leading no-op
    long = bytes(range(256)) * 3 + b"z" * 300
    assert _packbits_decode(_packbits_encode(long), len(long)) == long


def test_tiff_bilevel_and_palette_foreign_layouts():
    """Hand-built 1-bit (WhiteIsZero) and palette TIFFs — layouts our
    encoder never writes but scanned-document corpora do."""
    # 1-bit 10x2, photometric 0 (white-is-zero), packed rows
    rows = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 1],
                     [0, 1, 1, 1, 0, 0, 0, 1, 0, 1]], dtype=np.uint8)
    packed = np.packbits(rows, axis=1).tobytes()
    ifd = [
        (256, 4, [10]), (257, 4, [2]), (258, 3, [1]), (259, 3, [1]),
        (262, 3, [0]), (273, 4, [0]), (277, 3, [1]), (278, 4, [2]), (279, 4, [len(packed)]),
    ]
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    out += struct.pack("<H", len(ifd))
    strip_off = 8 + 2 + 12 * len(ifd) + 4
    for tag, typ, vals in ifd:
        if tag == 273:
            vals = [strip_off]
        code = "H" if typ == 3 else "I"
        raw = struct.pack("<" + code * len(vals), *vals)
        out += struct.pack("<HHI", tag, typ, len(vals)) + raw + b"\x00" * (4 - len(raw))
    out += struct.pack("<I", 0)
    out += packed
    got = decode_tiff(bytes(out))
    assert got.shape == (2, 10)
    # WhiteIsZero: bit 1 -> 255 inverted -> 0
    assert np.array_equal(got, np.where(rows == 1, 0, 255).astype(np.uint8))


def test_tiff_gates_and_dispatch():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_tiff(img)), img)
    g = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    assert decode_image(encode_tiff(g)).shape == (5, 4, 1)  # dispatch normalizes
    with pytest.raises(ValueError, match="TIFF"):
        decode_tiff(b"XX\x00\x00")
    # unsupported compression gates loudly
    enc = bytearray(encode_tiff(img))
    # tag 259 (compression) value patch: find it in the IFD
    n = struct.unpack_from("<H", enc, 8)[0]
    for i in range(n):
        tag = struct.unpack_from("<H", enc, 10 + 12 * i)[0]
        if tag == 259:
            comp_at = 10 + 12 * i + 8
            struct.pack_into("<H", enc, comp_at, 6)  # old-style JPEG
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_tiff(bytes(enc))
    # new-style JPEG (comp 7) decodes since r16 — so NON-JPEG strip
    # bytes under comp 7 are malformed structure, not a gate
    struct.pack_into("<H", enc, comp_at, 7)
    with pytest.raises(ValueError, match="SOI"):
        decode_tiff(bytes(enc))


def test_tiff_spark_extract_image_stats(spark):
    from iceberg_python_spark.operators.multimodal import extract_image_stats

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (14, 11, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_tiff(img, compression="lzw"))),
        (2, bytearray(encode_tiff(img, compression="packbits", big_endian=True))),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r.id: r for r in extract_image_stats(df, "doc_id", "payload").collect()}
    assert out[1].decode_ok and (out[1].height, out[1].width) == (14, 11)
    assert out[1].phash == out[2].phash  # lossless across compressions/endians


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 32), st.integers(1, 32), st.sampled_from([1, 3, 4]),
       st.sampled_from(["none", "packbits", "lzw"]), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_tiff_roundtrip_property(h, w, ch, comp, seed):
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(img, compression=comp)), img)


def _build_tiff(ifd, payload, fmt="<"):
    """Hand-assemble a single-IFD TIFF; tag 273 is patched to the
    strip offset computed from the IFD size."""
    out = bytearray(struct.pack(fmt + "2sHI", b"II" if fmt == "<" else b"MM", 42, 8))
    out += struct.pack(fmt + "H", len(ifd))
    strip_off = 8 + 2 + 12 * len(ifd) + 4
    for tag, typ, vals in ifd:
        if tag == 273:
            vals = [strip_off]
        code = "H" if typ == 3 else "I"
        raw = struct.pack(fmt + code * len(vals), *vals)
        out += struct.pack(fmt + "HHI", tag, typ, len(vals)) + raw + b"\x00" * (4 - len(raw))
    out += struct.pack(fmt + "I", 0)
    out += payload
    return bytes(out)


def test_tiff_16bit_white_is_zero_inverts():
    """ADVICE r11: 16-bit MinIsWhite grayscale must invert like the
    1-bit and 8-bit branches do."""
    vals = np.array([[0, 65535, 32768], [16384, 49152, 257]], dtype="<u2")
    ifd = [
        (256, 4, [3]), (257, 4, [2]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [0]), (273, 4, [0]), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [vals.nbytes]),
    ]
    got = decode_tiff(_build_tiff(ifd, vals.tobytes()))
    scaled = ((vals.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(got, 255 - scaled)
    # and photometric 1 (MinIsBlack) stays uninverted
    ifd[4] = (262, 3, [1])
    assert np.array_equal(decode_tiff(_build_tiff(ifd, vals.tobytes())), scaled)


def test_tiff_planar_and_predictor_roundtrips():
    """r12: PlanarConfiguration=2 (one sample plane per strip run) and
    horizontal differencing (predictor tag 317=2 — scanner LZW files)
    decode for real (ADVICE r11 asked for a loud gate; support closed
    it instead); exact equality, and predictor+LZW actually compresses
    smooth gradients better than LZW alone."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    for kw in (
        {"planar": True},
        {"predictor": True},
        {"planar": True, "predictor": True, "compression": "lzw"},
        {"predictor": True, "compression": "packbits", "big_endian": True},
    ):
        assert np.array_equal(decode_tiff(encode_tiff(img, **kw)), img), kw
    grad = np.tile(np.arange(256, dtype=np.uint8), (24, 1))
    assert len(encode_tiff(grad, compression="lzw", predictor=True)) < len(
        encode_tiff(grad, compression="lzw")
    )
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(gray, predictor=True)), gray)


def test_tiff_predictor_16bit_hand_built():
    """Foreign 16-bit predictor-2 grayscale: per-row cumsum in the
    16-bit domain BEFORE scaling to 8."""
    vals = np.array([[1000, 2000, 65000], [500, 500, 500]], dtype=np.uint32)
    diffs = np.concatenate([vals[:, :1], np.diff(vals.astype(np.int64), axis=1) & 0xFFFF], axis=1)
    payload = diffs.astype("<u2").tobytes()
    ifd = [
        (256, 4, [3]), (257, 4, [2]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [len(payload)]), (317, 3, [2]),
    ]
    got = decode_tiff(_build_tiff(ifd, payload))
    want = ((vals * 255 + 32767) // 65535).astype(np.uint8)
    assert np.array_equal(got, want)


def test_tiff_remaining_gates():
    """1-bit predictor layouts still gate loudly."""
    rows = np.packbits(np.ones((2, 8), dtype=np.uint8), axis=1).tobytes()
    base = [
        (256, 4, [8]), (257, 4, [2]), (258, 3, [1]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, [0]), (277, 3, [1]), (278, 4, [2]), (279, 4, [2]),
    ]
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_tiff(_build_tiff(base + [(317, 3, [2])], rows))


# ---- tiled layout + new-style JPEG-in-TIFF (r16: gates -> real decodes) ----


def test_tiff_tiled_roundtrips_all_combinations():
    rng = np.random.default_rng(3)
    for shape in [(20, 20), (37, 53), (64, 48, 3), (33, 47, 4)]:
        for comp in ["none", "packbits", "lzw"]:
            for pred in [False, True]:
                for planar in [False, True]:
                    img = rng.integers(0, 256, shape, dtype=np.uint8)
                    t = encode_tiff(
                        img, compression=comp, predictor=pred, planar=planar,
                        tiled=True, tile_size=(16, 32),
                    )
                    assert np.array_equal(decode_tiff(t), img), (shape, comp, pred, planar)


def test_tiff_tiled_big_endian_and_nonsquare_tiles():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    for ts in [(16, 16), (48, 16), (16, 64)]:
        t = encode_tiff(img, big_endian=True, tiled=True, tile_size=ts, compression="lzw")
        assert np.array_equal(decode_tiff(t), img)


def test_tiff_tiled_malformed_raises_valueerror():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    enc = bytearray(encode_tiff(img, tiled=True, tile_size=(16, 16)))
    # drop a tile from TileByteCounts/TileOffsets by shrinking counts:
    # patch tag 325's count field to 1 (grid needs 4)
    n = struct.unpack_from("<H", enc, 8)[0]
    for i in range(n):
        tag = struct.unpack_from("<H", enc, 10 + 12 * i)[0]
        if tag in (324, 325):
            struct.pack_into("<I", enc, 10 + 12 * i + 4, 1)
    with pytest.raises(ValueError, match="tile count"):
        decode_tiff(bytes(enc))
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff(img, tiled=True, tile_size=(10, 16))


def test_tiff_jpeg_in_tiff_strips_tiles_and_shared_tables():
    yy, xx = np.mgrid[0:80, 0:100]
    gray = np.clip(yy + xx, 0, 255).astype(np.uint8)
    rgb = np.stack(
        [np.clip(xx, 0, 255), np.clip(yy * 2, 0, 255), np.clip(255 - xx, 0, 255)], axis=2
    ).astype(np.uint8)
    for img in (gray, rgb):
        for tiled in (False, True):
            for jt in (False, True):
                t = encode_tiff(
                    img, compression="jpeg", tiled=tiled, tile_size=(32, 16),
                    jpeg_tables=jt, jpeg_quality=95,
                )
                dec = decode_tiff(t)
                assert dec.shape == img.shape
                assert np.abs(dec.astype(float) - img.astype(float)).max() <= 12
    # factoring shared tables must actually shrink the file
    big = encode_tiff(rgb, compression="jpeg", tiled=True, tile_size=(16, 16))
    small = encode_tiff(rgb, compression="jpeg", tiled=True, tile_size=(16, 16), jpeg_tables=True)
    assert len(small) < len(big) * 0.5


def test_tiff_jpeg_in_tiff_malformed_tables_raise():
    img = np.zeros((16, 16), dtype=np.uint8)
    enc = bytearray(encode_tiff(img, compression="jpeg", tiled=True, jpeg_tables=True))
    # corrupt the JPEGTables blob's SOI
    pos = bytes(enc).find(b"\xff\xd8", 8)
    enc[pos] = 0x00
    with pytest.raises(ValueError):
        decode_tiff(bytes(enc))


def test_tiff_deflate_roundtrips_and_legacy_code():
    """Compression 8 (Adobe deflate) and the legacy 32946 code decode
    via zlib (the PNG precedent); strip and tile layouts, predictor,
    both endians — all exact."""
    rng = np.random.default_rng(6)
    for shape in [(37, 53), (64, 48, 3), (33, 47, 4)]:
        for tiled in (False, True):
            for pred in (False, True):
                img = rng.integers(0, 256, shape, dtype=np.uint8)
                t = encode_tiff(
                    img, compression="deflate", tiled=tiled, predictor=pred,
                    big_endian=tiled, tile_size=(16, 16),
                )
                assert np.array_equal(decode_tiff(t), img), (shape, tiled, pred)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    enc = bytearray(encode_tiff(img, compression="deflate"))
    n = struct.unpack_from("<H", enc, 8)[0]
    for i in range(n):
        if struct.unpack_from("<H", enc, 10 + 12 * i)[0] == 259:
            struct.pack_into("<H", enc, 10 + 12 * i + 8, 32946)  # legacy code
    assert np.array_equal(decode_tiff(bytes(enc)), img)
    # deflate actually compresses a flat image
    flat = np.full((60, 90, 3), 7, np.uint8)
    assert len(encode_tiff(flat, compression="deflate")) < 0.1 * len(encode_tiff(flat))
    # corrupt deflate stream: ValueError, not zlib.error
    bad = bytearray(encode_tiff(img, compression="deflate"))
    bad[-10:] = b"\x00" * 10
    with pytest.raises(ValueError, match="deflate"):
        decode_tiff(bytes(bad))
