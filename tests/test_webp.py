"""WebP-lossless (VP8L) codec tests (stdlib + numpy; Spark only for
the mapInPandas integration check). VP8L is lossless, so round trips
assert EXACT equality — no tolerance anywhere."""

import numpy as np
import pytest

from iceberg_python_spark.operators.imaging import decode_image
from iceberg_python_spark.operators.webp import (
    _LsbWriter,
    _write_flat_code,
    _write_green_rle_code,
    _write_single_code,
    decode_webp,
    encode_webp,
)


def _img(h, w, ch=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)


def test_webp_literal_roundtrip_and_alpha():
    img = _img(13, 17)
    assert np.array_equal(decode_webp(encode_webp(img)), img)
    rgba = _img(9, 7, ch=4, seed=3)
    got = decode_webp(encode_webp(rgba))
    assert got.shape == (9, 7, 4) and np.array_equal(got, rgba)


def test_webp_transforms_roundtrip_exact():
    """Each encoder transform (and their composition) exercises its
    inverse in the decoder: subtract-green, left-predictor tiles,
    cross-color with signed 3.5-fixed-point coefficients."""
    img = _img(21, 15, seed=5)
    for kw in (
        {"subtract_green": True},
        {"predict_left": True},
        {"cross_color": True},
        {"predict_left": True, "cross_color": True, "subtract_green": True},
    ):
        assert np.array_equal(decode_webp(encode_webp(img, **kw)), img), kw


def test_webp_palette_all_bundling_levels():
    """Color-indexing with sub-byte bundling IMPLIED by palette size:
    <=2 colors pack 8 px/byte, <=4 pack 4, <=16 pack 2."""
    rng = np.random.default_rng(11)
    for nc in (2, 4, 16, 30, 200):
        pal = rng.integers(0, 256, (nc, 3), dtype=np.uint8)
        img = pal[rng.integers(0, nc, (11, 13))]
        assert np.array_equal(decode_webp(encode_webp(img, palette=True)), img), nc


def test_webp_lz77_backrefs():
    """RLE mode emits length-1 backrefs at 2D distance (1,0) through a
    mixed-length green code (256 literals @9 bits + backref @1 bit) —
    the decoder's LZ77 path with the short-distance map."""
    flat = np.tile(np.array([[10, 20, 30]], dtype=np.uint8), (40, 40, 1))
    enc = encode_webp(flat, rle=True)
    assert len(enc) < 0.1 * len(encode_webp(flat))  # repeats actually compress
    assert np.array_equal(decode_webp(enc), flat)
    img = _img(8, 31, seed=7)
    img[:, 10:20] = img[:, 9:10]  # horizontal runs
    assert np.array_equal(decode_webp(encode_webp(img, rle=True)), img)


def test_webp_color_cache_hand_built():
    """Hand-built VP8L stream with a 1-bit color cache: a black literal
    (argb 0 hashes to slot 0) followed by a cache reference must decode
    to two identical pixels."""
    import struct

    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(2 - 1, 14)  # width 2
    bw.write(1 - 1, 14)  # height 1
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(1, 4)  # cache_bits = 1 -> green alphabet 256+24+2
    bw.write(0, 1)  # no meta-huffman
    # green: 256 literals @9 bits + cache symbol 280 @1 bit (complete)
    bw.write(0, 1)  # not simple
    from iceberg_python_spark.operators.webp import _CLC_ORDER

    order_pos = {s: i for i, s in enumerate(_CLC_ORDER)}
    n_codes = max(order_pos[1], order_pos[9], order_pos[16], order_pos[17], order_pos[18]) + 1
    clc_len = {16: 2, 1: 2, 9: 2, 18: 2}
    bw.write(n_codes - 4, 4)
    for i in range(n_codes):
        bw.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max-symbol limit (we cover all 282 entries)
    # canonical clc: (2,1)->00, (2,9)->01, (2,16)->10, (2,18)->11
    bw.write_code(0b01, 2)  # '9' once
    left = 255
    while left > 0:  # repeat '9' via 16-codes
        rep = min(6, left)
        bw.write_code(0b10, 2)
        bw.write(rep - 3, 2)
        left -= rep
    bw.write_code(0b11, 2)  # 18: run of zeros (symbols 256..279)
    bw.write(24 - 11, 7)
    bw.write_code(0b00, 2)  # '1' for cache symbol 280
    bw.write_code(0b11, 2)  # 18 again: remaining entry 281 -> zero run 11
    bw.write(0, 7)
    for _ in range(3):  # red, blue, alpha: flat 8-bit
        _write_flat_code(bw, 256)
    _write_single_code(bw, 0)  # distance, unused
    # pixel 1: literal (0,0,0,0) -> argb 0 -> cache slot 0
    bw.write_code(256 + 0, 9)
    bw.write_code(0, 8)
    bw.write_code(0, 8)
    bw.write_code(0, 8)
    # pixel 2: cache symbol 280 -> code 0 (1 bit)
    bw.write_code(0, 1)
    body = bw.bytes()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        riff += b"\x00"
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    got = decode_webp(data)
    assert got.shape == (1, 2, 3) and (got == 0).all()


def test_webp_dispatch_and_gates():
    img = _img(6, 6, seed=2)
    px = decode_image(encode_webp(img))
    assert np.array_equal(px, img)
    with pytest.raises(NotImplementedError, match="VP8L"):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")
    # VP8X decodes since r16, so an EMPTY VP8X header is malformed
    # structure (ValueError), not a gate
    with pytest.raises(ValueError, match="VP8X"):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBPVP8X\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="WEBP"):
        decode_webp(b"RIFX nope")


def test_webp_spark_extract_image_stats(spark):
    from iceberg_python_spark.operators.multimodal import extract_image_stats

    img = _img(12, 15, seed=9)
    rows = [
        (1, bytearray(encode_webp(img))),
        (2, bytearray(encode_webp(img, subtract_green=True))),  # same pixels
        (3, bytearray(b"RIFF\x08\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")),  # lossy: gated
    ]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r.id: r for r in extract_image_stats(df, "doc_id", "payload").collect()}
    assert out[1].decode_ok and (out[1].height, out[1].width, out[1].channels) == (12, 15, 3)
    assert out[2].phash == out[1].phash  # lossless: identical pixels, identical hash
    assert not out[3].decode_ok and "PIL" in out[3].error


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 24), st.integers(1, 24), st.sampled_from([3, 4]),
       st.sampled_from(["plain", "sg", "pred", "cc", "rle"]), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_webp_roundtrip_property(h, w, ch, mode, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    kw = {"sg": {"subtract_green": True}, "pred": {"predict_left": True},
          "cc": {"cross_color": True}, "rle": {"rle": True}}.get(mode, {})
    assert np.array_equal(decode_webp(encode_webp(img, **kw)), img)


def test_webp_meta_huffman_hand_built():
    """Hand-built VP8L stream with a meta-Huffman image: an 8x1 image
    under tile_bits=2 has two 4-pixel tiles pointing at two different
    Huffman groups; pixels must route through the right group."""
    import struct

    from iceberg_python_spark.operators.webp import _write_argb_literals

    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(8 - 1, 14)
    bw.write(1 - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-huffman present
    bw.write(0, 3)  # tile_bits = 2 -> 4-px tiles -> meta image 2x1
    # meta image (allow_meta=False): pixels' (R<<8)|G = group index
    meta_px = np.array([[255, 0, 0, 0], [255, 0, 1, 0]], dtype=np.uint8)  # groups 0, 1
    _write_argb_literals(bw, meta_px)
    for _ in range(2):  # two identical flat literal groups
        _write_flat_code(bw, 256 + 24)
        _write_flat_code(bw, 256)
        _write_flat_code(bw, 256)
        _write_flat_code(bw, 256)
        _write_single_code(bw, 0)
    want = np.arange(8 * 3, dtype=np.uint8).reshape(1, 8, 3)
    for x in range(8):
        r, g, b = (int(v) for v in want[0, x])
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(255, 8)
    body = bw.bytes()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        riff += b"\x00"
    got = decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert np.array_equal(got, want)


def test_webp_all_predictor_modes_roundtrip():
    """Foreign-encoder emulation (ADVICE r11): every predictor mode
    0..13 through an INDEPENDENT scalar forward predictor — exact
    decode pins the inverse's edge rules, in particular TR on the
    rightmost column resolving to the CURRENT row's first pixel and
    mode 13's truncate-toward-zero half-delta."""
    img = _img(19, 13, seed=21)
    for mode in range(14):
        assert np.array_equal(decode_webp(encode_webp(img, predict_mode=mode)), img), mode
    rgba = _img(7, 5, ch=4, seed=3)
    for mode in (3, 12, 13):
        assert np.array_equal(decode_webp(encode_webp(rgba, predict_mode=mode)), rgba), mode


def test_webp_predictor_last_column_tr_rule():
    """2-px-wide images hit the last-column TR rule on every row for
    the TR-using modes (3/5/9/10); mode 13 gets odd negative deltas."""
    narrow = _img(9, 2, seed=5)
    for mode in (3, 5, 9, 10, 13):
        assert np.array_equal(decode_webp(encode_webp(narrow, predict_mode=mode)), narrow), mode


# ---- VP8X extended container (r16: gate -> real decode) ----


def test_webp_vp8x_still_and_metadata_chunks():
    from iceberg_python_spark.operators.webp import decode_webp_frames, encode_webp_extended

    img = _img(12, 18, seed=7)
    still = encode_webp_extended(img, exif=b"ExifBlob", xmp=b"<xmp/>")
    assert np.array_equal(decode_webp(still), img)
    frames, delays = decode_webp_frames(still)
    assert len(frames) == 1 and delays == [0]
    assert np.array_equal(frames[0], img)


def test_webp_animation_composites_blend_dispose_offsets():
    from iceberg_python_spark.operators.webp import decode_webp_frames, encode_webp_anim

    rng = np.random.default_rng(9)
    f0 = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    patch = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    anim = encode_webp_anim(
        [f0, patch], delays_ms=[80, 120], offsets=[(0, 0), (4, 6)],
        no_blend=[True, True], dispose_bg=[False, True], background=(1, 2, 3, 255),
    )
    frames, delays = decode_webp_frames(anim)
    assert delays == [80, 120] and frames[0].shape == (32, 40, 4)
    assert np.array_equal(frames[0][:, :, :3], f0) and np.all(frames[0][:, :, 3] == 255)
    exp1 = frames[0].copy()
    exp1[6:14, 4:14, :3] = patch
    assert np.array_equal(frames[1], exp1)
    # decode_webp returns the FIRST composited canvas (GIF convention)
    assert np.array_equal(decode_webp(anim), frames[0])


def test_webp_animation_alpha_blend_math():
    from iceberg_python_spark.operators.webp import decode_webp_frames, encode_webp_anim

    base = np.full((16, 16, 4), 100, np.uint8)
    base[:, :, 3] = 255
    over = np.zeros((16, 16, 4), np.uint8)
    over[:, :, :3] = 200
    over[:, :, 3] = 128
    frames, _ = decode_webp_frames(encode_webp_anim([base, over], no_blend=[True, False]))
    fa = 128 / 255.0
    exp = round((200 * fa + 100 * (1 - fa)) / (fa + (1 - fa)))
    assert abs(int(frames[1][0, 0, 0]) - exp) <= 1
    assert frames[1][0, 0, 3] == 255  # opaque base stays opaque


def test_webp_vp8x_probe_contract_and_lossy_gate():
    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.webp import (
        _chunk,
        _riff_wrap,
        _vp8x_header,
        encode_webp_anim,
        encode_webp_extended,
    )

    img = _img(10, 14, seed=3)
    still = encode_webp_extended(img)
    p = probe_media(still)
    assert p["container"] == "webp-extended" and p["decodable"] is True
    assert (p["width"], p["height"]) == (14, 10)

    anim = encode_webp_anim([img, img], delays_ms=[50, 60])
    pa = probe_media(anim)
    assert pa["decodable"] is True and pa["n_frames"] == 2

    # a VP8X wrapping a LOSSY VP8 payload: probe says not decodable,
    # decoder gates naming the codec — contract agrees both ways
    lossy = _riff_wrap(_vp8x_header(10, 10, False, False) + _chunk(b"VP8 ", b"\x00" * 10))
    pl = probe_media(lossy)
    assert pl["container"] == "webp-extended" and pl["decodable"] is False
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(lossy)


def test_webp_vp8x_malformed_raises_valueerror():
    from iceberg_python_spark.operators.webp import (
        _chunk,
        _riff_wrap,
        _vp8x_header,
        encode_webp_anim,
        encode_webp_extended,
    )

    img = _img(8, 8, seed=5)
    # reserved flag bits set
    bad = bytearray(encode_webp_extended(img))
    bad[20] |= 0x80
    with pytest.raises(ValueError, match="reserved"):
        decode_webp(bytes(bad))
    # ANMF rectangle outside the canvas
    anim = encode_webp_anim([img], offsets=[(0, 0)])
    raw = bytearray(anim)
    pos = bytes(raw).find(b"ANMF") + 8
    raw[pos : pos + 3] = (30).to_bytes(3, "little")  # x=60 > canvas 8
    with pytest.raises(ValueError, match="canvas"):
        decode_webp(bytes(raw))
    # still VP8X whose payload does not fill the canvas
    wrong = _riff_wrap(
        _vp8x_header(20, 20, False, False)
        + encode_webp(img)[12:]  # VP8L chunk for an 8x8 image
    )
    with pytest.raises(ValueError, match="canvas"):
        decode_webp(wrong)
    # animation with zero frames
    empty = _riff_wrap(
        _vp8x_header(8, 8, True, False) + _chunk(b"ANIM", b"\x00" * 6)
    )
    with pytest.raises(ValueError, match="ANMF"):
        decode_webp(empty)
