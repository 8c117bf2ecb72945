"""Baseline JPEG codec tests (stdlib + numpy; no Spark except the
mapInPandas integration check). The encoder synthesizes deterministic
JPEGs the same way oracle rows do; decode correctness is judged by
round-trip error bounds plus structural gates."""

import numpy as np
import pytest

from iceberg_python_spark.operators.imaging import decode_image, hamming, phash
from iceberg_python_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w, ch=3):
    x = np.linspace(0, 255, w)[None, :].repeat(h, axis=0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, axis=1)
    if ch == 1:
        return ((x + y) / 2).astype(np.uint8)
    return np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_color_444():
    img = _gradient(48, 64)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    rms = np.sqrt(((dec.astype(float) - img.astype(float)) ** 2).mean())
    assert rms < 2.0


def test_jpeg_roundtrip_grayscale():
    g = _gradient(40, 56, ch=1)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == g.shape
    assert np.sqrt(((dec.astype(float) - g.astype(float)) ** 2).mean()) < 2.0


def test_jpeg_420_subsampling_and_restart_markers():
    img = _gradient(48, 64)
    enc444 = encode_jpeg(img, quality=90)
    enc420 = encode_jpeg(img, quality=90, subsampling="4:2:0")
    assert len(enc420) < len(enc444)  # half the chroma blocks
    dec = decode_jpeg(enc420)
    assert dec.shape == img.shape
    assert np.sqrt(((dec.astype(float) - img.astype(float)) ** 2).mean()) < 4.0
    # restart markers: DRI emitted, RSTn segments decode with DC reset
    enc_ri = encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=2)
    assert b"\xff\xdd" in enc_ri and any(bytes([0xFF, 0xD0 + i]) in enc_ri for i in range(8))
    assert np.array_equal(decode_jpeg(enc_ri), dec)


def test_jpeg_odd_sizes_crop_exact():
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 23), (9, 31)]:
        img = _gradient(h, w)
        for sub in ("4:4:4", "4:2:0"):
            dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
            assert dec.shape == img.shape


def test_jpeg_deterministic_and_dispatch():
    img = _gradient(24, 24)
    enc = encode_jpeg(img, quality=85)
    assert enc == encode_jpeg(img, quality=85)  # oracle rows rely on this
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    px = decode_image(enc)  # magic-byte dispatch normalizes to (H, W, C)
    assert px.shape == (24, 24, 3)
    g = encode_jpeg(_gradient(24, 24, ch=1), quality=85)
    assert decode_image(g).shape == (24, 24, 1)


def test_jpeg_phash_duplicates_and_distinct():
    rng = np.random.default_rng(7)
    # structured content (kron-upsampled random field): a pure gradient
    # would put every low-freq DCT coefficient at the pHash median and
    # make the hash degenerate
    a = np.kron(rng.integers(0, 256, (8, 8, 3)), np.ones((8, 8, 1))).astype(np.uint8)
    b = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ha1 = phash(decode_jpeg(encode_jpeg(a, 90)))
    ha2 = phash(decode_jpeg(encode_jpeg(a, 90)))
    hb = phash(decode_jpeg(encode_jpeg(b, 90)))
    assert ha1 == ha2  # same source -> identical perceptual hash
    assert hamming(ha1, hb) > 10  # unrelated content stays far
    # recompression at a lower quality stays perceptually close
    ha3 = phash(decode_jpeg(encode_jpeg(a, 60)))
    assert hamming(ha1, ha3) <= 6


def test_jpeg_arithmetic_and_corrupt_gated():
    img = _gradient(16, 16)
    enc = bytearray(encode_jpeg(img, 90))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01rubbish")
    trunc = encode_jpeg(img, 90)[:40]  # header only, no scan
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(trunc)


def test_jpeg_quality_monotone():
    img = _gradient(32, 32)
    sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
    errs = []
    for q in (30, 60, 90):
        d = decode_jpeg(encode_jpeg(img, q))
        errs.append(float(np.abs(d.astype(float) - img.astype(float)).mean()))
    assert sizes == sorted(sizes)  # more quality, more bytes
    assert errs == sorted(errs, reverse=True)  # more quality, less error


def test_jpeg_spark_extract_image_stats(spark):
    from iceberg_python_spark.operators.multimodal import extract_image_stats

    rng = np.random.default_rng(3)
    img = np.kron(rng.integers(0, 256, (4, 6, 3)), np.ones((8, 8, 1))).astype(np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(img, 90))),
        (2, bytearray(encode_jpeg(img, 90, subsampling="4:2:0"))),
        (3, bytearray(b"\xff\xd8 truncated nonsense")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r.id: r for r in extract_image_stats(df, "doc_id", "payload").collect()}
    assert out[1].decode_ok and (out[1].height, out[1].width, out[1].channels) == (32, 48, 3)
    # chroma subsampling keeps the perceptual hash close
    assert out[2].decode_ok and hamming(out[2].phash, out[1].phash) <= 6
    assert not out[3].decode_ok


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 40), st.integers(1, 40), st.sampled_from([1, 3]), st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
def test_jpeg_roundtrip_property(h, w, ch, seed):
    """Smooth random images survive encode->decode within a tolerance
    that scales with quantization coarseness at q=95."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (4, 4) if ch == 1 else (4, 4, ch))
    # upsample a 4x4 random field -> smooth content (JPEG's happy path)
    reps = (-(-h // 4), -(-w // 4)) + ((1,) if ch == 3 else ())
    img = np.clip(np.kron(base, np.ones((reps[0], reps[1]) + (() if ch == 1 else (1,)))), 0, 255)[
        :h, :w
    ].astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img.astype(float)).max() <= 32


def test_jpeg_progressive_decode_matches_baseline_exactly():
    """Progressive (SOF2) encodes the SAME quantized coefficients, so
    its decode must be BIT-IDENTICAL to the baseline decode — the
    exactness oracle for the whole progressive path (DC first/refine,
    spectral-selection AC first scans with EOB runs, AC
    successive-approximation refinement)."""
    rng = np.random.default_rng(17)
    for h, w, ch, q in [(48, 64, 3, 90), (17, 23, 3, 50), (1, 1, 1, 95), (40, 40, 1, 75)]:
        img = rng.integers(0, 256, (h, w) if ch == 1 else (h, w, ch), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, q))
        prog_bytes = encode_jpeg(img, q, progressive=True)
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        assert np.array_equal(base, decode_jpeg(prog_bytes))
    # all-zero blocks exercise pure-EOB scans
    z = np.zeros((24, 24, 3), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(z, 90)), decode_jpeg(encode_jpeg(z, 90, progressive=True)))


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_given(_st.integers(1, 40), _st.integers(1, 40), _st.sampled_from([1, 3]),
        _st.sampled_from([30, 75, 95]), _st.integers(0, 2**31 - 1))
@_settings(max_examples=20, deadline=None)
def test_jpeg_progressive_equivalence_property(h, w, ch, q, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w) if ch == 1 else (h, w, ch), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, q)), decode_jpeg(encode_jpeg(img, q, progressive=True))
    )


def test_jpeg_exif_orientation_applied():
    """Crawl JPEGs carry rotation in EXIF tag 274, not in the pixels —
    the decoder applies it so pHash/dedup see the VISUAL image. All 8
    orientations match the numpy reference transforms."""
    img = _gradient(24, 32)  # non-square so transposes show
    base = decode_jpeg(encode_jpeg(img, 95))
    want = {
        1: base, 2: base[:, ::-1], 3: base[::-1, ::-1], 4: base[::-1],
        5: base.transpose(1, 0, 2), 6: np.rot90(base, -1),
        7: base.transpose(1, 0, 2)[::-1, ::-1], 8: np.rot90(base, 1),
    }
    for o, w in want.items():
        got = decode_jpeg(encode_jpeg(img, 95, exif_orientation=o))
        assert np.array_equal(got, w), o
    # malformed EXIF never fails the decode
    enc = bytearray(encode_jpeg(img, 95, exif_orientation=6))
    app1 = enc.find(b"\xff\xe1")
    enc[app1 + 10] = 0xFF  # corrupt the TIFF byte-order mark inside EXIF
    assert decode_jpeg(bytes(enc)).shape == base.shape  # falls back to 1


def test_jpeg_baseline_separate_scans_subsampled():
    """Baseline frame as three ns=1 scans (T.81 A.2.2, ADVICE r11):
    each scan walks the component's own nbw*nbh data units — for a
    4:2:0 frame these differ from the MCU grid, so this pins the
    decoder's non-interleaved routing for baseline frames. Decodes
    bit-identically to the interleaved encode."""
    for hw in ((24, 24), (20, 19), (17, 33)):
        img = _gradient(*hw)
        sep = decode_jpeg(encode_jpeg(img, 90, subsampling="4:2:0", separate_scans=True))
        inter = decode_jpeg(encode_jpeg(img, 90, subsampling="4:2:0"))
        assert np.array_equal(sep, inter), hw
    img = _gradient(15, 22)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, 85, separate_scans=True)),
        decode_jpeg(encode_jpeg(img, 85)),
    )
    with pytest.raises(ValueError, match="separate_scans"):
        encode_jpeg(img, 85, restart_interval=2, separate_scans=True)
