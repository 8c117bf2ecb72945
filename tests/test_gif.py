"""GIF codec tests (stdlib + numpy; Spark only for the mapInPandas
integration checks). GIF is lossless over its palette, so round trips
assert EQUALITY — no tolerance anywhere."""

import struct

import numpy as np
import pytest

from iceberg_python_spark.operators.gif import (
    _lzw_encode,
    decode_gif,
    encode_gif,
    sample_frames,
)
from iceberg_python_spark.operators.imaging import decode_image


def _img(h, w, colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, colors, (h, w))]


def test_gif_still_roundtrip_exact_with_width_growth():
    """80x120 @ 256 colors pushes LZW through every code width up to 12
    and at least one dictionary reset; the round trip must be exact."""
    img = _img(80, 120, 256, seed=8)
    frames, delays = decode_gif(encode_gif(img))
    assert len(frames) == 1 and np.array_equal(frames[0], img)


def test_gif_interlaced_roundtrip():
    img = _img(23, 17, 16, seed=3)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True))[0][0], img)


def test_gif_animation_frames_delays_and_sampling():
    f1, f2, f3 = (_img(20, 30, 32, seed=s) for s in (1, 2, 3))
    enc = encode_gif([f1, f2, f3], delays_ms=[500, 500, 500])
    frames, delays = decode_gif(enc)
    assert delays == [500, 500, 500]
    assert all(np.array_equal(a, b) for a, b in zip(frames, [f1, f2, f3]))
    # 1000 ms cadence over 500 ms frames -> indices 0 and 2
    assert [(i, t) for i, t, _ in sample_frames(enc, 1000)] == [(0, 0), (2, 1000)]


def test_gif_partial_frame_transparency_composites_over_previous():
    """Hand-built GIF89a: full first frame, then a 2x2 update at offset
    (1,1) whose transparent pixels must leave the first frame visible."""
    pal = np.array([[10, 20, 30], [200, 100, 50], [0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)  # 4x4 screen, 4-color GCT
    out += pal.tobytes()
    full = np.zeros((4, 4), dtype=np.uint8)  # frame 1: all palette[0]
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0) + b"\x02"
    lzw = _lzw_encode(full.reshape(-1), 2)
    out += bytes([len(lzw)]) + lzw + b"\x00"
    # GCE: transparent index 3, no disposal
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 5, 3) + b"\x00"
    patch = np.array([[1, 3], [3, 2]], dtype=np.uint8)  # 3 = transparent
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0) + b"\x02"
    lzw = _lzw_encode(patch.reshape(-1), 2)
    out += bytes([len(lzw)]) + lzw + b"\x00\x3b"
    frames, delays = decode_gif(bytes(out))
    assert len(frames) == 2 and delays == [0, 50]
    assert (frames[0] == pal[0]).all()
    want = np.tile(pal[0], (4, 4, 1))
    want[1, 1] = pal[1]  # opaque patch pixels land
    want[2, 2] = pal[2]
    # transparent patch pixels (1,2) and (2,1) keep frame-1 content
    assert np.array_equal(frames[1], want)


def test_gif_decode_image_dispatch_and_errors():
    img = _img(9, 9, 5, seed=4)
    px = decode_image(encode_gif(img))
    assert px.shape == (9, 9, 3) and np.array_equal(px, img)
    with pytest.raises(ValueError, match="GIF"):
        decode_gif(b"NOTAGIF...")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 20)  # no image data
    i = np.arange(300)
    many = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=1).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_gif(many.reshape(300, 1, 3))  # 300 distinct colors


def test_gif_spark_image_and_video_paths(spark):
    """Still GIFs flow through extract_image_stats; animated GIFs flow
    through extract_video_frames with exact cadence."""
    from iceberg_python_spark.operators.multimodal import (
        extract_image_stats,
        extract_video_frames,
    )

    still = _img(12, 15, 8, seed=5)
    f1, f2 = _img(10, 10, 8, seed=6), _img(10, 10, 8, seed=7)
    rows = [(1, bytearray(encode_gif(still)))]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    r = extract_image_stats(df, "doc_id", "payload").collect()[0]
    assert r.decode_ok and (r.height, r.width, r.channels) == (12, 15, 3)

    vid = [(1, bytearray(encode_gif([f1, f2], delays_ms=[1000, 1000])))]
    vdf = spark.createDataFrame(vid, "doc_id: long, payload: binary")
    out = extract_video_frames(vdf, "doc_id", "payload", every_n_ms=1000).collect()
    assert [(r.frame_idx, r.t_ms) for r in out] == [(0, 0), (1, 1000)]
    assert all(r.decode_ok and r.width == 10 for r in out)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 30), st.integers(1, 30), st.sampled_from([2, 7, 64, 256]),
       st.booleans(), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_property(h, w, colors, interlace, seed):
    img = _img(h, w, colors, seed=seed)
    assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace))[0][0], img)
