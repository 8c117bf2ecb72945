"""Y4M video codec + frame-sampling tests."""

import numpy as np
import pytest

from iceberg_python_spark.operators.video import decode_y4m, encode_y4m, sample_frames


def _clip(n=10, seed=1, shape=(24, 32, 3)):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)]


def test_y4m_roundtrip_444():
    frames = _clip()
    dec, fps = decode_y4m(encode_y4m(frames, fps=10))
    assert len(dec) == 10 and fps == 10.0 and dec[0].shape == (24, 32, 3)
    err = max(int(np.abs(d.astype(int) - f.astype(int)).max()) for d, f in zip(dec, frames))
    assert err <= 4  # plane quantization only


def test_y4m_420_and_mono():
    hdr = b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\n"
    y = np.full(16, 180, np.uint8).tobytes()
    c = np.full(4, 128, np.uint8).tobytes()
    d, fps = decode_y4m(hdr + b"FRAME\n" + y + c + c)
    assert d[0].shape == (4, 4, 3) and abs(int(d[0][0, 0, 0]) - 191) <= 1
    hdr = b"YUV4MPEG2 W4 H2 F30:1 Cmono\n"
    d, _ = decode_y4m(hdr + b"FRAME\n" + np.arange(8, dtype=np.uint8).tobytes())
    assert d[0].shape == (2, 4, 3) and d[0][0, 3, 0] == 3 and d[0][0, 3, 2] == 3


def test_sample_frames_cadence():
    data = encode_y4m(_clip(10), fps=10)  # 1 s of video
    assert [i for i, _t, _f in sample_frames(data, every_n_ms=300)] == [0, 3, 6, 9]
    assert [t for _i, t, _f in sample_frames(data, every_n_ms=500)] == [0, 500]


def test_container_gates_name_codecs():
    with pytest.raises(NotImplementedError, match="WebM"):
        decode_y4m(b"\x1a\x45\xdf\xa3xxxx")
    # AVI decodes since r16, so a header-less AVI shell is malformed
    # structure (ValueError), not a gate
    with pytest.raises(ValueError, match="video stream"):
        decode_y4m(b"RIFF\x04\x00\x00\x00AVI xxxx")


def test_extract_video_frames_spark(spark):
    from iceberg_python_spark.operators.multimodal import extract_video_frames

    same = _clip(6, seed=7)
    rows = [
        (1, bytearray(encode_y4m(same, fps=6))),
        (2, bytearray(encode_y4m(same, fps=6))),   # duplicate clip
        (3, bytearray(encode_y4m(_clip(6, seed=8), fps=6))),
        (4, bytearray(b"\x1a\x45\xdf\xa3 webm-ish")),
    ]
    df = spark.createDataFrame(rows, "vid_id: long, payload: binary")
    out = extract_video_frames(df, "vid_id", "payload", every_n_ms=500).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.id, []).append(r)
    # 1 s of video sampled at 500 ms -> frames 0 and 3
    assert [r.frame_idx for r in sorted(by_vid[1], key=lambda r: r.frame_idx)] == [0, 3]
    # duplicate clips share frame phashes; distinct clips don't
    p1 = {r.frame_idx: r.phash for r in by_vid[1]}
    p2 = {r.frame_idx: r.phash for r in by_vid[2]}
    p3 = {r.frame_idx: r.phash for r in by_vid[3]}
    assert p1 == p2 and p1 != p3
    assert not by_vid[4][0].decode_ok and "WebM" in by_vid[4][0].error


# ---- uncompressed AVI (r16: gate -> real decode) ----


def test_avi_roundtrips_exact_and_dispatch():
    from iceberg_python_spark.operators.video import decode_avi, encode_avi

    rng = np.random.default_rng(8)
    frames = [rng.integers(0, 256, (24, 34, 3), dtype=np.uint8) for _ in range(5)]
    for bpp in (24, 32):
        dec, fps = decode_avi(encode_avi(frames, fps=10, bpp=bpp))
        assert fps == 10.0 and len(dec) == 5
        for a, b in zip(dec, frames):
            assert np.array_equal(a, b), bpp
    # rides the decode_y4m dispatch + sampling cadence
    dec2, _ = decode_y4m(encode_avi(frames, fps=10))
    assert np.array_equal(dec2[0], frames[0])
    assert [i for i, _t, _f in sample_frames(encode_avi(frames, fps=10), every_n_ms=300)] == [0, 3]


def test_avi_odd_width_dib_padding_and_i420():
    from iceberg_python_spark.operators.video import _yuv_to_rgb, decode_avi, encode_avi

    rng = np.random.default_rng(3)
    # odd width -> DIB stride padding exercised
    frames = [rng.integers(0, 256, (10, 13, 3), dtype=np.uint8) for _ in range(2)]
    dec, _ = decode_avi(encode_avi(frames, fps=5))
    assert all(np.array_equal(a, b) for a, b in zip(dec, frames))
    # hand-built I420 AVI: patch the encoder's header and swap payload
    import struct

    w, h = 16, 12
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    raw = y.tobytes() + u.tobytes() + v.tobytes()
    shell = bytearray(encode_avi([np.zeros((h, w, 3), np.uint8)], fps=5))
    ps = bytes(shell).find(b"strf") + 8
    struct.pack_into("<I", shell, ps + 16, 0x30323449)  # biCompression = 'I420'
    pm = bytes(shell).find(b"00db")
    (old_len,) = struct.unpack_from("<I", shell, pm + 4)
    shell[pm + 8 : pm + 8 + old_len] = raw.ljust(old_len, b"\x00")
    dec, _ = decode_avi(bytes(shell))
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
    assert np.array_equal(dec[0], _yuv_to_rgb(y, uu, vv))


def test_avi_probe_contract_and_codec_gate():
    import struct

    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.video import decode_avi, encode_avi

    frames = [np.zeros((12, 16, 3), np.uint8) for _ in range(4)]
    avi = encode_avi(frames, fps=8)
    p = probe_media(avi)
    assert p["container"] == "avi" and p["kind"] == "video"
    assert (p["width"], p["height"]) == (16, 12)
    assert p["duration_ms"] == 500 and p["decodable"] is True
    # compressed fourcc: probe not-decodable, decoder gates NAMING it
    # (r17: MJPG now decodes, so the gate class is exercised via H264)
    mj = bytearray(avi)
    ps = bytes(mj).find(b"strf") + 8
    struct.pack_into("<I", mj, ps + 16, struct.unpack("<I", b"H264")[0])
    ph = bytes(mj).find(b"strh") + 8 + 4
    mj[ph : ph + 4] = b"H264"
    assert probe_media(bytes(mj))["decodable"] is False
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi(bytes(mj))


def test_avi_mjpeg_decodes_with_and_without_dht():
    """r17: MJPG frames are standalone baseline JPEGs through the
    in-repo T.81 decoder; DHT-less 'AVI1' frames imply the Annex-K
    default tables (probe decodable mirrors the routing both ways)."""
    from iceberg_python_spark.operators.jpeg import decode_jpeg, encode_jpeg, ensure_dht
    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.video import decode_avi, encode_avi

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (16, 20, 3), dtype=np.uint8) for _ in range(5)]
    for omit in (False, True):
        data = encode_avi(frames, fps=5, codec="mjpg", mjpg_omit_dht=omit)
        assert encode_avi(frames, fps=5, codec="mjpg", mjpg_omit_dht=omit) == data
        dec, fps = decode_avi(data)
        assert fps == 5.0 and len(dec) == 5
        assert all(f.shape == (16, 20, 3) for f in dec)
        # lossy fidelity bound — same claim class as the JPEG row
        mae = np.mean(
            [np.abs(d.astype(int) - f.astype(int)).mean() for d, f in zip(dec, frames)]
        )
        assert mae < 12.0, mae
        assert probe_media(data)["decodable"] is True
    # MJPEG frame bytes == plain-JPEG decode of the same frame, i.e.
    # the container adds no pixel transform
    with_dht = encode_avi(frames, fps=5, codec="mjpg")
    dec_avi, _ = decode_avi(with_dht)
    assert (dec_avi[0] == decode_jpeg(encode_jpeg(frames[0], quality=90))).all()
    # ensure_dht: pass-through when tables exist, splice yields the
    # byte-identical decode when they don't
    jb = encode_jpeg(frames[0], quality=90)
    assert ensure_dht(jb) == jb
    from iceberg_python_spark.operators.jpeg import default_dht_segments

    stripped = jb.replace(default_dht_segments(), b"")
    assert b"\xff\xc4" not in stripped.split(b"\xff\xda")[0]
    assert (decode_jpeg(ensure_dht(stripped)) == decode_jpeg(jb)).all()
    # corrupt MJPEG frame -> ValueError, not a hang or crash
    broken = bytearray(with_dht)
    soi = broken.find(b"\xff\xd8", 12)
    broken[soi] = 0x00
    with pytest.raises(ValueError):
        decode_avi(bytes(broken))
