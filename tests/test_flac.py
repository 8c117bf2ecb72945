"""FLAC codec tests (stdlib + numpy; Spark only for the mapInPandas
integration check). FLAC is lossless, so round trips assert EXACT
integer equality — no tolerance anywhere."""

import numpy as np
import pytest

from iceberg_python_spark.operators.flac import decode_flac, encode_flac


def _tone(n=10000, freq=440, rate=16000, amp=10000):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * freq * t / rate)).astype(np.int32)


def test_flac_mono_roundtrips_exact():
    rng = np.random.default_rng(12)
    cases = {
        "tone": _tone(),  # fixed predictors compress
        "noise": rng.integers(-32768, 32768, 10000, dtype=np.int32),  # verbatim-ish
        "flat": np.full(5000, -123, np.int32),  # CONSTANT subframes
        "tiny": np.array([1, -2, 3], np.int32),
    }
    for name, x in cases.items():
        dec, rate, bps = decode_flac(encode_flac(x, 16000, bps=16))
        assert rate == 16000 and bps == 16
        assert np.array_equal(dec[:, 0], x), name
    # the tone must actually compress (the predictors earn their keep)
    assert len(encode_flac(cases["tone"], 16000)) < 0.8 * 2 * len(cases["tone"])


def test_flac_stereo_independent_and_mid_side():
    rng = np.random.default_rng(3)
    tone = _tone(8000)
    st = np.stack([tone, (tone * 0.7).astype(np.int32) + rng.integers(-50, 50, 8000)], axis=1).astype(np.int32)
    for mode in ("independent", "mid-side"):
        dec, rate, bps = decode_flac(encode_flac(st, 44100, bps=16, stereo_mode=mode))
        assert np.array_equal(dec, st), mode
    # mid/side survives the parity edge (odd l+r sums)
    odd = np.array([[32767, -32768], [-1, 2], [5, 4]], dtype=np.int32)
    dec, _, _ = decode_flac(encode_flac(odd, 8000, stereo_mode="mid-side"))
    assert np.array_equal(dec, odd)


def test_flac_bit_depths_and_multi_block():
    rng = np.random.default_rng(7)
    x24 = rng.integers(-(1 << 23), 1 << 23, 3000, dtype=np.int32)
    dec, _, bps = decode_flac(encode_flac(x24, 48000, bps=24))
    assert bps == 24 and np.array_equal(dec[:, 0], x24)
    x8 = rng.integers(-128, 128, 9000, dtype=np.int32)
    dec, _, bps = decode_flac(encode_flac(x8, 8000, bps=8, block_size=2048))
    assert bps == 8 and np.array_equal(dec[:, 0], x8)  # 5 frames


def test_flac_crc_catches_corruption():
    enc = bytearray(encode_flac(_tone(), 16000))
    enc[len(enc) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(enc))
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"not flac at all")
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([40000], np.int32), 8000, bps=16)


def test_flac_through_decode_audio_and_extract_audio_stats(spark):
    from iceberg_python_spark.operators.audio import decode_audio
    from iceberg_python_spark.operators.multimodal import extract_audio_stats

    tone = _tone(4000, freq=500, rate=8000)
    enc = encode_flac(tone, 8000, bps=16)
    x, rate = decode_audio(enc)
    assert rate == 8000 and x.shape == (4000, 1)
    assert np.array_equal((x[:, 0] * 32768).round().astype(np.int32), tone)
    rows = [(1, bytearray(enc)), (2, bytearray(b"OggS....."))]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r.id: r for r in extract_audio_stats(df, "doc_id", "payload").collect()}
    assert out[1].decode_ok and out[1].sample_rate == 8000 and out[1].duration_ms == 500
    assert abs(out[1].spectral_centroid_hz - 500) < 30  # centroid tracks the tone
    # junk after the OggS magic is a corrupt stream (ValueError from the
    # page parser), captured per-row — the r16 routing contract
    assert not out[2].decode_ok and "ogg" in out[2].error


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 6000), st.sampled_from([1, 2]), st.sampled_from([8, 16, 24]),
       st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_flac_roundtrip_property(n, ch, bps, seed):
    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, (n, ch), dtype=np.int32)
    mode = "mid-side" if (ch == 2 and seed % 2) else "independent"
    dec, rate, got_bps = decode_flac(encode_flac(x, 22050, bps=bps, block_size=1024, stereo_mode=mode))
    assert rate == 22050 and got_bps == bps
    assert np.array_equal(dec, x)


# ---- FLAC→Ogg mapping (r16: gate converted to a real decode) ----


def test_ogg_flac_roundtrips_exact_all_modes():
    from iceberg_python_spark.operators.flac import decode_ogg_flac, encode_ogg_flac

    rng = np.random.default_rng(11)
    for shape, mode, bs in [
        ((3000,), "independent", 1024),
        ((3000, 2), "independent", 700),
        ((3000, 2), "mid-side", 4096),
    ]:
        x = rng.integers(-20000, 20000, size=shape).astype(np.int32)
        dec, rate, bps = decode_ogg_flac(encode_ogg_flac(x, 8000, stereo_mode=mode, block_size=bs))
        ref = x if x.ndim == 2 else x[:, None]
        assert rate == 8000 and bps == 16
        assert np.array_equal(dec, ref)


def test_ogg_flac_through_decode_audio_and_probe():
    from iceberg_python_spark.operators.audio import decode_audio
    from iceberg_python_spark.operators.flac import encode_ogg_flac
    from iceberg_python_spark.operators.probe import probe_media

    x = np.stack([_tone(4000, 300, 8000), _tone(4000, 300, 8000)], axis=1)
    ogg = encode_ogg_flac(x, 8000)
    f, rate = decode_audio(ogg)
    assert rate == 8000 and f.shape == (4000, 2)
    assert np.max(np.abs(f - x / 32768.0)) == 0  # lossless through the float interface
    p = probe_media(ogg)
    # probe<->decoder contract: ogg-flac probes decodable AND decodes
    assert p["container"] == "ogg-flac" and p["decodable"] is True
    assert p["sample_rate"] == 8000 and p["channels"] == 2
    assert p["duration_ms"] == 500  # final page granule = 4000 samples


def test_ogg_flac_unknown_header_count_and_extra_headers():
    # n_headers=0 means UNKNOWN per the mapping: the decoder must skip
    # metadata packets by type byte until the first 0xFF-sync frame
    from iceberg_python_spark.operators.flac import decode_ogg_flac, encode_ogg_flac
    from iceberg_python_spark.operators.vorbis import _ogg_demux, _ogg_wrap

    x = _tone(2000, 500, 8000)
    pkts, _g = _ogg_demux(encode_ogg_flac(x, 8000))
    first = bytearray(pkts[0])
    first[7:9] = b"\x00\x00"  # declared header count -> unknown
    padding = bytes([0x01]) + b"\x00\x00\x04" + b"\x00" * 4  # extra PADDING block packet
    again = _ogg_wrap([bytes(first), pkts[1], padding] + pkts[2:])
    dec, rate, bps = decode_ogg_flac(again)
    assert rate == 8000 and np.array_equal(dec, x[:, None])


def test_ogg_flac_malformed_mapping_raises_valueerror():
    from iceberg_python_spark.operators.flac import decode_ogg_flac, encode_ogg_flac
    from iceberg_python_spark.operators.vorbis import _ogg_demux, _ogg_wrap

    x = _tone(1000, 500, 8000)
    pkts, _g = _ogg_demux(encode_ogg_flac(x, 8000))

    bad_ver = bytearray(pkts[0])
    bad_ver[5] = 2
    with pytest.raises(ValueError, match="mapping version"):
        decode_ogg_flac(_ogg_wrap([bytes(bad_ver)] + pkts[1:]))

    bad_sig = bytearray(pkts[0])
    bad_sig[9:13] = b"XXXX"
    with pytest.raises(ValueError, match="fLaC signature"):
        decode_ogg_flac(_ogg_wrap([bytes(bad_sig)] + pkts[1:]))

    with pytest.raises(ValueError, match="truncated first packet"):
        decode_ogg_flac(_ogg_wrap([b"\x7fFLAC\x01\x00"]))

    missing = bytearray(pkts[0])
    missing[7:9] = b"\x00\x05"  # declares 5 header packets; stream has 1
    with pytest.raises(ValueError, match="missing declared header"):
        decode_ogg_flac(_ogg_wrap([bytes(missing)]))
