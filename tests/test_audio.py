"""Stdlib WAV codec + feature tests (no Spark except the mapInPandas
integration test)."""

import numpy as np
import pytest

from iceberg_python_spark.operators.audio import (
    audio_stats,
    decode_audio,
    decode_wav,
    encode_wav,
)


def _tone(freq, rate=8000, seconds=0.5, ch=1):
    t = np.arange(int(rate * seconds)) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.stack([x] * ch, axis=1) if ch > 1 else x


def test_wav_roundtrip_16bit():
    x = _tone(440)
    got, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and got.shape == (4000, 1)
    assert np.abs(got[:, 0] - x).max() < 1e-3  # 16-bit quantization


def test_wav_roundtrip_8bit_stereo():
    x = _tone(200, ch=2)
    got, rate = decode_wav(encode_wav(x, 8000, bits=8))
    assert got.shape == (4000, 2)
    assert np.abs(got - x).max() < 2e-2  # 8-bit quantization


def test_wav_24bit_and_float_decode():
    # hand-build a 24-bit PCM chunk and a float32 chunk
    import struct

    vals = np.array([0, 1 << 22, -(1 << 22)], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", len(raw)) + raw
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    x, rate = decode_wav(wav)
    assert np.allclose(x[:, 0], [0.0, 0.5, -0.5])
    f32 = np.array([0.25, -0.75], dtype="<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", len(f32)) + f32
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    x, rate = decode_wav(wav)
    assert rate == 16000 and np.allclose(x[:, 0], [0.25, -0.75])


def test_audio_stats_centroid_tracks_tone_frequency():
    lo = audio_stats(_tone(300).reshape(-1, 1), 8000)
    hi = audio_stats(_tone(2000).reshape(-1, 1), 8000)
    assert abs(lo["spectral_centroid_hz"] - 300) < 30
    assert abs(hi["spectral_centroid_hz"] - 2000) < 60
    assert lo["duration_ms"] == 500 and lo["n_channels"] == 1
    assert 0.3 < lo["rms"] < 0.4  # 0.5/sqrt(2)
    assert hi["zero_crossing_rate"] > lo["zero_crossing_rate"]


def test_unsupported_codecs_raise_naming_codec():
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_audio(b"ID3\x04rest")
    with pytest.raises(NotImplementedError, match="OGG"):
        decode_audio(b"OggS....")
    # FLAC decodes since r11 — garbage after the magic is a corrupt stream
    with pytest.raises(ValueError, match="FLAC"):
        decode_audio(b"fLaC....")


def test_extract_audio_stats_spark(spark):
    from iceberg_python_spark.operators.multimodal import extract_audio_stats

    rows = [
        (1, bytearray(encode_wav(_tone(500), 8000))),
        (2, bytearray(encode_wav(_tone(500, ch=2), 8000))),
        (3, bytearray(b"fLaC not really")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r.id: r for r in extract_audio_stats(df, "doc_id", "payload").collect()}
    assert out[1].duration_ms == 500 and out[1].sample_rate == 8000
    assert out[2].n_channels == 2 and abs(out[1].spectral_centroid_hz - 500) < 30
    assert out[1].decode_ok and not out[3].decode_ok and "FLAC" in out[3].error


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 5000), st.sampled_from([1, 2, 3]), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_property(n, ch, seed):
    x = np.random.default_rng(seed).uniform(-1, 1, (n, ch))
    got, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and got.shape == (n, ch)
    assert np.abs(got - x).max() < 1e-3


def _extensible_wav(samples: np.ndarray, rate: int, subformat: int, bits: int) -> bytes:
    """Hand-build a WAVE_FORMAT_EXTENSIBLE file: 40-byte fmt chunk with
    cbSize=22 and the SubFormat GUID carrying the real format code."""
    import struct

    if subformat == 3:
        payload = samples.astype("<f4").tobytes()
    else:
        payload = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    n_ch = 1
    block = n_ch * bits // 8
    guid = struct.pack("<H", subformat) + bytes.fromhex("000000001000800000aa00389b71")
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, n_ch, rate, rate * block, block, bits, 22, bits, 0x4) + guid
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def test_extensible_wav_float_subformat_dispatches_float():
    """ADVICE r10: a float-subformat extensible WAV must decode via the
    IEEE-float path, not be assumed integer PCM."""
    x = _tone(440)
    got, rate = decode_wav(_extensible_wav(x, 8000, subformat=3, bits=32))
    assert rate == 8000
    assert np.abs(got[:, 0] - x).max() < 1e-6  # float32 exactness, not int32 garbage


def test_extensible_wav_pcm_subformat_dispatches_pcm():
    x = _tone(440)
    got, rate = decode_wav(_extensible_wav(x, 8000, subformat=1, bits=16))
    assert np.abs(got[:, 0] - x).max() < 1e-3


def test_extensible_wav_unknown_guid_refuses():
    x = _tone(440)
    blob = bytearray(_extensible_wav(x, 8000, subformat=3, bits=32))
    # corrupt the GUID tail: no longer the known PCM/float namespace
    blob[12 + 8 + 26] ^= 0xFF
    with pytest.raises(NotImplementedError, match="SubFormat GUID"):
        decode_wav(bytes(blob))


def _g711_wav(payload: bytes, fmt_code: int, rate: int = 8000) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", fmt_code, 1, rate, rate, 1, 8)
    d = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    d += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(d)) + b"WAVE" + d


def _ulaw_encode(x: np.ndarray) -> bytes:
    """Reference G.711 mu-law compressor (CCITT) for the test oracle."""
    out = bytearray()
    for v in (np.clip(x, -1, 1) * 32124).astype(int):
        sign = 0x80 if v < 0 else 0
        v = min(abs(int(v)), 32635) + 0x84
        exp = v.bit_length() - 8
        mant = (v >> (exp + 3)) & 0x0F
        out.append(~(sign | (exp << 4) | mant) & 0xFF)
    return bytes(out)


def test_g711_mulaw_and_alaw_decode():
    """mu-law: round-trip through a reference compressor lands within
    the codec's quantization error; A-law: spec vector checks incl. the
    inverted sign convention (bit 7 SET = positive)."""
    x = _tone(440)
    got, rate = decode_wav(_g711_wav(_ulaw_encode(x), 7))
    assert rate == 8000 and got.shape[0] == len(x)
    assert np.abs(got[:, 0] - x).max() < 0.03  # 8-bit companded quantization
    # A-law spec vectors: encoded 0x55 (=0 after XOR) -> smallest NEGATIVE
    # step (-8/32768); 0xD5 -> +8/32768; extremes at |32256|
    vals = {0x55: -8, 0xD5: 8, 0x2A: -32256, 0xAA: 32256}
    got, _ = decode_wav(_g711_wav(bytes(vals.keys()), 6))
    want = np.array(list(vals.values())) / 32768.0
    assert np.allclose(got[:, 0], want), (got[:, 0] * 32768).tolist()


def test_g711_through_extract_audio_stats(spark):
    from iceberg_python_spark.operators.multimodal import extract_audio_stats

    rows = [(1, bytearray(_g711_wav(_ulaw_encode(_tone(500)), 7)))]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    r = extract_audio_stats(df, "doc_id", "payload").collect()[0]
    assert r.decode_ok and r.duration_ms == 500 and abs(r.spectral_centroid_hz - 500) < 30


def test_encode_wav_g711_roundtrips_within_companding_error():
    """The engine's own G.711 writers (fmt 7 µ-law / fmt 6 A-law)
    round-trip through decode_wav within standard companding error
    (~31/38 dB SNR); stereo interleaving preserved."""
    from iceberg_python_spark.operators.audio import encode_wav_g711

    t = np.arange(2000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    for law, tol in (("ulaw", 0.04), ("alaw", 0.02)):
        dec, rate = decode_wav(encode_wav_g711(x, 8000, law=law))
        assert rate == 8000 and dec.shape == (2000, 1)
        assert np.abs(dec[:, 0] - x).max() < tol, law
    # stereo: distinct channels stay distinct
    st = np.stack([x, -x], axis=1)
    dec, _ = decode_wav(encode_wav_g711(st, 8000, law="alaw"))
    assert dec.shape == (2000, 2)
    assert np.abs(dec[:, 0] - x).max() < 0.02 and np.abs(dec[:, 1] + x).max() < 0.02
    # full int16 range: worst-case absolute error bounded by the coarsest step
    xs = np.arange(-32768, 32768) / 32768.0
    for law, tol in (("ulaw", 0.04), ("alaw", 0.02)):
        d, _ = decode_wav(encode_wav_g711(xs, 8000, law=law))
        assert np.abs(d[:, 0] - xs).max() < tol, law
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711(x, 8000, law="gsm")


def test_adpcm_roundtrips_and_fact_trim():
    """IMA (fmt 0x11) and MS (fmt 0x02) ADPCM WAVs round-trip within
    codec-typical error; the fact chunk trims the final block's pad so
    frame counts are exact."""
    from iceberg_python_spark.operators.adpcm import encode_wav_adpcm

    t = np.arange(3001) / 8000.0  # deliberately not a block multiple
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    for codec, tol in (("ima", 0.05), ("ms", 0.06)):
        dec, rate = decode_wav(encode_wav_adpcm(x, 8000, codec=codec))
        assert rate == 8000 and dec.shape == (3001, 1), (codec, dec.shape)
        assert np.abs(dec[:, 0] - x).max() < tol, codec
    # stereo: distinct channels decode independently
    st = np.stack([x, 0.3 * np.sin(2 * np.pi * 990 * t)], axis=1)
    for codec, tol in (("ima", 0.06), ("ms", 0.08)):
        dec, _ = decode_wav(encode_wav_adpcm(st, 8000, codec=codec))
        assert dec.shape == (3001, 2)
        assert np.abs(dec - st).max() < tol, codec


def test_adpcm_block_independence_and_guards():
    """Blocks restart their predictor from the header: decoding a
    truncated payload (whole blocks) equals the prefix of the full
    decode — the property that makes ADPCM split-safe at scale."""
    from iceberg_python_spark.operators.adpcm import (
        decode_ima_adpcm,
        encode_ima_adpcm,
        encode_wav_adpcm,
    )

    rng = np.random.default_rng(3)
    pcm = (rng.integers(-20000, 20000, 2021)).astype(np.int16)
    payload, block_align, spb = encode_ima_adpcm(pcm, 1)
    full = decode_ima_adpcm(payload, 1, block_align)
    two = decode_ima_adpcm(payload[: 2 * block_align], 1, block_align)
    assert np.array_equal(two, full[: 2 * spb])
    with pytest.raises(ValueError, match="block_align"):
        decode_ima_adpcm(payload, 1, 5)
    with pytest.raises(ValueError, match="codec"):
        encode_wav_adpcm(np.zeros(10), 8000, codec="gsm")
