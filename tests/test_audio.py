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
    # Vorbis decodes since r15 — garbage after the OggS magic is a
    # corrupt stream (the FLAC junk-magic precedent below)
    with pytest.raises(ValueError, match="ogg"):
        decode_audio(b"OggS....")
    # FLAC decodes since r11 — garbage after the magic is a corrupt stream
    with pytest.raises(ValueError, match="FLAC"):
        decode_audio(b"fLaC....")


def test_ogg_codec_routing_contract():
    """probe<->decoder contract for Ogg (r16): a WELL-FORMED container
    whose first packet is a recognized-but-unsupported codec raises
    NotImplementedError NAMING the codec (Opus gets the table-data
    ceiling rationale); the probe reads the same id header's metadata."""
    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.vorbis import _ogg_wrap

    opus_head = b"OpusHead" + bytes([1, 2, 0x38, 1]) + (48000).to_bytes(4, "little") + b"\0\0\0"
    ogg_opus = _ogg_wrap([opus_head, b"OpusTags\0\0\0\0\0\0\0\0"])
    with pytest.raises(NotImplementedError, match="Opus"):
        decode_audio(ogg_opus)
    meta = probe_media(ogg_opus)
    assert meta["container"] == "ogg-opus" and meta["sample_rate"] == 48000
    assert meta["channels"] == 2 and meta["decodable"] is False

    for ident, codec in [
        (b"Speex   1.2", "Speex"),
        (b"\x80theora\x03\x02", "Theora"),
    ]:
        with pytest.raises(NotImplementedError, match=codec.split("-")[-1]):
            decode_audio(_ogg_wrap([ident]))
    # Ogg-FLAC decodes natively since r16 (flac.decode_ogg_flac); a
    # TRUNCATED mapping signature packet is malformed structure, so it
    # follows the junk-after-magic precedent: ValueError, not a gate
    with pytest.raises(ValueError, match="ogg-flac"):
        decode_audio(_ogg_wrap([b"\x7fFLAC\x01\x00"]))
    # unknown id packet in a valid container: still a loud gate, not a
    # misleading parse error
    with pytest.raises(NotImplementedError, match="unknown Ogg codec"):
        decode_audio(_ogg_wrap([b"XYZCODEC\x00\x01"]))

    # a first packet that is NOT a valid Vorbis id header (wrong
    # packtype byte) must not probe as vorbis/decodable — the probe
    # matches the decoder's \x01vorbis check, not a bare 'vorbis'
    # substring (r16 review finding)
    fake = _ogg_wrap([b"\x03vorbis" + bytes(23)])
    meta_f = probe_media(fake)
    assert meta_f["container"] == "ogg" and meta_f["decodable"] is False
    with pytest.raises(NotImplementedError, match="unknown Ogg codec"):
        decode_audio(fake)

    # the decodable direction: a real Vorbis stream probes decodable
    # AND decodes natively — probe and decoder agree per container
    from iceberg_python_spark.operators.vorbis import encode_ogg_vorbis

    ogg_v = encode_ogg_vorbis(_tone(1024, rate=8000), 8000)
    meta_v = probe_media(ogg_v)
    assert meta_v["container"] == "ogg-vorbis" and meta_v["decodable"] is True
    x, rate = decode_audio(ogg_v)
    assert rate == 8000 and x.shape[0] > 0


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


# --- legacy speech-corpus containers (late r12): AIFF / AU / SPHERE ---

from iceberg_python_spark.operators.audio import (  # noqa: E402
    decode_aiff,
    decode_au,
    decode_audio,
    decode_sphere,
    encode_aiff,
    encode_au,
    encode_sphere,
)


def _ctone(n=800, rate=8000, ch=1, seed=7):
    r = np.random.default_rng(seed)
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t)[:, None] + 0.02 * r.standard_normal((n, ch))
    return np.clip(x[:, :ch] if ch > 1 else x[:, :1], -1, 1)


def test_aiff_roundtrips_all_compressions():
    x = _ctone(ch=2)
    for comp, tol in [("NONE", 2 / 32768), ("sowt", 2 / 32768), ("fl32", 1e-7),
                      ("ulaw", 0.04), ("alaw", 0.04)]:
        data = encode_aiff(x, 8000, compression=comp)
        y, rate = decode_audio(data)  # exercises the magic dispatch too
        assert rate == 8000 and y.shape == x.shape, comp
        assert np.max(np.abs(y - x)) <= tol, comp
    mono8 = encode_aiff(_ctone(ch=1), 8000, bits=8)
    y, _ = decode_aiff(mono8)
    assert np.max(np.abs(y - _ctone(ch=1))) <= 2 / 128


def test_aiff_extended80_rate_and_foreign_gate():
    # 44100 and 8000 both round-trip through the 80-bit extended field
    for rate in (8000, 44100, 96000):
        data = encode_aiff(_ctone(), rate)
        _, got = decode_aiff(data)
        assert got == rate
    # unknown AIFC compression refuses loudly
    bad = bytearray(encode_aiff(_ctone(), 8000, compression="sowt"))
    i = bytes(bad).find(b"sowt")
    bad[i : i + 4] = b"ima4"
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff(bytes(bad))


def test_au_roundtrips_and_signed_8bit():
    x = _ctone(ch=2)
    for enc, tol in [("pcm16", 2 / 32768), ("pcm8", 2 / 128), ("f32", 1e-7),
                     ("ulaw", 0.04), ("alaw", 0.04)]:
        data = encode_au(x, 16000, encoding=enc)
        y, rate = decode_audio(data)
        assert rate == 16000 and y.shape == x.shape, enc
        assert np.max(np.abs(y - x)) <= tol, enc
    # hand-built foreign header: G.721 ADPCM (encoding 23) must gate
    hdr = b".snd" + np.array([24, 4, 23, 8000, 1], dtype=">u4").tobytes() + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="AU encoding 23"):
        decode_au(hdr)


def test_sphere_roundtrips_both_orders_and_shorten():
    x = _ctone()
    for bf in ("01", "10"):
        data = encode_sphere(x, 16000, coding="pcm", byte_format=bf)
        y, rate = decode_audio(data)
        assert rate == 16000 and np.max(np.abs(y - x)) <= 2 / 32768
    ul = encode_sphere(x, 8000, coding="ulaw")
    y, rate = decode_sphere(ul)
    assert rate == 8000 and np.max(np.abs(y - x)) <= 0.04
    # TIMIT-style embedded-shorten now DECODES (r14) — and exactly:
    # the shortened ints equal what the plain PCM writer would store
    sh = encode_sphere(x, 16000, coding="shorten")
    assert b"pcm,embedded-shorten-v2.00" in sh[:1024]
    y, rate = decode_sphere(sh)
    plain, _ = decode_sphere(encode_sphere(x, 16000, coding="pcm"))
    assert rate == 16000 and np.array_equal(y, plain)
    # and the shortened file is genuinely smaller than the PCM one
    assert len(sh) < len(encode_sphere(x, 16000, coding="pcm"))
    # a corrupt/truncated shorten payload still raises cleanly
    with pytest.raises((ValueError, NotImplementedError)):
        decode_sphere(sh[:1100])


def test_container_probes_match_decoders():
    """probe_media's decodable flag and header metadata agree with the
    decoders for every container × coding combination."""
    from iceberg_python_spark.operators.probe import probe_media

    x = _ctone(n=1600, ch=2)
    cases = [
        ("aiff", encode_aiff(x, 8000, compression="NONE")),
        ("aiff", encode_aiff(x, 8000, compression="ulaw")),
        ("au", encode_au(x, 16000, encoding="alaw")),
        ("sphere", encode_sphere(x, 16000)),
    ]
    for container, blob in cases:
        p = probe_media(blob)
        assert p["container"] == container and p["kind"] == "audio"
        assert p["decodable"] is True
        assert p["channels"] == 2
        y, rate = decode_audio(blob)
        assert p["sample_rate"] == rate
        assert abs(p["duration_ms"] - len(y) * 1000 / rate) <= 1
    # gated codings probe decodable=False but still carry metadata
    bad = bytearray(encode_aiff(x, 8000, compression="sowt"))
    i = bytes(bad).find(b"sowt")
    bad[i : i + 4] = b"ima4"
    p = probe_media(bytes(bad))
    assert p["decodable"] is False and p["sample_rate"] == 8000


def test_aiff_sub_container_widths_left_justified():
    """AIFF samples are LEFT-JUSTIFIED in whole bytes: a 12-bit file
    (old sampler gear) decodes exactly at its 16-bit container width,
    and an out-of-range width raises rather than mis-scaling."""
    import struct

    t = np.round(np.sin(2 * np.pi * 440 * np.arange(800) / 8000) * 2047) / 2047.0
    data = bytearray(encode_aiff(t, 8000, bits=16))
    i = data.index(b"COMM")
    struct.pack_into(">h", data, i + 8 + 2 + 4, 12)  # claim 12-bit
    x, rate = decode_aiff(bytes(data))
    want = np.clip(np.round(t * 32767), -32768, 32767) / 32768.0
    assert rate == 8000 and np.allclose(x[:, 0], want, atol=1 / 32768)
    struct.pack_into(">h", data, i + 8 + 2 + 4, 40)  # nonsense width
    with pytest.raises(ValueError):
        decode_aiff(bytes(data))


def test_ms_adpcm_predictor_truncates_toward_zero():
    """The MS ADPCM predictor is C integer division by 256 (truncation
    toward zero, not a floor shift). A hand-built foreign block using
    coefficient pair 1 (512, -256) drives the predictor negative; the
    vectorized decoder must match a literal scalar reference decoder
    bit-for-bit (our own encoder's pair 0 is exactly divisible, so
    round trips can never catch this)."""
    import struct

    from iceberg_python_spark.operators.adpcm import (
        _MS_ADAPT,
        _MS_COEFS,
        decode_ms_adpcm,
    )

    rng = np.random.default_rng(9)
    nibbles = rng.integers(0, 16, 40, dtype=np.int64).tolist()
    s2_0, s1_0, idelta0 = 2000, -3000, 600  # negative-going signal
    block = bytearray()
    block.append(5)  # coef index 5: (460, -208) — not 256-divisible
    block += struct.pack("<h", idelta0)
    block += struct.pack("<h", s1_0)
    block += struct.pack("<h", s2_0)
    for i in range(0, 40, 2):
        block.append((nibbles[i] << 4) | nibbles[i + 1])

    # literal scalar reference (C semantics via int() truncation)
    c1, c2 = int(_MS_COEFS[5, 0]), int(_MS_COEFS[5, 1])
    s1, s2, idelta = s1_0, s2_0, idelta0
    want = [s2_0, s1_0]
    saw_negative_odd = False
    for n in nibbles:
        p = s1 * c1 + s2 * c2
        saw_negative_odd = saw_negative_odd or (p < 0 and p % 256)
        pred = int(p / 256)  # trunc toward zero
        signed = n - 16 if n > 7 else n
        s = max(-32768, min(32767, pred + signed * idelta))
        want.append(s)
        s2, s1 = s1, s
        idelta = max(16, (int(_MS_ADAPT[n]) * idelta) >> 8)
    assert saw_negative_odd  # the crafted block actually exercises it

    got = decode_ms_adpcm(bytes(block), 1, len(block))
    assert got[:, 0].tolist() == want


def test_ms_adpcm_extensible_fmt_ignores_channel_mask():
    """ADVICE r12: in an extensible fmt the classic coef-table offsets
    (cbSize@16, nCoef@20) land on validBits/channelMask — a stereo
    mask (3) would pass the length check and the GUID bytes would be
    read as coefficients, silently corrupting samples. The extensible
    layout must decode bit-identically to the classic layout."""
    import struct

    from iceberg_python_spark.operators.adpcm import _MS_COEFS, encode_wav_adpcm

    t = np.linspace(0, 1, 800)
    x = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)], axis=1)
    classic = encode_wav_adpcm(x, 8000, codec="ms")
    want, want_rate = decode_wav(classic)

    def rebuild_extensible(wav: bytes, coef_table: bool) -> bytes:
        # parse chunks, rewrite fmt into WAVE_FORMAT_EXTENSIBLE form
        pos, chunks = 12, []
        while pos + 8 <= len(wav):
            cid = wav[pos : pos + 4]
            (size,) = struct.unpack("<I", wav[pos + 4 : pos + 8])
            chunks.append((cid, wav[pos + 8 : pos + 8 + size]))
            pos += 8 + size + (size & 1)
        out = b"WAVE"
        for cid, body in chunks:
            if cid == b"fmt ":
                _, n_ch, rate, byr, ba, bits = struct.unpack("<HHIIHH", body[:16])
                (spb,) = struct.unpack("<H", body[18:20])  # classic ext: cbSize,spb
                guid = struct.pack("<H", 0x0002) + (
                    b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
                )
                ext = struct.pack("<HHI", 22, spb, 0x3) + guid  # stereo mask=3
                if coef_table:
                    ext += struct.pack("<H", len(_MS_COEFS))
                    for c1, c2 in _MS_COEFS:
                        ext += struct.pack("<hh", int(c1), int(c2))
                body = struct.pack("<HHIIHH", 0xFFFE, n_ch, rate, byr, ba, bits) + ext
            out += cid + struct.pack("<I", len(body)) + body
            if len(body) & 1:
                out += b"\x00"
        return b"RIFF" + struct.pack("<I", len(out)) + out

    # no coef table after the GUID -> default table, NOT mask-as-nCoef
    got, rate = decode_wav(rebuild_extensible(classic, coef_table=False))
    assert rate == want_rate and np.array_equal(got, want)
    # re-based custom table at offset 40 parses and matches too
    got2, _ = decode_wav(rebuild_extensible(classic, coef_table=True))
    assert np.array_equal(got2, want)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=50, deadline=None)
def test_decode_audio_ogg_dispatch_never_leaks_other_errors(junk):
    """The r16 first-packet peek shares the page parser's validation:
    decode_audio on OggS + arbitrary bytes must raise ValueError
    (malformed container) or NotImplementedError (recognized/unknown
    codec id in a VALID container) — never IndexError/struct.error/
    KeyError, which would escape the per-row error capture."""
    try:
        decode_audio(b"OggS" + junk)
    except (ValueError, NotImplementedError):
        pass
