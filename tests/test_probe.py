"""probe_media tests: header-only metadata for every engine codec plus
the gated containers (MP3/OGG/MP4) — values cross-checked against the
encoders' ground truth; no decoding happens (a probe of a huge payload
must not cost O(pixels))."""

import struct
import time

import numpy as np
import pytest

from iceberg_python_spark.operators.audio import encode_wav
from iceberg_python_spark.operators.flac import encode_flac
from iceberg_python_spark.operators.gif import encode_gif
from iceberg_python_spark.operators.imaging import encode_png
from iceberg_python_spark.operators.jpeg import encode_jpeg
from iceberg_python_spark.operators.probe import probe_media, probe_media_stats
from iceberg_python_spark.operators.tiff import encode_tiff
from iceberg_python_spark.operators.video import encode_y4m
from iceberg_python_spark.operators.webp import encode_webp


def _media():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    gimg = pal[rng.integers(0, 16, (20, 30))]
    tone = (9000 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(np.int32)
    return img, gimg, tone


def test_probe_engine_codecs_match_ground_truth():
    img, gimg, tone = _media()
    cases = {
        "png": (encode_png(img), {"kind": "image", "width": 30, "height": 20, "decodable": True}),
        "jpeg": (encode_jpeg(img), {"width": 30, "height": 20, "decodable": True}),
        "gif": (encode_gif([gimg, gimg], delays_ms=[100, 100]), {"width": 30, "n_frames": 2}),
        "webp-lossless": (encode_webp(img), {"width": 30, "height": 20, "decodable": True}),
        "tiff": (encode_tiff(img, compression="lzw"), {"width": 30, "n_pages": 1}),
        "wav": (encode_wav(tone / 32768.0, 8000), {"sample_rate": 8000, "duration_ms": 1000}),
        "flac": (encode_flac(tone, 8000), {"sample_rate": 8000, "duration_ms": 1000, "channels": 1}),
        "y4m": (encode_y4m([img, img], fps=2), {"n_frames": 2, "duration_ms": 1000}),
    }
    for container, (payload, want) in cases.items():
        got = probe_media(payload)
        assert got["container"] == container, got
        for k, v in want.items():
            assert got[k] == v, (container, k, got)


def test_probe_gated_containers():
    # MPEG1 Layer III, 128 kbps, 44.1 kHz, stereo; 16 KB ~ 1000 ms CBR
    mp3 = b"\xff\xfb\x90\x00" + b"\x00" * 16000
    got = probe_media(mp3)
    assert got == {
        "container": "mp3", "kind": "audio", "sample_rate": 44100,
        "channels": 2, "duration_ms": 1000, "decodable": False,
    }
    # ID3v2-prefixed variant finds the frame behind the tag
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + mp3
    assert probe_media(id3)["sample_rate"] == 44100
    # minimal MP4: ftyp + moov>mvhd (timescale 1000, duration 5000)
    mvhd = b"mvhd" + bytes(4) + b"\x00" * 8 + struct.pack(">II", 1000, 5000) + b"\x00" * 80
    mvhd = struct.pack(">I", 8 + len(mvhd)) + mvhd
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftypisom\x00\x00\x00\x00"
    assert probe_media(ftyp + moov)["duration_ms"] == 5000
    # OGG Opus: 48 kHz fixed; duration from the final page's granule
    ogg = (b"OggS" + b"\x00" * 2 + struct.pack("<q", 0) + b"\x00" * 12
           + b"\x01\x13" + b"OpusHead" + bytes([1, 2]) + b"\x00" * 100)
    ogg += b"OggS" + b"\x00\x04" + struct.pack("<q", 96000) + b"\x00" * 14
    got = probe_media(ogg)
    assert got["container"] == "ogg-opus" and got["duration_ms"] == 2000
    with pytest.raises(ValueError, match="magic"):
        probe_media(b"???? not media")


def test_probe_never_decodes():
    """Probing a LARGE payload must be header-cost, not pixel-cost: a
    4-megapixel PNG probes >100x faster than it decodes."""
    from iceberg_python_spark.operators.imaging import decode_image

    big = np.random.default_rng(1).integers(0, 256, (2000, 2000, 3), dtype=np.uint8)
    payload = encode_png(big)
    t0 = time.time()
    for _ in range(50):
        probe_media(payload)
    probe_t = (time.time() - t0) / 50
    t0 = time.time()
    decode_image(payload)
    decode_t = time.time() - t0
    assert probe_t < decode_t / 100


def test_probe_media_stats_spark(spark):
    img, gimg, tone = _media()
    rows = [
        (1, bytearray(encode_jpeg(img))),
        (2, bytearray(encode_flac(tone, 8000))),
        (3, bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 32000)),  # gated mp3, ~2 s
        (4, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    out = {r.id: r for r in probe_media_stats(df, "doc_id", "payload").collect()}
    assert out[1].probe_ok and out[1].kind == "image" and out[1].width == 30
    assert out[2].probe_ok and out[2].duration_ms == 1000 and out[2].decodable
    assert out[3].probe_ok and not out[3].decodable and out[3].duration_ms == 2000
    assert not out[4].probe_ok and "magic" in out[4].error
    # THE curation filter: duration gate without any decode
    audio_1s = probe_media_stats(df, "doc_id", "payload").where(
        "kind = 'audio' and duration_ms between 500 and 1500"
    )
    assert [r.id for r in audio_1s.collect()] == [2]


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 40), st.integers(1, 40),
       st.sampled_from(["png", "jpeg", "webp", "tiff", "gif"]), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_probe_dims_match_every_encoder(h, w, fmt, seed):
    """Property: for every image the engine can synthesize, the probe's
    header-derived dimensions equal the encoder's input dimensions."""
    rng = np.random.default_rng(seed)
    if fmt == "gif":
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 8, (h, w))]
        payload = encode_gif(img)
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = {"png": encode_png, "jpeg": encode_jpeg,
                   "webp": encode_webp, "tiff": encode_tiff}[fmt](img)
    got = probe_media(payload)
    assert (got["width"], got["height"]) == (w, h) and got["decodable"]


def _extensible_wav(sub_code: int, guid_base: bytes | None = None) -> bytes:
    """Minimal WAVE_FORMAT_EXTENSIBLE file: 40-byte fmt chunk with a
    SubFormat GUID carrying `sub_code` in its Data1 low word."""
    base = guid_base if guid_base is not None else (
        b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )
    guid = struct.pack("<H", sub_code) + base
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 0x4) + guid
    data = b"\x00\x00" * 64
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_probe_wav_extensible_routes_on_subformat():
    """ADVICE r11: the probe must mirror decode_wav's extensible
    dispatch — decodable only for PCM/IEEE-float SubFormat GUIDs, so
    e.g. extensible ADPCM is not promised to the in-engine decoder."""
    from iceberg_python_spark.operators.audio import decode_wav

    assert probe_media(_extensible_wav(1))["decodable"] is True
    assert probe_media(_extensible_wav(3))["decodable"] is True
    decode_wav(_extensible_wav(1))  # the promise holds
    # embedded MPEG-layer-3 code (0x55): probed un-decodable, and
    # decode_wav refuses (r12: ADPCM 2/0x11 moved to the decodable set)
    mp3wav = _extensible_wav(0x55)
    assert probe_media(mp3wav)["decodable"] is False
    with pytest.raises(NotImplementedError):
        decode_wav(mp3wav)
    # unknown GUID base: same contract on both sides
    alien = _extensible_wav(1, guid_base=b"\x01" * 14)
    assert probe_media(alien)["decodable"] is False
    with pytest.raises(NotImplementedError):
        decode_wav(alien)


# ---------------------------------------------------------------------------
# r12 late: ISO-BMFF / EBML / MP3-VBR container probes (headers real,
# media payloads junk — synthesized by operators/containers.py)
# ---------------------------------------------------------------------------

from iceberg_python_spark.operators.containers import (  # noqa: E402
    synthesize_mp3,
    synthesize_mp4,
    synthesize_webm,
)


def test_probe_mp4_video_dims_and_codec():
    for ver in (0, 1):  # 32- and 64-bit mvhd layouts
        got = probe_media(synthesize_mp4(5500, width=640, height=360,
                                         codec=b"avc1", mvhd_version=ver))
        assert got["container"] == "mp4" and got["kind"] == "video"
        assert (got["width"], got["height"]) == (640, 360)
        assert got["duration_ms"] == 5500 and got["codec"] == "avc1"
        assert got["decodable"] is False  # H.264 needs an external codec


def test_probe_mp4_audio_only_is_m4a_shaped():
    got = probe_media(synthesize_mp4(3000, sample_rate=44100, channels=2))
    assert got["kind"] == "audio" and "width" not in got
    assert got["sample_rate"] == 44100 and got["channels"] == 2
    assert got["duration_ms"] == 3000 and got["codec"] == "mp4a"


def test_probe_webm_ebml_walk():
    got = probe_media(synthesize_webm(12345, width=1280, height=720,
                                      codec_id=b"V_VP9"))
    assert got["container"] == "webm" and got["kind"] == "video"
    assert (got["width"], got["height"]) == (1280, 720)
    assert got["duration_ms"] == 12345 and got["codec"] == "V_VP9"
    # non-default TimestampScale: duration_ms must rescale
    got = probe_media(synthesize_webm(8000, width=64, height=48,
                                      timestamp_scale_ns=500_000))
    assert got["duration_ms"] == 8000


def test_probe_mkv_audio_unknown_segment_size():
    """Live-muxed Matroska writes an all-ones Segment size; the walk
    must treat it as to-end-of-file, not stop at the Segment."""
    got = probe_media(synthesize_webm(
        4000, sample_rate=48000, channels=1, codec_id=b"A_OPUS",
        doc_type=b"matroska", unknown_segment_size=True))
    assert got["container"] == "mkv" and got["kind"] == "audio"
    assert got["sample_rate"] == 48000 and got["channels"] == 1
    assert got["duration_ms"] == 4000 and got["codec"] == "A_OPUS"


def test_probe_mp3_xing_beats_cbr_estimate():
    """A VBR file's CBR byte estimate is wrong by construction; the
    Xing frame count gives the exact duration. Mono moves the tag to
    the 17-byte side-info offset."""
    for mono in (False, True):
        n = 200
        payload = synthesize_mp3(n, vbr=True, mono=mono, id3_bytes=128)
        got = probe_media(payload)
        true_ms = n * 1152 * 1000 // 44100
        assert got["duration_ms"] == true_ms
        assert got["channels"] == (1 if mono else 2)
        # the CBR estimate over these bytes would NOT be the truth
        first_frame_br = 128_000
        cbr_ms = (len(payload) - 128) * 8000 // first_frame_br
        assert abs(cbr_ms - true_ms) > 500
    # plain CBR still estimates from the byte count
    got = probe_media(synthesize_mp3(100, bitrate_kbps=64, rate=32000, mono=True))
    assert got["duration_ms"] == 100 * 1152 * 1000 // 32000


def test_probe_mp4_fragmented_duration_from_mehd():
    """DASH/CMAF fragmented files write mvhd duration 0; the total
    duration lives in mvex/mehd (mvhd timescale units)."""
    got = probe_media(synthesize_mp4(9000, width=320, height=180, fragmented=True))
    assert got["duration_ms"] == 9000
    assert (got["width"], got["height"]) == (320, 180)
    # non-fragmented behavior unchanged
    assert probe_media(synthesize_mp4(9000, width=320, height=180))["duration_ms"] == 9000


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(1, 400), st.sampled_from([32000, 44100, 48000]),
       st.booleans(), st.booleans(), st.sampled_from([0, 64, 500]))
@settings(max_examples=30, deadline=None)
def test_probe_mp3_duration_property(n_frames, rate, mono, vbr, id3):
    """Synthesized MP3s of any shape probe to the exact frame-count
    duration (VBR via Xing) or the CBR byte estimate."""
    payload = synthesize_mp3(n_frames, rate=rate, mono=mono, vbr=vbr, id3_bytes=id3)
    got = probe_media(payload)
    assert got["sample_rate"] == rate and got["channels"] == (1 if mono else 2)
    if vbr:
        assert got["duration_ms"] == n_frames * 1152 * 1000 // rate


# duration 0 is excluded: muxers write mvhd duration 0 to mean
# "unknown / fragmented", and the probe honestly reports None for it
@given(st.integers(1, 4000), st.integers(1, 4000), st.integers(1, 10_000_000),
       st.sampled_from([0, 1]), st.booleans())
@settings(max_examples=30, deadline=None)
def test_probe_mp4_webm_dims_duration_property(w, h, dur, mvhd_ver, frag):
    m = probe_media(synthesize_mp4(dur, width=w, height=h,
                                   mvhd_version=mvhd_ver, fragmented=frag))
    assert (m["width"], m["height"], m["duration_ms"]) == (w, h, dur)
    e = probe_media(synthesize_webm(dur, width=w, height=h))
    assert (e["width"], e["height"], e["duration_ms"]) == (w, h, dur)


def test_probe_mp3_crc_protected_xing():
    """ADVICE r12: CRC-protected MPEG1 frames (protection bit clear)
    put a 16-bit CRC before the side info, shifting the Xing tag 2
    bytes later — the probe must still find it, not fall back to the
    wrong CBR byte estimate."""
    for mono in (False, True):
        n = 150
        got = probe_media(synthesize_mp3(n, vbr=True, mono=mono, crc=True))
        assert got["duration_ms"] == n * 1152 * 1000 // 44100
        assert got["channels"] == (1 if mono else 2)


def test_heif_avif_probe_dims_and_codec():
    """r17: AVIF/HEIC stills — meta/iprp/ipco/ispe dims + codec-config
    routing (av1C/hvcC). Payload codecs are the MP4 ceiling class, so
    decodable is False, but dims + codec reach the curation pass."""
    import struct as _s

    def box(t, payload):
        return _s.pack(">I", 8 + len(payload)) + t + payload

    ispe = box(b"ispe", _s.pack(">III", 0, 640, 480))
    ipco = box(b"ipco", ispe + box(b"av1C", b"\x81\x04\x0c\x00"))
    avif = box(b"ftyp", b"avif\x00\x00\x00\x00avifmif1") + box(
        b"meta", b"\x00\x00\x00\x00" + box(b"iprp", ipco)
    )
    pr = probe_media(avif)
    assert pr == {
        "container": "avif", "kind": "image", "width": 640, "height": 480,
        "codec": "av1", "decodable": False,
    }
    ipco2 = box(b"ipco", box(b"ispe", _s.pack(">III", 0, 4032, 3024)) + box(b"hvcC", b"\x01" * 10))
    heic = box(b"ftyp", b"heic\x00\x00\x00\x00heicmif1") + box(
        b"meta", b"\x00\x00\x00\x00" + box(b"iprp", ipco2)
    )
    pr2 = probe_media(heic)
    assert (pr2["container"], pr2["width"], pr2["height"], pr2["codec"]) == (
        "heic", 4032, 3024, "hevc",
    )
    # plain mp4 ftyp brands still route to the video probe
    import numpy as np
    mp4ish = box(b"ftyp", b"isom\x00\x00\x00\x00isomiso2")
    assert probe_media(mp4ish)["container"] == "mp4"
    # crafted box sizes raise, never hang
    bad = bytearray(avif)
    bad[len(avif) - 8 - len(ipco) - 8 - 4 - 8] = 0  # clobber a size byte
    try:
        probe_media(bytes(bad))
    except ValueError:
        pass
