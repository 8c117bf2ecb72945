"""Crafted-input contract fuzz across ALL decode/probe dispatchers
(r16): arbitrary bytes after any known container magic must raise
ValueError (malformed structure) or NotImplementedError (recognized
codec gate) — never struct.error / IndexError / KeyError, which are
internal exception classes a curation pipeline's per-row error capture
should never see named. The r16 junk sweep found struct.error and
IndexError escapes in the AU/BMP/GIF/PNG/PNM/TIFF/FLAC-probe/EBML
paths; the dispatchers now convert them at the boundary."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_python_spark.operators.audio import decode_audio
from iceberg_python_spark.operators.imaging import decode_image
from iceberg_python_spark.operators.probe import probe_media

MAGICS = [
    b"",
    b"\x89PNG\r\n\x1a\n",
    b"\xff\xd8\xff\xe0",
    b"GIF87a",
    b"GIF89a",
    b"RIFF\x20\x00\x00\x00WEBP",
    b"RIFF\x20\x00\x00\x00WAVE",
    b"II*\x00",
    b"MM\x00*",
    b"fLaC",
    b"BM",
    b"P6\n",
    b"P5\n",
    b".snd",
    b"FORM\x00\x00\x00\x20AIFF",
    b"NIST_1A\n",
    b"OggS",
    b"YUV4MPEG2 ",
    b"\x00\x00\x00\x18ftypisom",
    b"\x00\x00\x00\x18ftypavif",
    b"\x00\x00\x00\x18ftypheic",
    b"\x1a\x45\xdf\xa3",
    b"ID3\x04",
    b"\xff\xfb\x90\x00",
]


@given(st.sampled_from(MAGICS), st.binary(min_size=0, max_size=250))
@settings(max_examples=150, deadline=None)
def test_dispatchers_raise_only_contract_errors(magic, junk):
    payload = magic + junk
    for fn in (decode_image, decode_audio, probe_media):
        try:
            fn(payload)
        except (ValueError, NotImplementedError):
            pass


def test_structured_corruption_of_round16_containers():
    """r16: STRUCTURED corruption (truncation, bit flips, zero spans,
    junk splices) of valid tiled/JPEG/deflate TIFF, VP8X WebP, AVI,
    Ogg-FLAC, and tar fixtures must stay inside the crafted-input
    contract — ValueError/NotImplementedError only. This found (and
    now pins) a multi-GB format-string hang on a flipped TIFF IFD
    count, a gigabyte VP8X canvas memset, and KeyError/TypeError
    escapes on missing or mistyped required tags."""
    import numpy as np

    from iceberg_python_spark.operators.audio import decode_audio
    from iceberg_python_spark.operators.flac import encode_ogg_flac
    from iceberg_python_spark.operators.imaging import decode_image
    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.tar import decode_tar, encode_tar
    from iceberg_python_spark.operators.tiff import encode_tiff
    from iceberg_python_spark.operators.video import decode_y4m, encode_avi
    from iceberg_python_spark.operators.webp import encode_webp_anim, encode_webp_extended

    from iceberg_python_spark.operators.zip import decode_zip, encode_zip
    from iceberg_python_spark.operators.audio import encode_aiff, encode_wav
    from iceberg_python_spark.operators.flac import encode_flac
    from iceberg_python_spark.operators.gif import encode_gif
    from iceberg_python_spark.operators.imaging import encode_apng, encode_png
    from iceberg_python_spark.operators.jpeg import encode_jpeg
    from iceberg_python_spark.operators.webp import encode_webp

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    frames = [img.copy() for _ in range(2)]
    pcm = rng.integers(-3000, 3000, (400,)).astype(np.int32)
    tone = pcm.astype(np.float64) / 32768.0
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    gimg = pal[rng.integers(0, 8, (16, 16))]
    seeds = {
        # older codecs under the same sweep (found zlib.error and
        # OverflowError escapes on PNG / JPEG / AIFF payloads)
        "png": (encode_png(img), [decode_image, probe_media]),
        "apng": (encode_apng([img, img[::-1]], [40, 60]), [decode_image, probe_media]),
        "jpeg": (encode_jpeg(img, quality=90), [decode_image, probe_media]),
        "gif": (encode_gif([gimg, gimg], delays_ms=[50, 50]), [decode_image, probe_media]),
        "webp-vp8l": (encode_webp(img), [decode_image, probe_media]),
        "wav": (encode_wav(tone, 8000), [decode_audio, probe_media]),
        "flac": (encode_flac(pcm, 8000), [decode_audio, probe_media]),
        "aiff": (encode_aiff(tone, 8000), [decode_audio, probe_media]),
        "tiff-tiled": (encode_tiff(img, tiled=True, compression="lzw"), [decode_image, probe_media]),
        "tiff-jpeg": (encode_tiff(img, compression="jpeg", tiled=True, jpeg_tables=True), [decode_image, probe_media]),
        "tiff-deflate": (encode_tiff(img, compression="deflate"), [decode_image, probe_media]),
        "tiff-ccitt-g4": (
            encode_tiff((img[:, :, 0] < 128).astype(np.uint8), compression="ccitt-g4"),
            [decode_image, probe_media],
        ),
        "tiff-ccitt-g3-2d": (
            encode_tiff((img[:, :, 0] < 128).astype(np.uint8), compression="ccitt-g3-2d"),
            [decode_image, probe_media],
        ),
        "vp8x-still": (encode_webp_extended(img, exif=b"e"), [decode_image, probe_media]),
        "vp8x-anim": (encode_webp_anim(frames, delays_ms=[10, 20]), [decode_image, probe_media]),
        "avi": (encode_avi(frames, fps=5), [decode_y4m, probe_media]),
        "ogg-flac": (encode_ogg_flac(pcm, 8000), [decode_audio, probe_media]),
        "tar": (encode_tar([("0001.txt", b"x")]), [decode_tar]),
        "zip": (encode_zip([("0001.txt", b"x"), ("0002.txt", b"y" * 99)]), [decode_zip]),
    }
    for name, (good, fns) in seeds.items():
        g = np.frombuffer(good, dtype=np.uint8).copy()
        for trial in range(80):
            r = np.random.default_rng(trial * 7 + 1)
            b = g.copy()
            mode = trial % 4
            if mode == 0:
                b = b[: r.integers(1, len(b))]
            elif mode == 1:
                idx = r.integers(0, len(b), size=max(1, len(b) // 50))
                b[idx] ^= r.integers(1, 256, size=len(idx)).astype(np.uint8)
            elif mode == 2:
                s = r.integers(0, len(b))
                e = min(len(b), s + int(r.integers(1, 64)))
                b[s:e] = 0
            else:
                keep = int(r.integers(8, min(64, len(b))))
                b = np.concatenate(
                    [b[:keep], r.integers(0, 256, size=int(r.integers(16, 128))).astype(np.uint8)]
                )
            payload = b.tobytes()
            for fn in fns:
                try:
                    fn(payload)
                except (ValueError, NotImplementedError):
                    pass
                # anything else (KeyError/TypeError/MemoryError/hang)
                # is a contract escape and fails the test loudly


def test_structured_corruption_of_ingestion_parsers():
    """r17 (VERDICT r16 #6): the archive/document dispatchers walk
    attacker bytes at 100 TB just like the media decoders — give
    warc_records' and pdf_pages' underlying parsers (and the r17
    MJPEG-AVI path) the same 80-corruption treatment. Contract:
    ValueError / NotImplementedError only — internal exception
    classes (KeyError/IndexError/RecursionError/struct.error) must
    be converted at the decode boundary, and no trial may hang or
    balloon memory."""
    import numpy as np

    from iceberg_python_spark.operators.pdf import (
        decode_pdf_text,
        encode_pdf,
        encode_pdf_modern,
    )
    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.video import decode_y4m, encode_avi
    from iceberg_python_spark.operators.warc import decode_warc, encode_warc

    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    recs = [
        {
            "warc_type": "response",
            "record_id": f"<urn:uuid:{i:08d}>",
            "target_uri": f"http://example.com/{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "http_status": 200,
            "body": (f"<html><body>doc {i} " + "x" * 200 + "</body></html>").encode(),
        }
        for i in range(3)
    ]
    pages = ["page one text\nsecond line", "page two"]
    seeds = {
        "warc-plain": (encode_warc(recs), [decode_warc]),
        "warc-gz": (encode_warc(recs, gzip_per_record=True), [decode_warc]),
        "pdf-classic": (encode_pdf(pages), [decode_pdf_text]),
        "pdf-classic-raw": (encode_pdf(pages, compress=False), [decode_pdf_text]),
        "pdf-modern": (encode_pdf_modern(pages), [decode_pdf_text]),
        "avi-mjpg": (
            encode_avi([img, img], fps=5, codec="mjpg"),
            [decode_y4m, probe_media],
        ),
        "avi-mjpg-nodht": (
            encode_avi([img, img], fps=5, codec="mjpg", mjpg_omit_dht=True),
            [decode_y4m, probe_media],
        ),
    }
    for name, (good, fns) in seeds.items():
        g = np.frombuffer(good, dtype=np.uint8).copy()
        for trial in range(80):
            r = np.random.default_rng(trial * 13 + 3)
            b = g.copy()
            mode = trial % 4
            if mode == 0:
                b = b[: r.integers(1, len(b))]
            elif mode == 1:
                idx = r.integers(0, len(b), size=max(1, len(b) // 50))
                b[idx] ^= r.integers(1, 256, size=len(idx)).astype(np.uint8)
            elif mode == 2:
                s = r.integers(0, len(b))
                e = min(len(b), s + int(r.integers(1, 64)))
                b[s:e] = 0
            else:
                keep = int(r.integers(8, min(64, len(b))))
                b = np.concatenate(
                    [b[:keep], r.integers(0, 256, size=int(r.integers(16, 128))).astype(np.uint8)]
                )
            payload = b.tobytes()
            for fn in fns:
                try:
                    fn(payload)
                except (ValueError, NotImplementedError):
                    pass
