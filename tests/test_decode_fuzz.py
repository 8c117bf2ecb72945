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
