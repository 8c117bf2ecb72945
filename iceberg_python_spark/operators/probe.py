"""Media METADATA probing without decoding — the curation primitive
for payloads whose full decode is expensive or codec-gated. A 100 TB
crawl filter like "keep audio between 1 and 15 seconds" or "drop
images under 64px" must not decode pixels/samples to answer; headers
carry the answer in O(bytes-read) per payload.

:func:`probe_media` parses container headers only (all from the
public format specs):

- images: PNG (IHDR), JPEG (SOF scan + EXIF-free), GIF (screen
  descriptor + frame count), WebP (VP8L/VP8/VP8X dims), BMP, TIFF
  (first-IFD tags + page count), PPM/PGM
- audio: WAV (fmt/data chunks), FLAC (STREAMINFO), MP3 (first MPEG
  frame header after ID3 — bitrate/rate/channels + the Xing/Info/VBRI
  frame count when present, else a CBR duration estimate), OGG (id
  header rate + terminal-page granule duration)
- video: Y4M (header + frame count), MP4/ISO-BMFF (mvhd duration,
  tkhd 16.16 dims, stsd codec fourcc + audio rate/channels), AVI
  (avih), WebM/MKV (EBML walk: Info duration x TimestampScale,
  TrackEntry CodecID, Video PixelWidth/Height, Audio rate/channels)

Every result says whether a FULL decode is available in-engine
(``decodable``) or needs an external codec — so a pipeline can route
payloads: probe everything, decode what the stdlib codecs handle,
quarantine the rest WITH their metadata instead of as opaque bytes.

:func:`probe_media_stats` is the Arrow-batched Spark surface (one row
per payload, per-row error capture).
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}


def _probe_mp3(data: bytes) -> Dict[str, Any]:
    pos = 0
    if data[:3] == b"ID3":  # skip the ID3v2 tag (syncsafe length)
        ln = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + ln
    while pos + 4 <= len(data):
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
            version = (b1 >> 3) & 3  # 3 = MPEG1
            layer = (b1 >> 1) & 3  # 1 = Layer III
            br_idx = (b2 >> 4) & 0xF
            sr_idx = (b2 >> 2) & 3
            if version == 3 and layer == 1 and 0 < br_idx < 15 and sr_idx < 3:
                bitrate = _MP3_BITRATES[br_idx] * 1000
                rate = _MP3_RATES[sr_idx]
                mono = ((b3 >> 6) & 3) == 3
                channels = 1 if mono else 2
                # VBR files carry the true frame count in a Xing/Info
                # (or Fraunhofer VBRI) header inside the FIRST frame —
                # the per-frame bitrate varies, so the CBR byte-count
                # estimate can be arbitrarily wrong without it. The
                # tag sits after the side info (MPEG1: 17 bytes mono,
                # 32 stereo); VBRI is always at 32 past the side-info
                # start. 1152 samples per MPEG1 Layer III frame.
                dur_ms = None
                # CRC-protected frames (protection bit CLEAR, b1&1==0)
                # carry a 16-bit CRC between the header and side info,
                # shifting the Xing/Info tag 2 bytes later (ADVICE
                # r12) — without this, VBR duration for those files
                # falls back to the arbitrarily-wrong CBR estimate.
                crc_pad = 0 if (b1 & 0x01) else 2
                xing_off = pos + 4 + crc_pad + (17 if mono else 32)
                if data[xing_off : xing_off + 4] in (b"Xing", b"Info"):
                    (flags,) = struct.unpack_from(">I", data, xing_off + 4)
                    if flags & 1:  # frames field present
                        (n_frames,) = struct.unpack_from(">I", data, xing_off + 8)
                        dur_ms = int(n_frames * 1152 * 1000 / rate)
                elif data[pos + 4 + 32 : pos + 4 + 36] == b"VBRI":
                    (n_frames,) = struct.unpack_from(">I", data, pos + 4 + 32 + 14)
                    dur_ms = int(n_frames * 1152 * 1000 / rate)
                if dur_ms is None:
                    # CBR estimate over the audio bytes that remain
                    dur_ms = int((len(data) - pos) * 8000 / bitrate)
                return {
                    "container": "mp3", "kind": "audio", "sample_rate": rate,
                    "channels": channels, "duration_ms": dur_ms, "decodable": False,
                }
        pos += 1
    raise ValueError("corrupt MP3: no MPEG audio frame found")


def _probe_ogg(data: bytes) -> Dict[str, Any]:
    # id header lives in the first page; rate offset depends on codec
    rate = None
    codec = "ogg"
    head = data[28:28 + 64]
    # match the DECODER's id-header check exactly (\x01 packtype +
    # "vorbis") — a bare 'vorbis' substring match claimed
    # decodable=True for streams decode_audio refuses (r16 review)
    if head[:7] == b"\x01vorbis":
        rate = struct.unpack_from("<I", head, 12)[0]
        channels = head[11]
        codec = "ogg-vorbis"
    elif head[:8] == b"OpusHead":
        rate = 48000  # opus always decodes at 48 kHz
        channels = head[9]
        codec = "ogg-opus"
    elif head[:5] == b"\x7fFLAC" and head[9:13] == b"fLaC":
        # FLAC→Ogg mapping signature packet: "fLaC" + STREAMINFO at
        # head[13:]; STREAMINFO body bytes 10-12 carry rate(20 bits) +
        # channels(3 bits) — same field math as the bare-FLAC probe
        si = head[13 + 4 :]
        rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
        channels = ((si[12] >> 1) & 0x07) + 1
        codec = "ogg-flac"
    else:
        channels = None
    # duration: granule position of the LAST page (PCM sample count)
    last = data.rfind(b"OggS")
    dur_ms = None
    if last >= 0 and rate:
        (granule,) = struct.unpack_from("<q", data, last + 6)
        if granule > 0:
            dur_ms = int(granule * 1000 / rate)
    return {
        "container": codec, "kind": "audio", "sample_rate": rate,
        "channels": channels, "duration_ms": dur_ms,
        # r16 routing contract: Vorbis (r15, vorbis.py) and the FLAC
        # mapping (r16, flac.py) decode natively; Opus stays a
        # documented table-data ceiling
        "decodable": codec in ("ogg-vorbis", "ogg-flac"),
    }


def _probe_heif(data: bytes, brand: bytes) -> Dict[str, Any]:
    """AVIF/HEIC still images (r17): ISO-BMFF meta walk — the primary
    item's spatial extents live in meta/iprp/ipco/ispe (ISO/IEC
    23008-12 §6.5.3); the codec config box present in ipco (av1C /
    hvcC) names the payload codec. The AV1/HEVC bitstreams are the
    same normative-table ceiling class as MP4 video, so decodable is
    always False — but a curation pass still gets dims + codec."""
    container = "avif" if brand in (b"avif", b"avis") else "heic"
    out: Dict[str, Any] = {
        "container": container, "kind": "image",
        "width": None, "height": None, "codec": None, "decodable": False,
    }
    masters = (b"meta", b"iprp", b"ipco")

    def walk(start: int, end: int, depth: int) -> None:
        p = start
        while p + 8 <= end:
            (size,) = struct.unpack_from(">I", data, p)
            btype = data[p + 4 : p + 8]
            body = p + 8
            if size == 1:
                if p + 16 > end:
                    raise ValueError("heif: truncated 64-bit box size")
                (size,) = struct.unpack_from(">Q", data, p + 8)
                body = p + 16
            if size < 8 or p + size > end:
                raise ValueError("heif: box overruns its parent")
            if btype == b"meta":
                body += 4  # FullBox version/flags
            if btype in masters and depth < 8:
                walk(body, p + size, depth + 1)
            elif btype == b"ispe" and out["width"] is None:
                if body + 12 <= p + size:
                    w, h = struct.unpack_from(">II", data, body + 4)
                    if 0 < w < 1 << 24 and 0 < h < 1 << 24:
                        out["width"], out["height"] = int(w), int(h)
            elif btype == b"av1C":
                out["codec"] = "av1"
            elif btype == b"hvcC":
                out["codec"] = "hevc"
            p += size

    walk(0, len(data), 0)
    if out["codec"] is None:
        out["codec"] = "av1" if container == "avif" else "hevc"
    return out


def _probe_mp4(data: bytes) -> Dict[str, Any]:
    # ISO-BMFF box walk (ISO/IEC 14496-12): mvhd carries timescale +
    # duration; each trak's tkhd carries 16.16 fixed-point presentation
    # dims; the sample-description (stsd) fourcc names the codec and,
    # for audio entries, embeds channel count + 16.16 sample rate.
    # Only the listed MASTER boxes recurse — mdat is skipped by size.
    out: Dict[str, Any] = {
        "container": "mp4", "kind": "video", "duration_ms": None, "decodable": False,
    }
    masters = (b"moov", b"trak", b"mdia", b"minf", b"stbl", b"mvex")
    saw_video = saw_audio = False
    timescale = 0

    def walk(start: int, end: int, depth: int) -> None:
        nonlocal saw_video, saw_audio, timescale
        p = start
        while p + 8 <= end:
            (size,) = struct.unpack_from(">I", data, p)
            btype = data[p + 4 : p + 8]
            body = p + 8
            if size == 1:
                (size,) = struct.unpack_from(">Q", data, p + 8)
                body = p + 16
            elif size == 0:  # box extends to end of file
                size = end - p
            if size < 8:
                break
            if btype == b"mvhd":
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, body + 12)
                timescale = ts
                # fragmented files write duration 0 here; mehd has it
                if ts and dur:
                    out["duration_ms"] = int(dur * 1000 / ts)
            elif btype == b"mehd" and timescale:
                # movie-extends header: total duration of a fragmented
                # (DASH/CMAF) movie, in mvhd timescale units
                ver = data[body]
                if ver == 1:
                    (frag_dur,) = struct.unpack_from(">Q", data, body + 4)
                else:
                    (frag_dur,) = struct.unpack_from(">I", data, body + 4)
                out["duration_ms"] = int(frag_dur * 1000 / timescale)
            elif btype == b"tkhd":
                ver = data[body]
                # v0: 4(ver/flags)+4+4+4+4+4 then 8+2+2+2+2+36; v1 has
                # 64-bit create/modify/duration (+12 bytes total)
                woff = body + (84 if ver == 0 else 96) - 8
                w = struct.unpack_from(">I", data, woff)[0] >> 16
                h = struct.unpack_from(">I", data, woff + 4)[0] >> 16
                if w and h:
                    out.setdefault("width", w)
                    out.setdefault("height", h)
            elif btype == b"hdlr":
                handler = data[body + 8 : body + 12]
                saw_video = saw_video or handler == b"vide"
                saw_audio = saw_audio or handler == b"soun"
            elif btype == b"stsd":
                # fullbox(4) + entry_count(4), then the first entry:
                # size(4) + format fourcc(4) + body
                fourcc = data[body + 12 : body + 16]
                entry = body + 16
                if fourcc in (b"mp4a", b"alac", b"ac-3", b"ec-3", b"Opus", b"fLaC"):
                    # AudioSampleEntry: 6 reserved + 2 dref + 8 reserved
                    # + 2 channels + 2 samplesize + 4 + 4 rate(16.16)
                    n_ch, = struct.unpack_from(">H", data, entry + 16)
                    rate = struct.unpack_from(">I", data, entry + 24)[0] >> 16
                    out.setdefault("channels", n_ch or None)
                    out.setdefault("sample_rate", rate or None)
                    out.setdefault("codec", fourcc.decode("ascii", "replace").strip())
                else:
                    # a video sample entry's fourcc outranks audio
                    out["codec"] = fourcc.decode("ascii", "replace").strip()
            elif btype in masters and depth < 5:
                walk(body, min(p + size, end), depth + 1)
            p += size

    walk(0, len(data), 0)
    out["kind"] = "video" if (saw_video or "width" in out or not saw_audio) else "audio"
    return out


def _ebml_vint(data: bytes, pos: int, keep_marker: bool) -> Tuple[int, int]:
    """Read one EBML variable-length integer at ``pos``; returns
    (value, next_pos). Element IDs keep the length-marker bit (the
    spec's notation); sizes clear it. A size of all ones means
    "unknown" and is returned as -1."""
    first = data[pos]
    if first == 0:
        raise ValueError("corrupt EBML: zero vint marker")
    n = 8 - first.bit_length()  # leading zeros => n+1 total bytes
    val = first if keep_marker else first & ((1 << (7 - n)) - 1)
    all_ones = not keep_marker and val == (1 << (7 - n)) - 1
    for b in data[pos + 1 : pos + 1 + n]:
        val = (val << 8) | b
        all_ones = all_ones and b == 0xFF
    return (-1 if all_ones else val), pos + 1 + n


_EBML_MASTERS = {0x1A45DFA3, 0x18538067, 0x1549A966, 0x1654AE6B, 0xAE, 0xE0, 0xE1}


def _probe_mkv(data: bytes) -> Dict[str, Any]:
    # Matroska/WebM EBML walk (RFC 8794 + the Matroska element IDs):
    # Info carries TimestampScale (ns/tick, default 10^6) + Duration
    # (float, ticks); each TrackEntry carries TrackType, CodecID, and
    # a Video{PixelWidth,PixelHeight} or Audio{SamplingFrequency,
    # Channels} child. Clusters are skipped by size; unknown-size
    # master elements (live-muxed Segments) extend to the parent end.
    out: Dict[str, Any] = {"container": "mkv", "kind": "video", "decodable": False}
    ts_scale, dur_ticks = 1_000_000, None
    saw_video = saw_audio = False
    track_type = None

    def walk(start: int, end: int, depth: int) -> None:
        nonlocal ts_scale, dur_ticks, saw_video, saw_audio, track_type
        pos = start
        while pos + 2 <= end:
            eid, p = _ebml_vint(data, pos, keep_marker=True)
            size, body = _ebml_vint(data, p, keep_marker=False)
            nxt = end if size < 0 else min(body + size, end)
            if eid == 0x4282:  # DocType
                doc = data[body:nxt].decode("ascii", "replace")
                if doc == "webm":
                    out["container"] = "webm"
            elif eid == 0x2AD7B1:
                ts_scale = int.from_bytes(data[body:nxt], "big")
            elif eid == 0x4489:
                dur_ticks = struct.unpack_from(
                    ">f" if nxt - body == 4 else ">d", data, body
                )[0]
            elif eid == 0x83:  # TrackType: 1=video, 2=audio
                track_type = int.from_bytes(data[body:nxt], "big")
                saw_video = saw_video or track_type == 1
                saw_audio = saw_audio or track_type == 2
            elif eid == 0x86:  # CodecID — the video track's wins
                codec = data[body:nxt].decode("ascii", "replace").rstrip("\x00")
                if track_type == 1 or "codec" not in out:
                    out["codec"] = codec
            elif eid == 0xB0:
                out["width"] = int.from_bytes(data[body:nxt], "big")
            elif eid == 0xBA:
                out["height"] = int.from_bytes(data[body:nxt], "big")
            elif eid == 0xB5:
                out["sample_rate"] = int(
                    struct.unpack_from(">f" if nxt - body == 4 else ">d", data, body)[0]
                )
            elif eid == 0x9F:
                out["channels"] = int.from_bytes(data[body:nxt], "big")
            elif eid in _EBML_MASTERS and depth < 5:
                walk(body, nxt, depth + 1)
            if size < 0:
                break  # unknown-size non-master: cannot resync
            pos = body + size

    walk(0, len(data), 0)
    if dur_ticks is not None:
        out["duration_ms"] = int(dur_ticks * ts_scale / 1_000_000)
    out["kind"] = "audio" if (saw_audio and not saw_video) else "video"
    return out


def _gif_frame_count(data: bytes) -> int:
    """Frame count via the block walk — sub-blocks are SKIPPED by their
    length bytes, never LZW-decompressed."""
    pos = 13
    flags = data[10]
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    n = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos]:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            iflags = data[pos + 8]
            pos += 9
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 7))
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos]:
                pos += data[pos] + 1
            pos += 1
            n += 1
        else:
            break
    return n


def probe_media(data: bytes) -> Dict[str, Any]:
    """Container metadata from headers only; raises ValueError on
    unrecognized magic. Keys (absent = unknown): container, kind,
    width, height, duration_ms, sample_rate, channels, n_frames,
    n_pages, decodable.

    Crafted-input contract (r16): truncated/malformed headers after a
    known magic raise ValueError — struct truncations and crafted
    offsets are converted at this boundary."""
    try:
        return _probe_media_dispatch(data)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt media header: {exc}") from exc


def _probe_media_dispatch(data: bytes) -> Dict[str, Any]:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", data, 16)
        out = {"container": "png", "kind": "image", "width": w, "height": h, "decodable": True}
        # r17: APNG — the acTL chunk precedes IDAT, so a bounded scan
        # of the header area finds it; frame count mirrors GIF's field
        ix = data.find(b"acTL", 8, 4096)
        if ix >= 0 and data.find(b"IDAT", 8, ix) < 0:
            out["n_frames"] = int(struct.unpack_from(">I", data, ix + 4)[0])
        return out
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            tag = data[pos + 1]
            if tag in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return {
                    "container": "jpeg", "kind": "image", "width": w, "height": h,
                    "decodable": tag in (0xC0, 0xC1, 0xC2),
                }
            if tag in (0xC9, 0xCA, 0xCB):  # arithmetic: dims still readable
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return {"container": "jpeg", "kind": "image", "width": w, "height": h, "decodable": False}
            if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
                pos += 2
                continue
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            pos += 2 + ln
        raise ValueError("corrupt JPEG: no frame header")
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return {
            "container": "gif", "kind": "image", "width": w, "height": h,
            "n_frames": _gif_frame_count(data), "decodable": True,
        }
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        chunk = data[12:16]
        if chunk == b"VP8L":
            (bits,) = struct.unpack_from("<I", data, 21)
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return {"container": "webp-lossless", "kind": "image", "width": w, "height": h, "decodable": True}
        if chunk == b"VP8 ":
            w, h = struct.unpack_from("<HH", data, 26)
            return {"container": "webp", "kind": "image", "width": w & 0x3FFF, "height": h & 0x3FFF, "decodable": False}
        if chunk == b"VP8X":
            wm1 = int.from_bytes(data[24:27], "little")
            hm1 = int.from_bytes(data[27:30], "little")
            # r16: VP8X decodes natively when its image payloads are
            # lossless (VP8L); lossy VP8/ALPH payloads keep the
            # table-data ceiling. Header-only chunk walk — fourccs and
            # sizes, no entropy decode — matching the decoder's routing.
            n_frames = 0
            has_vp8l = has_lossy = False
            pos = 12
            while pos + 8 <= len(data):
                four = data[pos : pos + 4]
                ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
                if four == b"ANMF":
                    n_frames += 1
                    sub = data[pos + 24 : pos + 28]  # frame's image chunk id
                    has_vp8l |= sub == b"VP8L"
                    has_lossy |= sub in (b"VP8 ", b"ALPH")
                elif four == b"VP8L":
                    has_vp8l = True
                elif four in (b"VP8 ", b"ALPH"):
                    has_lossy = True
                pos += 8 + ln + (ln & 1)
            return {
                "container": "webp-extended", "kind": "image",
                "width": wm1 + 1, "height": hm1 + 1,
                "n_frames": n_frames if n_frames else None,
                "decodable": has_vp8l and not has_lossy,
            }
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        pos = 12
        rate = channels = None
        dur_ms = None
        fmt_code = 1
        fmt_body = b""
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if cid == b"fmt ":
                fmt_code, channels, rate, byte_rate = struct.unpack_from("<HHII", data, pos + 8)
                fmt_body = bytes(data[pos + 8 : pos + 8 + size])
            elif cid == b"data" and rate:
                dur_ms = int(size * 1000 / byte_rate) if byte_rate else None
            pos += 8 + size + (size & 1)
        # the probe's routing contract mirrors decode_wav exactly:
        # PCM (1), MS/IMA ADPCM (2/0x11), IEEE float (3), G.711 (6/7);
        # extensible files dispatch on the embedded SubFormat code
        _wav_codecs = (1, 2, 3, 6, 7, 0x11)
        if fmt_code == 0xFFFE:
            decodable = (
                len(fmt_body) >= 40
                and fmt_body[26:40] == b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
                and struct.unpack_from("<H", fmt_body, 24)[0] in _wav_codecs
            )
        else:
            decodable = fmt_code in _wav_codecs
        return {
            "container": "wav", "kind": "audio", "sample_rate": rate, "channels": channels,
            "duration_ms": dur_ms, "decodable": decodable,
        }
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        # avih: microseconds per frame + total frames + canvas dims;
        # strf (BITMAPINFOHEADER) compression routes decodable exactly
        # like video.decode_avi (r16: BI_RGB 24/32 bpp and raw I420;
        # r17: MJPG through the T.81 decoder; other fourccs stay gated)
        p = data.find(b"avih")
        dur_ms = w = h = None
        if p >= 0:
            us_per_frame, _, _, _, frames = struct.unpack_from("<IIIII", data, p + 8)
            dur_ms = int(us_per_frame * frames / 1000)
            w, h = struct.unpack_from("<II", data, p + 8 + 32)
        decodable = False
        ps = data.find(b"strf")
        if ps >= 0 and ps + 28 <= len(data):
            (bpp,) = struct.unpack_from("<H", data, ps + 8 + 14)
            (comp,) = struct.unpack_from("<I", data, ps + 8 + 16)
            decodable = (
                (comp == 0 and bpp in (24, 32))
                or comp == 0x30323449
                or comp in (0x47504A4D, 0x67706A6D)  # MJPG/mjpg (r17)
            )
        return {
            "container": "avi", "kind": "video", "width": w, "height": h,
            "duration_ms": dur_ms, "decodable": decodable,
        }
    if data[:4] == b"fLaC":
        br_off = 8  # skip header+blockheader: STREAMINFO starts at byte 8
        rate = (data[br_off + 10] << 12) | (data[br_off + 11] << 4) | (data[br_off + 12] >> 4)
        channels = ((data[br_off + 12] >> 1) & 0x7) + 1
        total = ((data[br_off + 13] & 0x0F) << 32) | struct.unpack_from(">I", data, br_off + 14)[0]
        return {
            "container": "flac", "kind": "audio", "sample_rate": rate, "channels": channels,
            "duration_ms": int(total * 1000 / rate) if rate and total else None, "decodable": True,
        }
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        # COMM: channels, frames, bits, 80-bit rate (+AIFC compression);
        # routing mirrors decode_aiff's compression set exactly
        pos, out = 12, {"container": "aiff", "kind": "audio", "decodable": False}
        is_aifc = data[8:12] == b"AIFC"
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from(">I", data, pos + 4)
            if cid == b"COMM":
                n_ch, n_frames, _bits = struct.unpack_from(">hIh", data, pos + 8)
                se, mant = struct.unpack_from(">HQ", data, pos + 16)
                rate = int(mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)) if mant else 0
                comp = bytes(data[pos + 26 : pos + 30]) if (is_aifc and size >= 22) else b"NONE"
                out.update(
                    sample_rate=rate or None,
                    channels=n_ch,
                    duration_ms=int(n_frames * 1000 / rate) if rate else None,
                    decodable=comp
                    in (b"NONE", b"twos", b"sowt", b"fl32", b"FL32", b"fl64", b"FL64",
                        b"ulaw", b"ULAW", b"alaw", b"ALAW"),
                )
            pos += 8 + size + (size & 1)
        return out
    if data[:4] == b".snd" and len(data) >= 24:
        off, size, enc, rate, n_ch = struct.unpack_from(">IIIII", data, 4)
        bpf = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8, 27: 1}.get(enc)
        n_bytes = size if size not in (0, 0xFFFFFFFF) else max(len(data) - off, 0)
        dur = int(n_bytes / (bpf * max(n_ch, 1)) * 1000 / rate) if bpf and rate else None
        return {
            "container": "au", "kind": "audio", "sample_rate": rate, "channels": n_ch,
            "duration_ms": dur, "decodable": bpf is not None,
        }
    if data[:8] == b"NIST_1A\n":
        fields = {}
        for line in data[16:1024].decode("ascii", "replace").split("\n"):
            parts = line.strip().split(None, 2)
            if not parts or parts[0] == "end_head":
                break
            if len(parts) == 3:
                fields[parts[0]] = parts[2]
        rate = int(fields.get("sample_rate", 0) or 0)
        n = int(fields.get("sample_count", 0) or 0)
        coding = fields.get("sample_coding", "pcm")
        return {
            "container": "sphere", "kind": "audio", "sample_rate": rate or None,
            "channels": int(fields.get("channel_count", 1) or 1),
            "duration_ms": int(n * 1000 / rate) if rate and n else None,
            "decodable": "shorten" not in coding
            and (coding.startswith(("pcm", "ulaw", "mu-law", "alaw"))),
        }
    if data[:3] == b"ID3" or (len(data) > 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0):
        return _probe_mp3(data)
    if data[:4] == b"OggS":
        return _probe_ogg(data)
    if data[:9] == b"YUV4MPEG2":
        hdr = data[: data.find(b"\n")].decode("ascii", "replace").split()
        w = h = None
        fps = 25.0
        for tok in hdr[1:]:
            if tok[0] == "W":
                w = int(tok[1:])
            elif tok[0] == "H":
                h = int(tok[1:])
            elif tok[0] == "F":
                num, den = tok[1:].split(":")
                fps = int(num) / int(den)
        n = data.count(b"FRAME")
        return {
            "container": "y4m", "kind": "video", "width": w, "height": h,
            "n_frames": n, "duration_ms": int(n * 1000 / fps) if fps else None, "decodable": True,
        }
    if len(data) > 12 and data[4:8] == b"ftyp":
        brand = bytes(data[8:12])
        if brand in (b"avif", b"avis", b"heic", b"heix", b"heif", b"mif1", b"msf1"):
            return _probe_heif(data, brand)
        return _probe_mp4(data)
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return _probe_mkv(data)
    if data[:2] == b"BM":
        w, h = struct.unpack_from("<ii", data, 18)
        (bmp_bpp,) = struct.unpack_from("<H", data, 28)
        (bmp_comp,) = struct.unpack_from("<I", data, 30)
        # mirror decode_image: palette 1/4/8 (raw + RLE8/RLE4) and
        # 24/32 raw decode; bitfields (3) and odd depths gate
        ok = (bmp_bpp in (1, 4, 8) and bmp_comp in (0, 1, 2)) or (
            bmp_bpp in (24, 32) and bmp_comp == 0
        )
        return {"container": "bmp", "kind": "image", "width": w, "height": abs(h), "decodable": ok}
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import _read_ifd, tiff_page_count

        fmt = "<" if data[:2] == b"II" else ">"
        (off,) = struct.unpack_from(fmt + "I", data, 4)
        tags, _ = _read_ifd(data, fmt, off)
        comp = tags.get(259, [1])[0]
        # mirror decode_tiff's routing exactly: baseline codecs (r16:
        # + deflate + new-JPEG), r17: CCITT fax — decodable unless an
        # option the decoder gates on is set (lsb-first FillOrder,
        # tiled fax, T.4 uncompressed mode, non-bilevel samples)
        bits_t = tags.get(258, [1])
        fill_order = tags.get(266, [1])[0]
        tiled_t = 322 in tags or 324 in tags
        if comp in (2, 3, 4):
            t4 = tags.get(292, [0])[0] if comp == 3 else 0
            ok = (
                bits_t == [1]
                and fill_order in (1, 2)  # r17: lsb-first decodes too
                and not tiled_t
                and not (isinstance(t4, int) and t4 & 2)
            )
        elif comp == 7:
            ok = True
        else:
            ok = comp in (1, 5, 8, 32773, 32946)
        return {
            "container": "tiff", "kind": "image",
            "width": tags.get(256, [None])[0], "height": tags.get(257, [None])[0],
            "n_pages": tiff_page_count(data), "decodable": ok,
        }
    if data[:2] in (b"P6", b"P5"):
        toks = data.split(None, 3)
        return {"container": "pnm", "kind": "image", "width": int(toks[1]), "height": int(toks[2]), "decodable": True}
    raise ValueError("unrecognized media magic")


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("decodable", T.BooleanType()),
        T.StructField("probe_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def probe_media_stats(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """One metadata row per payload, headers only — route a mixed 100 TB
    media corpus (filter by duration/dims, split decodable vs gated)
    without decoding a single pixel or sample."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                base = {
                    "id": int(i), "n_bytes": len(b) if b is not None else 0,
                    "container": None, "kind": None, "width": None, "height": None,
                    "duration_ms": None, "sample_rate": None, "channels": None,
                    "n_frames": None, "codec": None, "decodable": None,
                    "probe_ok": False, "error": None,
                }
                try:
                    meta = probe_media(bytes(b))
                    base.update({k: meta.get(k) for k in base if k in meta})
                    base["n_frames"] = meta.get("n_frames", meta.get("n_pages"))
                    base["probe_ok"] = True
                except Exception as exc:
                    base["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in PROBE_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, schema=PROBE_SCHEMA)
