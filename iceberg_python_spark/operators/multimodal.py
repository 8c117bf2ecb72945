"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct
(mime, width/height/duration, source uri). Decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas iterators via
``mapInPandas``.

IMAGE DECODE IS REAL for PNG / PPM / PGM / BMP (r10):
:func:`extract_image_stats` uses the stdlib+numpy codecs in
:mod:`.imaging` — zlib inflate + scanline unfilter, exact dimensions,
channel statistics, and a 64-bit DCT perceptual hash. Only the formats
that genuinely need an external library (JPEG/GIF/WEBP, audio, video)
remain gated; they surface per-row as ``decode_ok=false`` in
``extract_image_stats`` or raise in the legacy stub modes:

- ``decode_stub="fake"``   — deterministic features derived from the bytes
  (length, digest-seeded pseudo-features), useful for pipeline testing.
- ``decode_stub="raise"``  — NotImplementedError naming the real library
  to install (PIL/torchaudio/decord) at the marked call site.

At 100 TB the pattern is: keep payloads in their own parquet column chunk
(columnar skip when untouched), select metadata-only where possible, and
let mapInPandas stream Arrow batches so peak memory is one batch per core.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Literal

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_metadata(df: DataFrame, binary_col: str, mime: str, source_uri_col: str = None) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        (F.col(source_uri_col) if source_uri_col else F.lit(None).cast("string")).alias("source_uri"),
    )
    return df.withColumn("media_meta", meta)


def _fake_features(payload: bytes, dim: int) -> list:
    """Deterministic pseudo-embedding from the payload digest (stub for a
    real vision/audio encoder)."""
    h = hashlib.sha256(payload).digest()
    # repeat digest to dim bytes; scale to [-1, 1)
    reps = (dim // len(h)) + 1
    raw = (h * reps)[:dim]
    return [((b / 255.0) * 2 - 1) for b in raw]


def extract_image_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    dim: int = 16,
    decode_stub: Literal["fake", "raise"] = "fake",
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize binary payloads via mapInPandas (Arrow batches).

    Replace the marked stub with a real decoder (e.g. PIL + a vision
    model) when the libraries are available; the surrounding plumbing —
    output schema, batch iteration, column pruning — is production-shaped.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                # >>> real implementation goes here (PIL.Image.open etc.)
                raise NotImplementedError(
                    "image decode requires PIL/torchvision — not present in this environment"
                )
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[binary_col].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha256": pdf[binary_col].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "features": pdf[binary_col].map(
                        lambda b: _fake_features(b, dim) if b is not None else None
                    ),
                }
            )
            yield out

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("channel_means", T.ArrayType(T.DoubleType())),
        T.StructField("channel_stds", T.ArrayType(T.DoubleType())),
        T.StructField("phash", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_image_stats(df: DataFrame, id_col: str, binary_col: str, batch_hint: int = 256) -> DataFrame:
    """REAL image decode + features, no imaging library required: the
    stdlib+numpy codecs in :mod:`.imaging` (PNG / PPM / PGM / BMP)
    decode each payload inside an Arrow-batched ``mapInPandas`` and
    emit exact dimensions, per-channel mean/std, and a 64-bit DCT
    perceptual hash (duplicate pixels ⇒ identical hash). Payloads the
    codecs cannot handle (JPEG et al. — PIL territory) surface as
    ``decode_ok=false`` with the error message instead of failing the
    job: at 100 TB a corrupt or exotic file must cost one row, not a
    stage retry loop."""
    from . import imaging

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                rec = {
                    "id": int(i),
                    "n_bytes": len(b) if b is not None else 0,
                    "width": None,
                    "height": None,
                    "channels": None,
                    "channel_means": None,
                    "channel_stds": None,
                    "phash": None,
                    "decode_ok": False,
                    "error": None,
                }
                try:
                    px = imaging.decode_image(bytes(b))
                    h, w, ch, means, stds = imaging.image_stats(px)
                    rec.update(
                        width=w,
                        height=h,
                        channels=ch,
                        channel_means=means,
                        channel_stds=stds,
                        phash=imaging.phash(px),
                        decode_ok=True,
                    )
                except Exception as exc:  # corrupt/exotic payload -> one bad row
                    rec["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_audio_stats(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """REAL audio decode for WAV payloads (stdlib+numpy PCM decode in
    :mod:`.audio`) inside Arrow-batched ``mapInPandas``: duration,
    channels/rate, RMS energy, zero-crossing rate, spectral centroid —
    the silence/clipping/bandwidth descriptors corpus curation filters
    on. MP3/FLAC/OGG surface per-row as ``decode_ok=false`` naming the
    codec they need instead of failing the job."""
    from . import audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                rec = {f.name: None for f in AUDIO_STATS_SCHEMA.fields}
                rec.update(id=int(i), n_bytes=len(b) if b is not None else 0, decode_ok=False)
                try:
                    x, rate = audio.decode_audio(bytes(b))
                    rec.update(audio.audio_stats(x, rate), decode_ok=True)
                except Exception as exc:
                    rec["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("phash", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_video_frames(
    df: DataFrame, id_col: str, binary_col: str, every_n_ms: int = 1000
) -> DataFrame:
    """REAL video frame sampling for Y4M payloads (stdlib+numpy
    YUV4MPEG2 decode in :mod:`.video`): one output row per sampled
    frame — stream time, dimensions, and the frame's 64-bit DCT pHash
    (shot-boundary / duplicate-clip detection building block).
    MP4/WebM/AVI surface as a single ``decode_ok=false`` row naming
    the codec they need instead of failing the job."""
    from . import imaging, video

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                try:
                    for idx, t_ms, rgb in video.sample_frames(bytes(b), every_n_ms):
                        rows.append(
                            {
                                "id": int(i),
                                "frame_idx": idx,
                                "t_ms": t_ms,
                                "width": rgb.shape[1],
                                "height": rgb.shape[0],
                                "phash": imaging.phash(rgb),
                                "decode_ok": True,
                                "error": None,
                            }
                        )
                except Exception as exc:
                    rows.append(
                        {
                            "id": int(i),
                            "frame_idx": None,
                            "t_ms": None,
                            "width": None,
                            "height": None,
                            "phash": None,
                            "decode_ok": False,
                            "error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAMES_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, schema=VIDEO_FRAMES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    every_n_ms: int = 1000,
    decode_stub: Literal["fake", "raise"] = "fake",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame. The stub
    emits frame indices from payload length; a real build uses decord/ffmpeg."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_sha256", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("video decode requires decord/ffmpeg — not in this environment")
            rows = []
            for _, r in pdf.iterrows():
                payload = r[binary_col] or b""
                n_frames = max(1, min(8, len(payload) // max(every_n_ms, 1)))
                for i in range(n_frames):
                    rows.append(
                        {
                            "id": int(r[id_col]),
                            "frame_idx": i,
                            "frame_sha256": hashlib.sha256(payload + i.to_bytes(4, "little")).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_sha256"])

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, schema=schema)
