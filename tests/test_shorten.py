"""Shorten v2 codec: exact round trips for every command, the SPHERE
embedded path, and the loud gates."""

import numpy as np
import pytest

from iceberg_python_spark.operators.shorten import (
    FN_DIFF0,
    FN_DIFF1,
    FN_DIFF2,
    FN_DIFF3,
    FN_QLPC,
    FN_ZERO,
    TYPE_S16LH,
    TYPE_ULAW,
    decode_shorten,
    encode_shorten,
)


def _walk(n=1000, seed=7):
    rng = np.random.RandomState(seed)
    return np.cumsum(rng.randint(-50, 51, size=n)).astype(np.int32)


@pytest.mark.parametrize(
    "cmds",
    [[FN_DIFF0], [FN_DIFF1], [FN_DIFF2], [FN_DIFF3], [FN_DIFF1, FN_DIFF2, FN_DIFF3, FN_DIFF0]],
)
def test_diff_commands_roundtrip_exact(cmds):
    x = _walk()
    dec, ftype = decode_shorten(encode_shorten(x, blocksize=256, commands=cmds))
    assert ftype == TYPE_S16LH
    assert dec.shape == (1000, 1) and np.array_equal(dec[:, 0], x)


def test_stereo_nmean_verbatim_roundtrip():
    x = _walk()
    st = np.stack([x, -x], axis=1)
    enc = encode_shorten(
        st, blocksize=128, nmean=4, commands=[FN_DIFF0, FN_DIFF1], verbatim=b"NIST_1A hdr"
    )
    dec, _ = decode_shorten(enc)
    assert np.array_equal(dec, st)


def test_zero_bitshift_and_tail_block():
    z = np.zeros(633, dtype=np.int32)  # non-multiple length -> FN_BLOCKSIZE tail
    z[100:200] = _walk(100)
    dec, _ = decode_shorten(encode_shorten(z, blocksize=100, commands=[FN_ZERO, FN_DIFF1]))
    assert np.array_equal(dec[:, 0], z)
    xb = (_walk().astype(np.int64) << 2).astype(np.int32)
    dec, _ = decode_shorten(encode_shorten(xb, blocksize=256, bitshift=2))
    assert np.array_equal(dec[:, 0], xb)
    with pytest.raises(ValueError, match="low bits"):
        encode_shorten(np.array([1], dtype=np.int32), bitshift=2)


def test_qlpc_roundtrip_with_and_without_means():
    x = _walk()
    dec, _ = decode_shorten(
        encode_shorten(x, blocksize=200, commands=[FN_QLPC, FN_DIFF2], qlpc=[60, -28])
    )
    assert np.array_equal(dec[:, 0], x)
    dec, _ = decode_shorten(
        encode_shorten(x + 5000, blocksize=250, commands=[FN_QLPC], qlpc=[40, -10], nmean=2)
    )
    assert np.array_equal(dec[:, 0], x + 5000)


def test_compresses_tonal_audio():
    t = np.arange(4000)
    s = np.round(3000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int32)
    enc = encode_shorten(s, commands=[FN_DIFF2])
    assert len(enc) < 2 * len(s) * 0.8  # < 80% of raw int16 bytes


def test_gates_and_corruption():
    with pytest.raises(ValueError, match="ajkg"):
        decode_shorten(b"RIFF1234")
    with pytest.raises(NotImplementedError, match="version"):
        decode_shorten(b"ajkg\x01" + b"\x00" * 32)
    enc = encode_shorten(_walk(), ftype=TYPE_ULAW)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_shorten(enc[: len(enc) // 3])  # truncated stream


def test_sphere_embedded_shorten_spark_surface(spark):
    """The Arrow-batched extract_audio_stats path decodes shortened
    SPHERE payloads end-to-end (the TIMIT shape)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from iceberg_python_spark.operators.audio import encode_sphere
    from iceberg_python_spark.operators.multimodal import extract_audio_stats

    ids = spark.range(24).select(F.col("id").alias("doc_id"))

    def gen(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype(int):
                t = np.arange(1600) / 8000.0
                x = 0.4 * np.sin(2 * np.pi * (300 + 10 * d) * t)
                rows.append(encode_sphere(x, 8000, coding="shorten"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": rows})

    au = ids.mapInPandas(gen, schema="doc_id long, payload binary")
    stats = extract_audio_stats(au, "doc_id", "payload")
    got = stats.agg(
        F.min("decode_ok").alias("ok"),
        F.min("sample_rate").alias("rate"),
        F.min("duration_ms").alias("ms"),
    ).first()
    assert got["ok"] and got["rate"] == 8000 and got["ms"] == 200


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    data=st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600),
    nchan=st.sampled_from([1, 2]),
    blocksize=st.sampled_from([16, 100, 256]),
    nmean=st.sampled_from([0, 2, 4]),
    cmds=st.lists(
        st.sampled_from([FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3, FN_ZERO]),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=60, deadline=None)
def test_shorten_roundtrip_property(data, nchan, blocksize, nmean, cmds):
    """Any int16 signal, channel count, block size, mean window and
    command mix round-trips exactly (the decoder is the encoder's
    inverse by construction — and both follow the published spec, so
    a conforming third decoder reads the same stream)."""
    n = len(data) - len(data) % nchan
    if n == 0:
        n, data = nchan, data * nchan
    x = np.array(data[:n], dtype=np.int32).reshape(-1, nchan)
    enc = encode_shorten(x, blocksize=blocksize, nmean=nmean, commands=cmds)
    dec, _ = decode_shorten(enc)
    assert dec.shape == x.shape and np.array_equal(dec, x)


def test_crafted_header_raises_not_allocates():
    """A crafted header requesting absurd blocksize/channels raises
    ValueError instead of attempting a huge allocation (MemoryError
    would escape the codec family's per-payload error capture)."""
    from iceberg_python_spark.operators.shorten import _BitWriter, _MAGIC

    def stream(ftype=5, nchan=1, blocksize=1 << 40, maxnlpc=0, nmean=0, nskip=0):
        bw = _BitWriter()
        for v in (ftype, nchan, blocksize, maxnlpc, nmean, nskip):
            bw.ulong(v)
        return _MAGIC + bytes([2]) + bw.bytes_()

    with pytest.raises(ValueError, match="blocksize"):
        decode_shorten(stream())
    with pytest.raises(ValueError, match="channel_count"):
        decode_shorten(stream(blocksize=256, nchan=10_000))
    with pytest.raises(ValueError, match="implausible header"):
        decode_shorten(stream(blocksize=256, maxnlpc=1 << 30))


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=120, deadline=None)
def test_shorten_garbage_never_allocates_or_hangs(payload):
    """Fuzz: arbitrary bytes after the magic either decode or raise
    ValueError/NotImplementedError — never MemoryError, never a hang."""
    try:
        decode_shorten(b"ajkg\x02" + payload)
    except (ValueError, NotImplementedError):
        pass


def test_c_division_semantics_negative_dc_pin():
    """ADVICE r14 #2: shorten.c computes running-mean offsets with C
    division (truncate toward zero); Python // floors and differs by 1
    on negative block sums. Round trips can't catch it (the encoder
    mirrored the decoder), so this HANDCRAFTED stream pins the decoder
    against sample values computed independently with C semantics:
    three DIFF0 blocks with negative DC, nmean=4. Under floor division
    block 3 would decode as [-2]*4 instead of [-1]*4."""
    from iceberg_python_spark.operators.shorten import (
        ENERGYSIZE,
        FNSIZE,
        FN_QUIT,
        _MAGIC,
        _BitWriter,
    )

    bw = _BitWriter()
    for v in (TYPE_S16LH, 1, 4, 0, 4, 0):  # ftype nchan blocksize maxnlpc nmean nskip
        bw.ulong(v)
    for residuals, resn in (([-7] * 4, 3), ([-1] * 4, 1), ([0] * 4, 0)):
        bw.uvar(FN_DIFF0, FNSIZE)
        bw.uvar(resn, ENERGYSIZE)
        for r in residuals:
            bw.var(r, resn)
    bw.uvar(FN_QUIT, FNSIZE)
    stream = _MAGIC + bytes([2]) + bw.bytes_()

    x, ftype = decode_shorten(stream)
    assert ftype == TYPE_S16LH
    # block1: offsets [0,0,0,0] -> coffset trunc((2+0)/4)=0 -> [-7]*4,
    #   update trunc((2-28)/4) = -6 (floor: -7)
    # block2: coffset trunc((2-6)/4) = -1 -> [-2]*4,
    #   update trunc((2-8)/4) = -1 (floor: -2)
    # block3: coffset trunc((2+0+0-6-1)/4) = trunc(-1.25) = -1 -> [-1]*4
    #   (floor(-1.25) = -2 -> [-2]*4: the bug this test pins out)
    assert x[:, 0].tolist() == [-7] * 4 + [-2] * 4 + [-1] * 4


def test_u8_offset_initializes_to_half_range():
    """shorten.c init_offset: unsigned types bias the initial running
    mean to half range (0x80 for TYPE_U8), not 0 — a DIFF0 block of
    zero residuals with nmean=0 decodes to 128s."""
    from iceberg_python_spark.operators.shorten import (
        ENERGYSIZE,
        FNSIZE,
        FN_QUIT,
        TYPE_U8,
        _MAGIC,
        _BitWriter,
    )

    bw = _BitWriter()
    for v in (TYPE_U8, 1, 4, 0, 0, 0):
        bw.ulong(v)
    bw.uvar(FN_DIFF0, FNSIZE)
    bw.uvar(0, ENERGYSIZE)
    for _ in range(4):
        bw.var(0, 0)
    bw.uvar(FN_QUIT, FNSIZE)
    x, ftype = decode_shorten(_MAGIC + bytes([2]) + bw.bytes_())
    assert ftype == TYPE_U8
    assert x[:, 0].tolist() == [0x80] * 4
    # and the encoder mirrors the init: U8 round trip stays exact
    data = (np.arange(64) % 200 + 20).astype(np.int32)
    y, ft = decode_shorten(encode_shorten(data, ftype=TYPE_U8, nmean=4, blocksize=16))
    assert ft == TYPE_U8 and np.array_equal(y[:, 0], data)
