"""Ogg Vorbis: decoder vs the public spec's own worked examples, and
encode→decode SNR against the ORIGINAL signal (the analysis MDCT and
synthesis IMDCT are exact inverses, so this is not a mirrored round
trip — a sign/indexing bug in either half kills the SNR)."""

import numpy as np
import pytest

from iceberg_python_spark.operators.vorbis import (
    _ogg_crc,
    assign_codewords,
    decode_ogg_vorbis,
    encode_ogg_vorbis,
    float32_pack,
    float32_unpack,
    ilog,
    lookup1_values,
    ogg_packets,
)


def test_codeword_assignment_matches_spec_example():
    """Vorbis I spec §3.2.1 worked example: lengths [2,4,4,4,4,2,3,3]
    must yield exactly 00, 0100, 0101, 0110, 0111, 10, 110, 111."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    want = {
        0: (0b00, 2),
        1: (0b0100, 4),
        2: (0b0101, 4),
        3: (0b0110, 4),
        4: (0b0111, 4),
        5: (0b10, 2),
        6: (0b110, 3),
        7: (0b111, 3),
    }
    assert codes == want
    # sparse entries (length 0) are skipped, order otherwise preserved
    sp = assign_codewords([1, 0, 1])
    assert sp == {0: (0, 1), 2: (1, 1)}
    # over-specified books refuse loudly
    with pytest.raises(ValueError):
        assign_codewords([1, 1, 1])


def test_spec_helpers():
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]
    assert lookup1_values(256, 2) == 16
    assert lookup1_values(49, 2) == 7
    assert lookup1_values(50, 2) == 7
    for v in (0.0, 1.0, -1.0, 5.0, -722.0, 0.5, 1.5):
        assert float32_unpack(float32_pack(v)) == v


def test_ogg_crc_and_packets_roundtrip():
    data = encode_ogg_vorbis(np.zeros(512), 8000, blocksize=128)
    pkts = ogg_packets(data)
    assert pkts[0][:7] == b"\x01vorbis"
    assert pkts[1][:7] == b"\x03vorbis"
    assert pkts[2][:7] == b"\x05vorbis"
    # flip one payload byte: the page CRC must catch it
    bad = bytearray(data)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        list(ogg_packets(bytes(bad)))
    with pytest.raises(ValueError):
        list(ogg_packets(data[: len(data) // 2] + b"junk"))
    # CRC sanity: empty vs nonempty differ and are stable
    assert _ogg_crc(b"OggS") == _ogg_crc(b"OggS")
    assert _ogg_crc(b"a") != _ogg_crc(b"b")


def _snr(ref: np.ndarray, got: np.ndarray) -> float:
    e = ref - got
    return 10.0 * np.log10(np.sum(ref**2) / max(np.sum(e**2), 1e-30))


def test_mono_tone_snr_and_structure():
    rate, n = 8000, 2048
    t = np.arange(n)
    x = 0.6 * np.sin(2 * np.pi * 440.0 * t / rate)
    data = encode_ogg_vorbis(x, rate, blocksize=256, q_bits=8)
    y, got_rate = decode_ogg_vorbis(data)
    assert got_rate == rate and y.shape[1] == 1
    m = min(len(x), len(y))
    assert m >= n  # padding may round up, never truncate the signal
    snr = _snr(x[:m], y[:m, 0])
    assert snr > 25.0, f"SNR {snr:.1f} dB"
    # the decoded tone's dominant FFT bin matches the input frequency
    spec = np.abs(np.fft.rfft(y[:n, 0]))
    peak_hz = np.argmax(spec) * rate / n
    assert abs(peak_hz - 440.0) < rate / n + 1e-9


def test_silence_decodes_to_silence():
    y, _ = decode_ogg_vorbis(encode_ogg_vorbis(np.zeros(1024), 16000, blocksize=256))
    assert np.max(np.abs(y)) < 1e-12


def test_stereo_residue1_independent_channels():
    rate, n = 16000, 1536
    t = np.arange(n)
    left = 0.5 * np.sin(2 * np.pi * 300.0 * t / rate)
    right = 0.4 * np.sin(2 * np.pi * 1200.0 * t / rate)
    x = np.stack([left, right], axis=1)
    y, _ = decode_ogg_vorbis(encode_ogg_vorbis(x, rate, blocksize=256, q_bits=8))
    m = min(n, len(y))
    assert _snr(left[:m], y[:m, 0]) > 25.0
    assert _snr(right[:m], y[:m, 1]) > 25.0
    # channels are genuinely independent
    assert _snr(left[:m], y[:m, 1]) < 6.0


def test_coupled_stereo_square_polar():
    """Residue type 2 + one coupling step: magnitude carries the mono
    mix, angle is zero — decode must produce identical L/R tracking
    the mono content."""
    rate, n = 8000, 1024
    t = np.arange(n)
    mono = 0.5 * np.sin(2 * np.pi * 500.0 * t / rate)
    x = np.stack([mono, mono], axis=1)
    y, _ = decode_ogg_vorbis(encode_ogg_vorbis(x, rate, blocksize=256, q_bits=8, coupling=True))
    m = min(n, len(y))
    assert np.allclose(y[:m, 0], y[:m, 1], atol=1e-12)
    assert _snr(mono[:m], y[:m, 0]) > 25.0


def test_decode_audio_routes_ogg():
    from iceberg_python_spark.operators.audio import decode_audio

    data = encode_ogg_vorbis(0.3 * np.sin(np.arange(512) * 0.2), 8000, blocksize=128)
    y, rate = decode_audio(data)
    assert rate == 8000 and y.ndim == 2
    # MP3 stays a loud, documented gate
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_audio(b"\xff\xfb\x90\x00" + b"\0" * 64)


def test_crafted_streams_raise_valueerror():
    good = encode_ogg_vorbis(np.zeros(256), 8000, blocksize=128)
    # non-vorbis payload in the first packet
    with pytest.raises(ValueError):
        decode_ogg_vorbis(good.replace(b"\x01vorbis", b"\x01sibrov", 1))
    # truncations at every page boundary must raise, never hang/allocate
    for cut in (3, 20, 30, len(good) // 2):
        with pytest.raises(ValueError):
            decode_ogg_vorbis(good[:cut])


def test_mixed_long_short_blocks():
    """Two-mode stream: long blocks window-flag-shaped against short
    neighbors, variable-start overlap-add (a short-to-long transition
    reaches BEFORE the previous block's origin), and floor1's
    partition/class/sub-book path. TDAC holds across every transition
    — SNR against the original stays quantization-bounded."""
    from iceberg_python_spark.operators.vorbis import encode_ogg_vorbis_mixed

    rate = 8000
    t = np.arange(2000)
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t / rate)
    for pattern in ((1, 0), (1, 1, 0, 0, 1), (0, 0, 0)):
        data = encode_ogg_vorbis_mixed(
            x, rate, long_blocksize=256, short_blocksize=64,
            pattern=pattern, q_bits=10,
        )
        y, r = decode_ogg_vorbis(data)
        assert r == rate and len(y) >= len(x)
        snr = _snr(x, y[: len(x), 0])
        assert snr > 30.0, f"pattern {pattern}: SNR {snr:.1f} dB"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.integers(0, 200))
def test_vorbis_garbage_never_allocates_or_hangs(junk, cut):
    """Crafted-input contract: arbitrary bytes, or a valid stream with
    junk spliced in, must raise ValueError/NotImplementedError — never
    MemoryError, RecursionError, or a silent wrong decode."""
    good = encode_ogg_vorbis(np.zeros(256), 8000, blocksize=128)
    for payload in (junk, b"OggS" + junk, good[: cut % len(good)] + junk):
        try:
            decode_ogg_vorbis(payload)
        except (ValueError, NotImplementedError):
            pass


def test_fingerprint_family_rides_vorbis():
    """The audio near-dup family consumes decode_audio output, so a
    clip stored as WAV and the SAME clip re-encoded as Ogg Vorbis must
    produce overwhelmingly matching fingerprint frame hashes — the
    whole point of near-dup detection across container re-encodes."""
    from iceberg_python_spark.operators.audio import decode_audio, encode_wav
    from iceberg_python_spark.operators.audiofp import fingerprint_samples

    rate = 8000
    rng = np.random.RandomState(3)
    t = np.arange(8192)
    # a multi-tone "music-like" clip (fingerprints need band structure)
    x = sum(a * np.sin(2 * np.pi * f * t / rate) for a, f in
            [(0.3, 410.0), (0.2, 950.0), (0.15, 1700.0)])
    x += 0.02 * rng.randn(len(t))
    wav_dec, r1 = decode_audio(encode_wav(x, rate))
    ogg_dec, r2 = decode_audio(encode_ogg_vorbis(x, rate, blocksize=256, q_bits=10))
    f1 = fingerprint_samples(wav_dec, r1)
    f2 = fingerprint_samples(ogg_dec[: len(wav_dec)], r2)
    m = min(len(f1), len(f2))
    assert m > 10
    # per-frame BIT agreement (the near-dup metric): marginal band
    # deltas flip individual sign bits under the -50 dB codec noise,
    # so exact 31-bit equality is the wrong bar across a lossy
    # re-encode — bit similarity is what the Hamming-style matcher
    # consumes
    xor = np.bitwise_xor(f1[:m], f2[:m])
    diff_bits = np.array([bin(int(v)).count("1") for v in xor])
    agreement = 1.0 - diff_bits.mean() / 31.0
    assert agreement > 0.93, f"bit agreement {agreement:.2%} across containers"
    # and a genuinely different clip is far away
    other = 0.4 * np.sin(2 * np.pi * 2600.0 * t / rate)
    f3 = fingerprint_samples(other, rate)
    xor3 = np.bitwise_xor(f1[: min(m, len(f3))], f3[: min(m, len(f3))])
    far = np.array([bin(int(v)).count("1") for v in xor3]).mean() / 31.0
    assert far > 0.2, f"unrelated clip too close: {1 - far:.2%}"


def test_residue_classwords_decode_even_without_pass0_books():
    """Spec §8.6.2: pass 0 ALWAYS decodes the classwords, even when
    every cascade's pass-0 bit is clear — a stream whose books live
    only in pass 1 must not desync. Hand-built residue + bitstream."""
    from iceberg_python_spark.operators.vorbis import (
        Codebook,
        Residue,
        _BitReader,
        _BitWriter,
        _decode_residue_core,
        _wcode,
    )

    classbook = Codebook(dims=2, entries=4, lengths=[2, 2, 2, 2], lookup_type=0)
    # 2-dim VQ book: vectors (-1,-1), (0,0), (1,1), (-1,1)
    values = Codebook(
        dims=2, entries=4, lengths=[2, 2, 2, 2], lookup_type=2,
        min_v=-1.0, delta_v=1.0, mults=[0, 0, 1, 1, 2, 2, 0, 2], value_bits=2,
    )

    class _R:
        rtype = 1
        begin, end, part_size = 0, 8, 4
        classifications = 2
        classbook = 0
        cascades = [0b10, 0b10]  # books in pass 1 ONLY
        books = [[-1, 1] + [-1] * 6, [-1, 1] + [-1] * 6]

    bw = _BitWriter()
    _wcode(bw, *classbook.codes[1])  # classes (0, 1): temp = 0*2+1
    for e in (1, 2, 3, 0):  # partition 0: (0,0),(1,1); partition 1: (-1,1),(-1,-1)
        _wcode(bw, *values.codes[e])
    out = _decode_residue_core(_R(), _BitReader(bw.bytes_()), [classbook, values], [False], 8)
    assert out.shape == (1, 8)
    assert out[0].tolist() == [0, 0, 1, 1, -1, 1, -1, -1]


def test_residue_write_clamps_at_n():
    """ADVICE r15: a value codebook whose dims do NOT divide part_size
    must not overrun the row — writes clamp at n (libvorbis behavior)
    instead of raising numpy IndexError past the crafted-input
    contract."""
    from iceberg_python_spark.operators.vorbis import (
        Codebook,
        Residue,
        _BitReader,
        _decode_residue_core,
    )

    classbook = Codebook(dims=1, entries=1, lengths=[1], lookup_type=0)
    # dims=3 vs part_size=4: each partition's 2nd vector writes
    # off+3..off+5; the LAST partition's reaches n+1 without the clamp
    values = Codebook(
        dims=3, entries=2, lengths=[1, 1], lookup_type=2,
        min_v=1.0, delta_v=0.0, mults=[0] * 6, value_bits=1,
    )

    class _R:
        rtype = 1
        begin, end, part_size = 0, 8, 4
        classifications = 1
        classbook = 0
        cascades = [1]  # pass 0 only
        books = [[1] + [-1] * 7]

    out = _decode_residue_core(
        _R(), _BitReader(b"\x00\x00"), [classbook, values], [False], 8
    )
    assert out.shape == (1, 8)
    # every vector is [1,1,1]; partition 0 covers 0..5, partition 1
    # covers 4..8 with 8 clamped away
    assert out[0].tolist() == [1, 1, 1, 1, 2, 2, 1, 1]


def test_ogg_granules_are_cumulative_pcm_positions():
    """ADVICE r15: fixture granule positions are the spec's cumulative
    complete-PCM-sample counts (header pages 0, final page == decoded
    length), so real Ogg tools — and the repo's own probe — read the
    true duration."""
    from iceberg_python_spark.operators.probe import probe_media
    from iceberg_python_spark.operators.vorbis import encode_ogg_vorbis_mixed, ogg_pages

    x = 0.5 * np.sin(2 * np.pi * 440.0 * np.arange(2000) / 8000)
    for data, rate in (
        (encode_ogg_vorbis(x, 8000, blocksize=128), 8000),
        (encode_ogg_vorbis_mixed(x, 8000, long_blocksize=256,
                                 short_blocksize=64, pattern=(1, 1, 0, 0, 1),
                                 q_bits=10), 8000),
    ):
        y, r = decode_ogg_vorbis(data)
        grans = [g for _h, g, _s, _q, _segs in ogg_pages(data)]
        assert grans[0] == grans[1] == grans[2] == 0  # header pages
        assert all(b >= a for a, b in zip(grans, grans[1:]))
        assert grans[-1] == len(y)  # final granule == complete samples
        assert probe_media(data)["duration_ms"] == int(len(y) * 1000 / rate)


def test_short_first_block_decodes_and_trims_correctly():
    """A stream whose FIRST block is short followed by long blocks
    extends the overlap-add timeline before the origin; the trim must
    use absolute centers (r16 incremental overlap-add rewrite) and the
    final granule must still equal the decoded length."""
    from iceberg_python_spark.operators.vorbis import encode_ogg_vorbis_mixed, ogg_pages

    x = 0.5 * np.sin(2 * np.pi * 440.0 * np.arange(2000) / 8000)
    data = encode_ogg_vorbis_mixed(
        x, 8000, long_blocksize=256, short_blocksize=64,
        pattern=(0, 1, 1), q_bits=10,
    )
    y, r = decode_ogg_vorbis(data)
    assert r == 8000 and len(y) >= len(x)
    snr = _snr(x, y[: len(x), 0])
    assert snr > 30.0, f"SNR {snr:.1f} dB"
    grans = [g for _h, g, _s, _q, _segs in ogg_pages(data)]
    assert grans[-1] == len(y)


def test_render_line_truncating_division_matches_spec():
    """r16 review: the spec/libvorbis render_line divides TRUNCATING
    toward zero; Python floor division mis-rendered every negative-
    slope segment where adx does not divide dy. Pin the worked
    sequence: (0,10)->(8,7) renders y = 10,10,10,9,9,9,8,8."""
    from iceberg_python_spark.operators.vorbis import _INV_DB, _render_line

    out = np.zeros(8)
    _render_line(0, 10, 8, 7, out, 8)
    want = [10, 10, 10, 9, 9, 9, 8, 8]
    assert np.allclose(out, _INV_DB[want])
    # ascending slope for symmetry: (0,7)->(8,10) -> 7,7,7,8,8,8,9,9
    out = np.zeros(8)
    _render_line(0, 7, 8, 10, out, 8)
    assert np.allclose(out, _INV_DB[[7, 7, 7, 8, 8, 8, 9, 9]])
    # crafted out-of-range y values clamp instead of wrapping/crashing
    out = np.zeros(8)
    _render_line(0, -300, 8, 7, out, 8)
    assert out[0] == _INV_DB[0]
    _render_line(0, 5000, 8, 7, out, 8)
    assert out[0] == _INV_DB[255]


def test_imdct_fft_matches_direct_matrix_all_blocksizes():
    """The O(n log n) FFT IMDCT equals the direct cosine-matrix sum to
    float64 round-off at every legal Vorbis block size."""
    from iceberg_python_spark.operators.vorbis import _imdct, _imdct_ref

    rng = np.random.default_rng(16)
    for n2 in (32, 64, 128, 256, 1024, 4096):
        x = rng.standard_normal(n2)
        assert np.abs(_imdct(x) - _imdct_ref(x)).max() < 1e-9 * max(1, n2 / 64)


def test_end_of_packet_is_nominal_and_zero_length_packets_skip():
    """Vorbis I §1.3.2: end-of-packet during AUDIO decode is a nominal
    occurrence (partial data stands); zero-length Ogg packets are
    legal and skipped. Header truncation stays a hard ValueError."""
    from iceberg_python_spark.operators.vorbis import _ogg_wrap, ogg_packets

    x = 0.5 * np.sin(2 * np.pi * 440.0 * np.arange(2000) / 8000)
    good = encode_ogg_vorbis(x, 8000, blocksize=128, q_bits=10)
    pkts = ogg_packets(good)
    # truncate the FINAL audio packet mid-body: decode still succeeds,
    # losing at most that block's contribution
    cut = pkts[:-1] + [pkts[-1][: max(1, len(pkts[-1]) // 2)]]
    y, rate = decode_ogg_vorbis(_ogg_wrap(cut))
    assert rate == 8000 and len(y) > 0
    # a zero-length packet mid-stream is skipped, not fatal
    with_zero = pkts[:4] + [b""] + pkts[4:]
    y2, _ = decode_ogg_vorbis(_ogg_wrap(with_zero))
    assert len(y2) > 0
    # truncating a HEADER packet stays a hard error
    with pytest.raises(ValueError):
        decode_ogg_vorbis(_ogg_wrap([pkts[0][:10]] + pkts[1:]))


def test_decode_truncates_to_terminal_granule():
    """Spec App. A: the terminal granule states the true sample count;
    the decoder truncates the final block's lap padding — decode of an
    encoder fixture returns EXACTLY the input length, including lengths
    that are not a multiple of the block grid."""
    for n_in in (2000, 3200, 777):
        x = 0.5 * np.sin(2 * np.pi * 440.0 * np.arange(n_in) / 8000)
        y, _ = decode_ogg_vorbis(encode_ogg_vorbis(x, 8000, blocksize=128, q_bits=10))
        assert len(y) == n_in, n_in


def test_reserved_floor_type_is_valueerror_floor0_is_gate():
    """Floor type 0 (LSP) is a recognized spec feature -> loud
    NotImplementedError; types >= 2 are reserved -> malformed stream
    -> ValueError (the decode_audio routing contract depends on it)."""
    from iceberg_python_spark.operators.vorbis import _ogg_wrap, ogg_packets

    good = encode_ogg_vorbis(np.zeros(256), 8000, blocksize=128)
    pkts = ogg_packets(good)
    setup = bytearray(pkts[2])

    def flip_floor_type(value):
        # the floor-type field is the 16 bits after: 8(bookcount) +
        # codebook bits + 6(time count)+16(time)+6(floor count); easier:
        # decode with a patched _BitReader is overkill — instead patch
        # via parse: find it by brute force is fragile, so go through
        # the module's own parser by monkeypatching is also overkill.
        # Simplest robust route: craft a minimal setup packet directly.
        from iceberg_python_spark.operators.vorbis import _BitWriter, _wcode

        bw = _BitWriter()
        bw.write(0, 8)  # 1 codebook
        bw.write(0x564342, 24)
        bw.write(1, 16)  # dims
        bw.write(1, 24)  # entries
        bw.write(0, 1)  # not ordered
        bw.write(0, 1)  # not sparse
        bw.write(0, 5)  # length 1
        bw.write(0, 4)  # lookup 0
        bw.write(0, 6)  # 1 time transform
        bw.write(0, 16)
        bw.write(0, 6)  # 1 floor
        bw.write(value, 16)  # floor type under test
        return b"\x05vorbis" + bw.bytes_()

    with pytest.raises(NotImplementedError, match="LSP"):
        decode_ogg_vorbis(_ogg_wrap([pkts[0], pkts[1], flip_floor_type(0), b"\x00"]))
    with pytest.raises(ValueError, match="reserved floor type"):
        decode_ogg_vorbis(_ogg_wrap([pkts[0], pkts[1], flip_floor_type(7), b"\x00"]))
