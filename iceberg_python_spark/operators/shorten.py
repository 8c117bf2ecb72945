"""Shorten ("ajkg") lossless audio decoder + spec-faithful encoder.

The codec NIST SPHERE embeds for the classic LDC speech corpora
(TIMIT / Switchboard ship as ``sample_coding pcm,embedded-shorten``):
Tony Robinson's shorten 2.x — fixed linear predictors (DIFF0..3) or
quantized LPC over per-channel blocks, Rice-coded residuals, optional
running-mean offsets and bit-shift, all in an MSB-first bitstream of
big-endian 32-bit words. Implemented from the published format
(Robinson, "SHORTEN: simple lossless and near-lossless waveform
compression", Cambridge TR156, 1994; the shorten-2.x/ffmpeg field
layout): version 2 streams, the ones sph2pipe produces.

This was the reference's loudest codec gate (``decode_sphere`` raised
``NotImplementedError`` on the DOMINANT TIMIT payload); the FLAC
class of work, same shape: per-payload pure-Python entropy decode
inside the Arrow-batched codec family, exact integer output.

The encoder exists so oracle rows can synthesize deterministic
shortened payloads and assert EXACT integer round-trips; it mirrors
the decoder's state machine (offsets, wrap, bitshift) and emits
DIFF0..3, ZERO, QLPC, BLOCKSIZE, BITSHIFT and VERBATIM commands.

Version-1 streams and the headerless µ-law AU types are gated loudly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_MAGIC = b"ajkg"

# command codes (shorten 2.x / ffmpeg enum order)
FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3 = 0, 1, 2, 3
FN_QUIT, FN_BLOCKSIZE, FN_BITSHIFT, FN_QLPC, FN_ZERO, FN_VERBATIM = 4, 5, 6, 7, 8, 9

# field widths (bits of the Rice k-part for each header/command field)
TYPESIZE, CHANSIZE, ULONGSIZE, NSKIPSIZE = 4, 0, 2, 1
LPCQSIZE, LPCQUANT, XBYTESIZE = 2, 5, 7
ENERGYSIZE, BITSHIFTSIZE, FNSIZE = 3, 2, 2
VERBATIM_CKSIZE_SIZE, VERBATIM_BYTE_SIZE = 5, 8
NWRAP = 3
DEFAULT_BLOCKSIZE = 256

# sample types (shorten.h)
TYPE_AU1, TYPE_S8, TYPE_U8 = 0, 1, 2
TYPE_S16HL, TYPE_U16HL, TYPE_S16LH, TYPE_U16LH = 3, 4, 5, 6
TYPE_ULAW, TYPE_AU2, TYPE_AU3, TYPE_ALAW = 7, 8, 9, 10


class _BitReader:
    """MSB-first reader over big-endian 32-bit words (shorten's
    word_get/getbit): the byte stream is consumed 4 bytes at a time,
    bits leave from the top. Short tails zero-pad (encoders pad the
    final word)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.word = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            w = self.data[self.pos : self.pos + 4]
            if not w:
                raise ValueError("shorten: bitstream exhausted")
            self.word = int.from_bytes(w.ljust(4, b"\0"), "big")
            self.pos += 4
            self.nbits = 32
        self.nbits -= 1
        return (self.word >> self.nbits) & 1

    def uvar(self, k: int) -> int:
        n = 0
        while not self.bit():
            n += 1
        for _ in range(k):
            n = (n << 1) | self.bit()
        return n

    def var(self, k: int) -> int:
        u = self.uvar(k + 1)
        return ~(u >> 1) if (u & 1) else (u >> 1)

    def ulong(self) -> int:
        return self.uvar(self.uvar(ULONGSIZE))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.word = 0
        self.nbits = 0

    def bit(self, b: int) -> None:
        self.word = (self.word << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == 32:
            self.out += self.word.to_bytes(4, "big")
            self.word, self.nbits = 0, 0

    def uvar(self, v: int, k: int) -> None:
        hi = v >> k
        lo = v & ((1 << k) - 1) if k else 0
        for _ in range(hi):
            self.bit(0)
        self.bit(1)
        for i in range(k - 1, -1, -1):
            self.bit((lo >> i) & 1)

    def var(self, v: int, k: int) -> None:
        self.uvar((~v << 1) | 1 if v < 0 else v << 1, k + 1)

    def ulong(self, v: int) -> None:
        # any k with v >> k small is valid; bit_length keeps the unary
        # part to the single terminating bit (shorten's ulong_put)
        k = v.bit_length() if v else 0
        self.uvar(k, ULONGSIZE)
        self.uvar(v, k)

    def bytes_(self) -> bytes:
        if self.nbits:
            self.out += (self.word << (32 - self.nbits)).to_bytes(4, "big")
            self.word, self.nbits = 0, 0
        return bytes(self.out)


def _rounded_shift_down(x: int, n: int) -> int:
    return x if n == 0 else ((x >> (n - 1)) + 1) >> 1


def _c_div(a: int, b: int) -> int:
    """C integer division: truncate toward zero. shorten.c computes
    the running-mean offsets with C ``/``; Python ``//`` floors and
    differs by 1 whenever the quotient is negative (negative-DC
    speech blocks) — using it would decode DIFF0/QLPC blocks wrong vs
    sph2pipe while our own round trips still passed, since the
    encoder mirrored the same bug (ADVICE r14 #2)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _init_offset(ftype: int) -> int:
    """Initial running-mean offset per sample type (shorten.c
    ``init_offset``): unsigned types bias to half range, signed and
    companded types to 0."""
    if ftype == TYPE_U8:
        return 0x80
    if ftype in (TYPE_U16HL, TYPE_U16LH):
        return 0x8000
    return 0


def decode_shorten(data: bytes) -> Tuple[np.ndarray, int]:
    """Shorten stream → ``(int32 samples (n_frames, n_channels),
    ftype)``. Samples are the codec's raw integers — the container
    (SPHERE) owns rate and the float mapping. Exact: every predictor,
    offset and shift is integer arithmetic."""
    if data[:4] != _MAGIC:
        raise ValueError("not a shorten (ajkg) stream")
    version = data[4]
    if version != 2:
        raise NotImplementedError(f"shorten version {version} (only v2 streams)")
    br = _BitReader(data[5:])
    ftype = br.ulong()
    if ftype in (TYPE_AU1, TYPE_AU2, TYPE_AU3):
        raise NotImplementedError(f"shorten headerless-AU ftype {ftype}")
    nchan = br.ulong()
    blocksize = br.ulong()
    maxnlpc = br.ulong()
    nmean = br.ulong()
    nskip = br.ulong()
    # header sanity caps: a crafted stream must raise ValueError, not
    # allocate a 2^60-element buffer (MemoryError would escape the
    # codec family's per-payload error capture) — same contract as the
    # PDF cycle guards. Real shorten streams sit far below these.
    if not 1 <= nchan <= 64:
        raise ValueError(f"shorten: implausible channel_count {nchan}")
    if not 1 <= blocksize <= 1 << 20:
        raise ValueError(f"shorten: implausible blocksize {blocksize}")
    if maxnlpc > 1024 or nmean > 1 << 16 or nskip > 1 << 20:
        raise ValueError("shorten: implausible header (maxnlpc/nmean/nskip)")
    for _ in range(nskip):
        br.uvar(XBYTESIZE)
    lpcqoffset = 1 << (LPCQUANT - 1)
    nwrap = max(NWRAP, maxnlpc)
    # per-channel history buffers: [wrap | block]
    bufs = [np.zeros(nwrap + blocksize, dtype=np.int64) for _ in range(nchan)]
    offsets = [[_init_offset(ftype)] * max(nmean, 1) for _ in range(nchan)]
    out: List[List[np.ndarray]] = [[] for _ in range(nchan)]
    chan, bitshift = 0, 0
    while True:
        cmd = br.uvar(FNSIZE)
        if cmd == FN_QUIT:
            break
        if cmd == FN_BLOCKSIZE:
            nb = br.ulong()
            if nb > blocksize or nb <= 0:
                raise ValueError("shorten: FN_BLOCKSIZE grew the block")
            blocksize = nb
            continue
        if cmd == FN_BITSHIFT:
            bitshift = br.uvar(BITSHIFTSIZE)
            continue
        if cmd == FN_VERBATIM:
            for _ in range(br.uvar(VERBATIM_CKSIZE_SIZE)):
                br.uvar(VERBATIM_BYTE_SIZE)
            continue
        if cmd not in (FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3, FN_QLPC, FN_ZERO):
            raise ValueError(f"shorten: unknown command {cmd}")
        buf = bufs[chan]
        resn = 0 if cmd == FN_ZERO else br.uvar(ENERGYSIZE)
        if nmean == 0:
            coffset = offsets[chan][0]
        else:
            s = nmean // 2 + sum(offsets[chan])
            coffset = _rounded_shift_down(_c_div(s, nmean), bitshift)
        w = nwrap
        if cmd == FN_ZERO:
            buf[w : w + blocksize] = 0
        elif cmd == FN_DIFF0:
            for i in range(blocksize):
                buf[w + i] = br.var(resn) + coffset
        elif cmd == FN_DIFF1:
            for i in range(blocksize):
                buf[w + i] = br.var(resn) + buf[w + i - 1]
        elif cmd == FN_DIFF2:
            for i in range(blocksize):
                buf[w + i] = br.var(resn) + 2 * buf[w + i - 1] - buf[w + i - 2]
        elif cmd == FN_DIFF3:
            for i in range(blocksize):
                buf[w + i] = (
                    br.var(resn) + 3 * (buf[w + i - 1] - buf[w + i - 2]) + buf[w + i - 3]
                )
        else:  # FN_QLPC
            nlpc = br.uvar(LPCQSIZE)
            if nlpc > nwrap:
                raise ValueError("shorten: QLPC order exceeds wrap history")
            qlpc = [br.var(LPCQUANT) for _ in range(nlpc)]
            for i in range(nlpc):
                buf[w - 1 - i] -= coffset
            for i in range(blocksize):
                s = lpcqoffset
                for j in range(nlpc):
                    s += qlpc[j] * int(buf[w + i - j - 1])
                buf[w + i] = br.var(resn) + (s >> LPCQUANT)
            for i in range(blocksize):
                buf[w + i] += coffset
            # the adjusted history cells are NOT restored — the wrap
            # below overwrites them from the new block (shorten.c
            # leaves them adjusted too; bit-compatible)
        if nmean > 0:
            s = blocksize // 2 + int(buf[w : w + blocksize].sum())
            offsets[chan] = offsets[chan][1:] + [_c_div(s, blocksize) << bitshift]
        buf[w - nwrap : w] = buf[w + blocksize - nwrap : w + blocksize].copy()
        block = buf[w : w + blocksize].copy()
        if bitshift:
            block <<= bitshift
        out[chan].append(block)
        chan = (chan + 1) % nchan
    chans = [np.concatenate(c) if c else np.zeros(0, dtype=np.int64) for c in out]
    n = min(len(c) for c in chans)
    x = np.stack([c[:n] for c in chans], axis=1).astype(np.int32)
    return x, ftype


def encode_shorten(
    samples: np.ndarray,
    ftype: int = TYPE_S16LH,
    blocksize: int = DEFAULT_BLOCKSIZE,
    nmean: int = 0,
    commands: Optional[List[int]] = None,
    bitshift: int = 0,
    qlpc: Optional[List[int]] = None,
    verbatim: bytes = b"",
) -> bytes:
    """Spec-faithful shorten v2 writer for oracle/test payloads.
    ``samples`` is int (n,) or (n, nchan); blocks cycle through
    ``commands`` (default DIFF1) with the same offset/wrap/bitshift
    state machine the decoder runs, so round trips are exact by
    construction — and any OTHER conforming decoder reads the stream.
    ``bitshift`` drops that many low zero bits (caller must supply
    samples whose low bits are zero); ``qlpc`` enables FN_QLPC blocks
    with the given quantized coefficients."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, nchan = x.shape
    if bitshift and (x & ((1 << bitshift) - 1)).any():
        raise ValueError("bitshift requires the low bits to be zero")
    cmds = list(commands) if commands else [FN_DIFF1]
    bw = _BitWriter()
    maxnlpc = len(qlpc) if qlpc else 0
    for v in (ftype, nchan, blocksize, maxnlpc, nmean, 0):
        bw.ulong(v)
    if verbatim:
        bw.uvar(FN_VERBATIM, FNSIZE)
        bw.uvar(len(verbatim), VERBATIM_CKSIZE_SIZE)
        for b in verbatim:
            bw.uvar(b, VERBATIM_BYTE_SIZE)
    if bitshift:
        bw.uvar(FN_BITSHIFT, FNSIZE)
        bw.uvar(bitshift, BITSHIFTSIZE)
    xs = x >> bitshift if bitshift else x
    lpcqoffset = 1 << (LPCQUANT - 1)
    nwrap = max(NWRAP, maxnlpc)
    bufs = [np.zeros(nwrap + blocksize, dtype=np.int64) for _ in range(nchan)]
    offsets = [[_init_offset(ftype)] * max(nmean, 1) for _ in range(nchan)]
    pos, blk_i = 0, 0
    while pos < n:
        cur = min(blocksize, n - pos)
        if cur != blocksize:
            bw.uvar(FN_BLOCKSIZE, FNSIZE)
            bw.ulong(cur)
            blocksize = cur
            bufs = [b[: nwrap + blocksize] for b in bufs]
        for chan in range(nchan):
            buf = bufs[chan]
            w = nwrap
            block = xs[pos : pos + cur, chan].astype(np.int64)
            cmd = cmds[blk_i % len(cmds)]
            if cmd == FN_QLPC and not qlpc:
                cmd = FN_DIFF1
            if nmean == 0:
                coffset = offsets[chan][0]
            else:
                s = nmean // 2 + sum(offsets[chan])
                coffset = _rounded_shift_down(_c_div(s, nmean), bitshift)
            if cmd == FN_ZERO and block.any():
                cmd = FN_DIFF1  # ZERO only encodes true silence
            res: List[int] = []
            if cmd == FN_ZERO:
                pass
            elif cmd == FN_DIFF0:
                res = [int(v) - coffset for v in block]
            elif cmd == FN_DIFF1:
                prev = int(buf[w - 1])
                for v in block:
                    res.append(int(v) - prev)
                    prev = int(v)
            elif cmd == FN_DIFF2:
                p1, p2 = int(buf[w - 1]), int(buf[w - 2])
                for v in block:
                    res.append(int(v) - 2 * p1 + p2)
                    p2, p1 = p1, int(v)
            elif cmd == FN_DIFF3:
                p1, p2, p3 = int(buf[w - 1]), int(buf[w - 2]), int(buf[w - 3])
                for v in block:
                    res.append(int(v) - 3 * (p1 - p2) - p3)
                    p3, p2, p1 = p2, p1, int(v)
            elif cmd == FN_QLPC:
                hist = [int(buf[w - 1 - i]) - coffset for i in range(len(qlpc))]
                work = list(hist[::-1])  # oldest..newest of adjusted history
                vals = [int(v) - coffset for v in block]
                for i, v in enumerate(vals):
                    s = lpcqoffset
                    for j, q in enumerate(qlpc):
                        prev = vals[i - j - 1] if i - j - 1 >= 0 else work[len(work) - 1 - (j - i)]
                        s += q * prev
                    res.append(v - (s >> LPCQUANT))
            else:
                raise ValueError(f"encoder: unsupported command {cmd}")
            amax = max((abs(r) for r in res), default=0)
            resn = max((2 * amax).bit_length() - 1, 0)
            bw.uvar(cmd, FNSIZE)
            if cmd != FN_ZERO:
                bw.uvar(resn, ENERGYSIZE)
            if cmd == FN_QLPC:
                bw.uvar(len(qlpc), LPCQSIZE)
                for q in qlpc:
                    bw.var(q, LPCQUANT)
            for r in res:
                bw.var(r, resn)
            buf[w : w + cur] = block
            if nmean > 0:
                s = cur // 2 + int(block.sum())
                offsets[chan] = offsets[chan][1:] + [_c_div(s, cur) << bitshift]
            buf[w - nwrap : w] = buf[w + cur - nwrap : w + cur].copy()
        pos += cur
        blk_i += 1
    bw.uvar(FN_QUIT, FNSIZE)
    return _MAGIC + bytes([2]) + bw.bytes_()
