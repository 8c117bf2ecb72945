"""ZIP archive ingestion — the other container document corpora ship
in (Project Gutenberg dumps, Kaggle datasets, EPUB-adjacent bundles).
Everything derives from the PUBLIC PKWARE APPNOTE (ZIP File Format
Specification): the decoder walks the CENTRAL DIRECTORY (the archive's
authoritative index, located via the End-Of-Central-Directory record
scanned from the tail), validates each entry's local header, and
inflates STORED (0) and DEFLATE (8) members via zlib with the output
capped at the declared uncompressed size; CRC-32 is verified per
member. ZIP64 EOCD (the >4 GB / >65535-member form) is honored for
the member count + directory offset fields.

Spark shape (100 TB): identical to the tar path — archives arrive as
whole-file rows (``binaryFile``; one task per archive) and explode
through Arrow-batched ``mapInPandas`` with per-archive error capture.
Sample grouping follows the same basename-before-first-dot convention
as the tar shards, so a zip-shipped corpus and a tar-shipped corpus
ingest through one downstream contract.

The writer is the deterministic synthesis half (fixed DOS timestamp,
no extra fields, stored or deflate): same members → same bytes.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame

_EOCD = b"PK\x05\x06"
_EOCD64_LOC = b"PK\x06\x07"
_EOCD64 = b"PK\x06\x06"
_CDIR = b"PK\x01\x02"
_LOCAL = b"PK\x03\x04"


def encode_zip(
    members: Sequence[Tuple[str, bytes]], compression: str = "deflate"
) -> bytes:
    """Serialize (name, payload) members as a deterministic ZIP
    (``compression``: stored | deflate). Fixed DOS date/time (1980-01-01),
    version 2.0, no extra fields — byte output depends only on inputs."""
    if compression not in ("stored", "deflate"):
        raise ValueError("compression must be stored or deflate")
    method = 8 if compression == "deflate" else 0
    out = bytearray()
    central = bytearray()
    offsets: List[int] = []
    for name, payload in members:
        payload = bytes(payload)
        nb = name.encode()
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
            comp = co.compress(payload) + co.flush()
        else:
            comp = payload
        offsets.append(len(out))
        out += _LOCAL + struct.pack(
            "<HHHHHIIIHH", 20, 0, method, 0, 0x21, crc, len(comp), len(payload),
            len(nb), 0,
        ) + nb + comp
    for (name, payload), off in zip(members, offsets):
        nb = name.encode()
        payload = bytes(payload)
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        clen = None  # recover from the local header to avoid recompressing
        (clen,) = struct.unpack_from("<I", out, off + 18)
        central += _CDIR + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, 8 if compression == "deflate" else 0,
            0, 0x21, crc, clen, len(payload), len(nb), 0, 0, 0, 0, 0, off,
        ) + nb
    cd_off = len(out)
    out += central
    out += _EOCD + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(central), cd_off, 0
    )
    return bytes(out)


def decode_zip(data: bytes) -> List[Tuple[str, bytes]]:
    """Walk the central directory → [(name, payload)] with CRC-32
    verified per member. Malformed structure raises ValueError;
    unsupported compression methods raise NotImplementedError naming
    the method id (crafted-input contract)."""
    # EOCD: scan back past an up-to-65535-byte trailing comment
    tail_start = max(0, len(data) - 22 - 65535)
    eocd = data.rfind(_EOCD, tail_start)
    if eocd < 0 or eocd + 22 > len(data):
        raise ValueError("zip: end-of-central-directory record not found")
    (_dn, _cdn, n_here, n_total, cd_size, cd_off, _clen) = struct.unpack_from(
        "<HHHHIIH", data, eocd + 4
    )
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF:
        # ZIP64: locator sits just before the EOCD
        loc = data.rfind(_EOCD64_LOC, 0, eocd)
        if loc < 0 or loc + 20 > len(data):
            raise ValueError("zip: zip64 locator missing")
        (e64_off,) = struct.unpack_from("<Q", data, loc + 8)
        if e64_off + 56 > len(data) or data[e64_off : e64_off + 4] != _EOCD64:
            raise ValueError("zip: zip64 EOCD missing")
        n_total = struct.unpack_from("<Q", data, e64_off + 32)[0]
        cd_size = struct.unpack_from("<Q", data, e64_off + 40)[0]
        cd_off = struct.unpack_from("<Q", data, e64_off + 48)[0]
    if n_total > 1_000_000 or cd_off + cd_size > len(data):
        raise ValueError("zip: implausible central directory")
    out: List[Tuple[str, bytes]] = []
    pos = cd_off
    cd_end = cd_off + cd_size
    for _ in range(n_total):
        if pos + 46 > cd_end:
            raise ValueError("zip: central directory entry runs past its declared size")
        if data[pos : pos + 4] != _CDIR:
            raise ValueError("zip: central directory entry signature missing")
        (
            _vmade, _vneed, flags, method, _t, _d, crc, clen, ulen,
            nlen, xlen, mlen, _disk, _iattr, _eattr, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        raw_name = data[pos + 46 : pos + 46 + nlen]
        name = raw_name.decode("utf-8", "replace")
        pos += 46 + nlen + xlen + mlen
        if pos > cd_end:
            raise ValueError("zip: central directory entry runs past its declared size")
        if flags & 0x01:
            raise NotImplementedError("zip: encrypted member")
        if lho + 30 > len(data):
            raise ValueError("zip: local header runs past the archive")
        if data[lho : lho + 4] != _LOCAL:
            raise ValueError("zip: local header signature missing")
        (l_nlen, l_xlen) = struct.unpack_from("<HH", data, lho + 26)
        # APPNOTE: the central and local names describe the same member;
        # disagreement means a corrupted directory (e.g. a splice that
        # shifted the EOCD into a name field). Compare the RAW bytes —
        # legacy CP437/Latin-1 names are legal and must not be bounced
        # through a lossy UTF-8 round-trip
        if data[lho + 30 : lho + 30 + l_nlen] != raw_name:
            raise ValueError("zip: central/local header name mismatch")
        body = lho + 30 + l_nlen + l_xlen
        if body + clen > len(data):
            raise ValueError("zip: member data runs past the archive")
        comp = data[body : body + clen]
        if name.endswith("/") and ulen == 0:
            continue  # directory entry
        if method == 0:
            if len(comp) != ulen:
                raise ValueError("zip: stored member size mismatch")
            payload = bytes(comp)
        elif method == 8:
            try:  # raw deflate, expansion capped at the declared size.
                # zlib treats max_length=0 as UNLIMITED, so a member
                # declaring ulen=0 must cap at 1 and prove it's empty —
                # otherwise a ~50 KB bomb inflates GBs before the
                # size-mismatch check
                payload = zlib.decompressobj(-15).decompress(comp, max(ulen, 1))
            except zlib.error as exc:
                raise ValueError(f"zip: bad deflate member: {exc}") from exc
            if len(payload) != ulen:
                raise ValueError("zip: deflate member size mismatch")
        else:
            raise NotImplementedError(
                f"zip: compression method {method} (bzip2/lzma/etc.) unsupported — "
                "stored and deflate decode here"
            )
        if zlib.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError("zip: member CRC-32 mismatch")
        out.append((name, payload))
    return out


def read_zip_samples(
    shards: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Explode zip archives into one row per basename-grouped SAMPLE —
    the same output contract as :func:`.tar.read_tar_samples`, so
    zip-shipped and tar-shipped corpora feed one downstream pipeline.
    Zip members are grouped by key across the WHOLE archive (the
    central directory is one index; no adjacency guarantee exists), and
    a malformed archive is one error row, never a failed job."""
    from .tar import split_sample_key

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    groups: dict = {}
                    order: List[str] = []
                    for name, body in decode_zip(bytes(payload)):
                        key, ext = split_sample_key(name)
                        if key not in groups:
                            groups[key] = {}
                            order.append(key)
                        groups[key][ext] = body
                    for key in order:
                        rows.append((sid, key, groups[key], len(groups[key]), None))
                except (ValueError, NotImplementedError, UnicodeDecodeError) as exc:
                    rows.append((sid, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_key", "members", "n_members", "error"]
            )

    schema = (
        f"{id_col} long, sample_key string, members map<string, binary>, "
        "n_members int, error string"
    )
    return shards.mapInPandas(gen, schema=schema)


def zip_shards_from_samples(
    df: DataFrame,
    shard_col: str,
    key_col: str,
    member_cols: Sequence[Tuple[str, str]],
    compression: str = "deflate",
) -> DataFrame:
    """Synthesis half at DataFrame scale — the PKZIP twin of
    :func:`.tar.tar_shards_from_samples`: pack each ``shard_col``
    group into ONE deterministic zip archive
    (members sorted by sample key, ``member_cols`` = [(column,
    extension)] per sample). One shuffle on the shard id; returns
    ``(shard id, shard binary, n_samples)`` — the same output contract
    as the tar packer, so either feeds :func:`read_zip_samples` /
    ``read_tar_samples`` interchangeably downstream."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col)
        members: List[Tuple[str, bytes]] = []
        for _, row in pdf.iterrows():
            for col, ext in member_cols:
                v = row[col]
                payload = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                members.append((f"{row[key_col]}.{ext}", bytes(payload)))
        return pd.DataFrame(
            {
                shard_col: [pdf[shard_col].iloc[0]],
                "shard": [encode_zip(members, compression=compression)],
                "n_samples": [len(pdf)],
            }
        )

    return df.groupBy(shard_col).applyInPandas(
        pack, schema=f"{shard_col} long, shard binary, n_samples int"
    )
