"""ZIP archive ingestion tests. Like the tar suite, interop is the
oracle: the from-spec reader/writer must round-trip through the STDLIB
zipfile module in both directions (not a mirrored self-check), across
stored and deflate methods, trailing comments, and directory entries."""

import io
import zipfile

import pytest

from iceberg_python_spark.operators.zip import decode_zip, encode_zip, read_zip_samples

MEMBERS = [
    ("0001.txt", b"hello"),
    ("0001.json", b"{}"),
    ("0002.txt", b"world" * 100),
]


def test_zip_roundtrip_determinism_and_stdlib_interop():
    for comp in ("stored", "deflate"):
        z = encode_zip(MEMBERS, compression=comp)
        assert decode_zip(z) == MEMBERS
        assert encode_zip(MEMBERS, compression=comp) == z  # deterministic
        zf = zipfile.ZipFile(io.BytesIO(z))  # ours -> stdlib
        assert [(n, zf.read(n)) for n in zf.namelist()] == MEMBERS
    # stdlib -> ours, with a trailing comment and directory entries
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        w.mkdir("d")
        for n, p in MEMBERS:
            w.writestr("d/" + n, p)
        w.comment = b"trailing comment here"
    assert decode_zip(buf.getvalue()) == [("d/" + n, p) for n, p in MEMBERS]
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w", zipfile.ZIP_STORED) as w:
        for n, p in MEMBERS:
            w.writestr(n, p)
    assert decode_zip(buf2.getvalue()) == MEMBERS


def test_zip_unsupported_method_gates_naming_it():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_BZIP2) as w:
        w.writestr("a.txt", b"xx")
    with pytest.raises(NotImplementedError, match="12"):
        decode_zip(buf.getvalue())


def test_zip_malformed_raises_valueerror():
    z = bytearray(encode_zip([("0001.txt", b"hello")], compression="stored"))
    pos = bytes(z).find(b"hello")
    z[pos] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        decode_zip(bytes(z))
    with pytest.raises(ValueError, match="end-of-central"):
        decode_zip(b"PK\x03\x04" + b"\x00" * 40)
    # truncated central directory
    good = encode_zip(MEMBERS)
    with pytest.raises(ValueError):
        decode_zip(good[: len(good) - 30] + good[-22:])


def test_zip_spark_samples_same_contract_as_tar(spark):
    import pyspark.sql.functions as F

    rows = []
    for sid in range(3):
        members = []
        for i in range(8):
            k = sid * 8 + i
            members.append((f"{k:06d}.txt", f"text {k}".encode()))
            members.append((f"{k:06d}.json", b'{"k":%d}' % k))
        rows.append((sid, bytearray(encode_zip(members))))
    df = spark.createDataFrame(rows, "shard_id long, shard binary")
    out = read_zip_samples(df, "shard_id", "shard").collect()
    assert len(out) == 24 and all(r.error is None and r.n_members == 2 for r in out)
    got = {r.sample_key: bytes(r.members["txt"]).decode() for r in out}
    assert got == {f"{k:06d}": f"text {k}" for k in range(24)}
    # malformed archive -> ONE error row
    broken = df.limit(1).select("shard_id", F.expr("substring(shard, 1, 40)").alias("shard"))
    err = read_zip_samples(broken, "shard_id", "shard").collect()
    assert len(err) == 1 and err[0].error is not None


def _patch_eocd_checked(z: bytearray):
    """Locate the EOCD + first central entry of a single-member archive
    built by encode_zip (no comment, no zip64)."""
    import struct as _s

    eocd = bytes(z).rfind(b"PK\x05\x06")
    assert eocd >= 0
    (cd_off,) = _s.unpack_from("<I", z, eocd + 16)
    return eocd, cd_off


def test_zip_tail_local_header_sig_raises_valueerror_not_struct_error():
    """ADVICE r16: a central entry whose local-header offset points at a
    bare 4-byte PK\\x03\\x04 at the archive tail passed the signature
    check but blew up in unpack_from with struct.error — which
    read_zip_samples does not catch, failing the Spark task instead of
    yielding an error row."""
    import struct as _s

    z = bytearray(encode_zip([("a.txt", b"x")], compression="stored"))
    evil = bytearray(bytes(z) + b"PK\x03\x04")
    eocd, cd_off = _patch_eocd_checked(z)
    _s.pack_into("<I", evil, cd_off + 42, len(z))  # lho -> the bare sig
    with pytest.raises(ValueError, match="local header"):
        decode_zip(bytes(evil))


def test_zip_non_utf8_member_names_decode():
    """ADVICE r16: legacy CP437/Latin-1 names (old Gutenberg/Kaggle
    zips) are legal — the name consistency check must compare RAW
    bytes, not a lossy UTF-8 round-trip that turns 0xE9 into U+FFFD and
    falsely reports a central/local mismatch."""
    z = bytearray(encode_zip([("caf_.txt", b"legacy")], compression="stored"))
    raw = b"caf\xe9.txt"  # Latin-1 'é' — invalid UTF-8
    assert bytes(z).count(b"caf_.txt") == 2  # local + central
    patched = bytes(z).replace(b"caf_.txt", raw)
    [(name, payload)] = decode_zip(patched)
    assert payload == b"legacy"
    assert name == raw.decode("utf-8", "replace")  # lossy display name is fine


def test_zip_deflate_ulen_zero_bomb_does_not_inflate():
    """ADVICE r16: zlib treats decompress(..., max_length=0) as
    UNLIMITED, so a member declaring ulen=0 inflated fully into memory
    (50 MB from ~50 KB; ~1000:1 scales to GBs) before the size check.
    It must now be rejected without materializing the expansion."""
    import struct as _s
    import zlib as _z

    co = _z.compressobj(9, _z.DEFLATED, -15)
    comp = co.compress(b"\x00" * (50 << 20)) + co.flush()  # ~50 KB
    name = b"bomb.bin"
    lho = 0
    local = b"PK\x03\x04" + _s.pack(
        "<HHHHHIIIHH", 20, 0, 8, 0, 0x21, 0, len(comp), 0, len(name), 0
    ) + name + comp
    central = b"PK\x01\x02" + _s.pack(
        "<HHHHHHIIIHHHHHII", 20, 20, 0, 8, 0, 0x21, 0, len(comp), 0,
        len(name), 0, 0, 0, 0, 0, lho,
    ) + name
    eocd = b"PK\x05\x06" + _s.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(central), len(local), 0
    )
    data = local + central + eocd
    import time

    t0 = time.monotonic()
    with pytest.raises(ValueError, match="deflate member size mismatch"):
        decode_zip(data)
    assert time.monotonic() - t0 < 1.0  # rejected without inflating 50 MB
