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
