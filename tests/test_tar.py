"""Tar-shard (WebDataset layout) tests. Interop is the oracle here:
the from-spec ustar writer/reader must round-trip through the STDLIB
tarfile module in both directions (not a mirrored self-check), across
ustar, pax, and GNU long-name formats."""

import io
import tarfile

import numpy as np
import pytest

from iceberg_python_spark.operators.tar import (
    decode_tar,
    encode_tar,
    iter_tar_samples,
    read_tar_samples,
    split_sample_key,
    tar_shards_from_samples,
)

MEMBERS = [
    ("0001.txt", b"hello"),
    ("0001.json", b"{}"),
    ("0002.txt", b"world"),
    ("0002.json", b'{"a":1}'),
    ("0002.png", b"\x89PNG"),
]


def _stdlib_tar(members, fmt=tarfile.USTAR_FORMAT):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as w:
        for n, p in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(p)
            w.addfile(ti, io.BytesIO(p))
    return buf.getvalue()


def test_tar_roundtrip_and_determinism():
    t = encode_tar(MEMBERS)
    assert decode_tar(t) == MEMBERS
    assert encode_tar(MEMBERS) == t  # deterministic bytes


def test_tar_stdlib_interop_both_directions():
    # ours -> stdlib
    tf = tarfile.open(fileobj=io.BytesIO(encode_tar(MEMBERS)))
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] == MEMBERS
    # stdlib (ustar, pax, gnu) -> ours
    for fmt in (tarfile.USTAR_FORMAT, tarfile.PAX_FORMAT, tarfile.GNU_FORMAT):
        assert decode_tar(_stdlib_tar(MEMBERS, fmt)) == MEMBERS, fmt


def test_tar_long_names_gnu_and_ustar_prefix():
    long = "d/" + "x" * 120 + "/0003.txt"
    assert decode_tar(_stdlib_tar([(long, b"abc")], tarfile.GNU_FORMAT)) == [(long, b"abc")]
    ours = "prefixdir/" + "y" * 80 + "/0004.txt"
    t = encode_tar([(ours, b"z")])
    assert decode_tar(t) == [(ours, b"z")]
    assert [m.name for m in tarfile.open(fileobj=io.BytesIO(t)).getmembers()] == [ours]


def test_tar_sample_grouping_webdataset_convention():
    assert split_sample_key("a/b/0001.seg.json") == ("a/b/0001", "seg.json")
    assert split_sample_key("0001.txt") == ("0001", "txt")
    assert split_sample_key("noext") == ("noext", "")
    got = list(iter_tar_samples(encode_tar(MEMBERS)))
    assert got == [
        ("0001", [("txt", b"hello"), ("json", b"{}")]),
        ("0002", [("txt", b"world"), ("json", b'{"a":1}'), ("png", b"\x89PNG")]),
    ]


def test_tar_skips_directories_and_pax_records():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT) as w:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        w.addfile(d)
        ti = tarfile.TarInfo("dir/0001.txt")
        ti.size = 2
        w.addfile(ti, io.BytesIO(b"ok"))
    assert decode_tar(buf.getvalue()) == [("dir/0001.txt", b"ok")]


def test_tar_malformed_raises_valueerror():
    t = encode_tar(MEMBERS)
    with pytest.raises(ValueError):
        decode_tar(t[:100])  # truncated header block
    bad = bytearray(t)
    bad[150] ^= 1  # corrupt checksum
    with pytest.raises(ValueError, match="checksum"):
        decode_tar(bytes(bad))
    trunc = t[: 512 + 2]  # header promises 5 bytes, payload cut
    with pytest.raises(ValueError, match="truncated"):
        decode_tar(trunc)
    with pytest.raises(ValueError, match="magic"):
        decode_tar(b"A" * 512)


def test_tar_spark_shard_roundtrip(spark):
    rows = [
        (int(i % 3), f"{i:06d}", f"text {i}", '{"k":%d}' % i) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "shard_id long, key string, txt string, json string")
    shards = tar_shards_from_samples(
        df, "shard_id", "key", [("txt", "txt"), ("json", "json")]
    )
    assert shards.count() == 3
    samples = read_tar_samples(shards.select("shard_id", "shard"), "shard_id", "shard")
    out = samples.collect()
    assert len(out) == 30 and all(r.error is None and r.n_members == 2 for r in out)
    got = {r.sample_key: bytes(r.members["txt"]).decode() for r in out}
    assert got == {f"{i:06d}": f"text {i}" for i in range(30)}
    # a malformed shard is ONE error row, not a failed job
    import pyspark.sql.functions as F

    broken = shards.limit(1).select(
        "shard_id", F.expr("substring(shard, 1, 100)").alias("shard")
    )
    err = read_tar_samples(broken, "shard_id", "shard").collect()
    assert len(err) == 1 and err[0].error is not None


def test_tar_pax_long_names():
    """PAX long names travel in 'x' records as 'path=' keys overriding
    the truncated header name — stdlib pax archives with >100-char
    names must decode with their full names."""
    long = "p/" + "z" * 150 + "/0005.txt"
    t = _stdlib_tar([(long, b"pax"), ("short.txt", b"s")], tarfile.PAX_FORMAT)
    assert decode_tar(t) == [(long, b"pax"), ("short.txt", b"s")]


def test_tar_pax_zero_length_record_raises_not_hangs():
    """ADVICE r16 (high): a pax 'x' record declaring length 0 (payload
    starting b'0 ') must raise ValueError — before the fix `p += rlen`
    never advanced and the executor hung forever on a crafted shard,
    which is worse than the documented one-error-row failure."""
    t = bytearray(encode_tar([("victim.txt", b"0 path=evil\n")]))
    t[156] = ord("x")  # retype the member as a pax extended record
    t[148:156] = b" " * 8
    chk = sum(t[0:512])
    t[148:156] = format(chk, "o").rjust(6, "0").encode() + b"\x00 "
    with pytest.raises(ValueError, match="pax record length"):
        decode_tar(bytes(t))
    # a record whose length covers only its own digits (does not reach
    # past the space separator) must also raise
    t2 = bytearray(encode_tar([("victim.txt", b"1 path=evil\n")]))
    t2[156] = ord("x")
    t2[148:156] = b" " * 8
    chk = sum(t2[0:512])
    t2[148:156] = format(chk, "o").rjust(6, "0").encode() + b"\x00 "
    with pytest.raises(ValueError, match="pax record length"):
        decode_tar(bytes(t2))


def test_targz_shards_roundtrip_and_contract():
    """r17: gzip-compressed shards (.tar.gz — the common WebDataset
    shipping form) decode transparently; deterministic writer;
    corrupt gzip raises ValueError (per-shard error capture relies
    on it)."""
    from iceberg_python_spark.operators.tar import (
        decode_tar,
        encode_tar,
        encode_tar_gz,
        iter_tar_samples,
    )

    members = [("0001.txt", b"hello"), ("0001.json", b'{"a":1}'), ("0002.txt", b"w" * 999)]
    gz = encode_tar_gz(members)
    assert gz[:2] == b"\x1f\x8b" and decode_tar(gz) == members
    assert encode_tar_gz(members) == gz
    assert [k for k, _ in iter_tar_samples(gz)] == ["0001", "0002"]
    with pytest.raises(ValueError):
        decode_tar(gz[:20] + b"\x00" * 5 + gz[25:])
    with pytest.raises(ValueError):
        decode_tar(gz[: len(gz) // 2])  # truncated member
