"""Puffin container + v3 deletion vectors: portable-roaring codec
round-trips, real-world fixture interop (reference pyroaring-serialized
bitmaps + a Java-written Puffin file, read from /root/reference test data
when present), Java RoaringBitmap cross-validation via Spark's JVM, and
the table-level DV write/read/compact flow."""

import os

import numpy as np
import pytest

from iceberg_python_spark.table.puffin import (
    BLOB_TYPE_DV,
    PuffinFile,
    PuffinWriter,
    dv_blob_payload,
    dv_blob_positions,
    dv_deserialize_positions,
    dv_serialize_positions,
    roaring32_deserialize,
    roaring32_serialize,
)

REF_BITMAPS = "/root/reference/tests/table/bitmaps"
REF_PUFFIN = "/root/reference/tests/table/puffin/v1"


def test_roaring32_roundtrip_container_kinds():
    # array container, bitset container (>4096), and a sparse high chunk
    vals = np.unique(
        np.concatenate(
            [
                np.arange(10, dtype=np.uint32),
                np.arange(100_000, 110_000, dtype=np.uint32),  # bitset
                np.array([0xFFFF0001, 0xFFFFFFFF], dtype=np.uint32),
            ]
        )
    )
    buf = roaring32_serialize(vals)
    back, consumed = roaring32_deserialize(buf)
    assert consumed == len(buf)
    assert np.array_equal(back, vals)


def test_dv_positions_roundtrip_multi_key():
    vals = np.concatenate(
        [
            np.arange(10, dtype=np.uint64),
            (np.uint64(5) << np.uint64(32)) | np.arange(5000, dtype=np.uint64),
        ]
    )
    assert np.array_equal(dv_deserialize_positions(dv_serialize_positions(vals)), vals)
    blob = dv_blob_payload(vals)
    assert np.array_equal(dv_blob_positions(blob), vals)
    # CRC is actually verified
    corrupted = blob[:10] + bytes([blob[10] ^ 0xFF]) + blob[11:]
    with pytest.raises(ValueError):
        dv_blob_positions(corrupted)


@pytest.mark.skipif(not os.path.isdir(REF_BITMAPS), reason="reference fixtures unavailable")
def test_dv_reads_pyroaring_written_fixtures():
    """The reference serializes DV bitmaps with the pyroaring C library;
    our pure-Python reader must parse those exact bytes."""

    def load(name):
        with open(os.path.join(REF_BITMAPS, name), "rb") as f:
            return f.read()

    assert dv_deserialize_positions(load("64mapempty.bin")).size == 0
    assert dv_deserialize_positions(load("64map32bitvals.bin")).tolist() == list(range(10))
    spread = dv_deserialize_positions(load("64mapspreadvals.bin"))
    assert spread.tolist() == [(k << 32) | v for k in range(10) for v in range(10)]
    with pytest.raises(ValueError, match="exceeds"):
        dv_deserialize_positions(load("64maphighvals.bin"))


@pytest.mark.skipif(not os.path.isdir(REF_PUFFIN), reason="reference fixtures unavailable")
def test_container_reads_real_world_puffin():
    with open(os.path.join(REF_PUFFIN, "empty-puffin-uncompressed.bin"), "rb") as f:
        pf = PuffinFile(f.read())
    assert pf.blobs == [] and pf.properties == {}
    with open(os.path.join(REF_PUFFIN, "sample-metric-data-uncompressed.bin"), "rb") as f:
        pf = PuffinFile(f.read())
    assert pf.properties == {"created-by": "Test 1234"}
    assert [b.type for b in pf.blobs] == ["some-blob", "some-other-blob"]
    assert pf.blob_payload(pf.blobs[0]) == b"abcdefghi"


def test_writer_bitmap_readable_by_java_roaring(spark):
    """Cross-implementation check: org.roaringbitmap (on Spark's
    classpath) must deserialize the 32-bit maps our writer emits."""
    vals = np.unique(
        np.concatenate([np.arange(3000, dtype=np.uint32), np.arange(60_000, 70_000, dtype=np.uint32)])
    )
    buf = roaring32_serialize(vals)
    jvm = spark.sparkContext._jvm
    bb = jvm.java.nio.ByteBuffer.wrap(bytearray(buf))
    rb = jvm.org.roaringbitmap.buffer.ImmutableRoaringBitmap(bb)
    assert rb.getCardinality() == len(vals)
    assert rb.contains(0) and rb.contains(2999) and rb.contains(69_999)
    assert not rb.contains(3000)
    # and the reverse: Java-serialized bytes parse back identically
    out = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(out))
    back, _ = roaring32_deserialize(bytes(out.toByteArray()))
    assert np.array_equal(back, vals)


def test_theta_sketch_readable_by_datasketches_java(spark):
    """The NDV blobs must be genuine DataSketches compact theta bytes:
    datasketches-java (on Spark's classpath) wraps them and returns the
    exact NDV for empty, exact-mode, and estimation-mode sketches."""
    from iceberg_python_spark.table.puffin import theta_sketch_bytes, theta_sketch_estimate

    jvm = spark.sparkContext._jvm
    for ndv in [0, 1, 4096, 5000, 123_456_789]:
        buf = theta_sketch_bytes(ndv)
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(bytearray(buf))
        sk = jvm.org.apache.datasketches.theta.Sketches.wrapCompactSketch(mem)
        assert round(sk.getEstimate()) == ndv
        assert round(theta_sketch_estimate(buf)) == ndv


def test_container_roundtrip_with_dvs():
    w = PuffinWriter(properties={"created-by": "iceberg_python_spark"})
    w.add_deletion_vector("wh/data/a.parquet", np.array([1, 2, 3, 10_000_000_000], np.uint64))
    w.add_deletion_vector("wh/data/b.parquet", np.arange(50_000, dtype=np.uint64), snapshot_id=9)
    pf = PuffinFile(w.finish())
    assert [b.type for b in pf.blobs] == [BLOB_TYPE_DV, BLOB_TYPE_DV]
    dvs = pf.deletion_vectors()
    assert dvs["wh/data/a.parquet"].tolist() == [1, 2, 3, 10_000_000_000]
    assert len(dvs["wh/data/b.parquet"]) == 50_000
    assert pf.blobs[1].properties["cardinality"] == "50000"


@pytest.fixture()
def dv_table(catalog, spark):
    from iceberg_python_spark.schema import schema_from_spark

    df = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(100)], "id: long, grp: int, val: double"
    )
    t = catalog.create_table(
        "db.dv",
        schema_from_spark(df.schema),
        properties={"write.delete.mode": "merge-on-read", "write.delete.format": "puffin"},
    )
    t.append(df)
    return t


def test_table_dv_delete_and_scan(dv_table):
    t = dv_table
    t.delete("id >= 10 and id < 20")
    t.refresh()
    tasks = t.scan().plan_files()
    dels = {p for x in tasks for p in x.delete_files}
    assert dels and all(p.endswith(".puffin") for p in dels)
    assert t.scan().to_df().count() == 90
    assert {r.id for r in t.scan().to_df().collect()} == set(range(10)) | set(range(20, 100))
    # stacked DV delete + mixed with a parquet-format position delete
    t.delete("id >= 90")
    t.refresh()
    t.metadata.properties["write.delete.format"] = "parquet"
    t.delete("id < 5")
    t.refresh()
    assert {r.id for r in t.scan().to_df().collect()} == set(range(5, 10)) | set(range(20, 90))


def test_table_dv_delete_entries_and_compact(dv_table):
    t = dv_table
    t.delete("grp = 0")  # ids 0,5,...,95 -> 20 rows over every file
    t.refresh()
    entries = [
        e["data_file"]
        for e in t._live_entries(t.metadata.current_snapshot())
        if e["data_file"].get("content") == 1
    ]
    assert entries and all(e["file_format"] == "PUFFIN" for e in entries)
    assert all(e.get("referenced_data_file") for e in entries)
    assert sum(e["record_count"] for e in entries) == 20
    assert t.scan().to_df().count() == 80
    t.compact()
    t.refresh()
    assert t.scan().to_df().count() == 80
    tasks = t.scan().plan_files()
    assert not any(x.delete_files for x in tasks)


def test_upsert_mor_writes_dvs(dv_table, spark):
    t = dv_table
    up = spark.createDataFrame([(1, 99, 111.0), (200, 0, 200.0)], "id: long, grp: int, val: double")
    t.upsert(up, join_cols=["id"], mode="merge-on-read")
    t.refresh()
    df = t.scan().to_df()
    assert df.count() == 101
    row = {r.id: (r.grp, r.val) for r in df.collect()}
    assert row[1] == (99, 111.0) and row[200] == (0, 200.0)
    dels = {p for x in t.scan().plan_files() for p in x.delete_files}
    assert any(p.endswith(".puffin") for p in dels)


def test_real_hash_theta_blobs_readable_by_datasketches_java(spark):
    """r13: blobs built from REAL retained-hash sets (compute_sketches
    path) must also be genuine DataSketches compact theta bytes —
    datasketches-java wraps them, returns the same estimate as our
    reader, reports the right retained count/theta mode, and UNIONs of
    our blobs estimate the true union size."""
    import numpy as np

    from iceberg_python_spark.table.puffin import (
        theta_sketch_bytes_from_hashes,
        theta_sketch_estimate,
    )

    jvm = spark.sparkContext._jvm

    def wrap(buf):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(bytearray(buf))
        return jvm.org.apache.datasketches.theta.Sketches.wrapCompactSketch(mem)

    rng = np.random.RandomState(11)
    hs = np.unique(rng.randint(1, 1 << 63, size=30_000, dtype=np.int64).astype(np.uint64))
    k = 1024
    # exact mode: every hash retained, estimate == count
    exact = theta_sketch_bytes_from_hashes(hs[:500], k=k)
    sk = wrap(exact)
    assert sk.getRetainedEntries() == 500 and round(sk.getEstimate()) == 500
    assert not sk.isEstimationMode()
    # estimation mode: k-1 retained below theta = h_(k)
    smallest = np.sort(hs)[:k]
    est_buf = theta_sketch_bytes_from_hashes(smallest, k=k)
    sk2 = wrap(est_buf)
    assert sk2.getRetainedEntries() == k - 1 and sk2.isEstimationMode()
    assert abs(sk2.getEstimate() - theta_sketch_estimate(est_buf)) < 1e-6
    assert abs(sk2.getEstimate() - len(hs)) < 0.15 * len(hs)
    # union of two real-hash blobs (java-side) sees the true union
    a = theta_sketch_bytes_from_hashes(hs[:400], k=k)
    b = theta_sketch_bytes_from_hashes(hs[200:600], k=k)
    union = jvm.org.apache.datasketches.theta.SetOperation.builder().buildUnion()
    union.union(wrap(a))
    union.union(wrap(b))
    assert round(union.getResult().getEstimate()) == 600
