"""Hive Metastore catalog behavior suite, against the wire-level mock
HMS (tests/hms_mock.py — real TBinaryProtocol over a real socket).

Mirrors tests/test_aws_catalogs.py / test_sql_catalog_engines.py so all
five metastore backends (SQLite, DuckDB, Glue, DynamoDB, Hive) are
proven on the same behavior shapes. Reference: pyiceberg
catalog/hive.py:294 (HiveCatalog) and its commit-locking protocol
(hive.py:523).
"""

import threading

import pytest
from pyspark.sql import functions as F

import iceberg_python_spark as ips
from iceberg_python_spark.catalog import NamespaceAlreadyExistsError, load_catalog
from iceberg_python_spark.catalog_hive import (
    HiveCatalog,
    HiveMetastoreClient,
    METADATA_LOCATION_PARAM,
    PREVIOUS_METADATA_LOCATION_PARAM,
    STATE_ACQUIRED,
    STATE_WAITING,
)
from iceberg_python_spark.table import CommitFailedException
from iceberg_python_spark.thrift_minimal import ThriftStructException

from .hms_mock import MockHmsServer


@pytest.fixture()
def hms():
    server = MockHmsServer().start()
    yield server
    server.stop()


@pytest.fixture()
def cat(hms, spark, tmp_path):
    return HiveCatalog(
        "hivecat",
        str(tmp_path / "wh"),
        spark,
        uri=f"thrift://127.0.0.1:{hms.port}",
        properties={"lock-check-min-wait-time": "0.01", "lock-check-max-wait-time": "0.05"},
    )


def _mk(cat, spark, name="db.t"):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    t = cat.create_table(name, df.schema)
    t.append(df)
    return t


def test_table_crud(cat, spark):
    t = _mk(cat, spark)
    assert t.scan().to_df().count() == 10
    assert cat.table_exists("db.t")
    assert ("db", "t") in cat.list_tables("db")
    with pytest.raises(ips.TableAlreadyExistsError):
        cat.create_table("db.t", t.schema())
    cat.rename_table("db.t", "db.t2")
    assert cat.load_table("db.t2").scan().to_df().count() == 10
    assert not cat.table_exists("db.t")
    cat.drop_table("db.t2")
    with pytest.raises(ips.NoSuchTableError):
        cat.load_table("db.t2")
    with pytest.raises(ips.NoSuchTableError):
        cat.drop_table("db.t2")


def test_namespaces(cat):
    cat.create_namespace("ns1", {"owner": "me"})
    assert cat.namespace_exists("ns1")
    assert cat.load_namespace_properties("ns1") == {"owner": "me"}
    with pytest.raises(NamespaceAlreadyExistsError):
        cat.create_namespace("ns1", {"owner": "other"})
    cat.create_namespace_if_not_exists("ns1", {"owner": "other"})
    assert cat.load_namespace_properties("ns1") == {"owner": "me"}
    assert ("ns1",) in cat.list_namespaces()
    summary = cat.update_namespace_properties("ns1", removals=["owner", "zz"], updates={"c": "3"})
    assert summary == {"updated": ["c"], "removed": ["owner"], "missing": ["zz"]}
    assert cat.load_namespace_properties("ns1") == {"c": "3"}
    cat.drop_namespace("ns1")
    assert not cat.namespace_exists("ns1")
    with pytest.raises(ips.NoSuchNamespaceError):
        cat.load_namespace_properties("ns1")


def test_drop_nonempty_namespace_refused(cat, spark):
    _mk(cat, spark)
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_namespace("db")


def test_commit_cas_and_refresh(cat, spark):
    """Overlapping deletes from the same base: the loser must fail the
    lock-guarded metadata_location check (reference hive.py:523)."""
    t = _mk(cat, spark)
    t1 = cat.load_table("db.t")
    t2 = cat.load_table("db.t")
    t1.delete("id >= 0")
    with pytest.raises(CommitFailedException):
        t2.delete("id >= 5")
    t2.refresh()
    assert t2.scan().to_df().count() == 0


def test_concurrent_appends_all_land(cat, spark):
    t = _mk(cat, spark)
    errors = []

    def worker(i):
        try:
            h = cat.load_table("db.t")
            h.append(spark.range(i * 100, i * 100 + 3).withColumn("v", F.col("id")))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    t.refresh()
    assert t.scan().to_df().count() == 10 + 4 * 3


def test_create_table_transaction(cat, spark):
    df = spark.range(20).withColumn("v", F.col("id") * 3)
    tx = cat.create_table_transaction("db.staged", df.schema)
    tx.append(df)
    assert not cat.table_exists("db.staged")
    t = tx.commit_transaction()
    assert cat.table_exists("db.staged")
    assert t.scan().to_df().count() == 20
    tx2 = cat.create_table_transaction("db.staged", df.schema)
    tx2.append(df)
    with pytest.raises(ips.TableAlreadyExistsError):
        tx2.commit_transaction()


def test_register_and_clone(cat, spark):
    t = _mk(cat, spark)
    reg = cat.register_table("mirror.t", t.metadata_location)
    assert reg.scan().to_df().count() == 10
    c = cat.clone_table("db.t", "db.t_clone")
    assert c.scan().to_df().count() == 10


def test_time_travel_through_hive_commits(cat, spark):
    t = _mk(cat, spark)
    snap1 = t.current_snapshot().snapshot_id
    t.append(spark.range(100, 105).withColumn("v", F.col("id")))
    assert t.scan().to_df().count() == 15
    assert t.scan(snapshot_id=snap1).to_df().count() == 10


def test_hive_table_wire_layout(cat, hms, spark):
    """What actually lands in the metastore: EXTERNAL_TABLE with
    table_type=ICEBERG + metadata_location parameters and Hive-typed
    column descriptors (reference hive.py:195/216)."""
    df = spark.range(3).withColumn("name", F.lit("x")).withColumn("score", F.col("id") * 1.5)
    t = cat.create_table("db.cols", df.schema)
    stored = hms.store.dbs["db"]["tables"]["cols"]
    assert stored["tableType"] == "EXTERNAL_TABLE"
    assert stored["parameters"]["table_type"] == "ICEBERG"
    assert stored["parameters"][METADATA_LOCATION_PARAM] == t.metadata_location
    cols = {c["name"]: c["type"] for c in stored["sd"]["cols"]}
    assert cols == {"id": "bigint", "name": "string", "score": "double"}
    assert stored["sd"]["location"] == t.location
    t.append(df)
    stored = hms.store.dbs["db"]["tables"]["cols"]
    assert stored["parameters"][METADATA_LOCATION_PARAM] == t.metadata_location
    assert stored["parameters"][PREVIOUS_METADATA_LOCATION_PARAM] != t.metadata_location
    # commit protocol on the wire: lock -> alter -> unlock, in order
    methods = [m for m, _ in hms.store.calls]
    i_lock = methods.index("lock")
    assert "alter_table_with_environment_context" in methods[i_lock:]
    assert "unlock" in methods[methods.index("alter_table_with_environment_context", i_lock):]


def test_plain_hive_table_rejected(cat, hms, spark):
    """A non-Iceberg Hive table in the same database is invisible to
    list_tables and load_table raises (reference hive.py:327)."""
    cat.create_namespace("db")
    hms.store.dbs["db"]["tables"]["legacy"] = {
        "tableName": "legacy",
        "dbName": "db",
        "parameters": {"comment": "plain hive"},
        "tableType": "MANAGED_TABLE",
    }
    assert cat.list_tables("db") == []
    with pytest.raises(ips.NoSuchTableError, match="not an Iceberg table"):
        cat.load_table("db.legacy")


def test_lock_contention_waits_then_acquires(cat, hms):
    """A held EXCLUSIVE lock puts the second requester in WAITING; after
    unlock, check_lock flips it to ACQUIRED (reference hive.py:502
    _wait_for_lock)."""
    client = HiveMetastoreClient("127.0.0.1", hms.port)
    try:
        first = cat._acquire_lock(client, "db", "t")
        second = HiveMetastoreClient("127.0.0.1", hms.port)
        try:
            resp = second.lock(
                rqst={
                    "component": [{"type": 3, "level": 2, "dbname": "db", "tablename": "t", "operationType": 5}],
                    "user": "u",
                    "hostname": "h",
                    "agentInfo": "x",
                }
            )
            assert resp["state"] == STATE_WAITING
            assert second.check_lock(rqst={"lockid": resp["lockid"]})["state"] == STATE_WAITING
            client.unlock(rqst={"lockid": first})
            assert second.check_lock(rqst={"lockid": resp["lockid"]})["state"] == STATE_ACQUIRED
            second.unlock(rqst={"lockid": resp["lockid"]})
        finally:
            second.close()
    finally:
        client.close()


def test_lock_timeout_fails_commit(cat, hms, spark, monkeypatch):
    """If the lock never frees within the retry budget, the commit fails
    loudly (CommitFailedException) and releases its queued lock."""
    t = _mk(cat, spark)
    blocker = HiveMetastoreClient("127.0.0.1", hms.port)
    try:
        cat._acquire_lock(blocker, "db", "t")
        with pytest.raises(CommitFailedException, match="lock"):
            t.append(spark.range(3).withColumn("v", F.col("id")))
        # queued lock cleaned up: only the blocker's lock remains
        assert len(hms.store.locks) == 1
    finally:
        blocker.close()


def test_thrift_exception_surface(hms):
    client = HiveMetastoreClient("127.0.0.1", hms.port)
    try:
        with pytest.raises(ThriftStructException, match="NoSuchObjectException"):
            client.get_table(dbname="nope", tbl_name="nope")
    finally:
        client.close()


def test_load_catalog_factory_hive(hms, spark, tmp_path):
    c = load_catalog(
        "h",
        spark,
        type="hive",
        warehouse=str(tmp_path / "wh"),
        uri=f"thrift://127.0.0.1:{hms.port}",
    )
    assert isinstance(c, HiveCatalog)
    df = spark.range(5).withColumn("v", F.col("id"))
    t = c.create_table("db.f", df.schema)
    t.append(df)
    assert c.load_table("db.f").scan().to_df().count() == 5


def test_complex_hive_types(cat, spark):
    """Nested Spark schema maps onto Hive type strings."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("attrs", T.MapType(T.StringType(), T.DoubleType())),
            T.StructField(
                "loc",
                T.StructType([T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]),
            ),
        ]
    )
    t = cat.create_table("db.nested", schema)
    stored = cat._client().get_table(dbname="db", tbl_name="nested")
    cols = {c["name"]: c["type"] for c in stored["sd"]["cols"]}
    assert cols["tags"] == "array<string>"
    assert cols["attrs"] == "map<string,double>"
    assert cols["loc"] == "struct<lat:double,lon:double>"
