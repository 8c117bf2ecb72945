"""BigQuery metastore catalog behavior suite, against the wire-level
mock BigQuery v2 server (tests/bq_mock.py).

Mirrors the shared shapes of test_sql_catalog_engines / test_aws_catalogs
/ test_hive_catalog so all six metastore backends run the same
lifecycle. Reference: pyiceberg/catalog/bigquery_metastore.py:65."""

import threading

import pytest
from pyspark.sql import functions as F

import iceberg_python_spark as ips
from iceberg_python_spark.catalog import NamespaceAlreadyExistsError
from iceberg_python_spark.catalog_bq import BigQueryMetastoreCatalog
from iceberg_python_spark.table import CommitFailedException

from .bq_mock import MockBigQueryServer


@pytest.fixture()
def bq():
    server = MockBigQueryServer().start()
    yield server
    server.stop()


@pytest.fixture()
def cat(bq, spark, tmp_path):
    return BigQueryMetastoreCatalog(
        "bqcat",
        str(tmp_path / "wh"),
        spark,
        properties={"gcp.project-id": "proj", "gcp.bigquery.endpoint": bq.endpoint},
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
    with pytest.raises(NotImplementedError):  # BigQuery has no rename (reference parity)
        cat.rename_table("db.t", "db.t2")
    cat.drop_table("db.t")
    with pytest.raises(ips.NoSuchTableError):
        cat.load_table("db.t")
    with pytest.raises(ips.NoSuchTableError):
        cat.drop_table("db.t")


def test_namespaces(cat):
    cat.create_namespace("ns1", {"owner": "me"})
    assert cat.namespace_exists("ns1")
    assert cat.load_namespace_properties("ns1") == {"owner": "me"}
    with pytest.raises(NamespaceAlreadyExistsError):
        cat.create_namespace("ns1", {"owner": "other"})
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
    """Overlapping deletes from the same base: the loser fails the
    metadata_location check (or the etag If-Match, whichever trips
    first)."""
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


def test_register_and_clone(cat, spark):
    t = _mk(cat, spark)
    reg = cat.register_table("mirror.t", t.metadata_location)
    assert reg.scan().to_df().count() == 10
    c = cat.clone_table("db.t", "db.t_clone")
    assert c.scan().to_df().count() == 10


def test_time_travel_through_bq_commits(cat, spark):
    t = _mk(cat, spark)
    snap1 = t.current_snapshot().snapshot_id
    t.append(spark.range(100, 105).withColumn("v", F.col("id")))
    assert t.scan().to_df().count() == 15
    assert t.scan(snapshot_id=snap1).to_df().count() == 10


def test_wire_layout_and_etag_rotation(cat, bq, spark):
    """What lands in BigQuery: externalCatalogTableOptions with the
    Hive-shaped storage descriptor + ICEBERG parameters (reference
    _create_external_catalog_table_options); every commit rotates the
    etag and records previous_metadata_location."""
    t = _mk(cat, spark, "db.wire")
    stored = bq.state.tables[("db", "wire")]
    opts = stored["externalCatalogTableOptions"]
    assert opts["parameters"]["table_type"] == "ICEBERG"
    assert opts["parameters"]["metadata_location"] == t.metadata_location
    assert opts["storageDescriptor"]["locationUri"] == t.location
    assert "hive.serde2" in opts["storageDescriptor"]["serdeInfo"]["serializationLibrary"]
    etag1 = stored["etag"]
    t.append(spark.range(3).withColumn("v", F.col("id")))
    stored = bq.state.tables[("db", "wire")]
    assert stored["etag"] != etag1
    assert stored["externalCatalogTableOptions"]["parameters"]["metadata_location"] == t.metadata_location
    assert stored["externalCatalogTableOptions"]["parameters"]["previous_metadata_location"] != t.metadata_location


def test_native_bq_table_invisible(cat, bq, spark):
    cat.create_namespace("db")
    bq.state.tables[("db", "native")] = {
        "tableReference": {"projectId": "proj", "datasetId": "db", "tableId": "native"},
        "etag": "x",
    }
    assert cat.list_tables("db") == []
    with pytest.raises(ips.NoSuchTableError, match="not an Iceberg table"):
        cat.load_table("db.native")


def test_stale_etag_fails_commit(cat, bq, spark):
    """If the table mutates between the catalog's read and its patch,
    the If-Match precondition trips and the commit fails cleanly."""
    t = _mk(cat, spark, "db.stale")
    # simulate an out-of-band commit: rotate the etag only
    bq.state.tables[("db", "stale")]["etag"] = "rotated"
    resource = cat._get_table_resource("db", "stale")
    # monkey-style: call _pointer_cas with the right expected pointer but
    # a stale in-flight read — patch must 412
    current = cat._pointer_of(resource, "db", "stale")
    resource["etag"] = "stale-etag"

    import iceberg_python_spark.catalog_bq as bqmod

    orig = cat._get_table_resource
    cat._get_table_resource = lambda ns, name: dict(resource, etag="stale-etag")
    try:
        with pytest.raises(CommitFailedException, match="etag"):
            cat._pointer_cas("db", "stale", current, current)
    finally:
        cat._get_table_resource = orig
