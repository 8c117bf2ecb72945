"""RestCatalog client against a spec-shaped mock server (reference
pyiceberg/catalog/rest/__init__.py; the mock validates requirements and
applies TableUpdate objects like a real server)."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.catalog_rest import NoSuchTableError, RestCatalog
from iceberg_python_spark.schema import schema_from_spark

from .rest_mock import make_server


@pytest.fixture()
def rest(tmp_path, spark):
    server, uri = make_server(str(tmp_path / "wh"))
    cat = RestCatalog("rest-test", uri, spark)
    yield cat
    server.shutdown()


def test_namespaces(rest):
    rest.create_namespace("db")
    assert ("db",) in rest.list_namespaces()
    assert rest.namespace_exists("db")
    rest.drop_namespace("db")
    assert not rest.namespace_exists("db")


def test_create_append_scan_round_trip(rest, spark):
    df = spark.createDataFrame([(i, f"g{i % 3}", float(i)) for i in range(100)], "id: long, grp: string, val: double")
    t = rest.create_table("db.rest_t", schema_from_spark(df.schema))
    t.append(df)
    assert t.scan().to_df().count() == 100
    # reload through the server: snapshot survived the commit protocol
    t2 = rest.load_table("db.rest_t")
    assert t2.current_snapshot() is not None
    assert t2.scan(row_filter="id < 10").to_df().count() == 10
    assert ("db", "rest_t") in rest.list_tables("db")


def test_concurrent_append_409_then_rebase(rest, spark):
    """The mock returns 409 on a failed assert-ref-snapshot-id; the
    Transaction retry layer validates + replays over REST."""
    df = spark.createDataFrame([(1,)], "id: long")
    rest.create_table("db.rest_c", schema_from_spark(df.schema))
    t1 = rest.load_table("db.rest_c")
    t2 = rest.load_table("db.rest_c")
    t1.append(df)
    t2.append(spark.createDataFrame([(2,)], "id: long"))  # 409 -> rebase
    t3 = rest.load_table("db.rest_c")
    assert {r.id for r in t3.scan().to_df().collect()} == {1, 2}
    assert len(t3.snapshots()) == 2


def test_schema_evolution_over_rest(rest, spark):
    from iceberg_python_spark.types import StringType

    df = spark.createDataFrame([(1,)], "id: long")
    t = rest.create_table("db.rest_evo", schema_from_spark(df.schema))
    t.append(df)
    t.update_schema().add_column("note", StringType()).commit()
    t2 = rest.load_table("db.rest_evo")
    assert "note" in t2.schema().column_names
    t2.append(spark.createDataFrame([(2, "hi")], "id: long, note: string"))
    rows = {(r.id, r.note) for r in t2.scan().to_df().collect()}
    assert rows == {(1, None), (2, "hi")}


def test_delete_and_time_travel_over_rest(rest, spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id: long")
    t = rest.create_table("db.rest_d", schema_from_spark(df.schema))
    t.append(df)
    snap1 = t.current_snapshot().snapshot_id
    t.delete("id >= 5")
    t.refresh()
    assert t.scan().to_df().count() == 5
    assert t.scan(snapshot_id=snap1).to_df().count() == 10


def test_rename_drop(rest, spark):
    df = spark.createDataFrame([(1,)], "id: long")
    rest.create_table("db.rest_r", schema_from_spark(df.schema))
    t = rest.rename_table("db.rest_r", "db.rest_r2")
    assert t.scan().to_df().count() == 0
    rest.drop_table("db.rest_r2")
    with pytest.raises(NoSuchTableError):
        rest.load_table("db.rest_r2")


@pytest.fixture()
def rest_srv(tmp_path, spark):
    server, uri = make_server(str(tmp_path / "wh"))
    cat = RestCatalog("rest-test", uri, spark)
    yield server, cat
    server.shutdown()


def _planned_table(cat, spark, name="db.rest_plan"):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(200)], "id: long, grp: string, val: double"
    )
    t = cat.create_table(name, schema_from_spark(df.schema))
    t.append(df)
    t.delete("id >= 150", mode="merge-on-read")
    t.refresh()
    return t


def test_server_side_scan_planning(rest_srv, spark):
    """scan-planning-mode=server routes planning through the REST plan
    endpoint; results (incl. MoR deletes) must match client planning."""
    server, cat = rest_srv
    t = _planned_table(cat, spark)
    expected = sorted(r.id for r in t.scan(row_filter="id < 40 or id >= 100").to_df().collect())
    raw = cat.plan_table_scan(("db", "rest_plan"))
    assert raw and all("data-file" in x for x in raw)

    t.metadata.properties["scan-planning-mode"] = "server"
    got = sorted(r.id for r in t.scan(row_filter="id < 40 or id >= 100").to_df().collect())
    assert got == expected == list(range(40)) + list(range(100, 150))


def test_server_side_planning_async_and_paginated(rest_srv, spark):
    """Async submission (submitted -> poll) + plan-task pagination."""
    server, cat = rest_srv
    t = _planned_table(cat, spark, "db.rest_plan2")
    srv_state = server.mock_state
    srv_state.plan_mode = "async"
    srv_state.page_size = 1
    t.metadata.properties["scan-planning-mode"] = "server"
    got = sorted(r.id for r in t.scan().to_df().collect())
    assert got == list(range(150))


def test_rest_expression_serde_roundtrip():
    from iceberg_python_spark.expressions.parser import parse as parse_filter
    from iceberg_python_spark.expressions.rest import expression_from_rest, expression_to_rest

    for s in [
        "id < 10 and grp = 'a'",
        "id >= 5 or not (val is null)",
        "grp in ('a', 'b') and id != 3",
        "name like 'pre%' and f is not nan",
    ]:
        e = parse_filter(s)
        assert expression_from_rest(expression_to_rest(e)) == e


def test_views_over_rest(rest, spark):
    """REST view spec round-trip: create (view-version + sql
    representation), load, list, read (SQL resolved against catalog
    tables), drop."""
    df = spark.createDataFrame([(i, float(i)) for i in range(20)], "id: long, val: double")
    t = rest.create_table("db.vt", schema_from_spark(df.schema))
    t.append(df)
    rest.create_view("db.big_vals", "SELECT id FROM vt WHERE val >= 10", comment="top half")
    assert rest.view_exists("db.big_vals")
    assert rest.view_sql("db.big_vals") == "SELECT id FROM vt WHERE val >= 10"
    assert ("db", "big_vals") in rest.list_views("db")
    assert rest.read_view("db.big_vals").count() == 10
    rest.drop_view("db.big_vals")
    assert not rest.view_exists("db.big_vals")


def test_oauth2_client_credentials_flow(tmp_path, spark):
    """OAuth2 client-credentials against an auth-enforcing server
    (reference catalog/rest/auth.py:70 LegacyOAuth2AuthManager): the
    `credential` property is exchanged for a bearer token before the
    config fetch; expired tokens (server-side invalidation) refresh
    transparently on the 401 retry; bad credentials fail loudly."""
    from pyspark.sql import functions as F

    server, uri = make_server(
        str(tmp_path / "wh"), require_auth=True, clients={"svc": "s3cret"}
    )
    try:
        # wrong secret: loud PermissionError, not a hang or silent retry
        with pytest.raises(PermissionError, match="invalid_client"):
            RestCatalog("rest-auth", uri, spark, properties={"credential": "svc:wrong"})
        # no credential at all: the server 401s the config fetch
        import requests as _rq

        with pytest.raises(_rq.HTTPError):
            RestCatalog("rest-auth", uri, spark)

        cat = RestCatalog("rest-auth", uri, spark, properties={"credential": "svc:s3cret"})
        cat.create_namespace("db")
        df = spark.range(7).withColumn("v", F.col("id") * 2)
        t = cat.create_table("db.t", df.schema)
        t.append(df)
        assert cat.load_table("db.t").scan().to_df().count() == 7

        # server-side token expiry: every outstanding token is revoked;
        # the next call 401s, the client re-authenticates and retries
        server.mock_state.valid_tokens.clear()
        assert cat.load_table("db.t").scan().to_df().count() == 7
        assert ("db", "t") in cat.list_tables("db")
    finally:
        server.shutdown()


def test_vended_storage_credentials(tmp_path, spark):
    """Vended credentials (X-Iceberg-Access-Delegation): load_table
    resolves the longest-prefix storage credential into
    table.io_properties; apply_storage_credentials scopes them to the
    table's bucket as per-bucket fs.s3a.* settings; loadCredentials
    re-vends on demand (reference catalog/rest/__init__.py:470, :1127)."""
    from pyspark.sql import functions as F

    server, uri = make_server(str(tmp_path / "wh"))
    try:
        cat = RestCatalog("rest-vend", uri, spark)
        cat.create_namespace("db")
        df = spark.range(3).withColumn("v", F.col("id"))
        cat.create_table("db.t", df.schema)
        # two credentials: the longer prefix must win for this table
        server.mock_state.storage_credentials = [
            {"prefix": "file:", "config": {"s3.access-key-id": "WIDE"}},
            {
                "prefix": str(tmp_path / "wh"),
                "config": {
                    "s3.access-key-id": "AKVENDED",
                    "s3.secret-access-key": "SECRETVENDED",
                    "s3.session-token": "TOKVENDED",
                },
            },
        ]
        t = cat.load_table("db.t")
        assert t.io_properties["s3.access-key-id"] == "AKVENDED"
        # non-s3 location: apply is an honest no-op
        assert t.apply_storage_credentials() == {}
        # s3 location: credentials land as per-bucket s3a conf
        t.metadata.location = "s3://vend-bucket/wh/db/t"
        applied = t.apply_storage_credentials()
        assert applied["fs.s3a.bucket.vend-bucket.access.key"] == "AKVENDED"
        assert applied["fs.s3a.bucket.vend-bucket.session.token"] == "TOKVENDED"
        conf = spark._jsc.hadoopConfiguration()
        assert conf.get("fs.s3a.bucket.vend-bucket.secret.key") == "SECRETVENDED"
        # refresh endpoint re-vends without reloading metadata
        server.mock_state.storage_credentials[1]["config"]["s3.session-token"] = "TOKROTATED"
        fresh = cat.load_credentials("db.t")
        assert fresh["s3.session-token"] == "TOKROTATED"
    finally:
        server.shutdown()
