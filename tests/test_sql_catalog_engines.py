"""The SQL-catalog behavior suite, parametrized over both DB-API engines.

Proves the engine-agnostic claim (reference catalog/sql.py:115 is
SQLAlchemy-generic; ours is DB-API-generic): identical behavior on SQLite
and DuckDB, including the optimistic-concurrency commit path.
"""

import threading

import pytest
from pyspark.sql import functions as F

import iceberg_python_spark as ips
from iceberg_python_spark import DuckDBCatalog, SqliteCatalog
from iceberg_python_spark.table import CommitFailedException


class MinimalThirdEngine:
    """Contract-conformance witness: a third engine implementing ONLY the
    documented `SqlEngine` surface — nothing the catalog doesn't promise
    to call. If the full behavior suite passes on this, the contract is
    sufficient, and a server-side engine is exactly this much code:

    - ``connect()`` → a DB-API connection in manual-transaction mode
      (Postgres/psycopg2: ``conn.autocommit = True`` + explicit BEGIN,
      plus a cursor shim if the driver's paramstyle isn't qmark —
      translate ``?`` → ``%s`` before execute)
    - ``begin_write(con)`` → enter a writer-serialized txn (Postgres:
      ``BEGIN``; row locks + the UPDATE-after-SELECT pattern serialize,
      or take ``pg_advisory_xact_lock`` for strictness)
    - ``commit/rollback`` → SQL COMMIT/ROLLBACK (inherited default)
    - ``end_write(con)`` → release any engine-level lock, owner-aware
      (no-op for Postgres)
    - ``insert_ignore_suffix`` / ``upsert_suffix`` → ON CONFLICT clauses
      (inherited defaults are valid Postgres ≥ 9.5)
    - ``init_schema`` → run DDL (inherited default)

    This witness wraps sqlite3 but with DuckDB-style engine-level write
    locking (a different serialization strategy than SqliteEngine's
    BEGIN IMMEDIATE), so passing is not an artifact of reusing either
    shipped engine's behavior."""

    def __init__(self, db_path):
        import threading

        self.db_path = db_path
        self._lock = threading.Lock()
        self._owner = threading.local()
        from iceberg_python_spark.catalog_engines import SqlEngine

        self.insert_ignore_suffix = SqlEngine.insert_ignore_suffix.__get__(self)
        self.upsert_suffix = SqlEngine.upsert_suffix.__get__(self)
        self.init_schema = SqlEngine.init_schema.__get__(self)

    def connect(self):
        import sqlite3

        con = sqlite3.connect(self.db_path, timeout=30)
        con.isolation_level = None
        return con

    def close(self, con):
        con.close()

    def begin_write(self, con):
        self._lock.acquire()
        self._owner.held = True
        con.execute("BEGIN")

    def commit(self, con):
        con.execute("COMMIT")

    def rollback(self, con):
        con.execute("ROLLBACK")

    def end_write(self, con):
        if getattr(self._owner, "held", False):
            self._owner.held = False
            self._lock.release()


@pytest.fixture(params=["sqlite", "duckdb", "minimal-third"])
def cat(request, spark, tmp_path):
    wh = str(tmp_path / f"wh_{request.param}")
    if request.param == "sqlite":
        return SqliteCatalog("eng", wh, spark)
    if request.param == "minimal-third":
        import os

        from iceberg_python_spark.catalog import SqlCatalog

        os.makedirs(wh, exist_ok=True)
        return SqlCatalog("eng", wh, spark, MinimalThirdEngine(os.path.join(wh, "third.db")))
    return DuckDBCatalog("eng", wh, spark)


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
    # idempotent create keeps original properties
    cat.create_namespace("ns1", {"owner": "other"})
    assert cat.load_namespace_properties("ns1") == {"owner": "me"}
    cat.drop_namespace("ns1")
    assert not cat.namespace_exists("ns1")


def test_views_and_history(cat, spark):
    _mk(cat, spark)
    cat.create_view("db.v", "SELECT id FROM t WHERE id < 5")
    assert cat.read_view("db.v").count() == 5
    cat.replace_view("db.v", "SELECT id FROM t WHERE id < 3")
    assert cat.read_view("db.v").count() == 3
    hist = cat.view_history("db.v")
    assert [h["operation"] for h in hist] == ["create", "replace"]
    assert cat.read_view("db.v", version_id=1).count() == 5
    cat.drop_view("db.v")
    with pytest.raises(ips.NoSuchTableError):
        cat.view_sql("db.v")


def test_commit_cas_and_refresh(cat, spark):
    """Overlapping deletes from the same base: loser must fail the CAS
    rebase (same surface as test_table_e2e's conflict tests, here proving
    the CAS works identically on both engines)."""
    t = _mk(cat, spark)
    t1 = cat.load_table("db.t")
    t2 = cat.load_table("db.t")
    t1.delete("id >= 0")  # removes everything; wins
    with pytest.raises(CommitFailedException):
        t2.delete("id >= 5")  # its target files were rewritten/deleted
    t2.refresh()
    assert t2.scan().to_df().count() == 0


def test_concurrent_appends_all_land(cat, spark):
    """N threads appending concurrently: CAS + retry must land all rows."""
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


def test_register_table_cross_engine(cat, spark, tmp_path):
    """Metadata written under one engine's catalog loads in the other."""
    t = _mk(cat, spark)
    other = (
        SqliteCatalog("other", str(tmp_path / "wh_other"), spark)
        if isinstance(cat, DuckDBCatalog)
        else DuckDBCatalog("other", str(tmp_path / "wh_other"), spark)
    )
    reg = other.register_table("mirror.t", t.metadata_location)
    assert reg.scan().to_df().count() == 10


def test_create_table_transaction(cat, spark):
    """Staged create (reference catalog/__init__.py:396): writes stage
    against an unregistered table; commit registers it atomically."""
    df = spark.range(20).withColumn("v", F.col("id") * 3)
    tx = cat.create_table_transaction("db.staged", df.schema)
    tx.append(df)
    tx.append(df.withColumn("id", F.col("id") + 100))
    # not visible before commit
    assert not cat.table_exists("db.staged")
    t = tx.commit_transaction()
    assert cat.table_exists("db.staged")
    assert t.scan().to_df().count() == 40
    assert cat.load_table("db.staged").scan().to_df().count() == 40
    # duplicate name: staged commit fails, catalog unchanged
    tx2 = cat.create_table_transaction("db.staged", df.schema)
    tx2.append(df)
    with pytest.raises(ips.TableAlreadyExistsError):
        tx2.commit_transaction()
    assert cat.load_table("db.staged").scan().to_df().count() == 40
    # abandoned staged create leaves no catalog entry
    tx3 = cat.create_table_transaction("db.ghost", df.schema)
    tx3.append(df)
    del tx3
    assert not cat.table_exists("db.ghost")


def test_load_catalog_factory_and_ns_properties(spark, tmp_path):
    from iceberg_python_spark.catalog import load_catalog

    for ctype in ("sql", "duckdb", "in-memory"):
        c = load_catalog(f"lc_{ctype.replace('-','_')}", spark, type=ctype, warehouse=str(tmp_path / ctype))
        c.create_namespace("db", {"a": "1", "b": "2"})
        summary = c.update_namespace_properties("db", removals=["b", "zz"], updates={"c": "3"})
        assert summary == {"updated": ["c"], "removed": ["b"], "missing": ["zz"]}
        assert c.load_namespace_properties("db") == {"a": "1", "c": "3"}
        c.create_namespace_if_not_exists("db")
        assert c.load_namespace_properties("db") == {"a": "1", "c": "3"}
    # hive / bigquery resolve to their dedicated backends (round 7);
    # construction is config-only — no service contact until first call
    from iceberg_python_spark.catalog_bq import BigQueryMetastoreCatalog
    from iceberg_python_spark.catalog_hive import HiveCatalog

    h = load_catalog("h", spark, type="hive", uri="thrift://localhost:9083")
    assert isinstance(h, HiveCatalog)
    b = load_catalog("b", spark, type="bigquery", **{"gcp.project-id": "p"})
    assert isinstance(b, BigQueryMetastoreCatalog)
    with pytest.raises(ValueError, match="unknown catalog type"):
        load_catalog("x", spark, type="nope")


def test_schema_as_arrow_and_name_mapping(spark):
    from iceberg_python_spark.schema import schema_from_spark

    df = spark.range(1).withColumn("s", F.lit("x"))
    sch = schema_from_spark(df.schema)
    pa_schema = sch.as_arrow()
    assert [f.name for f in pa_schema] == ["id", "s"]
    nm = sch.name_mapping()
    assert nm.id_for("id") == sch.find_field("id").field_id


def test_duckdb_stray_end_write_keeps_lock(spark, tmp_path):
    """end_write must be owner-aware: a stray end_write from a thread
    that never acquired the write lock must NOT release another
    writer's lock (that would break write-txn serialization)."""
    import threading

    from iceberg_python_spark.catalog_engines import DuckDBEngine

    eng = DuckDBEngine(str(tmp_path / "lock.duckdb"))
    con = eng.connect()
    eng.begin_write(con)
    try:
        released_by_stranger = []

        def stray():
            c2 = eng.connect()
            eng.end_write(c2)  # never acquired -> must be a no-op
            released_by_stranger.append(eng._write_lock.locked())

        th = threading.Thread(target=stray)
        th.start()
        th.join()
        assert released_by_stranger == [True]  # still held by the owner
    finally:
        con.execute("ROLLBACK")
        eng.end_write(con)
    assert not eng._write_lock.locked()


def test_catalog_close_and_add_identity(spark, tmp_path):
    """Catalog.close releases engine-held resources (DuckDB root con);
    UpdateSpec.add_identity is the reference's identity-partition sugar."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark

    cat = ips.DuckDBCatalog("closeme", str(tmp_path / "wh"), spark)
    df = spark.range(6).withColumn("v", F.col("id") % 2)
    t = cat.create_table("db.c_t", schema_from_spark(df.schema))
    t.append(df)
    t.update_spec().add_identity("v").commit()
    assert [str(f.transform) for f in t.spec().fields] == ["identity"]
    t.append(df)
    assert t.scan(row_filter="v = 1").to_df().count() == 6
    cat.close()
    with pytest.raises(Exception):  # root connection is gone
        cat.list_tables("db")
    # sqlite close is a safe no-op (per-op connections)
    cat2 = ips.SqliteCatalog("closeme2", str(tmp_path / "wh2"), spark)
    cat2.create_namespace("db")
    cat2.close()
    assert cat2.list_tables("db") == []
