"""Views, sort orders, statistics, CLI, catalog behaviors."""

import json
import subprocess
import sys

import pytest

from iceberg_python_spark.schema import schema_from_spark


@pytest.fixture()
def table(catalog, spark):
    df = spark.createDataFrame([(i, f"g{i % 3}", float(i)) for i in range(30)], "id: long, grp: string, val: double")
    t = catalog.create_table("db.extras", schema_from_spark(df.schema))
    t.append(df)
    return t


def test_views(catalog, table, spark):
    catalog.create_view("db.big_vals", "SELECT id, val FROM extras WHERE val > 20")
    assert catalog.view_exists("db.big_vals")
    out = catalog.read_view("db.big_vals")
    assert out.count() == 9
    assert catalog.list_views("db") == [("db", "big_vals")]
    catalog.drop_view("db.big_vals")
    assert not catalog.view_exists("db.big_vals")


def test_view_version_history(catalog, table, spark):
    """create -> replace -> replace keeps a full version log; old
    versions stay readable by version_id (reference view/__init__.py:27)."""
    catalog.create_view("db.v_hist", "SELECT id FROM extras WHERE val > 20", comment="v1")
    catalog.replace_view("db.v_hist", "SELECT id FROM extras WHERE val > 25", comment="v2")
    catalog.replace_view("db.v_hist", "SELECT id, grp FROM extras WHERE val > 28")
    hist = catalog.view_history("db.v_hist")
    assert [h["version_id"] for h in hist] == [1, 2, 3]
    assert [h["operation"] for h in hist] == ["create", "replace", "replace"]
    assert hist[0]["comment"] == "v1" and "val > 20" in hist[0]["sql"]
    assert all(h["timestamp_ms"] > 0 for h in hist)
    # current read uses the latest definition; version_id time-travels
    assert catalog.read_view("db.v_hist").count() == 1
    assert catalog.read_view("db.v_hist", version_id=1).count() == 9
    assert catalog.read_view("db.v_hist", version_id=2).count() == 4
    # create-over-existing is recorded as a replace, not a fresh log
    catalog.create_view("db.v_hist", "SELECT grp FROM extras")
    assert [h["version_id"] for h in catalog.view_history("db.v_hist")] == [1, 2, 3, 4]
    # replace of a missing view fails; history of dropped view is gone
    import pytest as _pytest

    from iceberg_python_spark.catalog import NoSuchTableError

    with _pytest.raises(NoSuchTableError):
        catalog.replace_view("db.nope", "SELECT 1")
    catalog.drop_view("db.v_hist")
    with _pytest.raises(NoSuchTableError):
        catalog.view_history("db.v_hist")


def test_sort_order_applied_on_write(catalog, table, spark):
    t = table
    t.update_sort_order().asc("grp").desc("val").commit()
    t.refresh()
    assert not t.sort_order().is_unsorted
    df = spark.createDataFrame([(100 + i, f"g{i % 2}", float(100 - i)) for i in range(50)], "id: long, grp: string, val: double")
    t.append(df)
    assert t.scan().to_df().count() == 80
    # new files are sorted within partitions: check a file added by the
    # post-sort-order commit (uuid paths don't sort by recency)
    last_snap = t.current_snapshot().snapshot_id
    newest = next(
        e["data_file"]
        for e in t._live_entries(t.current_snapshot())
        if e["snapshot_id"] == last_snap
    )
    rows = spark.read.parquet(newest["file_path"]).collect()
    keys = [(r.grp, -r.val) for r in rows]
    assert keys == sorted(keys)


def test_statistics(table):
    t = table
    t.update_statistics().compute("id", "grp").commit()
    t.refresh()
    stats = json.loads(t.properties["statistics.ndv"])
    schema = t.schema()
    ndv = {int(k): v for k, v in stats["ndv"].items()}
    assert abs(ndv[schema.find_field("id").field_id] - 30) <= 2  # approx
    assert abs(ndv[schema.find_field("grp").field_id] - 3) <= 1

    # a real Puffin statistics file is registered in the metadata and its
    # theta blobs decode back to the same NDVs
    from iceberg_python_spark.table.puffin import (
        PuffinFile,
        theta_sketch_estimate,
    )
    from iceberg_python_spark.io.fileio import read_bytes

    assert len(t.metadata.statistics) == 1
    sf = t.metadata.statistics[0]
    assert sf["snapshot-id"] == t.current_snapshot().snapshot_id
    pf = PuffinFile(read_bytes(sf["statistics-path"]))
    assert len(pf.blobs) == 2
    for blob in pf.blobs:
        assert blob.type == "apache-datasketches-theta-v1"
        (fid,) = blob.fields
        assert round(theta_sketch_estimate(pf.blob_payload(blob))) == ndv[fid]
        assert int(blob.properties["ndv"]) == ndv[fid]
    # compute_sketches(): ONE pass, and the blobs carry the REAL
    # retained-hash sets (exact NDV below k, meaningful set algebra)
    from pyspark.sql import functions as _F

    from iceberg_python_spark.table.puffin import theta_sketch_retained

    t.update_statistics().compute_sketches("id", "grp").commit()
    t.refresh()
    df = t.scan(selected_fields=("id", "grp")).to_df()
    exact = df.agg(
        _F.countDistinct("id").alias("id"), _F.countDistinct("grp").alias("grp")
    ).collect()[0]
    stats2 = json.loads(t.properties["statistics.ndv"])
    ndv2 = {int(k): v for k, v in stats2["ndv"].items()}
    assert ndv2[schema.find_field("id").field_id] == exact["id"]  # exact, not approx
    assert ndv2[schema.find_field("grp").field_id] == exact["grp"]
    pf2 = PuffinFile(read_bytes(t.metadata.statistics[0]["statistics-path"]))
    for blob in pf2.blobs:
        (fid,) = blob.fields
        retained, _theta = theta_sketch_retained(pf2.blob_payload(blob))
        assert len(retained) == ndv2[fid]  # one real hash per distinct value
        assert len(set(retained.tolist())) == len(retained)

    # replacing statistics for the same snapshot keeps one entry; removal drops it
    t.update_statistics().set_ndv("id", 30).commit()
    t.refresh()
    assert len(t.metadata.statistics) == 1
    t.update_statistics().remove_statistics(t.current_snapshot().snapshot_id).commit()
    t.refresh()
    assert t.metadata.statistics == []


def test_namespaces_and_rename(catalog, table):
    assert ("db",) in catalog.list_namespaces()
    catalog.rename_table("db.extras", "db.extras2")
    assert catalog.table_exists("db.extras2") and not catalog.table_exists("db.extras")
    t = catalog.load_table("db.extras2")
    assert t.scan().to_df().count() == 30


def test_cli(catalog, table, warehouse):
    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "iceberg_python_spark.cli", "--warehouse", warehouse, "--catalog", "test", *args],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
    out = run("list", "db")
    assert out.returncode == 0 and "db.extras" in out.stdout
    out = run("schema", "db.extras")
    assert "id" in out.stdout and "grp" in out.stdout
    out = run("snapshots", "db.extras")
    assert "append" in out.stdout
    out = run("files", "db.extras")
    assert "DATA" in out.stdout
    out = run("describe", "db.extras")
    assert json.loads(out.stdout)["name"] == "db.extras"
    # round-6 verbs: clone / branch / tag / publish / rewrite-manifests
    out = run("clone", "db.extras", "db.extras_clone")
    assert out.returncode == 0, out.stderr
    out = run("files", "db.extras_clone")
    assert "DATA" in out.stdout
    out = run("create-branch", "db.extras", "dev")
    assert out.returncode == 0, out.stderr
    out = run("create-tag", "db.extras", "v1")
    assert out.returncode == 0, out.stderr
    out = run("list-refs", "db.extras")
    assert "dev\tbranch" in out.stdout and "v1\ttag" in out.stdout
    out = run("publish", "db.extras", "dev")
    assert out.returncode == 0, out.stderr
    out = run("rewrite-manifests", "db.extras")
    assert out.returncode == 0, out.stderr


def test_set_remove_properties(spark, tmp_path):
    """Transaction/table property updates: set, overwrite, remove,
    persisted through commit + reload (reference Transaction
    set_properties/remove_properties)."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark

    df = spark.createDataFrame([(1, "a")], "id: long, v: string")
    cat = ips.SqliteCatalog("props", str(tmp_path / "wh"), spark)
    t = cat.create_table("db.props_t", schema_from_spark(df.schema), properties={"k0": "v0"})
    t.set_properties({"k1": "v1"}, k2="v2")
    t = t.refresh()
    assert t.metadata.properties.get("k1") == "v1" and t.metadata.properties.get("k2") == "v2"
    assert t.metadata.properties.get("k0") == "v0"
    t.set_properties(k1="v1b")
    t.remove_properties("k2", "missing-key")
    t = cat.load_table("db.props_t")
    assert t.metadata.properties.get("k1") == "v1b"
    assert "k2" not in t.metadata.properties
    # non-string values rejected
    import pytest

    with pytest.raises(ValueError):
        t.set_properties({"n": 1})  # type: ignore[dict-item]
    # property change + data change in one transaction commit together
    with t.transaction() as tx:
        tx.set_properties(k3="v3")
        tx.append(df)
    t = t.refresh()
    assert t.metadata.properties.get("k3") == "v3" and t.scan().count() == 1


def test_export_connectors_gated(catalog, spark):
    """Export connectors mirror the reference surface
    (table/__init__.py:1705 to_daft, :1715 to_bodo, :1725 to_polars,
    :1954 to_ray): present and honestly gated — uninstallable libraries
    raise NotImplementedError naming the missing package; the installed
    ones (duckdb, pandas, arrow) round-trip data."""
    import pytest as _pytest

    df = spark.range(5).toDF("id")
    t = catalog.create_table("db.exports", df.schema)
    t.append(df)
    assert t.to_arrow().num_rows == 5
    assert len(t.to_pandas()) == 5
    con = t.to_duckdb("exports_t")
    assert con.execute("SELECT COUNT(*) FROM exports_t").fetchone()[0] == 5
    for name in ("to_polars", "to_ray", "to_daft", "to_bodo"):
        try:
            __import__({"to_polars": "polars", "to_ray": "ray", "to_daft": "daft", "to_bodo": "bodo"}[name])
            installed = True
        except ImportError:
            installed = False
        if not installed:
            with _pytest.raises(NotImplementedError):
                getattr(t, name)()
    # DataFusion (reference table/__init__.py:1735): to_datafusion is
    # import-gated like the others; the FFI capsule dunder is ABSENT
    # (not always-raising) so hasattr-probing consumers fall back
    # cleanly instead of failing mid-registration (ADVICE r8)
    try:
        import datafusion  # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError):
            t.to_datafusion(None)
    assert not hasattr(t, "__datafusion_table_provider__")


def test_catalog_sql_surface(spark, tmp_path):
    """Catalog.sql: ns.table identifiers resolve to lazy temp views;
    joins across catalog tables work; string literals with dots are
    untouched; pushdown reaches the scan (PushedFilters non-empty)."""
    import iceberg_python_spark as ips
    from pyspark.sql import functions as F

    cat = ips.SqliteCatalog("sqlcat", str(tmp_path / "wh"), spark)
    orders = spark.range(100).select(
        F.col("id").alias("o_id"), (F.col("id") % 10).alias("cust"), (F.col("id") * 1.5).alias("amt")
    )
    custs = spark.range(10).select(F.col("id").alias("c_id"), F.concat(F.lit("c"), F.col("id")).alias("cname"))
    cat.create_table("db.orders", orders.schema).append(orders)
    cat.create_table("db.custs", custs.schema).append(custs)

    out = cat.sql(
        "SELECT cname, count(*) AS n, sum(amt) AS total "
        "FROM db.orders JOIN db.custs ON db.orders.cust = db.custs.c_id "
        "WHERE cname <> 'nobody.here' GROUP BY cname ORDER BY cname"
    )
    rows = out.collect()
    assert len(rows) == 10 and rows[0].n == 10
    assert abs(rows[0].total - sum(i * 1.5 for i in range(0, 100, 10))) < 1e-9

    # table names INSIDE string literals must survive the rewrite:
    # only the identifier use of db.orders becomes the view name, the
    # single- and double-quoted literal spans are left byte-for-byte
    # (Spark default treats "..." as a string literal too)
    lit = cat.sql(
        "SELECT count(*) AS n FROM db.orders "
        "WHERE 'db.orders' = 'db.orders' AND \"db.orders\" = 'db.orders'"
    )
    assert lit.first().n == 100

    # filter pushdown reaches the parquet scan through the view
    plan = cat.sql("SELECT o_id FROM db.orders WHERE o_id = 7")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_id" in plan.split("PushedFilters")[1][:80]

    # temp view name is returned and usable directly
    t = cat.load_table("db.orders")
    v = t.create_or_replace_temp_view()
    assert v == "db_orders"
    assert spark.sql("SELECT count(*) c FROM db_orders").first().c == 100


def test_table_accessor_parity(spark, tmp_path):
    """Thin accessors a porting reference user calls: schemas()/specs()/
    sort_orders() dicts, format_version, last_* counters, name_mapping,
    location_provider (reference table/__init__.py:1240-1290)."""
    import iceberg_python_spark as ips
    from iceberg_python_spark import spec_from_names
    from iceberg_python_spark.schema import schema_from_spark
    from pyspark.sql import functions as F

    cat = ips.SqliteCatalog("acc", str(tmp_path / "wh"), spark)
    df = spark.range(10).withColumn("v", F.col("id") % 3)
    schema = schema_from_spark(df.schema)
    t = cat.create_table("db.acc_t", schema, partition_spec=spec_from_names(schema, ("v", "identity")))
    t.append(df)

    assert set(t.schemas()) == {0}
    assert t.schemas()[0].find_field("v").field_id == t.schema().find_field("v").field_id
    assert list(t.specs()) == [t.spec().spec_id]
    assert t.sort_orders()[t.sort_order().order_id] is not None
    assert t.format_version in (2, 3)
    assert t.last_sequence_number >= 1
    assert t.last_partition_id >= 1000
    assert t.name_mapping() is None  # no mapping property set
    from iceberg_python_spark.name_mapping import NameMapping, PROPERTY_KEY

    t.set_properties({PROPERTY_KEY: NameMapping.from_schema(t.schema()).to_json()})
    nm = t.refresh().name_mapping()
    assert nm is not None and nm.id_for("v") == t.schema().find_field("v").field_id
    lp = t.location_provider()
    path = lp.new_data_location("f.parquet")
    assert path.startswith(t.location) and path.endswith("f.parquet")

    # schema evolution adds a new entry to schemas()
    t.update_schema().add_column("extra", ips.types.StringType()).commit()
    assert set(t.schemas()) == {0, 1}


def test_catalog_sql_backslash_escaped_literal(catalog, spark):
    """Backslash-escaped quotes (Spark's default literal mode) must not
    leak the literal span into the identifier rewrite."""
    import iceberg_python_spark as ips
    from pyspark.sql import functions as F

    df = spark.range(3).toDF("id")
    catalog.create_table("db.esc", df.schema).append(df)
    out = catalog.sql(
        "SELECT count(*) AS n FROM db.esc WHERE 'it\\'s db.esc here' = 'it\\'s db.esc here'"
    )
    assert out.first().n == 3


def test_cli_curate(catalog, spark, warehouse):
    """CLI curate verb runs the pipeline end-to-end and writes the
    artifact tables."""
    df = spark.createDataFrame(
        [
            (i, "sA" if i % 2 else "sB", "the cat and dog is of note here " + " ".join(f"w{i}x{j}" for j in range(55)))
            for i in range(20)
        ],
        "doc_id: long, source: string, text: string",
    )
    catalog.create_table("db.raw_docs", schema_from_spark(df.schema)).append(df)
    out = subprocess.run(
        [sys.executable, "-m", "iceberg_python_spark.cli", "--warehouse", warehouse, "--catalog", "test",
         "curate", "db.raw_docs", "db.curated", "--token-budget", "2000", "--seq-len", "128"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "after_neardup\t20" in out.stdout
    assert catalog.load_table("db.curated_clean").scan().to_df().count() == 20
    assert catalog.load_table("db.curated_packed").scan().to_df().count() >= 1


def test_catalog_sql_comments_and_backticks(spark, tmp_path):
    """Comment spans are non-code: an apostrophe inside `--` or /* */
    must not open a phantom literal (ns.tbl after it still resolves),
    and literal content after such a comment is never rewritten
    (ADVICE r8). Backtick-quoted identifiers are left untouched."""
    import iceberg_python_spark as ips
    from iceberg_python_spark.schema import schema_from_spark

    cat = ips.SqliteCatalog("sqlc", str(tmp_path / "wh"), spark)
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    t = cat.create_table("db.nums", schema_from_spark(df.schema))
    t.append(df)

    # apostrophe in a line comment, then a real table reference
    out = cat.sql("SELECT count(*) AS c -- don't trip here\nFROM db.nums")
    assert out.first()["c"] == 5
    # apostrophe in a block comment spanning lines
    out2 = cat.sql("SELECT /* isn't\n a literal */ sum(v) AS s FROM db.nums")
    assert out2.first()["s"] == 20
    # a literal AFTER a comment with an apostrophe keeps its content:
    # 'db.nums' inside the string must NOT be rewritten to the view name
    out3 = cat.sql("SELECT 'db.nums' AS lit -- it's a comment\nFROM db.nums LIMIT 1")
    assert out3.first()["lit"] == "db.nums"
