"""Catalogs: engine-agnostic SQL catalog (SQLite / DuckDB) and in-memory.

Reference: pyiceberg/catalog/__init__.py:347 (Catalog ABC),
pyiceberg/catalog/sql.py:115 (SqlCatalog — SQLAlchemy-generic there; here
generic at the DB-API level via `catalog_engines.SqlEngine`, proven on two
real engines since SQLAlchemy isn't installable in this sandbox). The commit
protocol is optimistic concurrency: write the new metadata JSON, then
compare-and-swap the catalog's metadata-location pointer inside a write
transaction (reference catalog/__init__.py:554 commit_table; SURVEY.md §7
watch-list item 5 — the file catalog needs a real CAS to survive concurrent
writers).

All SQL is ANSI + `ON CONFLICT` with qmark params, and affected-row checks
are SELECT-then-act inside the engine's serialized write transaction — no
cursor.rowcount, no RETURNING — so a new backend (e.g. Postgres through a
DB-API driver) only needs a `SqlEngine` subclass.
"""

from __future__ import annotations

import json
import os
import posixpath
import uuid
from contextlib import contextmanager
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame, SparkSession

from .catalog_engines import DuckDBEngine, SqlEngine, SqliteEngine
from .partitioning import UNPARTITIONED, PartitionSpec
from .schema import Schema, assign_fresh_ids, schema_from_spark
from .table import CommitFailedException, StaticTable, Table, Transaction
from .table.metadata import SortOrder, TableMetadata, new_table_metadata

Identifier = Tuple[str, ...]


class NoSuchTableError(Exception):
    pass


class TableAlreadyExistsError(Exception):
    pass


class NoSuchNamespaceError(Exception):
    pass


class NamespaceAlreadyExistsError(Exception):
    pass


def _to_identifier(identifier: Union[str, Identifier]) -> Identifier:
    if isinstance(identifier, str):
        return tuple(identifier.split("."))
    return tuple(identifier)


_DDL = [
    """CREATE TABLE IF NOT EXISTS iceberg_tables (
        catalog_name TEXT NOT NULL,
        table_namespace TEXT NOT NULL,
        table_name TEXT NOT NULL,
        metadata_location TEXT,
        previous_metadata_location TEXT,
        PRIMARY KEY (catalog_name, table_namespace, table_name)
    )""",
    """CREATE TABLE IF NOT EXISTS iceberg_namespace_properties (
        catalog_name TEXT NOT NULL,
        namespace TEXT NOT NULL,
        properties TEXT,
        PRIMARY KEY (catalog_name, namespace)
    )""",
    """CREATE TABLE IF NOT EXISTS iceberg_views (
        catalog_name TEXT NOT NULL,
        view_namespace TEXT NOT NULL,
        view_name TEXT NOT NULL,
        sql TEXT NOT NULL,
        comment TEXT,
        PRIMARY KEY (catalog_name, view_namespace, view_name)
    )""",
    """CREATE TABLE IF NOT EXISTS iceberg_view_versions (
        catalog_name TEXT NOT NULL,
        view_namespace TEXT NOT NULL,
        view_name TEXT NOT NULL,
        version_id INTEGER NOT NULL,
        sql TEXT NOT NULL,
        comment TEXT,
        operation TEXT NOT NULL,
        timestamp_ms BIGINT NOT NULL,
        PRIMARY KEY (catalog_name, view_namespace, view_name, version_id))""",
]

_TBL_PK = ("catalog_name", "table_namespace", "table_name")


class MetastoreCatalog:
    """Backend-independent catalog core (reference
    catalog/__init__.py:347 Catalog ABC + MetastoreCatalog). The table
    lifecycle — create / load / drop / register / clone / commit-CAS /
    staged create-transaction — is implemented ONCE here against four
    atomic pointer primitives a metastore must provide:

    - ``_pointer_get(ns, name)`` -> metadata_location or None
    - ``_pointer_put_if_absent(ns, name, location)`` — atomic
      create-if-absent, raises TableAlreadyExistsError
    - ``_pointer_cas(ns, name, expected, new)`` — atomic
      compare-and-swap, raises CommitFailedException on mismatch
    - ``_pointer_delete(ns, name)`` — raises NoSuchTableError

    plus namespace/list surfaces each backend maps natively (SQL rows,
    Glue databases, DynamoDB items). SqlCatalog, GlueCatalog and
    DynamoDbCatalog are all thin primitive sets under this core, so the
    commit protocol (and its concurrency semantics) is identical across
    backends by construction.
    """

    def __init__(self, name: str, warehouse: str, spark: SparkSession):
        from .io.fileio import is_remote, to_local

        self.name = name
        self.warehouse = warehouse.rstrip("/")
        self.spark = spark
        if not is_remote(self.warehouse):
            os.makedirs(to_local(self.warehouse), exist_ok=True)

    # -- pointer primitives (backend contract) --------------------------------
    def _pointer_get(self, ns: str, table_name: str) -> Optional[str]:
        raise NotImplementedError

    def _pointer_put_if_absent(self, ns: str, table_name: str, metadata_location: str) -> None:
        raise NotImplementedError

    def _pointer_cas(self, ns: str, table_name: str, expected: str, new: str) -> None:
        raise NotImplementedError

    def _pointer_delete(self, ns: str, table_name: str) -> None:
        raise NotImplementedError

    def namespace_exists(self, namespace: Union[str, Identifier]) -> bool:
        raise NotImplementedError

    def create_namespace(self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None) -> None:
        raise NotImplementedError

    def list_tables(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        raise NotImplementedError

    def create_namespace_if_not_exists(
        self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None
    ) -> None:
        try:
            self.create_namespace(namespace, properties)
        except NamespaceAlreadyExistsError:
            pass

    # -- shared table lifecycle ------------------------------------------------
    def create_table(
        self,
        identifier: Union[str, Identifier],
        schema: Union[Schema, "pyspark.sql.types.StructType"],
        partition_spec: PartitionSpec = UNPARTITIONED,
        sort_order: Optional[SortOrder] = None,
        properties: Optional[Dict[str, str]] = None,
        location: Optional[str] = None,
    ) -> Table:
        ident = _to_identifier(identifier)
        ns, table_name = ".".join(ident[:-1]), ident[-1]
        if not self.namespace_exists(ns):
            self.create_namespace(ns)
        from pyspark.sql import types as T

        if isinstance(schema, T.StructType):
            schema = schema_from_spark(schema)
        location = location or posixpath.join(self.warehouse, *ident)
        metadata = new_table_metadata(schema, partition_spec, location, properties, sort_order)
        metadata_location = self._write_metadata(metadata, version=1)
        self._pointer_put_if_absent(ns, table_name, metadata_location)
        self._write_version_hint(metadata_location, location)
        return Table(ident, metadata, metadata_location, self, self.spark)

    def create_table_transaction(
        self,
        identifier: Union[str, Identifier],
        schema: Union[Schema, "pyspark.sql.types.StructType"],
        partition_spec: PartitionSpec = UNPARTITIONED,
        sort_order: Optional[SortOrder] = None,
        properties: Optional[Dict[str, str]] = None,
        location: Optional[str] = None,
    ) -> "CreateTableTransaction":
        """Stage a table creation plus writes, committed atomically
        (reference catalog/__init__.py:396): nothing is visible in the
        catalog until ``commit_transaction()``; an abandoned transaction
        leaves no catalog entry. Usage::

            with catalog.create_table_transaction("db.t", schema) as tx:
                tx.append(df)
        """
        from pyspark.sql import types as T

        ident = _to_identifier(identifier)
        if isinstance(schema, T.StructType):
            schema = schema_from_spark(schema)
        location = location or posixpath.join(self.warehouse, *ident)
        metadata = new_table_metadata(schema, partition_spec, location, properties, sort_order)
        # no metadata file and no catalog row yet — the sentinel location
        # only seeds the committed file's version numbering
        sentinel = posixpath.join(location, "metadata", "00000-staged.metadata.json")
        table = Table(ident, metadata, sentinel, _StagedCreateCatalog(self), self.spark)
        return CreateTableTransaction(table)

    def create_table_if_not_exists(self, identifier, schema, **kw) -> Table:
        try:
            return self.create_table(identifier, schema, **kw)
        except TableAlreadyExistsError:
            return self.load_table(identifier)

    def load_table(self, identifier: Union[str, Identifier]) -> Table:
        ident = _to_identifier(identifier)
        ns, table_name = ".".join(ident[:-1]), ident[-1]
        metadata_location = self._pointer_get(ns, table_name)
        if metadata_location is None:
            raise NoSuchTableError(".".join(ident))
        metadata = TableMetadata.read(metadata_location)
        return Table(ident, metadata, metadata_location, self, self.spark)

    def table_exists(self, identifier: Union[str, Identifier]) -> bool:
        try:
            self.load_table(identifier)
            return True
        except NoSuchTableError:
            return False

    def close(self) -> None:
        """Release backend resources (reference Catalog.close). The
        pointer-primitive backends open connections per operation, so
        the base is a no-op; engine-holding subclasses override."""

    def sql(self, query: str) -> "pyspark.sql.DataFrame":
        """Run Spark SQL over this catalog's tables: every ``ns.table``
        token in the query that names a catalog table is registered as a
        lazy temp view (``ns_table``) and the query rewritten to use it,
        then handed to ``spark.sql``. The Spark-native counterpart of
        the reference's to_duckdb + con.execute flow — but scans stay
        lazy, so SQL filters/projections push down into the parquet
        read instead of materializing the table first.

        Resolution is textual (dotted identifiers outside of string
        literals); tables are read at their CURRENT snapshot. For time
        travel or branch reads, register views explicitly via
        ``table.scan(...).to_df().createOrReplaceTempView(...)``."""
        import re as _re

        # Split the query into code and non-code segments so dotted
        # names inside non-code spans are neither resolved nor
        # rewritten. Non-code spans (ADVICE r8: an apostrophe inside a
        # comment must not open a phantom literal):
        # - string literals (single/double quoted, honoring backslash
        #   escapes — Spark's default mode — and doubled-quote escapes),
        # - `--` line comments and `/* */` block comments,
        # - backtick-quoted identifiers (explicitly quoted names are
        #   the user's own resolution, left untouched).
        segments = _re.split(
            r"('(?:[^'\\]|\\.|'')*'"
            r"|\"(?:[^\"\\]|\\.|\"\")*\""
            r"|`(?:[^`]|``)*`"
            r"|--[^\n]*"
            r"|(?s:/\*.*?\*/))",
            query,
        )
        code = [s for i, s in enumerate(segments) if i % 2 == 0]
        for ns, tbl in dict.fromkeys(
            m for s in code for m in _re.findall(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", s)
        ):
            try:
                t = self.load_table(f"{ns}.{tbl}")
            except (NoSuchTableError, NoSuchNamespaceError):
                continue
            view = t.create_or_replace_temp_view()
            pat = _re.compile(rf"\b{_re.escape(ns)}\.{_re.escape(tbl)}\b")
            segments = [pat.sub(view, s) if i % 2 == 0 else s for i, s in enumerate(segments)]
        return self.spark.sql("".join(segments))

    def drop_table(self, identifier: Union[str, Identifier]) -> None:
        ident = _to_identifier(identifier)
        self._pointer_delete(".".join(ident[:-1]), ident[-1])

    def purge_table(self, identifier: Union[str, Identifier]) -> None:
        from .io.fileio import remove_recursive

        table = self.load_table(identifier)
        self.drop_table(identifier)
        remove_recursive(table.location, self.spark)

    def clone_table(
        self,
        src_identifier: Union[str, Identifier],
        dst_identifier: Union[str, Identifier],
        snapshot_id: Optional[int] = None,
        properties: Optional[Dict[str, str]] = None,
    ) -> Table:
        """Snapshot-clone: a new independent table over the SOURCE's current
        (or given) snapshot's data files — metadata only, zero data copied
        (the Iceberg "snapshot table" action; Spark's
        SnapshotTableSparkAction has the same shape). The clone shares file
        paths but owns its metadata: later writes/deletes/compactions on
        either side produce new files in that table's own location and
        never touch the shared ones. Do NOT ``purge_table`` a clone whose
        source is still live — purge removes the shared data directory.

        Requires a delete-free source snapshot (position/equality deletes
        and DVs reference data files by path and sequence number; cloning
        them would pin cross-table sequence semantics — compact first)."""
        src = self.load_table(src_identifier)
        snap = src.snapshot_by_id(snapshot_id) if snapshot_id else src.current_snapshot()
        entries = src._live_entries(snap) if snap else []
        if any(e["data_file"].get("content", 0) != 0 for e in entries):
            raise ValueError(
                f"clone_table: source snapshot of {src.name} carries delete files; "
                "run compact() first so the snapshot is delete-free"
            )
        dst = self.create_table(
            dst_identifier,
            src.schema(),
            partition_spec=src.metadata.spec(),
            sort_order=src.metadata.sort_order(),
            properties={**src.metadata.properties, **(properties or {})},
        )
        if entries:
            dst.register_data_files(
                [e["data_file"] for e in entries],
                snapshot_properties={
                    "cloned-from": src.name,
                    "cloned-snapshot-id": str(snap.snapshot_id),
                },
            )
            dst.refresh()
        return dst

    def register_table(self, identifier: Union[str, Identifier], metadata_location: str) -> Table:
        """Register an existing metadata JSON under a new name
        (reference catalog/__init__.py:521)."""
        ident = _to_identifier(identifier)
        ns, table_name = ".".join(ident[:-1]), ident[-1]
        if not self.namespace_exists(ns):
            self.create_namespace(ns)
        TableMetadata.read(metadata_location)  # validate
        self._pointer_put_if_absent(ns, table_name, metadata_location)
        return self.load_table(ident)

    # -- commit protocol -----------------------------------------------------------
    def _write_metadata(self, metadata: TableMetadata, version: int) -> str:
        # uuid suffix so concurrent commit attempts at the same version can
        # NEVER overwrite each other's file — the CAS below picks the winner
        # (same reason the spec names files 00001-<uuid>.metadata.json)
        from .locations import metadata_base_path

        path = posixpath.join(
            metadata_base_path(metadata.location, metadata.properties),
            f"{version:05d}-{uuid.uuid4()}.metadata.json",
        )
        metadata.write(path)
        return path

    @staticmethod
    def _write_version_hint(metadata_location: str, table_location: str) -> None:
        """Discovery hint for catalog-free readers. The hint FILE always
        lives at ``<location>/metadata/version-hint.text`` — that is the
        probe path a path-only reader (spark_datasource, StaticTable)
        checks before it can read any table property, so it must not
        follow a ``write.metadata.path`` override. When the override
        redirects metadata elsewhere, the hint BODY holds the full
        metadata path instead of the basename; readers accept either."""
        from .io.fileio import write_text

        meta_dir = f"{table_location.rstrip('/')}/metadata"
        body = (
            posixpath.basename(metadata_location)
            if posixpath.dirname(metadata_location) == meta_dir
            else metadata_location
        )
        write_text(posixpath.join(meta_dir, "version-hint.text"), body)

    def _commit_table(self, table: Table, new_metadata: TableMetadata) -> None:
        ns, table_name = ".".join(table.identifier[:-1]), table.identifier[-1]
        old_location = table.metadata_location
        # next version number from the current pointer
        base = os.path.basename(old_location)
        version = int(base.split("-")[0].lstrip("v").split(".")[0]) + 1
        new_metadata.metadata_log = (new_metadata.metadata_log or []) + [
            {"timestamp-ms": new_metadata.last_updated_ms, "metadata-file": old_location}
        ]
        # metadata-log retention (reference TableProperties
        # write.metadata.previous-versions-max, default 100, and
        # write.metadata.delete-after-commit.enabled, default false —
        # table/__init__.py:143-147): trim the log to the newest N
        # entries; only delete the dropped metadata FILES when the
        # delete property opts in (trimming the log alone never removes
        # history files another reader might hold)
        props = new_metadata.properties or {}
        keep = int(props.get("write.metadata.previous-versions-max", "100"))
        dropped = []
        if keep > 0 and len(new_metadata.metadata_log) > keep:
            dropped = new_metadata.metadata_log[:-keep]
            new_metadata.metadata_log = new_metadata.metadata_log[-keep:]
        new_location = self._write_metadata(new_metadata, version)
        self._pointer_cas(ns, table_name, old_location, new_location)
        self._write_version_hint(new_location, new_metadata.location)  # advisory, after the CAS won
        if dropped and str(
            props.get("write.metadata.delete-after-commit.enabled", "false")
        ).lower() == "true":
            from .io.fileio import remove as _rm

            for e in dropped:
                if e.get("metadata-file"):
                    _rm(e["metadata-file"], self.spark)
        table.metadata = new_metadata
        table.metadata_location = new_location


class SqlCatalog(MetastoreCatalog):
    """A durable catalog holding metadata-location pointers behind a
    `SqlEngine`. Matches the shape of the reference's SqlCatalog tables
    (iceberg_tables / iceberg_namespace_properties, catalog/sql.py:62-113).
    """

    def __init__(self, name: str, warehouse: str, spark: SparkSession, engine: SqlEngine):
        super().__init__(name, warehouse, spark)
        self.engine = engine
        self.engine.init_schema(_DDL)

    def close(self) -> None:
        self.engine.dispose()

    @contextmanager
    def _conn(self) -> Iterator[Any]:
        """Autocommit session (single-statement reads/writes)."""
        con = self.engine.connect()
        try:
            yield con
        finally:
            self.engine.close(con)

    @contextmanager
    def _write_txn(self) -> Iterator[Any]:
        """Writer-serialized transaction: SELECT-then-act inside is race-free."""
        con = self.engine.connect()
        try:
            self.engine.begin_write(con)
            try:
                yield con
                self.engine.commit(con)
            except BaseException:
                self.engine.rollback(con)
                raise
            finally:
                self.engine.end_write(con)
        finally:
            self.engine.close(con)

    # -- namespaces ------------------------------------------------------------
    def create_namespace(self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None) -> None:
        ns = ".".join(_to_identifier(namespace))
        suffix = self.engine.insert_ignore_suffix(("catalog_name", "namespace"))
        with self._conn() as con:
            con.execute(
                f"INSERT INTO iceberg_namespace_properties VALUES (?, ?, ?){suffix}",
                (self.name, ns, json.dumps(properties or {})),
            )

    def create_namespace_if_not_exists(
        self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None
    ) -> None:
        self.create_namespace(namespace, properties)  # create is already idempotent

    def update_namespace_properties(
        self,
        namespace: Union[str, Identifier],
        removals: Optional[Sequence[str]] = None,
        updates: Optional[Dict[str, str]] = None,
    ) -> Dict[str, List[str]]:
        """Merge-update namespace properties (reference
        catalog/__init__.py update_namespace_properties); returns the
        reference's summary shape {updated, removed, missing}."""
        ns = ".".join(_to_identifier(namespace))
        removals = list(removals or [])
        updates = dict(updates or {})
        overlap = set(removals) & set(updates)
        if overlap:
            raise ValueError(f"properties in both removals and updates: {sorted(overlap)}")
        with self._write_txn() as con:
            row = con.execute(
                "SELECT properties FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?",
                (self.name, ns),
            ).fetchone()
            if row is None:
                raise NoSuchNamespaceError(ns)
            props = json.loads(row[0] or "{}")
            removed = [k for k in removals if k in props]
            missing = [k for k in removals if k not in props]
            for k in removed:
                del props[k]
            props.update(updates)
            con.execute(
                "UPDATE iceberg_namespace_properties SET properties=? WHERE catalog_name=? AND namespace=?",
                (json.dumps(props), self.name, ns),
            )
        return {"updated": sorted(updates), "removed": removed, "missing": missing}

    def list_namespaces(self) -> List[Identifier]:
        with self._conn() as con:
            rows = con.execute(
                "SELECT namespace FROM iceberg_namespace_properties WHERE catalog_name = ?", (self.name,)
            ).fetchall()
        return [tuple(r[0].split(".")) for r in rows]

    def namespace_exists(self, namespace: Union[str, Identifier]) -> bool:
        ns = ".".join(_to_identifier(namespace))
        with self._conn() as con:
            return (
                con.execute(
                    "SELECT 1 FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?",
                    (self.name, ns),
                ).fetchone()
                is not None
            )

    def drop_namespace(self, namespace: Union[str, Identifier]) -> None:
        ns = ".".join(_to_identifier(namespace))
        if self.list_tables(namespace):
            raise ValueError(f"namespace {ns} is not empty")
        with self._conn() as con:
            con.execute(
                "DELETE FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?", (self.name, ns)
            )

    def load_namespace_properties(self, namespace: Union[str, Identifier]) -> Dict[str, str]:
        ns = ".".join(_to_identifier(namespace))
        with self._conn() as con:
            row = con.execute(
                "SELECT properties FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?",
                (self.name, ns),
            ).fetchone()
        if row is None:
            raise NoSuchNamespaceError(ns)
        return json.loads(row[0] or "{}")

    # -- pointer primitives (MetastoreCatalog contract) -------------------------
    def _pointer_get(self, ns: str, table_name: str) -> Optional[str]:
        with self._conn() as con:
            row = con.execute(
                "SELECT metadata_location FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ns, table_name),
            ).fetchone()
        return None if row is None else row[0]

    def _pointer_put_if_absent(self, ns: str, table_name: str, metadata_location: str) -> None:
        with self._write_txn() as con:
            cur = con.execute(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ns, table_name),
            )
            if cur.fetchone() is not None:
                raise TableAlreadyExistsError(f"{ns}.{table_name}")
            con.execute(
                "INSERT INTO iceberg_tables VALUES (?, ?, ?, ?, NULL)",
                (self.name, ns, table_name, metadata_location),
            )

    def _pointer_cas(self, ns: str, table_name: str, expected: str, new: str) -> None:
        with self._write_txn() as con:
            row = con.execute(
                "SELECT metadata_location FROM iceberg_tables "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ns, table_name),
            ).fetchone()
            if row is None or row[0] != expected:
                raise CommitFailedException(
                    f"metadata location for {ns}.{table_name} changed concurrently (expected {expected})"
                )
            con.execute(
                "UPDATE iceberg_tables SET metadata_location=?, previous_metadata_location=? "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (new, expected, self.name, ns, table_name),
            )

    def _pointer_delete(self, ns: str, table_name: str) -> None:
        with self._write_txn() as con:
            row = con.execute(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ns, table_name),
            ).fetchone()
            if row is None:
                raise NoSuchTableError(f"{ns}.{table_name}")
            con.execute(
                "DELETE FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ns, table_name),
            )

    def list_tables(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = ".".join(_to_identifier(namespace))
        with self._conn() as con:
            rows = con.execute(
                "SELECT table_name FROM iceberg_tables WHERE catalog_name=? AND table_namespace=?",
                (self.name, ns),
            ).fetchall()
        return [tuple(ns.split(".")) + (r[0],) for r in rows]

    def rename_table(self, from_identifier: Union[str, Identifier], to_identifier: Union[str, Identifier]) -> Table:
        src, dst = _to_identifier(from_identifier), _to_identifier(to_identifier)
        with self._write_txn() as con:
            row = con.execute(
                "SELECT 1 FROM iceberg_tables WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.name, ".".join(src[:-1]), src[-1]),
            ).fetchone()
            if row is None:
                raise NoSuchTableError(".".join(src))
            con.execute(
                "UPDATE iceberg_tables SET table_namespace=?, table_name=? "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (".".join(dst[:-1]), dst[-1], self.name, ".".join(src[:-1]), src[-1]),
            )
        return self.load_table(dst)

    # -- views (reference catalog/__init__.py:712-760, REST-only there;
    # ours stores SQL text and resolves table names against this catalog.
    # Versions are append-only per replace — the reference's ViewVersion /
    # version-log model, view/__init__.py:27-160) --
    def create_view(self, identifier: Union[str, Identifier], sql: str, comment: Optional[str] = None) -> None:
        ident = _to_identifier(identifier)
        ns, name = ".".join(ident[:-1]), ident[-1]
        if not self.namespace_exists(ns):
            self.create_namespace(ns)
        upsert = self.engine.upsert_suffix(
            ("catalog_name", "view_namespace", "view_name"), ("sql", "comment")
        )
        with self._write_txn() as con:
            existed = (
                con.execute(
                    "SELECT 1 FROM iceberg_views WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                    (self.name, ns, name),
                ).fetchone()
                is not None
            )
            con.execute(
                f"INSERT INTO iceberg_views VALUES (?, ?, ?, ?, ?){upsert}",
                (self.name, ns, name, sql, comment),
            )
            self._append_view_version(con, ns, name, sql, comment, "replace" if existed else "create")

    def replace_view(self, identifier: Union[str, Identifier], sql: str, comment: Optional[str] = None) -> None:
        """Replace an EXISTING view's SQL, appending a new version."""
        ident = _to_identifier(identifier)
        ns, name = ".".join(ident[:-1]), ident[-1]
        with self._write_txn() as con:
            row = con.execute(
                "SELECT 1 FROM iceberg_views WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                (self.name, ns, name),
            ).fetchone()
            if row is None:
                raise NoSuchTableError(".".join(ident))
            con.execute(
                "UPDATE iceberg_views SET sql=?, comment=? "
                "WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                (sql, comment, self.name, ns, name),
            )
            self._append_view_version(con, ns, name, sql, comment, "replace")

    def _append_view_version(self, con, ns: str, name: str, sql: str, comment, operation: str) -> None:
        import time as _time

        row = con.execute(
            "SELECT COALESCE(MAX(version_id), 0) FROM iceberg_view_versions "
            "WHERE catalog_name=? AND view_namespace=? AND view_name=?",
            (self.name, ns, name),
        ).fetchone()
        con.execute(
            "INSERT INTO iceberg_view_versions VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
            (self.name, ns, name, row[0] + 1, sql, comment, operation, int(_time.time() * 1000)),
        )

    def view_history(self, identifier: Union[str, Identifier]) -> List[Dict[str, Any]]:
        """All versions of a view, oldest first: version_id / sql /
        comment / operation (create|replace) / timestamp_ms — the
        reference's versions + version-log surface (view/__init__.py:27)."""
        ident = _to_identifier(identifier)
        with self._conn() as con:
            rows = con.execute(
                "SELECT version_id, sql, comment, operation, timestamp_ms FROM iceberg_view_versions "
                "WHERE catalog_name=? AND view_namespace=? AND view_name=? ORDER BY version_id",
                (self.name, ".".join(ident[:-1]), ident[-1]),
            ).fetchall()
        if not rows:
            raise NoSuchTableError(".".join(ident))
        return [
            {"version_id": r[0], "sql": r[1], "comment": r[2], "operation": r[3], "timestamp_ms": r[4]}
            for r in rows
        ]

    def view_exists(self, identifier: Union[str, Identifier]) -> bool:
        ident = _to_identifier(identifier)
        with self._conn() as con:
            return (
                con.execute(
                    "SELECT 1 FROM iceberg_views WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                    (self.name, ".".join(ident[:-1]), ident[-1]),
                ).fetchone()
                is not None
            )

    def drop_view(self, identifier: Union[str, Identifier]) -> None:
        ident = _to_identifier(identifier)
        with self._write_txn() as con:
            row = con.execute(
                "SELECT 1 FROM iceberg_views WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                (self.name, ".".join(ident[:-1]), ident[-1]),
            ).fetchone()
            if row is None:
                raise NoSuchTableError(".".join(ident))
            con.execute(
                "DELETE FROM iceberg_views WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                (self.name, ".".join(ident[:-1]), ident[-1]),
            )
            con.execute(
                "DELETE FROM iceberg_view_versions WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                (self.name, ".".join(ident[:-1]), ident[-1]),
            )

    def view_sql(self, identifier: Union[str, Identifier], version_id: Optional[int] = None) -> str:
        ident = _to_identifier(identifier)
        with self._conn() as con:
            if version_id is not None:
                row = con.execute(
                    "SELECT sql FROM iceberg_view_versions "
                    "WHERE catalog_name=? AND view_namespace=? AND view_name=? AND version_id=?",
                    (self.name, ".".join(ident[:-1]), ident[-1], version_id),
                ).fetchone()
            else:
                row = con.execute(
                    "SELECT sql FROM iceberg_views WHERE catalog_name=? AND view_namespace=? AND view_name=?",
                    (self.name, ".".join(ident[:-1]), ident[-1]),
                ).fetchone()
        if row is None:
            raise NoSuchTableError(".".join(ident))
        return row[0]

    def read_view(self, identifier: Union[str, Identifier], version_id: Optional[int] = None) -> DataFrame:
        """Run the view SQL with every table of its namespace registered
        as a temp view (engine scans, so snapshots/deletes apply).
        ``version_id`` time-travels to an older view definition."""
        ident = _to_identifier(identifier)
        sql = self.view_sql(ident, version_id)
        ns = ident[:-1]
        for t_ident in self.list_tables(".".join(ns)):
            self.load_table(t_ident).scan().to_df().createOrReplaceTempView(t_ident[-1])
        return self.spark.sql(sql)

    def list_views(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = ".".join(_to_identifier(namespace))
        with self._conn() as con:
            rows = con.execute(
                "SELECT view_name FROM iceberg_views WHERE catalog_name=? AND view_namespace=?",
                (self.name, ns),
            ).fetchall()
        return [tuple(ns.split(".")) + (r[0],) for r in rows]

def load_catalog(name: Optional[str] = None, spark: Optional[SparkSession] = None, **properties: str) -> "SqlCatalog":
    """Catalog factory keyed on the ``type`` property (reference
    catalog/__init__.py load_catalog / infer_catalog_type): ``sql`` /
    ``sqlite`` (default), ``duckdb``, ``in-memory``, ``rest`` (needs
    ``uri``), ``glue``, ``dynamodb`` (boto3; honor ``glue.*`` /
    ``dynamodb.*`` client properties incl. ``endpoint``), ``hive``
    (thrift metastore, needs ``uri``), ``bigquery`` (REST API v2, needs
    ``gcp.project-id``; ``gcp.bigquery.endpoint`` points at emulators).
    ``warehouse`` names the data/metadata root.

    Config-file parity (reference utils/config.py): with no explicit
    kwargs a catalog can be fully described by ``.pyiceberg.yaml``
    (searched in $PYICEBERG_HOME, then home, then cwd) overlaid by
    ``PYICEBERG_CATALOG__<name>__<key>`` environment variables; explicit
    kwargs win over env, env wins over the file. ``name=None`` resolves
    the file's ``default-catalog``. ``spark`` falls back to the active
    SparkSession."""
    from .config import Config, merge_config

    conf = Config()
    if name is None:
        name = conf.get_default_catalog_name()
    file_env_conf = conf.get_catalog_config(name)
    if file_env_conf:
        # config keys are dash-normalized (env: DB_PATH -> db-path);
        # accept either spelling from any layer
        merged = merge_config(file_env_conf, dict(properties))
        properties = {k.replace("-", "_"): v for k, v in merged.items()}
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("load_catalog needs a SparkSession (none active)")
    ctype = properties.get("type")
    uri = properties.get("uri")
    if ctype is None:
        ctype = "rest" if uri and uri.startswith("http") else "sql"
    warehouse = properties.get("warehouse", f"/tmp/{name}_warehouse")
    if ctype in ("sql", "sqlite"):
        return SqliteCatalog(name, warehouse, spark, db_path=properties.get("db_path"))
    if ctype == "duckdb":
        return DuckDBCatalog(name, warehouse, spark, db_path=properties.get("db_path"))
    if ctype in ("in-memory", "memory"):
        return InMemoryCatalog(name, warehouse, spark)
    if ctype == "rest":
        from .catalog_rest import RestCatalog

        return RestCatalog(name, uri, spark, warehouse=properties.get("warehouse"), properties=properties)
    aws_props = {k: v for k, v in properties.items() if k not in ("type", "warehouse", "uri")}
    if ctype == "glue":
        from .catalog_aws import GlueCatalog

        return GlueCatalog(name, warehouse, spark, **aws_props)
    if ctype == "dynamodb":
        from .catalog_aws import DynamoDbCatalog

        return DynamoDbCatalog(name, warehouse, spark, **aws_props)
    if ctype == "hive":
        from .catalog_hive import HiveCatalog

        return HiveCatalog(name, warehouse, spark, properties=properties)
    if ctype in ("bigquery", "bigquery_metastore"):
        from .catalog_bq import BigQueryMetastoreCatalog

        return BigQueryMetastoreCatalog(name, warehouse, spark, properties=properties)
    raise ValueError(f"unknown catalog type {ctype!r}")


class _StagedCreateCatalog:
    """Catalog facade for a staged create: the one-and-only commit both
    registers the table (insert-if-absent) and publishes its metadata."""

    def __init__(self, real: MetastoreCatalog):
        self.real = real

    def _commit_table(self, table: Table, new_metadata: "TableMetadata") -> None:
        real = self.real
        ident = table.identifier
        ns, table_name = ".".join(ident[:-1]), ident[-1]
        if not real.namespace_exists(ns):
            real.create_namespace(ns)
        new_location = real._write_metadata(new_metadata, version=1)
        real._pointer_put_if_absent(ns, table_name, new_location)
        real._write_version_hint(new_location, new_metadata.location)
        table.metadata = new_metadata
        table.metadata_location = new_location
        table.catalog = real  # subsequent commits go through the real CAS

    def load_table(self, identifier):
        raise NoSuchTableError(
            "staged create: the table is not visible until commit_transaction()"
        )


class CreateTableTransaction(Transaction):
    """Transaction over a staged (not-yet-registered) table; the commit
    registers it atomically with every staged write applied (reference
    CreateTableTransaction, table/__init__.py)."""

    @property
    def staged_table(self) -> Table:
        return self.table

    def commit_transaction(self) -> Table:
        if self._dirty:
            super().commit_transaction()
        else:
            # writeless create: still register the (empty) table
            self.table.catalog._commit_table(self.table, self.metadata)
        return self.table


class SqliteCatalog(SqlCatalog):
    """SQL catalog on the stdlib SQLite driver (multi-process safe)."""

    def __init__(self, name: str, warehouse: str, spark: SparkSession, db_path: Optional[str] = None):
        from .io.fileio import is_remote, to_local

        if is_remote(warehouse.rstrip("/")) and db_path is None:
            raise ValueError(
                "remote warehouse needs a local db_path for the SQLite pointer store "
                "(table data/metadata go to the warehouse; the catalog db stays local)"
            )
        if db_path is None:
            os.makedirs(to_local(warehouse.rstrip("/")), exist_ok=True)
            db_path = os.path.join(to_local(warehouse.rstrip("/")), f"{name}.catalog.db")
        self.db_path = db_path
        super().__init__(name, warehouse, spark, SqliteEngine(db_path))


class DuckDBCatalog(SqlCatalog):
    """SQL catalog on DuckDB's DB-API driver — the proof that SqlCatalog's
    SQL is engine-agnostic (reference catalog/sql.py:115 achieves the same
    via SQLAlchemy). Single-process; writers serialize on an engine lock."""

    def __init__(self, name: str, warehouse: str, spark: SparkSession, db_path: Optional[str] = None):
        from .io.fileio import is_remote, to_local

        if db_path is None:
            if is_remote(warehouse.rstrip("/")):
                raise ValueError("remote warehouse needs a local db_path for the DuckDB pointer store")
            os.makedirs(to_local(warehouse.rstrip("/")), exist_ok=True)
            db_path = os.path.join(to_local(warehouse.rstrip("/")), f"{name}.catalog.duckdb")
        self.db_path = db_path
        super().__init__(name, warehouse, spark, DuckDBEngine(db_path))


class InMemoryCatalog(SqliteCatalog):
    """Ephemeral catalog for tests (reference catalog/memory.py:22)."""

    def __init__(self, name: str, warehouse: str, spark: SparkSession):
        engine = SqliteEngine.memory(name)
        self.db_path = engine.db_path
        SqlCatalog.__init__(self, name, warehouse, spark, engine)
