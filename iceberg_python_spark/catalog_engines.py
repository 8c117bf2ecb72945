"""DB-API engine abstraction for the SQL catalog.

Reference: pyiceberg/catalog/sql.py:115 — the reference's SqlCatalog is
SQLAlchemy-generic (SQLite / Postgres / MySQL via engine URI). SQLAlchemy is
not installable in this sandbox, so genericity is proven at the DB-API level
instead: the catalog speaks a small `SqlEngine` contract (connect, write-txn
begin/commit/rollback, upsert SQL) and ships two real engines — SQLite
(multi-process, BEGIN IMMEDIATE locking) and DuckDB (in-process, lock-
serialized writers). The SQL itself is ANSI + `ON CONFLICT` (supported by
SQLite >= 3.24, DuckDB, and Postgres), qmark paramstyle; a Postgres engine
would only need a connect + paramstyle shim.

Engine contract notes:
- Affected-row counts are NEVER taken from cursor.rowcount (DuckDB's DB-API
  reports -1); generic code does SELECT-then-act inside a write transaction,
  which each engine makes race-free (SQLite: BEGIN IMMEDIATE takes the write
  lock up front; DuckDB: a process-wide lock serializes write txns — DuckDB
  is single-process anyway).
- UPDATE statements never delete+reinsert the same primary key in one txn
  (DuckDB ART-index limitation); plain UPDATEs, including PK-column renames
  to a *different* key, are safe on both engines.
"""

from __future__ import annotations

import sqlite3
import threading
import uuid
from typing import Any, Iterator, Optional, Sequence


class SqlEngine:
    """Minimal DB-API dialect contract the SQL catalog codes against."""

    #: SQL fragment appended to INSERT for ignore-on-duplicate semantics
    def insert_ignore_suffix(self, conflict_cols: Sequence[str]) -> str:
        return f" ON CONFLICT ({', '.join(conflict_cols)}) DO NOTHING"

    def upsert_suffix(self, conflict_cols: Sequence[str], update_cols: Sequence[str]) -> str:
        sets = ", ".join(f"{c}=excluded.{c}" for c in update_cols)
        return f" ON CONFLICT ({', '.join(conflict_cols)}) DO UPDATE SET {sets}"

    def connect(self) -> Any:
        raise NotImplementedError

    def close(self, con: Any) -> None:
        con.close()

    def begin_write(self, con: Any) -> None:
        """Enter a transaction that serializes against other writers."""
        raise NotImplementedError

    def commit(self, con: Any) -> None:
        con.execute("COMMIT")

    def rollback(self, con: Any) -> None:
        con.execute("ROLLBACK")

    def end_write(self, con: Any) -> None:
        """Called after commit/rollback (lock release for lock-based engines)."""

    def dispose(self) -> None:
        """Release engine-held resources (root connections). Per-op
        connection engines are a no-op."""

    def init_schema(self, ddl_statements: Sequence[str]) -> None:
        con = self.connect()
        try:
            for ddl in ddl_statements:
                con.execute(ddl)
            try:
                con.commit()
            except Exception:
                pass  # engines that autocommit DDL
        finally:
            self.close(con)


class SqliteEngine(SqlEngine):
    """SQLite via the stdlib driver. Multi-process safe: write transactions
    open with BEGIN IMMEDIATE, taking the database write lock up front so
    SELECT-then-UPDATE sequences inside the txn are race-free."""

    def __init__(self, db_path: str, uri: bool = False):
        self.db_path = db_path
        self.uri = uri
        # shared-cache :memory: URIs vanish when the last connection closes
        self._keepalive: Optional[sqlite3.Connection] = (
            sqlite3.connect(db_path, uri=True) if uri else None
        )

    def connect(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.db_path, uri=self.uri, timeout=30)
        con.isolation_level = None  # manual transactions
        return con

    def begin_write(self, con: sqlite3.Connection) -> None:
        con.execute("BEGIN IMMEDIATE")

    @staticmethod
    def memory(name: str) -> "SqliteEngine":
        return SqliteEngine(f"file:{name}_{uuid.uuid4().hex}?mode=memory&cache=shared", uri=True)


class _DuckCursor:
    """Adapter giving a duckdb cursor the sqlite3 fetch API shape we use."""

    def __init__(self, cur: Any):
        self._cur = cur

    def execute(self, sql: str, params: Sequence[Any] = ()) -> "_DuckCursor":
        self._cur.execute(sql, list(params))
        return self

    def fetchone(self):
        return self._cur.fetchone()

    def fetchall(self):
        return self._cur.fetchall()

    def close(self) -> None:
        self._cur.close()


class DuckDBEngine(SqlEngine):
    """DuckDB via its DB-API driver. One root connection per engine;
    logical connections are `con.cursor()` sessions (independent
    transactions). DuckDB is a single-process store, so a process-wide lock
    serializing write transactions gives the same CAS guarantee BEGIN
    IMMEDIATE gives on SQLite."""

    def __init__(self, db_path: str = ":memory:"):
        import duckdb

        self.db_path = db_path
        self._root = duckdb.connect(db_path)
        self._write_lock = threading.Lock()
        # owner-aware release: Lock.locked() is not thread-attributed, so
        # a stray/double end_write from another thread must NOT release a
        # lock it never acquired (that would silently break write-txn
        # serialization)
        self._write_owner = threading.local()

    def connect(self) -> _DuckCursor:
        return _DuckCursor(self._root.cursor())

    def begin_write(self, con: _DuckCursor) -> None:
        self._write_lock.acquire()
        self._write_owner.held = True
        try:
            con.execute("BEGIN TRANSACTION")
        except BaseException:
            self._write_owner.held = False
            self._write_lock.release()
            raise

    def end_write(self, con: _DuckCursor) -> None:
        if getattr(self._write_owner, "held", False):
            self._write_owner.held = False
            self._write_lock.release()

    def dispose(self) -> None:
        self._root.close()
