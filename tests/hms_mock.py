"""In-process mock Hive Metastore speaking real TBinaryProtocol.

Wire-level test double for `catalog_hive.HiveCatalog`, in the same role
the REST mock server (tests/rest_mock.py) plays for the REST catalog:
the client's bytes go over a real socket and are decoded with the same
declarative IDL subset, so field ids, struct nesting, and the
exception-in-result-struct convention are all exercised for real.

Implements an in-memory metastore: database/table CRUD plus the
EXCLUSIVE table-lock queue (lock / check_lock / unlock) the Iceberg
commit protocol needs — including the WAITING state so lock contention
paths are testable.
"""

from __future__ import annotations

import socket
import socketserver
import threading
from typing import Any, Dict, Optional, Tuple

from iceberg_python_spark import thrift_minimal as tm
from iceberg_python_spark.catalog_hive import HMS_METHODS, STATE_ACQUIRED, STATE_WAITING


class MockMetastore:
    """Shared state: {db_name: {"db": Database, "tables": {name: Table}}}."""

    def __init__(self):
        self.dbs: Dict[str, Dict[str, Any]] = {}
        self.locks: Dict[int, Tuple[str, str]] = {}  # lockid -> (db, table)
        self.lock_states: Dict[int, int] = {}
        self._next_lock = 1
        self.mutex = threading.Lock()
        self.calls: list = []  # (method, args) audit trail for tests

    # each handler returns {result_field_name: value}; exceptions are
    # returned as {"oN": {"message": ...}} per the IDL result structs
    def handle(self, method: str, args: Dict[str, Any]) -> Dict[str, Any]:
        self.calls.append((method, args))
        return getattr(self, method)(args)

    def get_table(self, a):
        with self.mutex:
            tbl = self.dbs.get(a.get("dbname"), {}).get("tables", {}).get(a.get("tbl_name"))
            if tbl is None:
                return {"o2": {"message": f"table {a.get('dbname')}.{a.get('tbl_name')} not found"}}
            return {"success": tbl}

    def create_table(self, a):
        t = a["tbl"]
        with self.mutex:
            db = self.dbs.get(t["dbName"])
            if db is None:
                return {"o4": {"message": f"database {t['dbName']} not found"}}
            if t["tableName"] in db["tables"]:
                return {"o1": {"message": f"table {t['tableName']} already exists"}}
            db["tables"][t["tableName"]] = t
            return {}

    def alter_table_with_environment_context(self, a):
        with self.mutex:
            db = self.dbs.get(a["dbname"])
            if db is None or a["tbl_name"] not in db["tables"]:
                return {"o1": {"message": "no such table"}}
            new = a["new_tbl"]
            del db["tables"][a["tbl_name"]]
            # rename support: store under the (possibly new) identity
            self.dbs[new["dbName"]]["tables"][new["tableName"]] = new
            return {}

    def drop_table(self, a):
        with self.mutex:
            db = self.dbs.get(a["dbname"])
            if db is None or a["name"] not in db["tables"]:
                return {"o1": {"message": "no such table"}}
            del db["tables"][a["name"]]
            return {}

    def get_all_databases(self, a):
        with self.mutex:
            return {"success": sorted(self.dbs)}

    def get_database(self, a):
        with self.mutex:
            db = self.dbs.get(a["name"])
            if db is None:
                return {"o1": {"message": f"database {a['name']} not found"}}
            return {"success": db["db"]}

    def create_database(self, a):
        d = a["database"]
        with self.mutex:
            if d["name"] in self.dbs:
                return {"o1": {"message": f"database {d['name']} already exists"}}
            self.dbs[d["name"]] = {"db": d, "tables": {}}
            return {}

    def alter_database(self, a):
        with self.mutex:
            if a["dbname"] not in self.dbs:
                return {"o2": {"message": "no such database"}}
            self.dbs[a["dbname"]]["db"] = a["db"]
            return {}

    def drop_database(self, a):
        with self.mutex:
            db = self.dbs.get(a["name"])
            if db is None:
                return {"o1": {"message": "no such database"}}
            if db["tables"]:
                return {"o2": {"message": "database is not empty"}}
            del self.dbs[a["name"]]
            return {}

    def get_all_tables(self, a):
        with self.mutex:
            db = self.dbs.get(a["db_name"], {"tables": {}})
            return {"success": sorted(db["tables"])}

    def _held(self, db: str, tbl: str, excluding: Optional[int] = None) -> bool:
        return any(
            lid != excluding and target == (db, tbl) and self.lock_states.get(lid) == STATE_ACQUIRED
            for lid, target in self.locks.items()
        )

    def lock(self, a):
        comp = a["rqst"]["component"][0]
        target = (comp["dbname"], comp.get("tablename", ""))
        with self.mutex:
            lid = self._next_lock
            self._next_lock += 1
            self.locks[lid] = target
            state = STATE_WAITING if self._held(*target) else STATE_ACQUIRED
            self.lock_states[lid] = state
            return {"success": {"lockid": lid, "state": state}}

    def check_lock(self, a):
        lid = a["rqst"]["lockid"]
        with self.mutex:
            if lid not in self.locks:
                return {"o3": {"message": f"no such lock {lid}"}}
            if self.lock_states[lid] == STATE_WAITING and not self._held(*self.locks[lid], excluding=lid):
                self.lock_states[lid] = STATE_ACQUIRED
            return {"success": {"lockid": lid, "state": self.lock_states[lid]}}

    def unlock(self, a):
        lid = a["rqst"]["lockid"]
        with self.mutex:
            if lid not in self.locks:
                return {"o1": {"message": f"no such lock {lid}"}}
            del self.locks[lid]
            del self.lock_states[lid]
            return {}


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        buf = b""
        while True:
            msg, buf = self._read_message(buf)
            if msg is None:
                return
            name, mtype, seqid, reader = msg
            spec = HMS_METHODS.get(name)
            if spec is None:
                payload = tm.encode_message(
                    name, tm.EXCEPTION, seqid,
                    {1: ("message", tm.STRING, None), 2: ("type", tm.I32, None)},
                    {"message": f"unknown method {name}", "type": 1},
                )
            else:
                args_schema, result_schema, _exc = spec
                args = tm.read_struct(reader, args_schema)
                result = self.server.store.handle(name, args)
                payload = tm.encode_message(name, tm.REPLY, seqid, result_schema, result)
            self.request.sendall(payload)

    def _read_message(self, buf: bytes):
        # unframed transport: accumulate until a full message parses
        while True:
            if buf:
                try:
                    probe = tm._Reader(buf)
                    tm.decode_message_header(probe)
                    tm._consume_struct(probe)
                    reader = tm._Reader(buf[: probe.pos])
                    name, mtype, seqid = tm.decode_message_header(reader)
                    return (name, mtype, seqid, reader), buf[probe.pos :]
                except tm.TApplicationException:
                    pass
            try:
                chunk = self.request.recv(65536)
            except (ConnectionResetError, OSError):
                return None, b""
            if not chunk:
                return None, b""
            buf += chunk


class MockHmsServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.store = MockMetastore()
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start(self) -> "MockHmsServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
