"""In-process mock of an Iceberg REST catalog server (spec
rest-catalog-open-api.yaml) for exercising the RestCatalog client: it
validates commit requirements (assert-table-uuid /
assert-ref-snapshot-id -> 409) and applies semantic TableUpdate objects
to stored metadata, like a real server (Polaris/Nessie/Tabular) would."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Tuple
from urllib.parse import unquote, urlparse

NS_SEP = "\x1f"


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.namespaces: Dict[str, Dict[str, str]] = {}
        self.tables: Dict[Tuple[str, str], Dict[str, Any]] = {}  # -> {"location": str, "metadata": dict}
        self.versions: Dict[Tuple[str, str], int] = {}
        self.views: Dict[Tuple[str, str], Dict[str, Any]] = {}  # -> spec view metadata


def _apply_updates(meta: Dict[str, Any], updates) -> Dict[str, Any]:
    for u in updates:
        a = u["action"]
        if a == "add-schema":
            meta["schemas"] = [s for s in meta.get("schemas", []) if s.get("schema-id") != u["schema"].get("schema-id")] + [u["schema"]]
            meta["last-column-id"] = max(meta.get("last-column-id", 0), u.get("last-column-id", 0))
        elif a == "set-current-schema":
            meta["current-schema-id"] = u["schema-id"]
        elif a == "add-spec":
            meta["partition-specs"] = [s for s in meta.get("partition-specs", []) if s.get("spec-id") != u["spec"].get("spec-id")] + [u["spec"]]
        elif a == "set-default-spec":
            meta["default-spec-id"] = u["spec-id"]
        elif a == "add-sort-order":
            meta["sort-orders"] = [s for s in meta.get("sort-orders", []) if s.get("order-id") != u["sort-order"].get("order-id")] + [u["sort-order"]]
        elif a == "set-default-sort-order":
            meta["default-sort-order-id"] = u["sort-order-id"]
        elif a == "add-snapshot":
            meta.setdefault("snapshots", []).append(u["snapshot"])
            meta["last-sequence-number"] = max(
                meta.get("last-sequence-number", 0), u["snapshot"].get("sequence-number", 0)
            )
        elif a == "remove-snapshots":
            ids = set(u["snapshot-ids"])
            meta["snapshots"] = [s for s in meta.get("snapshots", []) if s["snapshot-id"] not in ids]
            meta["snapshot-log"] = [e for e in meta.get("snapshot-log", []) if e["snapshot-id"] not in ids]
        elif a == "set-snapshot-ref":
            meta.setdefault("refs", {})[u["ref-name"]] = {
                "snapshot-id": u["snapshot-id"],
                "type": u.get("type", "branch"),
            }
            if u["ref-name"] == "main":
                meta["current-snapshot-id"] = u["snapshot-id"]
                meta.setdefault("snapshot-log", []).append(
                    {"snapshot-id": u["snapshot-id"], "timestamp-ms": int(time.time() * 1000)}
                )
        elif a == "remove-snapshot-ref":
            meta.get("refs", {}).pop(u["ref-name"], None)
        elif a == "set-properties":
            meta.setdefault("properties", {}).update(u["updates"])
        elif a == "remove-properties":
            for k in u["removals"]:
                meta.get("properties", {}).pop(k, None)
        elif a == "set-location":
            meta["location"] = u["location"]
        elif a == "set-statistics":
            meta["statistics"] = [
                s for s in meta.get("statistics", []) if s.get("snapshot-id") != u["snapshot-id"]
            ] + [u["statistics"]]
        elif a == "remove-statistics":
            meta["statistics"] = [
                s for s in meta.get("statistics", []) if s.get("snapshot-id") != u["snapshot-id"]
            ]
        else:
            raise ValueError(f"mock server: unsupported update {a}")
    meta["last-updated-ms"] = int(time.time() * 1000)
    return meta


def _check_requirements(meta: Dict[str, Any], reqs) -> bool:
    for r in reqs:
        if r["type"] == "assert-table-uuid":
            if meta.get("table-uuid") != r["uuid"]:
                return False
        elif r["type"] == "assert-ref-snapshot-id":
            cur = (meta.get("refs") or {}).get(r["ref"])
            cur_id = cur["snapshot-id"] if cur else None
            if cur_id != r.get("snapshot-id"):
                return False
    return True


def _plan_file_scan_tasks(meta_dict: Dict[str, Any], body: Dict[str, Any]):
    """Server-side planning: the mock plans with its own engine instance
    (a real REST server does the same with its Iceberg library) and
    serializes the tasks to REST FileScanTask JSON."""
    from iceberg_python_spark.expressions import AlwaysTrue
    from iceberg_python_spark.expressions.rest import expression_from_rest
    from iceberg_python_spark.table import DataScan, Table
    from iceberg_python_spark.table.metadata import TableMetadata

    md = TableMetadata.from_dict(json.loads(json.dumps(meta_dict)))
    md.properties = dict(md.properties)
    md.properties.pop("scan-planning-mode", None)  # the server itself plans client-side
    tbl = Table(("mock", "t"), md, "", None, None)
    filt = expression_from_rest(body["filter"]) if body.get("filter") else AlwaysTrue()
    scan = DataScan(
        tbl,
        filt,
        tuple(body.get("select") or ("*",)),
        body.get("case-sensitive", True),
        body.get("snapshot-id"),
        None,
        None,
    )
    out = []
    for t in scan.plan_files():
        f = t.data_file
        deletes = [
            {
                "content": "position-deletes",
                "file-path": p,
                "file-format": "PUFFIN" if p.endswith(".puffin") else "PARQUET",
                "spec-id": f.get("spec_id", 0),
                "file-size-in-bytes": 0,
                "record-count": 0,
            }
            for p in t.delete_files
        ] + [
            {
                "content": "equality-deletes",
                "file-path": p,
                "file-format": "PARQUET",
                "spec-id": f.get("spec_id", 0),
                "file-size-in-bytes": 0,
                "record-count": 0,
                "equality-ids": list(fids),
            }
            for p, fids in t.eq_delete_files
        ]
        out.append(
            {
                "data-file": {
                    "content": "data",
                    "file-path": f["file_path"],
                    "file-format": f.get("file_format", "PARQUET"),
                    "spec-id": f.get("spec_id", 0),
                    "record-count": f.get("record_count", 0),
                    "file-size-in-bytes": f.get("file_size_in_bytes", 0),
                },
                "deletes": deletes,
            }
        )
    return out


def _chunk_to_rest(chunk) -> Dict[str, Any]:
    """One ScanTasks payload: per-response delete-files with local
    delete-file-references indices, as the spec requires."""
    delete_files: list = []
    index: Dict[str, int] = {}
    tasks = []
    for t in chunk:
        refs = []
        for d in t["deletes"]:
            key = d["file-path"] + "|" + d["content"]
            if key not in index:
                index[key] = len(delete_files)
                delete_files.append(d)
            refs.append(index[key])
        task = {"data-file": t["data-file"]}
        if refs:
            task["delete-file-references"] = refs
        tasks.append(task)
    out: Dict[str, Any] = {"file-scan-tasks": tasks}
    if delete_files:
        out["delete-files"] = delete_files
    return out


def make_server(warehouse: str, require_auth: bool = False, clients: Dict[str, str] = None):
    """``require_auth=True`` turns on the spec's OAuth2 client-credentials
    flow: POST /v1/oauth/tokens exchanges a known (client_id, secret)
    for a bearer token, and every other endpoint 401s without a valid
    one. ``state.valid_tokens.clear()`` simulates server-side token
    expiry (the client must transparently re-authenticate)."""
    state = _State()
    state.plan_mode = "sync"  # or "async": plan -> submitted -> poll
    state.page_size = None  # tasks per chunk; None = single response
    state.plans: Dict[str, Any] = {}
    state.task_chunks: Dict[str, Any] = {}
    state.require_auth = require_auth
    state.clients = dict(clients or {})
    state.valid_tokens = set()
    state.token_seq = [0]
    # optional vended storage credentials: list of {prefix, config}
    # attached to every LoadTableResponse + served by the /credentials
    # endpoint when the client sent X-Iceberg-Access-Delegation
    state.storage_credentials = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: Any = None):
            data = json.dumps(body).encode() if body is not None else b""
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> Dict[str, Any]:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n)) if n else {}

        def _parts(self):
            return [unquote(p) for p in urlparse(self.path).path.strip("/").split("/")]

        def _authorized(self) -> bool:
            if not state.require_auth:
                return True
            header = self.headers.get("Authorization") or ""
            return header.startswith("Bearer ") and header[7:] in state.valid_tokens

        def do_GET(self):
            if not self._authorized():
                return self._send(401, {"error": "invalid or expired token"})
            p = self._parts()
            if p[:2] == ["v1", "config"]:
                return self._send(200, {"defaults": {"warehouse": warehouse}, "overrides": {}})
            if p[:2] == ["v1", "namespaces"]:
                if len(p) == 2:
                    return self._send(200, {"namespaces": [ns.split(NS_SEP) for ns in state.namespaces]})
                ns = p[2]
                if len(p) == 3:
                    if ns not in state.namespaces:
                        return self._send(404, {"error": "no such namespace"})
                    return self._send(200, {"namespace": ns.split(NS_SEP), "properties": state.namespaces[ns]})
                if len(p) == 4 and p[3] == "tables":
                    idents = [
                        {"namespace": k[0].split(NS_SEP), "name": k[1]} for k in state.tables if k[0] == ns
                    ]
                    return self._send(200, {"identifiers": idents})
                if len(p) == 4 and p[3] == "views":
                    idents = [
                        {"namespace": k[0].split(NS_SEP), "name": k[1]} for k in state.views if k[0] == ns
                    ]
                    return self._send(200, {"identifiers": idents})
                if len(p) == 5 and p[3] == "views":
                    v = state.views.get((ns, p[4]))
                    if v is None:
                        return self._send(404, {"error": "no such view"})
                    return self._send(200, {"metadata-location": f"mock://{ns}/{p[4]}/view", "metadata": v})
                if len(p) == 5 and p[3] == "tables":
                    t = state.tables.get((ns, p[4]))
                    if t is None:
                        return self._send(404, {"error": "no such table"})
                    body = {"metadata-location": t["location"], "metadata": t["metadata"], "config": {}}
                    if state.storage_credentials and self.headers.get("X-Iceberg-Access-Delegation"):
                        body["storage-credentials"] = state.storage_credentials
                    return self._send(200, body)
                if len(p) == 6 and p[3] == "tables" and p[5] == "credentials":
                    if (ns, p[4]) not in state.tables:
                        return self._send(404, {"error": "no such table"})
                    return self._send(200, {"storage-credentials": state.storage_credentials})
                if len(p) == 7 and p[3] == "tables" and p[5] == "plan":  # fetchPlanningResult
                    resp = state.plans.get(p[6])
                    if resp is None:
                        return self._send(404, {"error": "no such plan"})
                    return self._send(200, resp)
            return self._send(404, {"error": "not found"})

        def do_POST(self):
            p = self._parts()
            if p[:3] == ["v1", "oauth", "tokens"]:
                n = int(self.headers.get("Content-Length") or 0)
                from urllib.parse import parse_qs

                form = parse_qs(self.rfile.read(n).decode())
                cid = (form.get("client_id") or [None])[0]
                secret = (form.get("client_secret") or [""])[0]
                if state.clients.get(cid) != secret:
                    return self._send(401, {"error": "invalid_client"})
                with state.lock:
                    state.token_seq[0] += 1
                    tok = f"mock-token-{state.token_seq[0]}"
                    state.valid_tokens.add(tok)
                return self._send(200, {"access_token": tok, "token_type": "bearer", "expires_in": 3600})
            if not self._authorized():
                return self._send(401, {"error": "invalid or expired token"})
            body = self._body()
            with state.lock:
                if p[:2] == ["v1", "namespaces"] and len(p) == 2:
                    ns = NS_SEP.join(body["namespace"])
                    state.namespaces.setdefault(ns, body.get("properties") or {})
                    return self._send(200, {"namespace": body["namespace"], "properties": {}})
                if p[:2] == ["v1", "tables"] and len(p) == 3 and p[2] == "rename":
                    src = (NS_SEP.join(body["source"]["namespace"]), body["source"]["name"])
                    dst = (NS_SEP.join(body["destination"]["namespace"]), body["destination"]["name"])
                    if src not in state.tables:
                        return self._send(404, {"error": "no such table"})
                    state.tables[dst] = state.tables.pop(src)
                    return self._send(200, {})
                if len(p) == 4 and p[3] == "tables":  # create
                    ns, name = p[2], body["name"]
                    if ns not in state.namespaces:
                        return self._send(404, {"error": "no such namespace"})
                    if (ns, name) in state.tables:
                        return self._send(409, {"error": "table exists"})
                    from iceberg_python_spark.partitioning import PartitionSpec
                    from iceberg_python_spark.schema import Schema
                    from iceberg_python_spark.table.metadata import SortOrder, new_table_metadata

                    schema = Schema.from_dict(body["schema"])
                    spec = PartitionSpec.from_dict(body.get("partition-spec") or {"spec-id": 0, "fields": []})
                    order = SortOrder.from_dict(body.get("write-order") or {"order-id": 0, "fields": []})
                    location = body.get("location") or f"{warehouse}/{ns.replace(NS_SEP, '/')}/{name}"
                    meta = new_table_metadata(schema, spec, location, body.get("properties") or {}, order).to_dict()
                    state.tables[(ns, name)] = {"location": f"mock://{ns}/{name}/v1", "metadata": meta}
                    state.versions[(ns, name)] = 1
                    return self._send(
                        200, {"metadata-location": f"mock://{ns}/{name}/v1", "metadata": meta}
                    )
                if len(p) == 4 and p[3] == "views":  # create view
                    ns, name = p[2], body["name"]
                    if ns not in state.namespaces:
                        return self._send(404, {"error": "no such namespace"})
                    if (ns, name) in state.views:
                        return self._send(409, {"error": "view exists"})
                    import uuid as _uuid

                    version = body["view-version"]
                    meta = {
                        "view-uuid": str(_uuid.uuid4()),
                        "format-version": 1,
                        "location": body.get("location", ""),
                        "current-version-id": version["version-id"],
                        "versions": [version],
                        "version-log": [
                            {"version-id": version["version-id"], "timestamp-ms": version["timestamp-ms"]}
                        ],
                        "schemas": [body.get("schema", {})],
                        "properties": body.get("properties") or {},
                    }
                    state.views[(ns, name)] = meta
                    return self._send(200, {"metadata-location": f"mock://{ns}/{name}/view", "metadata": meta})
                if len(p) == 6 and p[3] == "tables" and p[5] == "plan":  # planTableScan
                    t = state.tables.get((p[2], p[4]))
                    if t is None:
                        return self._send(404, {"error": "no such table"})
                    tasks = _plan_file_scan_tasks(t["metadata"], body)
                    page = state.page_size or max(len(tasks), 1)
                    chunks = [tasks[i : i + page] for i in range(0, len(tasks), page)] or [[]]
                    first = _chunk_to_rest(chunks[0])
                    tokens = []
                    for i, c in enumerate(chunks[1:]):
                        tok = f"pt-{len(state.task_chunks)}-{i}"
                        state.task_chunks[tok] = _chunk_to_rest(c)
                        tokens.append(tok)
                    if tokens:
                        first["plan-tasks"] = tokens
                    completed = {"status": "completed", **first}
                    if state.plan_mode == "async":
                        pid = f"plan-{len(state.plans)}"
                        state.plans[pid] = completed
                        return self._send(200, {"status": "submitted", "plan-id": pid})
                    return self._send(200, completed)
                if len(p) == 6 and p[3] == "tables" and p[5] == "tasks":  # fetchScanTasks
                    chunk = state.task_chunks.get(body.get("plan-task", ""))
                    if chunk is None:
                        return self._send(404, {"error": "no such plan task"})
                    return self._send(200, chunk)
                if len(p) == 5 and p[3] == "tables":  # commit
                    key = (p[2], p[4])
                    t = state.tables.get(key)
                    if t is None:
                        return self._send(404, {"error": "no such table"})
                    if not _check_requirements(t["metadata"], body.get("requirements", [])):
                        return self._send(409, {"error": "requirement failed"})
                    meta = _apply_updates(json.loads(json.dumps(t["metadata"])), body.get("updates", []))
                    v = state.versions[key] = state.versions.get(key, 1) + 1
                    loc = f"mock://{key[0]}/{key[1]}/v{v}"
                    state.tables[key] = {"location": loc, "metadata": meta}
                    return self._send(200, {"metadata-location": loc, "metadata": meta})
            return self._send(404, {"error": "not found"})

        def do_DELETE(self):
            if not self._authorized():
                return self._send(401, {"error": "invalid or expired token"})
            p = self._parts()
            with state.lock:
                if p[:2] == ["v1", "namespaces"] and len(p) == 3:
                    state.namespaces.pop(p[2], None)
                    return self._send(204)
                if len(p) == 5 and p[3] == "tables":
                    if state.tables.pop((p[2], p[4]), None) is None:
                        return self._send(404, {"error": "no such table"})
                    return self._send(204)
                if len(p) == 5 and p[3] == "views":
                    if state.views.pop((p[2], p[4]), None) is None:
                        return self._send(404, {"error": "no such view"})
                    return self._send(204)
            return self._send(404, {"error": "not found"})

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    server.mock_state = state  # test knobs: plan_mode, page_size
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"
