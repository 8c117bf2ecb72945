"""In-process mock of the BigQuery REST API v2 (datasets + tables
surfaces) for exercising `catalog_bq.BigQueryMetastoreCatalog` at the
wire level — same strategy as tests/rest_mock.py and tests/hms_mock.py.

Implements the semantics the catalog depends on: 409 on duplicate
insert, 404 on missing resources, per-table ``etag`` bumped on every
mutation, and ``If-Match`` enforcement on tables.patch (412 Precondition
Failed on stale etags) — the CAS the Iceberg commit protocol rides on.
"""

from __future__ import annotations

import json
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        # dataset_id -> resource dict
        self.datasets: Dict[str, Dict[str, Any]] = {}
        # (dataset_id, table_id) -> resource dict (with "etag")
        self.tables: Dict[Tuple[str, str], Dict[str, Any]] = {}
        # list-endpoint page size; small so tests exercise nextPageToken
        # on every multi-item listing (real BigQuery defaults to 50)
        self.page_size = 2


def _new_etag() -> str:
    return uuid.uuid4().hex[:16]


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    # -- plumbing -------------------------------------------------------------

    def _body(self) -> Dict[str, Any]:
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n) or b"{}")

    def _send(self, code: int, payload: Optional[Dict[str, Any]] = None) -> None:
        body = json.dumps(payload or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, message: str) -> None:
        self._send(code, {"error": {"code": code, "message": message}})

    # -- routing --------------------------------------------------------------

    _DATASETS = re.compile(r"^/bigquery/v2/projects/([^/]+)/datasets$")
    _DATASET = re.compile(r"^/bigquery/v2/projects/([^/]+)/datasets/([^/]+)$")
    _TABLES = re.compile(r"^/bigquery/v2/projects/([^/]+)/datasets/([^/]+)/tables$")
    _TABLE = re.compile(r"^/bigquery/v2/projects/([^/]+)/datasets/([^/]+)/tables/([^/]+)$")

    def _paginate(self, rows, key):
        """Apply real-BigQuery-style paging: at most ``state.page_size``
        rows per response, with a ``nextPageToken`` (integer offset)
        when more remain. Clients that ignore the token see silent
        truncation, exactly like production (default page size 50)."""
        from urllib.parse import parse_qs, urlsplit

        q = parse_qs(urlsplit(self.path).query)
        start = int(q.get("pageToken", ["0"])[0])
        size = self.server.state.page_size
        payload = {key: rows[start : start + size]}
        if start + size < len(rows):
            payload["nextPageToken"] = str(start + size)
        return self._send(200, payload)

    def _route(self, method: str) -> None:
        path = self.path.split("?", 1)[0]
        st: _State = self.server.state
        with st.lock:
            m = self._DATASETS.match(path)
            if m:
                if method == "POST":
                    body = self._body()
                    ds_id = body["datasetReference"]["datasetId"]
                    if ds_id in st.datasets:
                        return self._error(409, f"Already Exists: Dataset {ds_id}")
                    body.setdefault("etag", _new_etag())
                    st.datasets[ds_id] = body
                    return self._send(200, body)
                if method == "GET":
                    rows = sorted(
                        ({"datasetReference": d["datasetReference"]} for d in st.datasets.values()),
                        key=lambda r: r["datasetReference"]["datasetId"],
                    )
                    return self._paginate(rows, "datasets")
            m = self._DATASET.match(path)
            if m:
                ds_id = m.group(2)
                ds = st.datasets.get(ds_id)
                if method == "GET":
                    return self._send(200, ds) if ds else self._error(404, f"Not found: Dataset {ds_id}")
                if method == "DELETE":
                    if ds is None:
                        return self._error(404, f"Not found: Dataset {ds_id}")
                    if any(k[0] == ds_id for k in st.tables):
                        return self._error(400, "Dataset is still in use")
                    del st.datasets[ds_id]
                    return self._send(204)
                if method == "PATCH":
                    if ds is None:
                        return self._error(404, f"Not found: Dataset {ds_id}")
                    ds.update(self._body())
                    ds["etag"] = _new_etag()
                    return self._send(200, ds)
            m = self._TABLES.match(path)
            if m:
                ds_id = m.group(2)
                if ds_id not in st.datasets:
                    return self._error(404, f"Not found: Dataset {ds_id}")
                if method == "POST":
                    body = self._body()
                    t_id = body["tableReference"]["tableId"]
                    if (ds_id, t_id) in st.tables:
                        return self._error(409, f"Already Exists: Table {ds_id}.{t_id}")
                    body["etag"] = _new_etag()
                    st.tables[(ds_id, t_id)] = body
                    return self._send(200, body)
                if method == "GET":
                    rows = sorted(
                        (
                            {"tableReference": t["tableReference"]}
                            for (d, _), t in st.tables.items()
                            if d == ds_id
                        ),
                        key=lambda r: r["tableReference"]["tableId"],
                    )
                    return self._paginate(rows, "tables")
            m = self._TABLE.match(path)
            if m:
                ds_id, t_id = m.group(2), m.group(3)
                t = st.tables.get((ds_id, t_id))
                if method == "GET":
                    return self._send(200, t) if t else self._error(404, f"Not found: Table {ds_id}.{t_id}")
                if method == "DELETE":
                    if t is None:
                        return self._error(404, f"Not found: Table {ds_id}.{t_id}")
                    del st.tables[(ds_id, t_id)]
                    return self._send(204)
                if method in ("PATCH", "PUT"):
                    if t is None:
                        return self._error(404, f"Not found: Table {ds_id}.{t_id}")
                    if_match = self.headers.get("If-Match")
                    if if_match is not None and if_match != t["etag"]:
                        return self._error(412, "Precondition Failed: etag mismatch")
                    t.update(self._body())
                    t["etag"] = _new_etag()
                    return self._send(200, t)
        self._error(404, f"no route {method} {path}")

    def do_GET(self):
        self._route("GET")

    def do_POST(self):
        self._route("POST")

    def do_PATCH(self):
        self._route("PATCH")

    def do_PUT(self):
        self._route("PUT")

    def do_DELETE(self):
        self._route("DELETE")


class MockBigQueryServer(ThreadingHTTPServer):
    daemon_threads = True
    allow_reuse_address = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.state = _State()
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)

    @property
    def endpoint(self) -> str:
        return f"http://127.0.0.1:{self.server_address[1]}"

    def start(self) -> "MockBigQueryServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
