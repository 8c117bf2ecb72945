"""REST catalog client — the Iceberg REST Catalog Open API surface
(reference pyiceberg/catalog/rest/__init__.py:405; spec
rest-catalog-open-api.yaml).

Wire shape:
- ``GET  {uri}/v1/config``                       — server defaults/overrides
- ``GET/POST /v1/{prefix}/namespaces``            — namespace CRUD
- ``GET/POST /v1/{prefix}/namespaces/{ns}/tables``— list/create
- ``GET/DELETE .../tables/{name}``                — load/drop
- ``POST /v1/{prefix}/tables/rename``             — rename
- ``POST .../tables/{name}``                      — CommitTableRequest:
  requirement objects (assert-table-uuid, assert-ref-snapshot-id) +
  update objects (add-snapshot, set-snapshot-ref, add-schema, …);
  409 -> CommitFailedException, which the Transaction retry/rebase
  layer (table/__init__.py commit_transaction) already handles.

The commit body is computed as a DIFF between the transaction's base
metadata and its result, so the server applies semantic updates rather
than a blind metadata swap — the same optimistic protocol real servers
(Polaris, Nessie, Tabular, Gravitino) speak. Multi-part namespaces are
encoded with the spec's 0x1F unit separator.
"""

from __future__ import annotations

import posixpath
from typing import Any, Dict, List, Optional, Tuple, Union

import requests

from .partitioning import UNPARTITIONED, PartitionSpec
from .schema import Schema, schema_from_spark
from .table import CommitFailedException, Table
from .table.metadata import SortOrder, TableMetadata, new_table_metadata

Identifier = Tuple[str, ...]

NS_SEP = "\x1f"


class NoSuchTableError(Exception):
    pass


class NoSuchNamespaceError(Exception):
    pass


class TableAlreadyExistsError(Exception):
    pass


def _to_identifier(identifier: Union[str, Identifier]) -> Identifier:
    if isinstance(identifier, str):
        return tuple(identifier.split("."))
    return tuple(identifier)


class RestCatalog:
    def __init__(
        self,
        name: str,
        uri: str,
        spark,
        warehouse: Optional[str] = None,
        token: Optional[str] = None,
        credential: Optional[str] = None,
        properties: Optional[Dict[str, str]] = None,
    ):
        self.name = name
        self.uri = uri.rstrip("/")
        self.spark = spark
        self.warehouse = warehouse
        self._session = requests.Session()
        props = properties or {}
        # OAuth2 client-credentials (reference catalog/rest/auth.py:70
        # LegacyOAuth2AuthManager): `credential` = "client_id:secret" (or
        # bare secret) is exchanged for a Bearer token at
        # `oauth2-server-uri` (default <uri>/v1/oauth/tokens); a 401 on
        # any later call refreshes the token once and retries (expired
        # server-side tokens re-authenticate transparently).
        self._credential = credential if credential is not None else props.get("credential")
        self._oauth_uri = props.get("oauth2-server-uri") or f"{self.uri}/v1/oauth/tokens"
        self._scope = props.get("scope", "catalog")
        token = token if token is not None else props.get("token")
        if token:
            self._session.headers["Authorization"] = f"Bearer {token}"
        elif self._credential:
            self._refresh_token()
        self._session.headers["Content-Type"] = "application/json"
        # opt in to vended credentials (reference catalog/rest/__init__.py:881)
        self._session.headers.setdefault(
            "X-Iceberg-Access-Delegation", props.get("access-delegation", "vended-credentials")
        )
        cfg = self._get("/v1/config", params={"warehouse": warehouse} if warehouse else None)
        merged: Dict[str, str] = dict(cfg.get("defaults") or {})
        merged.update(properties or {})
        merged.update(cfg.get("overrides") or {})
        self.properties = merged
        self.prefix = merged.get("prefix", "")
        if self.warehouse is None:
            self.warehouse = merged.get("warehouse")

    # -- http plumbing -------------------------------------------------------
    def _url(self, path: str) -> str:
        base = f"{self.uri}/v1"
        if self.prefix:
            base = f"{base}/{self.prefix}"
        return base + path

    def _check(self, r: requests.Response) -> Dict[str, Any]:
        if r.status_code == 404:
            raise NoSuchTableError(r.text) if "/tables" in r.url else NoSuchNamespaceError(r.text)
        if r.status_code == 409:
            raise (
                TableAlreadyExistsError(r.text)
                if r.request.method == "POST" and r.url.endswith("/tables")
                else CommitFailedException(r.text)
            )
        r.raise_for_status()
        return r.json() if r.content else {}

    def _refresh_token(self) -> None:
        """client_credentials grant at the token endpoint (spec
        OAuthTokenRequest, form-encoded; reference auth.py:98)."""
        client_id, sep, secret = self._credential.partition(":")
        if not sep:
            client_id, secret = None, self._credential
        r = requests.post(
            self._oauth_uri,
            data={
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": secret,
                "scope": self._scope,
            },
        )
        if r.status_code in (400, 401):
            raise PermissionError(f"OAuth token request rejected: {r.text}")
        r.raise_for_status()
        self._session.headers["Authorization"] = f"Bearer {r.json()['access_token']}"

    def _request(self, method: str, url: str, **kw) -> requests.Response:
        r = self._session.request(method, url, **kw)
        if r.status_code == 401 and self._credential:
            self._refresh_token()
            r = self._session.request(method, url, **kw)
        return r

    def _get(self, path: str, params=None) -> Dict[str, Any]:
        url = f"{self.uri}{path}" if path.startswith("/v1/config") else self._url(path)
        return self._check(self._request("GET", url, params=params))

    def _post(self, path: str, body: Dict[str, Any]) -> Dict[str, Any]:
        return self._check(self._request("POST", self._url(path), json=body))

    def _delete(self, path: str, params=None) -> None:
        self._check(self._request("DELETE", self._url(path), params=params))

    # -- namespaces ----------------------------------------------------------
    def create_namespace(self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None) -> None:
        ns = list(_to_identifier(namespace))
        self._post("/namespaces", {"namespace": ns, "properties": properties or {}})

    def list_namespaces(self) -> List[Identifier]:
        out = self._get("/namespaces")
        return [tuple(n) for n in out.get("namespaces", [])]

    def namespace_exists(self, namespace: Union[str, Identifier]) -> bool:
        try:
            self._get(f"/namespaces/{NS_SEP.join(_to_identifier(namespace))}")
            return True
        except NoSuchNamespaceError:
            return False

    def drop_namespace(self, namespace: Union[str, Identifier]) -> None:
        self._delete(f"/namespaces/{NS_SEP.join(_to_identifier(namespace))}")

    # -- tables --------------------------------------------------------------
    def _ns_and_name(self, identifier: Union[str, Identifier]) -> Tuple[str, str]:
        ident = _to_identifier(identifier)
        return NS_SEP.join(ident[:-1]), ident[-1]

    def list_tables(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = NS_SEP.join(_to_identifier(namespace))
        out = self._get(f"/namespaces/{ns}/tables")
        return [tuple(i["namespace"]) + (i["name"],) for i in out.get("identifiers", [])]

    def create_table(
        self,
        identifier: Union[str, Identifier],
        schema: Union[Schema, Any],
        partition_spec: PartitionSpec = UNPARTITIONED,
        sort_order: Optional[SortOrder] = None,
        properties: Optional[Dict[str, str]] = None,
        location: Optional[str] = None,
    ) -> Table:
        from pyspark.sql import types as T

        if isinstance(schema, T.StructType):
            schema = schema_from_spark(schema)
        ident = _to_identifier(identifier)
        ns, name = self._ns_and_name(ident)
        if not self.namespace_exists(ident[:-1]):
            self.create_namespace(ident[:-1])
        if location is None and self.warehouse:
            location = posixpath.join(self.warehouse, *ident)
        body = {
            "name": name,
            "schema": schema.to_dict(),
            "partition-spec": partition_spec.to_dict(),
            "write-order": (sort_order or SortOrder(0, [])).to_dict(),
            "properties": properties or {},
        }
        if location:
            body["location"] = location
        out = self._post(f"/namespaces/{ns}/tables", body)
        return self._table_from(ident, out)

    def create_table_if_not_exists(self, identifier, schema, **kw) -> Table:
        try:
            return self.create_table(identifier, schema, **kw)
        except TableAlreadyExistsError:
            return self.load_table(identifier)

    def load_table(self, identifier: Union[str, Identifier]) -> Table:
        ident = _to_identifier(identifier)
        ns, name = self._ns_and_name(ident)
        out = self._get(f"/namespaces/{ns}/tables/{name}")
        return self._table_from(ident, out)

    def table_exists(self, identifier: Union[str, Identifier]) -> bool:
        try:
            self.load_table(identifier)
            return True
        except NoSuchTableError:
            return False

    def drop_table(self, identifier: Union[str, Identifier]) -> None:
        ns, name = self._ns_and_name(identifier)
        self._delete(f"/namespaces/{ns}/tables/{name}")

    def purge_table(self, identifier: Union[str, Identifier]) -> None:
        ns, name = self._ns_and_name(identifier)
        self._delete(f"/namespaces/{ns}/tables/{name}", params={"purgeRequested": "true"})

    def rename_table(self, from_identifier, to_identifier) -> Table:
        src, dst = _to_identifier(from_identifier), _to_identifier(to_identifier)
        self._post(
            "/tables/rename",
            {
                "source": {"namespace": list(src[:-1]), "name": src[-1]},
                "destination": {"namespace": list(dst[:-1]), "name": dst[-1]},
            },
        )
        return self.load_table(dst)

    # -- views (REST view spec: namespaces/{ns}/views; reference
    # catalog/rest/__init__.py:972 create_view / 1186 list_views) --------------
    def create_view(self, identifier: Union[str, Identifier], sql: str, comment: Optional[str] = None) -> None:
        import time as _time
        import uuid as _uuid

        ns, name = self._ns_and_name(identifier)
        version = {
            "version-id": 1,
            "schema-id": 0,
            "timestamp-ms": int(_time.time() * 1000),
            "summary": {"engine-name": "iceberg_python_spark", **({"comment": comment} if comment else {})},
            "representations": [{"type": "sql", "sql": sql, "dialect": "spark"}],
            "default-namespace": ns.split(NS_SEP),
        }
        body = {
            "name": name,
            "location": f"{self.warehouse or ''}/{ns}/{name}",
            "schema": {"type": "struct", "schema-id": 0, "fields": []},
            "view-version": version,
            "properties": {},
        }
        self._post(f"/namespaces/{ns}/views", body)

    def view_sql(self, identifier: Union[str, Identifier]) -> str:
        ns, name = self._ns_and_name(identifier)
        out = self._get(f"/namespaces/{ns}/views/{name}")
        meta = out.get("metadata", {})
        current = meta.get("current-version-id")
        for v in meta.get("versions", []):
            if v.get("version-id") == current:
                for rep in v.get("representations", []):
                    if rep.get("type") == "sql":
                        return rep["sql"]
        raise NoSuchTableError(f"view {name} has no SQL representation")

    def view_exists(self, identifier: Union[str, Identifier]) -> bool:
        ns, name = self._ns_and_name(identifier)
        try:
            self._get(f"/namespaces/{ns}/views/{name}")
            return True
        except (NoSuchTableError, NoSuchNamespaceError):
            return False

    def list_views(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = NS_SEP.join(_to_identifier(namespace))
        out = self._get(f"/namespaces/{ns}/views")
        return [tuple(i["namespace"]) + (i["name"],) for i in out.get("identifiers", [])]

    def drop_view(self, identifier: Union[str, Identifier]) -> None:
        ns, name = self._ns_and_name(identifier)
        self._delete(f"/namespaces/{ns}/views/{name}")

    def read_view(self, identifier: Union[str, Identifier]):
        """Run the view SQL with the namespace's tables registered as
        temp views (same resolution the SQL catalog's read_view does)."""
        ident = _to_identifier(identifier)
        sql = self.view_sql(ident)
        for t_ident in self.list_tables(NS_SEP.join(ident[:-1])):
            self.load_table(t_ident).scan().to_df().createOrReplaceTempView(t_ident[-1])
        return self.spark.sql(sql)

    @staticmethod
    def _resolve_storage_credentials(creds: list, location: Optional[str]) -> Dict[str, str]:
        """Longest-prefix-match credential for `location` (reference
        catalog/rest/__init__.py:470): each credential is
        {prefix, config}; the most specific applicable prefix wins."""
        if not creds or not location:
            return {}
        best, best_len = {}, -1
        for cred in creds:
            prefix = cred.get("prefix", "")
            if location.startswith(prefix) and len(prefix) > best_len:
                best, best_len = dict(cred.get("config", {})), len(prefix)
        return best

    def _table_from(self, ident: Identifier, load_result: Dict[str, Any]) -> Table:
        metadata = TableMetadata.from_dict(load_result["metadata"])
        table = Table(ident, metadata, load_result.get("metadata-location", ""), self, self.spark)
        # vended credentials (X-Iceberg-Access-Delegation): the resolved
        # config rides the table; apply_storage_credentials() maps it to
        # per-bucket fs.s3a.* settings for the executors' data-plane IO
        table.io_properties = {
            **load_result.get("config", {}),
            **self._resolve_storage_credentials(
                load_result.get("storage-credentials", []),
                metadata.location or load_result.get("metadata-location"),
            ),
        }
        return table

    def load_credentials(self, identifier: Union[str, Identifier]) -> Dict[str, str]:
        """Re-vend credentials for a table without reloading it (spec
        loadCredentials endpoint; reference catalog/rest/__init__.py:1127)
        — the refresh path when vended tokens expire mid-job."""
        ident = _to_identifier(identifier)
        ns, name = self._ns_and_name(ident)
        out = self._get(f"/namespaces/{ns}/tables/{name}/credentials")
        t = self.load_table(ident)
        return self._resolve_storage_credentials(
            out.get("storage-credentials", []), t.location or t.metadata_location
        )

    # -- server-side scan planning (spec planTableScan / fetchPlanningResult
    # / fetchScanTasks; reference catalog/rest/__init__.py:502-552 +
    # rest/scan_planning.py models) ------------------------------------------
    def plan_table_scan(
        self,
        identifier: Union[str, Identifier],
        snapshot_id: Optional[int] = None,
        select: Optional[List[str]] = None,
        row_filter=None,
        case_sensitive: bool = True,
        poll_interval_s: float = 0.2,
        timeout_s: float = 60.0,
    ) -> List[Dict[str, Any]]:
        """Submit a scan plan to the server and return the file-scan-task
        JSON objects, transparently following async submission
        (plan-status=submitted → poll fetchPlanningResult) and plan-task
        pagination (fetchScanTasks). Each returned dict has the response's
        ``data-file`` plus resolved ``delete-files`` (references are
        per-response indices, resolved here)."""
        import time as _time

        from .expressions import AlwaysTrue
        from .expressions.rest import expression_to_rest

        ns, name = self._ns_and_name(identifier)
        body: Dict[str, Any] = {"case-sensitive": case_sensitive}
        if snapshot_id is not None:
            body["snapshot-id"] = snapshot_id
        if select is not None and tuple(select) != ("*",):
            body["select"] = list(select)
        if row_filter is not None and not isinstance(row_filter, AlwaysTrue):
            body["filter"] = expression_to_rest(row_filter)
        resp = self._post(f"/namespaces/{ns}/tables/{name}/plan", body)
        deadline = _time.monotonic() + timeout_s
        while resp.get("status") == "submitted":
            if _time.monotonic() > deadline:
                raise TimeoutError(f"scan planning for {ns}.{name} still pending after {timeout_s}s")
            _time.sleep(poll_interval_s)
            resp = self._get(f"/namespaces/{ns}/tables/{name}/plan/{resp['plan-id']}")
        if resp.get("status") in ("cancelled", "failed"):
            raise RuntimeError(f"server-side scan planning {resp['status']}: {resp.get('error')}")

        tasks: List[Dict[str, Any]] = []
        pending = [resp]
        while pending:
            chunk = pending.pop()
            delete_files = chunk.get("delete-files", [])
            for t in chunk.get("file-scan-tasks", []):
                refs = t.get("delete-file-references") or []
                tasks.append({**t, "delete-files": [delete_files[i] for i in refs]})
            for token in chunk.get("plan-tasks", []):
                pending.append(self._post(f"/namespaces/{ns}/tables/{name}/tasks", {"plan-task": token}))
        return tasks

    # -- commit protocol -----------------------------------------------------
    def _commit_table(self, table: Table, new_metadata: TableMetadata) -> None:
        ns, name = self._ns_and_name(table.identifier)
        base = table.metadata
        body = {
            "identifier": {"namespace": list(table.identifier[:-1]), "name": name},
            "requirements": _requirements(base),
            "updates": _updates_diff(base, new_metadata),
        }
        out = self._post(f"/namespaces/{ns}/tables/{name}", body)
        table.metadata = TableMetadata.from_dict(out["metadata"])
        table.metadata_location = out.get("metadata-location", table.metadata_location)


def _requirements(base: TableMetadata) -> List[Dict[str, Any]]:
    reqs: List[Dict[str, Any]] = [{"type": "assert-table-uuid", "uuid": base.table_uuid}]
    main = base.refs.get("main")
    reqs.append(
        {
            "type": "assert-ref-snapshot-id",
            "ref": "main",
            "snapshot-id": main.snapshot_id if main else None,
        }
    )
    return reqs


def _updates_diff(base: TableMetadata, new: TableMetadata) -> List[Dict[str, Any]]:
    """Semantic update list from base -> new (spec TableUpdate objects)."""
    ups: List[Dict[str, Any]] = []
    base_schema_ids = {s.schema_id for s in base.schemas}
    for s in new.schemas:
        if s.schema_id not in base_schema_ids:
            ups.append({"action": "add-schema", "schema": s.to_dict(), "last-column-id": new.last_column_id})
    if new.current_schema_id != base.current_schema_id:
        ups.append({"action": "set-current-schema", "schema-id": new.current_schema_id})
    base_spec_ids = {s.spec_id for s in base.partition_specs}
    for s in new.partition_specs:
        if s.spec_id not in base_spec_ids:
            ups.append({"action": "add-spec", "spec": s.to_dict()})
    if new.default_spec_id != base.default_spec_id:
        ups.append({"action": "set-default-spec", "spec-id": new.default_spec_id})
    base_order_ids = {o.order_id for o in base.sort_orders}
    for o in new.sort_orders:
        if o.order_id not in base_order_ids:
            ups.append({"action": "add-sort-order", "sort-order": o.to_dict()})
    if new.default_sort_order_id != base.default_sort_order_id:
        ups.append({"action": "set-default-sort-order", "sort-order-id": new.default_sort_order_id})
    base_snap_ids = {s.snapshot_id for s in base.snapshots}
    new_snap_ids = {s.snapshot_id for s in new.snapshots}
    for s in new.snapshots:
        if s.snapshot_id not in base_snap_ids:
            ups.append({"action": "add-snapshot", "snapshot": s.to_dict()})
    removed = base_snap_ids - new_snap_ids
    if removed:
        ups.append({"action": "remove-snapshots", "snapshot-ids": sorted(removed)})
    for ref_name, ref in new.refs.items():
        old = base.refs.get(ref_name)
        if old is None or old.snapshot_id != ref.snapshot_id or old.type != ref.type:
            ups.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": ref_name,
                    "snapshot-id": ref.snapshot_id,
                    "type": ref.type,
                }
            )
    for ref_name in set(base.refs) - set(new.refs):
        ups.append({"action": "remove-snapshot-ref", "ref-name": ref_name})
    set_props = {k: v for k, v in new.properties.items() if base.properties.get(k) != v}
    if set_props:
        ups.append({"action": "set-properties", "updates": set_props})
    removed_props = sorted(set(base.properties) - set(new.properties))
    if removed_props:
        ups.append({"action": "remove-properties", "removals": removed_props})
    if new.location != base.location:
        ups.append({"action": "set-location", "location": new.location})
    base_stats = {s.get("snapshot-id"): s for s in base.statistics}
    new_stats = {s.get("snapshot-id"): s for s in new.statistics}
    for sid, sf in new_stats.items():
        if base_stats.get(sid) != sf:
            ups.append({"action": "set-statistics", "snapshot-id": sid, "statistics": sf})
    for sid in set(base_stats) - set(new_stats):
        ups.append({"action": "remove-statistics", "snapshot-id": sid})
    return ups
