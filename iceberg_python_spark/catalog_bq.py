"""BigQuery metastore catalog.

Reference behavior: pyiceberg/catalog/bigquery_metastore.py:65
(BigQueryMetastoreCatalog). Datasets are namespaces; each Iceberg table
is a BigQuery external table whose ``externalCatalogTableOptions``
carry a Hive-style storage descriptor plus ``parameters`` with
``table_type=ICEBERG`` and ``metadata_location`` (+ previous) — the
same pointer convention as the Glue/Hive backends, so everything above
the four `MetastoreCatalog` primitives is shared.

Transport: the google-cloud SDK the reference uses isn't installable
here, so this client speaks the public BigQuery REST API v2 directly
(``bigquery.googleapis.com/bigquery/v2`` — datasets.insert/get/list/
patch/delete, tables.insert/get/list/patch/delete). That API is also
where the commit CAS comes from: every ``tables.get`` returns an
``etag``, and ``tables.patch`` with ``If-Match`` fails 412 Precondition
Failed if the table changed since the read — real compare-and-swap, no
lock dance needed (unlike the Hive metastore). Reference property
names are honored (``gcp.project-id``, ``gcp.location``,
``gcp.bigquery.endpoint`` for emulators, a static bearer ``token``);
real GCP credential flows need the SDK and are documented as such.

Tested wire-level against an in-process mock BigQuery v2 server
(tests/bq_mock.py) with etag/If-Match semantics, the same strategy as
the REST-catalog and Hive-metastore mocks.
"""

from __future__ import annotations

import json
import posixpath
from typing import Any, Dict, List, Optional, Tuple, Union

import requests
from pyspark.sql import SparkSession

from .catalog import (
    Identifier,
    MetastoreCatalog,
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
    _to_identifier,
)
from .table import CommitFailedException
from .table.metadata import TableMetadata

TABLE_TYPE_PARAM = "table_type"
ICEBERG = "ICEBERG"
METADATA_LOCATION_PARAM = "metadata_location"
PREVIOUS_METADATA_LOCATION_PARAM = "previous_metadata_location"

# reference bigquery_metastore.py constants
HIVE_FILE_INPUT_FORMAT = "org.apache.hadoop.mapred.FileInputFormat"
HIVE_FILE_OUTPUT_FORMAT = "org.apache.hadoop.mapred.FileOutputFormat"
HIVE_SERIALIZATION_LIBRARY = "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe"


class BigQueryMetastoreCatalog(MetastoreCatalog):
    """Iceberg catalog backed by the BigQuery metastore (reference
    catalog/bigquery_metastore.py:65), over the public REST API v2."""

    def __init__(
        self,
        name: str,
        warehouse: str,
        spark: SparkSession,
        properties: Optional[Dict[str, str]] = None,
        **kw: str,
    ):
        super().__init__(name, warehouse, spark)
        props = {**(properties or {}), **kw}
        self.properties = props

        def prop(*names: str) -> Optional[str]:
            for n in names:
                for s in (n, n.replace("-", "_")):
                    if s in props:
                        return props[s]
            return None

        self.project = prop("gcp.project-id", "project-id")
        if not self.project:
            raise ValueError("Missing property: gcp.project-id")
        self.location = prop("gcp.location")
        self.endpoint = (prop("gcp.bigquery.endpoint") or "https://bigquery.googleapis.com").rstrip("/")
        self._base = f"{self.endpoint}/bigquery/v2/projects/{self.project}"
        self._session = requests.Session()
        token = prop("token")
        if token:
            self._session.headers["Authorization"] = f"Bearer {token}"

    # -- HTTP ------------------------------------------------------------------

    def _req(self, method: str, path: str, *, json_body: Any = None, headers: Optional[Dict[str, str]] = None, params: Optional[Dict[str, str]] = None) -> requests.Response:
        return self._session.request(
            method, f"{self._base}{path}", json=json_body, headers=headers, params=params, timeout=60
        )

    def _paged_get(self, path: str, items_key: str) -> Tuple[List[Dict[str, Any]], "requests.Response"]:
        """GET a list endpoint, following nextPageToken until exhausted.
        Real BigQuery defaults to 50-item pages; ignoring the token would
        silently truncate list_tables/list_namespaces (and let
        drop_namespace's emptiness check pass on a non-empty dataset)."""
        items: List[Dict[str, Any]] = []
        token: Optional[str] = None
        while True:
            params = {"pageToken": token} if token else None
            r = self._req("GET", path, params=params)
            if not r.ok:
                return items, r  # caller maps the status code
            body = r.json()
            items.extend(body.get(items_key, []))
            token = body.get("nextPageToken")
            if not token:
                return items, r

    @staticmethod
    def _err(resp: requests.Response) -> str:
        try:
            return resp.json().get("error", {}).get("message", resp.text[:200])
        except ValueError:
            return resp.text[:200]

    # -- table resource construction ------------------------------------------

    def _table_resource(self, ns: str, table_name: str, metadata_location: str, previous: Optional[str] = None) -> Dict[str, Any]:
        metadata = TableMetadata.read(metadata_location)
        params = {TABLE_TYPE_PARAM: ICEBERG, METADATA_LOCATION_PARAM: metadata_location, "EXTERNAL": "TRUE"}
        if previous:
            params[PREVIOUS_METADATA_LOCATION_PARAM] = previous
        # Hive-style basic stats from the current snapshot summary
        # (reference _create_table_parameters)
        snap = metadata.current_snapshot()
        summary = (snap.summary if snap else None) or {}
        for src, dst in (("total-data-files", "numFiles"), ("total-records", "numRows"), ("total-files-size", "totalSize")):
            if summary.get(src) is not None:
                params[dst] = str(summary[src])
        return {
            "tableReference": {"projectId": self.project, "datasetId": ns, "tableId": table_name},
            # reference _create_external_catalog_table_options: Hive-shaped
            # storage descriptor so BigLake/engines recognize the table
            "externalCatalogTableOptions": {
                "storageDescriptor": {
                    "locationUri": metadata.location,
                    "inputFormat": HIVE_FILE_INPUT_FORMAT,
                    "outputFormat": HIVE_FILE_OUTPUT_FORMAT,
                    "serdeInfo": {"serializationLibrary": HIVE_SERIALIZATION_LIBRARY},
                },
                "parameters": params,
            },
        }

    @staticmethod
    def _pointer_of(resource: Dict[str, Any], ns: str, table_name: str) -> str:
        params = (resource.get("externalCatalogTableOptions") or {}).get("parameters") or {}
        if params.get(TABLE_TYPE_PARAM, "").upper() != ICEBERG:
            raise NoSuchTableError(f"{ns}.{table_name} is not an Iceberg table")
        loc = params.get(METADATA_LOCATION_PARAM)
        if not loc:
            raise NoSuchTableError(f"{ns}.{table_name} has no metadata_location")
        return loc

    # -- pointer primitives ----------------------------------------------------

    def _get_table_resource(self, ns: str, table_name: str) -> Optional[Dict[str, Any]]:
        r = self._req("GET", f"/datasets/{ns}/tables/{table_name}")
        if r.status_code == 404:
            return None
        if not r.ok:
            raise RuntimeError(f"BigQuery tables.get failed: {self._err(r)}")
        return r.json()

    def _pointer_get(self, ns: str, table_name: str) -> Optional[str]:
        resource = self._get_table_resource(ns, table_name)
        if resource is None:
            return None
        return self._pointer_of(resource, ns, table_name)

    def _pointer_put_if_absent(self, ns: str, table_name: str, metadata_location: str) -> None:
        r = self._req("POST", f"/datasets/{ns}/tables", json_body=self._table_resource(ns, table_name, metadata_location))
        if r.status_code == 409:
            raise TableAlreadyExistsError(f"{ns}.{table_name} already exists")
        if r.status_code == 404:
            raise NoSuchNamespaceError(f"dataset {ns} does not exist")
        if not r.ok:
            raise RuntimeError(f"BigQuery tables.insert failed: {self._err(r)}")

    def _pointer_cas(self, ns: str, table_name: str, expected: str, new: str) -> None:
        resource = self._get_table_resource(ns, table_name)
        if resource is None:
            raise NoSuchTableError(f"{ns}.{table_name}")
        current = self._pointer_of(resource, ns, table_name)
        if current != expected:
            raise CommitFailedException(
                f"commit conflict on {ns}.{table_name}: expected {expected}, found {current}"
            )
        etag = resource.get("etag")
        body = self._table_resource(ns, table_name, new, previous=current)
        r = self._req(
            "PATCH",
            f"/datasets/{ns}/tables/{table_name}",
            json_body=body,
            headers={"If-Match": etag} if etag else None,
        )
        if r.status_code == 412:  # etag mismatch: somebody committed in between
            raise CommitFailedException(f"commit conflict on {ns}.{table_name}: etag changed")
        if not r.ok:
            raise RuntimeError(f"BigQuery tables.patch failed: {self._err(r)}")

    def _pointer_delete(self, ns: str, table_name: str) -> None:
        r = self._req("DELETE", f"/datasets/{ns}/tables/{table_name}")
        if r.status_code == 404:
            raise NoSuchTableError(f"{ns}.{table_name}")
        if not r.ok and r.status_code != 204:
            raise RuntimeError(f"BigQuery tables.delete failed: {self._err(r)}")

    # -- namespaces (datasets) -------------------------------------------------

    def create_namespace(self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None) -> None:
        ns = ".".join(_to_identifier(namespace))
        props = dict(properties or {})
        body = {
            "datasetReference": {"projectId": self.project, "datasetId": ns},
            "externalCatalogDatasetOptions": {
                "defaultStorageLocationUri": props.pop("location", posixpath.join(self.warehouse, ns)),
                "parameters": props,
            },
        }
        if self.location:
            body["location"] = self.location
        r = self._req("POST", "/datasets", json_body=body)
        if r.status_code == 409:
            raise NamespaceAlreadyExistsError(ns)
        if not r.ok:
            raise RuntimeError(f"BigQuery datasets.insert failed: {self._err(r)}")

    def _get_dataset(self, ns: str) -> Optional[Dict[str, Any]]:
        r = self._req("GET", f"/datasets/{ns}")
        if r.status_code == 404:
            return None
        if not r.ok:
            raise RuntimeError(f"BigQuery datasets.get failed: {self._err(r)}")
        return r.json()

    def namespace_exists(self, namespace: Union[str, Identifier]) -> bool:
        return self._get_dataset(".".join(_to_identifier(namespace))) is not None

    def drop_namespace(self, namespace: Union[str, Identifier]) -> None:
        ns = ".".join(_to_identifier(namespace))
        if self.list_tables(ns):
            raise ValueError(f"namespace {ns} is not empty")
        r = self._req("DELETE", f"/datasets/{ns}", params={"deleteContents": "false"})
        if r.status_code == 404:
            raise NoSuchNamespaceError(ns)
        if not r.ok and r.status_code != 204:
            raise RuntimeError(f"BigQuery datasets.delete failed: {self._err(r)}")

    def list_namespaces(self) -> List[Identifier]:
        datasets, r = self._paged_get("/datasets", "datasets")
        if not r.ok:
            raise RuntimeError(f"BigQuery datasets.list failed: {self._err(r)}")
        return sorted((d["datasetReference"]["datasetId"],) for d in datasets)

    def load_namespace_properties(self, namespace: Union[str, Identifier]) -> Dict[str, str]:
        ns = ".".join(_to_identifier(namespace))
        ds = self._get_dataset(ns)
        if ds is None:
            raise NoSuchNamespaceError(ns)
        opts = ds.get("externalCatalogDatasetOptions") or {}
        return dict(opts.get("parameters") or {})

    def update_namespace_properties(
        self,
        namespace: Union[str, Identifier],
        removals: Optional[List[str]] = None,
        updates: Optional[Dict[str, str]] = None,
    ) -> Dict[str, List[str]]:
        ns = ".".join(_to_identifier(namespace))
        removals = list(removals or [])
        updates = dict(updates or {})
        overlap = set(removals) & set(updates)
        if overlap:
            raise ValueError(f"properties in both removals and updates: {sorted(overlap)}")
        ds = self._get_dataset(ns)
        if ds is None:
            raise NoSuchNamespaceError(ns)
        opts = ds.get("externalCatalogDatasetOptions") or {}
        props = dict(opts.get("parameters") or {})
        removed = [k for k in removals if k in props]
        missing = [k for k in removals if k not in props]
        for k in removed:
            props.pop(k)
        props.update(updates)
        opts["parameters"] = props
        r = self._req("PATCH", f"/datasets/{ns}", json_body={"externalCatalogDatasetOptions": opts})
        if not r.ok:
            raise RuntimeError(f"BigQuery datasets.patch failed: {self._err(r)}")
        return {"updated": sorted(updates), "removed": removed, "missing": missing}

    def list_tables(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = ".".join(_to_identifier(namespace))
        tables, r = self._paged_get(f"/datasets/{ns}/tables", "tables")
        if r.status_code == 404:
            raise NoSuchNamespaceError(ns)
        if not r.ok:
            raise RuntimeError(f"BigQuery tables.list failed: {self._err(r)}")
        out = []
        for t in tables:
            name = t["tableReference"]["tableId"]
            try:
                if self._pointer_get(ns, name):
                    out.append((ns, name))
            except NoSuchTableError:
                continue  # native BigQuery table in the same dataset
        return sorted(out)

    def rename_table(self, from_identifier: Union[str, Identifier], to_identifier: Union[str, Identifier]):
        # BigQuery has no table rename; the reference raises too
        # (bigquery_metastore.py:240)
        raise NotImplementedError("BigQuery does not support renaming tables")

    def create_view(self, *a, **kw):
        raise NotImplementedError("BigQueryMetastoreCatalog does not support views")

    def list_views(self, *a, **kw):
        return []

    def drop_view(self, *a, **kw):
        raise NotImplementedError("BigQueryMetastoreCatalog does not support views")
