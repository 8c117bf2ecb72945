"""Hive Metastore catalog.

Reference behavior: pyiceberg/catalog/hive.py:294 (HiveCatalog). The
metastore holds one Hive ``Table`` per Iceberg table whose
``parameters`` carry ``table_type=ICEBERG`` + ``metadata_location``
(+ previous), with columns mirrored into the storage descriptor for
Hive-engine discoverability (reference hive.py:195
``_construct_hive_storage_descriptor``). Table data and metadata JSON
stay in the warehouse; the metastore only holds the pointer, so commit
volume is O(commits), never O(data), and everything distributed runs
through Spark.

Transport: the ``thrift`` runtime and generated ``hive_metastore``
stubs the reference vendors aren't installable here, so the RPC layer
is `thrift_minimal` — a from-the-spec TBinaryProtocol codec — plus the
declarative HMS IDL subset below (struct field ids from the public
Apache Hive ``hive_metastore.thrift``). Wire-compatibility is pinned
by tests against an in-process mock metastore speaking the same
protocol (tests/hms_mock.py), the same strategy as the REST catalog's
mock server.

Commit protocol: HMS has no native compare-and-swap, so the pointer
CAS is the documented Iceberg-on-Hive scheme the reference implements
(hive.py:523 ``commit_table``): acquire an EXCLUSIVE table-level lock
(``lock`` / poll ``check_lock`` with exponential backoff), re-read the
table, verify ``metadata_location`` still equals the expected value,
``alter_table_with_environment_context``, ``unlock`` in a finally.
All four `MetastoreCatalog` primitives map onto that; create / load /
drop / register / clone / staged-create semantics are shared with the
SQL/Glue/DynamoDB backends by construction.
"""

from __future__ import annotations

import getpass
import posixpath
import socket as _socket
import time
import uuid
from typing import Any, Dict, List, Optional, Union

from pyspark.sql import SparkSession

from . import thrift_minimal as tm
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
from .types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IntegerType,
    ListType,
    LongType,
    MapType,
    StringType,
    StructType,
    TimestampType,
    TimestamptzType,
    TimeType,
    UUIDType,
)

TABLE_TYPE_PARAM = "table_type"
ICEBERG = "ICEBERG"
METADATA_LOCATION_PARAM = "metadata_location"
PREVIOUS_METADATA_LOCATION_PARAM = "previous_metadata_location"
EXTERNAL_TABLE = "EXTERNAL_TABLE"

# LockType / LockLevel / LockState enum values (public hive_metastore.thrift)
LOCK_EXCLUSIVE = 3
LEVEL_TABLE = 2
STATE_ACQUIRED = 1
STATE_WAITING = 2

# ---------------------------------------------------------------------------
# HMS IDL subset (field ids from the public hive_metastore.thrift; see
# module docstring). Schemas are thrift_minimal StructSchema dicts.
# ---------------------------------------------------------------------------

FIELD_SCHEMA = {1: ("name", tm.STRING, None), 2: ("type", tm.STRING, None), 3: ("comment", tm.STRING, None)}
SERDE_INFO = {
    1: ("name", tm.STRING, None),
    2: ("serializationLib", tm.STRING, None),
    3: ("parameters", tm.MAP, (tm.STRING, None, tm.STRING, None)),
}
ORDER = {1: ("col", tm.STRING, None), 2: ("order", tm.I32, None)}
STORAGE_DESCRIPTOR = {
    1: ("cols", tm.LIST, (tm.STRUCT, FIELD_SCHEMA)),
    2: ("location", tm.STRING, None),
    3: ("inputFormat", tm.STRING, None),
    4: ("outputFormat", tm.STRING, None),
    5: ("compressed", tm.BOOL, None),
    6: ("numBuckets", tm.I32, None),
    7: ("serdeInfo", tm.STRUCT, SERDE_INFO),
    8: ("bucketCols", tm.LIST, (tm.STRING, None)),
    9: ("sortCols", tm.LIST, (tm.STRUCT, ORDER)),
    10: ("parameters", tm.MAP, (tm.STRING, None, tm.STRING, None)),
}
HIVE_TABLE = {
    1: ("tableName", tm.STRING, None),
    2: ("dbName", tm.STRING, None),
    3: ("owner", tm.STRING, None),
    4: ("createTime", tm.I32, None),
    5: ("lastAccessTime", tm.I32, None),
    6: ("retention", tm.I32, None),
    7: ("sd", tm.STRUCT, STORAGE_DESCRIPTOR),
    8: ("partitionKeys", tm.LIST, (tm.STRUCT, FIELD_SCHEMA)),
    9: ("parameters", tm.MAP, (tm.STRING, None, tm.STRING, None)),
    10: ("viewOriginalText", tm.STRING, None),
    11: ("viewExpandedText", tm.STRING, None),
    12: ("tableType", tm.STRING, None),
}
DATABASE = {
    1: ("name", tm.STRING, None),
    2: ("description", tm.STRING, None),
    3: ("locationUri", tm.STRING, None),
    4: ("parameters", tm.MAP, (tm.STRING, None, tm.STRING, None)),
    6: ("ownerName", tm.STRING, None),
}
LOCK_COMPONENT = {
    1: ("type", tm.I32, None),
    2: ("level", tm.I32, None),
    3: ("dbname", tm.STRING, None),
    4: ("tablename", tm.STRING, None),
    6: ("operationType", tm.I32, None),
}
LOCK_REQUEST = {
    1: ("component", tm.LIST, (tm.STRUCT, LOCK_COMPONENT)),
    2: ("txnid", tm.I64, None),
    3: ("user", tm.STRING, None),
    4: ("hostname", tm.STRING, None),
    5: ("agentInfo", tm.STRING, None),
}
LOCK_RESPONSE = {1: ("lockid", tm.I64, None), 2: ("state", tm.I32, None), 3: ("errorMessage", tm.STRING, None)}
CHECK_LOCK_REQUEST = {1: ("lockid", tm.I64, None)}
UNLOCK_REQUEST = {1: ("lockid", tm.I64, None)}
ENVIRONMENT_CONTEXT = {1: ("properties", tm.MAP, (tm.STRING, None, tm.STRING, None))}
_EXC = {1: ("message", tm.STRING, None)}  # all HMS exceptions carry {1: message}


def _exc_struct(n: int, start: int = 1) -> Dict[int, Any]:
    return {start + i: (f"o{start + i}", tm.STRUCT, _EXC) for i in range(n)}


# method -> (args_schema, result_schema, {result_fid: exception_name})
HMS_METHODS: Dict[str, Any] = {
    "get_table": (
        {1: ("dbname", tm.STRING, None), 2: ("tbl_name", tm.STRING, None)},
        {0: ("success", tm.STRUCT, HIVE_TABLE), **_exc_struct(2)},
        {1: "MetaException", 2: "NoSuchObjectException"},
    ),
    "create_table": (
        {1: ("tbl", tm.STRUCT, HIVE_TABLE)},
        _exc_struct(4),
        {1: "AlreadyExistsException", 2: "InvalidObjectException", 3: "MetaException", 4: "NoSuchObjectException"},
    ),
    "drop_table": (
        {1: ("dbname", tm.STRING, None), 2: ("name", tm.STRING, None), 3: ("deleteData", tm.BOOL, None)},
        {1: ("o1", tm.STRUCT, _EXC), 3: ("o3", tm.STRUCT, _EXC)},
        {1: "NoSuchObjectException", 3: "MetaException"},
    ),
    "alter_table_with_environment_context": (
        {
            1: ("dbname", tm.STRING, None),
            2: ("tbl_name", tm.STRING, None),
            3: ("new_tbl", tm.STRUCT, HIVE_TABLE),
            4: ("environment_context", tm.STRUCT, ENVIRONMENT_CONTEXT),
        },
        _exc_struct(2),
        {1: "InvalidOperationException", 2: "MetaException"},
    ),
    "get_all_databases": (
        {},
        {0: ("success", tm.LIST, (tm.STRING, None)), **_exc_struct(1)},
        {1: "MetaException"},
    ),
    "get_database": (
        {1: ("name", tm.STRING, None)},
        {0: ("success", tm.STRUCT, DATABASE), **_exc_struct(2)},
        {1: "NoSuchObjectException", 2: "MetaException"},
    ),
    "create_database": (
        {1: ("database", tm.STRUCT, DATABASE)},
        _exc_struct(3),
        {1: "AlreadyExistsException", 2: "InvalidObjectException", 3: "MetaException"},
    ),
    "alter_database": (
        {1: ("dbname", tm.STRING, None), 2: ("db", tm.STRUCT, DATABASE)},
        _exc_struct(2),
        {1: "MetaException", 2: "NoSuchObjectException"},
    ),
    "drop_database": (
        {1: ("name", tm.STRING, None), 2: ("deleteData", tm.BOOL, None), 3: ("cascade", tm.BOOL, None)},
        _exc_struct(3),
        {1: "NoSuchObjectException", 2: "InvalidOperationException", 3: "MetaException"},
    ),
    "get_all_tables": (
        {1: ("db_name", tm.STRING, None)},
        {0: ("success", tm.LIST, (tm.STRING, None)), **_exc_struct(1)},
        {1: "MetaException"},
    ),
    "lock": (
        {1: ("rqst", tm.STRUCT, LOCK_REQUEST)},
        {0: ("success", tm.STRUCT, LOCK_RESPONSE), **_exc_struct(2)},
        {1: "NoSuchTxnException", 2: "TxnAbortedException"},
    ),
    "check_lock": (
        {1: ("rqst", tm.STRUCT, CHECK_LOCK_REQUEST)},
        {0: ("success", tm.STRUCT, LOCK_RESPONSE), **_exc_struct(3)},
        {1: "NoSuchTxnException", 2: "TxnAbortedException", 3: "NoSuchLockException"},
    ),
    "unlock": (
        {1: ("rqst", tm.STRUCT, UNLOCK_REQUEST)},
        _exc_struct(2),
        {1: "NoSuchLockException", 2: "TxnOpenException"},
    ),
}


class HiveMetastoreClient:
    """Thin RPC wrapper: ``client.get_table(dbname=..., tbl_name=...)``
    for every method in HMS_METHODS, over one ThriftConnection."""

    def __init__(self, host: str, port: int, framed: bool = False, timeout: float = 30.0):
        self._conn = tm.ThriftConnection(host, port, framed=framed, timeout=timeout)

    def close(self) -> None:
        self._conn.close()

    def __getattr__(self, method: str):
        try:
            args_schema, result_schema, exc_names = HMS_METHODS[method]
        except KeyError:
            raise AttributeError(method)

        def rpc(**kwargs):
            return self._conn.call(method, args_schema, kwargs, result_schema, exc_names)

        return rpc


# -- Hive type strings (reference hive.py:265 SchemaToHiveConverter) ---------

_HIVE_PRIMITIVES = {
    BooleanType: "boolean",
    IntegerType: "int",
    LongType: "bigint",
    FloatType: "float",
    DoubleType: "double",
    DateType: "date",
    TimeType: "string",
    TimestampType: "timestamp",
    TimestamptzType: "timestamp with local time zone",
    StringType: "string",
    UUIDType: "string",
    BinaryType: "binary",
    FixedType: "binary",
}


def _hive_type(t, hive2: bool = False) -> str:
    if isinstance(t, DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, StructType):
        inner = ",".join(f"{f.name}:{_hive_type(f.field_type, hive2)}" for f in t.fields)
        return f"struct<{inner}>"
    if isinstance(t, ListType):
        return f"array<{_hive_type(t.element_type, hive2)}>"
    if isinstance(t, MapType):
        return f"map<{_hive_type(t.key_type, hive2)},{_hive_type(t.value_type, hive2)}>"
    if isinstance(t, TimestamptzType) and hive2:
        return "timestamp"  # Hive 2 lacks the tz-aware type (reference hive.py:284)
    return _HIVE_PRIMITIVES.get(type(t), "string")


def _hive_columns(metadata: TableMetadata, hive2: bool = False) -> List[Dict[str, Any]]:
    schema = metadata.schema()
    return [
        {"name": f.name, "type": _hive_type(f.field_type, hive2), "comment": f.doc or ""}
        for f in schema.fields
    ]


class HiveCatalog(MetastoreCatalog):
    """Iceberg catalog backed by a Hive Metastore (reference
    catalog/hive.py:294). Properties follow the reference: ``uri``
    (thrift://host:port), ``hive.hive2-compatible``,
    ``lock-check-min-wait-time`` / ``-max-wait-time`` / ``-retries``.
    """

    def __init__(
        self,
        name: str,
        warehouse: str,
        spark: SparkSession,
        uri: str = "thrift://localhost:9083",
        properties: Optional[Dict[str, str]] = None,
    ):
        super().__init__(name, warehouse, spark)
        self.properties = dict(properties or {})
        raw = self.properties.get("uri", uri)
        hostport = raw.split("://", 1)[-1]
        host, _, port = hostport.partition(":")
        self._host, self._port = host or "localhost", int(port or 9083)
        hive2 = self.properties.get("hive.hive2-compatible", self.properties.get("hive.hive2_compatible", "false"))
        self._hive2 = str(hive2).lower() == "true"
        self._lock_min_wait = float(self.properties.get("lock-check-min-wait-time", 0.1))
        self._lock_max_wait = float(self.properties.get("lock-check-max-wait-time", 60))
        self._lock_retries = int(float(self.properties.get("lock-check-retries", 4)))

    def _client(self) -> HiveMetastoreClient:
        return HiveMetastoreClient(self._host, self._port)

    # -- hive table construction ----------------------------------------------

    def _hive_table(self, ns: str, table_name: str, metadata_location: str, previous: Optional[str] = None) -> Dict[str, Any]:
        metadata = TableMetadata.read(metadata_location)
        now = int(time.time())
        params = {
            "EXTERNAL": "TRUE",
            TABLE_TYPE_PARAM: ICEBERG,
            METADATA_LOCATION_PARAM: metadata_location,
        }
        if previous:
            params[PREVIOUS_METADATA_LOCATION_PARAM] = previous
        return {
            "tableName": table_name,
            "dbName": ns,
            "owner": getpass.getuser(),
            "createTime": now,
            "lastAccessTime": now,
            "retention": 0,
            "sd": {
                # reference hive.py:195 _construct_hive_storage_descriptor
                "cols": _hive_columns(metadata, self._hive2),
                "location": metadata.location,
                "inputFormat": "org.apache.hadoop.mapred.FileInputFormat",
                "outputFormat": "org.apache.hadoop.mapred.FileOutputFormat",
                "compressed": False,
                "numBuckets": 0,
                "serdeInfo": {"serializationLib": "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe", "parameters": {}},
                "bucketCols": [],
                "sortCols": [],
                "parameters": {},
            },
            "partitionKeys": [],
            "parameters": params,
            "tableType": EXTERNAL_TABLE,
        }

    @staticmethod
    def _pointer_of(hive_table: Dict[str, Any], ns: str, table_name: str) -> str:
        params = hive_table.get("parameters") or {}
        if params.get(TABLE_TYPE_PARAM, "").upper() != ICEBERG:
            raise NoSuchTableError(f"{ns}.{table_name} is a Hive table, not an Iceberg table")
        loc = params.get(METADATA_LOCATION_PARAM)
        if not loc:
            raise NoSuchTableError(f"{ns}.{table_name} has no metadata_location")
        return loc

    # -- locking (reference hive.py:493-520) ----------------------------------

    def _acquire_lock(self, client: HiveMetastoreClient, ns: str, table_name: str) -> int:
        req = {
            "component": [
                {"type": LOCK_EXCLUSIVE, "level": LEVEL_TABLE, "dbname": ns, "tablename": table_name, "operationType": 5}
            ],
            "user": getpass.getuser(),
            "hostname": _socket.gethostname(),
            "agentInfo": f"iceberg_python_spark-{uuid.uuid4()}",
        }
        resp = client.lock(rqst=req)
        lockid, state = resp["lockid"], resp["state"]
        wait = self._lock_min_wait
        retries = self._lock_retries
        while state == STATE_WAITING and retries > 0:
            time.sleep(wait)
            wait = min(wait * 2, self._lock_max_wait)
            retries -= 1
            state = client.check_lock(rqst={"lockid": lockid})["state"]
        if state != STATE_ACQUIRED:
            try:
                client.unlock(rqst={"lockid": lockid})
            except tm.ThriftStructException:
                pass
            raise CommitFailedException(f"Failed to acquire lock for {ns}.{table_name}, state={state}")
        return lockid

    # -- pointer primitives ----------------------------------------------------

    def _pointer_get(self, ns: str, table_name: str) -> Optional[str]:
        client = self._client()
        try:
            hive_table = client.get_table(dbname=ns, tbl_name=table_name)
        except tm.ThriftStructException as e:
            if e.name == "NoSuchObjectException":
                return None
            raise
        finally:
            client.close()
        return self._pointer_of(hive_table, ns, table_name)

    def _pointer_put_if_absent(self, ns: str, table_name: str, metadata_location: str) -> None:
        client = self._client()
        try:
            client.create_table(tbl=self._hive_table(ns, table_name, metadata_location))
        except tm.ThriftStructException as e:
            if e.name == "AlreadyExistsException":
                raise TableAlreadyExistsError(f"{ns}.{table_name} already exists") from e
            if e.name == "NoSuchObjectException":
                raise NoSuchNamespaceError(f"namespace {ns} does not exist") from e
            raise
        finally:
            client.close()

    def _pointer_cas(self, ns: str, table_name: str, expected: str, new: str) -> None:
        client = self._client()
        try:
            lockid = self._acquire_lock(client, ns, table_name)
            try:
                try:
                    hive_table = client.get_table(dbname=ns, tbl_name=table_name)
                except tm.ThriftStructException as e:
                    raise NoSuchTableError(f"{ns}.{table_name}") from e
                current = self._pointer_of(hive_table, ns, table_name)
                if current != expected:
                    raise CommitFailedException(
                        f"commit conflict on {ns}.{table_name}: expected {expected}, found {current}"
                    )
                new_tbl = self._hive_table(ns, table_name, new, previous=current)
                new_tbl["createTime"] = hive_table.get("createTime", new_tbl["createTime"])
                client.alter_table_with_environment_context(
                    dbname=ns,
                    tbl_name=table_name,
                    new_tbl=new_tbl,
                    # DO_NOT_UPDATE_STATS: stats live in Iceberg metadata
                    # (reference hive.py:608-615)
                    environment_context={"properties": {"DO_NOT_UPDATE_STATS": "true"}},
                )
            finally:
                client.unlock(rqst={"lockid": lockid})
        finally:
            client.close()

    def _pointer_delete(self, ns: str, table_name: str) -> None:
        client = self._client()
        try:
            client.drop_table(dbname=ns, name=table_name, deleteData=False)
        except tm.ThriftStructException as e:
            if e.name == "NoSuchObjectException":
                raise NoSuchTableError(f"{ns}.{table_name}") from e
            raise
        finally:
            client.close()

    # -- namespaces ------------------------------------------------------------

    def create_namespace(self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None) -> None:
        ns = ".".join(_to_identifier(namespace))
        props = dict(properties or {})
        db: Dict[str, Any] = {
            "name": ns,
            "parameters": {k: v for k, v in props.items() if k not in ("comment", "location")},
            "ownerName": getpass.getuser(),
        }
        # comment/location ride the Database's dedicated fields
        # (reference hive.py:231 _annotate_namespace)
        if "comment" in props:
            db["description"] = props["comment"]
        if "location" in props:
            db["locationUri"] = props["location"]
        client = self._client()
        try:
            client.create_database(database=db)
        except tm.ThriftStructException as e:
            if e.name == "AlreadyExistsException":
                raise NamespaceAlreadyExistsError(ns) from e
            raise
        finally:
            client.close()

    def namespace_exists(self, namespace: Union[str, Identifier]) -> bool:
        ns = ".".join(_to_identifier(namespace))
        client = self._client()
        try:
            client.get_database(name=ns)
            return True
        except tm.ThriftStructException as e:
            if e.name == "NoSuchObjectException":
                return False
            raise
        finally:
            client.close()

    def drop_namespace(self, namespace: Union[str, Identifier]) -> None:
        ns = ".".join(_to_identifier(namespace))
        if self.list_tables(ns):
            raise ValueError(f"namespace {ns} is not empty")
        client = self._client()
        try:
            client.drop_database(name=ns, deleteData=False, cascade=False)
        except tm.ThriftStructException as e:
            if e.name == "NoSuchObjectException":
                raise NoSuchNamespaceError(ns) from e
            raise
        finally:
            client.close()

    def list_namespaces(self) -> List[Identifier]:
        client = self._client()
        try:
            return [(n,) for n in client.get_all_databases()]
        finally:
            client.close()

    def load_namespace_properties(self, namespace: Union[str, Identifier]) -> Dict[str, str]:
        ns = ".".join(_to_identifier(namespace))
        client = self._client()
        try:
            db = client.get_database(name=ns)
        except tm.ThriftStructException as e:
            if e.name == "NoSuchObjectException":
                raise NoSuchNamespaceError(ns) from e
            raise
        finally:
            client.close()
        props = dict(db.get("parameters") or {})
        if db.get("locationUri"):
            props["location"] = db["locationUri"]
        if db.get("description"):
            props["comment"] = db["description"]
        return props

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
        props = self.load_namespace_properties(ns)  # raises NoSuchNamespaceError
        removed = [k for k in removals if k in props]
        missing = [k for k in removals if k not in props]
        for k in removed:
            props.pop(k)
        props.update(updates)
        db: Dict[str, Any] = {
            "name": ns,
            "parameters": {k: v for k, v in props.items() if k not in ("comment", "location")},
        }
        if "comment" in props:
            db["description"] = props["comment"]
        if "location" in props:
            db["locationUri"] = props["location"]
        client = self._client()
        try:
            client.alter_database(dbname=ns, db=db)
        finally:
            client.close()
        return {"updated": sorted(updates), "removed": removed, "missing": missing}

    def list_tables(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = ".".join(_to_identifier(namespace))
        client = self._client()
        try:
            names = client.get_all_tables(db_name=ns)
        finally:
            client.close()
        out = []
        for n in names:
            try:
                if self._pointer_get(ns, n):
                    out.append((ns, n))
            except NoSuchTableError:
                continue  # plain Hive table in the same database
        return out

    def rename_table(self, from_identifier: Union[str, Identifier], to_identifier: Union[str, Identifier]):
        src = _to_identifier(from_identifier)
        dst = _to_identifier(to_identifier)
        src_ns, src_name = ".".join(src[:-1]), src[-1]
        dst_ns, dst_name = ".".join(dst[:-1]), dst[-1]
        client = self._client()
        try:
            try:
                hive_table = client.get_table(dbname=src_ns, tbl_name=src_name)
            except tm.ThriftStructException as e:
                raise NoSuchTableError(f"{src_ns}.{src_name}") from e
            self._pointer_of(hive_table, src_ns, src_name)  # Iceberg check
            hive_table["dbName"] = dst_ns
            hive_table["tableName"] = dst_name
            client.alter_table_with_environment_context(
                dbname=src_ns, tbl_name=src_name, new_tbl=hive_table,
                environment_context={"properties": {"DO_NOT_UPDATE_STATS": "true"}},
            )
        finally:
            client.close()
        return self.load_table(to_identifier)

    # views aren't representable as HMS Iceberg pointer entries here
    def create_view(self, *a, **kw):
        raise NotImplementedError("HiveCatalog does not support views; use the SQL or REST catalog")

    def list_views(self, *a, **kw):
        return []

    def drop_view(self, *a, **kw):
        raise NotImplementedError("HiveCatalog does not support views; use the SQL or REST catalog")
