"""AWS-backed catalogs: Glue Data Catalog and DynamoDB.

Reference behavior: pyiceberg/catalog/glue.py:318 (GlueCatalog) and
pyiceberg/catalog/dynamodb.py:97 (DynamoDbCatalog). Both are driver-side
metadata clients — table data and metadata JSON stay in the warehouse
(local / s3 / hdfs via io.fileio); the AWS service only holds the
metadata-location pointer, so commit volume is O(commits), never O(data).
Everything distributed still runs through Spark; nothing here touches
executors.

Both backends plug their four atomic pointer primitives into
`catalog.MetastoreCatalog`, so create / load / drop / register / clone /
staged-create / commit-CAS semantics are shared with the SQL catalogs by
construction:

- **Glue**: one Glue table per Iceberg table, `Parameters` carrying
  `table_type=ICEBERG` + `metadata_location` (+ previous), columns
  mirrored into the Glue schema for Athena/console discoverability
  (reference glue.py:204 `_to_columns`). Commit CAS = `update_table`
  with the fetched `VersionId` — Glue rejects a concurrent bump with
  ConcurrentModificationException (reference glue.py:687, the documented
  Iceberg-on-AWS optimistic-locking scheme). Namespaces are Glue
  databases.
- **DynamoDB**: one item per table in a single Dynamo table (default
  name ``iceberg``), partition key ``identifier`` + sort key
  ``namespace`` with a keys-only GSI inverted on (namespace, identifier)
  for listings (reference dynamodb.py:796-835). Creates are conditional
  puts on ``attribute_not_exists(identifier)``. Commit CAS is a
  conditional ``update_item`` on the stored metadata_location — the
  reference's DynamoDbCatalog.commit_table raises NotImplementedError
  (dynamodb.py:233); ours completes the protocol, so a DynamoDB-backed
  table supports the full write path.

Property names match the reference (``glue.region``,
``glue.profile-name``, ``glue.endpoint``, ``glue.skip-archive``,
``dynamodb.region``, ``table-name``, …) so `.pyiceberg.yaml` configs
port over unchanged. Tested against moto's Glue/DynamoDB backends.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Sequence, Union

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


def _prop(properties: Dict[str, str], *names: str) -> Optional[str]:
    """First present property among `names`, accepting the dash-normalized
    spelling `load_catalog` produces from config files (skip-archive /
    skip_archive both resolve)."""
    for n in names:
        for spelling in (n, n.replace("-", "_")):
            if spelling in properties:
                return properties[spelling]
    return None


def _boto_session(properties: Dict[str, str], prefix: str):
    """Build a boto3 session from catalog properties. Accepts the
    reference's per-service keys (``<prefix>.region`` etc., reference
    glue.py:127-133 / dynamodb.py:90-94) with ``client.*`` fallbacks."""
    import boto3

    def get(key: str) -> Optional[str]:
        return _prop(properties, f"{prefix}.{key}", f"client.{key}")

    return boto3.Session(
        profile_name=get("profile-name"),
        region_name=get("region"),
        aws_access_key_id=get("access-key-id"),
        aws_secret_access_key=get("secret-access-key"),
        aws_session_token=get("session-token"),
    )


# ---------------------------------------------------------------------------
# Glue
# ---------------------------------------------------------------------------

# reference glue.py:163-177 GLUE_PRIMITIVE_TYPES — the Hive-ish strings
# Athena/Glue crawlers expect in column descriptors
_GLUE_PRIMITIVES = {
    BooleanType: "boolean",
    IntegerType: "int",
    LongType: "bigint",
    FloatType: "float",
    DoubleType: "double",
    DateType: "date",
    TimeType: "string",
    StringType: "string",
    UUIDType: "string",
    TimestampType: "timestamp",
    TimestamptzType: "timestamp",
    FixedType: "binary",
    BinaryType: "binary",
}


def _glue_type(t) -> str:
    """Iceberg type → Glue column type string (reference glue.py:180
    _IcebergSchemaToGlueType)."""
    if isinstance(t, DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, StructType):
        inner = ",".join(f"{f.name}:{_glue_type(f.field_type)}" for f in t.fields)
        return f"struct<{inner}>"
    if isinstance(t, ListType):
        return f"array<{_glue_type(t.element_type)}>"
    if isinstance(t, MapType):
        return f"map<{_glue_type(t.key_type)},{_glue_type(t.value_type)}>"
    for klass, s in _GLUE_PRIMITIVES.items():
        if type(t) is klass:
            return s
    # subclasses (timestamp_ns, geometry, …) fall back to their base row
    for klass, s in _GLUE_PRIMITIVES.items():
        if isinstance(t, klass):
            return s
    return str(t)


def _glue_columns(metadata: TableMetadata) -> List[Dict[str, Any]]:
    """Column descriptors for the Glue StorageDescriptor: current schema
    first, then historical columns flagged not-current (reference
    glue.py:204 _to_columns)."""
    out: Dict[str, Dict[str, Any]] = {}

    def add(field, current: bool) -> None:
        if field.name in out:
            return
        col = {
            "Name": field.name,
            "Type": _glue_type(field.field_type),
            "Parameters": {
                "iceberg.field.id": str(field.field_id),
                "iceberg.field.optional": str(not field.required).lower(),
                "iceberg.field.current": str(current).lower(),
            },
        }
        if field.doc:
            col["Comment"] = field.doc
        out[field.name] = col

    for f in metadata.schema().fields:
        add(f, True)
    for s in metadata.schemas:
        if s.schema_id == metadata.current_schema_id:
            continue
        for f in s.fields:
            add(f, False)
    return list(out.values())


class GlueCatalog(MetastoreCatalog):
    """Iceberg catalog over the AWS Glue Data Catalog.

    Reference: pyiceberg/catalog/glue.py:318. Namespaces map to Glue
    databases; each Iceberg table is a Glue table whose ``Parameters``
    carry the metadata-location pointer. Optimistic locking rides Glue
    table ``VersionId`` (glue.py:687).
    """

    def __init__(
        self,
        name: str,
        warehouse: str,
        spark: SparkSession,
        client=None,
        **properties: str,
    ):
        super().__init__(name, warehouse, spark)
        self.properties = dict(properties)
        if client is not None:
            self.glue = client
        else:
            session = _boto_session(self.properties, "glue")
            kwargs: Dict[str, Any] = {}
            if endpoint := _prop(self.properties, "glue.endpoint"):
                kwargs["endpoint_url"] = endpoint
            self.glue = session.client("glue", **kwargs)
        self._skip_archive = (_prop(self.properties, "glue.skip-archive") or "true").lower() != "false"

    # -- table input construction ---------------------------------------------
    def _table_input(
        self,
        table_name: str,
        metadata_location: str,
        prev_metadata_location: Optional[str] = None,
        existing_params: Optional[Dict[str, str]] = None,
    ) -> Dict[str, Any]:
        params = dict(existing_params or {})
        params[TABLE_TYPE_PARAM] = ICEBERG
        params[METADATA_LOCATION_PARAM] = metadata_location
        if prev_metadata_location:
            params[PREVIOUS_METADATA_LOCATION_PARAM] = prev_metadata_location
        metadata = TableMetadata.read(metadata_location)
        return {
            "Name": table_name,
            "TableType": "EXTERNAL_TABLE",
            "Parameters": params,
            "StorageDescriptor": {
                "Columns": _glue_columns(metadata),
                "Location": metadata.location,
            },
        }

    def _get_glue_table(self, ns: str, table_name: str) -> Dict[str, Any]:
        try:
            return self.glue.get_table(DatabaseName=ns, Name=table_name)["Table"]
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchTableError(f"{ns}.{table_name}")

    @staticmethod
    def _is_iceberg(glue_table: Dict[str, Any]) -> bool:
        return glue_table.get("Parameters", {}).get(TABLE_TYPE_PARAM, "").upper() == ICEBERG

    # -- pointer primitives ----------------------------------------------------
    def _pointer_get(self, ns: str, table_name: str) -> Optional[str]:
        try:
            glue_table = self._get_glue_table(ns, table_name)
        except NoSuchTableError:
            return None
        if not self._is_iceberg(glue_table):
            raise NoSuchTableError(f"{ns}.{table_name} is not an Iceberg table (table_type parameter)")
        loc = glue_table.get("Parameters", {}).get(METADATA_LOCATION_PARAM)
        if not loc:
            raise NoSuchTableError(f"{ns}.{table_name} has no {METADATA_LOCATION_PARAM} parameter")
        return loc

    def _pointer_put_if_absent(self, ns: str, table_name: str, metadata_location: str) -> None:
        table_input = self._table_input(table_name, metadata_location)
        try:
            self.glue.create_table(DatabaseName=ns, TableInput=table_input)
        except self.glue.exceptions.AlreadyExistsException:
            raise TableAlreadyExistsError(f"{ns}.{table_name}")
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchNamespaceError(ns)

    def _pointer_cas(self, ns: str, table_name: str, expected: str, new: str) -> None:
        glue_table = self._get_glue_table(ns, table_name)
        current = glue_table.get("Parameters", {}).get(METADATA_LOCATION_PARAM)
        if current != expected:
            raise CommitFailedException(
                f"metadata location for {ns}.{table_name} changed concurrently "
                f"(expected {expected}, found {current})"
            )
        version_id = glue_table.get("VersionId")
        if not version_id:
            # The VersionId is the service-side half of the CAS: without
            # it an update_table is unconditional, so two committers that
            # both passed the read-then-compare above would silently
            # overwrite each other (lost update). Refuse rather than
            # degrade; the reference's commit path makes the same demand
            # (glue.py:513-516 raises CommitFailedException when absent).
            raise CommitFailedException(
                f"Glue returned no VersionId for {ns}.{table_name}; "
                "cannot commit without a conditional update"
            )
        table_input = self._table_input(
            table_name, new, prev_metadata_location=expected, existing_params=glue_table.get("Parameters")
        )
        try:
            self.glue.update_table(
                DatabaseName=ns, TableInput=table_input, SkipArchive=self._skip_archive, VersionId=version_id
            )
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchTableError(f"{ns}.{table_name}")
        except self.glue.exceptions.ConcurrentModificationException:
            raise CommitFailedException(
                f"concurrent Glue update detected for {ns}.{table_name} at version {version_id}"
            )

    def _pointer_delete(self, ns: str, table_name: str) -> None:
        try:
            self.glue.delete_table(DatabaseName=ns, Name=table_name)
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchTableError(f"{ns}.{table_name}")

    # -- namespaces ------------------------------------------------------------
    def create_namespace(self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None) -> None:
        ns = ".".join(_to_identifier(namespace))
        database_input: Dict[str, Any] = {"Name": ns}
        params = {}
        for k, v in (properties or {}).items():
            if k == "Description":
                database_input["Description"] = v
            elif k == "location":
                database_input["LocationUri"] = v
            else:
                params[k] = v
        database_input["Parameters"] = params
        try:
            self.glue.create_database(DatabaseInput=database_input)
        except self.glue.exceptions.AlreadyExistsException:
            raise NamespaceAlreadyExistsError(ns)

    def create_namespace_if_not_exists(
        self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None
    ) -> None:
        try:
            self.create_namespace(namespace, properties)
        except NamespaceAlreadyExistsError:
            pass

    def namespace_exists(self, namespace: Union[str, Identifier]) -> bool:
        ns = ".".join(_to_identifier(namespace))
        try:
            self.glue.get_database(Name=ns)
            return True
        except self.glue.exceptions.EntityNotFoundException:
            return False

    def drop_namespace(self, namespace: Union[str, Identifier]) -> None:
        ns = ".".join(_to_identifier(namespace))
        try:
            tables = self.glue.get_tables(DatabaseName=ns)["TableList"]
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchNamespaceError(ns)
        if tables:
            raise ValueError(f"namespace {ns} is not empty")
        self.glue.delete_database(Name=ns)

    def list_namespaces(self) -> List[Identifier]:
        out: List[Identifier] = []
        token: Optional[str] = None
        while True:
            resp = self.glue.get_databases(NextToken=token) if token else self.glue.get_databases()
            out.extend((db["Name"],) for db in resp["DatabaseList"])
            token = resp.get("NextToken")
            if not token:
                return out

    def load_namespace_properties(self, namespace: Union[str, Identifier]) -> Dict[str, str]:
        ns = ".".join(_to_identifier(namespace))
        try:
            db = self.glue.get_database(Name=ns)["Database"]
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchNamespaceError(ns)
        props = dict(db.get("Parameters", {}))
        if "LocationUri" in db:
            props["location"] = db["LocationUri"]
        if "Description" in db:
            props["Description"] = db["Description"]
        return props

    def update_namespace_properties(
        self,
        namespace: Union[str, Identifier],
        removals: Optional[Sequence[str]] = None,
        updates: Optional[Dict[str, str]] = None,
    ) -> Dict[str, List[str]]:
        ns = ".".join(_to_identifier(namespace))
        removals = list(removals or [])
        updates = dict(updates or {})
        overlap = set(removals) & set(updates)
        if overlap:
            raise ValueError(f"properties in both removals and updates: {sorted(overlap)}")
        props = self.load_namespace_properties(ns)
        removed = [k for k in removals if k in props]
        missing = [k for k in removals if k not in props]
        for k in removed:
            del props[k]
        props.update(updates)
        database_input: Dict[str, Any] = {"Name": ns}
        params = {}
        for k, v in props.items():
            if k == "Description":
                database_input["Description"] = v
            elif k == "location":
                database_input["LocationUri"] = v
            else:
                params[k] = v
        database_input["Parameters"] = params
        self.glue.update_database(Name=ns, DatabaseInput=database_input)
        return {"updated": sorted(updates), "removed": removed, "missing": missing}

    # -- listings / rename -----------------------------------------------------
    def list_tables(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = ".".join(_to_identifier(namespace))
        out: List[Identifier] = []
        token: Optional[str] = None
        try:
            while True:
                resp = (
                    self.glue.get_tables(DatabaseName=ns, NextToken=token)
                    if token
                    else self.glue.get_tables(DatabaseName=ns)
                )
                out.extend((ns, t["Name"]) for t in resp["TableList"] if self._is_iceberg(t))
                token = resp.get("NextToken")
                if not token:
                    return out
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchNamespaceError(ns)

    def rename_table(self, from_identifier: Union[str, Identifier], to_identifier: Union[str, Identifier]):
        """Glue has no rename API: create the destination entry from the
        source's Glue table, then drop the source — rolling back the new
        entry if the drop fails (reference glue.py:754)."""
        src, dst = _to_identifier(from_identifier), _to_identifier(to_identifier)
        src_ns, src_name = ".".join(src[:-1]), src[-1]
        dst_ns, dst_name = ".".join(dst[:-1]), dst[-1]
        glue_table = self._get_glue_table(src_ns, src_name)
        if not self._is_iceberg(glue_table):
            raise NoSuchTableError(f"{src_ns}.{src_name} is not an Iceberg table")
        table_input: Dict[str, Any] = {"Name": dst_name, "Parameters": glue_table.get("Parameters", {})}
        for key in ("TableType", "Owner", "StorageDescriptor", "Description"):
            if key in glue_table:
                table_input[key] = glue_table[key]
        try:
            self.glue.create_table(DatabaseName=dst_ns, TableInput=table_input)
        except self.glue.exceptions.AlreadyExistsException:
            raise TableAlreadyExistsError(f"{dst_ns}.{dst_name}")
        except self.glue.exceptions.EntityNotFoundException:
            raise NoSuchNamespaceError(dst_ns)
        try:
            self._pointer_delete(src_ns, src_name)
        except Exception:
            self.glue.delete_table(DatabaseName=dst_ns, Name=dst_name)
            raise
        return self.load_table(dst)

    # views are a REST/SQL-catalog feature; Glue virtual views carry
    # engine-specific SQL dialects the catalog can't validate
    # (reference glue.py:974-1003 raises the same way)
    def create_view(self, *a, **kw):
        raise NotImplementedError("views are not supported by the Glue catalog (reference glue.py:974)")

    def list_views(self, *a, **kw):
        raise NotImplementedError("views are not supported by the Glue catalog")

    def drop_view(self, *a, **kw):
        raise NotImplementedError("views are not supported by the Glue catalog")


# ---------------------------------------------------------------------------
# DynamoDB
# ---------------------------------------------------------------------------

_DDB_IDENTIFIER = "identifier"
_DDB_NAMESPACE = "namespace"
_DDB_VERSION = "v"
_DDB_CREATED_AT = "created_at"
_DDB_UPDATED_AT = "updated_at"
_DDB_NAMESPACE_SENTINEL = "NAMESPACE"
_DDB_GSI = "namespace-identifier"
_PROP_PREFIX = "p."


class DynamoDbCatalog(MetastoreCatalog):
    """Iceberg catalog in a single DynamoDB table.

    Reference: pyiceberg/catalog/dynamodb.py:97. Item layout (partition
    key ``identifier``, sort key ``namespace``, keys-only GSI inverted on
    (namespace, identifier), dynamodb.py:796-835):

    - table item: identifier="ns.name", namespace="ns", version uuid
      ``v``, timestamps, properties under ``p.`` including
      ``p.metadata_location``
    - namespace item: identifier="NAMESPACE", namespace="ns"

    Beyond reference: ``_pointer_cas`` implements the commit protocol as
    a conditional update_item on ``p.metadata_location`` (the reference's
    commit_table raises NotImplementedError, dynamodb.py:233-251), so
    appends/deletes/upserts work against a DynamoDB-backed table.
    """

    def __init__(
        self,
        name: str,
        warehouse: str,
        spark: SparkSession,
        client=None,
        **properties: str,
    ):
        super().__init__(name, warehouse, spark)
        self.properties = dict(properties)
        if client is not None:
            self.dynamodb = client
        else:
            session = _boto_session(self.properties, "dynamodb")
            kwargs: Dict[str, Any] = {}
            if endpoint := _prop(self.properties, "dynamodb.endpoint"):
                kwargs["endpoint_url"] = endpoint
            self.dynamodb = session.client("dynamodb", **kwargs)
        self.dynamodb_table_name = _prop(self.properties, "table-name") or "iceberg"
        self._ensure_catalog_table()

    def _ensure_catalog_table(self) -> None:
        try:
            status = self.dynamodb.describe_table(TableName=self.dynamodb_table_name)["Table"]["TableStatus"]
            if status != "ACTIVE":
                raise RuntimeError(f"DynamoDB catalog table {self.dynamodb_table_name} is not ACTIVE ({status})")
            return
        except self.dynamodb.exceptions.ResourceNotFoundException:
            pass
        self.dynamodb.create_table(
            TableName=self.dynamodb_table_name,
            AttributeDefinitions=[
                {"AttributeName": _DDB_IDENTIFIER, "AttributeType": "S"},
                {"AttributeName": _DDB_NAMESPACE, "AttributeType": "S"},
            ],
            KeySchema=[
                {"AttributeName": _DDB_IDENTIFIER, "KeyType": "HASH"},
                {"AttributeName": _DDB_NAMESPACE, "KeyType": "RANGE"},
            ],
            GlobalSecondaryIndexes=[
                {
                    "IndexName": _DDB_GSI,
                    "KeySchema": [
                        {"AttributeName": _DDB_NAMESPACE, "KeyType": "HASH"},
                        {"AttributeName": _DDB_IDENTIFIER, "KeyType": "RANGE"},
                    ],
                    "Projection": {"ProjectionType": "KEYS_ONLY"},
                }
            ],
            BillingMode="PAY_PER_REQUEST",
        )

    # -- item helpers ----------------------------------------------------------
    def _get_item(self, identifier: str, namespace: str) -> Optional[Dict[str, Any]]:
        resp = self.dynamodb.get_item(
            TableName=self.dynamodb_table_name,
            ConsistentRead=True,
            Key={_DDB_IDENTIFIER: {"S": identifier}, _DDB_NAMESPACE: {"S": namespace}},
        )
        return resp.get("Item")

    @staticmethod
    def _now_ms() -> str:
        return str(round(time.time() * 1000))

    def _table_item(self, ns: str, table_name: str, metadata_location: str) -> Dict[str, Any]:
        now = self._now_ms()
        return {
            _DDB_IDENTIFIER: {"S": f"{ns}.{table_name}"},
            _DDB_NAMESPACE: {"S": ns},
            _DDB_VERSION: {"S": str(uuid.uuid4())},
            _DDB_CREATED_AT: {"N": now},
            _DDB_UPDATED_AT: {"N": now},
            _PROP_PREFIX + TABLE_TYPE_PARAM: {"S": ICEBERG},
            _PROP_PREFIX + METADATA_LOCATION_PARAM: {"S": metadata_location},
            _PROP_PREFIX + PREVIOUS_METADATA_LOCATION_PARAM: {"S": ""},
        }

    # -- pointer primitives ----------------------------------------------------
    def _pointer_get(self, ns: str, table_name: str) -> Optional[str]:
        item = self._get_item(f"{ns}.{table_name}", ns)
        if item is None:
            return None
        loc = item.get(_PROP_PREFIX + METADATA_LOCATION_PARAM, {}).get("S")
        if not loc:
            raise NoSuchTableError(f"{ns}.{table_name} item has no {METADATA_LOCATION_PARAM}")
        return loc

    def _pointer_put_if_absent(self, ns: str, table_name: str, metadata_location: str) -> None:
        try:
            self.dynamodb.put_item(
                TableName=self.dynamodb_table_name,
                Item=self._table_item(ns, table_name, metadata_location),
                ConditionExpression=f"attribute_not_exists({_DDB_IDENTIFIER})",
            )
        except self.dynamodb.exceptions.ConditionalCheckFailedException:
            raise TableAlreadyExistsError(f"{ns}.{table_name}")

    def _pointer_cas(self, ns: str, table_name: str, expected: str, new: str) -> None:
        try:
            self.dynamodb.update_item(
                TableName=self.dynamodb_table_name,
                Key={_DDB_IDENTIFIER: {"S": f"{ns}.{table_name}"}, _DDB_NAMESPACE: {"S": ns}},
                # #ml etc. because the stored attribute names contain '.'
                UpdateExpression="SET #ml = :new, #prev = :expected, #v = :v, #upd = :now",
                ConditionExpression=f"attribute_exists({_DDB_IDENTIFIER}) AND #ml = :expected",
                ExpressionAttributeNames={
                    "#ml": _PROP_PREFIX + METADATA_LOCATION_PARAM,
                    "#prev": _PROP_PREFIX + PREVIOUS_METADATA_LOCATION_PARAM,
                    "#v": _DDB_VERSION,
                    "#upd": _DDB_UPDATED_AT,
                },
                ExpressionAttributeValues={
                    ":new": {"S": new},
                    ":expected": {"S": expected},
                    ":v": {"S": str(uuid.uuid4())},
                    ":now": {"N": self._now_ms()},
                },
            )
        except self.dynamodb.exceptions.ConditionalCheckFailedException:
            raise CommitFailedException(
                f"metadata location for {ns}.{table_name} changed concurrently (expected {expected})"
            )

    def _pointer_delete(self, ns: str, table_name: str) -> None:
        try:
            self.dynamodb.delete_item(
                TableName=self.dynamodb_table_name,
                Key={_DDB_IDENTIFIER: {"S": f"{ns}.{table_name}"}, _DDB_NAMESPACE: {"S": ns}},
                ConditionExpression=f"attribute_exists({_DDB_IDENTIFIER})",
            )
        except self.dynamodb.exceptions.ConditionalCheckFailedException:
            raise NoSuchTableError(f"{ns}.{table_name}")

    # -- namespaces ------------------------------------------------------------
    def create_namespace(self, namespace: Union[str, Identifier], properties: Optional[Dict[str, str]] = None) -> None:
        ns = ".".join(_to_identifier(namespace))
        now = self._now_ms()
        item: Dict[str, Any] = {
            _DDB_IDENTIFIER: {"S": _DDB_NAMESPACE_SENTINEL},
            _DDB_NAMESPACE: {"S": ns},
            _DDB_VERSION: {"S": str(uuid.uuid4())},
            _DDB_CREATED_AT: {"N": now},
            _DDB_UPDATED_AT: {"N": now},
        }
        for k, v in (properties or {}).items():
            item[_PROP_PREFIX + k] = {"S": v}
        try:
            self.dynamodb.put_item(
                TableName=self.dynamodb_table_name,
                Item=item,
                ConditionExpression=f"attribute_not_exists({_DDB_NAMESPACE})",
            )
        except self.dynamodb.exceptions.ConditionalCheckFailedException:
            raise NamespaceAlreadyExistsError(ns)

    def namespace_exists(self, namespace: Union[str, Identifier]) -> bool:
        ns = ".".join(_to_identifier(namespace))
        return self._get_item(_DDB_NAMESPACE_SENTINEL, ns) is not None

    def drop_namespace(self, namespace: Union[str, Identifier]) -> None:
        ns = ".".join(_to_identifier(namespace))
        if self.list_tables(ns):
            raise ValueError(f"namespace {ns} is not empty")
        try:
            self.dynamodb.delete_item(
                TableName=self.dynamodb_table_name,
                Key={_DDB_IDENTIFIER: {"S": _DDB_NAMESPACE_SENTINEL}, _DDB_NAMESPACE: {"S": ns}},
                ConditionExpression=f"attribute_exists({_DDB_NAMESPACE})",
            )
        except self.dynamodb.exceptions.ConditionalCheckFailedException:
            raise NoSuchNamespaceError(ns)

    def list_namespaces(self) -> List[Identifier]:
        out: List[Identifier] = []
        kwargs: Dict[str, Any] = dict(
            TableName=self.dynamodb_table_name,
            ConsistentRead=True,
            KeyConditionExpression=f"{_DDB_IDENTIFIER} = :id",
            ExpressionAttributeValues={":id": {"S": _DDB_NAMESPACE_SENTINEL}},
        )
        while True:
            resp = self.dynamodb.query(**kwargs)
            out.extend(tuple(item[_DDB_NAMESPACE]["S"].split(".")) for item in resp.get("Items", []))
            if "LastEvaluatedKey" not in resp:
                return out
            kwargs["ExclusiveStartKey"] = resp["LastEvaluatedKey"]

    def load_namespace_properties(self, namespace: Union[str, Identifier]) -> Dict[str, str]:
        ns = ".".join(_to_identifier(namespace))
        item = self._get_item(_DDB_NAMESPACE_SENTINEL, ns)
        if item is None:
            raise NoSuchNamespaceError(ns)
        return {
            k[len(_PROP_PREFIX):]: v.get("S", "")
            for k, v in item.items()
            if k.startswith(_PROP_PREFIX)
        }

    def update_namespace_properties(
        self,
        namespace: Union[str, Identifier],
        removals: Optional[Sequence[str]] = None,
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
            del props[k]
        props.update(updates)
        item = self._get_item(_DDB_NAMESPACE_SENTINEL, ns)
        item = {k: v for k, v in item.items() if not k.startswith(_PROP_PREFIX)}
        for k, v in props.items():
            item[_PROP_PREFIX + k] = {"S": v}
        item[_DDB_VERSION] = {"S": str(uuid.uuid4())}
        item[_DDB_UPDATED_AT] = {"N": self._now_ms()}
        self.dynamodb.put_item(
            TableName=self.dynamodb_table_name,
            Item=item,
            ConditionExpression=f"attribute_exists({_DDB_NAMESPACE})",
        )
        return {"updated": sorted(updates), "removed": removed, "missing": missing}

    # -- listings / rename -----------------------------------------------------
    def list_tables(self, namespace: Union[str, Identifier]) -> List[Identifier]:
        ns = ".".join(_to_identifier(namespace))
        out: List[Identifier] = []
        kwargs: Dict[str, Any] = dict(
            TableName=self.dynamodb_table_name,
            IndexName=_DDB_GSI,
            KeyConditionExpression=f"{_DDB_NAMESPACE} = :ns",
            ExpressionAttributeValues={":ns": {"S": ns}},
        )
        while True:
            resp = self.dynamodb.query(**kwargs)
            for item in resp.get("Items", []):
                ident = item[_DDB_IDENTIFIER]["S"]
                if ident != _DDB_NAMESPACE_SENTINEL:
                    out.append(tuple(ns.split(".")) + (ident.rsplit(".", 1)[-1],))
            if "LastEvaluatedKey" not in resp:
                return out
            kwargs["ExclusiveStartKey"] = resp["LastEvaluatedKey"]

    def rename_table(self, from_identifier: Union[str, Identifier], to_identifier: Union[str, Identifier]):
        """Conditional put of the destination item carrying the source's
        pointer, then delete the source (reference dynamodb.py:295)."""
        src, dst = _to_identifier(from_identifier), _to_identifier(to_identifier)
        src_ns, src_name = ".".join(src[:-1]), src[-1]
        dst_ns, dst_name = ".".join(dst[:-1]), dst[-1]
        item = self._get_item(f"{src_ns}.{src_name}", src_ns)
        if item is None:
            raise NoSuchTableError(f"{src_ns}.{src_name}")
        if not self.namespace_exists(dst_ns):
            raise NoSuchNamespaceError(dst_ns)
        new_item = dict(item)
        new_item[_DDB_IDENTIFIER] = {"S": f"{dst_ns}.{dst_name}"}
        new_item[_DDB_NAMESPACE] = {"S": dst_ns}
        new_item[_DDB_VERSION] = {"S": str(uuid.uuid4())}
        new_item[_DDB_UPDATED_AT] = {"N": self._now_ms()}
        try:
            self.dynamodb.put_item(
                TableName=self.dynamodb_table_name,
                Item=new_item,
                ConditionExpression=f"attribute_not_exists({_DDB_IDENTIFIER})",
            )
        except self.dynamodb.exceptions.ConditionalCheckFailedException:
            raise TableAlreadyExistsError(f"{dst_ns}.{dst_name}")
        try:
            self._pointer_delete(src_ns, src_name)
        except Exception:
            self.dynamodb.delete_item(
                TableName=self.dynamodb_table_name,
                Key={_DDB_IDENTIFIER: {"S": f"{dst_ns}.{dst_name}"}, _DDB_NAMESPACE: {"S": dst_ns}},
            )
            raise
        return self.load_table(dst)

    def create_view(self, *a, **kw):
        raise NotImplementedError("views are not supported by the DynamoDB catalog (reference dynamodb.py:557)")

    def list_views(self, *a, **kw):
        raise NotImplementedError("views are not supported by the DynamoDB catalog")

    def drop_view(self, *a, **kw):
        raise NotImplementedError("views are not supported by the DynamoDB catalog")
