"""iceberg_python_spark — a PySpark-native table-format engine with the
query and data-processing capabilities of apache/iceberg-python.

Metadata plane (catalogs, snapshots, manifests, pruning) is driver-side
Python mirroring the Iceberg spec; the data plane is Spark DataFrames
(SURVEY.md §7 architecture stance).
"""

from .catalog import (
    DuckDBCatalog,
    InMemoryCatalog,
    MetastoreCatalog,
    NamespaceAlreadyExistsError,
    NoSuchNamespaceError,
    NoSuchTableError,
    SqlCatalog,
    SqliteCatalog,
    TableAlreadyExistsError,
    load_catalog,
)
from .catalog_rest import RestCatalog
from .partitioning import UNPARTITIONED, PartitionField, PartitionSpec, spec_from_names
from .schema import Schema, schema_from_spark
from .table import CommitFailedException, DataScan, StaticTable, Table, Transaction, UpsertResult

__all__ = [
    "load_catalog",
    "SqlCatalog",
    "SqliteCatalog",
    "DuckDBCatalog",
    "InMemoryCatalog",
    "RestCatalog",
    "MetastoreCatalog",
    "NoSuchTableError",
    "NoSuchNamespaceError",
    "NamespaceAlreadyExistsError",
    "TableAlreadyExistsError",
    "CommitFailedException",
    "Schema",
    "schema_from_spark",
    "PartitionSpec",
    "PartitionField",
    "UNPARTITIONED",
    "spec_from_names",
    "Table",
    "Transaction",
    "DataScan",
    "StaticTable",
    "UpsertResult",
]

__version__ = "0.1.0"
