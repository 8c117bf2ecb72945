"""Cross-implementation proof: the REFERENCE pyiceberg library (at
/root/reference) opens a table exported by THIS engine and reads it.

The reference's hard third-party deps that aren't installable in this
sandbox are shimmed with spec-equivalent stand-ins (mmh3 -> our golden-
tested murmur3; zstandard -> pyarrow's zstd codec; cachetools/strictyaml/
pyroaring -> inert fallbacks used only on paths this check doesn't hit).
The metadata/manifest DECODING under test is all reference code.

Usage: python tools/reference_interop_check.py
Prints REFERENCE-INTEROP-OK on success; exits nonzero on mismatch.
"""

from __future__ import annotations

import os
import sys
import tempfile
import types


def install_reference_shims() -> None:
    def shim(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    ct = shim("cachetools")
    ct.LRUCache = dict
    ct.cached = lambda cache=None, key=None, lock=None: (lambda fn: fn)
    ct.cachedmethod = lambda cg, key=None, lock=None: (lambda fn: fn)
    ct.keys = shim("cachetools.keys", hashkey=lambda *a, **k: (a, tuple(sorted(k.items()))))

    from iceberg_python_spark.transforms import murmur3_32

    shim(
        "mmh3",
        hash=lambda data, seed=0, signed=True: murmur3_32(
            data if isinstance(data, bytes) else data.encode()
        ),
    )

    class _YAML:
        def __init__(self, data=None):
            self.data = data or {}

    def _strict_load(text, *_a, **_k):
        # faithful enough for the config contract: strictyaml parses
        # every scalar as a STRING; PyYAML's safe_load would coerce
        # numbers/bools, so stringify leaves post-parse
        import yaml as _yaml

        def stringify(v):
            if isinstance(v, dict):
                return {k: stringify(x) for k, x in v.items()}
            if isinstance(v, list):
                return [stringify(x) for x in v]
            return v if v is None else str(v)

        return _YAML(stringify(_yaml.safe_load(text) or {}))

    shim("strictyaml", load=_strict_load, YAML=_YAML)

    class _BitMap(set):
        pass

    shim("pyroaring", BitMap=_BitMap, FrozenBitMap=frozenset)

    import pyarrow as pa

    class ZstdCompressor:
        def compress(self, b):
            return pa.Codec("zstd").compress(b, asbytes=True)

    class ZstdDecompressor:
        def stream_reader(self, bio):
            return pa.input_stream(pa.BufferReader(bio.read()), compression="zstd")

    shim("zstandard", ZstdCompressor=ZstdCompressor, ZstdDecompressor=ZstdDecompressor)

    # rich is used only for schema-mismatch error pretty-printing
    class _Console:
        def __init__(self, *a, **k): ...
        def print(self, *a, **k): ...

    class _Table:
        def __init__(self, *a, **k): ...
        def add_column(self, *a, **k): ...
        def add_row(self, *a, **k): ...

    shim("rich")
    shim("rich.console", Console=_Console)
    shim("rich.table", Table=_Table)
    sys.modules["rich"].console = sys.modules["rich.console"]
    sys.modules["rich"].table = sys.modules["rich.table"]


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    install_reference_shims()
    sys.path.insert(0, "/root/reference")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import iceberg_python_spark as ips
    from iceberg_python_spark import spec_from_names
    from iceberg_python_spark.schema import schema_from_spark
    from iceberg_python_spark.table.avro_manifests import export_avro_metadata

    cat = ips.SqliteCatalog("interop", tempfile.mkdtemp(prefix="interop_wh_"), spark)
    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    schema = schema_from_spark(df.schema)
    # partitioned table: the export must carry spec + partition values the
    # reference can plan on
    t = cat.create_table(
        "db.cust", schema, partition_spec=spec_from_names(schema, ("c_custkey", "bucket[4]"))
    )
    t.append(df)
    out = os.path.join(tempfile.mkdtemp(prefix="interop_exp_"), "export")
    meta_json = export_avro_metadata(t, out)

    from pyiceberg.expressions import GreaterThan
    from pyiceberg.table import StaticTable as RefStaticTable

    rt = RefStaticTable.from_metadata(meta_json)
    n_expected = df.count()

    files = list(rt.scan().plan_files())
    assert len(files) >= 4, f"expected >=4 planned files, got {len(files)}"

    arrow = rt.scan().to_arrow()
    assert arrow.num_rows == n_expected, (arrow.num_rows, n_expected)

    flt = rt.scan(row_filter=GreaterThan("c_acctbal", 1000.0)).to_arrow()
    want = df.where("c_acctbal > 1000").count()
    assert flt.num_rows == want, (flt.num_rows, want)

    # value-level agreement on a sorted projection
    ref_rows = sorted(zip(arrow["c_custkey"].to_pylist(), arrow["c_name"].to_pylist()))
    ours = sorted((r.c_custkey, r.c_name) for r in df.select("c_custkey", "c_name").collect())
    assert ref_rows == ours, "value mismatch between reference read and source"

    # the reference must also prune by partition: bucket filter
    part_files = list(rt.scan(row_filter=GreaterThan("c_acctbal", 99999999.0)).plan_files())
    assert len(part_files) <= len(files)

    print(f"REFERENCE-INTEROP-OK files={len(files)} rows={arrow.num_rows} filtered={flt.num_rows}")

    # ---- native avro metadata: a table created with
    # write.metadata.format=avro commits spec Avro manifests directly —
    # the reference loads OUR live metadata.json with NO export step,
    # across appends and a CoW delete (carried-forward manifests) -------------
    t2 = cat.create_table(
        "db.cust_native_avro",
        schema,
        properties={"write.metadata.format": "avro"},
    )
    t2.append(df)
    t2.delete("c_acctbal < 0")  # CoW rewrite + carried-forward manifests
    t2.append(df.limit(50).withColumn("c_custkey", df.c_custkey + 10_000_000))
    want_native = df.where("c_acctbal >= 0").count() + 50
    assert t2.scan().to_df().count() == want_native  # our own read agrees
    assert t2.current_snapshot().manifest_list.endswith(".avro")
    rt2 = RefStaticTable.from_metadata(t2.metadata_location)
    arrow2 = rt2.scan().to_arrow()
    assert arrow2.num_rows == want_native, (arrow2.num_rows, want_native)
    flt2 = rt2.scan(row_filter=GreaterThan("c_acctbal", 1000.0)).to_arrow()
    want2 = t2.scan(row_filter="c_acctbal > 1000").to_df().count()
    assert flt2.num_rows == want2, (flt2.num_rows, want2)
    print(f"NATIVE-AVRO-INTEROP-OK rows={arrow2.num_rows} filtered={flt2.num_rows}")

    # ---- reverse direction: the REFERENCE writes a table (its own
    # pyarrow write path, Avro manifests, metadata JSON) and OUR engine
    # opens and reads it ---------------------------------------------------
    from pyiceberg.catalog import Catalog as RefCatalog, MetastoreCatalog
    from pyiceberg.exceptions import NoSuchTableError as RefNoSuchTable
    from pyiceberg.io import load_file_io
    from pyiceberg.table import CommitTableResponse, Table as RefTable

    class MiniCatalog(MetastoreCatalog):
        """Smallest possible reference-side catalog: in-process pointer
        map, real metadata/manifest/data writes via reference code."""

        def __init__(self, name, **props):
            super().__init__(name, **props)
            self._meta = {}

        def commit_table(self, table, requirements, updates):
            ident = table.name()
            current = None
            if ident in self._meta:
                current = self.load_table(ident)
            staged = self._update_and_stage_table(current, ident, requirements, updates)
            self._write_metadata(staged.metadata, staged.io, staged.metadata_location)
            self._meta[ident] = staged.metadata_location
            return CommitTableResponse(
                metadata=staged.metadata, metadata_location=staged.metadata_location
            )

        def load_table(self, identifier):
            ident = self._identifier_to_tuple_without_catalog(identifier) if hasattr(
                self, "_identifier_to_tuple_without_catalog"
            ) else RefCatalog.identifier_to_tuple(identifier)
            if ident not in self._meta:
                raise RefNoSuchTable(str(identifier))
            loc = self._meta[ident]
            io = load_file_io(self.properties, loc)
            from pyiceberg.serializers import FromInputFile

            metadata = FromInputFile.table_metadata(io.new_input(loc))
            return RefTable(ident, metadata, loc, io, self)

        # unused abstract surface
        def create_table(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def register_table(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def drop_table(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def rename_table(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def create_namespace(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def drop_namespace(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def list_tables(self, *a, **k):  # pragma: no cover
            return []

        def list_namespaces(self, *a, **k):  # pragma: no cover
            return []

        def list_views(self, *a, **k):  # pragma: no cover
            return []

        def load_view(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def register_view(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def load_namespace_properties(self, *a, **k):  # pragma: no cover
            return {}

        def update_namespace_properties(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def drop_view(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

        def view_exists(self, *a, **k):  # pragma: no cover
            return False

    import pyarrow as pa
    import pyarrow.parquet as pq

    # the reference targets a newer pyarrow; drop the one writer kwarg
    # this pyarrow doesn't know (irrelevant here: no decimal columns)
    _OrigWriter = pq.ParquetWriter

    class _CompatWriter(_OrigWriter):
        def __init__(self, *a, **k):
            k.pop("store_decimal_as_integer", None)
            super().__init__(*a, **k)

    pq.ParquetWriter = _CompatWriter

    ref_wh = tempfile.mkdtemp(prefix="refwrite_wh_")
    mini = MiniCatalog("mini", warehouse=f"file://{ref_wh}")
    arrow_tbl = pa.table(
        {
            "id": pa.array(range(500), pa.int64()),
            "v": pa.array([float(i) * 1.5 for i in range(500)], pa.float64()),
            "s": pa.array([f"s{i % 7}" for i in range(500)]),
        }
    )
    tx = mini.create_table_transaction(
        ("db", "refmade"), arrow_tbl.schema, location=f"file://{ref_wh}/db/refmade"
    )
    tx.append(arrow_tbl)
    tx.append(arrow_tbl.slice(0, 25))
    ref_table = tx.commit_transaction()
    ref_loc = ref_table.metadata_location
    print("reference wrote:", ref_loc)

    from iceberg_python_spark.table import StaticTable as OurStaticTable

    ours = OurStaticTable.from_metadata(ref_loc.replace("file://", ""), spark)
    got = ours.scan().to_df()
    assert got.count() == 525, got.count()
    sub = ours.scan(row_filter="id < 25", selected_fields=("id", "v")).to_df()
    vals = sorted((r.id, r.v) for r in sub.collect())
    want_vals = sorted([(i, i * 1.5) for i in range(25)] * 2)
    assert vals == want_vals, "reverse-direction value mismatch"
    print(f"REVERSE-INTEROP-OK rows={got.count()} filtered={sub.count()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
