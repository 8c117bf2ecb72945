"""Thin CLI over the catalog (reference: pyiceberg/cli/console.py, 490 LoC:
list/describe/files/schema/spec/uuid/location/drop/rename/properties/
list-refs). Run as:

    python -m iceberg_python_spark.cli --warehouse /path [--catalog name] CMD ...
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("ips-cli")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def main(argv=None) -> int:
    try:
        return _main(argv)
    except Exception as e:
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 1


def _main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="iceberg_python_spark", description="catalog/table inspection CLI")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--catalog", default="default")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list-namespaces")
    p = sub.add_parser("list")
    p.add_argument("namespace")
    for name in ("describe", "schema", "spec", "uuid", "location", "properties", "list-refs", "files", "snapshots", "history"):
        p = sub.add_parser(name)
        p.add_argument("identifier")
    p = sub.add_parser("drop")
    p.add_argument("identifier")
    p.add_argument("--purge", action="store_true")
    p = sub.add_parser("rename")
    p.add_argument("src")
    p.add_argument("dst")
    p = sub.add_parser("set-property")
    p.add_argument("identifier")
    p.add_argument("key")
    p.add_argument("value")
    p = sub.add_parser("remove-property")
    p.add_argument("identifier")
    p.add_argument("key")
    p = sub.add_parser("compact")
    p.add_argument("identifier")
    p = sub.add_parser("zorder")
    p.add_argument("identifier")
    p.add_argument("columns", help="comma-separated column list to cluster on")
    p.add_argument("--bits", type=int, default=16)
    p = sub.add_parser("clone")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--snapshot-id", type=int, default=None)
    p = sub.add_parser("create-branch")
    p.add_argument("identifier")
    p.add_argument("branch")
    p.add_argument("--snapshot-id", type=int, default=None)
    p = sub.add_parser("create-tag")
    p.add_argument("identifier")
    p.add_argument("tag")
    p.add_argument("--snapshot-id", type=int, default=None)
    p = sub.add_parser("publish")
    p.add_argument("identifier")
    p.add_argument("branch", help="fast-forward main to this ref")
    p = sub.add_parser("rewrite-manifests")
    p.add_argument("identifier")
    p = sub.add_parser("expire-snapshots")
    p.add_argument("identifier")
    p.add_argument("--older-than-ms", type=int, required=True)

    p = sub.add_parser("curate")
    p.add_argument("identifier", help="source documents table (id/text/source columns)")
    p.add_argument("dest_prefix", help="output prefix: writes <prefix>_clean/_mix/_packed")
    p.add_argument("--token-budget", type=int, default=1_000_000)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--source-col", default="source")
    p.add_argument("--quality-flags", default=None,
                   help="comma-separated Gopher rule subset (default: all rules)")

    args = ap.parse_args(argv)

    from .catalog import SqliteCatalog

    cat = SqliteCatalog(args.catalog, args.warehouse, spark=None)

    def table():
        t = cat.load_table(args.identifier)
        return t

    def table_for(ident):
        return cat.load_table(ident)

    if args.cmd == "list-namespaces":
        for ns in cat.list_namespaces():
            print(".".join(ns))
    elif args.cmd == "list":
        for ident in cat.list_tables(args.namespace):
            print(".".join(ident))
        for ident in cat.list_views(args.namespace):
            print(".".join(ident) + " (view)")
    elif args.cmd == "describe":
        t = table()
        info = {
            "name": t.name,
            "location": t.location,
            "uuid": t.metadata.table_uuid,
            "format-version": t.metadata.format_version,
            "current-snapshot-id": t.metadata.current_snapshot_id,
            "snapshots": len(t.snapshots()),
            "schema": [str(f) for f in t.schema().fields],
            "partition-spec": [f.to_dict() for f in t.spec().fields],
            "properties": t.properties,
        }
        print(json.dumps(info, indent=2, default=str))
    elif args.cmd == "schema":
        for f in table().schema().fields:
            print(f)
    elif args.cmd == "spec":
        print(json.dumps(table().spec().to_dict(), indent=2))
    elif args.cmd == "uuid":
        print(table().metadata.table_uuid)
    elif args.cmd == "location":
        print(table().location)
    elif args.cmd == "properties":
        for k, v in sorted(table().properties.items()):
            print(f"{k}\t{v}")
    elif args.cmd == "list-refs":
        for name, ref in table().refs().items():
            print(f"{name}\t{ref.type}\t{ref.snapshot_id}")
    elif args.cmd == "snapshots":
        for s in table().snapshots():
            print(f"{s.snapshot_id}\t{s.operation}\tseq={s.sequence_number}\tts={s.timestamp_ms}")
    elif args.cmd == "history":
        for e in table().history():
            print(f"{e.timestamp_ms}\t{e.snapshot_id}")
    elif args.cmd == "files":
        t = table()
        for e in t._live_entries(t.current_snapshot()):
            d = e["data_file"]
            kind = "DATA" if d.get("content", 0) == 0 else "DELETES"
            print(f"{kind}\t{d['record_count']}\t{d['file_size_in_bytes']}\t{d['file_path']}")
    elif args.cmd == "drop":
        (cat.purge_table if args.purge else cat.drop_table)(args.identifier)
        print(f"dropped {args.identifier}")
    elif args.cmd == "rename":
        cat.rename_table(args.src, args.dst)
        print(f"renamed {args.src} -> {args.dst}")
    elif args.cmd == "set-property":
        table().set_properties({args.key: args.value})
        print(f"set {args.key}={args.value}")
    elif args.cmd == "remove-property":
        table().remove_properties(args.key)
        print(f"removed {args.key}")
    elif args.cmd == "compact":
        spark_cat = SqliteCatalog(args.catalog, args.warehouse, spark=_spark())
        spark_cat.load_table(args.identifier).compact()
        print(f"compacted {args.identifier}")
    elif args.cmd == "zorder":
        spark_cat = SqliteCatalog(args.catalog, args.warehouse, spark=_spark())
        cols = [c.strip() for c in args.columns.split(",") if c.strip()]
        spark_cat.load_table(args.identifier).rewrite_zorder(cols, bits=args.bits)
        print(f"z-ordered {args.identifier} on {cols}")
    elif args.cmd == "clone":
        cat.clone_table(args.src, args.dst, snapshot_id=args.snapshot_id)
        print(f"cloned {args.src} -> {args.dst} (metadata only)")
    elif args.cmd == "create-branch":
        t = table_for(args.identifier)
        sid = args.snapshot_id or t.current_snapshot().snapshot_id
        t.manage_snapshots().create_branch(sid, args.branch).commit()
        print(f"branch {args.branch} -> {sid}")
    elif args.cmd == "create-tag":
        t = table_for(args.identifier)
        sid = args.snapshot_id or t.current_snapshot().snapshot_id
        t.manage_snapshots().create_tag(sid, args.tag).commit()
        print(f"tag {args.tag} -> {sid}")
    elif args.cmd == "publish":
        t = table_for(args.identifier)
        t.manage_snapshots().set_current_snapshot(ref_name=args.branch).commit()
        print(f"published {args.branch} to main")
    elif args.cmd == "rewrite-manifests":
        t = table_for(args.identifier)
        n = t.rewrite_manifests()
        print(f"rewrote manifests: {n if n else 'already consolidated'}")
    elif args.cmd == "expire-snapshots":
        spark_cat = SqliteCatalog(args.catalog, args.warehouse, spark=_spark())
        removed = spark_cat.load_table(args.identifier).expire_snapshots().expire_older_than(
            args.older_than_ms
        ).commit()
        print(f"expired; removed {len(removed)} orphaned files")
    elif args.cmd == "curate":
        from .pipeline import curate_corpus

        spark_cat = SqliteCatalog(args.catalog, args.warehouse, spark=_spark())
        docs = spark_cat.load_table(args.identifier).scan().to_df()
        res = curate_corpus(
            docs,
            id_col=args.id_col,
            text_col=args.text_col,
            source_col=args.source_col,
            train_token_budget=args.token_budget,
            seq_len=args.seq_len,
            quality_flags=[f.strip() for f in args.quality_flags.split(",") if f.strip()] if args.quality_flags else None,
            catalog=spark_cat,
            dest_prefix=args.dest_prefix,
        )
        for k, v in res["stats"].items():
            print(f"{k}\t{v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
