"""CLI — the reference's command surface over the Spark engine.

Mirrors /root/reference/geostore/cli.py: ``dataset create|get|list|
update|delete`` and ``version create|status`` subcommands, the same
``{status_code, body}`` response envelope underneath, and the same exit
codes (cli.py:56-62, 224-245): 0 success, 1 unknown error, 2 usage error
(argparse's own), 3 conflict. The reference's Lambda ``invoke`` process
boundary collapses to an in-process call; its AWS-credential exit codes
(4/5) have no equivalent here.

Usage:
    python -m geostore_spark.cli dataset create --title My_Dataset
    python -m geostore_spark.cli version create --dataset-id <id> \
        --metadata-url /data/collection.json
"""

from __future__ import annotations

import argparse
import json
import sys

EXIT_SUCCESS = 0
EXIT_UNKNOWN = 1
# 2 = argparse usage error
EXIT_CONFLICT = 3

_OK = (200, 201, 204)


def _finish(resp: dict) -> int:
    status = resp["status_code"]
    if status in _OK:
        if resp["body"] not in ({}, None):
            print(json.dumps(resp["body"], indent=2, default=str))
        return EXIT_SUCCESS
    if status == 409:
        print(resp["body"].get("message", "conflict"), file=sys.stderr)
        return EXIT_CONFLICT
    print(json.dumps(resp["body"], default=str), file=sys.stderr)
    return EXIT_UNKNOWN


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="geostore-spark")
    p.add_argument("--store", default="./geostore_store", help="metadata store root")
    p.add_argument("--storage", default="./geostore_storage", help="asset storage root")
    sub = p.add_subparsers(dest="group", required=True)

    ds = sub.add_parser("dataset").add_subparsers(dest="cmd", required=True)
    c = ds.add_parser("create")
    c.add_argument("--title", required=True)
    g = ds.add_parser("get")
    g.add_argument("--id")
    g.add_argument("--title")
    ds.add_parser("list")
    u = ds.add_parser("update")
    u.add_argument("--id", required=True)
    u.add_argument("--title", required=True)
    d = ds.add_parser("delete")
    d.add_argument("--id", required=True)

    ver = sub.add_parser("version").add_subparsers(dest="cmd", required=True)
    vc = ver.add_parser("create")
    vc.add_argument("--dataset-id", required=True)
    vc.add_argument("--metadata-url", required=True)
    vs = ver.add_parser("status")
    vs.add_argument("--execution-id", required=True)

    q = sub.add_parser("query").add_subparsers(dest="cmd", required=True)
    q.add_parser("list")
    for cmd in ("run", "explain"):
        qc = q.add_parser(cmd)
        qc.add_argument("name", help="registered query key (see `query list`)")
        qc.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if cmd == "run":
            qc.add_argument("--limit", type=int, default=20, help="rows to print")

    # table administration over the snapshot store (Delta-maintenance shape)
    tb = sub.add_parser("table").add_subparsers(dest="cmd", required=True)
    th = tb.add_parser("history")
    th.add_argument("name", help="store table (e.g. datasets, catalog)")
    tc = tb.add_parser("compact")
    tc.add_argument("name")
    tc.add_argument("--target-files", type=int, default=1)
    tc.add_argument(
        "--cluster-by", nargs="+", default=None, metavar="COL",
        help="sort rows on these columns before the rewrite",
    )
    tc.add_argument(
        "--zorder-by", nargs=2, default=None, metavar=("X", "Y"),
        help="Morton-interleave two integer columns as the sort key",
    )
    tv = tb.add_parser("vacuum")
    tv.add_argument("name")
    tv.add_argument("--keep-last", type=int, default=1)
    ts = tb.add_parser("show")
    ts.add_argument("name")
    ts.add_argument("--version", type=int, default=None, help="time travel")
    ts.add_argument("--limit", type=int, default=20)
    tch = tb.add_parser("changes")
    tch.add_argument("name")
    tch.add_argument("--from-version", type=int, required=True, dest="from_version")
    tch.add_argument("--to-version", type=int, default=None, dest="to_version")
    tch.add_argument("--limit", type=int, default=50)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.group == "query" and args.cmd == "list":
        # no SparkSession needed to enumerate the registry
        from geostore_spark.registry import all_queries

        for key, rq in sorted(all_queries().items()):
            print(f"{key}\t{rq.doc.splitlines()[0]}")
        return EXIT_SUCCESS

    from geostore_spark.api import datasets as ds_api
    from geostore_spark.session import build_session
    from geostore_spark.sources.store import MetadataStore

    spark = build_session(app_name="geostore-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.group == "query":  # cmd in {"run", "explain"}
        from geostore_spark.registry import all_queries

        reg = all_queries()
        if args.name not in reg:
            print(f"unknown query: {args.name} (see `query list`)", file=sys.stderr)
            return EXIT_UNKNOWN
        df = reg[args.name].spark(spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return EXIT_SUCCESS

    store = MetadataStore(spark, args.store)

    if args.group == "table":
        if args.cmd == "history":
            print(json.dumps(store.history(args.name), indent=2))
            return EXIT_SUCCESS
        if args.cmd == "compact":
            print(
                json.dumps(
                    store.compact(
                        args.name,
                        args.target_files,
                        cluster_by=args.cluster_by,
                        zorder_by=tuple(args.zorder_by) if args.zorder_by else None,
                    )
                )
            )
            return EXIT_SUCCESS
        if args.cmd == "vacuum":
            print(json.dumps({"removed": store.vacuum(args.name, args.keep_last)}))
            return EXIT_SUCCESS
        if args.cmd == "show":
            store.read(args.name, args.version).show(args.limit, truncate=False)
            return EXIT_SUCCESS
        if args.cmd == "changes":
            store.changes(args.name, args.from_version, args.to_version).show(
                args.limit, truncate=False
            )
            return EXIT_SUCCESS

    if args.group == "dataset":
        if args.cmd == "create":
            return _finish(ds_api.create_dataset(store, args.title))
        if args.cmd == "get":
            return _finish(ds_api.get_dataset(store, args.id, args.title))
        if args.cmd == "list":
            return _finish(ds_api.list_datasets(store))
        if args.cmd == "update":
            return _finish(ds_api.update_dataset(store, args.id, args.title))
        if args.cmd == "delete":
            return _finish(ds_api.delete_dataset(store, args.id, args.storage))

    if args.group == "version":
        from geostore_spark.pipeline.ingest import create_dataset_version, get_import_status

        if args.cmd == "create":
            return _finish(
                create_dataset_version(
                    spark, store, args.dataset_id, args.metadata_url, args.storage
                )
            )
        if args.cmd == "status":
            return _finish(get_import_status(store, args.execution_id))

    return EXIT_UNKNOWN  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())
