"""Command-line surface mirroring the reference's ``bin/hbase-indexer``
client commands (bin/hbase-indexer:240-268; AddIndexerCli / UpdateIndexerCli /
DeleteIndexerCli / ListIndexersCli, hbase-indexer-cli/src/main/java/...).

A reference user's workflow

    hbase-indexer add-indexer -n myindexer -c indexerconf.xml
    hbase-indexer list-indexers --dump
    hbase-indexer update-indexer -n myindexer --batch BUILD_REQUESTED
    hbase-indexer delete-indexer -n myindexer

maps verbatim, with ``--model DIR`` standing in for ``--zookeeper`` (the
registry lives in a JSON-file IndexerModel instead of ZK znodes —
IndexerModelImpl.java; same optimistic-concurrency semantics).

Commands only mutate/read the model; a running :class:`IndexerSupervisor`
(the server analog) reconciles on its next ``sync()`` — exactly the
reference split where CLIs write ZK and the leader-elected IndexerMaster
reacts (IndexerMaster.java:434-564).  ``delete-indexer`` therefore marks
``DELETE_REQUESTED`` rather than removing the definition itself
(DeleteIndexerCli.java: sets lifecycle state; master does the teardown).
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict, replace

from hbase_indexer_spark.lifecycle import (
    ACTIVE,
    BUILD_REQUESTED,
    DELETE_REQUESTED,
    DO_NOT_SUBSCRIBE,
    INACTIVE,
    SUBSCRIBE_AND_CONSUME,
    SUBSCRIBE_DO_NOT_CONSUME,
    IndexerDefinition,
    IndexerModel,
)

_INCREMENTAL_STATES = (
    SUBSCRIBE_AND_CONSUME, SUBSCRIBE_DO_NOT_CONSUME, DO_NOT_SUBSCRIBE,
)
_BATCH_STATES = (BUILD_REQUESTED, INACTIVE)

VERSION = "hbase-indexer-spark 1.0 (reference surface v1.6-SNAPSHOT)"


def _load_conf(path: str) -> dict:
    """Accept either a reference-format indexerconf.xml or a JSON conf dict
    (the engine-native form) — sniffed by leading '<'."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if text.lstrip().startswith("<"):
        from hbase_indexer_spark.config.indexer_conf import conf_from_xml
        conf_from_xml(text)  # validate eagerly, like AddOrUpdateIndexerCli
        return {"xml": text}
    conf = json.loads(text)
    from hbase_indexer_spark.config.indexer_conf import IndexerConf
    IndexerConf.from_dict(conf)
    return conf


def _common_update_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-c", "--indexer-conf", metavar="indexerconf.xml",
                   help="indexer configuration (XML or JSON)")
    p.add_argument("--lifecycle", choices=(ACTIVE, DELETE_REQUESTED),
                   help="lifecycle state")
    p.add_argument("--incremental", choices=_INCREMENTAL_STATES,
                   help="incremental indexing state")
    p.add_argument("--batch", choices=_BATCH_STATES,
                   help="batch indexing state (only BUILD_REQUESTED is "
                        "settable, like the reference)")
    p.add_argument("--subscription-ts", type=int, default=None,
                   help="events before this ts are ignored (S2 gate)")
    p.add_argument("--batch-snapshot-path", default=None,
                   help="snapshot parquet for batch rebuilds "
                        "(batch-cli-arguments analog)")


def _apply_updates(d: IndexerDefinition, args) -> IndexerDefinition:
    if args.indexer_conf:
        d = replace(d, conf=_load_conf(args.indexer_conf))
    if args.batch_snapshot_path:
        d = replace(d, conf={**d.conf,
                             "batch_snapshot_path": args.batch_snapshot_path})
    if args.lifecycle:
        d = replace(d, lifecycle_state=args.lifecycle)
    if args.incremental:
        d = replace(d, incremental_state=args.incremental)
    if args.batch:
        d = replace(d, batch_build_state=args.batch)
    if args.subscription_ts is not None:
        d = replace(d, subscription_ts=args.subscription_ts)
    return d


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="hbase-indexer",
        description="Spark-native analog of the reference CLI "
                    "(bin/hbase-indexer client commands)")
    ap.add_argument("--model", default=".indexer-model",
                    help="registry directory (the --zookeeper analog)")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("add-indexer", help="define a new indexer")
    p.add_argument("-n", "--name", required=True)
    _common_update_args(p)

    p = sub.add_parser("update-indexer", help="update an existing indexer")
    p.add_argument("-n", "--name", required=True)
    _common_update_args(p)

    p = sub.add_parser("delete-indexer",
                       help="request deletion (supervisor tears down)")
    p.add_argument("-n", "--name", required=True)

    p = sub.add_parser("list-indexers", help="list defined indexers")
    p.add_argument("--dump", action="store_true",
                   help="print full definitions as JSON")

    for cmd, h in [("replication-status",
                    "per-indexer queue depth / consumed position"),
                   ("replication-wait",
                    "block until all consumption queues are drained")]:
        p = sub.add_parser(cmd, help=h)
        p.add_argument("--work-dir", required=True,
                       help="supervisor work directory")
        p.add_argument("--events", required=True,
                       help="event file-drop directory")
        if cmd == "replication-wait":
            p.add_argument("--timeout", type=float, default=300.0)
            p.add_argument("--poll", type=float, default=1.0)

    p = sub.add_parser(
        "server",
        help="run the master/supervisor reconcile loop (the Main.java "
             "server process: watch the model, start/stop streams, serve "
             "batch builds)")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--events", required=True,
                   help="event file-drop directory (the SEP source)")
    p.add_argument("--poll", type=float, default=5.0,
                   help="seconds between reconcile passes")
    p.add_argument("--once", action="store_true",
                   help="single reconcile pass, then exit (for scripting)")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--events-format", default="parquet",
                   choices=("parquet", "json", "csv"),
                   help="event file format (binary values ride base64 in "
                        "the text formats)")
    p.add_argument("--rest-port", type=int, default=None,
                   help="also serve the REST control plane on this port "
                        "(the embedded jetty IndexerResource analog; "
                        "0 = ephemeral)")

    p = sub.add_parser(
        "batch-indexer",
        help="standalone batch index build from a snapshot (the "
             "hbase-indexer-mr HBaseMapReduceIndexerTool analog)")
    p.add_argument("--hbase-indexer-file", required=True,
                   metavar="indexerconf.xml",
                   help="indexer conf (XML or JSON), no registry needed")
    p.add_argument("--input", required=True,
                   help="snapshot parquet of canonical cells (the scan)")
    p.add_argument("--output-dir", default=None,
                   help="index destination (direct-write IndexStore, or "
                        "shard directories with --shards)")
    p.add_argument("--shards", type=int, default=0,
                   help="offline mode: build N shard directories "
                        "(reducers>0); 0 = direct-write mode")
    p.add_argument("--dry-run", action="store_true",
                   help="print the first docs instead of writing "
                        "(IndexerDryRun)")
    p.add_argument("--hbase-start-time", default=None,
                   help="scan time-range lower bound (epoch ms, or a "
                        "string per --hbase-timestamp-format)")
    p.add_argument("--hbase-end-time", default=None,
                   help="scan time-range upper bound (exclusive)")
    p.add_argument("--hbase-timestamp-format", default=None,
                   help="SimpleDateFormat-style pattern for the time "
                        "bounds, e.g. 'yyyy/MM/dd HH:mm:ss' "
                        "(HBaseIndexingOptions --hbase-timestamp-format)")

    sub.add_parser("version", help="print version")
    return ap


def main(argv: list[str] | None = None, out=None) -> int:
    out = out if out is not None else sys.stdout
    args = build_parser().parse_args(argv)
    if args.command == "version":
        print(VERSION, file=out)
        return 0

    model = IndexerModel(args.model)

    if args.command == "add-indexer":
        if model.get(args.name) is not None:
            print(f"Indexer {args.name} already exists", file=out)
            return 1
        if not args.indexer_conf:
            print("add-indexer requires -c/--indexer-conf", file=out)
            return 1
        d = _apply_updates(IndexerDefinition(name=args.name), args)
        model.put(d)
        print(f"Indexer {args.name} added", file=out)
        return 0

    if args.command == "update-indexer":
        d = model.get(args.name)
        if d is None:
            print(f"Indexer {args.name} does not exist", file=out)
            return 1
        model.put(_apply_updates(d, args))
        print(f"Indexer {args.name} updated", file=out)
        return 0

    if args.command == "delete-indexer":
        d = model.get(args.name)
        if d is None:
            print(f"Indexer {args.name} does not exist", file=out)
            return 1
        model.put(replace(d, lifecycle_state=DELETE_REQUESTED))
        print(f"Deletion of indexer {args.name} requested", file=out)
        return 0

    if args.command == "list-indexers":
        defs = model.list()
        print(f"Number of indexes: {len(defs)}", file=out)
        for d in defs:
            print(f"\n{d.name}", file=out)
            print(f"  + Lifecycle state: {d.lifecycle_state}", file=out)
            print(f"  + Incremental indexing state: {d.incremental_state}",
                  file=out)
            print(f"  + Batch indexing state: {d.batch_build_state}", file=out)
            print(f"  + Occ version: {d.occ_version}", file=out)
            if args.dump:
                print("  + Definition:", file=out)
                print("    " + json.dumps(asdict(d), indent=1)
                      .replace("\n", "\n    "), file=out)
        return 0

    if args.command == "server":
        return _server(args, model, out)

    if args.command == "batch-indexer":
        return _batch_indexer(args, out)

    if args.command == "replication-status":
        from hbase_indexer_spark.monitoring import replication_status
        for s in replication_status(args.model, args.work_dir, args.events):
            docs = "-" if s["index_docs"] is None else s["index_docs"]
            print(f"{s['name']}: {s['incremental_state']}, "
                  f"processed {s['processed_files']} file(s), "
                  f"pending {s['pending_files']}, docs {docs}, "
                  f"{'CAUGHT UP' if s['caught_up'] else 'LAGGING'}",
                  file=out)
        return 0

    if args.command == "replication-wait":
        from hbase_indexer_spark.monitoring import replication_wait
        ok = replication_wait(args.model, args.work_dir, args.events,
                              timeout_s=args.timeout, poll_s=args.poll)
        print("caught up" if ok else "timed out", file=out)
        return 0 if ok else 1

    raise AssertionError(f"unhandled command {args.command}")


def _server(args, model: IndexerModel, out) -> int:
    """The server process (Main.java:103-132 startServices): one driver
    owning the SparkSession, reconciling streaming queries and batch
    builds against the model until interrupted."""
    import time as _time

    from hbase_indexer_spark.lifecycle import IndexerSupervisor
    from hbase_indexer_spark.session import get_spark

    spark = get_spark("hbase-indexer-server")
    sup = IndexerSupervisor(spark, model, args.work_dir, args.events,
                            max_files_per_trigger=args.max_files_per_trigger,
                            events_format=args.events_format)
    rest = None
    if args.rest_port is not None:
        from hbase_indexer_spark.rest import IndexerRestServer

        rest = IndexerRestServer(model, sup, port=args.rest_port).start()
        print(f"REST control plane at {rest.url}/indexer", file=out)
    try:
        while True:
            sup.sync(available_now=True)
            if args.once:
                break
            _time.sleep(args.poll)
    except KeyboardInterrupt:
        pass
    finally:
        if rest is not None:
            rest.stop()
        sup.stop_all()
    print("server stopped", file=out)
    return 0


def _batch_indexer(args, out) -> int:
    """The hbase-indexer-mr tool (HBaseMapReduceIndexerTool.java:113-257):
    scan snapshot -> doc build, then either direct-write into the live
    index (reducers==0, :202-223), offline shard build (--shards,
    :224-256), or a dry-run that materializes docs without writing
    (IndexerDryRun short-circuit, :125-127)."""
    conf_dict = _load_conf(args.hbase_indexer_file)
    from hbase_indexer_spark.lifecycle import IndexerDefinition
    conf = IndexerDefinition(name="batch", conf=conf_dict).indexer_conf()

    from hbase_indexer_spark.plans.batch import build_index
    from hbase_indexer_spark.session import get_spark
    spark = get_spark("batch-indexer")
    cells = spark.read.parquet(args.input)
    if args.hbase_start_time is not None or args.hbase_end_time is not None:
        from hbase_indexer_spark.sources.cells import scan_time_range
        cells = scan_time_range(cells, args.hbase_start_time,
                                args.hbase_end_time,
                                ts_format=args.hbase_timestamp_format)
    docs = build_index(cells, conf)

    if args.dry_run:
        from hbase_indexer_spark.streaming.stream import dry_run
        for row in dry_run(docs):
            print(row.asDict(), file=out)
        return 0
    if args.output_dir is None:
        print("batch-indexer requires --output-dir (or --dry-run)", file=out)
        return 1
    if args.shards > 0:
        from hbase_indexer_spark.sinks.sharding import write_sharded
        write_sharded(docs, args.output_dir, conf.unique_key_field,
                      args.shards)
        print(f"built {args.shards} shard(s) at {args.output_dir}", file=out)
    else:
        from hbase_indexer_spark.sinks.index_store import IndexStore
        store = IndexStore(args.output_dir, key=conf.unique_key_field)
        store.overwrite(docs, spark)
        print(f"index published at {args.output_dir} "
              f"(version {store.current_version()})", file=out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
