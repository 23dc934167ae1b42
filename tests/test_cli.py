"""CLI tests — the bin/hbase-indexer client-command surface
(AddIndexerCli / UpdateIndexerCli / DeleteIndexerCli / ListIndexersCli;
bin/hbase-indexer:240-268).  A reference user's add/update/delete/list
workflow against a conf XML file must work verbatim, and the supervisor
must pick up CLI-made state changes on its next sync."""

import io
import os

import pytest

from hbase_indexer_spark.cli import main
from hbase_indexer_spark.lifecycle import (
    BUILD_COMPLETED,
    BUILD_REQUESTED,
    DELETE_REQUESTED,
    DO_NOT_SUBSCRIBE,
    IndexerModel,
    IndexerSupervisor,
)

XML = """<indexer table="t">
  <field name="name_s" value="info:name"/>
  <field name="age_i" value="info:age" type="int"/>
</indexer>"""


def run(model_dir, *argv):
    out = io.StringIO()
    rc = main(["--model", str(model_dir), *argv], out=out)
    return rc, out.getvalue()


@pytest.fixture()
def conf_file(tmp_path):
    p = tmp_path / "indexerconf.xml"
    p.write_text(XML)
    return str(p)


def test_add_list_update_delete_roundtrip(tmp_path, conf_file):
    model_dir = tmp_path / "model"

    rc, out = run(model_dir, "add-indexer", "-n", "ix1", "-c", conf_file)
    assert rc == 0 and "added" in out

    # duplicate add refuses, like AddIndexerCli
    rc, out = run(model_dir, "add-indexer", "-n", "ix1", "-c", conf_file)
    assert rc == 1 and "already exists" in out

    model = IndexerModel(str(model_dir))
    d = model.get("ix1")
    conf = d.indexer_conf()
    assert [f.name for f in conf.fields] == ["name_s", "age_i"]
    assert d.occ_version == 0

    rc, out = run(model_dir, "list-indexers", "--dump")
    assert rc == 0
    assert "Number of indexes: 1" in out
    assert "ix1" in out and "SUBSCRIBE_AND_CONSUME" in out

    rc, _ = run(model_dir, "update-indexer", "-n", "ix1",
                "--batch", BUILD_REQUESTED, "--incremental", DO_NOT_SUBSCRIBE)
    assert rc == 0
    d = model.get("ix1")
    assert d.batch_build_state == BUILD_REQUESTED
    assert d.incremental_state == DO_NOT_SUBSCRIBE
    assert d.occ_version == 1

    # delete marks DELETE_REQUESTED; the definition survives until a
    # supervisor tears it down (DeleteIndexerCli semantics)
    rc, _ = run(model_dir, "delete-indexer", "-n", "ix1")
    assert rc == 0
    assert model.get("ix1").lifecycle_state == DELETE_REQUESTED

    rc, out = run(model_dir, "update-indexer", "-n", "missing")
    assert rc == 1 and "does not exist" in out
    rc, out = run(model_dir, "delete-indexer", "-n", "missing")
    assert rc == 1 and "does not exist" in out


def test_json_conf_and_validation(tmp_path):
    model_dir = tmp_path / "model"
    p = tmp_path / "conf.json"
    p.write_text('{"table": "t", "fields": [{"name": "n_s", "value": "f:q"}]}')
    rc, _ = run(model_dir, "add-indexer", "-n", "jx", "-c", str(p))
    assert rc == 0
    assert IndexerModel(str(model_dir)).get("jx").indexer_conf().table == "t"

    bad = tmp_path / "bad.xml"
    bad.write_text("<notindexer/>")
    with pytest.raises(ValueError):
        run(model_dir, "add-indexer", "-n", "bad", "-c", str(bad))


def test_version(tmp_path):
    rc, out = run(tmp_path / "m", "version")
    assert rc == 0 and "hbase-indexer-spark" in out


def test_cli_drives_supervisor_batch_build(spark, tmp_path, conf_file):
    """End-to-end control plane: CLI add-indexer from an XML file +
    update-indexer --batch BUILD_REQUESTED, then a supervisor sync runs the
    rebuild and publishes — the CLI→ZK→IndexerMaster flow collapsed onto
    the JSON model (IndexerMaster.java:288-329)."""
    model_dir = tmp_path / "model"
    cells = spark.createDataFrame(
        [("t", "r1", "info", "name", 1, "put", b"alice"),
         ("t", "r1", "info", "age", 1, "put", (30).to_bytes(4, "big")),
         ("t", "r2", "info", "name", 1, "put", b"bob")],
        "table string, row string, family string, qualifier string, "
        "ts long, op string, value binary",
    )
    snap = str(tmp_path / "snapshot")
    cells.write.parquet(snap)

    rc, _ = run(model_dir, "add-indexer", "-n", "ix1", "-c", conf_file,
                "--incremental", DO_NOT_SUBSCRIBE,
                "--batch-snapshot-path", snap)
    assert rc == 0
    rc, _ = run(model_dir, "update-indexer", "-n", "ix1",
                "--batch", BUILD_REQUESTED)
    assert rc == 0

    src = str(tmp_path / "events")
    os.makedirs(src)
    sup = IndexerSupervisor(spark, IndexerModel(str(model_dir)),
                            str(tmp_path / "work"), src)
    sup.sync()

    model = IndexerModel(str(model_dir))
    assert model.get("ix1").batch_build_state == BUILD_COMPLETED
    got = {r["id"]: (r["name_s"], r["age_i"])
           for r in sup.read_index("ix1").collect()}
    assert got == {"r1": ("alice", 30), "r2": ("bob", None)}

    rc, _ = run(model_dir, "delete-indexer", "-n", "ix1")
    assert rc == 0
    sup.sync()
    assert model.get("ix1") is None


def test_replication_status_and_wait(spark, tmp_path, conf_file):
    """replication-status / replication-wait analogs: queue depth is read
    from the events dir vs the streaming checkpoint's FileStreamSource log
    (the ZK replication-queue inspection, ReplicationStatusCli), with no
    SparkSession in the client."""
    from hbase_indexer_spark.monitoring import (
        replication_status,
        replication_wait,
    )

    model_dir = str(tmp_path / "model")
    work_dir = str(tmp_path / "work")
    src = str(tmp_path / "events")
    os.makedirs(src)

    # reference-shaped conf targets table "t"; ship one WAL batch file
    rc, _ = run(model_dir, "add-indexer", "-n", "ix1", "-c", conf_file)
    assert rc == 0
    df = spark.createDataFrame(
        [(1, 1, "t", "r1", "info", "name", 1, "put", b"alice")],
        "seq long, event_ts long, table string, row string, family string, "
        "qualifier string, ts long, op string, value binary",
    )
    stage = str(tmp_path / "stage")
    df.coalesce(1).write.parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.rename(os.path.join(stage, part), os.path.join(src, "c0.parquet"))

    # before any consumption: one pending file, nothing processed
    (s,) = replication_status(model_dir, work_dir, src)
    assert s["pending_files"] == 1 and s["processed_files"] == 0
    assert not s["caught_up"]
    assert not replication_wait(model_dir, work_dir, src, timeout_s=0.1,
                                poll_s=0.05)

    sup = IndexerSupervisor(spark, IndexerModel(model_dir), work_dir, src)
    sup.sync()

    (s,) = replication_status(model_dir, work_dir, src)
    assert s["caught_up"] and s["processed_files"] == 1
    assert s["pending_files"] == 0
    assert s["index_docs"] == 1
    assert replication_wait(model_dir, work_dir, src, timeout_s=1)

    rc, out = run(model_dir, "replication-status",
                  "--work-dir", work_dir, "--events", src)
    assert rc == 0 and "CAUGHT UP" in out
    rc, out = run(model_dir, "replication-wait",
                  "--work-dir", work_dir, "--events", src, "--timeout", "1")
    assert rc == 0 and "caught up" in out


def test_batch_indexer_tool(spark, tmp_path, conf_file):
    """batch-indexer (HBaseMapReduceIndexerTool analog): dry-run,
    direct-write, and offline sharded modes from a conf XML + snapshot."""
    cells = spark.createDataFrame(
        [("t", f"r{i}", "info", "name", 1, "put", f"user{i}".encode())
         for i in range(20)],
        "table string, row string, family string, qualifier string, "
        "ts long, op string, value binary",
    )
    snap = str(tmp_path / "snap")
    cells.write.parquet(snap)

    rc, out = run(tmp_path / "m", "batch-indexer",
                  "--hbase-indexer-file", conf_file, "--input", snap,
                  "--dry-run")
    assert rc == 0 and "user" in out and len(out.strip().splitlines()) == 20

    # direct-write mode publishes a readable IndexStore
    idx = str(tmp_path / "index")
    rc, out = run(tmp_path / "m", "batch-indexer",
                  "--hbase-indexer-file", conf_file, "--input", snap,
                  "--output-dir", idx)
    assert rc == 0 and "version 0" in out
    from hbase_indexer_spark.sinks.index_store import IndexStore
    assert IndexStore(idx, key="id").read(spark).count() == 20

    # offline mode: one directory per shard, every doc routed
    sharded = str(tmp_path / "shards")
    rc, out = run(tmp_path / "m", "batch-indexer",
                  "--hbase-indexer-file", conf_file, "--input", snap,
                  "--output-dir", sharded, "--shards", "4")
    assert rc == 0
    back = spark.read.parquet(sharded)
    assert back.count() == 20
    assert sorted(r["shard"] for r in back.select("shard").distinct()
                  .collect()) == sorted(set(
        r["shard"] for r in back.collect()))

    # missing output without dry-run refuses
    rc, out = run(tmp_path / "m", "batch-indexer",
                  "--hbase-indexer-file", conf_file, "--input", snap)
    assert rc == 1 and "--output-dir" in out


def test_batch_indexer_time_range_with_format(spark, tmp_path, conf_file):
    """--hbase-start-time/--hbase-end-time with --hbase-timestamp-format
    (HBaseIndexingOptions.java:232-252,522-545): the scan bound strings
    parse through the SimpleDateFormat pattern before the ts pushdown."""
    cells = spark.createDataFrame(
        [("t", f"r{i}", "info", "name", 1382229540000 + i * 60000, "put",
          f"user{i}".encode()) for i in range(5)],
        "table string, row string, family string, qualifier string, "
        "ts long, op string, value binary",
    )
    snap = str(tmp_path / "snap_ts")
    cells.write.parquet(snap)
    rc, out = run(tmp_path / "m", "batch-indexer",
                  "--hbase-indexer-file", conf_file, "--input", snap,
                  "--hbase-start-time", "2013/10/20 00:40:00",
                  "--hbase-end-time", "2013/10/20 00:42:00",
                  "--hbase-timestamp-format", "yyyy/MM/dd HH:mm:ss",
                  "--dry-run")
    assert rc == 0 and len(out.strip().splitlines()) == 2  # rows 1,2 only


def test_server_once(spark, tmp_path, conf_file):
    """server --once: one reconcile pass consumes pending events and
    publishes, sharing the test session via getOrCreate."""
    model_dir = str(tmp_path / "model")
    work_dir = str(tmp_path / "work")
    src = str(tmp_path / "events")
    os.makedirs(src)
    rc, _ = run(model_dir, "add-indexer", "-n", "ix1", "-c", conf_file)
    assert rc == 0
    df = spark.createDataFrame(
        [(1, 1, "t", "r1", "info", "name", 1, "put", b"alice")],
        "seq long, event_ts long, table string, row string, family string, "
        "qualifier string, ts long, op string, value binary",
    )
    stage = str(tmp_path / "stage")
    df.coalesce(1).write.parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.rename(os.path.join(stage, part), os.path.join(src, "c0.parquet"))

    rc, out = run(model_dir, "server", "--work-dir", work_dir,
                  "--events", src, "--once")
    assert rc == 0 and "server stopped" in out
    from hbase_indexer_spark.monitoring import replication_status
    (s,) = replication_status(model_dir, work_dir, src)
    assert s["caught_up"] and s["index_docs"] == 1


def test_server_consumes_json_events(spark, tmp_path, conf_file):
    """--events-format json: the supervisor consumes text-format WAL drops
    end-to-end."""
    model_dir = str(tmp_path / "model")
    src = str(tmp_path / "events")
    os.makedirs(src)
    rc, _ = run(model_dir, "add-indexer", "-n", "ix1", "-c", conf_file)
    assert rc == 0
    spark.createDataFrame(
        [(1, 1, "t", "r1", "info", "name", 1, "put", b"alice")],
        "seq long, event_ts long, table string, row string, family string, "
        "qualifier string, ts long, op string, value binary",
    ).coalesce(1).write.mode("append").json(src)

    work_dir = str(tmp_path / "work")
    rc, out = run(model_dir, "server", "--work-dir", work_dir,
                  "--events", src, "--events-format", "json", "--once")
    assert rc == 0
    sup = IndexerSupervisor(spark, IndexerModel(model_dir), work_dir, src)
    assert {r["id"]: r["name_s"] for r in sup.read_index("ix1").collect()} \
        == {"r1": "alice"}


def test_server_once_with_rest_port(spark, tmp_path, conf_file):
    """server --rest-port: the REST control plane serves the model during
    the reconcile loop (embedded IndexerResource analog)."""
    import json as _json
    import threading
    import urllib.request

    from hbase_indexer_spark import cli as cli_mod

    model_dir = str(tmp_path / "model")
    src = str(tmp_path / "events")
    os.makedirs(src)
    rc, _ = run(model_dir, "add-indexer", "-n", "ix1", "-c", conf_file)
    assert rc == 0

    # capture the ephemeral port by intercepting the server object
    from hbase_indexer_spark.rest import IndexerRestServer

    started = {}
    orig_start = IndexerRestServer.start

    def capture_start(self):
        started["srv"] = self
        # probe the API from a thread while the (single-pass) loop runs
        def probe():
            with urllib.request.urlopen(f"{self.url}/indexer") as r:
                started["defs"] = _json.loads(r.read())
        started["t"] = threading.Thread(target=probe)
        out = orig_start(self)
        started["t"].start()
        return out

    IndexerRestServer.start = capture_start
    try:
        rc, out = run(model_dir, "server", "--work-dir",
                      str(tmp_path / "work"), "--events", src, "--once",
                      "--rest-port", "0")
    finally:
        IndexerRestServer.start = orig_start
    started["t"].join(timeout=10)
    assert rc == 0 and "REST control plane at" in out
    assert [d["name"] for d in started["defs"]] == ["ix1"]
