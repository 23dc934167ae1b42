"""Replication monitoring — the ``replication-status`` / ``replication-wait``
CLI analogs (bin/hbase-indexer:240; ReplicationStatusCli / ReplicationWaitCli,
hbase-sep/hbase-sep-tools/.../monitoring/ReplicationStatusRetriever).

The reference inspects HBase replication queues in ZK to report, per peer
(= per indexer subscription), how many WAL entries are still queued and
whether the consumer is caught up.  Here the "replication queue" is the
event file-drop directory and the consumed position is the Structured
Streaming checkpoint's FileStreamSource log, so status is pure filesystem
metadata — no SparkSession needed (it must be runnable from an offline CLI
while the server owns the session, like the reference's client commands).

Index doc counts come from parquet footer metadata via pyarrow (no scan).
"""

from __future__ import annotations

import json
import os
import time

from hbase_indexer_spark.lifecycle import IndexerModel


def checkpoint_processed_files(checkpoint_path: str) -> set[str]:
    """Files already committed by the FileStreamSource, parsed from the
    checkpoint's ``sources/0`` compact/delta logs (one JSON entry per seen
    file, v1 format)."""
    src_dir = os.path.join(checkpoint_path, "sources", "0")
    seen: set[str] = set()
    try:
        batch_files = os.listdir(src_dir)
    except FileNotFoundError:
        return seen
    for fn in batch_files:
        # batch logs are named "<n>" or "<n>.compact"; skip Hadoop .crc
        # checksum files and anything else binary
        if not fn.split(".")[0].isdigit():
            continue
        p = os.path.join(src_dir, fn)
        if not os.path.isfile(p):
            continue
        with open(p, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or not line.startswith("{"):
                    continue  # version header like "v1"
                try:
                    entry = json.loads(line)
                except json.JSONDecodeError:
                    continue
                path = entry.get("path")
                if path:
                    # stored as file:///abs/path
                    seen.add(os.path.basename(path))
    return seen


def _pending_event_files(events_path: str, processed: set[str]) -> list[str]:
    try:
        names = os.listdir(events_path)
    except FileNotFoundError:
        return []
    return sorted(
        n for n in names
        if n.endswith((".parquet", ".json", ".csv"))
        and not n.startswith(("_", "."))
        and n not in processed
    )


def _index_doc_count(index_path: str) -> int | None:
    """Published doc count from parquet footers (go-live ``_CURRENT``
    pointer, IndexStore layout) — metadata only, no data scan."""
    current = os.path.join(index_path, "_CURRENT")
    try:
        with open(current) as f:
            v = int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None
    vdir = os.path.join(index_path, f"v={v}")
    try:
        import pyarrow.parquet as pq
        total = 0
        for fn in os.listdir(vdir):
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(vdir, fn)).metadata.num_rows
        return total
    except (ImportError, FileNotFoundError):
        return None


def replication_status(model_dir: str, work_dir: str,
                       events_path: str) -> list[dict]:
    """Per-indexer consumption status (the ReplicationStatusCli report):
    queue depth (pending event files), consumed count, published docs."""
    model = IndexerModel(model_dir)
    out = []
    for d in model.list():
        base = os.path.join(work_dir, d.name)
        processed = checkpoint_processed_files(os.path.join(base, "checkpoint"))
        pending = _pending_event_files(events_path, processed)
        out.append({
            "name": d.name,
            "lifecycle_state": d.lifecycle_state,
            "incremental_state": d.incremental_state,
            "batch_build_state": d.batch_build_state,
            "processed_files": len(processed),
            "pending_files": len(pending),
            "pending": pending,
            "index_docs": _index_doc_count(os.path.join(base, "index")),
            "caught_up": not pending,
        })
    return out


def replication_wait(model_dir: str, work_dir: str, events_path: str,
                     timeout_s: float = 300.0, poll_s: float = 1.0) -> bool:
    """Block until every indexer's queue is drained (ReplicationWaitCli:
    polls until the replication queues are empty).  Returns True if caught
    up within the timeout."""
    deadline = time.monotonic() + timeout_s
    while True:
        statuses = replication_status(model_dir, work_dir, events_path)
        if all(s["caught_up"] for s in statuses
               if s["incremental_state"] == "SUBSCRIBE_AND_CONSUME"):
            return True
        if time.monotonic() >= deadline:
            return False
        time.sleep(poll_s)
