"""REST control plane — the IndexerResource surface over the JSON-file model.

The reference embeds a Jetty/JAX-RS resource in its server process
(hbase-indexer-server/.../rest/IndexerResource.java:62-209) exposing the
indexer registry plus a point re-index trigger.  This is the stdlib
``http.server`` analog, bound to the same :class:`IndexerModel` /
:class:`IndexerSupervisor` pair the CLI and server loop use:

- ``GET  /indexer``                     all definitions (IndexerResource.java:68-74)
- ``GET  /indexer/{name}``              one definition (:77-84)
- ``GET  /indexer/{name}/config``       ``{occVersion, config}`` (:87-100)
- ``PUT  /indexer/{name}``              conditional update, optimistic
  concurrency via occ_version (:103-135; 409 on version conflict, the
  ConcurrentModificationError analog)
- ``POST /indexer/{name}?action=index&id=R[&table=T]``  re-index one row
  (:140-159): re-read the row from the snapshot source and MERGE the
  rebuilt documents — the set-oriented form of ``Indexer.indexRowData``
- ``POST /indexer?action=index&indexes=a,b&id=R``  fan-out over the named
  (or all running) indexers (:173-188)

Single-driver deployment: the server runs on a daemon thread next to the
supervisor; no ZK, no servlet container.  Spark work happens on the
driver's SparkSession exactly as a CLI verb would.
"""

from __future__ import annotations

import json
import threading
from dataclasses import asdict, replace
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import functions as F

from hbase_indexer_spark.lifecycle import (
    ConcurrentModificationError,
    IndexerDefinition,
    IndexerModel,
    IndexerSupervisor,
)

# definition fields a PUT body may set (everything except name/occ_version,
# which come from the path and the stored definition respectively)
_MUTABLE_FIELDS = (
    "conf", "lifecycle_state", "incremental_state", "batch_build_state",
    "subscription_ts",
)


class IndexerRestServer:
    """Threaded HTTP server over a model (+ optional supervisor for the
    POST re-index action).  ``port=0`` binds an ephemeral port."""

    def __init__(self, model: IndexerModel,
                 supervisor: IndexerSupervisor | None = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.model = model
        self.supervisor = supervisor
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # quiet: unit tests and embedded runs don't want stderr access logs
            def log_message(self, fmt, *args):  # noqa: D102
                pass

            def _send(self, code: int, payload=None) -> None:
                body = b"" if payload is None else json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _route(self):
                u = urlparse(self.path)
                parts = [p for p in u.path.split("/") if p]
                return parts, {k: v[0] for k, v in parse_qs(u.query).items()}

            def do_GET(self):  # noqa: N802
                parts, _ = self._route()
                if parts == ["indexer"]:
                    return self._send(200, [asdict(d) for d in outer.model.list()])
                if len(parts) == 2 and parts[0] == "indexer":
                    d = outer.model.get(parts[1])
                    if d is None:
                        return self._send(404, {"error": f"indexer {parts[1]!r} not found"})
                    return self._send(200, asdict(d))
                if len(parts) == 3 and parts[0] == "indexer" and parts[2] == "config":
                    d = outer.model.get(parts[1])
                    if d is None:
                        return self._send(404, {"error": f"indexer {parts[1]!r} not found"})
                    # the reference returns the raw stored config bytes plus
                    # the occ version (IndexerResource.java:92-99)
                    return self._send(200, {"occVersion": d.occ_version,
                                            "config": json.dumps(d.conf)})
                return self._send(404, {"error": "no such route"})

            def do_PUT(self):  # noqa: N802
                parts, _ = self._route()
                if not (len(parts) == 2 and parts[0] == "indexer"):
                    return self._send(404, {"error": "no such route"})
                name = parts[1]
                old = outer.model.get(name)
                if old is None:
                    return self._send(404, {"error": f"indexer {name!r} not found"})
                n = int(self.headers.get("Content-Length", "0"))
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError as exc:
                    return self._send(400, {"error": f"bad JSON body: {exc}"})
                unknown = set(body) - set(_MUTABLE_FIELDS) - {"occ_version"}
                if unknown:
                    return self._send(400, {"error": f"unknown fields: {sorted(unknown)}"})
                # start from the stored definition, overlay the body —
                # IndexerDefinitionBuilder.startFrom(oldIndexer) semantics.
                # occ_version defaults to the stored one (last-write-wins
                # unless the client opts into a conditional update).
                d = replace(old, **{k: body[k] for k in _MUTABLE_FIELDS if k in body})
                d = replace(d, occ_version=body.get("occ_version", old.occ_version))
                try:
                    new = outer.model.put(d)
                except ConcurrentModificationError as exc:
                    return self._send(409, {"error": str(exc)})
                return self._send(200, asdict(new))

            def do_DELETE(self):  # noqa: N802
                # convenience verb (r9): the reference deletes through
                # PUT lifecycleState=DELETE_REQUESTED (IndexerResource
                # .java:117-131 + IndexerMaster's delete handler); this
                # routes the same lifecycle transition — the supervisor
                # drops the job/state asynchronously, so 202, not 204.
                parts, _ = self._route()
                if not (len(parts) == 2 and parts[0] == "indexer"):
                    return self._send(404, {"error": "no such route"})
                name = parts[1]
                old = outer.model.get(name)
                if old is None:
                    return self._send(404, {"error": f"indexer {name!r} not found"})
                from hbase_indexer_spark.lifecycle import DELETE_REQUESTED

                try:
                    new = outer.model.put(
                        replace(old, lifecycle_state=DELETE_REQUESTED))
                except ConcurrentModificationError as exc:
                    return self._send(409, {"error": str(exc)})
                return self._send(202, asdict(new))

            def do_POST(self):  # noqa: N802
                parts, q = self._route()
                if q.get("action") != "index":
                    return self._send(400, {"error": f"Unsupported POST action: {q.get('action')}"})
                if "id" not in q:
                    return self._send(400, {"error": "missing id parameter"})
                if parts == ["indexer"]:
                    names = [s.strip() for s in q.get("indexes", "").split(",") if s.strip()]
                    if not names:
                        if outer.supervisor is None:
                            return self._send(503, {"error": "no supervisor attached"})
                        names = sorted(outer.supervisor.jobs)
                elif len(parts) == 2 and parts[0] == "indexer":
                    names = [parts[1]]
                else:
                    return self._send(404, {"error": "no such route"})
                done = []
                for name in names:
                    err, code = outer._reindex_row(name, q["id"], q.get("table"))
                    if err is not None:
                        return self._send(code, {"error": err})
                    done.append(name)
                return self._send(200, {"indexed": done, "id": q["id"]})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # -- point re-index (the Indexer.indexRowData analog) -------------------

    def _reindex_row(self, name: str, row_id: str,
                     table: str | None) -> tuple[str | None, int]:
        """Rebuild and MERGE the documents for one row: re-read the row from
        the definition's snapshot source (our scan analog of an HBase point
        Get), run the batch extraction on just those cells, and upsert.
        Returns (error, http_status)."""
        d = self.model.get(name)
        if d is None:
            return f"indexer {name!r} not found", 404
        if self.supervisor is None:
            return "no supervisor attached", 503
        snapshot = d.conf.get("batch_snapshot_path")
        if not snapshot:
            return f"indexer {name!r} has no batch_snapshot_path to re-read from", 400
        from hbase_indexer_spark.plans.batch import build_index

        conf = d.indexer_conf()
        spark = self.supervisor.spark
        cells = spark.read.parquet(snapshot).filter(F.col("row") == row_id)
        if table is not None:
            cells = cells.filter(F.col("table") == table)
        docs = build_index(cells, conf)
        store = self.supervisor.index_store(name)
        if conf.mapping_type == "row":
            # full-row rebuild: the row's key space is covered, so an empty
            # doc set deletes (F5 empty-row => delete)
            key_df = spark.createDataFrame([(row_id,)], f"{conf.unique_key_field} string")
            store.merge(spark, adds=docs, replace_keys=key_df)
        else:
            store.merge(spark, adds=docs)
        return None, 200

    # -- lifecycle ----------------------------------------------------------

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "IndexerRestServer":
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
