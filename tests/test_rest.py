"""REST control-plane surface (IndexerResource.java:62-209 parity):
registry CRUD over HTTP, occ-conditional updates, and the point
re-index trigger backed by the snapshot source."""

import json
import urllib.error
import urllib.request

import pytest

from hbase_indexer_spark.lifecycle import (
    ACTIVE,
    SUBSCRIBE_DO_NOT_CONSUME,
    IndexerDefinition,
    IndexerModel,
    IndexerSupervisor,
)
from hbase_indexer_spark.rest import IndexerRestServer

USER_CONF = {
    "table": "indexdemo-user",
    "fields": [
        {"name": "firstname_s", "value": "info:firstname"},
        {"name": "age_i", "value": "info:age", "type": "int"},
    ],
}


def _req(url, method="GET", body=None):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"null")


@pytest.fixture()
def server(tmp_path, spark, sf_dir):
    from hbase_indexer_spark.sources.fixtures import user_cells

    snap = str(tmp_path / "snapshot")
    user_cells(spark, sf_dir).write.parquet(snap)
    model = IndexerModel(str(tmp_path / "model"))
    model.put(IndexerDefinition(
        name="users", conf={**USER_CONF, "batch_snapshot_path": snap}))
    model.put(IndexerDefinition(name="other", conf=dict(USER_CONF)))
    sup = IndexerSupervisor(spark, model, str(tmp_path / "work"),
                            events_path=str(tmp_path / "events"))
    srv = IndexerRestServer(model, sup).start()
    yield srv
    srv.stop()


def test_get_list_and_single(server):
    code, defs = _req(f"{server.url}/indexer")
    assert code == 200 and {d["name"] for d in defs} == {"users", "other"}
    code, d = _req(f"{server.url}/indexer/users")
    assert code == 200 and d["name"] == "users" and d["occ_version"] == 0
    assert _req(f"{server.url}/indexer/nope")[0] == 404


def test_get_config_returns_occ_and_raw_conf(server):
    code, cfg = _req(f"{server.url}/indexer/users/config")
    assert code == 200
    assert cfg["occVersion"] == 0
    assert json.loads(cfg["config"])["table"] == "indexdemo-user"


def test_put_updates_definition(server):
    code, d = _req(f"{server.url}/indexer/users", "PUT",
                   {"incremental_state": SUBSCRIBE_DO_NOT_CONSUME})
    assert code == 200
    assert d["incremental_state"] == SUBSCRIBE_DO_NOT_CONSUME
    assert d["occ_version"] == 1
    assert d["lifecycle_state"] == ACTIVE  # untouched fields preserved


def test_put_conditional_occ_conflict(server):
    # client holding a stale version must get 409, not silently overwrite
    code, _ = _req(f"{server.url}/indexer/users", "PUT",
                   {"subscription_ts": 5, "occ_version": 7})
    assert code == 409
    code, _ = _req(f"{server.url}/indexer/users", "PUT",
                   {"subscription_ts": 5, "occ_version": 0})
    assert code == 200


def test_put_rejects_unknown_fields_and_missing(server):
    assert _req(f"{server.url}/indexer/users", "PUT", {"nope": 1})[0] == 400
    assert _req(f"{server.url}/indexer/ghost", "PUT", {})[0] == 404


def test_post_reindex_single_row(server, spark):
    code, out = _req(f"{server.url}/indexer/users?action=index&id=7", "POST")
    assert code == 200 and out == {"indexed": ["users"], "id": "7"}
    idx = {r["id"]: r.asDict()
           for r in server.supervisor.read_index("users").collect()}
    assert set(idx) == {"7"} and idx["7"]["age_i"] == 7

    # re-indexing another row accumulates; re-posting the same id is idempotent
    _req(f"{server.url}/indexer/users?action=index&id=9", "POST")
    _req(f"{server.url}/indexer/users?action=index&id=7", "POST")
    idx = {r["id"] for r in server.supervisor.read_index("users").collect()}
    assert idx == {"7", "9"}


def test_post_fanout_and_errors(server):
    code, out = _req(f"{server.url}/indexer?action=index&indexes=users&id=3",
                     "POST")
    assert code == 200 and out["indexed"] == ["users"]
    # unsupported action mirrors the reference's 400
    assert _req(f"{server.url}/indexer/users?action=zap&id=1", "POST")[0] == 400
    # no snapshot configured -> explicit 400, not a stack trace
    assert _req(f"{server.url}/indexer/other?action=index&id=1", "POST")[0] == 400
    assert _req(f"{server.url}/indexer/ghost?action=index&id=1", "POST")[0] == 404


def test_delete_requests_lifecycle_deletion(server):
    """r9: DELETE /indexer/{name} — sugar over the reference's
    PUT lifecycleState=DELETE_REQUESTED route (IndexerResource.java:
    117-131): marks the definition, 202, supervisor drops it on its
    next cycle (the IndexerMaster delete handler analog)."""
    code, d = _req(f"{server.url}/indexer/other", method="DELETE")
    assert code == 202
    assert d["lifecycle_state"] == "DELETE_REQUESTED"
    # the definition still exists until the supervisor's drop runs
    code, d2 = _req(f"{server.url}/indexer/other")
    assert code == 200 and d2["lifecycle_state"] == "DELETE_REQUESTED"


def test_delete_unknown_indexer_404(server):
    code, body = _req(f"{server.url}/indexer/nope", method="DELETE")
    assert code == 404 and "not found" in body["error"]
    code, _ = _req(f"{server.url}/indexer", method="DELETE")
    assert code == 404
