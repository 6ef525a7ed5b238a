"""REST ingress (reference A14) — MessageRestController semantics over HTTP.

Replays the controller contract (MessageRestController.kt:15-29 +
MessageService.kt:18-39) against the stdlib server: insert assigns an id
with create_time == update_time (CdcApplicationTests.kt:25 invariant),
update preserves create_time and bumps update_time, update of a missing
id is a typed 404, delete returns 204 and removes the row, GET serves
the materialized snapshot.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.request

import pytest

from cdc_example_spark.operators.keyed_state import KeyedStateSink
from cdc_example_spark.streaming.rest import MessageRestServer

UTC = dt.timezone.utc


@pytest.fixture()
def server(spark, tmp_path):
    sink = KeyedStateSink(path=str(tmp_path / "state"), num_buckets=8)
    clock_now = {"t": dt.datetime(2025, 10, 26, 23, 21, 7, tzinfo=UTC)}
    srv = MessageRestServer(spark, sink, clock=lambda: clock_now["t"]).start()
    try:
        yield srv, clock_now
    finally:
        srv.stop()


def _call(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        method=method,
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        raw = e.read()
        return e.code, json.loads(raw) if raw else None


def test_rest_upsert_delete_roundtrip(server):
    srv, clock = server

    # insert: id assigned, createTime == updateTime (reference invariant)
    code, saved = _call(srv.port, "POST", "/api/messages",
                        {"username": "alice", "message": "hello"})
    assert code == 200
    assert saved["id"] and saved["username"] == "alice"
    assert saved["createTime"] == saved["updateTime"]

    # update at a later clock: create_time preserved, update_time bumped
    clock["t"] = clock["t"] + dt.timedelta(minutes=2)
    code, updated = _call(srv.port, "POST", "/api/messages",
                          {"id": saved["id"], "username": "alice",
                           "message": "hello again"})
    assert code == 200
    assert updated["id"] == saved["id"]
    assert updated["createTime"] == saved["createTime"]
    assert updated["updateTime"] != saved["updateTime"]
    assert updated["message"] == "hello again"

    # GET serves the materialized row
    code, listing = _call(srv.port, "GET", "/api/messages")
    assert code == 200
    assert [r["message"] for r in listing] == ["hello again"]

    # DELETE → 204, row gone; repeat delete stays a no-op 204
    code, _ = _call(srv.port, "DELETE", f"/api/messages/{saved['id']}")
    assert code == 204
    code, listing = _call(srv.port, "GET", "/api/messages")
    assert listing == []
    code, _ = _call(srv.port, "DELETE", f"/api/messages/{saved['id']}")
    assert code == 204


def test_rest_update_missing_id_is_404_and_bad_body_400(server):
    srv, _ = server
    code, err = _call(srv.port, "POST", "/api/messages",
                      {"id": "00000000-0000-0000-0000-000000000000",
                       "username": "x", "message": "y"})
    assert code == 404 and "non-existent" in err["error"]

    code, err = _call(srv.port, "POST", "/api/messages", {"username": "x"})
    assert code == 400

    code, _ = _call(srv.port, "GET", "/api/nope")
    assert code == 404
