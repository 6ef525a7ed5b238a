"""Full-application e2e — the engine twin of the reference's only test.

`CdcApplicationTests.'message events received'`
(src/test/kotlin/com/example/cdc/CdcApplicationTests.kt:21-44) stands up
the real topology (REST controller → Postgres → Debezium → Kafka →
consumer → WebSocket) and asserts the insert→update→delete round trip
with full-record event equality. This test replays the identical
scenario across the engine's own surfaces:

    REST ingress (streaming/rest.py, the MessageRestController twin)
      → WAL-capture double (the test emits the Debezium envelope of
        each saved row — the one hop the sandbox cannot run, since it
        has no Postgres/Kafka; envelope shape from prototype/message.md)
      → file CDC source → decode → route → materialize into a SECOND
        KeyedStateSink (the consumer-side materialized view)
      → ws_frames → WsHub → a REAL RFC 6455 socket client.

Asserted invariants, by reference line:
  1. create → id assigned, createTime == updateTime
     (CdcApplicationTests.kt:22-26);
  2. the CDC-delivered upsert event equals the service's return value —
     full-record equality (:28-29);
  3. update → id stable, createTime preserved, updateTime changed
     (:33-37), event equality again (:39-40);
  4. delete → delete event arrives (:42-43), row gone from the view.

Plus the engine-side invariant the reference gets implicitly from
having ONE table: after every step the consumer view's snapshot equals
the ingest sink's snapshot.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.request

import pytest

from cdc_example_spark.operators.keyed_state import KeyedStateSink
from cdc_example_spark.streaming.materialize import file_cdc_source, materialize
from cdc_example_spark.streaming.rest import MessageRestServer
from cdc_example_spark.streaming.sinks import broadcast_frames, ws_frames
from cdc_example_spark.streaming.websocket import WsHub
from tests.cdc_fixtures import envelope, row_image
from tests.test_websocket_sink import RawWsClient

UTC = dt.timezone.utc


def _call(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        method=method,
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


def _instant(rest_ts: str) -> str:
    """REST isoformat ('…T23:21:07Z') → envelope micros instant."""
    d = dt.datetime.fromisoformat(rest_ts.replace("Z", "+00:00"))
    return d.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def _parse_any(ts: str) -> dt.datetime:
    return dt.datetime.fromisoformat(ts.replace("Z", "+00:00"))


def _image(saved: dict) -> dict:
    return row_image(
        saved["id"],
        _instant(saved["createTime"]),
        _instant(saved["updateTime"]),
        saved["message"],
        saved["username"],
    )


def test_full_application_round_trip(spark, tmp_path):
    ingest = KeyedStateSink(path=str(tmp_path / "db"), num_buckets=8)
    view = KeyedStateSink(path=str(tmp_path / "view"), num_buckets=8)
    src = tmp_path / "wal"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    clock = {"t": dt.datetime(2025, 10, 26, 23, 21, 7, tzinfo=UTC)}
    rest = MessageRestServer(spark, ingest, clock=lambda: clock["t"]).start()
    hub = WsHub()
    port = hub.start()
    client = RawWsClient(port)
    frames: list[dict] = []

    def tap(batch_df, batch_id):
        got = [r["frame"] for r in ws_frames(batch_df).collect()]
        assert broadcast_frames(got, [hub.broadcast]) == []

    def capture(n, *records):
        # the WAL→Kafka hop, doubled: emit the envelope of each write
        with open(src / f"wal-{n:04d}.json", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        q = materialize(
            file_cdc_source(spark, str(src)), view, str(ckpt),
            on_batch=tap, trigger_once=True,
        )
        q.awaitTermination(120)
        assert q.exception() is None

    def snapshots_equal():
        key = lambda r: r["id"]
        a = sorted((r.asDict() for r in ingest.snapshot(spark).collect()), key=key)
        b = sorted((r.asDict() for r in view.snapshot(spark).collect()), key=key)
        assert a == b

    def event_equals(evt: dict, saved: dict):
        # full-record equality (CdcApplicationTests.kt:28-29): same id,
        # same content, same timestamps (formats differ — compare parsed)
        assert evt["type"] == "UPSERT" and evt["id"] == saved["id"]
        c = evt["content"]
        assert c["id"] == saved["id"]
        assert c["message"] == saved["message"]
        assert c["username"] == saved["username"]
        assert _parse_any(c["createTime"]) == _parse_any(saved["createTime"] )
        assert _parse_any(c["updateTime"]) == _parse_any(saved["updateTime"] )

    try:
        # 1. create (CdcApplicationTests.kt:22-26)
        status, v1 = _call(rest.port, "POST", "/api/messages",
                           {"username": "user", "message": "Hello World!"})
        assert status == 200 and v1["id"]
        assert v1["createTime"] == v1["updateTime"]

        # 2. CDC delivery of the create → event equality (:28-29)
        capture(1, envelope("c", v1["id"], after=_image(v1), lsn=100))
        event_equals(json.loads(client.read_frame()), v1)
        snapshots_equal()

        # 3. update: id stable, createTime preserved, updateTime bumped
        #    (:33-37); event equality again (:39-40)
        clock["t"] += dt.timedelta(minutes=5)
        status, v2 = _call(rest.port, "POST", "/api/messages",
                           {"id": v1["id"], "username": "user",
                            "message": "Hello World! (edited)"})
        assert status == 200 and v2["id"] == v1["id"]
        assert v2["createTime"] == v1["createTime"]
        assert v2["updateTime"] != v1["updateTime"]
        capture(2, envelope("u", v2["id"], before=_image(v1),
                            after=_image(v2), lsn=200))
        event_equals(json.loads(client.read_frame()), v2)
        snapshots_equal()

        # 4. delete → delete event (:42-43), row gone everywhere
        status, _ = _call(rest.port, "DELETE", f"/api/messages/{v1['id']}")
        assert status == 204
        capture(3, envelope("d", v1["id"], before=_image(v2),
                            after=None, lsn=300))
        evt = json.loads(client.read_frame())
        assert evt == {"type": "DELETE", "id": v1["id"], "content": None}
        assert view.snapshot(spark).count() == 0
        snapshots_equal()
        status, listing = _call(rest.port, "GET", "/api/messages")
        assert status == 200 and listing == []
    finally:
        client.close()
        hub.close()
        rest.stop()
