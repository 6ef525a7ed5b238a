"""Browser live-view twin e2e (VERDICT r6 item 7).

The reference's only user-facing artifact is a pair of static pages
(`src/main/resources/static/index.html:87-216`, `debug.html:59-90`)
that connect to the WebSocket feed, apply UPSERT/DELETE events to a
client-side Map, and render it createTime-descending. This suite
drives the engine twin end to end without a browser:

  * the REST server serves "/" and "/debug" with the attached WsHub
    URL substituted (503 before a hub is attached);
  * a REAL RFC 6455 socket client (the existing RawWsClient) receives
    the same frames the page's `applyEvent` consumes;
  * the page's client-side apply/order contract (Map upsert/delete,
    createTime-desc render) is replayed on the received frames by a
    5-line Python model and checked against the REST snapshot — the
    JS is intentionally simple enough that the model IS the spec.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import urllib.error
import urllib.request

from cdc_example_spark.operators.keyed_state import KeyedStateSink
from cdc_example_spark.streaming.rest import MessageRestServer
from cdc_example_spark.streaming.websocket import WsHub
from tests.test_websocket_sink import RawWsClient

UTC = dt.timezone.utc


def _call(port, method, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        method=method,
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, raw
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _apply_feed(frames: "list[str]") -> dict:
    """The page's applyEvent contract, as a dict model."""
    view: dict = {}
    for raw in frames:
        ev = json.loads(raw)
        if ev.get("type") == "UPSERT" and ev.get("content"):
            view[ev["id"]] = ev["content"]
        elif ev.get("type") == "DELETE":
            view.pop(ev["id"], None)
    return view


def test_liveview_pages_served_and_feed_applies(spark, tmp_path):
    sink = KeyedStateSink(path=str(tmp_path / "db"), num_buckets=8)
    clock = {"t": dt.datetime(2025, 10, 26, 23, 21, 7, tzinfo=UTC)}
    rest = MessageRestServer(spark, sink, clock=lambda: clock["t"]).start()
    hub = WsHub()
    ws_port = hub.start()
    try:
        # before a hub is attached the pages must refuse, not serve a
        # page that can never connect
        code, _ = _call(rest.port, "GET", "/")
        assert code == 503
        rest.ws_url = f"ws://127.0.0.1:{ws_port}"

        for path, marker in (("/", "live view"), ("/debug", "raw feed")):
            code, body = _call(rest.port, "GET", path)
            html = body.decode("utf-8")
            assert code == 200 and marker in html, path
            # the placeholder must be substituted with the REAL hub URL
            assert f"ws://127.0.0.1:{ws_port}" in html, path
            assert "__WS_URL__" not in html, path

        # live round trip: REST writes -> UPSERT frames in the exact
        # wire shape ws_frames emits (the materialize->ws_frames->hub
        # pipeline itself is covered by test_application_e2e) -> a REAL
        # RFC 6455 client -> the page's apply model.
        client = RawWsClient(ws_port)
        import time as _time
        deadline = _time.time() + 5
        while hub.n_clients < 1 and _time.time() < deadline:
            _time.sleep(0.05)
        frames: list[str] = []

        def write(method, path, body=None, expect=200):
            code, raw = _call(rest.port, method, path, body)
            assert code == expect, (code, raw)
            return json.loads(raw) if raw else None

        def push_upsert(saved):
            hub.broadcast(json.dumps(
                {"type": "UPSERT", "id": saved["id"], "content": saved}
            ))
            frames.append(client.read_frame())

        a = write("POST", "/api/messages", {"username": "ann", "message": "first"})
        push_upsert(a)
        clock["t"] += dt.timedelta(seconds=5)
        b = write("POST", "/api/messages", {"username": "bo", "message": "second"})
        push_upsert(b)
        # an upsert edit of a, through the same page form contract
        clock["t"] += dt.timedelta(seconds=5)
        a2 = write("POST", "/api/messages", {"id": a["id"], "username": "ann", "message": "edited"})
        push_upsert(a2)

        view = _apply_feed(frames)
        assert view[a["id"]]["message"] == "edited"
        assert view[b["id"]]["message"] == "second"

        # delete via the page's button contract
        write("DELETE", f"/api/messages/{b['id']}", expect=204)
        hub.broadcast(json.dumps({"type": "DELETE", "id": b["id"]}))
        frames.append(client.read_frame())
        view = _apply_feed(frames)
        assert b["id"] not in view and a["id"] in view

        # the page's render order (createTime desc, id desc tiebreak)
        # equals the REST snapshot reversed — A15's total order
        code, raw = _call(rest.port, "GET", "/api/messages")
        snapshot = json.loads(raw)
        page_order = sorted(
            view.items(),
            key=lambda kv: (kv[1].get("createTime") or "", kv[0]),
            reverse=True,
        )
        assert [k for k, _ in page_order] == [m["id"] for m in reversed(snapshot)]
        client.close()
    finally:
        rest.stop()
        hub.close()


def _bootstrap(snapshot_rows, gap_frames):
    """The page's dial()/onopen contract after ADVICE r7: the feed is
    open (buffering) BEFORE the snapshot request resolves; the snapshot
    applies first, then the buffered gap frames replay on top."""
    view = {m["id"]: m for m in snapshot_rows}
    for raw in gap_frames:
        ev = json.loads(raw)
        if ev.get("type") == "UPSERT" and ev.get("content"):
            view[ev["id"]] = ev["content"]
        elif ev.get("type") == "DELETE":
            view.pop(ev["id"], None)
    return view


def test_liveview_subscribe_then_snapshot_gap(spark, tmp_path):
    """ADVICE r7: events delivered while the snapshot request is in
    flight must not be lost (missed UPSERT) or resurrected (ghost row
    after a gap DELETE). Drives the real hub + REST server; the gap is
    modeled by snapshotting BEFORE the gap traffic, exactly what the
    page sees when the fetch resolves against pre-gap state."""
    sink = KeyedStateSink(path=str(tmp_path / "db"), num_buckets=8)
    clock = {"t": dt.datetime(2025, 10, 26, 23, 21, 7, tzinfo=UTC)}
    rest = MessageRestServer(spark, sink, clock=lambda: clock["t"]).start()
    hub = WsHub()
    ws_port = hub.start()
    try:
        rest.ws_url = f"ws://127.0.0.1:{ws_port}"
        # the served page must carry the subscribe-then-snapshot
        # bootstrap, not the old fetch-then-dial one
        code, body = _call(rest.port, "GET", "/")
        html = body.decode("utf-8")
        assert code == 200 and "subscribe-then-snapshot" in html
        assert ".catch(dial)" not in html

        def write(method, path, body=None, expect=200):
            code, raw = _call(rest.port, method, path, body)
            assert code == expect, (code, raw)
            return json.loads(raw) if raw else None

        # pre-gap state: one row, visible in the snapshot
        a = write("POST", "/api/messages", {"username": "ann", "message": "first"})
        code, raw = _call(rest.port, "GET", "/api/messages")
        snapshot = json.loads(raw)  # <- what the in-flight fetch returns

        # subscription is ALREADY open: gap traffic lands as frames
        client = RawWsClient(ws_port)
        import time as _time
        deadline = _time.time() + 5
        while hub.n_clients < 1 and _time.time() < deadline:
            _time.sleep(0.05)
        gap: list[str] = []
        clock["t"] += dt.timedelta(seconds=5)
        b = write("POST", "/api/messages", {"username": "bo", "message": "in-gap"})
        hub.broadcast(json.dumps({"type": "UPSERT", "id": b["id"], "content": b}))
        gap.append(client.read_frame())
        write("DELETE", f"/api/messages/{a['id']}", expect=204)
        hub.broadcast(json.dumps({"type": "DELETE", "id": a["id"]}))
        gap.append(client.read_frame())

        view = _bootstrap(snapshot, gap)
        assert b["id"] in view, "UPSERT in the snapshot gap was lost"
        assert a["id"] not in view, "DELETE in the snapshot gap left a ghost row"
        # and the converged view equals the server's current snapshot
        code, raw = _call(rest.port, "GET", "/api/messages")
        now = json.loads(raw)
        assert {m["id"] for m in now} == set(view)
        client.close()
    finally:
        rest.stop()
        hub.close()


def test_liveview_page_js_executes_for_real():
    """VERDICT r8 item 8: run the SHIPPED page script (extracted from
    liveview.html, never a copy) in node under a stubbed
    DOM/WebSocket/fetch harness, driving the S1-shaped scenario — the
    executed twin of the model tests above. Pins: dial-on-load,
    subscribe-then-snapshot buffering (gap frames never applied early,
    never lost), last-write-wins replay over the snapshot, A15 total
    order (createTime desc, id desc tiebreak), reconnect healing, and
    live-on-buffered-feed when the snapshot fetch fails."""
    import shutil as _shutil
    import subprocess

    node = _shutil.which("node")
    if node is None:
        import pytest as _pytest

        _pytest.skip("no JS runtime in this environment")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    page = os.path.join(
        root, "cdc_example_spark", "streaming", "static", "liveview.html"
    )
    harness = os.path.join(root, "tests", "liveview_harness.mjs")
    res = subprocess.run(
        [node, harness, page], capture_output=True, text=True, timeout=60
    )
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["dialed_on_load"] and out["snapshot_requested"]
    assert out["conn_class_up"]
    assert out["buffered_not_applied"], "gap frames applied before snapshot"
    # snapshot [a-v1, b, c] + buffered [UPSERT a-v2, DELETE b] →
    # {c, a} ordered createTime desc
    assert out["after_bootstrap"] == ["c", "a"]
    assert out["after_bootstrap_count"] == "2 rows"
    assert out["a_is_v2"], "buffered UPSERT lost to the snapshot image"
    # post-bootstrap frame applies immediately; d ties c on createTime
    # and wins the id-desc tiebreak
    assert out["live_apply"] == ["d", "c", "a"]
    assert out["reconnect_scheduled"] and out["conn_class_down"]
    assert out["healed_to_server_state"] == ["x"]
    assert out["failure_path"] == ["y", "x"]


def test_debug_page_js_executes_for_real():
    """Executed twin for debug.html (the raw-feed tap, reference
    debug.html:59-90): frames append verbatim newest-last (pretty-
    printed when JSON), clear wipes, disconnect re-dials."""
    import shutil as _shutil
    import subprocess

    node = _shutil.which("node")
    if node is None:
        import pytest as _pytest

        _pytest.skip("no JS runtime in this environment")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    page = os.path.join(
        root, "cdc_example_spark", "streaming", "static", "debug.html"
    )
    harness = os.path.join(root, "tests", "debugpage_harness.mjs")
    res = subprocess.run(
        [node, harness, page], capture_output=True, text=True, timeout=60
    )
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert all(out.values()), out
