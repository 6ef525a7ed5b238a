"""A9 end-to-end: decode → route → ws_frames → a REAL WebSocket socket.

The reference pushes WsEvent frames to connected browsers
(MessageWebSocketHandler.kt:56-66); this suite drives the stdlib
RFC 6455 endpoint with raw-socket clients: handshake correctness,
frame delivery of an actual routed CDC batch, and the
dead-client-does-not-stop-fan-out contract.
"""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import time
import uuid

from cdc_example_spark.streaming.envelope import decode_envelope, route_changes
from cdc_example_spark.streaming.sinks import broadcast_frames, ws_frames
from cdc_example_spark.streaming.websocket import WsHub, _WS_GUID
from tests.cdc_fixtures import envelope, row_image


class RawWsClient:
    """Stdlib test client: upgrade handshake + server-frame reader."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        key = base64.b64encode(uuid.uuid4().bytes).decode("ascii")
        self.sock.sendall(
            (
                "GET / HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode("ascii")
        )
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += self.sock.recv(4096)
        assert b"101" in resp.split(b"\r\n", 1)[0]
        want = base64.b64encode(hashlib.sha1((key + _WS_GUID).encode()).digest())
        assert want in resp  # handshake accept-key correctness

    def _read_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("closed")
            buf += chunk
        return buf

    def read_frame(self) -> str:
        head = self._read_exact(2)
        assert head[0] == 0x81  # FIN text frame
        length = head[1] & 0x7F
        if length == 126:
            length = struct.unpack("!H", self._read_exact(2))[0]
        elif length == 127:
            length = struct.unpack("!Q", self._read_exact(8))[0]
        return self._read_exact(length).decode("utf-8")

    def close(self):
        self.sock.close()


def test_ws_endpoint_delivers_routed_cdc_frames(spark):
    hub = WsHub()
    port = hub.start()
    try:
        a, b = RawWsClient(port), RawWsClient(port)
        deadline = time.time() + 5
        while hub.n_clients < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert hub.n_clients == 2

        mid = str(uuid.uuid4())
        t0 = "2025-10-26T10:00:00.000000Z"
        raw = spark.createDataFrame(
            [
                envelope("i", mid, after=row_image(mid, t0, t0, "hello", "alice"), lsn=100),
                envelope("d", mid, after=None, lsn=200),
            ],
            "key STRING, value STRING",
        )
        frames = [r["frame"] for r in ws_frames(route_changes(decode_envelope(raw))).collect()]
        assert len(frames) == 2
        errors = broadcast_frames(frames, [hub.broadcast])
        assert errors == []

        for client in (a, b):
            got = [json.loads(client.read_frame()) for _ in range(2)]
            by_type = {g["type"]: g for g in got}
            assert by_type["UPSERT"]["id"] == mid
            assert by_type["UPSERT"]["content"]["message"] == "hello"
            assert by_type["UPSERT"]["content"]["username"] == "alice"
            assert by_type["DELETE"]["id"] == mid
            assert by_type["DELETE"]["content"] is None

        # kill one client: the next broadcast must still reach the other
        a.close()
        time.sleep(0.2)
        hub.broadcast('{"type":"UPSERT","id":"x","content":null}')
        hub.broadcast('{"type":"UPSERT","id":"y","content":null}')
        assert json.loads(b.read_frame())["id"] == "x"
        assert json.loads(b.read_frame())["id"] == "y"
        deadline = time.time() + 5
        while hub.n_clients > 1 and time.time() < deadline:
            time.sleep(0.05)
        assert hub.n_clients == 1
        b.close()
    finally:
        hub.close()


def test_ws_large_frame_length_encoding(spark):
    hub = WsHub()
    port = hub.start()
    try:
        c = RawWsClient(port)
        deadline = time.time() + 5
        while hub.n_clients < 1 and time.time() < deadline:
            time.sleep(0.05)
        big = "x" * 70_000  # forces the 64-bit length path
        mid = "m" * 200  # forces the 16-bit path
        hub.broadcast(mid)
        hub.broadcast(big)
        assert c.read_frame() == mid
        assert c.read_frame() == big
        c.close()
    finally:
        hub.close()
