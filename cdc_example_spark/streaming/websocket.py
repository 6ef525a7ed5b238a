"""Minimal RFC 6455 WebSocket broadcast endpoint — stdlib only.

The reference serves change events over a WebSocket
(``MessageWebSocketHandler.kt:56-66``): serialize once, send to every
session, log-and-continue when one send fails. This container has no
websockets package, so the endpoint is implemented directly on the
stdlib: the server side of RFC 6455 needs only the HTTP upgrade
handshake (SHA-1 + base64 of key+GUID) and unmasked text frames.

Scope (matches the reference's read-only feed): server→client text
frames only; client frames are read solely to detect close/ping
(opcode 0x8 closes, 0x9 answers pong). Production hardening —
TLS, auth, backpressure — is deployment concern, not engine semantics.

Wiring: ``WsHub.broadcast`` is a plain ``str -> None`` callable, i.e. a
subscriber for :func:`cdc_example_spark.streaming.sinks.broadcast_frames`,
so the materialize pipeline's ``on_batch`` can fan every micro-batch's
``ws_frames`` out to live sockets.
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct
import threading

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def text_frame(payload: str) -> bytes:
    """One FIN text frame, server→client (unmasked per RFC 6455 §5.1)."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        header = struct.pack("!BB", 0x81, n)
    elif n < 1 << 16:
        header = struct.pack("!BBH", 0x81, 126, n)
    else:
        header = struct.pack("!BBQ", 0x81, 127, n)
    return header + data


class WsHub:
    """Threaded WebSocket fan-out server.

    ``start()`` binds and returns the port; each accepted connection
    completes the upgrade handshake and joins the broadcast set;
    ``broadcast(text)`` sends a text frame to every live client,
    dropping the ones whose send fails (per-subscriber error isolation,
    reference behavior).
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host = host
        self._port = port
        self._server: socket.socket | None = None
        self._clients: list[socket.socket] = []
        self._lock = threading.Lock()
        self._closing = False

    # -- lifecycle ----------------------------------------------------

    def start(self) -> int:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self._host, self._port))
        srv.listen(16)
        self._server = srv
        self._port = srv.getsockname()[1]
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self._port

    def close(self) -> None:
        self._closing = True
        if self._server is not None:
            try:
                self._server.close()
            except OSError:
                pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()

    @property
    def n_clients(self) -> int:
        with self._lock:
            return len(self._clients)

    # -- server internals ---------------------------------------------

    def _accept_loop(self) -> None:
        assert self._server is not None
        while not self._closing:
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            threading.Thread(target=self._handshake, args=(conn,), daemon=True).start()

    def _handshake(self, conn: socket.socket) -> None:
        try:
            conn.settimeout(5)
            request = b""
            while b"\r\n\r\n" not in request:
                chunk = conn.recv(4096)
                if not chunk:
                    conn.close()
                    return
                request += chunk
            key = None
            for line in request.split(b"\r\n"):
                if line.lower().startswith(b"sec-websocket-key:"):
                    key = line.split(b":", 1)[1].strip().decode("ascii")
            if key is None:
                conn.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                conn.close()
                return
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
                ).encode("ascii")
            )
            conn.settimeout(None)
        except OSError:
            try:
                conn.close()
            except OSError:
                pass
            return
        with self._lock:
            self._clients.append(conn)
        threading.Thread(target=self._read_loop, args=(conn,), daemon=True).start()

    def _read_loop(self, conn: socket.socket) -> None:
        """Consume client frames: close on 0x8, pong on ping, ignore rest."""
        try:
            while True:
                head = self._read_exact(conn, 2)
                if head is None:
                    break
                opcode = head[0] & 0x0F
                masked = head[1] & 0x80
                length = head[1] & 0x7F
                if length == 126:
                    ext = self._read_exact(conn, 2)
                    if ext is None:
                        break
                    length = struct.unpack("!H", ext)[0]
                elif length == 127:
                    ext = self._read_exact(conn, 8)
                    if ext is None:
                        break
                    length = struct.unpack("!Q", ext)[0]
                mask = self._read_exact(conn, 4) if masked else b""
                payload = self._read_exact(conn, length) if length else b""
                if payload is None or mask is None:
                    break
                if opcode == 0x8:  # close
                    break
                if opcode == 0x9:  # ping → pong (echo payload, unmasked)
                    body = bytes(b ^ mask[i % 4] for i, b in enumerate(payload)) if masked else payload
                    try:
                        conn.sendall(struct.pack("!BB", 0x8A, len(body)) + body)
                    except OSError:
                        break
        except OSError:
            pass
        self._drop(conn)

    @staticmethod
    def _read_exact(conn: socket.socket, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _drop(self, conn: socket.socket) -> None:
        with self._lock:
            if conn in self._clients:
                self._clients.remove(conn)
        try:
            conn.close()
        except OSError:
            pass

    # -- the subscriber surface ---------------------------------------

    def broadcast(self, payload: str) -> None:
        """Send one text frame to every live client; a failed send drops
        that client and never interrupts the rest (A9 error isolation)."""
        frame = text_frame(payload)
        with self._lock:
            clients = list(self._clients)
        for c in clients:
            try:
                c.sendall(frame)
            except OSError:
                self._drop(c)
