"""WebSocket notification hub — the reference's `/api/ws` surface
(`otel-worker/src/lib.rs:69-72`, Durable-Object hub
`otel-worker/src/ws/worker.rs:12-97`) implemented from the public
RFC 6455 wire spec over stdlib sockets.

Semantics mirrored:

- ``GET /api/ws`` upgrades OUTSIDE the bearer middleware (the worker
  adds the route beside, not inside, the auth-layered API router —
  lib.rs:63-71), and the 101 response carries the
  ``otel-worker-websocket-id`` header (`otel-worker-core/src/api.rs:
  17-19`).
- The hub is BROADCAST-ONLY: every successful ingest (HTTP or gRPC)
  fans a ``ServerMessage`` out to all connected sockets — incoming
  client text frames are not interpreted (worker.rs handles only
  connect/broadcast/close; the tokio channel analog is
  `events.rs:14`'s broadcast::channel(100)).
- The message is the serde shape of ``ServerMessageDetails::SpanAdded``
  (`api/models.rs:55-121``): ``{"type": "spanAdded", "details":
  {"newSpans": [[<hex trace_id>, <hex span_id>], ...]}}`` — messageId
  omitted when None (skip_serializing_if).

Protocol notes (RFC 6455): server→client frames are unmasked,
client→server frames arrive masked and are unmasked here; ping is
answered with pong; a close frame is echoed and the socket retired.
A send failure retires the connection (the hub never blocks ingest on
a dead subscriber).
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct
import threading
import uuid

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
#: otel-worker-core/src/api.rs:19
WS_ID_HEADER = "otel-worker-websocket-id"

OP_TEXT = 0x1
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA
#: sentinel opcode for "no frame yet" (idle-timeout tick, not wire data)
OP_NONE = -1


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept per RFC 6455 §4.2.2."""
    digest = hashlib.sha1((client_key + WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(payload: bytes, opcode: int = OP_TEXT, mask: bool = False) -> bytes:
    """One finished frame. Servers send unmasked; the test client
    masks (RFC 6455 §5.1 requires it of clients)."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    mbit = 0x80 if mask else 0
    if n < 126:
        head += bytes([mbit | n])
    elif n <= 0xFFFF:
        head += bytes([mbit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mbit | 127]) + struct.pack(">Q", n)
    if mask:
        key = uuid.uuid4().bytes[:4]
        body = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return head + key + body
    return head + payload


def read_frame(sock) -> tuple[int, bytes] | None:
    """Read one frame from a socket; returns (opcode, payload) or
    None on EOF. Unmasks when the mask bit is set."""
    consumed = False

    def recv_exact(k: int) -> bytes | None:
        nonlocal consumed
        buf = b""
        while len(buf) < k:
            chunk = sock.recv(k - len(buf))
            if not chunk:
                return None
            buf += chunk
            consumed = True
        return buf

    try:
        head = recv_exact(2)
        if head is None:
            return None
        opcode = head[0] & 0x0F
        masked = head[1] & 0x80
        n = head[1] & 0x7F
        if n == 126:
            ext = recv_exact(2)
            if ext is None:
                return None
            n = struct.unpack(">H", ext)[0]
        elif n == 127:
            ext = recv_exact(8)
            if ext is None:
                return None
            n = struct.unpack(">Q", ext)[0]
        key = b""
        if masked:
            key = recv_exact(4)
            if key is None:
                return None
        payload = recv_exact(n) if n else b""
        if payload is None:
            return None
    except TimeoutError:
        if consumed:
            # the timeout fired MID-FRAME (e.g. after 1 of 2 header
            # bytes): the byte stream can no longer be re-framed, so
            # signal close instead of silently desyncing
            return None
        # idle socket with a send-protection timeout set and ZERO bytes
        # consumed: not an error, just nothing to read yet — the only
        # case that is actually frame-boundary safe
        return (OP_NONE, b"")
    if masked:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return opcode, payload


def span_added_message(new_spans: list[tuple[str, str]]) -> dict:
    """ServerMessageDetails::SpanAdded serde shape (models.rs:51-121)."""
    return {"type": "spanAdded", "details": {"newSpans": [list(p) for p in new_spans]}}


class WsHub:
    """All live subscriber sockets + the broadcast fan-out (the
    Durable-Object `connections` vector / tokio broadcast analog)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._conns: dict[str, tuple[object, threading.Lock]] = {}

    def register(self, sock) -> str:
        ws_id = uuid.uuid4().hex
        # a slow/dead subscriber must never wedge the ingest path: a
        # blocked sendall times out, the send fails, the socket is
        # retired (the reference's tokio channel drops laggards the
        # same way — bounded capacity 100, events.rs:14)
        try:
            sock.settimeout(10.0)
        except OSError:
            pass
        with self._lock:
            self._conns[ws_id] = (sock, threading.Lock())
        return ws_id

    def unregister(self, ws_id: str) -> None:
        with self._lock:
            self._conns.pop(ws_id, None)

    def connection_count(self) -> int:
        with self._lock:
            return len(self._conns)

    def broadcast(self, message: dict) -> int:
        """Send to every subscriber; a failed send retires that socket
        (never raises into the ingest path). Returns sockets reached."""
        data = encode_frame(json.dumps(message, separators=(",", ":")).encode())
        with self._lock:
            conns = list(self._conns.items())
        sent = 0
        for ws_id, (sock, wlock) in conns:
            try:
                with wlock:
                    sock.sendall(data)
                sent += 1
            except OSError:
                self.unregister(ws_id)
        return sent

    def serve_connection(self, sock, ws_id: str) -> None:
        """Per-connection read loop (runs on the upgraded handler's
        thread): answer ping with pong, echo close, ignore text —
        the hub is broadcast-only, like the reference's."""
        try:
            while True:
                frame = read_frame(sock)
                if frame is None:
                    break
                opcode, payload = frame
                if opcode == OP_NONE:
                    if ws_id not in self._conns:
                        break  # retired by a failed broadcast
                    continue
                _, wlock = self._conns.get(ws_id, (None, threading.Lock()))
                if opcode == OP_PING:
                    with wlock:
                        sock.sendall(encode_frame(payload, OP_PONG))
                elif opcode == OP_CLOSE:
                    with wlock:
                        try:
                            sock.sendall(encode_frame(payload, OP_CLOSE))
                        except OSError:
                            pass
                    break
        except OSError:
            pass
        finally:
            self.unregister(ws_id)
