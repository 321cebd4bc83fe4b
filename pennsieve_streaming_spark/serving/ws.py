"""RFC6455 WebSocket adapter for the serving transport (T1).

The reference upgrades ``GET /ts/query?package=X`` to a WebSocket and
speaks JSON messages over it (server/TimeSeriesQueryService.scala:79-135,
WebServer.scala:66-79). This module implements that handshake + framing
with the stdlib only (no ``websockets`` package in this image) and
delegates every message to the same transport-agnostic
``transport.Connection`` state machine the NDJSON server uses — buffer/
flush, epoch dump, keep-alive, idle kill are identical.

Scope: text frames (the protocol is JSON), ping/pong, close, masked
client frames per the RFC; no fragmentation or extensions (the
reference's messages are single-frame JSON, TSJsonSupport.scala).
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import json
from typing import Callable
from urllib.parse import parse_qs, urlparse

from pennsieve_streaming_spark.serving.session import QuerySession
from pennsieve_streaming_spark.serving.transport import (
    MAX_MESSAGE_BYTES,
    Connection,
    TransportConfig,
    drive_connection,
    error_json,
)

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0x1, 0x2, 0x8, 0x9, 0xA


class ProtocolError(ValueError):
    """Client violated RFC6455 (oversized or unmasked frame)."""


def accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(payload: bytes, opcode: int = OP_TEXT) -> bytes:
    """Server-to-client frame: FIN set, unmasked (RFC6455 §5.1)."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([n])
    elif n < 1 << 16:
        head += bytes([126]) + n.to_bytes(2, "big")
    else:
        head += bytes([127]) + n.to_bytes(8, "big")
    return head + payload


async def read_frame(
    reader: asyncio.StreamReader, require_mask: bool = False
) -> tuple[int, bytes]:
    """Read one frame; returns (opcode, unmasked payload).

    Enforces RFC6455 §5.1/§5.3: client frames must be masked, and the
    declared length is capped so a hostile header cannot force
    unbounded buffering."""
    b1, b2 = await reader.readexactly(2)
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    n = b2 & 0x7F
    if n == 126:
        n = int.from_bytes(await reader.readexactly(2), "big")
    elif n == 127:
        n = int.from_bytes(await reader.readexactly(8), "big")
    if n > MAX_MESSAGE_BYTES:
        raise ProtocolError(f"frame of {n} bytes exceeds limit")
    if require_mask and not masked:
        raise ProtocolError("client frames must be masked (RFC6455 5.3)")
    mask = await reader.readexactly(4) if masked else b"\x00" * 4
    payload = bytearray(await reader.readexactly(n))
    if masked:
        for i in range(n):
            payload[i] ^= mask[i % 4]
    return opcode, bytes(payload)


class WebSocketTimeSeriesServer:
    """``GET /ts/query?package=X`` → WebSocket session over the engine.

    ``session_factory(session_id, package)`` builds the QuerySession;
    non-upgrade or non-/ts/query requests get plain HTTP errors, like
    the reference's route rejections."""

    def __init__(
        self,
        session_factory: Callable[[str, str | None], QuerySession],
        config: TransportConfig | None = None,
        jwt_secret: str | None = None,
    ):
        self.session_factory = session_factory
        self.config = config or TransportConfig()
        # reference WebServer.scala:66-79: every query route sits behind
        # an OAuth2 bearer claim; None disables auth (embedded use)
        self.jwt_secret = jwt_secret
        self._server: asyncio.AbstractServer | None = None
        self._n_conns = 0

    async def _handshake(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> tuple[str, bool] | None:
        """HTTP upgrade; returns (package id, binary mode) or None if
        rejected."""
        request_line = (await reader.readline()).decode().strip()
        headers: dict[str, str] = {}
        while True:
            line = (await reader.readline()).decode().strip()
            if not line:
                break
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            method, target, _ = request_line.split(" ")
        except ValueError:
            writer.write(b"HTTP/1.1 400 Bad Request\r\n\r\n")
            return None
        url = urlparse(target)
        if method != "GET" or not url.path.startswith("/ts/query"):
            writer.write(b"HTTP/1.1 404 Not Found\r\n\r\n")
            return None
        key = headers.get("sec-websocket-key")
        if headers.get("upgrade", "").lower() != "websocket" or not key:
            writer.write(b"HTTP/1.1 400 Bad Request\r\n\r\nexpected upgrade")
            return None
        # auth BEFORE the upgrade (WebServer.scala:66-79): missing
        # credentials / service claim -> 401, unparseable token -> 400
        from pennsieve_streaming_spark.serving.auth import AuthError, authorize

        try:
            authorize(headers, self.jwt_secret)
        except AuthError as e:
            status = (
                "401 Unauthorized" if e.status == 401 else "400 Bad Request"
            )
            writer.write(
                f"HTTP/1.1 {status}\r\nContent-Length: 0\r\n\r\n".encode()
            )
            return None
        writer.write(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        q = parse_qs(url.query)
        pkg = q.get("package", [None])[0]
        # reference parity mode: data messages as protobuf
        # TimeSeriesMessage binary frames, errors/acks as JSON text
        # (toWsMessage, server/TimeSeriesFlow.scala:431-447)
        binary = q.get("format", [""])[0] == "binary"
        return pkg or "default", binary

    async def _client(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        try:
            hs = await self._handshake(reader, writer)
        except (ConnectionError, asyncio.IncompleteReadError):
            writer.close()
            return
        if hs is None:
            await writer.drain()
            writer.close()
            return
        pkg, binary = hs
        self._n_conns += 1
        session = self.session_factory(f"ws-{self._n_conns}", pkg)
        loop = asyncio.get_running_loop()
        lock = asyncio.Lock()

        async def send(msg: dict) -> None:
            # binary mode: data messages ride as protobuf BinaryMessage
            # frames, everything else (errors, acks, keepalive) as JSON
            # TextMessage — exactly the reference's toWsMessage split
            if binary and "rows" in msg:
                from pennsieve_streaming_spark.serving.protobuf import (
                    data_message_to_protobuf,
                )

                payload = data_message_to_protobuf(msg).to_bytes()
                async with lock:
                    writer.write(encode_frame(payload, OP_BINARY))
                    await writer.drain()
                return
            async with lock:
                writer.write(encode_frame(json.dumps(msg).encode()))
                await writer.drain()

        async def recv_loop(conn: Connection) -> None:
            while not conn.closed.is_set():
                try:
                    opcode, payload = await read_frame(
                        reader, require_mask=True
                    )
                except (ConnectionError, asyncio.IncompleteReadError):
                    break
                except ProtocolError as e:
                    await conn.send(error_json(e))
                    break
                if opcode == OP_CLOSE:
                    async with lock:
                        writer.write(encode_frame(payload, OP_CLOSE))
                        await writer.drain()
                    break
                if opcode == OP_PING:
                    async with lock:
                        writer.write(encode_frame(payload, OP_PONG))
                        await writer.drain()
                    conn.last_active = loop.time()
                    continue
                if opcode == OP_TEXT:
                    try:
                        raw = payload.decode()
                    except UnicodeDecodeError as e:
                        # T1 contract: malformed input answers on the
                        # error lane, it never tears the connection down
                        await conn.send(error_json(e))
                        continue
                    if raw.strip():
                        await conn.handle_raw(raw)

        conn = Connection(
            session, send, self.config, loop, on_close=writer.close
        )
        try:
            await drive_connection(conn, recv_loop)
        finally:
            writer.close()

    async def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        self._server = await asyncio.start_server(
            self._client, host, port, limit=MAX_MESSAGE_BYTES
        )
        return self._server.sockets[0].getsockname()[1]

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
