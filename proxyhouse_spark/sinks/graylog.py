"""Graylog GELF transport: zlib packing + chunked-UDP packetization.

Reference semantics (/root/reference/graylog.go):

- ``Message`` (graylog.go:121-141): short_message = full message when under
  128 chars; otherwise the prefix up to the first newline, unless absent or
  past index 128, in which case the first 125 chars + ``'...'``.
- ``PackMessage`` (graylog.go:143-154): JSON-marshal the message (Go struct
  field order: version, host, timestamp, file, level, short_message,
  full_message; Go's HTML-escaping of ``& < >``), then zlib-compress.
- ``Append`` (graylog.go:156-191): packed payloads under ChunkSize go out
  as ONE raw UDP datagram (no header); larger ones are split into GELF
  chunks of ``magic 0x1e 0x0f | 8-byte little-endian message id | seq index
  | seq count | slice``.

Two reference bugs are deliberately NOT reproduced (fixed here, per the
GELF 1.1 spec both are delivery-breaking):

1. **Lost final chunk** — graylog.go:182-190 calls ``Send`` only in the
   ``else`` branch of the copy loop, so the trailing partial chunk is
   packed but never transmitted (every chunked message arrives
   incomplete and is dropped by the server after the reassembly timeout).
2. **Frozen sequence index** — ``index`` is initialized to 0 and never
   incremented, so every transmitted chunk claims seq 0; a compliant
   server can never reassemble.

The golden test (tests/test_graylog.py) ports the reference's only true
golden test — graylog_test.go:42-68's zlib round-trip against an exact
JSON string — and adds a live loopback-UDP reassembly check the reference
lacks (it couldn't pass it, per bug 1/2).
"""

from __future__ import annotations

import json
import socket
import zlib

GELF_MAGIC = b"\x1e\x0f"
DEFAULT_CHUNK_SIZE = 8192  # graylog.go:24
DEFAULT_PORT = 12201
MAX_CHUNKS = 128  # GELF 1.1 spec: seq count is one byte, servers cap at 128

LEVEL_ALERT = 1
LEVEL_CRIT = 2
LEVEL_ERR = 3
LEVEL_WARN = 4
LEVEL_NOTICE = 5
LEVEL_INFO = 6
LEVEL_DBG = 7

LOG_LEVELS = {
    "debug": LEVEL_DBG,
    "info": LEVEL_INFO,
    "notice": LEVEL_NOTICE,
    "warn": LEVEL_WARN,
    "error": LEVEL_ERR,
    "critical": LEVEL_CRIT,
    "alert": LEVEL_ALERT,
}


def make_short(msg: str) -> str:
    """Truncation rule of Graylog.Message (graylog.go:130-139)."""
    if len(msg) < 128:
        return msg
    ind = msg.find("\n")
    if ind < 0 or ind > 128:
        return msg[:125] + "..."
    return msg[:ind]


def make_message(
    hostname: str, filename: str, level: int, msg: str, timestamp: int
) -> dict:
    """GLMessage in Go struct field order (graylog.go:41-49) — dict insertion
    order IS the serialization order."""
    return {
        "version": "1.1",
        "host": hostname,
        "timestamp": int(timestamp),
        "file": filename,
        "level": int(level),
        "short_message": make_short(msg),
        "full_message": msg,
    }


def gelf_json(message: dict) -> bytes:
    """Byte-identical to Go ``json.Marshal`` on GLMessage: compact
    separators, raw non-ASCII (Go emits valid UTF-8 unescaped), and Go's
    default HTML escaping of ``& < >`` (encoding/json SetEscapeHTML(true));
    U+2028/U+2029 likewise per the Go encoder."""
    s = json.dumps(message, separators=(",", ":"), ensure_ascii=False)
    for ch, esc in (
        ("&", "\\u0026"),
        ("<", "\\u003c"),
        (">", "\\u003e"),
        ("\u2028", "\\u2028"),
        ("\u2029", "\\u2029"),
    ):
        s = s.replace(ch, esc)
    return s.encode("utf-8")


def pack_message(message: dict) -> bytes:
    """PackMessage (graylog.go:143-154): marshal then zlib-compress."""
    return zlib.compress(gelf_json(message))


def chunk_packets(
    payload: bytes, message_id: int, chunk_size: int = DEFAULT_CHUNK_SIZE
) -> list[bytes]:
    """Split a packed payload into wire datagrams.

    Under ``chunk_size`` (strict, graylog.go:168) → one raw datagram, no
    header. Otherwise GELF 1.1 chunks in the reference's header layout
    (magic | message id LE64 | seq | count | slice), with the reference's
    two transmission bugs fixed: every chunk is sent — including the final
    partial one — and the sequence index actually increments."""
    length = len(payload)
    if length < chunk_size:
        return [payload]
    count = (length + chunk_size - 1) // chunk_size
    if count > MAX_CHUNKS:
        raise ValueError(
            f"payload needs {count} chunks; GELF caps at {MAX_CHUNKS} "
            f"(raise chunk_size)"
        )
    header = GELF_MAGIC + int(message_id).to_bytes(8, "little")
    return [
        header
        + bytes([i, count])
        + payload[i * chunk_size : (i + 1) * chunk_size]
        for i in range(count)
    ]


def reassemble(packets: list[bytes]) -> bytes:
    """Inverse of chunk_packets (what a GELF server does): order chunks by
    seq index and concatenate; a single raw datagram passes through.

    Raw-vs-chunked dispatch keys on the 0x1e0f magic prefix, exactly like a
    GELF server. Unambiguous by construction: raw GELF datagrams are zlib
    streams, whose first byte is always 0x78."""
    if len(packets) == 1 and not packets[0].startswith(GELF_MAGIC):
        return packets[0]
    chunks: dict[int, bytes] = {}
    counts = set()
    for p in packets:
        if not p.startswith(GELF_MAGIC):
            raise ValueError("mixed raw and chunked datagrams")
        chunks[p[10]] = p[12:]
        counts.add(p[11])
    (count,) = counts  # all chunks must agree on the total
    if sorted(chunks) != list(range(count)):
        raise ValueError(f"missing chunks: have {sorted(chunks)}, want {count}")
    return b"".join(chunks[i] for i in range(count))


class GraylogSender:
    """Driver/executor-side UDP emitter mirroring Graylog.Append/Log
    (graylog.go:156-199): level-gated, per-message pack + chunk + send.
    Message ids increment per sender instance (the reference's MessageID
    counter); distributed callers should derive ids from record keys
    instead so retries are idempotent."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = DEFAULT_PORT,
        chunk_size: int = DEFAULT_CHUNK_SIZE,
        hostname: str = "unknown",
        filename: str = "proxyhouse_spark",
        log_level: int = LEVEL_INFO,
        clock=None,
    ):
        self.host, self.port = host, port
        self.chunk_size = chunk_size
        self.hostname, self.filename = hostname, filename
        self.log_level = log_level
        self.message_id = 0
        self._clock = clock or (lambda: 0)
        self._sock: socket.socket | None = None

    def _send(self, datagram: bytes) -> None:
        if self._sock is None:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.sendto(datagram, (self.host, self.port))

    def log(self, level: int, msg: str) -> int:
        """Pack + chunk + transmit one message; returns datagrams sent
        (0 = suppressed by level gate, graylog.go:193-197)."""
        if level > self.log_level:
            return 0
        message = make_message(self.hostname, self.filename, level, msg, self._clock())
        packets = chunk_packets(
            pack_message(message), self.message_id, self.chunk_size
        )
        self.message_id += 1
        for p in packets:
            self._send(p)
        return len(packets)

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None
