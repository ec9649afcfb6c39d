"""Real HTTP ingest shim — the reference's server surface, feeding Spark.

The reference IS an HTTP server (main.go:142-162): clients POST insert
bodies to ``/``, and the engine's data plane starts at that socket. The
Spark engine models ingest as a request-record stream (requests.py), and
this module closes the last gap for a user switching over: a stdlib
ThreadingHTTPServer that reproduces the reference's endpoint semantics
exactly and spools accepted records as Parquet files that
``requests_stream_df`` / ``FlushPipeline`` tail as a streaming source.

Endpoint semantics (reference ``dorequest``, main.go:164-226):

- any path other than ``/`` (and the two ops endpoints) → 404
  (main.go:166-169);
- ``GET /`` → 200 ready line with an RFC-7231 ``Date`` header
  (main.go:172-178);
- ``POST /`` with an empty body → 405 (main.go:219-221); methods other
  than GET/POST → 405 (main.go:223-225);
- accepted ``POST /`` → buffered under key ``rawpath + "?" + rawquery``
  (main.go:187) and acked 200 with TSV content-type headers
  (main.go:217-218) — ack-on-buffer, the reference's delivery contract
  (SURVEY §2.9 T5);
- ``GET /status`` → errcount vs warn/crit thresholds: ≥ crit → HTTP 500
  "critical", ≥ warn → HTTP 400 "warning", else 200 "ok"
  (``showstatus``, main.go:228-245; flags main.go:48-49);
- ``GET /statistic`` → cumulative ``{"in": .., "out": ..}`` counters
  (``showstatistic``, main.go:247-254; atomics main.go:209/292).

The spool flusher is the reference's ``backgroundSender`` shape
(main.go:275-299): a background thread atomically swaps the in-memory
buffer every ``flush_seconds`` under a short lock (handlers never block on
I/O) and writes ONE Parquet file per flush via pyarrow — written to a
dotfile then renamed, so the Structured Streaming file source only ever
lists complete files. At production rates the spool directory is the
drop-in dev/test transport; the same envelope goes to Kafka unchanged.
"""

from __future__ import annotations

import json
import os
import threading
import time
from datetime import datetime, timezone
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable
from urllib.parse import parse_qs

import pyarrow as pa
import pyarrow.parquet as pq

SPOOL_SCHEMA = pa.schema(
    [
        ("recv_ts", pa.timestamp("us")),
        ("method", pa.string()),
        ("path", pa.string()),
        ("uri", pa.string()),
        ("query", pa.string()),
        ("query_string", pa.string()),
        ("body", pa.string()),
    ]
)

READY_LINE = b"proxyhouse is ready to proxy\n"
TSV_CONTENT_TYPE = "text/tab-separated-values; charset=UTF-8"


class IngestShim:
    """HTTP front door + Parquet spool writer.

    ``errcount_fn`` supplies the replayable-DLQ packet count for
    ``/status`` (the reference counts files in its errors dir,
    main.go:230-237; here the DLQ is a table, so the caller passes a
    counting closure over it).
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        flush_seconds: float = 2.0,
        errcount_fn: Callable[[], int] | None = None,
        warnlevel: int = 400,
        critlevel: int = 500,
        keepalive: float = 10.0,
        readtimeout: float = 5.0,
        delim: str = ",",
    ) -> None:
        self.spool_dir = spool_dir
        self.flush_seconds = flush_seconds
        self.errcount_fn = errcount_fn or (lambda: 0)
        self.warnlevel = warnlevel
        self.critlevel = critlevel
        # transport tunables (reference main.go:34-35): `readtimeout` bounds
        # the header read of a connection's FIRST request (Go's
        # ReadHeaderTimeout); `keepalive` bounds the idle wait for a
        # FOLLOW-UP request on a kept-alive connection (Go's IdleTimeout).
        # `delim` is the -delim flag (main.go:38) — recorded here so the
        # aggregation reading this shim's spool uses the same Values
        # delimiter (buffer_aggregate(df, delim=shim.delim)).
        self.keepalive = keepalive
        self.readtimeout = readtimeout
        self.delim = delim
        self._lock = threading.Lock()
        self._records: list[tuple] = []
        self.in_requests = 0
        self.out_requests = 0
        # connection-state counters (statelistener, main.go:257-271):
        # new → total+1 curr+1 idle+1; active → idle-1; back-to-idle →
        # idle+1; closed → curr-1 idle-1. One deliberate deviation: the
        # reference also decrements idle on a close that follows Active
        # without an intervening Idle, leaking idle-1 per non-keep-alive
        # connection; here active always returns to idle first, so the
        # gauge stays balanced.
        self.total_connections = 0
        self.curr_connections = 0
        self.idle_connections = 0
        self._stop = threading.Event()
        self._server = ThreadingHTTPServer((host, port), self._handler_class())
        self._server.daemon_threads = True
        self._threads: list[threading.Thread] = []

    # -- lifecycle -----------------------------------------------------------

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[0], self._server.server_address[1]

    def start(self) -> "IngestShim":
        os.makedirs(self.spool_dir, exist_ok=True)
        for target in (self._server.serve_forever, self._flush_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        self._server.shutdown()
        self._flush()  # drain whatever the last interval buffered

    # -- the backgroundSender analog (main.go:275-299) -----------------------

    def _flush_loop(self) -> None:
        while not self._stop.wait(self.flush_seconds):
            self._flush()

    def _flush(self) -> None:
        with self._lock:  # atomic swap, new empty buffer (main.go:285-288)
            records, self._records = self._records, []
        if not records:
            return
        cols = list(zip(*records))
        batch = pa.table(
            {f.name: list(c) for f, c in zip(SPOOL_SCHEMA, cols)},
            schema=SPOOL_SCHEMA,
        )
        name = f"requests-{time.time_ns()}.parquet"
        tmp = os.path.join(self.spool_dir, "." + name)
        pq.write_table(batch, tmp)
        os.rename(tmp, os.path.join(self.spool_dir, name))
        with self._lock:  # one outbound unit per distinct key (main.go:292)
            self.out_requests += len({r[3] for r in records})

    # -- request handling ----------------------------------------------------

    def _accept(self, path: str, raw_query: str, body: bytes) -> None:
        query = parse_qs(raw_query, keep_blank_values=True).get("query", [""])[0]
        uri = path + "?" + raw_query  # RawPath + "?" + RawQuery (main.go:187)
        rec = (
            datetime.now(timezone.utc).replace(tzinfo=None),
            "POST",
            path,
            uri,
            query,
            raw_query,
            body.decode("utf-8", "replace"),
        )
        with self._lock:
            self._records.append(rec)
            self.in_requests += 1  # the `in` atomic (main.go:209)

    def _handler_class(self):
        shim = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive, so connections actually pass through the
            # idle state between requests (the Go server's default)
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def setup(self):  # http.StateNew (main.go:259-262)
                super().setup()
                self._nreq = 0
                with shim._lock:
                    shim.total_connections += 1
                    shim.curr_connections += 1
                    shim.idle_connections += 1

            def handle_one_request(self):  # StateActive / StateIdle
                # readtimeout gates the first request's header read;
                # keepalive gates the idle wait between kept-alive
                # requests (main.go:34-35 → Go Server timeouts). On
                # expiry the stdlib handler sets close_connection, which
                # is exactly the Go server's idle-close.
                self.connection.settimeout(
                    shim.readtimeout if self._nreq == 0 else shim.keepalive
                )
                self._nreq += 1
                with shim._lock:
                    shim.idle_connections -= 1
                try:
                    super().handle_one_request()
                finally:
                    with shim._lock:
                        shim.idle_connections += 1

            def finish(self):  # http.StateClosed (main.go:267-269)
                try:
                    super().finish()
                finally:
                    with shim._lock:
                        shim.curr_connections -= 1
                        shim.idle_connections -= 1

            def _reply(self, code: int, body: bytes, ctype: str = "text/plain"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Date", formatdate(usegmt=True))
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?", 1)[0]
                if path == "/":  # ready line (main.go:172-178)
                    self._reply(200, READY_LINE)
                elif path == "/status":  # showstatus (main.go:228-245)
                    errcount = shim.errcount_fn()
                    if errcount >= shim.critlevel:
                        code, status = 500, "critical"
                    elif errcount >= shim.warnlevel:
                        code, status = 400, "warning"
                    else:
                        code, status = 200, "ok"
                    payload = json.dumps({"status": status, "errcount": errcount})
                    self._reply(code, payload.encode(), "application/json")
                elif path == "/statistic":  # showstatistic (main.go:247-254)
                    with shim._lock:
                        payload = json.dumps(
                            {
                                "total_connections": shim.total_connections,
                                "current_connections": shim.curr_connections,
                                "idle_connections": shim.idle_connections,
                                "in": shim.in_requests,
                                "out": shim.out_requests,
                            }
                        )
                    self._reply(200, payload.encode(), "application/json")
                else:
                    self._reply(404, b"404 page not found\n")

            def do_POST(self):
                path, _, raw_query = self.path.partition("?")
                if path != "/":  # non-root → 404 (main.go:166-169)
                    self._reply(404, b"404 page not found\n")
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length) if length else b""
                if not body:  # empty body → 405 (main.go:219-221)
                    self._reply(405, b"method not allowed\n")
                    return
                shim._accept(path, raw_query, body)
                # ack-on-buffer with TSV headers (main.go:217-218)
                self._reply(200, b"", TSV_CONTENT_TYPE)

            def do_PUT(self):  # non-GET/POST → 405 (main.go:223-225)
                self._reply(405, b"method not allowed\n")

            do_DELETE = do_HEAD = do_PATCH = do_PUT

        return Handler
