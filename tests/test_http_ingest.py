"""End-to-end HTTP ingest shim: live server → Parquet spool → flush
pipeline. Mirrors the reference's server surface (dorequest,
main.go:164-226; showstatus 228-245; showstatistic 247-254)."""

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from proxyhouse_spark.operators.ingest import sink_frame
from proxyhouse_spark.sources.http_ingest import IngestShim
from proxyhouse_spark.streaming.pipeline import FlushPipeline


def _call(base, path, data=None, method=None):
    req = urllib.request.Request(base + path, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


@pytest.fixture()
def shim(tmp_path):
    errcount = {"n": 0}
    s = IngestShim(
        str(tmp_path / "spool"),
        flush_seconds=0.3,
        errcount_fn=lambda: errcount["n"],
    ).start()
    s._test_errcount = errcount
    yield s
    s.stop()


def test_endpoint_semantics(shim):
    base = f"http://{shim.address[0]}:{shim.address[1]}"
    # GET / → ready line with a Date header (main.go:172-178)
    code, body, headers = _call(base, "/")
    assert code == 200 and b"ready" in body and "Date" in headers
    # accepted POST acks 200 with TSV content type (main.go:217-218)
    code, _, headers = _call(
        base, "/?query=INSERT%20INTO%20t%20FORMAT%20Values", data=b"(1)"
    )
    assert code == 200
    assert headers["Content-Type"].startswith("text/tab-separated-values")
    # empty body → 405 (main.go:219-221)
    assert _call(base, "/?query=x", data=b"")[0] == 405
    # non-root path → 404 (main.go:166-169)
    assert _call(base, "/other", data=b"(1)")[0] == 404
    assert _call(base, "/nope")[0] == 404
    # non-GET/POST → 405 (main.go:223-225)
    assert _call(base, "/", data=b"(1)", method="PUT")[0] == 405


def test_status_thresholds_and_statistics(shim):
    base = f"http://{shim.address[0]}:{shim.address[1]}"
    for n, want_code, want_status in [
        (0, 200, "ok"),
        (450, 400, "warning"),  # >= warnlevel 400 (main.go:48, 238-241)
        (600, 500, "critical"),  # >= critlevel 500 (main.go:49, 234-237)
    ]:
        shim._test_errcount["n"] = n
        code, body, _ = _call(base, "/status")
        assert (code, json.loads(body)["status"]) == (want_code, want_status)
    _call(base, "/?query=q", data=b"(9)")
    code, body, _ = _call(base, "/statistic")
    assert code == 200 and json.loads(body)["in"] == 1


def test_spooled_requests_flow_through_flush_pipeline(shim, spark, tmp_path):
    base = f"http://{shim.address[0]}:{shim.address[1]}"
    values_uri = "/?query=INSERT%20INTO%20t%20FORMAT%20Values"
    tsv_uri = "/?query=INSERT+INTO+lines+FORMAT+TSV"
    _call(base, values_uri, data=b"(1)")
    _call(base, values_uri, data=b"(2)")
    _call(base, tsv_uri, data=b"7\n8\n")
    _call(base, "/", data=b"(99)", method="PUT")  # rejected: never spooled
    shim.stop()  # drains the buffer to the spool

    spool = spark.read.parquet(shim.spool_dir)
    assert spool.count() == 3  # only accepted POSTs

    # batch view: the core aggregation over the live-captured records
    frame = {r["uri"]: r for r in sink_frame(spool).collect()}
    assert frame[values_uri]["buffer"] == "(1),(2)"
    assert frame[values_uri]["rowcount"] == 2
    assert frame[values_uri]["table_name"] == "t"
    assert frame[tsv_uri]["buffer"] == "7\n8\n"
    assert frame[tsv_uri]["rowcount"] == 2
    assert frame[tsv_uri]["table_name"] == "lines"
    # one outbound unit per distinct key was counted (main.go:292)
    assert shim.out_requests == 2

    # streaming view: the spool is a valid FlushPipeline source
    pipe = FlushPipeline(
        spark,
        shim.spool_dir,
        str(tmp_path / "sink"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
    )
    pipe.start(available_now=True).awaitTermination(120)
    sink = spark.read.parquet(str(tmp_path / "sink"))
    assert sink.count() == 2
    assert sink.agg(F.sum("rowcount")).first()[0] == 4


def test_connection_state_counters(shim):
    """statelistener (main.go:257-271) surfaced via /statistic: a held
    keep-alive connection raises current/idle; a burst of one-shot requests
    raises total; closing the held connection drains current back down."""
    import http.client
    import time

    host, port = shim.address
    base = f"http://{host}:{port}"

    def stat():
        return json.loads(_call(base, "/statistic")[1])

    s0 = stat()
    for k in ("total_connections", "current_connections", "idle_connections"):
        assert k in s0

    # a held keep-alive connection: +1 total, +1 current, idle while parked
    held = http.client.HTTPConnection(host, port, timeout=10)
    held.request("GET", "/")
    held.getresponse().read()
    s1 = stat()
    assert s1["total_connections"] >= s0["total_connections"] + 1
    assert s1["current_connections"] >= s0["current_connections"] + 1

    # burst of one-shot requests: total grows by at least the burst size
    for i in range(5):
        _call(base, f"/?query=INSERT%20INTO%20t{i}%20FORMAT%20Values", data=b"(1)")
    s2 = stat()
    assert s2["total_connections"] >= s1["total_connections"] + 5
    assert s2["in"] == s0["in"] + 5

    # closing the held connection drains current back down
    held.close()
    deadline = time.time() + 10
    while time.time() < deadline:
        s3 = stat()
        if s3["current_connections"] <= s2["current_connections"] - 1:
            break
        time.sleep(0.1)
    assert s3["current_connections"] <= s2["current_connections"] - 1
    # gauge stays balanced: idle never drifts negative
    assert s3["idle_connections"] >= 0


def test_transport_tunables(tmp_path):
    """keepalive / readtimeout (main.go:34-35): the first request's
    header read is bounded by readtimeout; the idle wait for a follow-up
    on a kept-alive connection is bounded by keepalive — on expiry the
    server closes, exactly Go's ReadHeaderTimeout / IdleTimeout split."""
    import socket
    import time

    s = IngestShim(
        str(tmp_path / "spool"),
        flush_seconds=30,
        keepalive=0.4,
        readtimeout=1.5,
    ).start()
    try:
        host, port = s.address
        # one keep-alive connection, two requests with a too-long idle gap
        conn = socket.create_connection((host, port), timeout=5)
        req = (
            b"POST /?query=q HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: 3\r\n\r\n(1)"
        )
        conn.sendall(req)
        time.sleep(0.1)
        first = conn.recv(65536)
        assert first.startswith(b"HTTP/1.1 200")
        time.sleep(1.0)  # exceed keepalive=0.4 → server closes the socket
        conn.sendall(req)
        tail = b""
        try:
            while True:
                chunk = conn.recv(65536)
                if not chunk:
                    break
                tail += chunk
        except (ConnectionResetError, BrokenPipeError, TimeoutError):
            pass
        assert b"200" not in tail  # idle-expired: no second response served
        conn.close()

        # a fresh connection that never sends: closed after readtimeout
        silent = socket.create_connection((host, port), timeout=5)
        t0 = time.time()
        assert silent.recv(65536) == b""  # server-side close
        assert time.time() - t0 < 5  # bounded by readtimeout=1.5, not forever
        silent.close()

        assert s.delim == ","  # -delim default, recorded for the aggregation
    finally:
        s.stop()
