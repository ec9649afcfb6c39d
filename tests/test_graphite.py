"""Pure-function tests for the Graphite counter map (metric.go:21-60)."""

from proxyhouse_spark.sinks.graphite import PREFIX_AVG, MetricStorage


def test_increment_sums_by_name():
    ms = MetricStorage()
    ms.increment("a", 2)
    ms.increment("a", 3)
    ms.increment("b")
    assert ms.snapshot() == {"a": 5, "b": 1}


def test_flush_ratio_requires_both_nonzero():
    # only bytesSent → pair consumed, NO ratio line (metric.go:36-38)
    ms = MetricStorage()
    ms.increment("bytesSent", 100)
    ms.increment("x", 1)
    assert ms.flush_lines() == ["x 1"]

    # both nonzero → integer-division ratio, pair never emitted raw
    ms.increment("bytesSent", 1000)
    ms.increment("sendDuration", 3)
    assert ms.flush_lines() == [f"{PREFIX_AVG}.bytes_to_milliseconds 333"]


def test_flush_clears_and_empty_is_noop():
    ms = MetricStorage()
    ms.increment("x", 1)
    assert ms.flush_lines() == ["x 1"]
    assert ms.flush_lines() == []
    assert ms.snapshot() == {}


def test_emitter_ships_plaintext_udp_lines():
    """SimpleSend wire format over a real loopback socket:
    ``name value timestamp\\n`` per drained counter."""
    import socket

    from proxyhouse_spark.sinks.graphite import GraphiteEmitter

    server = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    server.bind(("127.0.0.1", 0))
    server.settimeout(5)

    ms = MetricStorage()
    ms.increment("relap.count.proxyhouse.requests_sent", 42)
    emitter = GraphiteEmitter(
        ms, udp_addr=("127.0.0.1", server.getsockname()[1]), clock=lambda: 1594916275
    )
    assert emitter.emit_once() == ["relap.count.proxyhouse.requests_sent 42"]
    datagram = server.recv(65536)
    server.close()
    emitter.stop(final_flush=False)
    assert datagram == b"relap.count.proxyhouse.requests_sent 42 1594916275\n"
