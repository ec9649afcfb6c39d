"""GELF transport golden tests.

``test_golden_pack_roundtrip`` is a direct port of the reference's only
true golden test (graylog_test.go:42-68): build the message, pin every
field, zlib round-trip, compare against the EXACT JSON string Go emits.

The chunking tests pin the two reference transport bugs as FIXED
(graylog.go:182-190 drops the final chunk; the seq index never
increments) — see proxyhouse_spark/sinks/graylog.py's module docstring.
"""

import json
import socket
import zlib

from proxyhouse_spark.sinks import graylog as gl

LONG_MESSAGE = (
    "To write a new test suite, create a file whose name ends _test.go that "
    "contains the TestXxx functions as described here. Put the file in the "
    "same package as the one being tested. The file will be excluded from "
    "regular package builds but will be included when the “go test” "
    "command is run."
)
SHORT_OF_LONG = LONG_MESSAGE[:125] + "..."


def test_golden_pack_roundtrip():
    # graylog_test.go:18-40 — message construction
    message = "To write a new test suite, create a file whose name ends _test.go"
    msg = gl.make_message("testhostname", "screwdriver", gl.LEVEL_INFO, message, 0)
    assert msg["version"] == "1.1"
    assert msg["host"] == "testhostname"
    assert msg["short_message"] == message
    assert msg["full_message"] == message

    msg = gl.make_message(
        "testhostname", "screwdriver", gl.LEVEL_INFO, LONG_MESSAGE, 1594916275
    )
    assert msg["short_message"] == SHORT_OF_LONG
    assert msg["full_message"] == LONG_MESSAGE

    # graylog_test.go:42-68 — pack, decompress, exact JSON comparison
    data = zlib.decompress(gl.pack_message(msg)).decode("utf-8")
    want = (
        '{"version":"1.1","host":"testhostname","timestamp":1594916275,'
        '"file":"screwdriver","level":6,"short_message":"' + SHORT_OF_LONG
        + '","full_message":"' + LONG_MESSAGE + '"}'
    )
    assert len(data) == len(want)
    assert data == want


def test_short_message_newline_branch():
    # newline before index 128 → cut at the newline (graylog.go:133-138)
    msg = "x" * 50 + "\n" + "y" * 200
    assert gl.make_short(msg) == "x" * 50
    # newline after index 128 → ellipsis branch
    msg = "x" * 200 + "\n" + "y" * 10
    assert gl.make_short(msg) == "x" * 125 + "..."


def test_go_json_html_escaping():
    """Go's encoding/json escapes & < > by default; the golden string must
    match byte-for-byte even for messages containing them."""
    msg = gl.make_message("h", "f", 6, "a&b<c>d", 0)
    assert b'"full_message":"a\\u0026b\\u003cc\\u003ed"' in gl.gelf_json(msg)


def test_small_payload_is_one_raw_datagram():
    payload = b"z" * 100
    packets = gl.chunk_packets(payload, 7, chunk_size=8192)
    assert packets == [payload]  # graylog.go:168-171: no header under chunk_size


def test_chunking_fixes_reference_bugs():
    payload = bytes(range(256)) * 10  # 2560 bytes
    packets = gl.chunk_packets(payload, message_id=42, chunk_size=1024)
    assert len(packets) == 3  # ceil(2560/1024) — the FINAL partial chunk exists
    for i, p in enumerate(packets):
        assert p[:2] == b"\x1e\x0f"
        assert p[2:10] == (42).to_bytes(8, "little")
        assert p[10] == i  # seq index increments (frozen at 0 in the reference)
        assert p[11] == 3
    assert packets[2][12:] == payload[2048:]  # partial chunk: no padding bytes
    assert gl.reassemble(packets) == payload
    assert gl.reassemble(list(reversed(packets))) == payload  # order-free


def test_chunk_count_cap():
    import pytest

    with pytest.raises(ValueError):
        gl.chunk_packets(b"z" * (129 * 10), 0, chunk_size=10)


def test_live_udp_loopback_reassembly():
    """End-to-end over a real loopback UDP socket: send a message large
    enough to chunk, reassemble server-side, decompress, parse. The
    reference could not pass this test (its final chunk is never sent)."""
    server = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    server.bind(("127.0.0.1", 0))
    server.settimeout(5)
    port = server.getsockname()[1]

    sender = gl.GraylogSender(
        host="127.0.0.1",
        port=port,
        chunk_size=256,
        hostname="testhostname",
        filename="screwdriver",
        log_level=gl.LEVEL_DBG,
        clock=lambda: 1594916275,
    )
    big = LONG_MESSAGE * 8  # packed > 256 bytes even after compression
    n_sent = sender.log(gl.LEVEL_INFO, big)
    assert n_sent > 1
    assert sender.log(gl.LEVEL_DBG + 1, big) == 0  # level gate suppresses

    received = [server.recv(65536) for _ in range(n_sent)]
    server.close()
    sender.close()

    decoded = json.loads(zlib.decompress(gl.reassemble(received)))
    assert decoded["version"] == "1.1"
    assert decoded["host"] == "testhostname"
    assert decoded["timestamp"] == 1594916275
    assert decoded["full_message"] == big
    assert decoded["short_message"] == big[:125] + "..."


def test_chunk_roundtrip_property():
    """Property: for any payload and chunk size, the wire datagrams
    reassemble to the exact payload (the invariant the reference's two
    transport bugs break), and every chunked datagram fits header+chunk."""
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        payload=st.binary(min_size=0, max_size=4096),
        chunk_size=st.integers(min_value=33, max_value=1024),
        message_id=st.integers(min_value=0, max_value=2**64 - 1),
    )
    def check(payload, chunk_size, message_id):
        # raw datagrams are zlib streams in the protocol (first byte 0x78),
        # so a payload starting with the chunk magic cannot occur
        assume(not payload.startswith(gl.GELF_MAGIC))
        packets = gl.chunk_packets(payload, message_id, chunk_size)
        assert gl.reassemble(packets) == payload
        if len(payload) >= chunk_size:
            assert all(len(p) <= chunk_size + 12 for p in packets)
            assert len(packets) == -(-len(payload) // chunk_size)

    check()
