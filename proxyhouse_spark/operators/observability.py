"""Observability-plane operators: GELF log-record construction.

The reference ships errors to Graylog as GELF messages
(/root/reference/graylog.go:121-141): short_message is the full message
when it's under 128 chars; otherwise the prefix up to the first newline,
unless that newline is absent or past index 128, in which case the first
125 chars + ``'...'``. ``gelf_format`` reproduces that truncation exactly
as a portable expression (the zlib/UDP transport is out of the data
plane — SURVEY §2.1 S6; the reference's lost-final-chunk bug,
graylog.go:182-190, is deliberately not reproduced).

The message text is the send-error line the reference logs (uri +
response body), built from the request stream so TSV bodies contribute
embedded newlines and all three truncation branches are exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.requests import requests_df
from .ingest import validate_requests

GELF_VERSION = "1.1"
LEVEL_ERROR = 3

# Portable (Spark SQL ∩ DuckDB): CASE/instr/substr/||/chr.
_MSG = "'proxyhouse send error uri=' || uri || ' resp=' || body || ' / ' || body"

_SHORT = (
    "CASE WHEN length(msg) < 128 THEN msg "
    "WHEN instr(msg, chr(10)) = 0 OR instr(msg, chr(10)) > 129 "
    "THEN substr(msg, 1, 125) || '...' "
    "ELSE substr(msg, 1, instr(msg, chr(10)) - 1) END"
)

_HOST = "'proxy-' || CAST(event_id % 4 AS STRING)"


def _gelf_select(epoch_expr: str) -> str:
    return (
        f"SELECT event_id, '{GELF_VERSION}' AS version, {_HOST} AS host, "
        f"{epoch_expr} AS timestamp, {LEVEL_ERROR} AS level, "
        f"{_SHORT} AS short_message, msg AS full_message "
        "FROM m"
    )


def gelf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    validate_requests(requests_df(spark, sf_dir)).createOrReplaceTempView("valid_req")
    return spark.sql(
        "WITH m AS (SELECT event_id, recv_ts, " + _MSG + " AS msg FROM valid_req) "
        + _gelf_select(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', recv_ts)"
        )
    )


# Small on purpose, and sitting at the fixture's packed-size median
# (168-218 bytes at sf0.01) so BOTH wire paths — raw datagram and chunked —
# are exercised by the registered query, not just by unit tests.
GELF_CHUNK_SIZE = 180
GELF_FILENAME = "proxyhouse"

PACKET_SCHEMA = (
    "event_id bigint, json_len bigint, packed_len bigint, n_chunks int, "
    "wire_bytes bigint, chunked boolean"
)


def gelf_packets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-message wire-level packetization metadata: marshal each GELF
    record with the Go-compatible encoder, zlib-pack, chunk at
    GELF_CHUNK_SIZE (sinks/graylog.py = graylog.go:143-191 semantics with
    its two transport bugs fixed), and report deterministic sizes/counts.

    Arrow-batched ``mapInPandas`` — the same shape the real UDP emission
    would take on executors (pack+send per partition, no driver
    involvement); here the datagrams are measured, not transmitted.
    zlib output is implementation-defined → rows-only driver check; the
    byte-exact behavior is pinned by tests/test_graylog.py instead."""
    from collections.abc import Iterator

    import pandas as pd

    base = gelf_format(spark, sf_dir)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..sinks import graylog as gl

        for pdf in batches:
            out = {k: [] for k in (
                "event_id", "json_len", "packed_len", "n_chunks",
                "wire_bytes", "chunked",
            )}
            for r in pdf.itertuples():
                message = {
                    "version": r.version,
                    "host": r.host,
                    "timestamp": int(r.timestamp),
                    "file": GELF_FILENAME,
                    "level": int(r.level),
                    "short_message": r.short_message,
                    "full_message": r.full_message,
                }
                jsondata = gl.gelf_json(message)
                payload = gl.pack_message(message)
                # message id = record key, not a counter: idempotent retries
                packets = gl.chunk_packets(payload, r.event_id, GELF_CHUNK_SIZE)
                out["event_id"].append(r.event_id)
                out["json_len"].append(len(jsondata))
                out["packed_len"].append(len(payload))
                out["n_chunks"].append(len(packets))
                out["wire_bytes"].append(sum(len(p) for p in packets))
                out["chunked"].append(len(packets) > 1)
            yield pd.DataFrame(out)

    return base.mapInPandas(pack, PACKET_SCHEMA)


def gelf_format_oracle(valid_cte: str) -> str:
    """DuckDB equivalent; ``valid_cte`` is the registry's validated-request
    CTE prefix (``WITH requests AS (...), valid AS (...)``)."""
    return (
        valid_cte
        + ", m AS (SELECT event_id, recv_ts, "
        + _MSG
        + " AS msg FROM valid) "
        + _gelf_select("epoch_us(recv_ts) // 1000000")
    )
