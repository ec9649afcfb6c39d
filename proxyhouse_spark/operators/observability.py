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
from pyspark.sql import functions as F

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


def gelf_packet_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_gelf_packet's hash-oracled surface (VERDICT r08 #4 — previously
    rows-only): zlib output bytes are implementation-defined, so the raw
    packed_len/n_chunks/wire_bytes columns cannot be cross-engine — but
    the LAWS relating them can, and the JSON length can be recomputed by
    the oracle from pure string arithmetic. Emitted per message:

    - json_len: the ACTUAL encoded byte length from the Python encoder;
      the DuckDB oracle independently recomputes it from the template
      length + per-character escape arithmetic (Go HTML escaping of
      ``& < >`` costs 5 extra bytes each; ``\\n``/quote/backslash/tab/CR
      cost 1) — a real cross-engine value, not a verdict.
    - chunks_ok: n_chunks == 1 if packed_len < GELF_CHUNK_SIZE (raw
      datagram, graylog.go:168) else ceil(packed_len / GELF_CHUNK_SIZE).
    - wire_ok: wire_bytes == packed_len (+ 12-byte GELF header per chunk
      when chunked: magic 2 + id 8 + seq 1 + count 1).
    - chunked_ok: the chunked flag is exactly (n_chunks > 1).
    - pack_ok: zlib size sanity — 8 ≤ packed_len ≤ json_len + 64 (zlib
      worst case for sub-16KB inputs is len + 11; 64 is slack).

    Byte-exact packing/chunking stays pinned by tests/test_graylog.py
    (the port of the reference's golden test, graylog_test.go:42-68)."""
    pk = gelf_packets(spark, sf_dir)
    c = GELF_CHUNK_SIZE
    packed = F.col("packed_len")
    expected_chunks = F.when(packed < c, F.lit(1).cast("int")).otherwise(
        F.ceil(packed / c).cast("int")
    )
    expected_wire = F.when(packed < c, packed).otherwise(
        packed + 12 * F.col("n_chunks")
    )
    return pk.select(
        "event_id",
        "json_len",
        (F.col("n_chunks") == expected_chunks).cast("int").alias("chunks_ok"),
        (F.col("wire_bytes") == expected_wire).cast("int").alias("wire_ok"),
        (F.col("chunked") == (F.col("n_chunks") > 1))
        .cast("int")
        .alias("chunked_ok"),
        ((packed >= 8) & (packed <= F.col("json_len") + 64))
        .cast("int")
        .alias("pack_ok"),
    )


def _json_base() -> int:
    """Template byte length of the GELF JSON with empty host/messages and a
    one-digit timestamp placeholder (subtracted), computed from the REAL
    encoder so the constant can never drift from it."""
    from ..sinks.graylog import gelf_json

    return (
        len(
            gelf_json(
                {
                    "version": GELF_VERSION,
                    "host": "",
                    "timestamp": 0,
                    "file": GELF_FILENAME,
                    "level": LEVEL_ERROR,
                    "short_message": "",
                    "full_message": "",
                }
            )
        )
        - 1  # the '0' timestamp placeholder
    )


def _esc_len_sql(col: str) -> str:
    """Escaped byte length of ``col`` under the Go-compatible encoder, as
    portable SQL: raw bytes + 1 per two-char escape (quote, backslash,
    \\n, \\t, \\r) + 5 per ``\\u00XX`` HTML escape (& < >). The fixture
    stream contains no other control characters or U+2028/9 — if data-gen
    ever adds one, the oracle undercounts and the differential fails
    LOUDLY rather than silently agreeing. DuckDB dialect: ``strlen`` is
    its VARCHAR byte-length (octet_length there is BLOB/BIT-only)."""
    n = lambda ch: f"(length({col}) - length(replace({col}, {ch}, '')))"
    one = " + ".join(n(ch) for ch in ("chr(34)", "chr(92)", "chr(10)", "chr(9)", "chr(13)"))
    five = " + ".join(n(ch) for ch in ("'&'", "'<'", "'>'"))
    return f"(strlen({col}) + {one} + 5 * ({five}))"


def gelf_packets_oracle(valid_cte: str) -> str:
    """DuckDB twin of gelf_packet_law: json_len recomputed from string
    arithmetic over the SAME message columns the format oracle builds;
    the packetization laws (zlib-dependent) declared as all-ones."""
    return (
        valid_cte
        + ", m AS (SELECT event_id, recv_ts, "
        + _MSG
        + " AS msg FROM valid), g AS ("
        + _gelf_select("epoch_us(recv_ts) // 1000000")
        + f""")
        SELECT event_id,
               CAST({_json_base()} + length(host)
                    + length(CAST("timestamp" AS STRING))
                    + {_esc_len_sql('short_message')}
                    + {_esc_len_sql('full_message')} AS BIGINT) AS json_len,
               CAST(1 AS INT) AS chunks_ok, CAST(1 AS INT) AS wire_ok,
               CAST(1 AS INT) AS chunked_ok, CAST(1 AS INT) AS pack_ok
        FROM g
        """
    )


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
