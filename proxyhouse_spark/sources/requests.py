"""The request-record source.

The reference engine's only input is an HTTP request stream: each record is
``(method, uri, body)`` (reference ``dorequest``, main.go:164-226). Spark has
no HTTP-server source, so the engine models ingest as a stream/batch of
request records. For deterministic, oracle-checkable tests the stream is
*derived* from the fixture ``events`` table: each event becomes one request,
with a mix of formats (Values / TSV / CSV — main.go:189-197), URL encodings
(``%20`` vs ``+`` — exercised by ``extractTable``, main.go:323-349), invalid
rows (non-POST, non-root path, empty body — main.go:166-225), multi-row
bodies, missing trailing newlines (the TSV concat edge, main.go:194,203) and
``password=`` query params (main.go:352-363).

The derivation is written ONCE as layered SQL expressions (`LAYERS`) that are
valid in BOTH Spark SQL and DuckDB, so the Spark DataFrame and the DuckDB
oracle CTE are guaranteed to agree. Only portable constructs are used:
``CASE WHEN``, ``%``, ``||``, ``replace``, ``chr``, ``CAST(.. AS STRING)``,
``CAST(.. AS DECIMAL(18,2))``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

# Layered column derivations. Each layer may reference columns from earlier
# layers. Kept dialect-portable (Spark SQL ∩ DuckDB SQL).
LAYERS: list[list[tuple[str, str]]] = [
    [
        # request envelope ---------------------------------------------------
        (
            "method",
            "CASE WHEN event_id % 97 = 0 THEN 'GET' "
            "WHEN event_id % 101 = 0 THEN 'PUT' ELSE 'POST' END",
        ),
        ("path", "CASE WHEN event_id % 89 = 0 THEN '/stats' ELSE '/' END"),
        # format mix: mostly Values (the reference default), some TSV/CSV
        (
            "fmt",
            "CASE WHEN event_id % 10 >= 8 THEN 'TSV' "
            "WHEN event_id % 10 = 7 THEN 'CSV' ELSE 'Values' END",
        ),
        # URL-encoding style: %20 (RawQuery) vs + (form) — extractTable has a
        # distinct fallback for each (main.go:326-347)
        ("enc", "CASE WHEN event_id % 7 = 3 THEN '+' ELSE '%20' END"),
        ("recv_ts", "ts"),
        # row values rendered with fixed 2-decimal text so Spark and DuckDB
        # produce byte-identical bodies
        ("val1", "CAST(CAST(value AS DECIMAL(18,2)) AS STRING)"),
        ("val2", "CAST(CAST(value + 1 AS DECIMAL(18,2)) AS STRING)"),
        ("val3", "CAST(CAST(value + 2 AS DECIMAL(18,2)) AS STRING)"),
    ],
    [
        # decoded query param (what r.URL.Query().Get("query") yields)
        ("query", "'INSERT INTO ' || event_type || ' FORMAT ' || fmt"),
        (
            "extras",
            "CASE WHEN event_id % 11 = 0 THEN '&user=u' || CAST(user_id % 4 AS STRING) "
            "|| '&password=pw' || CAST(event_id % 5 AS STRING) "
            "WHEN event_id % 23 = 0 THEN '&password=secret' ELSE '' END",
        ),
        (
            "body_values",
            "CASE WHEN event_id % 13 = 0 THEN "
            "'(' || val1 || '),(' || val2 || '),(' || val3 || ')' "
            "ELSE '(' || val1 || ')' END",
        ),
        # TSV/CSV bodies: newline-delimited rows; event_id % 17 = 0 omits the
        # trailing newline (the reference's silent row-merge edge)
        (
            "body_lines",
            "(CASE WHEN event_id % 13 = 0 THEN "
            "val1 || chr(10) || val2 || chr(10) || val3 ELSE val1 END) "
            "|| (CASE WHEN event_id % 17 = 0 THEN '' ELSE chr(10) END)",
        ),
    ],
    [
        # raw query string (RawQuery): encoded query param + extras
        ("query_string", "'query=' || replace(query, ' ', enc) || extras"),
        (
            "body",
            "CASE WHEN event_id % 83 = 0 THEN '' "
            "WHEN fmt = 'Values' THEN body_values ELSE body_lines END",
        ),
    ],
    [
        # the grouping key: RawPath + "?" + RawQuery (main.go:187)
        ("uri", "path || '?' || query_string"),
    ],
]

# Columns exposed by the request source (order matters for schema stability).
REQUEST_COLUMNS = [
    "event_id",
    "recv_ts",
    "method",
    "path",
    "uri",
    "query",
    "query_string",
    "fmt",
    "body",
]


def requests_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch request-record source derived from ``events``."""
    from ..tables import table

    events = table(spark, sf_dir, "events")
    df = reduce(
        lambda acc, layer: acc.selectExpr("*", *[f"{expr} AS {name}" for name, expr in layer]),
        LAYERS,
        events,
    )
    return df.select(*REQUEST_COLUMNS)


def requests_cte() -> str:
    """DuckDB CTE body equivalent to :func:`requests_df` (reads the
    pre-registered ``events`` view). Returns SQL selecting REQUEST_COLUMNS."""
    sql = "SELECT * FROM events"
    for layer in LAYERS:
        cols = ", ".join(f"{expr} AS {name}" for name, expr in layer)
        sql = f"SELECT *, {cols} FROM ({sql})"
    cols = ", ".join(REQUEST_COLUMNS)
    return f"SELECT {cols} FROM ({sql})"


def requests_stream_df(spark: SparkSession, source_dir: str) -> DataFrame:
    """Streaming request-record source over a directory of Parquet request
    files (the production shape: an HTTP shim appends request batches as
    files / Kafka topics; Structured Streaming tails them — SURVEY §1.3)."""
    batch = spark.read.parquet(source_dir)
    return spark.readStream.schema(batch.schema).parquet(source_dir)
