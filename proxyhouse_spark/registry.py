"""Query registry — the contract surface of SURVEY.md §2.

Every implemented operator is registered here twice:

- ``QUERIES[name]``: ``(spark, sf_dir) -> DataFrame`` — the Spark-first
  implementation;
- ``ORACLES[name]``: equivalent DuckDB SQL over the pre-registered fixture
  views — the differential-correctness oracle.

Column names/aliases match exactly between the two (the driver sorts columns
by name and hashes values). Operators without a SQL-expressible oracle
(streaming behavior, LSH internals) are registered in QUERIES only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import scalars
from .operators import ingest
from .sources.requests import requests_cte, requests_df

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared oracle CTE prefixes for the ingest family
# ---------------------------------------------------------------------------

_REQ = f"WITH requests AS ({requests_cte()})"
_VALID = (
    _REQ
    + ", valid AS (SELECT * FROM requests WHERE method = 'POST' AND path = '/' "
    "AND length(body) > 0)"
)
_dispatch = scalars.format_dispatch_sql("query")
_FMTD = (
    _VALID
    + f", fmtd AS (SELECT *, {_dispatch['delimiter']} AS delimiter, "
    f"{_dispatch['separator']} AS separator, {_dispatch['addrows']} AS addrows FROM valid)"
)
_COUNTED = (
    _FMTD
    + f", counted AS (SELECT *, {scalars.row_count_sql('body', 'separator', 'addrows')} "
    "AS n_rows FROM fmtd)"
)


# ---------------------------------------------------------------------------
# S1: ingest source (validated request stream) — SURVEY §2.1 S1
# ---------------------------------------------------------------------------


@register(
    "q_ingest_source",
    _VALID + " SELECT event_id, recv_ts, method, path, uri, query, fmt, body FROM valid",
)
def q_ingest_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accept only POST / non-empty-body requests at '/' (main.go:164-226)."""
    df = ingest.validate_requests(requests_df(spark, sf_dir))
    return df.select("event_id", "recv_ts", "method", "path", "uri", "query", "fmt", "body")


# ---------------------------------------------------------------------------
# P1-P3: rejection filters — SURVEY §2.2
# ---------------------------------------------------------------------------


@register(
    "q_filter_method",
    _REQ + " SELECT method, CAST(count(*) AS BIGINT) AS n FROM requests GROUP BY method",
)
def q_filter_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method dispatch census (main.go:171-225): POST=data, GET=status, else 405."""
    return requests_df(spark, sf_dir).groupBy("method").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_filter_path",
    _REQ + " SELECT path, CAST(count(*) AS BIGINT) AS n FROM requests GROUP BY path",
)
def q_filter_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-root paths are 404s (main.go:166-169)."""
    return requests_df(spark, sf_dir).groupBy("path").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_filter_body",
    _REQ + " SELECT event_id, uri FROM requests WHERE method = 'POST' AND length(body) = 0",
)
def q_filter_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-body POSTs are 405s (main.go:219-221)."""
    df = requests_df(spark, sf_dir)
    return df.filter((F.col("method") == "POST") & (F.length("body") == 0)).select(
        "event_id", "uri"
    )


# ---------------------------------------------------------------------------
# P4/P5: key projection + format dispatch — SURVEY §2.2
# ---------------------------------------------------------------------------


@register("q_project_key", _VALID + " SELECT event_id, uri FROM valid")
def q_project_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key = RawPath + '?' + RawQuery (main.go:187)."""
    df = ingest.validate_requests(requests_df(spark, sf_dir))
    return df.select("event_id", "uri")


@register(
    "q_format_dispatch",
    _FMTD + " SELECT event_id, fmt, delimiter, separator, addrows FROM fmtd",
)
def q_format_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(delimiter, separator, addrows) from the query suffix (main.go:189-197)."""
    df = ingest.with_format(ingest.validate_requests(requests_df(spark, sf_dir)))
    return df.select("event_id", "fmt", "delimiter", "separator", "addrows")


# ---------------------------------------------------------------------------
# A1+A2: the core keyed concat aggregation — SURVEY §2.4
# ---------------------------------------------------------------------------

_CONCAT_SELECT = (
    " SELECT uri, fmt, CASE WHEN fmt = 'Values' THEN string_agg(body, ',' ORDER BY body) "
    "ELSE string_agg(body, '' ORDER BY body) END AS buffer, "
    "CAST(sum(n_rows) AS BIGINT) AS rowcount, CAST(count(*) AS BIGINT) AS n_requests "
    "FROM counted GROUP BY uri, fmt"
)


@register("q_groupby_concat", _COUNTED + _CONCAT_SELECT)
def q_groupby_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Buffer build: concat bodies + running rowcount (main.go:198-208)."""
    return ingest.buffer_aggregate(requests_df(spark, sf_dir))


@register("q_rowcount", _COUNTED + " SELECT event_id, n_rows FROM counted")
def q_rowcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-request rowcount arithmetic: addrows + count(body, sep) (main.go:206)."""
    df = ingest.with_row_count(
        ingest.with_format(ingest.validate_requests(requests_df(spark, sf_dir)))
    )
    return df.select("event_id", "n_rows")


# ---------------------------------------------------------------------------
# F1/F2/S3: scalar fidelity — SURVEY §2.8, §2.1
# ---------------------------------------------------------------------------


@register(
    "q_extract_table",
    _VALID
    + f" SELECT DISTINCT uri, {scalars.extract_table_sql('uri')} AS table_name FROM valid",
)
def q_extract_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-name extraction incl. %20/+ fallback chain (main.go:323-349)."""
    df = ingest.validate_requests(requests_df(spark, sf_dir))
    return df.select(
        "uri", scalars.extract_table(F.col("uri")).alias("table_name")
    ).distinct()


@register(
    "q_hide_password",
    _VALID
    + f" SELECT DISTINCT uri, {scalars.hide_password_sql('uri')} AS redacted FROM valid",
)
def q_hide_password(spark: SparkSession, sf_dir: str) -> DataFrame:
    """password=… → password=* redaction (main.go:352-363)."""
    df = ingest.validate_requests(requests_df(spark, sf_dir))
    return df.select(
        "uri", scalars.hide_password(F.col("uri")).alias("redacted")
    ).distinct()


@register(
    "q_url_rewrite",
    _VALID
    + " SELECT DISTINCT uri, "
    + scalars.url_rewrite_sql("uri", ingest.FWD_HOST, ingest.REPL_HOST)
    + " AS target_url FROM valid",
)
def q_url_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-host URL rewrite (main.go:385-389)."""
    df = ingest.validate_requests(requests_df(spark, sf_dir))
    return df.select(
        "uri",
        scalars.url_rewrite(F.col("uri"), ingest.FWD_HOST, ingest.REPL_HOST).alias(
            "target_url"
        ),
    ).distinct()


# ---------------------------------------------------------------------------
# S2: batch sink frame — SURVEY §2.1 S2
# ---------------------------------------------------------------------------


@register(
    "q_batch_sink",
    _COUNTED
    + " , agg AS ("
    + _CONCAT_SELECT
    + ") SELECT uri, "
    + scalars.url_rewrite_sql("uri", ingest.FWD_HOST, ingest.REPL_HOST)
    + " AS target_url, "
    + scalars.extract_table_sql("uri")
    + " AS table_name, buffer, rowcount, n_requests FROM agg",
)
def q_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One outbound request per distinct key per flush (send(), main.go:376-445)."""
    return ingest.sink_frame(requests_df(spark, sf_dir))
