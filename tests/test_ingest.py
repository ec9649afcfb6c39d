"""Ingest-core behavior tests: the Test_Base analog (conservation under
volume, main_test.go:26-61 — which only printed; we assert) plus per-format
concat semantics."""

import datetime as dt

from pyspark.sql import functions as F

from proxyhouse_spark.operators.ingest import buffer_aggregate, sink_frame

TS = dt.datetime(2024, 1, 1)


def _req(event_id, body, fmt="Values", uri=None, method="POST", path="/"):
    query = f"INSERT INTO t FORMAT {fmt}"
    uri = uri or f"/?query=INSERT%20INTO%20t%20FORMAT%20{fmt}"
    return (event_id, TS, method, path, uri, query, uri.split("?")[1], fmt, body)

COLS = ["event_id", "recv_ts", "method", "path", "uri", "query", "query_string", "fmt", "body"]


def test_rowcount_conservation_10k(spark):
    """10,000 single-row inserts → one buffer with rowcount 10,000
    (what Test_Base eyeballed, asserted)."""
    rows = [_req(i, f"({i})") for i in range(10_000)]
    df = spark.createDataFrame(rows, COLS)
    out = buffer_aggregate(df).collect()
    assert len(out) == 1
    assert out[0].rowcount == 10_000
    assert out[0].n_requests == 10_000
    assert out[0].buffer.count("),(") == 9_999


def test_values_concat_joins_with_comma(spark):
    df = spark.createDataFrame([_req(1, "(1)"), _req(2, "(2),(3)")], COLS)
    out = buffer_aggregate(df).collect()[0]
    assert out.rowcount == 3
    # canonical order: bodies sorted lexicographically within the key
    assert out.buffer == "(1),(2),(3)"


def test_tsv_concat_joins_with_empty_delimiter(spark):
    df = spark.createDataFrame(
        [_req(1, "a\nb\n", fmt="TSV"), _req(2, "c\n", fmt="TSV")], COLS
    )
    out = buffer_aggregate(df).collect()[0]
    assert out.buffer == "a\nb\nc\n"
    assert out.rowcount == 3


def test_distinct_uris_stay_separate_keys(spark):
    """Grouping is by exact URI string: same table, different format/params
    = different key (main.go:187, README.md:45-58)."""
    df = spark.createDataFrame(
        [
            _req(1, "(1)", uri="/?query=INSERT%20INTO%20t%20FORMAT%20Values"),
            _req(2, "x\n", fmt="TSV", uri="/?query=INSERT%20INTO%20t%20FORMAT%20TSV"),
        ],
        COLS,
    )
    assert buffer_aggregate(df).count() == 2


def test_invalid_requests_rejected(spark):
    df = spark.createDataFrame(
        [
            _req(1, "(1)"),
            _req(2, "(2)", method="GET"),      # status endpoint, not data
            _req(3, "(3)", path="/stats"),     # 404 (main.go:166-169)
            _req(4, ""),                       # 405 empty body (main.go:219-221)
        ],
        COLS,
    )
    out = buffer_aggregate(df).collect()
    assert len(out) == 1 and out[0].rowcount == 1


def test_sink_frame_rewrites_and_extracts(spark):
    df = spark.createDataFrame([_req(1, "(1)")], COLS)
    row = sink_frame(df, fwd="http://ch:8123", repl="http://old").collect()[0]
    assert row.target_url.startswith("http://ch:8123/?query=")
    assert row.table_name == "t"


def test_custom_delim_round_trip(spark):
    """The -delim flag (main.go:38): Values bodies join with the
    configured delimiter; the row-count separator stays '),' so counts
    are delim-independent; values_parse reconciles across BOTH the
    intra-body '),(' and the inter-body ')<delim>(' boundaries."""
    from proxyhouse_spark.operators.ingest import values_parse

    df = spark.createDataFrame([_req(1, "(1)"), _req(2, "(2),(3)")], COLS)
    out = buffer_aggregate(df, delim=";").collect()[0]
    assert out.buffer == "(1);(2),(3)"
    assert out.rowcount == 3
    parsed = values_parse(df, delim=";").collect()[0]
    assert parsed.n_parsed == 3 and parsed.matched

    # TSV concat ignores -delim entirely (main.go:194 resets it to "")
    tsv = spark.createDataFrame(
        [_req(1, "a\n", fmt="TSV"), _req(2, "b\n", fmt="TSV")], COLS
    )
    assert buffer_aggregate(tsv, delim=";").collect()[0].buffer == "a\nb\n"
