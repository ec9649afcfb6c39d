"""Fidelity micro-tests for the scalar functions — each case is a quirk the
reference's code exhibits, cited per line (SURVEY §2.8, FIXTURES.md edge
list). These pin Go-reference semantics that the DuckDB oracle can't see
(both engines share our expression; the reference is the ground truth)."""

from pyspark.sql import functions as F

from proxyhouse_spark.functions.scalars import (
    extract_table,
    format_dispatch,
    hide_password,
    row_count,
    url_rewrite,
)


def _one(spark, col, **lits):
    df = spark.createDataFrame([tuple(lits.values())], list(lits.keys()))
    return df.select(col.alias("out")).first().out


# --- extractTable (main.go:323-349) -----------------------------------------


def test_extract_table_pct_encoded(spark):
    uri = F.lit("/?query=INSERT%20INTO%20t%20FORMAT%20Values")
    assert _one(spark, extract_table(uri), x=1) == "t"


def test_extract_table_plus_encoded_fallback(spark):
    uri = F.lit("/?query=insert+into+clicks+format+tsv")
    assert _one(spark, extract_table(uri), x=1) == "clicks"


def test_extract_table_lowercases(spark):
    # reference lowercases the whole key before scanning (main.go:325)
    uri = F.lit("/?query=INSERT%20INTO%20MyTable%20FORMAT%20Values")
    assert _one(spark, extract_table(uri), x=1) == "mytable"


def test_extract_table_end_of_string_is_unknown(spark):
    # `to > 0` check (main.go:331-334): no trailing separator → unknown
    uri = F.lit("/?query=INSERT%20INTO%20t")
    assert _one(spark, extract_table(uri), x=1) == "unknown"


def test_extract_table_no_insert(spark):
    assert _one(spark, extract_table(F.lit("/?query=SELECT%201")), x=1) == "unknown"


# --- hidePassword (main.go:352-363) ------------------------------------------


def test_hide_password_with_suffix(spark):
    out = _one(spark, hide_password(F.lit("/?password=secret&user=x")), x=1)
    assert out == "/?password=*&user=x"


def test_hide_password_at_end(spark):
    assert _one(spark, hide_password(F.lit("/?password=secret")), x=1) == "/?password=*"


def test_hide_password_absent_noop(spark):
    assert _one(spark, hide_password(F.lit("/?user=x")), x=1) == "/?user=x"


# --- rowcount arithmetic (main.go:189-197, 206) -------------------------------


def _rc(spark, body, sep, addrows):
    return _one(
        spark, row_count(F.lit(body), F.lit(sep), F.lit(addrows)), x=1
    )


def test_rowcount_values_single(spark):
    assert _rc(spark, "(1)", "),", 1) == 1


def test_rowcount_values_multi(spark):
    assert _rc(spark, "(1),(2),(3)", "),", 1) == 3


def test_rowcount_values_leading_delimiter(spark):
    # Test_Slice analog (main_test.go:19-23): a leading delimiter means the
    # count of ")," still yields rows-1; addrows compensates exactly once,
    # so a buffer that already starts with ',' counts its rows correctly.
    assert _rc(spark, ",(7499),(9999)", "),", 1) == 2


def test_rowcount_tsv_trailing_newline(spark):
    assert _rc(spark, "a\nb\n", "\n", 0) == 2


def test_rowcount_tsv_missing_trailing_newline_undercounts(spark):
    # reference counts separators only (main.go:206): last row silently
    # merges with the next request's first row — preserved behavior
    assert _rc(spark, "a\nb", "\n", 0) == 1


# --- URL rewrite (main.go:385-389) --------------------------------------------


def test_url_rewrite_prefixes_rooted_keys(spark):
    out = _one(spark, url_rewrite(F.lit("/?q=1"), "http://fwd:1", "http://old:2"), x=1)
    assert out == "http://fwd:1/?q=1"


def test_url_rewrite_replaces_first_occurrence(spark):
    out = _one(
        spark,
        url_rewrite(F.lit("http://old:2/?u=http://old:2"), "http://fwd:1", "http://old:2"),
        x=1,
    )
    # strings.Replace(..., 1): only the first occurrence rewritten
    assert out == "http://fwd:1/?u=http://old:2"


def test_url_rewrite_no_match_passthrough(spark):
    out = _one(spark, url_rewrite(F.lit("nomatch"), "f", "zzz"), x=1)
    assert out == "nomatch"


# --- format dispatch (main.go:189-197) ----------------------------------------


def test_format_dispatch(spark):
    for query, want in [
        ("INSERT INTO t FORMAT Values", (",", "),", 1)),
        ("INSERT INTO t FORMAT TSV", ("", "\n", 0)),
        ("INSERT INTO t FORMAT CSV", ("", "\n", 0)),
        ("INSERT INTO t", (",", "),", 1)),  # default is Values
    ]:
        d, s, a = format_dispatch(F.lit(query))
        df = spark.range(1).select(d.alias("d"), s.alias("s"), a.alias("a"))
        row = df.first()
        assert (row.d, row.s, row.a) == want, query
