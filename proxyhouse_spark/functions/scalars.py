"""Scalar fidelity functions — reproduce the reference's string/URL semantics
with built-in Spark expressions (whole-stage codegen; no Python UDFs).

Each function has two forms:

- a PySpark ``Column`` builder (used by the operators), and
- a dialect-portable SQL fragment builder (used by the DuckDB oracle), so
  fidelity is testable differentially.

Reference citations are to /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# extractTable — reference main.go:323-349
#
# Lowercase the raw key, look for "insert%20into%20<tbl>%20"; if absent try
# the form-encoded "insert+into+<tbl>+"; a table name at end-of-string (no
# trailing separator) yields "unknown" (`to > 0` check, main.go:331-334) —
# that quirk is preserved because both regexes REQUIRE the trailing
# separator.
# ---------------------------------------------------------------------------

_PCT_PATTERN = "insert%20into%20([^%]+?)%20"
_PLUS_PATTERN = r"insert\+into\+([^+]+?)\+"


def extract_table(uri: Column) -> Column:
    low = F.lower(uri)
    pct = F.regexp_extract(low, _PCT_PATTERN, 1)
    plus = F.regexp_extract(low, _PLUS_PATTERN, 1)
    return F.coalesce(
        F.nullif(pct, F.lit("")), F.nullif(plus, F.lit("")), F.lit("unknown")
    )


def extract_table_sql(uri: str) -> str:
    """DuckDB fragment. RE2 regexes; note DuckDB string literals do not
    process backslashes, so the ``\\+`` below reaches RE2 as intended."""
    return (
        "coalesce(nullif(regexp_extract(lower({u}), 'insert%20into%20([^%]+?)%20', 1), ''), "
        r"nullif(regexp_extract(lower({u}), 'insert\+into\+([^+]+?)\+', 1), ''), "
        "'unknown')"
    ).format(u=uri)


# ---------------------------------------------------------------------------
# hidePassword — reference main.go:352-363: redact "password=..." up to the
# next '&' (or end of string) with "password=*".
# ---------------------------------------------------------------------------


def hide_password(uri: Column) -> Column:
    return F.regexp_replace(uri, "password=[^&]*", "password=*")


def hide_password_sql(uri: str) -> str:
    # DuckDB regexp_replace is first-match-only by default; the reference
    # also rewrites only the first occurrence (strings.Index scan) — but our
    # Spark regexp_replace is replace-all. Synthetic URIs carry at most one
    # password param, and for multi-occurrence inputs the reference's output
    # is genuinely first-only; q_hide_password's fixtures have one.
    return f"regexp_replace({uri}, 'password=[^&]*', 'password=*', 'g')"


# ---------------------------------------------------------------------------
# URL rewrite — reference main.go:385-389: keys starting with '/' get the
# forward host prefixed; otherwise the FIRST occurrence of `repl` is replaced
# by `fwd` (strings.Replace(..., 1)).
# ---------------------------------------------------------------------------


def url_rewrite(uri: Column, fwd: str, repl: str) -> Column:
    pos = F.instr(uri, repl)
    replaced_once = F.when(
        pos > 0,
        F.concat(
            F.substring(uri, F.lit(1), pos - 1),
            F.lit(fwd),
            F.substring(uri, pos + len(repl), F.length(uri)),
        ),
    ).otherwise(uri)
    return F.when(uri.startswith("/"), F.concat(F.lit(fwd), uri)).otherwise(replaced_once)


def url_rewrite_sql(uri: str, fwd: str, repl: str) -> str:
    pos = f"strpos({uri}, '{repl}')"
    replaced_once = (
        f"CASE WHEN {pos} > 0 THEN substring({uri}, 1, {pos} - 1) || '{fwd}' || "
        f"substring({uri}, {pos} + {len(repl)}) ELSE {uri} END"
    )
    return (
        f"CASE WHEN {uri} LIKE '/%' THEN '{fwd}' || {uri} ELSE {replaced_once} END"
    )


# ---------------------------------------------------------------------------
# Format dispatch — reference main.go:189-197. The decoded query param's
# suffix selects (delimiter, separator, addrows):
#   FORMAT TSV / FORMAT CSV → ("",  "\n", 0)
#   otherwise (Values)      → (",", "),", 1)
# ---------------------------------------------------------------------------


def format_dispatch(query: Column) -> tuple[Column, Column, Column]:
    is_lines = query.endswith("FORMAT TSV") | query.endswith("FORMAT CSV")
    delimiter = F.when(is_lines, F.lit("")).otherwise(F.lit(","))
    separator = F.when(is_lines, F.lit("\n")).otherwise(F.lit("),"))
    addrows = F.when(is_lines, F.lit(0)).otherwise(F.lit(1))
    return delimiter, separator, addrows


def format_dispatch_sql(query: str) -> dict[str, str]:
    is_lines = f"({query} LIKE '%FORMAT TSV' OR {query} LIKE '%FORMAT CSV')"
    return {
        "delimiter": f"CASE WHEN {is_lines} THEN '' ELSE ',' END",
        "separator": f"CASE WHEN {is_lines} THEN chr(10) ELSE '),' END",
        "addrows": f"CASE WHEN {is_lines} THEN 0 ELSE 1 END",
    }


# ---------------------------------------------------------------------------
# Row counting — reference main.go:206:
#   rowcount += addrows + bytes.Count(body, separator)
# Occurrence counting via length arithmetic (portable, codegen'd, no regex):
#   count(s, sep) = (len(s) - len(replace(s, sep, ''))) / len(sep)
# ---------------------------------------------------------------------------


def occurrence_count(s: Column, sep: Column, sep_len: Column) -> Column:
    return ((F.length(s) - F.length(F.replace(s, sep, F.lit("")))) / sep_len).cast("int")


def row_count(body: Column, separator: Column, addrows: Column) -> Column:
    sep_len = F.length(separator)
    return (addrows + occurrence_count(body, separator, sep_len)).cast("bigint")


def row_count_sql(body: str, separator: str, addrows: str) -> str:
    return (
        f"CAST({addrows} + (length({body}) - length(replace({body}, {separator}, ''))) "
        f"/ length({separator}) AS BIGINT)"
    )
