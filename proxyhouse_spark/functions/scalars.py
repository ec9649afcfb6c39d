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
# Lowercase the raw key, take the substring between the FIRST
# "insert%20into%20" marker and the FIRST "%20" after it (strings.Index
# semantics — the span may itself contain other %-escapes, e.g. %2F); an
# EMPTY span (terminator immediately after the marker) or a missing
# terminator yields "unknown" (`to > 0`, main.go:331-334) — then the same
# with the form-encoded "insert+into+" / "+" pair. NOT expressible as a
# non-greedy regex: regex backtracks past an adjacent terminator to a later
# one, Go gives up (pinned by tests/test_property_fidelity.py). Index
# arithmetic is the faithful spelling — and it's cheaper than regex anyway.
# ---------------------------------------------------------------------------

_PCT_MARKER = "insert%20into%20"
_PLUS_MARKER = "insert+into+"


def _extract_branch(low: Column, marker: str, term: str) -> Column:
    mp = F.instr(low, marker)  # 1-based; 0 = absent
    rest = F.substring(low, mp + len(marker), F.length(low))
    to = F.instr(rest, term)  # 1-based within rest; Go's `to > 0` ⇔ to > 1
    return F.when((mp > 0) & (to > 1), F.substring(rest, F.lit(1), to - 1))


def extract_table(uri: Column) -> Column:
    low = F.lower(uri)
    return F.coalesce(
        _extract_branch(low, _PCT_MARKER, "%20"),
        _extract_branch(low, _PLUS_MARKER, "+"),
        F.lit("unknown"),
    )


def _extract_branch_sql(low: str, marker: str, term: str) -> str:
    mp = f"instr({low}, '{marker}')"
    rest = f"substring({low}, {mp} + {len(marker)})"
    to = f"instr({rest}, '{term}')"
    return f"CASE WHEN {mp} > 0 AND {to} > 1 THEN substring({rest}, 1, {to} - 1) END"


def extract_table_sql(uri: str) -> str:
    """Dialect-portable fragment (instr/substring/CASE are identical in
    Spark SQL and DuckDB)."""
    low = f"lower({uri})"
    return (
        f"coalesce({_extract_branch_sql(low, _PCT_MARKER, '%20')}, "
        f"{_extract_branch_sql(low, _PLUS_MARKER, '+')}, 'unknown')"
    )


# ---------------------------------------------------------------------------
# hidePassword — reference main.go:352-363: redact "password=..." up to the
# next '&' (or end of string) with "password=*".
# ---------------------------------------------------------------------------


def hide_password(uri: Column) -> Column:
    # First-occurrence-only splice, exactly the reference's strings.Index
    # scan (a second password param stays unredacted there too): find
    # "password=", keep everything up to and incl. it, emit '*', resume at
    # the first '&' after the match (or drop the rest if none).
    pos = F.instr(uri, "password=")
    tail = F.substring(uri, pos + 9, F.length(uri))
    amp = F.instr(tail, "&")
    redacted = F.concat(
        F.substring(uri, F.lit(1), pos + 8),
        F.lit("*"),
        F.when(amp > 0, F.substring(tail, amp, F.length(tail))).otherwise(F.lit("")),
    )
    return F.when(pos > 0, redacted).otherwise(uri)


def hide_password_sql(uri: str) -> str:
    # DuckDB regexp_replace is first-match-only by default — which matches
    # the reference's first-occurrence splice semantics exactly.
    return f"regexp_replace({uri}, 'password=[^&]*', 'password=*')"


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
#   FORMAT TSV / FORMAT CSV → ("",    "\n", 0)
#   otherwise (Values)      → (delim, "),", 1)
# The Values delimiter is the operator-configurable `-delim` flag
# (main.go:38, default ","); TSV/CSV always concatenate with "" and the
# row-counting separator is NOT affected by -delim (main.go:190 fixes
# separator = "),").
# ---------------------------------------------------------------------------


def format_dispatch(query: Column, delim: str = ",") -> tuple[Column, Column, Column]:
    is_lines = query.endswith("FORMAT TSV") | query.endswith("FORMAT CSV")
    delimiter = F.when(is_lines, F.lit("")).otherwise(F.lit(delim))
    separator = F.when(is_lines, F.lit("\n")).otherwise(F.lit("),"))
    addrows = F.when(is_lines, F.lit(0)).otherwise(F.lit(1))
    return delimiter, separator, addrows


def sql_quote(s: str) -> str:
    """Single-quoted SQL string literal (portable Spark/DuckDB escaping)."""
    return "'" + s.replace("'", "''") + "'"


def format_dispatch_sql(query: str, delim: str = ",") -> dict[str, str]:
    is_lines = f"({query} LIKE '%FORMAT TSV' OR {query} LIKE '%FORMAT CSV')"
    return {
        "delimiter": f"CASE WHEN {is_lines} THEN '' ELSE {sql_quote(delim)} END",
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
