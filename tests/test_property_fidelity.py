"""Seeded adversarial differential tests for the scalar fidelity functions.

`_go_*` below are line-faithful Python ports of the reference's Go
(/root/reference/main.go:323-363, 189-206) — the executable spec. A seeded
generator produces adversarial inputs (markers without terminators,
%-escapes inside table names, multiple markers, multiple password params,
`),` inside values, missing trailing newlines) far outside what the
fixture stream contains; the Spark expressions must agree case-for-case.
One DataFrame, one pass — not per-example queries.
"""

import random

from pyspark.sql import functions as F

from proxyhouse_spark.functions import scalars

# --- executable spec: Go ports ---------------------------------------------


def _go_extract_table(key: str) -> str:  # main.go:323-349
    table = "unknown"
    lowkey = key.lower()
    if "insert%20into%20" in lowkey:
        frm = lowkey.index("insert%20into%20") + len("insert%20into%20")
        to = lowkey[frm:].find("%20")
        if to > 0:
            table = lowkey[frm : to + frm]
    if table == "unknown" and "insert+into+" in lowkey:
        frm = lowkey.index("insert+into+") + len("insert+into+")
        to = lowkey[frm:].find("+")
        if to > 0:
            table = lowkey[frm : to + frm]
    return table


def _go_hide_password(s: str) -> str:  # main.go:352-363
    replace = "password="
    pos = s.find(replace)
    if pos < 0:
        return s
    pos2 = s[pos:].find("&")
    if pos2 < 0:
        return s[: pos + len(replace)] + "*"
    return s[: pos + len(replace)] + "*" + s[pos + pos2 :]


def _go_row_count(body: str, fmt: str) -> int:  # main.go:189-206
    if fmt in ("TSV", "CSV"):
        return body.count("\n")
    return 1 + body.count("),")


# --- adversarial generators -------------------------------------------------

TOKENS = [
    "insert%20into%20", "insert+into+", "%20", "+", "t1", "TaB%2fle", "%",
    "&", "password=", "pw123", "", "query=", "/", "INSERT%20INTO%20", "x",
]


def _rand_str(rng: random.Random) -> str:
    return "".join(rng.choice(TOKENS) for _ in range(rng.randint(0, 8)))


BODY_TOKENS = ["(1)", "),(", "(a),(b)", "),", "\n", "a\tb", "", "(x,y)", ")"]


def _rand_body(rng: random.Random) -> str:
    return "".join(rng.choice(BODY_TOKENS) for _ in range(rng.randint(0, 6)))


N_CASES = 600


def test_scalar_fidelity_against_go_port(spark):
    rng = random.Random(0xC0FFEE)
    uris = [_rand_str(rng) for _ in range(N_CASES)]
    bodies = [_rand_body(rng) for _ in range(N_CASES)]
    fmts = [rng.choice(["Values", "TSV", "CSV"]) for _ in range(N_CASES)]

    rows = list(zip(range(N_CASES), uris, bodies, fmts))
    df = spark.createDataFrame(rows, ["i", "uri", "body", "fmt"])
    is_lines = F.col("fmt").isin("TSV", "CSV")
    sep = F.when(is_lines, F.lit("\n")).otherwise(F.lit("),"))
    addrows = F.when(is_lines, F.lit(0)).otherwise(F.lit(1))
    out = df.select(
        "i",
        scalars.extract_table(F.col("uri")).alias("tbl"),
        scalars.hide_password(F.col("uri")).alias("red"),
        scalars.row_count(F.col("body"), sep, addrows).alias("rc"),
    ).collect()

    mismatches = []
    for r in out:
        i = r.i
        exp = (_go_extract_table(uris[i]), _go_hide_password(uris[i]),
               _go_row_count(bodies[i], fmts[i]))
        got = (r.tbl, r.red, r.rc)
        if got != exp:
            mismatches.append((i, uris[i], bodies[i], fmts[i], exp, got))
    assert not mismatches, mismatches[:5]


# --- minhash primitive parity: Spark expressions vs DuckDB, adversarial ----


def test_minhash_signature_parity_spark_vs_duckdb(spark):
    """The dedup family's foundation: token-md5 ints, rolling-polynomial
    shingle ids, and the 8 multiply-mod minhashes must be BIT-identical
    between engines on adversarial texts (repeats, short docs, unicode,
    digits, single token) — a one-ulp-style divergence here silently
    corrupts every near-dup pair downstream."""
    import duckdb

    from proxyhouse_spark.functions import text as T

    rng = random.Random(0xA11CE)
    vocab = ["join", "hash", "α-β", "x1", "9", "scan", "", "the", "çedilla"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for _ in range(60)
    ] + ["solo", "a b", "x x x x x x x x"]
    rows = [(i, d) for i, d in enumerate(docs)]

    sdf = spark.createDataFrame(rows, "doc_id INT, text STRING")
    sig_exprs = [f"{T.minhash_spark(s)} AS m{s}" for s in range(T.N_HASHES)]
    got = (
        sdf.selectExpr("doc_id", "text", f"{T.TOKS_SPARK} AS toks")
        .selectExpr("doc_id", "text", f"{T.token_ints_spark()} AS th")
        .selectExpr("doc_id", f"{T.shingle_ints_spark()} AS sh")
        .selectExpr("doc_id", "sh", *sig_exprs)
        .orderBy("doc_id")
        .collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    duck_sigs = ", ".join(f"{T.minhash_duck(s)} AS m{s}" for s in range(T.N_HASHES))
    want = con.execute(
        f"""
        WITH tk AS (SELECT doc_id, text, {T.TOKS_DUCK} AS toks FROM docs),
        th AS (SELECT doc_id, text, {T.token_ints_duck()} AS th FROM tk),
        sh AS (SELECT doc_id, {T.shingle_ints_duck()} AS sh FROM th)
        SELECT doc_id, sh, {duck_sigs} FROM sh ORDER BY doc_id
        """
    ).fetchall()

    assert len(got) == len(want)
    for srow, drow in zip(got, want):
        assert srow.doc_id == drow[0]
        # SET equality: DuckDB's list_distinct does not preserve order
        # (Spark's array_distinct does); every consumer is order-free
        # (array_min, size, array_intersect), so the contract is the set
        assert sorted(srow.sh) == sorted(drow[1]), f"shingles diverge doc {srow.doc_id}"
        for s in range(T.N_HASHES):
            assert srow[f"m{s}"] == drow[2 + s], f"m{s} diverges doc {srow.doc_id}"


# --- buffer append parity under arbitrary -delim ----------------------------


def _go_buffer(bodies: list[str], fmt: str, delim: str) -> tuple[str, int]:
    """Line-faithful port of the Buffer append loop (main.go:189-206) over
    a request sequence, with bodies pre-sorted to the engine's canonical
    order (the reference's arrival order is nondeterministic under
    concurrency — README.md:69-75 — so order-insensitive comparison is
    the documented contract)."""
    delimiter = delim if fmt == "Values" else ""
    sep, addrows = ("\n", 0) if fmt in ("TSV", "CSV") else ("),", 1)
    buf, rc = "", 0
    for body in sorted(bodies):
        if buf:
            buf += delimiter
        buf += body
        rc += addrows + body.count(sep)
    return buf, rc


def test_buffer_aggregate_matches_go_for_any_delim(spark):
    """The -delim flag (main.go:38) across adversarial bodies — including
    bodies CONTAINING the active delimiter — must reproduce the Go append
    byte-for-byte and the rowcount arithmetic exactly."""
    from proxyhouse_spark.operators.ingest import buffer_aggregate

    rng = random.Random(0xDE117)
    for delim in (",", ";", "||", "\t", "-,-"):
        reqs = []
        expected = {}
        for key in range(12):
            fmt = rng.choice(["Values", "TSV", "CSV"])
            uri = f"/?query=INSERT%20INTO%20t{key}%20FORMAT%20{fmt}"
            bodies = [
                _rand_body(rng) + rng.choice(["", delim])
                for _ in range(rng.randint(1, 5))
            ]
            bodies = [b or "(0)" for b in bodies]  # empty body = rejected
            expected[uri] = _go_buffer(bodies, fmt, delim)
            query = f"INSERT INTO t{key} FORMAT {fmt}"
            for j, b in enumerate(bodies):
                reqs.append(
                    (key * 100 + j, "POST", "/", uri, query, fmt, b)
                )
        df = spark.createDataFrame(
            reqs,
            "event_id bigint, method string, path string, uri string, "
            "query string, fmt string, body string",
        )
        out = {r.uri: (r.buffer, r.rowcount)
               for r in buffer_aggregate(df, delim=delim).collect()}
        assert out == expected, (delim, {
            k: (out.get(k), expected[k]) for k in expected
            if out.get(k) != expected[k]
        })
