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
