"""Layout-operator unit tests: the Morton bit-spread against an
executable Python spec, across both engine dialects (the
test_property_fidelity discipline: seeded adversarial inputs, one
DataFrame pass, case-for-case agreement)."""

import random

import duckdb

from proxyhouse_spark.operators.layout import _spread


def _py_spread(x: int) -> int:
    """Executable spec: interleave zeros between the low 16 bits."""
    x &= 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _cases() -> list[int]:
    rng = random.Random(20260814)
    edge = [0, 1, 2, 0xFF, 0x100, 0x5555, 0xAAAA, 0xFFFF, 0x10000, 0xFFFFF]
    return edge + [rng.randrange(0, 1 << 20) for _ in range(200)]


def test_spread_matches_python_spec_both_dialects(spark):
    cases = _cases()
    expected = {i: _py_spread(v) for i, v in enumerate(cases)}

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cases)], "i INT, x BIGINT"
    )
    df.createOrReplaceTempView("spread_cases")
    got_spark = {
        r.i: r.s
        for r in spark.sql(
            f"SELECT i, {_spread('x')} AS s FROM spread_cases"
        ).collect()
    }
    assert got_spark == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE spread_cases(i INT, x BIGINT)")
    con.executemany(
        "INSERT INTO spread_cases VALUES (?, ?)", list(enumerate(cases))
    )
    got_duck = dict(
        con.execute(f"SELECT i, {_spread('x')} FROM spread_cases").fetchall()
    )
    assert got_duck == expected


def test_spread_interleave_properties():
    """Structural properties the z-value relies on: spread bits occupy
    only even positions (so two spreads interleave without overlap), and
    spreading is strictly monotone on the 16-bit domain (z-order
    preserves per-dimension order)."""
    prev = -1
    for v in range(0, 1 << 16, 257):
        s = _py_spread(v)
        assert s & 0xAAAAAAAA == 0  # odd bit positions stay clear
        assert s > prev  # strictly increasing
        prev = s
