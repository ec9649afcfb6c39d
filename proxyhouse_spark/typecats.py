"""Shared output-type category maps for the Spark-vs-DuckDB parity sweeps.

The driver compares query results by stringify-then-hash, so a column Spark
types DOUBLE where the oracle returns BIGINT renders "5.0" vs "5" — the
same divergence class as round 4's DECIMAL hash-fails.  Both the standing
pytest sweep (tests/test_plans.py) and the executing sweep
(tools/type_sweep.py) classify every output column on both engines into
the categories below and require them to match.

This module is the single source of truth for those maps (ADVICE r05 #1:
the two copies could silently drift — e.g. a DuckDB timestamp alias added
to one but not the other would weaken the guarantee both sweeps claim).
"""

from __future__ import annotations

# Spark DataType.typeName() -> category.  DECIMAL handled in spark_cat().
SPARK_CAT = {
    "byte": "int", "short": "int", "integer": "int", "long": "int",
    "float": "float", "double": "float",
    "string": "string", "boolean": "bool", "binary": "binary",
    "date": "date", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
}

# DuckDB type id (str(DuckDBPyType)) -> category.  DECIMAL handled by
# prefix in duck_cat() (the id carries precision/scale, e.g. DECIMAL(18,2)).
DUCK_CAT = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "int", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int", "UHUGEINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "string", "BOOLEAN": "bool", "BLOB": "binary",
    "DATE": "date", "TIMESTAMP": "timestamp", "TIMESTAMP_NS": "timestamp",
    "TIMESTAMP_MS": "timestamp", "TIMESTAMP_S": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}


def spark_cat(dtype) -> str:
    """Category of a Spark DataType; unknown type names pass through so a
    mismatch is reported with the raw name rather than masked."""
    name = dtype.typeName()
    if name == "decimal":
        return "decimal"
    return SPARK_CAT.get(name, name)


def duck_cat(t) -> str:
    """Category of a DuckDB column type (accepts the DuckDBPyType or its
    string form); unknown ids pass through like spark_cat."""
    s = str(t)
    if s.startswith("DECIMAL"):
        return "decimal"
    return DUCK_CAT.get(s, s)
