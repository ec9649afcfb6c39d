"""Find every registered query whose Spark output schema contains a
DecimalType anywhere (top-level or nested). DuckDB oracles render those
columns as DOUBLE, so a DECIMAL output is a guaranteed (or latent,
trailing-zero-luck) driver hash mismatch — see VERDICT.md round 4.

Plan-only for batch queries; queries in tests.test_plans._EXECUTING run
real work at plan time and are executed at sf0.001 (cheap) instead.

Usage: python tools/decimal_sweep.py [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType  # noqa: E402

from proxyhouse_spark.session import get_spark  # noqa: E402


def has_decimal(dtype) -> bool:
    if isinstance(dtype, DecimalType):
        return True
    if isinstance(dtype, ArrayType):
        return has_decimal(dtype.elementType)
    if isinstance(dtype, MapType):
        return has_decimal(dtype.keyType) or has_decimal(dtype.valueType)
    if isinstance(dtype, StructType):
        return any(has_decimal(f.dataType) for f in dtype.fields)
    return False


def decimal_cols(schema: StructType) -> list[str]:
    return [f"{f.name}:{f.dataType.simpleString()}" for f in schema.fields if has_decimal(f.dataType)]


def main() -> None:
    import __spark_entry__ as e

    names = sys.argv[1:]
    qs = e.queries()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}
    spark = get_spark()
    sf = "/root/testdata/sf0.001"
    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf)
            cols = decimal_cols(df.schema)
            if cols:
                bad[name] = cols
                print(f"DECIMAL {name}: {cols}", flush=True)
        except Exception as ex:  # noqa: BLE001
            errs[name] = str(ex)[:200]
            print(f"ERR {name}: {errs[name]}", flush=True)
    print(f"\nswept {len(qs)} queries: {len(bad)} decimal-emitting, {len(errs)} errors")
    if not bad and not errs:
        print("CLEAN")


if __name__ == "__main__":
    main()
