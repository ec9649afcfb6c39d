"""Fixture-table loaders.

The driver materializes the TPC-H-ish star schema plus ``events``,
``documents`` and ``embeddings`` as Parquet under
``/root/testdata/sf{0.001,0.01,0.1}`` (see TESTDATA.md / FIXTURES.md).
All loads go through :func:`table` so column pruning and predicate pushdown
reach the Parquet scan — callers ``.select(...)`` / ``.filter(...)`` on the
returned DataFrame and Catalyst pushes both into the file source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


from functools import lru_cache


@lru_cache(maxsize=256)
def _nanos_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (Spark reads them as
    epoch-nanos BIGINT under spark.sql.legacy.parquet.nanosAsLong).
    Cached per path — fixture schemas are immutable and this is called at
    every plan build."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:  # directory-of-files case: sniff the first footer
        import glob

        files = sorted(glob.glob(f"{path}/*.parquet")) or sorted(glob.glob(f"{path}/part-*"))
        if not files:
            return []
        schema = pq.read_schema(files[0])
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` — the columnar
    scan, pushdown and pruning are Catalyst's job, not ours.

    timestamp[ns] columns (events.ts) are converted to Spark timestamps via
    integer DIV (never float division — epoch-nanos exceeds double's 53-bit
    mantissa). Fixture data carries no sub-microsecond values, so the
    truncation is lossless.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for col in _nanos_columns(path):
        # pyarrow also reports Spark-written INT96 timestamps as
        # timestamp[ns]; those arrive as real TimestampType and need no
        # conversion. Only int64-nanos columns land as LongType under
        # spark.sql.legacy.parquet.nanosAsLong.
        if df.schema[col].dataType.typeName() == "long":
            df = df.withColumn(col, F.expr(f"timestamp_micros(CAST(`{col}` DIV 1000 AS BIGINT))"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API paths)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
