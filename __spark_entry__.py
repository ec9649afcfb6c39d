"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ingest pipeline (the reference's core
dataflow: request stream → validation → format dispatch → keyed concat
aggregation → sink frame) on sf0.001. ``queries()`` / ``oracle_sql()``
expose every implemented operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from proxyhouse_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full ingest pipeline
    (SURVEY §3.4) — one sink row per distinct request key."""
    return registry.QUERIES["q_batch_sink"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
