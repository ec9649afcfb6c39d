"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
one JVM); the same settings are the right starting point on a real cluster:
AQE handles runtime re-planning (adaptive shuffle-partition coalescing, skew
joins), Arrow accelerates any pandas interchange, and the session timezone is
pinned to UTC so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    In ``local[*]`` the driver's sys.path leaks to the in-process workers,
    which MASKS a real cluster bug: any Arrow UDF that imports
    ``proxyhouse_spark`` (mapInPandas in multimodal/observability) dies
    with ModuleNotFoundError the moment executors are separate processes —
    found by the local-cluster[2,4,8192] differential smoke (round 4). On
    a 1000-executor deployment this zip is the ``--py-files`` artifact;
    here it's built once per session into the session's temp scratch."""
    sc = spark.sparkContext
    if sc._jsc is None:  # stopped session — nothing to ship to
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"proxyhouse_spark-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, dirs, files in os.walk(pkg_dir):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)


def get_spark(app_name: str = "proxyhouse_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``spark.sql.shuffle.partitions`` defaults to the local core count rather
    than Spark's 200: at sf0.1 a 32-way shuffle keeps every partition in
    memory, and on a real cluster AQE coalesces post-shuffle partitions to
    size anyway (``spark.sql.adaptive.coalescePartitions.enabled``).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fixture parquet stores timestamp[ns] (events.ts); Spark has no nanos
        # timestamp type — read as epoch-nanos long, converted in tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
