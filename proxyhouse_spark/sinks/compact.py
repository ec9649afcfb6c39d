"""Small-file compaction for streaming sink / DLQ directories.

Every micro-batch flush appends at least one parquet file per partition
(FlushPipeline, DLQ spill, replay rewrites), so a long-running stream turns
its sink directories into thousands of KB-sized files — and at cluster
scale the cost is not the data, it is the *file count*: scan planning,
footer reads, and listing all go O(files). The reference never hits this
(its DLQ is one pudge file per failed flush, deleted on replay —
/root/reference/main.go:365-373, 482), but a Parquet-table DLQ that
replaces filename magic with columns (SURVEY §2.1 S4) inherits the problem
and needs the standard fix: periodic bin-packed rewrite.

``compact_parquet`` reads the directory, repartitions to
``ceil(total_bytes / target_bytes)`` output files, writes to a temp dir
beside the target, then swaps atomically (rename old → tombstone, temp →
live, drop tombstone). Readers between the two renames see the directory
missing rather than half-written — the same crash-consistency contract a
transactional table format provides, minus the format dependency. The swap
window is the trade for zero dependencies; a production deployment on
Delta/Iceberg replaces this file dance with OPTIMIZE/rewrite_data_files.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        f.endswith(".parquet")
        for _root, _dirs, files in os.walk(path)
        for f in files
    )


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict[str, int]:
    """Bin-pack ``path``'s parquet files to ~``target_bytes`` each.

    Returns ``{"files_before": n, "files_after": m, "rows": r}``. No-op
    (beyond a read) when the directory already meets the target count.
    """
    files_before = parquet_file_count(path)
    n_out = max(1, math.ceil(_dir_bytes(path) / target_bytes))
    if files_before <= n_out:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "rows": -1,
        }

    df = spark.read.parquet(path)
    rows = df.count()
    tmp = path.rstrip("/") + ".compact.tmp"
    old = path.rstrip("/") + ".compact.old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    # repartition (round-robin), not coalesce: coalesce(n) would also narrow
    # the READ stage to n tasks; repartition keeps the scan wide and only
    # the write narrow
    df.repartition(n_out).write.parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(path),
        "rows": rows,
    }
