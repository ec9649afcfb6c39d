"""Time individual queries exactly like bench.run_query (warmup + 3 noop
samples, median/spread + own steal window), printing one line per query
against its bench_bands.json band — plus WEATHER-ROBUST work metrics
scraped from the status API: total executor CPU nanoseconds, executor run
time, task count and shuffle bytes accumulated over the 3 timed samples.
Hypervisor steal inflates wall and run time but barely touches
executorCpuTime, so CPU deltas survive the storm windows that make
same-host wall comparisons meaningless (VERDICT r09's 10x phantoms).

Usage: python tools/qtime.py q_pagerank q_kcore ...
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import bench  # noqa: E402


def _ui_spark():
    """bench-identical session except the UI is enabled for metric scrape."""
    import os

    from proxyhouse_spark import session as S

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("qtime")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "20000")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    S.ship_package(spark)
    return spark


def _stage_totals(spark) -> dict[str, float]:
    """Sum executorCpuTime/executorRunTime/tasks/shuffle over all completed
    stages of the app so far (monotone counters -> caller diffs)."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE"
    with urllib.request.urlopen(url, timeout=30) as fh:
        stages = json.load(fh)
    out = {"cpu_s": 0.0, "run_s": 0.0, "tasks": 0, "shuffle_mb": 0.0,
           "stages": len(stages)}
    for s in stages:
        out["cpu_s"] += s.get("executorCpuTime", 0) / 1e9
        out["run_s"] += s.get("executorRunTime", 0) / 1e3
        out["tasks"] += s.get("numCompleteTasks", 0)
        out["shuffle_mb"] += (
            s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0)
        ) / 1e6
    return out


def main() -> None:
    names = sys.argv[1:]
    spark = _ui_spark()
    bands = bench.load_bands(0.1)
    out = {}
    for name in names:
        before = _stage_totals(spark)
        t, s, st = bench.run_query(spark, name)
        after = _stage_totals(spark)
        d = {k: round(after[k] - before[k], 2) for k in before}
        band = bands.get(name)
        rel = f"{t / band:.2f}x band {band}" if band else "no band"
        print(
            f"{name:24s} median={t:7.3f} spread={s:.3f} steal={st} ({rel}) "
            f"| 4runs: cpu={d['cpu_s']:.1f}s run={d['run_s']:.1f}s "
            f"tasks={d['tasks']:.0f} shuf={d['shuffle_mb']:.1f}MB "
            f"stages={d['stages']:.0f}",
            flush=True,
        )
        out[name] = {"median": t, "spread": s, "steal": st, "band": band, **d}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
