"""Metrics pipeline — SURVEY §2.4 A3-A5.

The reference keeps mutex-guarded sum-by-name counters (metric.go:10-13,
Increment metric.go:52-60), fans each ingest/send event out to global +
by-host + by-table variants (main.go:210-216, 394-405), and derives
``bytes_to_milliseconds = bytesSent / sendDuration`` (integer division,
both-nonzero guard, metric.go:26-38).

Spark-first: the counter map is ``groupBy(metric).sum``; the 3-scope
fan-out is GROUPING SETS (one shuffle, not three scans); the derived ratio
is a post-aggregation projection. At scale this is a single pass over the
request stream with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import extract_table
from ..sources.requests import requests_df
from .ingest import validate_requests, with_format, with_row_count


def metric_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-request measurement frame: one row per accepted request with the
    counter dimensions (host, table) and measures (rows, bytes, requests).

    host models the proxy instance that served the request (the reference
    tags counters with its own hostname, metric.go:29-33; a fleet of 4 is
    derived deterministically for testability)."""
    df = with_row_count(with_format(validate_requests(requests_df(spark, sf_dir))))
    return df.select(
        "event_id",
        "uri",
        (F.concat(F.lit("proxy-"), (F.col("event_id") % 4).cast("string"))).alias("host"),
        extract_table(F.col("uri")).alias("table_name"),
        F.col("n_rows").alias("rows_received"),
        F.length("body").cast("bigint").alias("bytes_received"),
        F.lit(1).cast("bigint").alias("requests_received"),
    )


def metric_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the counter map — sum-by-name (global scope)."""
    m = metric_events(spark, sf_dir)
    return m.agg(
        F.sum("rows_received").alias("rows_received"),
        F.sum("bytes_received").alias("bytes_received"),
        F.sum("requests_received").alias("requests_received"),
    )


def metric_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the 3-scope fan-out — global / by-host / by-table — as GROUPING
    SETS: one aggregation, the planner expands the sets; vs. the reference's
    9 separate Increment calls per event."""
    m = metric_events(spark, sf_dir)
    m.createOrReplaceTempView("metric_events_v")
    return m.sparkSession.sql(
        """
        SELECT host, table_name,
               CAST(sum(rows_received) AS BIGINT) AS rows_received,
               CAST(sum(bytes_received) AS BIGINT) AS bytes_received,
               CAST(sum(requests_received) AS BIGINT) AS requests_received
        FROM metric_events_v
        GROUP BY GROUPING SETS ((), (host), (table_name))
        """
    )


def metric_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: derived throughput metric per key flush:
    bytes_to_ms = bytes_sent DIV duration_ms, only when both are nonzero
    (metric.go:26-38; Go integer division truncates — DIV matches for the
    positive domain). Duration is modeled deterministically from the flush
    payload (1 ms per 64 KiB, min 1 ms) so the query stays oracle-checkable.
    """
    m = metric_events(spark, sf_dir)
    per_key = m.groupBy("uri").agg(
        F.sum("bytes_received").alias("bytes_sent"),
        F.sum("rows_received").alias("rows_sent"),
    )
    duration = F.greatest(F.lit(1), (F.col("bytes_sent") / F.lit(65536)).cast("bigint"))
    per_key = per_key.withColumn("duration_ms", duration)
    ratio = F.when(
        (F.col("bytes_sent") != 0) & (F.col("duration_ms") != 0),
        F.expr("bytes_sent DIV duration_ms"),
    )
    return per_key.select(
        "uri", "bytes_sent", "rows_sent", "duration_ms", ratio.alias("bytes_to_ms")
    )


def inout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The /statistic endpoint's data-plane counters (showstatistic,
    main.go:247-254): ``in`` = accepted requests (atomic `in`, main.go:209),
    ``out`` = outbound sends = one per distinct key per flush cycle
    (main.go:292). Connection-state counters are transport-level, not data
    plane, and are not modeled. Single-row global aggregate — map-side
    partial count + distinct, one shuffle."""
    df = validate_requests(requests_df(spark, sf_dir))
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("in_requests"),
        F.countDistinct("uri").cast("bigint").alias("out_requests"),
    )


# ---------------------------------------------------------------------------
# replica_audit — replication-consistency checksum (north-star companion
# of the reference's dual-destination send: every flush goes to BOTH the
# forward and the replica host, main.go:376-445 + url_rewrite S3; under
# at-least-once delivery the replica can lag or lose keys, and the audit
# job is how an operator proves the two sides converged without shipping
# either table anywhere). Per (table, replica): row count + an
# ORDER-INDEPENDENT content checksum (sum of a 48-bit md5 slice over
# uri|buffer|rowcount — commutative, so partition/arrival order is
# irrelevant). The replica's loss is simulated deterministically
# (~1/16 of keys, md5-banded). ONE scan, ONE shuffle on table_name:
# both replicas' stats come from conditional aggregates, and at 100 TB
# the same audit runs as one pass per physical replica with a final
# O(#tables) merge. 48-bit slices keep fixture sums far from BIGINT
# range; production folds mod 2^61 to stay overflow-safe at any row
# count (wraparound is still deterministic + order-independent).
# ---------------------------------------------------------------------------


def replica_audit_body(h_expr: str) -> str:
    """Audit SQL over a ``sink(uri, table_name, buffer, rowcount)``
    relation; ``h_expr`` is the dialect's 48-bit md5-slice-to-int of the
    content string (Spark conv() vs DuckDB '0x' cast)."""
    return f"""
    SELECT table_name,
           CAST(count(*) AS BIGINT) AS a_rows,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS b_rows,
           CAST(sum(h) AS BIGINT) AS a_sum,
           CAST(coalesce(sum(CASE WHEN kept THEN h END), 0) AS BIGINT) AS b_sum,
           (count(*) = sum(CASE WHEN kept THEN 1 ELSE 0 END)
            AND sum(h) = coalesce(sum(CASE WHEN kept THEN h END), 0))
             AS consistent
    FROM (SELECT table_name, {h_expr} AS h,
                 substr(md5(uri), 1, 1) <> '0' AS kept
          FROM sink) t
    GROUP BY table_name
    """


def replica_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ingest import sink_frame

    sink_frame(requests_df(spark, sf_dir)).createOrReplaceTempView("sink")
    h = (
        "CAST(conv(substr(md5(concat(uri, '|', buffer, '|', "
        "CAST(rowcount AS STRING))), 1, 12), 16, 10) AS BIGINT)"
    )
    return spark.sql(replica_audit_body(h))
