"""CDC changelog apply — upsert/delete compaction (SURVEY §2.11 ext).

Reference parity: ABSENT — /root/reference/main.go appends opaque bytes
and never models row identity, updates, or deletes (the closest thing is
the DLQ replay re-appending whole packets, main.go:447-485). A lakehouse
ingestion pipeline, however, constantly folds a CDC changelog (insert/
update/delete events per primary key) into a queryable snapshot — the
semantic core of Delta/Hudi/Iceberg ``MERGE INTO`` — so the engine ships
it as a first-class operator.

Shape & scale: latest-wins compaction is ONE window (row_number over the
primary key ordered by change sequence descending) — a single shuffle on
the key, partition-local ranking, then a narrow filter dropping
superseded versions and tombstones. No join at all: at 100 TB the
changelog shuffles once on the same key the snapshot table is bucketed
by, making periodic compaction a co-located write. Deletes are plain
rows (tombstones), not side-channel state, so the fold is idempotent and
replay-safe — applying the same changelog twice yields the same
snapshot, which is exactly the at-least-once delivery contract the
reference's DLQ replay imposes downstream (main.go:423-441).

The changelog is synthesized deterministically from the ``orders``
fixture (no RNG): every order arrives as an insert; keys ≡ 0 (mod 7) get
a later status/price update; keys ≡ 0 (mod 21) a second update; keys ≡ 0
(mod 13) a final tombstone. The same SQL runs verbatim in Spark and
DuckDB — the oracle is textually identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

# Portable changelog CTE: (seq, op, key, payload...). seq is the change
# sequence number (commit LSN stand-in); higher seq wins. Prices are
# carried as integer cents so the synthesized updates (+10% / +21%) are
# exact integer arithmetic — identical in Spark and DuckDB, no float
# rounding-rule divergence at half-cent boundaries.
_CHANGELOG = """
base AS (
  SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
changelog AS (
  SELECT o_orderkey, 0 AS seq, 'I' AS op, o_custkey, o_orderstatus,
         cents, o_orderpriority
  FROM base
  UNION ALL
  SELECT o_orderkey, 1 AS seq, 'U' AS op, o_custkey, 'X' AS o_orderstatus,
         CAST(floor(cents * 11 / 10) AS BIGINT) AS cents, o_orderpriority
  FROM base WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 2 AS seq, 'U' AS op, o_custkey, 'Y' AS o_orderstatus,
         CAST(floor(cents * 121 / 100) AS BIGINT) AS cents, o_orderpriority
  FROM base WHERE o_orderkey % 21 = 0
  UNION ALL
  SELECT o_orderkey, 3 AS seq, 'D' AS op, o_custkey, o_orderstatus,
         cents, o_orderpriority
  FROM base WHERE o_orderkey % 13 = 0
)
"""

_APPLY = f"""
WITH {_CHANGELOG},
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn,
         CAST(count(*) OVER (PARTITION BY o_orderkey) AS BIGINT) AS n_versions
  FROM changelog
)
SELECT o_orderkey, o_custkey, o_orderstatus,
       cents / 100.0 AS o_totalprice, o_orderpriority, n_versions
FROM ranked
WHERE rn = 1 AND op <> 'D'
"""


def cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold a CDC changelog into the current snapshot: latest change per
    key wins, tombstones drop the key entirely."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_APPLY)


def cdc_upsert_oracle() -> str:
    return _APPLY
