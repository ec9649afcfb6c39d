"""Declarative data-quality constraint audit (Deequ / dbt-test shape).

Reference parity: ABSENT — /root/reference/main.go treats bodies as opaque
bytes and validates only the HTTP envelope (method/path/body-presence,
main.go:164-226). A warehouse ingest pipeline, however, gates every load
behind declarative table constraints (uniqueness, null rates, accepted
values, ranges, referential integrity) and ships the violation report,
not a boolean — the Deequ/GreatExpectations/dbt-test shape. The engine
registers it as a first-class operator over the fixture star schema.

Scale design (100 TB): every non-join constraint on one table folds in
the SAME single scan — conditional aggregates are map-side-combinable,
so the audit costs one pass per audited table regardless of how many
constraints it carries. Referential-integrity legs are anti-join counts
on the foreign key: the dimension side broadcasts when small, shuffles
on the key otherwise — never a Cartesian. Output is O(#constraints)
rows; the report, not the data, moves.

Exactness: every violation count is an exact BIGINT; `pass` derives
from the count — no sampling, no thresholds hidden in floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

# One UNION ALL leg per constraint. The per-table legs are grouped into
# one SELECT per table so each table is scanned ONCE (conditional
# aggregates share the scan); the RI legs are anti-join counts.
_CONSTRAINT_AUDIT = """
WITH order_checks AS (
  SELECT * FROM (
    SELECT
      CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS uniq_orderkey,
      CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS null_custkey,
      CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
           AS BIGINT) AS bad_status,
      CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS bad_price,
      CAST(count(*) FILTER (WHERE o_orderdate < '1990-01-01'
                               OR o_orderdate >= '2010-01-01')
           AS BIGINT) AS bad_date
    FROM orders
  )
),
lineitem_checks AS (
  SELECT * FROM (
    SELECT
      CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        AS uniq_lineid,
      CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
           AS BIGINT) AS bad_qty,
      CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
           AS BIGINT) AS bad_discount
    FROM lineitem
  )
),
ri_orders_customer AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
ri_lineitem_orders AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
),
report AS (
  SELECT 'orders.o_orderkey is unique' AS constraint_name,
         uniq_orderkey AS n_violations FROM order_checks
  UNION ALL
  SELECT 'orders.o_custkey is not null', null_custkey FROM order_checks
  UNION ALL
  SELECT 'orders.o_orderstatus in (F, O, P)', bad_status FROM order_checks
  UNION ALL
  SELECT 'orders.o_totalprice > 0', bad_price FROM order_checks
  UNION ALL
  SELECT 'orders.o_orderdate in [1990, 2010)', bad_date FROM order_checks
  UNION ALL
  SELECT 'lineitem.(l_orderkey, l_linenumber) is unique', uniq_lineid
  FROM lineitem_checks
  UNION ALL
  SELECT 'lineitem.l_quantity in [1, 50]', bad_qty FROM lineitem_checks
  UNION ALL
  SELECT 'lineitem.l_discount in [0, 0.1]', bad_discount FROM lineitem_checks
  UNION ALL
  SELECT 'orders.o_custkey references customer', n FROM ri_orders_customer
  UNION ALL
  SELECT 'lineitem.l_orderkey references orders', n FROM ri_lineitem_orders
)
SELECT constraint_name, n_violations,
       CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
FROM report
"""


def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CONSTRAINT_AUDIT)


def constraint_audit_oracle() -> str:
    # DuckDB spells the composite-key distinct as a ROW(...) constructor
    return _CONSTRAINT_AUDIT.replace(
        "count(DISTINCT (l_orderkey, l_linenumber))",
        "count(DISTINCT ROW(l_orderkey, l_linenumber))",
    )
