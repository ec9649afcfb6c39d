"""Decision-support query shapes — the TPC-H tail adapted to the fixture.

The reference proxy has no relational surface at all (SURVEY §0: the SQL
string is opaque pass-through, main.go:323-349); these shapes belong to the
north-star analytics surface, widening the TPC-H family already present
(Q1/Q3/Q4/Q5/Q10/Q14/Q19 in relational.py) with the planner patterns the
remaining queries are famous for:

- Q6  — pure scan + predicate pushdown (the "is the filter reaching the
        scan" canary),
- Q7  — two-nation volume shipping: a 5-way join where the same dimension
        (nation) enters twice under an OR'd pair filter,
- Q8  — market share: CASE-split aggregation over an 6-way join tree,
- Q9  — product-type profit: multi-join with a LIKE-filtered dimension,
- Q13 — customer distribution: LEFT OUTER join preserved through a
        two-level aggregation (the null-extended-count trap),
- Q15 — top supplier: scalar-subquery max threshold over a shared CTE,
- Q16 — supplier-relationship count: count(DISTINCT) over an equi-join
        with a NOT-IN-style dimension filter,
- Q17 — small-quantity revenue: per-group average threshold rejoined to
        the fact table,
- Q18 — large-volume orders: HAVING over a fact-side pre-aggregation that
        prunes BEFORE the dimension joins,
- Q21 — waiting suppliers: EXISTS + NOT EXISTS pair against the same
        fact table (semi- and anti-join on one scan),
- Q22 — sales opportunity: global scalar threshold + anti-join against
        the fact table.

Fixture adaptations (the driver's TPC-H-ish tables lack partsupp,
l_shipmode, l_commitdate/receiptdate, c_phone/comment): "late" is spelled
l_shipdate > o_orderdate + 90 days (same selectivity role as
receipt>commit), Q9's supplycost profit term drops to the revenue term
(join tree unchanged), Q16 counts distinct *shipping* suppliers via
lineitem instead of partsupp, Q13's comment filter becomes an
o_orderpriority filter, and Q22's phone-prefix grouping becomes
c_mktsegment. Every money/ratio column is exact integer micros/cents so
the DuckDB differential hashes bit-identically; Q17's 0.2*avg threshold
is cross-multiplied into pure BIGINT arithmetic (5*qty*cnt < sum) so no
float boundary can flip a row between engines.

At 100 TB: every shape here keeps the classic scale plan — facts shuffle
on their join keys once, dimensions broadcast (nation/region/part/
supplier are KB-to-MB), pre-aggregations (Q15's rev CTE, Q18's HAVING,
Q17's per-part stats) reduce the fact table BEFORE any join, and the
correlated subqueries decorrelate to semi/anti shuffle joins on
l_orderkey — no per-row re-scans survive planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

# Exact revenue term: micros of extendedprice*(1-discount). round() is
# half-away-from-zero for positive doubles in both Spark and DuckDB, and
# both evaluate the identical IEEE product of the identical parquet
# doubles, so the BIGINT is engine-independent.
_REV_MICROS = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)"
)


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: the no-join scan canary. The entire query
# is one Filter over three pushable predicates + one partial-aggregated
# sum; at 100 TB its cost is exactly the parquet scan of 4 columns.
# ---------------------------------------------------------------------------

_FORECAST_REVENUE = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 1000000) AS BIGINT))
            AS BIGINT) AS revenue_micros,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_FORECAST_REVENUE)


def forecast_revenue_oracle() -> str:
    return _FORECAST_REVENUE


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations. The nation dimension joins
# TWICE (supplier side and customer side) under an OR'd pair filter; the
# filter cannot prune either join alone, only the pair. Plan value: both
# nation joins broadcast, the OR collapses to a post-join filter, facts
# shuffle once on l_orderkey.
# ---------------------------------------------------------------------------

_VOLUME_SHIPPING = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume_micros) AS BIGINT) AS revenue_micros
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(extract(year FROM l.l_shipdate) AS INT) AS l_year,
         {_REV_MICROS} AS volume_micros
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql(_VOLUME_SHIPPING)


def volume_shipping_oracle() -> str:
    return _VOLUME_SHIPPING


# ---------------------------------------------------------------------------
# Q8 — national market share inside a region. CASE-split aggregation:
# numerator (one nation's revenue) and denominator (whole region's
# revenue) come out of ONE pass over the joined facts. Both reported as
# exact micros — the share is numerator/denominator downstream; emitting
# the division would put an order-sensitive double in the hash.
# ---------------------------------------------------------------------------

_MARKET_SHARE = f"""
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN volume_micros
                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS nation_micros,
       CAST(sum(volume_micros) AS BIGINT) AS total_micros
FROM (
  SELECT CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
         {_REV_MICROS} AS volume_micros,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND o.o_orderdate >= '1995-01-01' AND o.o_orderdate < '1997-01-01'
    AND p.p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(
        spark, sf_dir,
        "part", "lineitem", "supplier", "orders", "customer", "nation", "region",
    )
    return spark.sql(_MARKET_SHARE)


def market_share_oracle() -> str:
    return _MARKET_SHARE


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year. The fixture has no
# partsupp/supplycost, so profit reduces to the revenue term; the join
# tree and the LIKE-filtered part dimension (the shape's point) are
# intact. part is filtered BEFORE the join, so the fact scan is pruned
# by the broadcast hash on the filtered partkeys.
# ---------------------------------------------------------------------------

_PRODUCT_PROFIT = f"""
SELECT nation, o_year, CAST(sum(amount_micros) AS BIGINT) AS profit_micros
FROM (
  SELECT n.n_name AS nation,
         CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
         {_REV_MICROS} AS amount_micros
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    return spark.sql(_PRODUCT_PROFIT)


def product_profit_oracle() -> str:
    return _PRODUCT_PROFIT


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution. The LEFT OUTER join must
# survive both aggregation levels: customers with zero (qualifying)
# orders land in the c_count=0 bucket, NOT disappear — count(o_orderkey)
# counts non-null keys only. The filter lives in the JOIN ... ON clause
# on purpose: in the WHERE it would silently turn the outer join inner.
# ---------------------------------------------------------------------------

_CUSTOMER_DISTRIBUTION = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_CUSTOMER_DISTRIBUTION)


def customer_distribution_oracle() -> str:
    return _CUSTOMER_DISTRIBUTION


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue. The rev CTE is shared by
# the outer query and the scalar-subquery max; ties all surface (no
# arbitrary LIMIT 1). The scalar max compiles to a subquery broadcast,
# not a join — the CTE aggregates the fact table down to O(#suppliers)
# BEFORE the supplier dimension join.
# ---------------------------------------------------------------------------

_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_REV_MICROS}) AS BIGINT) AS total_revenue_micros
  FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_micros
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue_micros = (SELECT max(total_revenue_micros) FROM revenue)
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_TOP_SUPPLIER)


def top_supplier_oracle() -> str:
    return _TOP_SUPPLIER


# ---------------------------------------------------------------------------
# Q16 — supplier-relationship count. partsupp does not exist in the
# fixture; the part↔supplier relation observed through lineitem plays its
# role (count DISTINCT shipping suppliers). The distinct-agg plans as a
# two-phase shuffle (dedup on the full key, then count) — Spark's
# standard rewrite — and the dimension filter prunes part BEFORE the
# join.
# ---------------------------------------------------------------------------

_PARTS_SUPPLIER_COUNT = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(_PARTS_SUPPLIER_COUNT)


def parts_supplier_count_oracle() -> str:
    return _PARTS_SUPPLIER_COUNT


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue. The per-part average-quantity
# threshold (l_quantity < 0.2 * avg) is cross-multiplied into pure
# BIGINT arithmetic — 5 * qty * n_lines < sum_qty — because avg() over
# doubles is summation-order-dependent and a row sitting exactly on the
# rational boundary (e.g. qty 5 vs avg 25) would flip between engines on
# ~1e-15 fuzz. l_quantity is integral in the fixture (asserted by the
# oracle's round()).
# ---------------------------------------------------------------------------

_SMALL_QTY_REVENUE = """
WITH part_qty AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l.l_extendedprice * 1000000) AS BIGINT)) AS BIGINT)
         AS revenue_micros,
       CAST(count(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_qty q ON q.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND 5 * CAST(round(l.l_quantity) AS BIGINT) * q.n_lines < q.sum_qty
"""


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_SMALL_QTY_REVENUE)


def small_qty_revenue_oracle() -> str:
    return _SMALL_QTY_REVENUE


# ---------------------------------------------------------------------------
# Q18 — large-volume orders. The HAVING pre-aggregation prunes the fact
# table to the handful of >200-unit orders BEFORE any dimension join —
# the single most important ordering decision in the query at 100 TB
# (joining first would shuffle the full lineitem against orders for
# rows that are then discarded).
# ---------------------------------------------------------------------------

_LARGE_ORDERS = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       o.o_orderdate, CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       big.sum_qty
FROM (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 200
) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_cents DESC, o.o_orderkey
LIMIT 100
"""


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "orders", "customer")
    return spark.sql(_LARGE_ORDERS)


def large_orders_oracle() -> str:
    return _LARGE_ORDERS


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting. EXISTS + NOT EXISTS against
# the SAME fact table: "another supplier contributed to this finished
# order" (semi) and "no OTHER supplier was late on it" (anti), with
# "late" = shipped >90 days after order date (the fixture has no
# commit/receipt dates). Both subqueries decorrelate to shuffle joins on
# l_orderkey — the probe side is already filtered to late lines of
# finished orders.
# ---------------------------------------------------------------------------

_WAITING_SUPPLIERS = """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


# The Spark side runs the one-pass rewrite instead of the literal
# EXISTS pair: fold lineitem⋈orders to per-(order, supplier) late-line
# counts, then derive the per-order supplier stats as WINDOW aggregates
# over the same fold (a CTE re-reference would inline twice and re-scan
# lineitem; the window needs neither a second scan nor a self-join) —
# lineitem is scanned ONCE (pinned) vs three scans + two
# lineitem-vs-lineitem shuffles for the decorrelated subqueries.
# "Another supplier exists" = n_supp > 1; "no other supplier late" =
# exactly one late supplier AND it is me; numwait still counts late
# LINES (sum of n_late_lines), matching the EXISTS query's l1-row
# granularity. The differential hash against the literal
# _WAITING_SUPPLIERS oracle is the rewrite's correctness proof.
# Measured: 10x-data wall ratio 10.5x -> 2.6x, absolute 9.8s -> 4.2s.
_WAITING_SUPPLIERS_FAST = """
WITH per_supp AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_late_lines
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
w AS (
  SELECT l_suppkey, n_late_lines,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         sum(CASE WHEN n_late_lines > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY l_orderkey) AS n_late_supp
  FROM per_supp
)
SELECT s.s_name, CAST(sum(w.n_late_lines) AS BIGINT) AS numwait
FROM w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
WHERE w.n_late_lines > 0 AND w.n_supp > 1 AND w.n_late_supp = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_WAITING_SUPPLIERS_FAST)


def waiting_suppliers_oracle() -> str:
    # DuckDB-only text (the Spark side runs _WAITING_SUPPLIERS_FAST);
    # DAYS is spelled directly — no substitution surgery.
    return _WAITING_SUPPLIERS


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity. "Above the average positive balance"
# is cross-multiplied into exact integers (cents * count > sum_cents) —
# same no-float-boundary discipline as Q17 — and "no recent order"
# (every fixture customer has SOME order, so the classic "never ordered"
# would be vacuously empty; a 20-month dormancy window keeps the
# anti-join selective AND non-trivial) is a NOT EXISTS anti-join.
# The two scalar subqueries over pos collapse to
# one broadcast row; the anti-join shuffles on custkey. c_mktsegment
# stands in for the phone country-code grouping.
# ---------------------------------------------------------------------------

_SALES_OPPORTUNITY = """
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer c
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * (SELECT n_pos FROM pos)
        > (SELECT sum_cents FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= '2000-01-01')
GROUP BY c.c_mktsegment
"""


def sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SALES_OPPORTUNITY)


def sales_opportunity_oracle() -> str:
    return _SALES_OPPORTUNITY


# ---------------------------------------------------------------------------
# price_elasticity — log-log demand elasticity per brand: OLS slope of
# ln(quantity) on ln(unit price) over line items, the price-sensitivity
# readout every pricing/merchandising review runs (ε < −1 elastic,
# −1 < ε < 0 inelastic). Extends linreg_by_group's generic OLS with the
# ECONOMETRIC spelling: both axes in logs, unit price as the exact
# difference ln(price_cents) − ln(qty) (never a float division before
# the log), slope + fit quality per brand.
#
# Float discipline: each log term rounds 6 dp → DECIMAL(18,6); the five
# OLS moments are exact decimal sums (order-independent); slope and r²
# are single double expressions over the O(#brands) frame, rounded 6.
#
# Shape: lineitem ⋈ broadcastable part dim → one (brand) fold →
# O(#brands) readout. One shuffle.
# ---------------------------------------------------------------------------


def _elasticity_sql() -> str:
    x = ("CAST(round(ln(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)"
         " AS DOUBLE)) - ln(CAST(CAST(round(l_quantity) AS BIGINT)"
         " AS DOUBLE)), 6) AS DECIMAL(18, 6))")
    y = ("CAST(round(ln(CAST(CAST(round(l_quantity) AS BIGINT)"
         " AS DOUBLE)), 6) AS DECIMAL(18, 6))")
    return f"""
    pts AS (SELECT p.p_brand AS brand, {x} AS x, {y} AS y
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    m AS (SELECT brand, CAST(count(*) AS DECIMAL(18, 0)) AS k,
                 sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                 sum(x * x) AS sxx, sum(y * y) AS syy
          FROM pts GROUP BY brand)
    SELECT brand, CAST(k AS BIGINT) AS n,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS elasticity,
           round((CAST(k * sxy - sx * sy AS DOUBLE)
                  * CAST(k * sxy - sx * sy AS DOUBLE))
                 / (CAST(k * sxx - sx * sx AS DOUBLE)
                    * CAST(k * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
    """


def price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N163: log-log demand elasticity per brand, exact decimal moments."""
    from ..tables import table

    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql("WITH " + _elasticity_sql())


def price_elasticity_oracle() -> str:
    return "WITH " + _elasticity_sql()


# ---------------------------------------------------------------------------
# fulfillment_lag — order-to-ship latency percentiles per order
# priority: the supply-chain SLA readout (does URGENT actually ship
# faster?). Joins the order header's o_orderdate to each line's
# l_shipdate and reports exact interpolating p50/p90/p99 of the lag in
# whole days per priority, plus the late-line share past a fixed
# 90-day promise. The operations twin of q_funnel_ttc's behavioral
# stage latencies, on the relational side of the house.
#
# Exactness: lags are exact integer days (epoch-micro division); the
# percentile ≡ quantile_cont identity carries the readout; the late
# share is an exact integer ratio in basis points.
# ---------------------------------------------------------------------------

PROMISE_DAYS = 90


def _fulfillment_sql(epoch_o: str, epoch_l: str, idiv: str,
                     pct: str) -> str:
    day = 86_400_000_000
    return f"""
    lag_days AS (SELECT o.o_orderpriority AS priority,
                        CAST(({epoch_l} - {epoch_o}) {idiv} {day}
                             AS BIGINT) AS d
                 FROM lineitem l
                 JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round({pct}(d, 0.5), 4) AS p50_days,
           round({pct}(d, 0.9), 4) AS p90_days,
           round({pct}(d, 0.99), 4) AS p99_days,
           CAST((10000 * sum(CASE WHEN d > {PROMISE_DAYS}
                                  THEN 1 ELSE 0 END)) {idiv} count(*)
                AS BIGINT) AS late_bp
    FROM lag_days GROUP BY priority
    """


def fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N169: order-to-ship latency SLA readout per priority."""
    from ..tables import EPOCH_NTZ, table

    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eo = f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, o.o_orderdate)"
    el = f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, l.l_shipdate)"
    return spark.sql(
        "WITH " + _fulfillment_sql(eo, el, "div", "percentile")
    )


def fulfillment_lag_oracle() -> str:
    return "WITH " + _fulfillment_sql(
        "epoch_us(o.o_orderdate)", "epoch_us(l.l_shipdate)",
        "//", "quantile_cont",
    )


# ---------------------------------------------------------------------------
# repurchase_gap — inter-ORDER recurrence per market segment: the CRM
# reorder-cycle readout (when to send the replenishment nudge, when a
# customer counts as lapsed). Per customer, gaps between consecutive
# orders in whole days; per segment, exact interpolating p25/p50/p90 of
# those gaps plus the share of one-order customers the gap view can't
# see (reported, not silently dropped). The relational sibling of
# q_gap_percentiles' event-stream gaps and q_funnel_ttc's stage
# latencies.
#
# All-integer gaps (epoch-day subtraction); ONE shuffle on o_custkey
# (lag shares the sort), then an O(#segments) fold; customer dim
# attaches by broadcastable join.
# ---------------------------------------------------------------------------


def _repurchase_sql(epoch: str, idiv: str, pct: str) -> str:
    day = 86_400_000_000
    return f"""
    o AS (SELECT o_custkey AS ck,
                 CAST({epoch} {idiv} {day} AS BIGINT) AS d,
                 o_orderkey AS ok
          FROM orders),
    g AS (SELECT ck,
                 d - lag(d) OVER (PARTITION BY ck ORDER BY d, ok) AS gap
          FROM o),
    seg AS (SELECT c_custkey AS ck, c_mktsegment AS segment
            FROM customer),
    cust AS (SELECT ck, CAST(count(*) AS BIGINT) AS n_orders FROM o
             GROUP BY ck)
    SELECT s.segment,
           CAST(count(DISTINCT c.ck) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN c.n_orders = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_single_order,
           CAST(count(g.gap) AS BIGINT) AS n_gaps,
           round({pct}(g.gap, 0.25), 4) AS p25_days,
           round({pct}(g.gap, 0.5), 4) AS p50_days,
           round({pct}(g.gap, 0.9), 4) AS p90_days
    FROM cust c
    JOIN seg s ON s.ck = c.ck
    LEFT JOIN g ON g.ck = c.ck AND g.gap IS NOT NULL
    GROUP BY s.segment
    """


def repurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N175: reorder-cycle percentiles per market segment."""
    from ..tables import EPOCH_NTZ, table

    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "WITH "
        + _repurchase_sql(
            f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, o_orderdate)",
            "div", "percentile",
        )
    )


def repurchase_gap_oracle() -> str:
    return "WITH " + _repurchase_sql(
        "epoch_us(o_orderdate)", "//", "quantile_cont"
    )
