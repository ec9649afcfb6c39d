"""Relational north-star operators (SURVEY §2.3, §2.5-§2.8).

The reference has no joins/windows/set-ops (single keyed stream —
SURVEY §2.3 evidence); these complete the engine surface for the fixture
star schema. All stock Catalyst — the comments note the physical strategy
each plan should (and does) pick at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


# ---------------------------------------------------------------------------
# Joins — SURVEY §2.3 J1-J3
# ---------------------------------------------------------------------------


def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: orders ⋈ customer, revenue per market segment.

    customer is the build side: tiny relative to orders at every SF →
    broadcast hash join (hinted explicitly; AQE would also pick it). At
    100 TB orders shuffles nothing — the dim ships to every executor.
    """
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2a: customers that have at least one order (EXISTS → left semi)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2b: customers with no finalized ('F') orders (NOT EXISTS → left
    anti). Status filter keeps the result non-trivial at every SF."""
    customer = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def union_merge_asof(
    probe: DataFrame,
    carry: DataFrame,
    carried: list[str],
    tiebreak,
) -> DataFrame:
    """The shared core of every as-of-shaped operator (join_asof,
    behavior.attribution): interleave the two sides sorted by
    (uid, t, kind, tiebreak) and carry the last-seen carry-side values
    forward with ignorenulls — ONE shuffle+sort, no probe × carry
    expansion. Contract both callers must honor: frames share a schema
    with ``uid``, ``t``, ``kind`` (carry = 0, probe = 1 — so same-instant
    carry rows sort first, the inclusive contract) and the ``carried``
    columns (NULL-typed padding on probe rows, real values on carry
    rows); the carried values all come from the same physical last carry
    row, so the output row is internally consistent. Returns the probe
    rows with each carried column available as ``l_<name>``."""
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "kind", tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = probe.unionByName(carry)
    for c in carried:
        merged = merged.withColumn(f"l_{c}", F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("kind") == 1)


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: as-of join — each event matched to the user's latest order with
    o_orderdate <= ts. Spark has no native ASOF JOIN; this is the
    union-merge spelling: interleave both sides sorted by (user, time),
    carry the last-seen order forward, keep the event rows
    (:func:`union_merge_asof` is the shared core).

    Scale note: ONE shuffle+sort of events ∪ orders on user_id — cost
    O((|E|+|O|) log), versus the equi-join + argmax spelling whose
    expansion is O(events × orders-per-user) (measured 2.8× slower at
    sf0.1 and quadratic-in-history for hot users at 100 TB; it was this
    operator's previous implementation). Tie discipline reproduces the
    argmax exactly: orders sort before events at equal timestamps
    (is_event 0 < 1 ⇒ same-instant orders are visible, the inclusive
    `ts >= o_orderdate` contract), and same-date orders sort by
    o_orderkey so "last seen" is the highest key. The three carried
    columns all come from the same physical last order row (events carry
    NULLs, skipped by ignorenulls), so the output row is internally
    consistent. Skewed users are a per-partition sort problem, absorbed
    by AQE partition splitting.
    """
    events = table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    e = events.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast(events.schema["ts"].dataType).alias("o_orderdate"),
        F.lit(None).cast(orders.schema["o_totalprice"].dataType).alias("o_totalprice"),
    )
    o = orders.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    carried = union_merge_asof(
        e, o, ["o_orderkey", "o_orderdate", "o_totalprice"], F.col("o_orderkey")
    )
    return (
        carried.filter(F.col("l_o_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("uid").alias("user_id"),
            F.col("l_o_orderkey").alias("o_orderkey"),
            F.col("l_o_orderdate").alias("o_orderdate"),
            F.col("l_o_totalprice").alias("o_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions — SURVEY §2.5 W1-W3
# ---------------------------------------------------------------------------


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: top-3 events per user by value (deterministic event_id tiebreak)."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "value", "rnk")
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: running per-user value sum in time order."""
    events = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: delta vs the user's previous event."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev = F.lag("value", 1).over(w)
    return events.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - prev, 2).alias("delta_value"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k — SURVEY §2.6
# ---------------------------------------------------------------------------


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-100 events by value. Plans as TakeOrderedAndProject —
    per-partition heap + driver merge; no global sort at any scale."""
    events = table(spark, sf_dir, "events")
    return (
        events.orderBy(F.desc("value"), F.asc("event_id"))
        .select("event_id", "user_id", "value")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Set operations — SURVEY §2.7
# ---------------------------------------------------------------------------


def union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union (bag semantics, unionByName) of two event slices."""
    events = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    return clicks.unionByName(purchases)


def except_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: high-value events minus purchase events."""
    events = table(spark, sf_dir, "events")
    high = events.filter(F.col("value") > 100).select("event_id", "event_type")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "event_type"
    )
    return high.exceptAll(purchases)


def intersect_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users seen in both click and purchase events."""
    events = table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click").select("user_id")
    b = events.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


# ---------------------------------------------------------------------------
# Distinct / approx — SURVEY §2.4 A6
# ---------------------------------------------------------------------------


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact distinct (partial-aggregate dedup before shuffle)."""
    return table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: exact count-distinct users per event type."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: HyperLogLog++ approximate distinct, hash-oracled via its
    accuracy twin (VERDICT r08 #4 — previously rows-only). DuckDB cannot
    replay Spark's HLL++ sketch (different hash, different sketch), so the
    cross-engine contract is the LAW the sketch guarantees, emitted as an
    integer verdict next to the exact count both engines CAN compute:
    |approx − exact| ≤ max(2, ⌈0.125·exact⌉) — 2.5σ of the default
    rsd=0.05, against a worst observed fixture error of 6.7% ≈ 1.3σ
    (tools/approx_probe.py 2026-08-15). The verdict is deterministic per
    dataset (HLL++ is hash-based, no RNG), so the driver's hash compare is
    stable; a sketch regression or a bound violation flips a 1 to 0 and
    fails the hash loudly."""
    grouped = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id").alias("_approx"),
        )
    )
    bound = F.greatest(F.lit(2).cast("bigint"), F.ceil(F.col("n_users") * 0.125))
    return grouped.select(
        "event_type",
        "n_users",
        (F.abs(F.col("_approx") - F.col("n_users")) <= bound)
        .cast("int")
        .alias("hll_ok"),
    )


def approx_distinct_oracle() -> str:
    """The exact twin declares the law: every group's verdict must be 1."""
    return """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(1 AS INT) AS hll_ok
    FROM events GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# Rollup / cube — SURVEY §2.4 A7
# ---------------------------------------------------------------------------


def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: ROLLUP over region→nation customer stats. Dims broadcast."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over order status × priority."""
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# JSON scalar — SURVEY §2.8 F6
# ---------------------------------------------------------------------------


def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: parse events.props JSON, aggregate by extracted key."""
    events = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Event-time windows (batch equivalents of T3) — SURVEY §2.9
# ---------------------------------------------------------------------------


def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3a: 1-hour tumbling event-time window (batch form). In streaming the
    same expression runs under withWatermark('ts', ...) — see streaming/."""
    events = table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3b: 1-hour window sliding every 15 minutes (each event in 4 windows)."""
    events = table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return (
        events.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3c: session windows with a 5-minute gap, per user. No exact DuckDB
    builtin — oracled via the standard gaps-and-islands SQL."""
    events = table(spark, sf_dir, "events")
    win = F.session_window("ts", "5 minutes")
    return (
        events.groupBy("user_id", win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("session_start"), "n")
    )


# ---------------------------------------------------------------------------
# Bench headline queries (TPC-H-shaped; exercise scan+agg and the join tree)
# ---------------------------------------------------------------------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full lineitem scan → 4-group hash aggregate. The scan
    reads only 7 of 11 columns (pruned); partial aggregation collapses each
    input split to ≤4 rows before the shuffle."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    Join order: fact last, all dims broadcast (region/nation/customer are
    ≤ 1.5% of lineitem at every SF). At 100 TB only lineitem⋈orders is a
    real shuffle — both sides pre-partitionable (bucketed) on orderkey."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue over a quarter."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1996-07-01"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles per event_type. Spark's `percentile`
    and DuckDB's `quantile_cont` share the linear-interpolation definition,
    so the oracle is exact to rounding. At 100 TB the exact variant becomes
    `approx_percentile` (t-digest, mergeable map-side sketch); the exact one
    is the correctness baseline."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    # Scalar columns, not an array: the driver's canonicalizer sorts column
    # values and cannot hash list cells. One pass — Spark evaluates the three
    # percentiles over a single shared sort per group.
    return spark.sql(
        """
        SELECT event_type,
               round(percentile(value, 0.5), 4)  AS p50,
               round(percentile(value, 0.95), 4) AS p95,
               round(percentile(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type
        """
    )


def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram — a single map-side-combinable groupBy
    on the bucket expression."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT CAST(floor(value / 100) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               round(min(value), 2) AS lo, round(max(value), 2) AS hi
        FROM events GROUP BY 1
        """
    )


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: user-decile × event-type counts. Spark's pivot is planned as
    one aggregation with conditional counts — same single shuffle as the
    oracle's explicit CASE sums (which IS the portable spelling)."""
    events = table(spark, sf_dir, "events")
    return (
        events.withColumn("decile", (F.col("user_id") % 10).cast("int"))
        .groupBy("decile")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .select(
            "decile", *[F.col(t).cast("bigint").alias(t) for t in EVENT_TYPES]
        )
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension-history build from a changelog: each customer's
    orders become validity intervals [valid_from, valid_to) with an
    is_current flag on the open-ended last version — the standard
    slowly-changing-dimension type-2 construction, spelled as one lead()
    window. One shuffle on the dimension key; interval arithmetic is
    partition-local, so the build is linear and 100 TB-safe."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_custkey AS user_id, o_orderkey, o_totalprice,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               lead(o_orderdate) OVER w IS NULL AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """
    )


def scd2_intervals_oracle() -> str:
    return """
    SELECT o_custkey AS user_id, o_orderkey, o_totalprice,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           lead(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """


# ---------------------------------------------------------------------------
# join_salted — the skew-join recipe as a first-class operator. The
# companion of q_groupby_concat_salted (ingest.py): that one salts a
# skewed AGGREGATION; this one salts a skewed JOIN. When the fact side's
# join key is heavily skewed (here event_type: ~5 values over the whole
# stream — one shuffle partition would receive ~20% of 100 TB) and the
# dim side is too large to broadcast (billions of keys in production —
# simulated by pinning the join off the broadcast path), the fix is:
# fact gets a deterministic salt (pmod(xxhash64(event_id), S) — portable,
# reproducible, no RNG, and decorrelated from ANY id distribution by hash
# construction: a plain `id % S` silently loses fan-out whenever the hot
# key's ids are non-uniform mod S, e.g. ids striped by source shard —
# ADVICE r08 #1), the dim is exploded ×S, and the join key becomes
# (key, salt), fanning each hot key across S partitions. AQE's skew-join split solves
# the SORT-side skew for sort-merge joins, but a shuffled HASH join's
# build side and any downstream keyed agg still see the hot key — salting
# is the spelling that works everywhere. Output is aggregated back per
# key, so the oracle (a plain unsalted join in DuckDB) proves the rewrite
# is semantics-preserving.
#
# Measured AT THE SHIPPED CONFIG (tools/skew_probe.py, r08; 50%-hot-key
# synthetic, salts=8 == N_JOIN_SALTS, probe salt = the same
# pmod(xxhash64(·), S) spelling shipped here — its hash input is offset
# by +1 only because the probe's synthetic KEY derivation already
# consumes xxhash64(id) — fresh JVM per sample, 3-JVM medians, checksums
# asserted equal): at 40M rows the salted spelling runs 4.02 s (3.97-4.14) vs
# 10.1 s (10.01-10.43) unsalted — 2.5x faster with a tight envelope; at
# 8M rows 2.08 s vs 3.37 s (1.6x). AQE's skew split measured at 10.17 s
# == the straggler, i.e. NO help: OptimizeSkewedJoin silently declines
# when the join's output partitioning feeds a same-key aggregation
# (splitting would force an extra shuffle) — r07 additionally measured
# forceOptimizeSkewedJoin=true recovering only half the gap. For
# join -> same-key-agg pipelines — this engine's ingest shape — the
# salted rewrite is the only effective lever, and the win grows with the
# hot key's absolute size (r07's noisier-host run at effective 16 salts
# read 6.7x at the same 40M; the ratio is host/scale-dependent, the
# ORDERING and AQE's inapplicability are not).
# ---------------------------------------------------------------------------

N_JOIN_SALTS = 8


def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        f"""
        WITH dim AS (SELECT event_type, round(avg(value), 6) AS type_avg
                     FROM events GROUP BY event_type),
        dim_x AS (SELECT event_type, type_avg,
                         explode(sequence(0, {N_JOIN_SALTS - 1})) AS salt
                  FROM dim),
        fact AS (SELECT event_type, value,
                        CAST(pmod(xxhash64(event_id), {N_JOIN_SALTS}) AS INT)
                          AS salt
                 FROM events)
        SELECT /*+ SHUFFLE_HASH(d) */ f.event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN f.value > d.type_avg THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above_avg,
               round(sum(f.value), 2) AS total_value
        FROM fact f JOIN dim_x d
          ON f.event_type = d.event_type AND f.salt = d.salt
        GROUP BY f.event_type
        """
    )


def join_salted_oracle() -> str:
    return """
    WITH dim AS (SELECT event_type, round(avg(value), 6) AS type_avg
                 FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.value > d.type_avg THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_avg,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """


def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path of q_percentiles is `approx_percentile` (mergeable
    quantile sketch — map-side partial, O(sketch) shuffle instead of a
    per-group sort). NOTE (ADVICE r09 #2): what is REGISTERED here is the
    gate-instrumented accuracy TWIN — it runs the exact interpolating
    percentiles AND the sketch in one statement, so it is strictly more
    expensive than q_percentiles; the O(sketch) scale claim and any
    quoted probe figures apply to the sketch-only chain (the three
    `approx_percentile` calls alone), which is what a 100 TB deployment
    would run. Hash-oracled via its accuracy twin (VERDICT r08 #4 —
    previously rows-only): the sketch's answers are engine-specific, so
    the cross-engine columns are the EXACT interpolating percentiles
    (Spark `percentile` ≡ DuckDB `quantile_cont`, the proven q_percentiles
    identity) and the sketch's guarantee rides along as integer verdicts:
    with accuracy=1000 the rank error is ≤ 1/1000, so each approx quantile
    must land between the exact quantiles at q ± 0.01 (sketch rank error
    plus the non-interpolating value snap — approx_percentile returns an
    actual element). Deterministic per dataset (no RNG in the sketch), so
    the hash compare is stable; a rank-error regression flips a verdict
    to 0 and fails loudly."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    verdicts = ", ".join(
        f"CAST(approx_percentile(value, {q}, 1000) "
        f"BETWEEN percentile(value, {max(q - 0.01, 0.0)}) "
        f"AND percentile(value, {min(q + 0.01, 1.0)}) AS INT) AS {col}_ok"
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99"))
    )
    return spark.sql(
        f"""
        SELECT event_type,
               round(percentile(value, 0.5), 4)  AS p50,
               round(percentile(value, 0.95), 4) AS p95,
               round(percentile(value, 0.99), 4) AS p99,
               {verdicts}
        FROM events GROUP BY event_type
        """
    )


def approx_percentiles_oracle() -> str:
    """Exact quantiles cross-engine; the sketch law as all-ones verdicts."""
    return """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           CAST(1 AS INT) AS p50_ok, CAST(1 AS INT) AS p95_ok,
           CAST(1 AS INT) AS p99_ok
    FROM events GROUP BY event_type
    """


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: full-outer reconciliation — per customer, orders in two halves
    of the timeline (the classic two-system reconciliation shape: rows in
    either side survive, missing sides null). Aggregated first so the
    outer join runs on O(customers) rows per side, not raw orders."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH h1 AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n1
                    FROM orders WHERE o_orderdate < TIMESTAMP_NTZ '2024-01-16'
                    GROUP BY o_custkey),
        h2 AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n2
               FROM orders WHERE o_orderdate >= TIMESTAMP_NTZ '2024-01-16'
               GROUP BY o_custkey)
        SELECT coalesce(h1.o_custkey, h2.o_custkey) AS o_custkey,
               h1.n1, h2.n2,
               (h1.o_custkey IS NULL) AS only_late,
               (h2.o_custkey IS NULL) AS only_early
        FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
        """
    )


def join_full_outer_oracle() -> str:
    return """
    WITH h1 AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n1
                FROM orders WHERE o_orderdate < TIMESTAMP '2024-01-16'
                GROUP BY o_custkey),
    h2 AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n2
           FROM orders WHERE o_orderdate >= TIMESTAMP '2024-01-16'
           GROUP BY o_custkey)
    SELECT coalesce(h1.o_custkey, h2.o_custkey) AS o_custkey,
           h1.n1, h2.n2,
           (h1.o_custkey IS NULL) AS only_late,
           (h2.o_custkey IS NULL) AS only_early
    FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
    """


def unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of q_pivot: melt the decile × event-type count matrix
    back to (decile, event_type, n) long form via Spark's UNPIVOT —
    planned as one Expand over the aggregated frame (O(deciles × types)
    rows), no extra shuffle beyond the pivot's own aggregation."""
    wide = pivot_event_types(spark, sf_dir)
    wide.createOrReplaceTempView("pivoted")
    cols = ", ".join(EVENT_TYPES)
    return spark.sql(
        f"""
        SELECT decile, event_type, n FROM pivoted
        UNPIVOT (n FOR event_type IN ({cols}))
        ORDER BY decile, event_type
        """
    )


def unpivot_events_oracle() -> str:
    # the long form is just the original groupBy — UNPIVOT∘PIVOT = identity
    # (modulo zero-count cells, which PIVOT materializes and the original
    # aggregation never had: recreate them with a decile×type grid)
    return """
    WITH grid AS (
      SELECT d.decile, t.event_type
      FROM (SELECT DISTINCT user_id % 10 AS decile FROM events) d
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
    counts AS (
      SELECT user_id % 10 AS decile, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2)
    SELECT g.decile, g.event_type, coalesce(c.n, 0) AS n
    FROM grid g LEFT JOIN counts c
      ON g.decile = c.decile AND g.event_type = c.event_type
    ORDER BY g.decile, g.event_type
    """


def scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumption side of q_scd2: point-in-time dimension lookup —
    each event joined to the SCD-2 version of its user that was valid at
    the event's timestamp (valid_from <= ts < valid_to, open-ended last
    version). The join is an EQUI-join on the dimension key with the
    interval test as a residual predicate — at 100 TB both sides hash on
    user_id (the same key the dimension table is bucketed by), so the
    lookup costs one co-locatable shuffle; never a range-only BNLJ.
    Events before a user's first version get NULLs (left join) — the
    early-fact case every SCD consumer must define."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH dim AS (
          SELECT o_custkey AS user_id, o_orderkey, o_totalprice,
                 o_orderdate AS valid_from,
                 lead(o_orderdate) OVER w AS valid_to
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        SELECT e.event_id, e.user_id, d.o_orderkey, d.o_totalprice,
               (d.o_orderkey IS NULL) AS before_first_version
        FROM events e LEFT JOIN dim d
          ON e.user_id = d.user_id
         AND e.ts >= d.valid_from
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        """
    )


def scd2_lookup_oracle() -> str:
    return """
    WITH dim AS (
      SELECT o_custkey AS user_id, o_orderkey, o_totalprice,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER w AS valid_to
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
    SELECT e.event_id, e.user_id, d.o_orderkey, d.o_totalprice,
           (d.o_orderkey IS NULL) AS before_first_version
    FROM events e LEFT JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    """


# ---------------------------------------------------------------------------
# window_range — RANGE-frame window (the time-valued frame the W-family's
# ROWS frames can't express: "everything in the trailing hour", peers
# included regardless of row order). Count + cents-sum per user over a
# trailing 3600 s frame keyed on epoch seconds. Value carried in integer
# cents: RANGE frames are where engines differ most in evaluation
# strategy (running accumulation vs segment tree), so float addition
# order is NOT cross-engine stable — integer sums are. Scale: one
# shuffle on user_id, partition-local ordered scan with a sliding
# aggregate; frame state is bounded by events-per-hour-per-user.
# ---------------------------------------------------------------------------


def window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import EPOCH_NTZ

    events = table(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        F.expr(f"timestampdiff(SECOND, {EPOCH_NTZ}, ts)").alias("es"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("es"))
        .rangeBetween(-3599, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "es",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.sum("cents").over(w).cast("bigint").alias("cents_1h"),
    )


def window_range_oracle() -> str:
    return """
    WITH e AS (SELECT event_id, user_id,
                      date_diff('second', TIMESTAMP '1970-01-01', ts) AS es,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT event_id, user_id, es,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY es
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """


# ---------------------------------------------------------------------------
# agg_argminmax — min_by / max_by (DuckDB arg_min / arg_max): which user
# leads/trails each event type by total spend. The argmax KEY packs the
# tiebreak into the ordering value (total·1e10 ± user_id) because struct/
# tuple ordering inside max_by is where the two engines' dialects
# diverge. The packing rides each engine's exact >64-bit integer carrier
# (Spark DECIMAL(38,0) — no int128 type; DuckDB HUGEINT), so it is exact
# for ANY BIGINT total and user_id < 1e10 — the original BIGINT packing
# (radix 1e5) tripped its own guard the moment the 100× scale probe's
# key-shifted users passed 1e5, which is exactly what the guard was for.
# The guard stays, at the new bound, so a >10-billion-user estate still
# fails loudly instead of silently mis-ranking. One map-side-combinable
# shuffle on (type, user), then an O(users) fold per type — no window,
# no second shuffle.
# ---------------------------------------------------------------------------

_ARGMM_BODY = """
t0 AS (SELECT event_type, user_id,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total
       FROM events GROUP BY event_type, user_id),
t AS (SELECT event_type, user_id, CAST(total AS {wide}) AS total
      FROM t0
      WHERE CASE WHEN user_id >= 0 AND user_id < 10000000000 THEN true
                 ELSE {raise_fn}(
                   'argminmax radix bound exceeded: widen the packing')
                   IS NOT NULL END)
SELECT event_type,
       {maxby}(user_id, total * 10000000000 + (9999999999 - user_id))
         AS top_user,
       CAST({maxby}(total, total * 10000000000 + (9999999999 - user_id))
            AS BIGINT) AS top_cents,
       {minby}(user_id, total * 10000000000 + user_id) AS low_user,
       CAST({minby}(total, total * 10000000000 + user_id) AS BIGINT)
         AS low_cents
FROM t GROUP BY event_type
"""


def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        "WITH "
        + _ARGMM_BODY.format(
            maxby="max_by", minby="min_by", raise_fn="raise_error",
            wide="DECIMAL(38,0)",
        )
    )


def agg_argminmax_oracle() -> str:
    return "WITH " + _ARGMM_BODY.format(
        maxby="arg_max", minby="arg_min", raise_fn="error", wide="HUGEINT"
    )


# ---------------------------------------------------------------------------
# shipping_priority — TPC-H Q3 shape: segment-filtered customers ⋈ open
# orders ⋈ shipped lineitems → revenue per order → top 10. Completes the
# classic join-tree trio (Q1 scan-agg, Q5 star join, Q10 join+topk) with
# the selective-dim + fact-agg + TakeOrdered shape. Revenue is summed in
# integer MICROS (per-row round then exact integer sum) because the
# top-10 CUT ranks on the sum — a float sum's last-ulp wobble could
# reorder the boundary between engines, where Q1's unranked 6-row output
# could not. Plan: both dims broadcast, lineitem never shuffles before
# the aggregation, final cut TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_Q3_CUTOFF = "'1998-01-01'"
_Q3_SEGMENT = "'BUILDING'"

_SHIPPING_PRIORITY = f"""
SELECT l.l_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000)
                     AS BIGINT)) AS BIGINT) AS revenue_micros,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = {_Q3_SEGMENT}
  AND o.o_orderdate < {_Q3_CUTOFF}
  AND l.l_shipdate > {_Q3_CUTOFF}
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_micros DESC, l.l_orderkey
LIMIT 10
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SHIPPING_PRIORITY)


def shipping_priority_oracle() -> str:
    return _SHIPPING_PRIORITY


# ---------------------------------------------------------------------------
# order_priority_check — TPC-H Q4 shape: per-priority count of orders in a
# quarter having at least one late-shipped line (EXISTS decorrelates to a
# LEFT SEMI join — the fixture lacks commit/receipt dates, so "late" =
# shipped after order date + 60 days, same selectivity role). Shape value:
# the semi-join + agg plan (Q4's signature) where the probe side is
# pruned by the date range BEFORE the join.
# ---------------------------------------------------------------------------

_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_ORDER_PRIORITY)


def order_priority_check_oracle() -> str:
    return _ORDER_PRIORITY.replace("INTERVAL 60 DAY", "INTERVAL 60 DAYS")


# ---------------------------------------------------------------------------
# skyline — 2-D Pareto frontier (skyline query, Börzsönyi et al. ICDE
# 2001): the orders no other order beats on BOTH price and date (strict
# dominance on at least one axis). The classic single-node answer is the
# sort-scan — sort by (price, date), keep a point iff its date beats the
# running minimum — whose global ORDER BY window would serialize the
# table through one task. This spelling distributes it with the
# pack_global two-phase prefix pattern generalized from sums to MINS:
# per-bucket date minima (map-side-combinable) → exclusive cumulative
# min over the tiny ordered-bucket frame → broadcast back → within-
# bucket parallel window, combined with least(). Exact integers (cents,
# epoch days); duplicate (cents, day) points are pre-folded (mutual
# non-dominance — all copies survive, reported via n_orders).
# ---------------------------------------------------------------------------

SKYLINE_BUCKET_CENTS = 2000000  # $20k price bands — ordered bucket key


def skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        WITH pts AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                            CAST(datediff(CAST(o_orderdate AS DATE),
                                          DATE '1992-01-01') AS BIGINT) AS day
                     FROM orders),
        d AS (SELECT cents, day, CAST(count(*) AS BIGINT) AS n_orders,
                     cents div {SKYLINE_BUCKET_CENTS} AS bucket
              FROM pts GROUP BY cents, day),
        bm AS (SELECT bucket, min(day) AS bday FROM d GROUP BY bucket),
        bo AS (SELECT bucket,
                      min(bday) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS prefix_min
               FROM bm),
        w AS (SELECT d.cents, d.day, d.n_orders,
                     least(coalesce(bo.prefix_min, 9223372036854775807),
                           coalesce(min(d.day) OVER (PARTITION BY d.bucket
                             ORDER BY d.cents, d.day
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                             9223372036854775807)) AS prev_min
              FROM d JOIN bo ON d.bucket = bo.bucket)
        SELECT cents, day, n_orders FROM w WHERE day < prev_min
        """
    )


def skyline_oracle() -> str:
    # DuckDB states the semantics with the direct global sort-scan.
    return """
    WITH pts AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                        CAST(date_diff('day', DATE '1992-01-01',
                                       CAST(o_orderdate AS DATE)) AS BIGINT)
                          AS day
                 FROM orders),
    d AS (SELECT cents, day, CAST(count(*) AS BIGINT) AS n_orders
          FROM pts GROUP BY cents, day),
    w AS (SELECT cents, day, n_orders,
                 coalesce(min(day) OVER (ORDER BY cents, day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   9223372036854775807) AS prev_min
          FROM d)
    SELECT cents, day, n_orders FROM w WHERE day < prev_min
    """


# ---------------------------------------------------------------------------
# promo_revenue — TPC-H Q14 shape: what share of a month's revenue came
# from PROMO parts. lineitem ⋈ part on partkey (part broadcasts — the
# dim is tiny at every SF), conditional revenue split, share as one
# exact integer DIV in basis points. Revenue per row rounded to integer
# CENTS before summing (deterministic per-row, exact order-independent
# sum — the Q3 discipline; Q14's textbook 100*sum/sum of raw doubles is
# summation-order-sensitive and would flap the oracle). Cents, not
# micros, deliberately: the bp share multiplies the sum by 10⁴ first,
# and cents keep that product inside BIGINT to ~$10¹² of monthly
# revenue (micros would overflow Spark-4 ANSI arithmetic near sf1.5).
# ---------------------------------------------------------------------------

_PROMO_SQL = """
WITH rev AS (
  SELECT CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS cents,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= '1997-09-01' AND l.l_shipdate < '1997-10-01')
SELECT CAST(sum(is_promo * cents) AS BIGINT) AS promo_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST((sum(is_promo * cents) * 10000) {idiv} sum(cents) AS BIGINT)
         AS promo_bp
FROM rev
"""


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_PROMO_SQL.format(idiv="div"))


def promo_revenue_oracle() -> str:
    return _PROMO_SQL.format(idiv="//")


# ---------------------------------------------------------------------------
# special_parts — TPC-H Q19 shape: the disjunctive multi-predicate join
# (OR of brand/size/quantity conjunction groups). The shape's value is
# what Catalyst does with it: the COMMON predicate parts (the partkey
# equi-key; a derivable size/quantity envelope) push into the scans,
# the disjunction stays as a join residual — never a Cartesian.
# ---------------------------------------------------------------------------

_SPECIAL_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000)
                     AS BIGINT)) AS BIGINT) AS revenue_micros
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#7' AND p.p_size <= 25 AND l.l_quantity <= 35)
   OR (p.p_brand = 'Brand#13' AND p.p_size <= 40 AND l.l_quantity <= 50)
"""


def special_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SPECIAL_SQL)


def special_parts_oracle() -> str:
    return _SPECIAL_SQL


# ---------------------------------------------------------------------------
# window_ntile — the distribution-ranking window triple completing §2.5:
# ntile(4) quartile bucket, percent_rank, cume_dist per customer within
# their market segment, ranked by lifetime order cents. percent_rank
# ((rank-1)/(n-1)) and cume_dist (peers/n) are emitted in integer basis
# points: both engines divide the SAME exact integers as doubles, and
# round(x*10000) of an identical IEEE double is engine-identical (the
# q_percentiles discipline). Ties broken by custkey so bucket edges are
# deterministic.
#
# At 100 TB: pre-aggregate to one row per ENTITY first (customers, not
# orders), then window over the segment partitions — the same
# entity-grain discipline as rfm_segments; the window never sees the
# fact table.
# ---------------------------------------------------------------------------

_WINDOW_NTILE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT c.c_custkey, c.c_mktsegment, cust.cents
  FROM customer c JOIN cust ON cust.o_custkey = c.c_custkey
)
SELECT c_custkey, c_mktsegment, cents,
       CAST(ntile(4) OVER w AS INT) AS spend_quartile,
       CAST(round(percent_rank() OVER w * 10000) AS BIGINT) AS pct_rank_bp,
       CAST(round(cume_dist() OVER w * 10000) AS BIGINT) AS cume_dist_bp
FROM seg
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY cents DESC, c_custkey)
"""


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_WINDOW_NTILE)


def window_ntile_oracle() -> str:
    return _WINDOW_NTILE


# ---------------------------------------------------------------------------
# join_asof_forward — the FORWARD as-of direction: each event matched to
# the user's EARLIEST order with o_orderdate >= ts ("what did this user
# buy next"), completing the as-of family (backward join_asof = state
# lookup; forward = next-action attribution, time-to-conversion, SLA
# response measurement). Same union-merge zero-join core: negating the
# time axis turns carry-FORWARD into carry-BACKWARD — sort by -t puts
# later rows first, so "last seen carry row" at a probe row is exactly
# the earliest order at-or-after it. Tie discipline mirrors the
# backward operator: at equal instants orders sort before events
# (inclusive >=), and same-date orders pick the LOWEST o_orderkey (the
# negated tiebreak — backward picks the highest).
# One shuffle+sort of events ∪ orders on user_id; no events × orders
# expansion at any scale.
# ---------------------------------------------------------------------------


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import epoch_micros

    events = table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    e = events.select(
        F.col("user_id").alias("uid"),
        (-epoch_micros("ts")).alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        epoch_micros("ts").alias("pts_us"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("bigint").alias("odate_us"),
    )
    o = orders.select(
        F.col("o_custkey").alias("uid"),
        (-epoch_micros("o_orderdate")).alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("bigint").alias("pts_us"),
        "o_orderkey",
        epoch_micros("o_orderdate").alias("odate_us"),
    )
    carried = union_merge_asof(
        e,
        o,
        ["o_orderkey", "odate_us"],
        F.coalesce(-F.col("o_orderkey"), F.col("event_id")),
    )
    # integer division (the repo's exactness discipline — a bare `/`
    # would detour through DOUBLE; fine for non-negative micro diffs
    # under 2^53 but an invariant better not relied on implicitly)
    wait = F.expr("(l_odate_us - pts_us) div 1000000")
    return carried.select(
        "event_id",
        F.col("uid").alias("user_id"),
        F.col("l_o_orderkey").alias("next_orderkey"),
        F.when(F.col("l_o_orderkey").isNotNull(), wait).alias("wait_secs"),
    )


def join_asof_forward_oracle() -> str:
    return """
    WITH e AS (SELECT event_id, user_id, ts FROM events),
    j AS (SELECT e.event_id, o.o_orderkey,
                 (epoch_us(o.o_orderdate) - epoch_us(e.ts)) // 1000000
                   AS wait_secs,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate, o.o_orderkey) AS rn
          FROM e JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
    SELECT e.event_id, e.user_id,
           j.o_orderkey AS next_orderkey,
           CAST(j.wait_secs AS BIGINT) AS wait_secs
    FROM e LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
      ON j.event_id = e.event_id
    """


# ---------------------------------------------------------------------------
# join_asof_tolerance — the third member of the as-of family: backward
# as-of (J3) answers "latest prior", forward as-of answers "earliest
# next", this one answers "latest prior IF RECENT ENOUGH" — the
# attribution-window join (pandas merge_asof's `tolerance=`): each
# purchase event matched to the same user's latest preceding click,
# but only when that click falls inside the 2-day attribution window;
# stale clicks yield an explicit NULL (LEFT semantics), because "no
# recent touchpoint" is the signal attribution pipelines act on.
#
# Same union-merge core as J3 — ONE shuffle+sort of clicks ∪ purchases
# on user_id, carry the last click forward, and the tolerance is a
# POST-FILTER on the carried row: the carry is oblivious to the window,
# so no second scan, no per-tolerance re-join, and the plan is
# byte-identical to J3's zero-join shape. The equi-join + argmax
# spelling would put the tolerance in the ON clause and still expand
# O(purchases × clicks-per-user); here it is one comparison per
# purchase row. Tie discipline inherited from the core: same-instant
# clicks sort before purchases (inclusive contract), equal-ts clicks
# resolve to the highest click_id — exactly the oracle's
# (ts DESC, click_id DESC) argmax.
#
# At 100 TB: identical scale story to J3 (cost O((|C|+|P|) log) in one
# partitioned sort); the 2-day window additionally BOUNDS streaming
# state if this is run continuously (it is the watermark horizon).
# ---------------------------------------------------------------------------

ASOF_TOL_SECS = 2 * 86400


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3b: attribution-window as-of — latest prior click within 2 days."""
    events = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    ts_type = events.schema["ts"].dataType
    p = events.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast(ts_type).alias("click_ts"),
    )
    c = events.filter("event_type = 'click'").select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    carried = union_merge_asof(p, c, ["click_id", "click_ts"], F.col("click_id"))
    gap_us = F.expr("timestampdiff(MICROSECOND, l_click_ts, t)")
    within = F.col("l_click_id").isNotNull() & (
        gap_us <= F.lit(ASOF_TOL_SECS * 1_000_000)
    )
    return carried.select(
        F.col("event_id").alias("purchase_id"),
        F.col("uid").alias("user_id"),
        F.when(within, F.col("l_click_id")).alias("click_id"),
        F.when(
            within,
            F.expr(
                "CAST(timestampdiff(MICROSECOND, l_click_ts, t) "
                "div 1000000 AS BIGINT)"
            ),
        ).alias("gap_secs"),
    )


def join_asof_tolerance_oracle() -> str:
    return f"""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    j AS (SELECT p.event_id, c.click_id,
                 (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_secs,
                 row_number() OVER (PARTITION BY p.event_id
                                    ORDER BY c.ts DESC, c.click_id DESC)
                   AS rn
          FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
            AND epoch_us(p.ts) - epoch_us(c.ts)
                <= CAST({ASOF_TOL_SECS} AS BIGINT) * 1000000)
    SELECT p.event_id AS purchase_id, p.user_id,
           j.click_id, CAST(j.gap_secs AS BIGINT) AS gap_secs
    FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
      ON j.event_id = p.event_id
    """


# ---------------------------------------------------------------------------
# bloom_join — the semi-join-reduction / runtime-row-filter join
# strategy, spelled explicitly: revenue of lineitems whose orders
# belong to BUILDING-segment customers. The naive plan shuffles ALL of
# lineitem into the orders join; at 100 TB the winning plan first
# broadcasts a BOUNDED digest of the qualifying build side — here the
# distinct hash-buckets of qualifying order keys, capped at
# BLOOM_M = 2^16 rows no matter how many keys qualify (the hand-rolled,
# deterministic analogue of Spark's runtime bloom filter /
# InjectRuntimeFilter) — and semi-joins the fact side against it
# map-side, so only surviving rows (true matches + bucket-collision
# false positives) pay the exact-join shuffle. Correctness never
# depends on the filter: the exact semi-join runs after it, so the
# bucket hash can be Spark-private (xxhash64) with no oracle
# counterpart; the oracle is the plain three-way join.
#
# Plan pins (tests/test_plans.py): the bucket digest reaches the fact
# scan as a BroadcastHashJoin BEFORE any data exchange, and the probe
# scan reads only the referenced columns.
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 16  # bucket-digest capacity: broadcast is <= 2^16 rows, always


def bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: semi-join reduction via a broadcast bucket digest.

    Reference parity: ABSENT (no joins in /root/reference at all,
    SURVEY §2.3); this is the north-star join-strategy surface.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")

    build = (
        orders.join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING")
                .select("c_custkey")
            ),
            orders.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .select("o_orderkey", "o_orderpriority")
    )
    # bounded digest of the build side's key set (never > BLOOM_M rows)
    digest = (
        build.select(
            F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(BLOOM_M))
            .alias("bucket")
        ).distinct()
    )
    prefiltered = lineitem.select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).join(
        F.broadcast(digest),
        F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(BLOOM_M))
        == F.col("bucket"),
        "left_semi",
    )
    # exact join AFTER the reduction: collisions die here, semantics exact
    joined = prefiltered.join(
        build, prefiltered.l_orderkey == build.o_orderkey
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (
                    F.round(F.col("l_extendedprice") * 1000).cast("long")
                    * (1000 - F.round(F.col("l_discount") * 1000).cast("long"))
                )
            ).alias("revenue_micros"),
        )
    )


def bloom_join_oracle() -> str:
    return """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 1000) AS BIGINT)
                    * (1000 - CAST(round(l.l_discount * 1000) AS BIGINT)))
                AS BIGINT) AS revenue_micros
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderpriority
    """


# ---------------------------------------------------------------------------
# recursive_hierarchy — WITH RECURSIVE as the engine's NATIVE fixpoint
# operator (Spark 4 / SQL:1999): flatten a key-derived customer
# hierarchy (parent(k) = k div 10 — the digit forest every surrogate-key
# scheme hides) into its full ancestor CLOSURE, reporting per-distance
# entry counts and the hops-to-root histogram. The declarative twin of
# the repo's hand-driven fixpoints: q_dedup_clusters loops label
# propagation from the DRIVER, q_bfs_hops/q_pagerank unroll a fixed
# depth — here the ENGINE owns termination (recursion stops when no row
# satisfies ancestor > 0), which is the form that composes with AQE and
# needs no Python in the loop.
#
# All-integer; the recursive step is a NARROW projection (ancestor div
# 10) — each iteration is O(live rows) with no join, depth is
# O(log₁₀ keyspace) by construction, and the only shuffle is the final
# histogram fold. DuckDB runs the IDENTICAL recursion (modulo integer
# division dialect) — the differential proves the two engines' fixpoint
# semantics agree row-for-row.
# ---------------------------------------------------------------------------


def _recursive_hierarchy_sql(idiv: str) -> str:
    return f"""
    WITH RECURSIVE chain AS (
        SELECT c_custkey AS node, c_custkey AS ancestor,
               CAST(0 AS BIGINT) AS depth
        FROM customer
        UNION ALL
        SELECT node, ancestor {idiv} 10 AS ancestor, depth + 1 AS depth
        FROM chain WHERE ancestor > 0
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_entries,
           CAST(sum(CASE WHEN ancestor = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_at_root
    FROM chain GROUP BY depth
    """


def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N147: ancestor closure via the engine-native recursive CTE."""
    # the closure is O(N·log₁₀ keyspace) rows BY CONSTRUCTION (each node
    # contributes its digit-chain length) — raise Spark's safety-valve
    # row limit (default 1e6, tripped at ~sf1) to match; the LEVEL limit
    # (default 100) is never near: depth = digits of the max key
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(100_000_000))
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_recursive_hierarchy_sql("div"))


def recursive_hierarchy_oracle() -> str:
    return _recursive_hierarchy_sql("//")


# ---------------------------------------------------------------------------
# histogram_eqd — the EQUI-DEPTH histogram (quantile-bucketed), the other
# classic next to q_histogram's equi-width: every database optimizer's
# column statistic, because equal-population buckets bound selectivity
# estimation error where equal-width buckets collapse under skew.
# Spelled the scale-correct way (the rfm_segments discipline): the 9
# decile boundaries are EXACT interpolated percentiles computed in a
# 1-row frame (percentile ≡ quantile_cont identity on the integer cents
# carrier) and broadcast-classified back over the corpus — no global
# sort, no ntile window. Depths are equal up to boundary TIES
# (documented: a value equal to a boundary belongs to the right bucket;
# heavy ties make depths uneven, which is itself the signal an optimizer
# reads from such a histogram).
# ---------------------------------------------------------------------------

EQD_BUCKETS = 10


def _histogram_eqd_sql(pct: str, idiv: str) -> str:
    qs = ", ".join(
        f"{pct}(cents, 0.{k}) AS q{k}" for k in range(1, EQD_BUCKETS)
    )
    case = " ".join(
        f"WHEN cents < b.q{k} THEN {k - 1}" for k in range(1, EQD_BUCKETS)
    )
    return f"""
    v AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
    b AS (SELECT {qs} FROM v),
    cls AS (SELECT cents,
                   CASE {case} ELSE {EQD_BUCKETS - 1} END AS bucket
            FROM v CROSS JOIN b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v)
    SELECT c.bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(c.cents) AS BIGINT) AS lo_cents,
           CAST(max(c.cents) AS BIGINT) AS hi_cents,
           CAST(count(*) * 10000 {idiv} t.n AS BIGINT) AS share_bp
    FROM cls c CROSS JOIN tot t GROUP BY c.bucket, t.n
    """


def histogram_eqd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N201: equi-depth histogram via broadcast exact decile boundaries."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("WITH " + _histogram_eqd_sql("percentile", "div"))


def histogram_eqd_oracle() -> str:
    return "WITH " + _histogram_eqd_sql("quantile_cont", "//")


# ---------------------------------------------------------------------------
# pareto_cut — contribution analysis ("which brands are 80% of
# revenue?"): per-brand exact-micro revenue, ranked, cumulative share,
# and the Pareto flag marking the smallest prefix covering ≥ 80% — the
# BI waterfall/concentration readout every revenue review starts from,
# and the relational sibling of q_gini (Gini summarizes concentration in
# one number; this names the members). Exact integers end to end: the
# basis-point shares are DECIMAL(38,0)·10000 with the mod-subtract exact
# division ((x − x%d)/d — divisible by construction, immune to the
# DuckDB-rounds-vs-Spark-truncates DECIMAL division split, and to the
# BIGINT overflow a plain rev·10000 hits at 10× scale), and the flag
# comparison is cross-multiplied (cum·5 vs 4·total) so no float ever
# decides membership. The ranking window is unpartitioned but runs on
# the O(#brands) fold — bounded by the dimension, never data
# (whitelisted).
# ---------------------------------------------------------------------------


def _bp_exact(x: str, d: str) -> str:
    """Exact truncating (x·10000)/d over DECIMAL(38,0) carriers."""
    prod = f"(CAST({x} AS DECIMAL(38,0)) * 10000)"
    return f"CAST(({prod} - {prod} % {d}) / {d} AS BIGINT)"


def _pareto_cut_sql() -> str:
    return f"""
    b AS (SELECT p.p_brand AS brand,
                 CAST(sum(CAST(round(l.l_extendedprice * 1000) AS BIGINT)
                          * (1000 - CAST(round(l.l_discount * 1000)
                                         AS BIGINT))) AS BIGINT) AS rev
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          GROUP BY p.p_brand),
    r AS (SELECT brand, rev,
                 row_number() OVER (ORDER BY rev DESC, brand) AS rk,
                 sum(rev) OVER (ORDER BY rev DESC, brand) AS cum,
                 sum(rev) OVER () AS total
          FROM b)
    SELECT brand, rk, rev,
           {_bp_exact('rev', 'total')} AS share_bp,
           {_bp_exact('cum', 'total')} AS cum_bp,
           (cum - rev) * 5 < 4 * total AS in_top80
    FROM r
    """


def pareto_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N203: exact-integer Pareto (80%) revenue-concentration cut."""
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("WITH " + _pareto_cut_sql())


def pareto_cut_oracle() -> str:
    return "WITH " + _pareto_cut_sql()


# ---------------------------------------------------------------------------
# hhi — the Herfindahl-Hirschman concentration index of revenue by
# customer, per market segment: the antitrust/portfolio-risk one-number
# summary q_pareto_cut's prefix view and q_gini's inequality view both
# orbit (HHI weights LARGE shares quadratically — the "one whale"
# signal). Spelled with exact carriers: HHI = Σ rev_i² / (Σ rev_i)² —
# both the squared-revenue sum and the squared total are exact
# DECIMAL(38,0)/DECIMAL(38,0) compositions of integer micros, and the
# index is ONE double division at the readout; also published ×10⁴
# (the conventional 0–10000 scale) and with the equivalent-firm count
# 1/HHI.
# Scale: ONE customer-keyed fold then ONE segment fold — both map-side
# combinable; no windows, no pair surface.
# ---------------------------------------------------------------------------


def _hhi_sql() -> str:
    dec = "DECIMAL(38,0)"
    return f"""
    cust AS (SELECT c.c_mktsegment AS segment, o.o_custkey AS cust,
                    CAST(sum(CAST(round(l.l_extendedprice * 1000)
                                  AS BIGINT)
                             * (1000 - CAST(round(l.l_discount * 1000)
                                            AS BIGINT))) AS BIGINT) AS rev
             FROM lineitem l
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             GROUP BY c.c_mktsegment, o.o_custkey),
    seg AS (SELECT segment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(rev) AS BIGINT) AS total,
                   CAST(sum(CAST(rev AS {dec}) * rev) AS {dec}) AS sq
            FROM cust GROUP BY segment)
    SELECT segment, n_customers,
           round(CAST(sq AS DOUBLE)
                 / CAST(CAST(total AS {dec}) * total AS DOUBLE), 9)
             AS hhi_r9,
           round(10000 * CAST(sq AS DOUBLE)
                 / CAST(CAST(total AS {dec}) * total AS DOUBLE), 4)
             AS hhi_scaled_r4,
           round(CAST(CAST(total AS {dec}) * total AS DOUBLE)
                 / CAST(sq AS DOUBLE), 4) AS equiv_firms_r4
    FROM seg
    """


def hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N206: Herfindahl revenue concentration per segment, exact carriers."""
    for t in ("lineitem", "orders", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("WITH " + _hhi_sql())


def hhi_oracle() -> str:
    return "WITH " + _hhi_sql()
