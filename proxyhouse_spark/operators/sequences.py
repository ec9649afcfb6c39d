"""Event-SEQUENCE algebra over ``events`` — the ClickHouse-flavored
funnel/sequence aggregate family (windowFunnel, sequenceCount,
maxIntersections) re-expressed as single-shuffle window-function plans.

The reference exists to feed an analytics store whose query surface is
exactly this family (/root/reference/README.md:7 — a ClickHouse ingest
proxy); these are the sequence aggregations run on the other side of
that pipe. Each is ABSENT in the reference itself (no data-value
computation there, SURVEY §2.5) — north-star surface per BASELINE.json.

All three share one physical shape: ONE shuffle on ``user_id`` (or none
for the sweep-line merge), per-key sorted window passes, exact integer
epoch-micros arithmetic, O(users) or O(1) output. No self-joins: the
chain-existence logic that naive spellings express as events×events
joins (quadratic per user) collapses to running max/sum windows —
linear, and safe for users with millions of events at 100 TB.

- ``window_funnel``     — max funnel depth view→click→purchase where the
                          whole chain fits in a 24 h window of its FIRST
                          event (ClickHouse ``windowFunnel`` semantics:
                          ANY qualifying chain counts, not just the one
                          anchored at the user's first view — that
                          anchored variant is q_event_funnel).
- ``sequence_count``    — greedy NON-OVERLAPPING view→purchase pair count
                          per user (ClickHouse ``sequenceCount``): the
                          parenthesis-matching identity turns the
                          sequential greedy scan into two running sums.
- ``max_intersections`` — peak concurrent sessions across all users
                          (ClickHouse ``maxIntersections``): gap-based
                          session intervals → ±1 sweep-line deltas →
                          distributed two-phase prefix sum (per-day
                          running sums + an O(#days) bounded offset
                          frame), never a whole-corpus single-partition
                          sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

#: windowFunnel chain window: the whole chain must fit in 24 h of its
#: first event.
FUNNEL_WINDOW_US = 86_400_000_000

#: session gap for the sweep-line intervals — same 30 min inactivity
#: threshold as q_sessionize, so `max_concurrent` is the peak of exactly
#: the session table that query materializes.
SWEEP_GAP_US = 1_800 * 1_000_000

_DAY_US = 86_400_000_000


def _events(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")


# ---------------------------------------------------------------------------
# window_funnel — ClickHouse windowFunnel(24h)('view','click','purchase').
#
# Semantics: a user reaches depth d if SOME chain t1 < t2 < ... < td of
# the staged event types exists with td ≤ t1 + W. Existential over all
# chains — the naive spelling is a d-way self-join. The linear identity:
# for a fixed last event at time t, the chain constraint is loosest when
# the FIRST event is as late as possible; the latest feasible stage-k
# predecessor before t is itself a running maximum. Concretely with
# events ordered by (t, event_id) per user:
#
#   anchor1(click c)   = latest 'view' strictly before c
#                        (running max over view times, 1-preceding frame)
#   anchor2(purch p)   = max over clicks c before p of anchor1(c)
#                        (running max of the stage-1 anchors)
#
#   depth≥2 ⟺ ∃ click c:    c ≤ anchor1(c) + W
#   depth≥3 ⟺ ∃ purchase p: p ≤ anchor2(p) + W
#
# Maximizing the anchor is sound: any feasible chain's first view v
# satisfies v ≤ anchor, so td ≤ v + W ⇒ td ≤ anchor + W; conversely the
# anchors themselves form a chain (anchor1(c) < c by the strict
# 1-preceding frame, and anchor2(p) is some anchor1(c) with c < p).
# Intermediate events need no window check of their own: c < p ≤ v + W
# already bounds them. Monotone by construction: depth3 ⇒ depth2 ⇒ 1.
#
# ONE shuffle (user_id), two stacked window passes on the same sort
# order (Catalyst fuses them into one WindowExec sort), O(users)
# intermediate, O(3) output rows {depth, n_users, n_reached}.
# ---------------------------------------------------------------------------


def _window_funnel_sql(epoch: str) -> str:
    w = FUNNEL_WINDOW_US
    return f"""
    e AS (SELECT user_id, event_id, event_type, {epoch} AS t
          FROM events
          WHERE event_type IN ('view', 'click', 'purchase')),
    a1 AS (SELECT user_id, event_id, event_type, t,
                  max(CASE WHEN event_type = 'view' THEN t END) OVER (
                      PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS anchor1
           FROM e),
    a2 AS (SELECT user_id, event_type, t, anchor1,
                  max(CASE WHEN event_type = 'click'
                           THEN anchor1 END) OVER (
                      PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS anchor2
           FROM a1),
    u AS (SELECT user_id,
                 max(CASE WHEN event_type = 'view'
                          THEN 1 ELSE 0 END)
                 + max(CASE WHEN event_type = 'click'
                            AND t <= anchor1 + {w}
                            THEN 1 ELSE 0 END)
                 + max(CASE WHEN event_type = 'purchase'
                            AND t <= anchor2 + {w}
                            THEN 1 ELSE 0 END) AS depth
          FROM a2 GROUP BY user_id)
    SELECT CAST(depth AS INT) AS depth,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(count(*)) OVER (
                ORDER BY depth DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_reached
    FROM u WHERE depth > 0
    GROUP BY depth
    """


def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N127: ClickHouse windowFunnel — any-chain max depth in 24 h."""
    from ..tables import EPOCH_NTZ

    _events(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _window_funnel_sql(f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts)")
    )


def window_funnel_oracle() -> str:
    return "WITH " + _window_funnel_sql("epoch_us(ts)")


# ---------------------------------------------------------------------------
# sequence_count — ClickHouse sequenceCount('(?1)(?2)')(view, purchase)
# with the standard greedy NON-OVERLAPPING match rule: scan the user's
# timeline; every 'purchase' consumes the oldest unconsumed 'view'
# before it; count consumed pairs.
#
# The sequential scan has a closed form (the parenthesis-matching
# identity, view = '(' and purchase = ')'): with a_i / b_i the running
# view / purchase counts through row i,
#
#   unmatched_purchases = max(0, max_i (b_i − a_i))
#   n_pairs             = b_n − unmatched_purchases
#
# because greedy matching leaves exactly the purchases that arrive when
# no view is open, and that deficit is the worst prefix imbalance. Two
# running sums + one group-by — no per-user iteration, no UDF, and the
# identity is brute-force-pinned in tests against a literal greedy scan.
#
# Output is the per-user conversion-pair FEATURE TABLE (O(users) rows),
# the form downstream LTV / propensity models join on. ONE shuffle.
# ---------------------------------------------------------------------------


def _sequence_count_sql(epoch: str) -> str:
    return f"""
    e AS (SELECT user_id, event_id, {epoch} AS t,
                 CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
          FROM events
          WHERE event_type IN ('view', 'purchase')),
    r AS (SELECT user_id, a, b,
                 sum(b - a) OVER (PARTITION BY user_id
                                  ORDER BY t, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS deficit
          FROM e)
    SELECT user_id,
           CAST(sum(a) AS BIGINT) AS n_views,
           CAST(sum(b) AS BIGINT) AS n_purchases,
           CAST(sum(b) - greatest(CAST(max(deficit) AS BIGINT), 0)
             AS BIGINT) AS n_pairs
    FROM r GROUP BY user_id
    """


def sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N128: greedy non-overlapping view→purchase pairs per user."""
    from ..tables import EPOCH_NTZ

    _events(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _sequence_count_sql(f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts)")
    )


def sequence_count_oracle() -> str:
    return "WITH " + _sequence_count_sql("epoch_us(ts)")


# ---------------------------------------------------------------------------
# max_intersections — peak concurrent sessions (capacity planning: the
# high-water mark the ingest tier must be sized for). Sessions are the
# same >30 min gap islands as q_sessionize, treated as CLOSED intervals
# [first_event, last_event]; concurrency at instant t counts sessions
# with first ≤ t ≤ last.
#
# Sweep-line: +1 at session start, −1 at (end + 1 µs) — the +1 µs makes
# the closed-interval boundary exact in integer micros. Tie rule: at an
# equal instant the −1 sorts first (delta ASC), so a session starting
# exactly where another stops counting never inflates the peak.
#
# The 100 TB shape: a naive running sum over ALL deltas is a
# whole-corpus single-partition sort (the anti-pattern the global
# window sweep rejects). Instead a two-phase distributed prefix sum —
# the q_pack_global pattern: per-DAY partitioned running sums (narrow
# after one shuffle on day), plus a per-day net-delta frame whose
# running offset is an O(#days) window — calendar-bounded, the
# documented whitelist shape. Peak = max over days of
# (offset_before_day + within-day running max); the witness instant is
# the earliest delta reaching it. The DuckDB oracle spells the SAME
# semantics as one global window — the differential proves the
# two-phase decomposition exact.
# ---------------------------------------------------------------------------

_SWEEP_BODY = f"""
    ev AS (SELECT user_id, event_id, {{epoch}} AS t FROM events),
    flagged AS (SELECT user_id, event_id, t,
                       CASE WHEN t - coalesce(lag(t) OVER (
                                PARTITION BY user_id ORDER BY t, event_id),
                              CAST(-4000000000000000 AS BIGINT))
                              > {SWEEP_GAP_US}
                            THEN 1 ELSE 0 END AS is_start
                FROM ev),
    sess AS (SELECT user_id, session_no,
                    min(t) AS t_start, max(t) + 1 AS t_stop
             FROM (SELECT user_id, t,
                          sum(is_start) OVER (PARTITION BY user_id
                                              ORDER BY t, event_id
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                                       AND CURRENT ROW)
                            AS session_no
                   FROM flagged)
             GROUP BY user_id, session_no),
    deltas AS (SELECT t_start AS t, 1 AS delta FROM sess
               UNION ALL
               SELECT t_stop AS t, -1 AS delta FROM sess)
"""


def _sweep_oracle_sql() -> str:
    # one global window — the semantic spec, fine for DuckDB at oracle SF
    return (
        _SWEEP_BODY.format(epoch="epoch_us(ts)")
        + """,
    run AS (SELECT t, delta,
                   sum(delta) OVER (ORDER BY t, delta
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS conc
            FROM deltas),
    peak AS (SELECT max(conc) AS m FROM run)
    SELECT CAST((SELECT count(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(p.m AS BIGINT) AS max_concurrent,
           CAST(min(r.t) AS BIGINT) AS at_epoch_us
    FROM run r JOIN peak p ON r.conc = p.m
    GROUP BY p.m
    """
    )


def _sweep_spark_sql(epoch: str) -> str:
    # two-phase prefix sum: day-partitioned running + O(#days) offsets
    return (
        _SWEEP_BODY.format(epoch=epoch)
        + f""",
    dd AS (SELECT t, delta, t div {_DAY_US} AS day FROM deltas),
    run AS (SELECT t, delta, day,
                   sum(delta) OVER (PARTITION BY day
                                    ORDER BY t, delta
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS local_conc
            FROM dd),
    daytot AS (SELECT day, sum(delta) AS net FROM dd GROUP BY day),
    -- O(#days) frame: calendar-bounded, the documented whitelist shape
    offs AS (SELECT day,
                    coalesce(sum(net) OVER (
                        ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS off
             FROM daytot),
    conc AS (SELECT r.t, r.local_conc + o.off AS conc
             FROM run r JOIN offs o ON r.day = o.day),
    peak AS (SELECT max(conc) AS m FROM conc)
    SELECT CAST((SELECT count(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(p.m AS BIGINT) AS max_concurrent,
           CAST(min(c.t) AS BIGINT) AS at_epoch_us
    FROM conc c JOIN peak p ON c.conc = p.m
    GROUP BY p.m
    """
    )


def max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N129: peak concurrent sessions — distributed sweep-line."""
    from ..tables import EPOCH_NTZ

    _events(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _sweep_spark_sql(f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts)")
    )


def max_intersections_oracle() -> str:
    return "WITH " + _sweep_oracle_sql()
