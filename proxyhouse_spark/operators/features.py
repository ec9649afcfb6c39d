"""Feature-engineering operators (SURVEY §2.11 feature family;
reference-ABSENT, north-star surface).

The offline FEATURE JOB — the batch pass that turns raw events and
document metadata into model-ready columns — is the highest-volume
consumer of an analytics engine in an ML organization. Three verbs:

- ``lag_features``    — the time-series feature matrix: per (user, day),
                        exact day-offset lags and a 7-day rolling window
                        (RANGE frame), the classic churn/LTV feature set.
- ``target_encoding`` — leave-one-out mean-target encoding of a
                        categorical: THE encoding that leaks if done
                        naively, spelled with the self-exclusion that
                        q_label_leakage exists to audit for.
- ``woe_iv``          — weight-of-evidence / information value: the
                        credit-scoring feature-selection classic,
                        grading how much a categorical separates a
                        binary label.

Exactness: metric values ride as milli-unit BIGINTs; lags come from
exact day-offset equi-joins (a gap day is an honest NULL, not a LOCF
guess — that variant is q_gapfill_locf); rolling sums/counts are exact
integers with one rounded mean; LOO encodings are exact-integer
rationals per row; WOE logs round to 6 dp DECIMAL and IV terms to 9 dp
before exact decimal sums (the established float discipline).

Scale: lag_features is ONE (user, day) fold + per-user windows and two
self equi-joins on the (user, day−k) key — all narrow after one
user-keyed shuffle; the encodings are one categorical fold joined back
(broadcastable: O(categories)); nothing data-scaled crosses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

LAG_SHORT = 1
LAG_LONG = 7
ROLL_DAYS = 7
_DAY_US = 86_400_000_000


def _events(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


def _lag_features_sql(epoch: str, idiv: str) -> str:
    return f"""
    d AS (SELECT user_id,
                 CAST({epoch} {idiv} {_DAY_US} AS BIGINT) AS day,
                 CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                   AS m,
                 CAST(count(*) AS BIGINT) AS n
          FROM events
          GROUP BY user_id, CAST({epoch} {idiv} {_DAY_US} AS BIGINT)),
    r AS (SELECT user_id, day, m, n,
                 CAST(sum(m) OVER w AS BIGINT) AS roll_m,
                 CAST(sum(n) OVER w AS BIGINT) AS roll_n,
                 CAST(count(*) OVER w AS BIGINT) AS roll_days
          FROM d
          WINDOW w AS (PARTITION BY user_id ORDER BY day
                       RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING
                                 AND CURRENT ROW))
    SELECT r.user_id, r.day, r.m AS milli_today, r.n AS n_today,
           l1.m AS milli_lag{LAG_SHORT}, l7.m AS milli_lag{LAG_LONG},
           r.roll_m AS milli_roll{ROLL_DAYS},
           r.roll_n AS n_roll{ROLL_DAYS},
           r.roll_days,
           round(CAST(r.roll_m AS DOUBLE)
                 / CAST(r.roll_days AS DOUBLE) / 1000, 6)
             AS mean_active_day_{ROLL_DAYS}
    FROM r
    LEFT JOIN d l1 ON l1.user_id = r.user_id
                  AND l1.day = r.day - {LAG_SHORT}
    LEFT JOIN d l7 ON l7.user_id = r.user_id
                  AND l7.day = r.day - {LAG_LONG}
    """


def lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N158: per-(user, day) lag/rolling feature matrix."""
    from ..tables import EPOCH_NTZ

    _events(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _lag_features_sql(
            f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts)", "div"
        )
    )


def lag_features_oracle() -> str:
    return "WITH " + _lag_features_sql("epoch_us(ts)", "//")


# ---------------------------------------------------------------------------
# target_encoding — leave-one-out mean-target encoding of `source`
# against the en-label: enc_i = (pos_src − y_i) / (n_src − 1). The
# self-exclusion is the whole point: the naive (pos_src/n_src) encoding
# carries each row's own label into its feature — exactly the leakage
# channel q_label_leakage audits. Exact-integer rational per row; the
# singleton-category edge (n_src = 1) is an honest NULL.
# ---------------------------------------------------------------------------

_TE_SQL = """
    lab AS (SELECT doc_id, source,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents),
    agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src,
                   CAST(sum(y) AS BIGINT) AS pos_src
            FROM lab GROUP BY source)
    SELECT l.doc_id, l.source, l.y,
           CASE WHEN a.n_src > 1
                THEN round(CAST(a.pos_src - l.y AS DOUBLE)
                           / CAST(a.n_src - 1 AS DOUBLE), 6)
           END AS te_loo,
           round(CAST(a.pos_src AS DOUBLE) / CAST(a.n_src AS DOUBLE), 6)
             AS te_naive
    FROM lab l JOIN agg a ON a.source = l.source
"""


def target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N159: leave-one-out target encoding (the leak-proof spelling)."""
    _docs(spark, sf_dir)
    return spark.sql("WITH " + _TE_SQL)


def target_encoding_oracle() -> str:
    return "WITH " + _TE_SQL


# ---------------------------------------------------------------------------
# woe_iv — weight of evidence per source + total information value of
# the `source` feature for the en-label. WOE_c = ln((pos_c + 0.5)/pos ÷
# (neg_c + 0.5)/neg) (half-count smoothing keeps empty cells finite,
# the standard credit-scoring convention); IV = Σ_c (pos_c/pos −
# neg_c/neg)·WOE_c. Interpretation bands (<0.02 useless, >0.5 suspect)
# are the reviewer's, not the engine's — the op reports the numbers.
#
# Float discipline: WOE rounds 6 dp → DECIMAL; each IV term rounds 9 dp
# → DECIMAL before an exact sum (the AP discipline); shares are exact
# integer rationals inside the rounded expressions.
# ---------------------------------------------------------------------------

_WOE_SQL = """
    lab AS (SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents),
    c AS (SELECT source, CAST(sum(y) AS BIGINT) AS pos_c,
                 CAST(count(*) - sum(y) AS BIGINT) AS neg_c
          FROM lab GROUP BY source),
    t AS (SELECT CAST(sum(pos_c) AS BIGINT) AS pos,
                 CAST(sum(neg_c) AS BIGINT) AS neg
          FROM c),
    w AS (SELECT c.source, c.pos_c, c.neg_c,
                 CAST(round(ln(((CAST(c.pos_c AS DOUBLE) + 0.5e0)
                                / CAST(t.pos AS DOUBLE))
                               / ((CAST(c.neg_c AS DOUBLE) + 0.5e0)
                                  / CAST(t.neg AS DOUBLE))), 6)
                      AS DECIMAL(18, 6)) AS woe,
                 CAST(t.pos AS BIGINT) AS pos, CAST(t.neg AS BIGINT) AS neg
          FROM c CROSS JOIN t),
    iv AS (SELECT CAST(sum(CAST(round((CAST(pos_c AS DOUBLE)
                                       / CAST(pos AS DOUBLE)
                                       - CAST(neg_c AS DOUBLE)
                                         / CAST(neg AS DOUBLE))
                                      * CAST(woe AS DOUBLE), 9)
                               AS DECIMAL(28, 9))) AS DOUBLE) AS iv
           FROM w)
    SELECT w.source, w.pos_c, w.neg_c,
           CAST(w.woe AS DOUBLE) AS woe,
           round(iv.iv, 6) AS iv
    FROM w CROSS JOIN iv
"""


def woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N160: weight of evidence + information value of `source`."""
    _docs(spark, sf_dir)
    return spark.sql("WITH " + _WOE_SQL)


def woe_iv_oracle() -> str:
    return "WITH " + _WOE_SQL
