"""Model-evaluation operators over the in-repo lang_id classifier
(SURVEY §2.11 ML-eval family; reference-ABSENT, north-star surface).

A training-data platform doesn't just RUN classifiers (lang_id, quality
filters, dedup verdicts) — it has to EVALUATE them at corpus scale. The
two ops here grade the repo's own stopword-share language scorer as a
probabilistic en-detector:

- ``calibration``: reliability table + Expected Calibration Error —
  "when the score says 0.7, is it right 70% of the time?" The metric
  every LLM-as-judge / quality-filter pipeline reports before trusting
  scores as probabilities.
- ``auc``: ROC AUC via the rank-statistic identity (AUC = normalized
  Mann–Whitney U) — threshold-free ranking quality, with the tie-aware
  midrank correction the coarse integer score makes mandatory.

Score discipline: the "probability" is the stopword share in integer
BASIS POINTS — score_bp = 10000·n_stopword_hits div n_tokens — exact on
both engines (the functions/text.py quality-score lesson: integer basis
points, never a float blend). Label = (lang = 'en'). Everything
downstream is exact integer/decimal arithmetic; doubles appear only in
final 1-row readout expressions.

Scale: both ops are one narrow scan → one map-side-combinable fold into
a SCORE-RANGE-bounded frame (≤ 10001 distinct scores / ≤ 11 bins —
policy-bounded, not data-scaled), then O(bins) arithmetic. The AUC
midrank prefix runs on that bounded frame (the mannwhitney whitelist
justification verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import _stoplist_sql
from ..tables import table

CAL_BINS = 10  # deciles of the score range; bin = score_bp div 1000


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


def _score_sql(size_fn: str, filter_fn: str, idiv: str) -> str:
    """Per-doc (score_bp, pos): stopword share in exact basis points."""
    hits = f"{size_fn}({filter_fn}(toks, t -> t IN ({_stoplist_sql()})))"
    return f"""
    tk AS (SELECT doc_id, lang, {{toks}} AS toks FROM documents),
    s AS (SELECT doc_id,
                 CAST((10000 * {hits}) {idiv}
                      greatest({size_fn}(toks), 1) AS BIGINT) AS score_bp,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM tk)
    """


# ---------------------------------------------------------------------------
# calibration — reliability bins + ECE, all-integer interior.
#
# ECE = Σ_b (n_b/N)·|conf_b − acc_b| with conf_b = Σscore_bp/(10000·n_b)
# and acc_b = pos_b/n_b. Putting both over the common denominator
# 10000·n_b: each bin's contribution to N·10000·ECE is the exact integer
# |Σscore_bp_b − 10000·pos_b| — so ECE is ONE double division at the
# end, no float accumulation anywhere.
# ---------------------------------------------------------------------------


def _calibration_sql(score: str, idiv: str) -> str:
    return (
        score
        + f""",
    b AS (SELECT CAST(score_bp {idiv} 1000 AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(score_bp) AS BIGINT) AS sum_bp,
                 CAST(sum(pos) AS BIGINT) AS n_pos
          FROM s GROUP BY CAST(score_bp {idiv} 1000 AS BIGINT)),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(abs(sum_bp - 10000 * n_pos)) AS BIGINT)
                     AS ece_num
            FROM b)
    SELECT b.bin, b.n,
           round(CAST(b.sum_bp AS DOUBLE) / (10000e0 * b.n), 6)
             AS confidence,
           round(CAST(b.n_pos AS DOUBLE) / b.n, 6) AS accuracy,
           round(CAST(abs(b.sum_bp - 10000 * b.n_pos) AS DOUBLE)
                 / (10000e0 * b.n), 6) AS gap,
           round(CAST(t.ece_num AS DOUBLE) / (10000e0 * t.nn), 6) AS ece
    FROM b CROSS JOIN tot t
    """
    )


def calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N150: reliability table + exact-integer ECE for the en-scorer."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _calibration_sql(
            _score_sql("size", "filter", "div").format(
                toks="split(text, ' ', -1)"
            ),
            "div",
        )
    )


def calibration_oracle() -> str:
    return "WITH " + _calibration_sql(
        _score_sql("len", "list_filter", "//").format(
            toks="string_split(text, ' ')"
        ),
        "//",
    )


# ---------------------------------------------------------------------------
# auc — ROC AUC by the Mann–Whitney rank identity with midrank ties:
#   AUC = (Σ_{positives} midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻)
# Midranks ride ×2 to stay integer (the q_mannwhitney discipline):
# 2·midrank(score) = 2·(#rows with smaller score) + n_score + 1, so
#   AUC = (Σ2mid − n⁺(n⁺+1)) / (2·n⁺·n⁻)     — exact integers
# until one final double division. Gini = 2·AUC − 1 rides along.
#
# The rank prefix runs over the per-distinct-score frame — bounded by
# the SCORE RANGE (≤ 10001 basis-point values), not the corpus: the
# mannwhitney two-phase justification verbatim.
# ---------------------------------------------------------------------------


def _auc_sql(score: str) -> str:
    return (
        score
        + """,
    g AS (SELECT score_bp, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(pos) AS BIGINT) AS n_pos
          FROM s GROUP BY score_bp),
    r AS (SELECT score_bp, n, n_pos,
                 CAST(2 * coalesce(sum(n) OVER (ORDER BY score_bp
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0)
                      + n + 1 AS BIGINT) AS mid2
          FROM g),
    m AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                 CAST(sum(n_pos) AS BIGINT) AS npos,
                 CAST(sum(CAST(n_pos AS DECIMAL(38, 0)) * mid2)
                      AS DECIMAL(38, 0)) AS sum2
          FROM r)
    SELECT nn AS n, npos AS n_pos, nn - npos AS n_neg,
           round(CAST(sum2 - CAST(npos AS DECIMAL(38, 0)) * (npos + 1)
                      AS DOUBLE)
                 / (2e0 * CAST(npos AS DOUBLE)
                    * CAST(nn - npos AS DOUBLE)), 6) AS auc,
           round(CAST(sum2 - CAST(npos AS DECIMAL(38, 0)) * (npos + 1)
                      AS DOUBLE)
                 / (CAST(npos AS DOUBLE) * CAST(nn - npos AS DOUBLE))
                 - 1e0, 6) AS gini
    FROM m
    """
    )


def auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N151: tie-aware ROC AUC of the en-scorer via midrank identity."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _auc_sql(
            _score_sql("size", "filter", "div").format(
                toks="split(text, ' ', -1)"
            )
        )
    )


def auc_oracle() -> str:
    return "WITH " + _auc_sql(
        _score_sql("len", "list_filter", "//").format(
            toks="string_split(text, ' ')"
        )
    )
