"""Semantic tests for the retrieval/index + behavior-analytics operators at
sf0.001 — the differential harness is the primary gate; these pin the
invariants the oracle can't see (ranking totality, postings ordering,
funnel monotonicity, contamination of the planted near-dup corpus)."""

from proxyhouse_spark import registry
from proxyhouse_spark.operators.retrieval import (
    EVAL_MOD,
    MIN_DF,
    POSTINGS_CAP,
    TOPK_TERMS,
)
from tests.conftest import SF_SMALL


def test_tfidf_ranks_are_total_and_capped(spark):
    rows = registry.QUERIES["q_tfidf"](spark, SF_SMALL).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 500
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        assert len(doc_rows) <= TOPK_TERMS
        # ranking key is (tf DESC, df ASC, term ASC) — verify monotone
        keys = [(-r.tf, r.df, r.term) for r in doc_rows]
        assert keys == sorted(keys)


def test_inverted_index_postings_sorted_and_df_floor(spark):
    rows = registry.QUERIES["q_inverted_index"](spark, SF_SMALL).collect()
    assert rows, "index must be non-empty (stopwords clear the df floor)"
    for r in rows:
        assert r.df >= MIN_DF
        assert r.total_tf >= r.df  # tf >= 1 per posting
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) <= POSTINGS_CAP


def test_decontaminate_flags_planted_dups_of_eval_docs(spark):
    rows = registry.QUERIES["q_decontaminate"](spark, SF_SMALL).collect()
    # output covers exactly the training slice
    assert all(r.doc_id % EVAL_MOD != 0 for r in rows)
    assert len(rows) == 500 - len([i for i in range(500) if i % EVAL_MOD == 0])
    flagged = {r.doc_id for r in rows if r.is_contaminated}
    clean = {r.doc_id for r in rows if not r.is_contaminated}
    assert flagged and clean, "corpus has both contaminated and clean docs"
    for r in rows:
        assert (r.n_hits > 0) == r.is_contaminated


def test_gopher_rules_verdict_is_conjunction(spark):
    rows = registry.QUERIES["q_gopher_rules"](spark, SF_SMALL).collect()
    assert len(rows) == 500
    for r in rows:
        expect = r.ok_nwords and r.ok_wordlen and r.ok_symbols and r.ok_stop
        assert r.verdict == ("keep" if expect else "drop")
    assert any(r.verdict == "keep" for r in rows)


def test_domain_stats_conserves_docs(spark):
    rows = registry.QUERIES["q_domain_stats"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert 0 <= r.n_unique <= r.n_docs
        assert 0 <= r.dup_rate_bp <= 10000


def test_event_funnel_stages_are_monotone(spark):
    out = {r.stage: r.n_users for r in registry.QUERIES["q_event_funnel"](spark, SF_SMALL).collect()}
    assert set(out) == {"view", "view>click", "view>click>purchase"}
    assert out["view"] >= out["view>click"] >= out["view>click>purchase"] > 0


def test_cohort_retention_bounds(spark):
    rows = registry.QUERIES["q_cohort_retention"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_d1 <= r.n_users
        assert 0 <= r.n_d7 <= r.n_users


def test_unigram_logprob_buckets_and_bounds(spark):
    rows = registry.QUERIES["q_unigram_logprob"](spark, SF_SMALL).collect()
    assert len(rows) == 500
    from collections import Counter

    buckets = Counter(r.bucket for r in rows)
    # value cuts at exact tercile boundaries (the boundary-broadcast
    # respell, r4): score ties share a bucket, so counts are near — not
    # exactly — a third each
    assert set(buckets) == {"head", "middle", "tail"}
    assert sum(buckets.values()) == 500
    assert all(140 <= n <= 195 for n in buckets.values()), buckets
    for r in rows:
        assert r.mean_lp < 0  # log10 of a probability < 1
        assert r.n_tokens > 0
    # bucket order must follow score order: min(head) >= max(middle) etc.
    assert min(r.mean_lp for r in rows if r.bucket == "head") >= max(
        r.mean_lp for r in rows if r.bucket == "middle"
    )
    assert min(r.mean_lp for r in rows if r.bucket == "middle") >= max(
        r.mean_lp for r in rows if r.bucket == "tail"
    )
