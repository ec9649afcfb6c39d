"""Retrieval / corpus-index operators over ``documents`` (SURVEY §2.11 ext).

The index-building passes a training-data + retrieval pipeline runs over a
cleaned corpus:

- ``tfidf_terms``    — top-k salient terms per document, ranked by
                       (tf DESC, df ASC, term ASC). The classic TF-IDF
                       ordering expressed with *integer keys only*: idf is
                       monotone-decreasing in df, so ranking by df ascending
                       is exactly the idf ranking without a single float —
                       bit-exact across engines by construction.
- ``inverted_index`` — term → (df, total_tf, capped postings list). The
                       core retrieval structure, built as one exploded
                       aggregation.
- ``decontaminate``  — benchmark-decontamination pass (GPT-3 appendix-C
                       shape): flag training docs sharing any 8-token
                       n-gram with a held-out eval slice.
- ``domain_stats``   — per-source corpus health: doc counts, languages,
                       chars, and exact-dup rate in integer basis points.

Scale notes (100 TB):
- ``tfidf_terms`` / ``inverted_index`` shuffle once on (doc_id, term) for
  map-side-combinable tf counts, then once on term for df; both keys are
  near-uniform (terms follow Zipf but the hot term's postings are capped
  and the tf pre-aggregation bounds per-term rows at n_docs, not n_tokens).
- ``decontaminate`` broadcasts the eval-gram set (the eval slice is fixed
  and small by design — 2% of docs) so the training-side scan never
  shuffles: explode → broadcast-hash semi-join → per-doc count.
- ``domain_stats`` is a two-level agg on ``source`` (20 keys at fixture
  scale; at 100 TB a domain key is still ~1e6 distinct — fine).

Reference parity note: the reference proxy (/root/reference/main.go) has
no document operators; this family is north-star surface per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

TOPK_TERMS = 3
POSTINGS_CAP = 8
MIN_DF = 3
NGRAM = 8  # decontamination n-gram width (tokens)
EVAL_MOD = 50  # doc_id % EVAL_MOD == 0 → held-out eval slice


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# Shared doc-term frequency CTE: tokenize once, explode, count.
# ---------------------------------------------------------------------------

_DT_SPARK = """
tk AS (SELECT doc_id, split(text, ' ', -1) AS toks FROM documents),
dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM tk LATERAL VIEW explode(toks) t AS tok
       GROUP BY doc_id, tok)
"""

_DT_DUCK = """
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ex AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM ex GROUP BY doc_id, tok)
"""


def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per doc. (tf DESC, df ASC, term ASC) is a total
    order per doc (terms are distinct within a doc), so row_number is
    deterministic and engine-independent — no floats anywhere."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH {_DT_SPARK},
        dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok),
        ranked AS (
          SELECT dt.doc_id, dt.tok, dt.tf, dfr.df,
                 row_number() OVER (PARTITION BY dt.doc_id
                                    ORDER BY dt.tf DESC, dfr.df ASC, dt.tok ASC)
                   AS rank
          FROM dt JOIN dfr ON dt.tok = dfr.tok)
        SELECT doc_id, CAST(rank AS INT) AS rank, tok AS term, tf, df
        FROM ranked WHERE rank <= {TOPK_TERMS}
        """
    )


def tfidf_terms_oracle() -> str:
    return f"""
    WITH {_DT_DUCK},
    dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok),
    ranked AS (
      SELECT dt.doc_id, dt.tok, dt.tf, dfr.df,
             row_number() OVER (PARTITION BY dt.doc_id
                                ORDER BY dt.tf DESC, dfr.df ASC, dt.tok ASC)
               AS rank
      FROM dt JOIN dfr ON dt.tok = dfr.tok)
    SELECT doc_id, CAST(rank AS INT) AS rank, tok AS term, tf, df
    FROM ranked WHERE rank <= {TOPK_TERMS}
    """


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term → df, total_tf, first-8 postings (doc_ids ascending, joined to a
    stable string). Postings capped so the Zipf head can't blow up a group;
    a real index would page them — the cap IS the page-1 semantics."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH {_DT_SPARK}
        SELECT tok AS term, CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS total_tf,
               array_join(transform(slice(sort_array(collect_list(doc_id)), 1,
                                          {POSTINGS_CAP}),
                                    x -> CAST(x AS STRING)), ',') AS postings
        FROM dt GROUP BY tok HAVING count(*) >= {MIN_DF}
        """
    )


def inverted_index_oracle() -> str:
    return f"""
    WITH {_DT_DUCK}
    SELECT tok AS term, CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           array_to_string((list_sort(list(doc_id)))[1:{POSTINGS_CAP}], ',')
             AS postings
    FROM dt GROUP BY tok HAVING count(*) >= {MIN_DF}
    """


# ---------------------------------------------------------------------------
# decontaminate — 8-token n-gram overlap vs a held-out eval slice.
# ---------------------------------------------------------------------------

_GRAMS_SPARK = (
    f"CASE WHEN size(toks) >= {NGRAM} THEN "
    f"array_distinct(transform(sequence(1, size(toks) - {NGRAM - 1}), "
    f"i -> md5(concat_ws(' ', slice(toks, i, {NGRAM}))))) "
    "ELSE array(md5(text)) END"
)

_GRAMS_DUCK = (
    f"CASE WHEN len(toks) >= {NGRAM} THEN "
    f"list_distinct(list_transform(range(1, len(toks) - {NGRAM - 2}), "
    f"i -> md5(array_to_string(toks[i:i + {NGRAM - 1}], ' ')))) "
    "ELSE [md5(text)] END"
)


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs (doc_id % 50 != 0) that share any 8-token n-gram
    with the eval slice (doc_id % 50 == 0). Eval grams are broadcast — the
    training scan stays shuffle-free."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH tk AS (SELECT doc_id, text, split(text, ' ', -1) AS toks FROM documents),
        g AS (SELECT doc_id, {_GRAMS_SPARK} AS grams FROM tk),
        eg AS (SELECT DISTINCT gram
               FROM g LATERAL VIEW explode(grams) t AS gram
               WHERE doc_id % {EVAL_MOD} = 0),
        tg AS (SELECT doc_id, gram
               FROM g LATERAL VIEW explode(grams) t AS gram
               WHERE doc_id % {EVAL_MOD} != 0),
        hits AS (SELECT /*+ BROADCAST(eg) */ tg.doc_id,
                        CAST(count(*) AS BIGINT) AS n_hits
                 FROM tg JOIN eg ON tg.gram = eg.gram
                 GROUP BY tg.doc_id)
        SELECT g.doc_id, coalesce(hits.n_hits, 0) AS n_hits,
               coalesce(hits.n_hits, 0) > 0 AS is_contaminated
        FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
        WHERE g.doc_id % {EVAL_MOD} != 0
        """
    )


def decontaminate_oracle() -> str:
    return f"""
    WITH tk AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, {_GRAMS_DUCK} AS grams FROM tk),
    ge AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    eg AS (SELECT DISTINCT gram FROM ge WHERE doc_id % {EVAL_MOD} = 0),
    tg AS (SELECT doc_id, gram FROM ge WHERE doc_id % {EVAL_MOD} != 0),
    hits AS (SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_hits
             FROM tg JOIN eg ON tg.gram = eg.gram
             GROUP BY tg.doc_id)
    SELECT g.doc_id, coalesce(hits.n_hits, 0) AS n_hits,
           coalesce(hits.n_hits, 0) > 0 AS is_contaminated
    FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
    WHERE g.doc_id % {EVAL_MOD} != 0
    """


# ---------------------------------------------------------------------------
# domain_stats — per-source corpus health. Dup rate uses the canonical
# normalization from textops (same md5 basis as q_dedup_exact).
# ---------------------------------------------------------------------------

# Spark regexp_replace replaces all matches; DuckDB needs the 'g' option to
# match (first-match-only by default) — hence the dialect split.
_NORM_MD5 = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), "
    "'  +', ' ')))"
)
_NORM_MD5_DUCK = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), "
    "'  +', ' ', 'g')))"
)


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc/lang/char counts + exact-dup rate (integer basis
    points — 10000 * dup_docs / docs with integer division; bit-exact)."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH h AS (SELECT source, lang, n_chars, {_NORM_MD5} AS h FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
               CAST((10000 * (count(*) - count(DISTINCT h))) DIV count(*)
                    AS BIGINT) AS dup_rate_bp
        FROM h GROUP BY source
        """
    )


def domain_stats_oracle() -> str:
    return f"""
    WITH h AS (SELECT source, lang, n_chars, {_NORM_MD5_DUCK} AS h FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
           CAST((10000 * (count(*) - count(DISTINCT h))) // count(*)
                AS BIGINT) AS dup_rate_bp
    FROM h GROUP BY source
    """


# ---------------------------------------------------------------------------
# bm25_rank — BM25-ranked retrieval for a fixed query-term set (the scoring
# pass a RAG / eval-retrieval pipeline runs over the corpus index).
#
# Float discipline: tf/df/dl/N are exact integers in both engines; avgdl
# enters as the exact-integer pair (dl * n_docs) / total_dl; the per-doc
# score is a TEXTUALLY FIXED sum of 5 term expressions (no aggregation
# order nondeterminism), and ranking compares the ROUNDED score with a
# doc_id tiebreak, so a last-ulp ln() divergence cannot reorder results.
#
# Scale (100 TB): tf columns are a narrow projection over the token array
# (no explode, zero shuffle); df/N/total_dl is ONE global aggregate row
# broadcast back; top-k is TakeOrderedAndProject. The corpus is scanned
# exactly twice (stats pass + score pass) — at scale the stats row is a
# metadata artifact you persist with the index.
# ---------------------------------------------------------------------------

BM25_TERMS = ("hash", "join", "scan", "merge", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _bm25_exprs(size_fn, filter_fn) -> tuple[str, str, str]:
    """The three dialect-parametric BM25 expression blocks — shared by
    bm25_rank and the sparse leg of rrf_fusion."""
    tf_cols = ", ".join(
        f"CAST({size_fn}({filter_fn}(toks, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in BM25_TERMS
    )
    term_scores = " + ".join(
        f"(ln(1 + (n_docs - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * (tf_{t} * {BM25_K1 + 1}) /"
        f" (tf_{t} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl * n_docs / total_dl)))"
        for t in BM25_TERMS
    )
    return tf_cols, df_cols, term_scores


def _bm25_sql(
    toks_fn, size_fn, filter_fn, cross: str
) -> str:
    tf_cols, df_cols, term_scores = _bm25_exprs(size_fn, filter_fn)
    return f"""
    WITH tk AS (SELECT doc_id, {toks_fn} AS toks FROM documents),
    d AS (SELECT doc_id, {tf_cols},
                 CAST({size_fn}(toks) AS BIGINT) AS dl FROM tk),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS total_dl, {df_cols}
              FROM d),
    scored AS (SELECT doc_id, round({term_scores}, 4) AS bm25
               FROM d {cross} stats)
    SELECT doc_id, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """


def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        _bm25_sql("split(text, ' ', -1)", "size", "filter", "CROSS JOIN")
    )


def bm25_rank_oracle() -> str:
    return _bm25_sql(
        "string_split(text, ' ')", "len", "list_filter", "CROSS JOIN"
    )


# ---------------------------------------------------------------------------
# unigram_logprob — LM-quality scoring (CCNet shape: "CCNet: Extracting
# High Quality Monolingual Datasets from Web Crawl Data", Wenzek et al.
# 2020 — there a KenLM 5-gram perplexity buckets the corpus into
# head/middle/tail; here the portable stand-in is a corpus unigram model,
# the same score family with an exactly-oracle-able definition).
#
# score(doc) = mean over token occurrences of log10 P(tok), with
# P(tok) = corpus_tf(tok) / corpus_tokens. Docs are then bucketed into
# head/middle/tail terciles by VALUE against exact tercile boundaries of
# the score distribution — the CCNet partition that decides what a
# training run keeps.
#
# Float discipline: each token's log10 is rounded to 6 dp and cast to
# DECIMAL(18,6); the per-doc sum is then EXACT decimal addition —
# order-independent, so Spark's parallel aggregation and DuckDB's serial
# one agree bit-for-bit (the same trick as q_bm25's textually-fixed sum).
#
# Scale: the unigram model is the vocab-sized frame — a trained LM is
# fixed-size, so at 100 TB it broadcasts (or shuffle-hash joins on tok if
# a raw-corpus vocab outgrows broadcast); the doc side shuffles once on
# doc_id for the per-doc fold. The tercile cut is the q_rfm_segments
# boundary-broadcast pattern (VERDICT r3 #2): exact interpolated
# percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, bit-identical
# — proven by q_percentiles) collapse to ONE row — Spark's Percentile is
# partially aggregatable (map-side value-count buffers), so no executor
# ever holds the doc-score list — and every doc classifies narrowly
# against the broadcast boundaries. The previous spelling was
# `ntile(3) OVER (ORDER BY mean_lp DESC, doc_id)`: an unpartitioned
# WindowExec = whole-corpus sort on ONE executor at 100 TB. Semantics
# shift from equal-COUNT tiles (ties split by doc_id) to equal-VALUE
# cuts (score ties always share a bucket — the better CCNet semantics);
# the oracle moves in lockstep so the differential stays exact.
# ---------------------------------------------------------------------------


def _unigram_sql(dt: str, cross: str, pct: str, arr: str, ihi: int, ilo: int) -> str:
    return f"""
    WITH {dt},
    freq AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ctf FROM dt GROUP BY tok),
    tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS n FROM freq),
    occ AS (
      SELECT dt.doc_id, dt.tf,
             CAST(round(log10(CAST(freq.ctf AS DOUBLE) / tot.n), 6)
                  AS DECIMAL(18, 6)) AS lp
      FROM dt JOIN freq ON dt.tok = freq.tok {cross} tot),
    doc AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             sum(lp * tf) AS sum_lp
      FROM occ GROUP BY doc_id),
    scored AS (
      SELECT doc_id, n_tokens,
             round(CAST(sum_lp AS DOUBLE) / n_tokens, 4) AS mean_lp
      FROM doc),
    b AS (SELECT {pct}(mean_lp, {arr}) AS tb FROM scored)
    SELECT doc_id, n_tokens, mean_lp,
           CASE WHEN mean_lp >= tb[{ihi}] THEN 'head'
                WHEN mean_lp >= tb[{ilo}] THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored CROSS JOIN b
    """


# Tercile boundary positions: identical double literals on both engines so
# the interpolated boundary values are bit-identical.
_TERCILES = "0.3333333333333333, 0.6666666666666666"


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        _unigram_sql(
            _DT_SPARK, "CROSS JOIN", "percentile",
            f"array({_TERCILES})", ihi=1, ilo=0,
        )
    )


def unigram_logprob_oracle() -> str:
    return _unigram_sql(
        _DT_DUCK, "CROSS JOIN", "quantile_cont",
        f"[{_TERCILES}]", ihi=2, ilo=1,
    )


# ---------------------------------------------------------------------------
# bigram_logprob — conditional bigram LM scoring with add-one smoothing,
# the second rung of the LM-quality ladder: unigram_logprob scores
# documents by marginal token frequency (good for gibberish/boilerplate
# cuts), the bigram model scores SEQUENCE plausibility — the signal that
# separates shuffled-word salad from fluent text, which the unigram
# model cannot see by construction. Train/eval discipline borrowed from
# decontaminate: the model trains on doc_id % EVAL_MOD != 0 and scores
# the held-out slice, so the score is a true out-of-fold perplexity (a
# document never smooths its own bigrams into the model).
#
# p(w2|w1) = (c12 + 1) / (c1 + V): Laplace smoothing keeps unseen
# bigrams (and eval-only tokens, c1 = 0) finite and identically valued
# on both engines. log10 rounded 6 dp → DECIMAL before the per-doc sum
# (order-independent, the unigram discipline); mean and perplexity
# derived at the end, rounded 4.
#
# At 100 TB: the trained model is O(observed bigrams) ≤ min(corpus
# tokens, V²) rows keyed by (w1, w2) — bigger than the unigram model's
# broadcastable O(V), so scoring is spelled as EQUI-JOINS on the bigram
# key (shuffle-hash; the eval side is small by the held-out definition,
# the model side shuffles once). V itself rides a 1-row scalar frame.
# ---------------------------------------------------------------------------


def _bigram_select(toks: str, w1: str, w2: str, posrange: str) -> str:
    """The corpus bigram frame (doc_id, w1, w2) — the shared base every
    downstream CTE reads, staged once (checkpoint / MATERIALIZED) since
    it is referenced four times and re-tokenizes the corpus if inlined."""
    return (
        f"SELECT doc_id, {w1} AS w1, {w2} AS w2 FROM "
        f"(SELECT doc_id, {toks} AS toks FROM documents) tk{posrange}"
    )


def _bigram_body(bg: str) -> str:
    return f"""
    tr AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY w1, w2),
    un AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
           FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY w1),
    vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM (
             SELECT w1 AS w FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0
             UNION ALL
             SELECT w2 AS w FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0) x),
    sc AS (SELECT e.doc_id,
             CAST(round(log10((coalesce(t.c12, 0) + 1.0)
                              / (coalesce(u.c1, 0) + (SELECT v FROM vv))),
                        6) AS DECIMAL(18, 6)) AS lp
           FROM {bg} e
           LEFT JOIN tr t ON t.w1 = e.w1 AND t.w2 = e.w2
           LEFT JOIN un u ON u.w1 = e.w1
           WHERE e.doc_id % {EVAL_MOD} = 0),
    doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   sum(lp) AS sum_lp
            FROM sc GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           round(CAST(sum_lp AS DOUBLE) / n_bigrams, 4) AS mean_lp,
           round(pow(10.0, -(round(CAST(sum_lp AS DOUBLE) / n_bigrams, 4))),
                 4) AS perplexity
    FROM doc ORDER BY doc_id
    """


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N101: held-out bigram LM scoring (add-one smoothed, out-of-fold)."""
    from ..checkpoints import scoped_checkpoint

    _docs(spark, sf_dir)
    posrange = (
        " LATERAL VIEW explode(slice(sequence(1, size(toks)), 1, "
        "greatest(size(toks) - 1, 0))) t AS i"
    )
    bg = spark.sql(
        _bigram_select(
            "split(text, ' ', -1)",
            "element_at(toks, i)",
            "element_at(toks, i + 1)",
            posrange,
        )
    )
    scoped_checkpoint(bg, "bigram_bg").createOrReplaceTempView("bigram_bg")
    return spark.sql("WITH " + _bigram_body("bigram_bg"))


def bigram_logprob_oracle() -> str:
    posrange = ", unnest(range(1, len(toks))) AS t(i)"
    sel = _bigram_select(
        "string_split(text, ' ')", "toks[i]", "toks[i + 1]", posrange
    )
    return f"WITH bg AS MATERIALIZED ({sel})," + _bigram_body("bg")


# ---------------------------------------------------------------------------
# rrf_fusion — HYBRID retrieval: reciprocal-rank fusion (Cormack &
# Clarke SIGIR 2009) of a sparse BM25 ranking over `documents` and a
# dense cosine ranking over the ALIGNED `embeddings` row (vec_id ≡
# doc_id in the fixture — the contract a production pipeline gets from
# its embedding job keyed by document id). This is the production
# retrieval shape in 2026 RAG stacks: lexical and vector lists fused by
# rank, score scales never compared. RRF(d) = Σ_lists 1/(RRF_K + rank_d)
# with the standard K = 60; a doc missing from one list contributes 0.
#
# Rank determinism: each leg ranks by its ROUNDED score with an id
# tiebreak (the bm25_rank discipline — a last-ulp ln()/sqrt divergence
# cannot reorder), and ranks are assigned AFTER a top-RRF_DEPTH cut, so
# row_number runs on a LIMIT-bounded frame, never the corpus. The RRF
# sum is two textually fixed terms — no aggregation-order float risk.
#
# Scale: each leg is scan → TakeOrderedAndProject(DEPTH) → bounded
# window; the fusion is a full outer equi-join of two DEPTH-row frames.
# Corpus is never shuffled; the 1-row stats/query frames broadcast
# (whitelisted crosses).
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_DEPTH = 50
RRF_TOPK = 10
RRF_QUERY_ID = 0  # the query document / its aligned embedding


def _rrf_sql(
    toks_fn: str, size_fn: str, filter_fn: str,
    arr_cast: str, cos: str,
) -> str:
    tf_cols, df_cols, term_scores = _bm25_exprs(size_fn, filter_fn)
    inv = f"CAST(1 AS DOUBLE) / ({RRF_K} + {{r}})"
    return f"""
    tk AS (SELECT doc_id, {toks_fn} AS toks FROM documents
           WHERE doc_id <> {RRF_QUERY_ID}),
    d AS (SELECT doc_id, {tf_cols},
                 CAST({size_fn}(toks) AS BIGINT) AS dl FROM tk),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS total_dl, {df_cols}
              FROM d),
    sp_top AS (SELECT doc_id, round({term_scores}, 4) AS bm25
               FROM d CROSS JOIN stats
               ORDER BY bm25 DESC, doc_id LIMIT {RRF_DEPTH}),
    sp AS (SELECT doc_id, bm25,
                  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_sparse
           FROM sp_top),
    emb AS (SELECT vec_id, {arr_cast} AS e FROM embeddings),
    q AS (SELECT e FROM emb WHERE vec_id = {RRF_QUERY_ID}),
    dn_top AS (SELECT c.vec_id AS doc_id, round({cos}, 6) AS cos_sim
               FROM emb c CROSS JOIN q p
               WHERE c.vec_id <> {RRF_QUERY_ID}
               ORDER BY cos_sim DESC, doc_id LIMIT {RRF_DEPTH}),
    dn AS (SELECT doc_id, cos_sim,
                  row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS r_dense
           FROM dn_top),
    fused AS (SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
                     s.r_sparse, d.r_dense,
                     round(coalesce({inv.format(r="s.r_sparse")}, 0)
                           + coalesce({inv.format(r="d.r_dense")}, 0), 6)
                       AS rrf
              FROM sp s FULL OUTER JOIN dn d ON d.doc_id = s.doc_id)
    SELECT doc_id, r_sparse, r_dense, rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}
    """


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N145: sparse+dense hybrid retrieval via reciprocal-rank fusion."""
    from ..functions import vectors as V
    from ..tables import table as _t

    _docs(spark, sf_dir)
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(
        "WITH "
        + _rrf_sql(
            "split(text, ' ', -1)", "size", "filter",
            "transform(embedding, x -> CAST(x AS DOUBLE))",
            V.cosine_spark("c.e", "p.e"),
        )
    )


def rrf_fusion_oracle() -> str:
    from ..functions import vectors as V

    return "WITH " + _rrf_sql(
        "string_split(text, ' ')", "len", "list_filter",
        "list_transform(embedding, x -> CAST(x AS DOUBLE))",
        V.cosine_duck("c.e", "p.e"),
    )


# ---------------------------------------------------------------------------
# ngram_lm_interp — Jelinek–Mercer interpolation, the third rung of the
# LM-quality ladder: held-out perplexity of λ·P_bigram + (1−λ)·P_unigram
# at three λ values, best λ flagged. Unigram sees marginal frequency
# (N25's score), the bigram sees sequence (N101) — the interpolated
# model is what actually ships (pure bigram add-one wastes mass on the
# V² unseen tail; the mixture recovers it), and the λ sweep is the
# one-hyperparameter tuning loop every LM pipeline runs on held-out
# data. Same out-of-fold eval slice (doc_id % EVAL_MOD) as its ladder
# siblings, so the three perplexities are directly comparable.
#
# Float discipline: component probabilities are exact-integer rationals
# composed in DOUBLE inside one log10 per (eval bigram, λ), rounded
# 6 dp → DECIMAL sums (the ladder's established pattern); the three λs
# are binary-exact literals (0.25/0.5/0.75) evaluated as THREE columns
# of one fold — no λ-spine join, one pass over the eval bigrams — then
# unpivoted via inline/unnest (the corr_matrix trick).
# ---------------------------------------------------------------------------

LM_LAMBDAS = (0.25, 0.5, 0.75)


def _interp_body(bg: str) -> tuple[str, str]:
    """Shared CTE chain + the per-λ rounded-log DECIMAL sum columns."""
    p2 = ("(CAST(coalesce(c12, 0) + 1.0 AS DOUBLE)"
          " / (CAST(coalesce(c1, 0) AS DOUBLE)"
          "    + CAST((SELECT v FROM vv) AS DOUBLE)))")
    p1 = ("(CAST(coalesce(cu, 0) + 1.0 AS DOUBLE)"
          " / (CAST((SELECT nt FROM nn) AS DOUBLE)"
          "    + CAST((SELECT v FROM vv) AS DOUBLE)))")
    lam_cols = ", ".join(
        f"sum(CAST(round(log10({lam} * {p2} + {1 - lam} * {p1}), 6)"
        f" AS DECIMAL(18, 6))) AS lp_{i}"
        for i, lam in enumerate(LM_LAMBDAS)
    )
    body = f"""
    tr AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY w1, w2),
    un AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
           FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY w1),
    ug AS (SELECT w2 AS w, CAST(count(*) AS BIGINT) AS cu
           FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY w2),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nt
           FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0),
    vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM (
             SELECT w1 AS w FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0
             UNION ALL
             SELECT w2 AS w FROM {bg} WHERE doc_id % {EVAL_MOD} <> 0) x),
    ev AS (SELECT e.w1, e.w2,
                  t.c12, u.c1, uu.cu
           FROM {bg} e
           LEFT JOIN tr t ON t.w1 = e.w1 AND t.w2 = e.w2
           LEFT JOIN un u ON u.w1 = e.w1
           LEFT JOIN ug uu ON uu.w = e.w2
           WHERE e.doc_id % {EVAL_MOD} = 0),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_eval, {lam_cols} FROM ev)
    """
    return body, p2


def _interp_rows(pack: str) -> str:
    rows = []
    for i, lam in enumerate(LM_LAMBDAS):
        mean = f"round(CAST(lp_{i} AS DOUBLE) / n_eval, 4)"
        rows.append(pack.format(lam=lam, mean=mean))
    return ", ".join(rows)


def ngram_lm_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N165: Jelinek–Mercer λ sweep — held-out interpolated perplexity."""
    from ..checkpoints import scoped_checkpoint

    _docs(spark, sf_dir)
    posrange = (
        " LATERAL VIEW explode(slice(sequence(1, size(toks)), 1, "
        "greatest(size(toks) - 1, 0))) t AS i"
    )
    bg = spark.sql(
        _bigram_select(
            "split(text, ' ', -1)",
            "element_at(toks, i)",
            "element_at(toks, i + 1)",
            posrange,
        )
    )
    scoped_checkpoint(bg, "interp_bg").createOrReplaceTempView("interp_bg")
    body, _ = _interp_body("interp_bg")
    rows = _interp_rows(
        "named_struct('lam', CAST({lam} AS DOUBLE), 'n_eval', n_eval,"
        " 'mean_lp', {mean},"
        " 'perplexity', round(pow(CAST(10 AS DOUBLE), -({mean})), 4))"
    )
    return spark.sql(
        "WITH " + body + f" SELECT inline(array({rows})) FROM m"
    )


def ngram_lm_interp_oracle() -> str:
    posrange = ", unnest(range(1, len(toks))) AS t(i)"
    sel = _bigram_select(
        "string_split(text, ' ')", "toks[i]", "toks[i + 1]", posrange
    )
    body, _ = _interp_body("bg")
    rows = _interp_rows(
        "struct_pack(lam := CAST({lam} AS DOUBLE), n_eval := n_eval,"
        " mean_lp := {mean},"
        " perplexity := round(pow(CAST(10 AS DOUBLE), -({mean})), 4))"
    )
    return (
        f"WITH bg AS MATERIALIZED ({sel}),"
        + body
        + f" SELECT unnest([{rows}], recursive := true) FROM m"
    )
