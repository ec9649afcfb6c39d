"""Text-analysis operators (SURVEY §2.11 N3 + north-star text family).

Language-ID, quality scoring, token counting and fingerprinting over the
``documents`` table. Everything is built-in expression math (codegen'd);
at 100 TB these are embarrassingly-parallel narrow projections — no
shuffle except the final stats groupBy on `lang` (5 keys, map-side
combined). Tokens are materialized once per doc (functions/text.py
contract) so no expression tree re-splits the text."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..tables import table

_TK_SPARK = f"tk AS (SELECT *, {T.TOKS_SPARK} AS toks FROM documents)"
_TK_DUCK = f"tk AS (SELECT *, {T.TOKS_DUCK} AS toks FROM documents)"


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: per-language corpus stats."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH {_TK_SPARK}
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
               round(avg(CAST(size(toks) AS DOUBLE)), 4) AS avg_tokens,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM tk GROUP BY lang
        """
    )


def text_stats_oracle() -> str:
    return f"""
    WITH {_TK_DUCK}
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           round(avg(CAST(len(toks) AS DOUBLE)), 4) AS avg_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM tk GROUP BY lang
    """


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic (labels vs. ground truth)."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH {_TK_SPARK}
        SELECT doc_id, lang, {T.lang_id_spark()} AS pred_lang,
               ({T.lang_id_spark()} = lang) AS is_match
        FROM tk
        """
    )


def lang_id_oracle() -> str:
    return f"""
    WITH {_TK_DUCK}
    SELECT doc_id, lang, {T.lang_id_duck()} AS pred_lang,
           ({T.lang_id_duck()} = lang) AS is_match
    FROM tk
    """


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality pre-filter: length / diversity / token-shape blend."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"WITH {_TK_SPARK} SELECT doc_id, {T.quality_spark()} AS quality FROM tk"
    )


def quality_score_oracle() -> str:
    return f"WITH {_TK_DUCK} SELECT doc_id, {T.quality_duck()} AS quality FROM tk"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH {_TK_SPARK}
        SELECT doc_id, CAST(size(toks) AS BIGINT) AS n_tokens_ws,
               CAST({T.TOKEN_BPE_SPARK} AS BIGINT) AS n_tokens_bpe
        FROM tk
        """
    )


def token_count_oracle() -> str:
    return f"""
    WITH {_TK_DUCK}
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens_ws,
           CAST({T.TOKEN_BPE_DUCK} AS BIGINT) AS n_tokens_bpe
    FROM tk
    """


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-4 shingle-hash fingerprint."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH {_TK_SPARK},
        sh AS (SELECT doc_id, {T.shingles_spark()} AS sh FROM tk)
        SELECT doc_id, {T.fingerprint_spark()} AS fingerprint FROM sh
        """
    )


def doc_fingerprint_oracle() -> str:
    return f"""
    WITH {_TK_DUCK},
    sh AS (SELECT doc_id, {T.shingles_duck()} AS sh FROM tk)
    SELECT doc_id, {T.fingerprint_duck()} AS fingerprint FROM sh
    """


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pre-redaction scan: per-doc counts of email-shaped tokens and
    long digit runs (the cheap regex pass a training pipeline runs before
    redaction; generalizes the reference's password= redaction,
    main.go:352-363, from one known key to content patterns). Narrow
    projection — regex engines (Java / RE2) agree on these explicit
    character-class patterns."""
    _docs(spark, sf_dir)
    return spark.sql(
        r"""
        SELECT doc_id,
               CAST(regexp_count(text, '[a-z0-9._%+-]+@[a-z0-9.-]+') AS BIGINT)
                 AS n_emails,
               CAST(regexp_count(text, '[0-9]{6,}') AS BIGINT) AS n_long_digits,
               (regexp_count(text, '[a-z0-9._%+-]+@[a-z0-9.-]+')
                + regexp_count(text, '[0-9]{6,}')) > 0 AS has_pii
        FROM documents
        """
    )


def pii_scan_oracle() -> str:
    email = r"len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+'))"
    digits = r"len(regexp_extract_all(text, '[0-9]{6,}'))"
    return f"""
    SELECT doc_id,
           CAST({email} AS BIGINT) AS n_emails,
           CAST({digits} AS BIGINT) AS n_long_digits,
           ({email} + {digits}) > 0 AS has_pii
    FROM documents
    """


# Portable normalization chain (identical regexes, RE2 ∩ Java):
# lowercase → strip non-[a-z0-9 ] → collapse runs of spaces → trim.
# DIALECT SPLIT: Spark's regexp_replace replaces ALL matches; DuckDB's is
# first-match-only unless given the 'g' options argument — the two spellings
# below are semantically identical, and tests/test_llm_ops.py exercises them
# on adversarial punctuation/multi-space text so the equivalence is proven,
# not assumed.
_NORM = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9 ]', ''), "
    "'  +', ' '))"
)
_NORM_DUCK = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9 ]', '', 'g'), "
    "'  +', ' ', 'g'))"
)


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical pre-dedup normalization: the transformation under which
    'the same document' is defined (exact dedup hashes THIS, not the raw
    bytes). Narrow, shuffle-free."""
    _docs(spark, sf_dir)
    norm = _NORM.format(t="text")
    return spark.sql(
        f"""
        SELECT doc_id, {norm} AS norm_text, md5({norm}) AS norm_md5
        FROM documents
        """
    )


def text_normalize_oracle() -> str:
    norm = _NORM_DUCK.format(t="text")
    return f"SELECT doc_id, {norm} AS norm_text, md5({norm}) AS norm_md5 FROM documents"


# ---------------------------------------------------------------------------
# gopher_rules — Gopher-style composite document filter (Rae et al. 2021
# table A1 shape), all-integer so verdicts are bit-exact across engines:
#   ok_nwords   10 <= n_words <= 5000
#   ok_wordlen  mean word length in [3, 10]: 3*n <= sum_len <= 10*n, where
#               sum_len = length(text) - (n_words - 1) exactly (split on a
#               single-space separator ⇒ #separators = n_words - 1)
#   ok_symbols  symbol-to-word ratio <= 0.1: 10 * n_symbols <= n_words
#   ok_stop     >= 2 stopword hits
# ---------------------------------------------------------------------------

_GOPHER_TEMPLATE = """
SELECT doc_id,
       ({ntoks} BETWEEN 10 AND 5000) AS ok_nwords,
       (length(text) - {ntoks} + 1 BETWEEN 3 * {ntoks} AND 10 * {ntoks})
         AS ok_wordlen,
       (10 * {nsym} <= {ntoks}) AS ok_symbols,
       ({nstop} >= 2) AS ok_stop,
       CASE WHEN ({ntoks} BETWEEN 10 AND 5000)
             AND (length(text) - {ntoks} + 1 BETWEEN 3 * {ntoks} AND 10 * {ntoks})
             AND (10 * {nsym} <= {ntoks})
             AND ({nstop} >= 2)
            THEN 'keep' ELSE 'drop' END AS verdict
FROM tk
"""


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite repetition-independent Gopher quality rules (the
    within-doc repetition half lives in q_repetition_filter). Narrow
    projection — shuffle-free at any scale."""
    _docs(spark, sf_dir)
    body = _GOPHER_TEMPLATE.format(
        ntoks="size(toks)",
        nsym="regexp_count(text, '[^a-z0-9 ]')",
        nstop=f"size(filter(toks, t -> t IN ({T._stoplist_sql()})))",
    )
    return spark.sql(f"WITH {_TK_SPARK} {body}")


def gopher_rules_oracle() -> str:
    body = _GOPHER_TEMPLATE.format(
        ntoks="len(toks)",
        nsym="len(regexp_extract_all(text, '[^a-z0-9 ]'))",
        nstop=f"len(list_filter(toks, t -> t IN ({T._stoplist_sql()})))",
    )
    return f"WITH {_TK_DUCK} {body}"


# ---------------------------------------------------------------------------
# vocab_coverage — tokenizer-vocabulary coverage audit: with vocab = the
# top-V corpus tokens (V=16: the fixture corpus draws from a ~31-word
# pool, so a 16-token vocabulary makes coverage genuinely partial —
# V=32k against a real corpus is the same query) (the greedy frequency vocabulary a WordLevel
# tokenizer would take), report each document's out-of-vocabulary rate in
# integer basis points. The pre-training question this answers: what
# fraction of each doc will a V-token vocabulary shatter into <unk>?
# Ranking ties in the vocabulary cut are broken (count DESC, tok ASC) so
# the vocab set is identical in both engines — no sampling, no floats.
# Scale: the vocab frame is V rows by construction → broadcast; the doc
# side folds its own token array against the broadcast set — the only
# shuffle is the vocab build's token agg (map-side combinable).
# ---------------------------------------------------------------------------

VOCAB_SIZE = 16


def _vocab_sql(dt: str, toks: str, size_fn: str, contains: str) -> str:
    return f"""
    WITH {dt},
    cnt AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ctf FROM dt GROUP BY tok),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY ctf DESC, tok ASC) AS rnk
        FROM cnt) v
      WHERE rnk <= {VOCAB_SIZE}),
    vset AS (SELECT {contains} AS vtoks FROM vocab),
    docs_t AS (SELECT doc_id, {toks} AS toks FROM documents)
    SELECT d.doc_id,
           CAST({size_fn}(toks) AS BIGINT) AS n_tokens,
           CAST({size_fn}(oov) AS BIGINT) AS n_oov,
           CAST(floor({size_fn}(oov) * 10000.0 / {size_fn}(toks)) AS BIGINT)
             AS oov_bp
    FROM (SELECT doc_id, toks, filter(toks, t -> NOT array_contains(vtoks, t))
            AS oov
          FROM docs_t CROSS JOIN vset) d
    """


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        _vocab_sql(
            "dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM "
            "(SELECT doc_id, explode(split(text, ' ', -1)) AS tok "
            "FROM documents) x GROUP BY doc_id, tok)",
            "split(text, ' ', -1)",
            "size",
            "array_agg(tok)",
        )
    )


def vocab_coverage_oracle() -> str:
    return _vocab_sql(
        "dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM "
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents) x GROUP BY doc_id, tok)",
        "string_split(text, ' ')",
        "len",
        "list(tok)",
    )


# ---------------------------------------------------------------------------
# token_entropy — within-doc Shannon entropy of the token distribution
# (the information-density cousin of repetition_filter's dup-bigram
# fraction: low entropy = keyboard-mash / boilerplate / repeated-token
# docs, a standard pre-training quality signal). Per distinct token,
# -p·log2(p) is rounded to 6 dp and summed as DECIMAL — exact and
# order-independent, so the parallel and serial engines agree bit-for-bit
# (the unigram_logprob discipline). norm_entropy = entropy / log2(V)
# rescales to [0, 1] across vocabulary sizes (0 where V = 1).
# Scale: one map-side-combinable shuffle on (doc_id, tok), one on doc_id;
# both keys near-uniform. Reference parity: ABSENT (north-star).
# ---------------------------------------------------------------------------


def _entropy_sql(dt: str) -> str:
    return f"""
    WITH {dt},
    probs AS (
      SELECT doc_id, tf,
             CAST(tf AS DOUBLE) / sum(tf) OVER (PARTITION BY doc_id) AS p
      FROM dt),
    doc AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             sum(CAST(round(-p * log2(p), 6) AS DECIMAL(18, 6))) AS ent
      FROM probs GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct,
           -- 6 dp, NOT coarser: the decimal sum is an exact multiple of
           -- 1e-6, so re-rounding at 4 dp lands on half-way cases for ~1%%
           -- of docs, where Spark (shortest-decimal HALF_UP) and DuckDB
           -- (binary-value rounding) disagree; at the sum's own precision
           -- the nearest boundary is 5e-7 away and both engines agree
           round(CAST(ent AS DOUBLE), 6) AS entropy,
           CASE WHEN n_distinct = 1 THEN CAST(0.0 AS DOUBLE)
                ELSE round(CAST(ent AS DOUBLE) / log2(n_distinct), 4)
           END AS norm_entropy
    FROM doc
    """


_DT_TOK_SPARK = (
    "dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM "
    "(SELECT doc_id, explode(split(text, ' ', -1)) AS tok FROM documents) x "
    "GROUP BY doc_id, tok)"
)
_DT_TOK_DUCK = (
    "dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM "
    "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) x "
    "GROUP BY doc_id, tok)"
)


def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(_entropy_sql(_DT_TOK_SPARK))


def token_entropy_oracle() -> str:
    return _entropy_sql(_DT_TOK_DUCK)


# ---------------------------------------------------------------------------
# tokenizer_fertility — the tokenizer-efficiency audit a multilingual
# training run checks before committing token budgets: per language,
# BPE-ish tokens per whitespace word (fertility — a tokenizer trained on
# English typically shows fertility ≫ 1 on other scripts, inflating
# their effective cost) and characters per BPE token (compression).
# Ratios are exact integer basis points (cross-multiplied BIGINT
# division — the q_mom_growth discipline) so the oracle is bit-exact.
# One map-side-combinable fold on the O(#langs) key; token counts are
# the same engine-parity expressions q_token_count pins.
# ---------------------------------------------------------------------------


def _fertility_sql(toks_len: str, bpe: str, idiv: str) -> str:
    return f"""
    WITH c AS (SELECT lang,
                      CAST({toks_len} AS BIGINT) AS n_ws,
                      CAST({bpe} AS BIGINT) AS n_bpe,
                      CAST(length(text) AS BIGINT) AS n_chr
               FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
           CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
           CAST((sum(n_bpe) * 10000) {idiv} sum(n_ws) AS BIGINT)
             AS fertility_bp,
           CAST((sum(n_chr) * 10000) {idiv} sum(n_bpe) AS BIGINT)
             AS chars_per_token_bp
    FROM c GROUP BY lang
    """


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        _fertility_sql(f"size({T.TOKS_SPARK})", T.TOKEN_BPE_SPARK, "DIV")
    )


def tokenizer_fertility_oracle() -> str:
    return _fertility_sql(f"len({T.TOKS_DUCK})", T.TOKEN_BPE_DUCK, "//")


# ---------------------------------------------------------------------------
# winnow — positional winnowing (Schleimer, Wilkerson & Aiken, SIGMOD
# 2003): the fingerprint-SELECTION algorithm behind MOSS. Differs from
# doc_fingerprint (a global min-4 sketch of the whole shingle set) by
# being POSITIONAL: slide a w-window over the k-gram hash sequence and
# keep the window's minimum (rightmost on ties) — the selected (pos,
# hash) set carries the guarantee that any shared run of >= w + k − 1
# tokens between two documents shares at least one fingerprint, which a
# global sketch cannot promise. Expected density 2/(w+1).
#
# The rightmost-min tie rule rides in ONE orderable integer: key =
# h·1024 + (1023 − p) (docs are << 1024 grams; h < 2³¹ so key < 2⁴¹ —
# no overflow). min(key) then decodes to (min h, max p) — no struct
# comparison, identical semantics in both engines.
#
# Plan: gram explode is O(total tokens); the min is a doc-PARTITIONED
# running window (ROWS w−1 PRECEDING — per-partition state O(w));
# summary is a map-side-combinable fold on doc_id. One shuffle total
# (the doc_id window/agg partition). k=4, w=4 here; MOSS production
# uses k≈5 char-grams, w tuned to the noise threshold.
# ---------------------------------------------------------------------------

WINNOW_K = 4
WINNOW_W = 4


def _winnow_body(duck: bool) -> str:
    """The CTE chain through ``sel`` (the selected fingerprint set) —
    exposed separately so tests can query the positional selection
    directly instead of string-slicing the summary SQL."""
    k, w = WINNOW_K, WINNOW_W
    if duck:
        toks = T.TOKS_DUCK
        gram = f"array_to_string(toks[i:i + {k - 1}], ' ')"
        posrange = f", unnest(range(1, len(toks) - {k - 2})) AS t(i)"
        h = f"CAST(concat('0x', substr(md5({gram}), 1, 14)) AS BIGINT) % {T.MINHASH_P}"
        idiv = "//"
    else:
        toks = T.TOKS_SPARK
        gram = f"concat_ws(' ', slice(toks, i, {k}))"
        posrange = (
            f" LATERAL VIEW explode(slice(sequence(1, size(toks)), 1, "
            f"greatest(size(toks) - {k - 1}, 0))) t AS i"
        )
        h = f"CAST(conv(substr(md5({gram}), 1, 14), 16, 10) AS BIGINT) % {T.MINHASH_P}"
        idiv = "div"
    return f"""
    tk AS (SELECT doc_id, {toks} AS toks FROM documents),
    g AS (SELECT doc_id, CAST(i AS INT) AS p, {h} AS h
          FROM tk{posrange}),
    win AS (
      SELECT doc_id, p AS wend,
             min(h * 1024 + (1023 - p)) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS key
      FROM g),
    sel AS (
      SELECT DISTINCT doc_id, CAST(key {idiv} 1024 AS BIGINT) AS fp_hash,
             CAST(1023 - (key % 1024) AS INT) AS fp_pos
      FROM win WHERE wend >= {w})
    """


def _winnow_sql(duck: bool) -> str:
    idiv = "//" if duck else "div"
    return f"""{_winnow_body(duck)},
    grams AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
              FROM g GROUP BY doc_id),
    fps AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
            FROM sel GROUP BY doc_id)
    SELECT g.doc_id, g.n_grams, coalesce(f.n_fp, 0) AS n_fp,
           CAST((10000 * coalesce(f.n_fp, 0)) {idiv} g.n_grams AS BIGINT)
             AS density_bp
    FROM grams g LEFT JOIN fps f ON f.doc_id = g.doc_id
    """


def winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N90: positional winnowing fingerprint selection + density audit."""
    _docs(spark, sf_dir)
    return spark.sql("WITH " + _winnow_sql(duck=False))


def winnow_oracle() -> str:
    return "WITH " + _winnow_sql(duck=True)


# ---------------------------------------------------------------------------
# cooccur_pmi — token co-occurrence pointwise mutual information, the
# association-mining member of the text family: tf-idf ranks a token
# within ONE document, PMI ranks a token PAIR against the independence
# baseline across the corpus — the standard collocation/phrase-mining
# signal (and the unit NCE/word2vec-style objectives approximate).
# pmi(a,b) = log10(n_ab · N / (n_a · n_b)) over document-level presence.
#
# The scale knob is the vocabulary: pairs are formed ONLY over the
# top-V tokens by document frequency (V = 24; rank df DESC, tok — a
# total order). That bounds the per-document pair stage at V² however
# large the corpus grows, and the vocab frame is an O(V)-row broadcast
# — the same frame algebra as the unigram model and k-means centroids.
# Rare-token collocations are a different op (they need minimum-support
# pruning before pairing, the a-priori trick); this one is the dense
# head where PMI is statistically meaningful.
#
# Exactness: all counts BIGINT; the only float is the final log10 of a
# ratio of exact integers, rounded to 6 dp then DECIMAL-cast — the
# unigram_logprob discipline that holds bit-identical across engines.
# The published column is CAST back to DOUBLE: a DECIMAL output renders
# with trailing zeros on the Spark side while DuckDB fetch paths hand
# back float64, a guaranteed driver hash mismatch (VERDICT r04 #1).
#
# At 100 TB: presence explode is a narrow scan; the per-doc pair join
# shuffles on doc_id once; pair counts are map-side combinable into an
# O(V²) frame. Nothing scales faster than the corpus.
# ---------------------------------------------------------------------------

PMI_VOCAB = 24


def _pmi_sql(ex: str) -> str:
    return f"""
    n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM {ex}),
    dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM {ex}
            GROUP BY tok),
    vocab AS (SELECT tok, df FROM dfr
              ORDER BY df DESC, tok LIMIT {PMI_VOCAB}),
    oc AS (SELECT e.doc_id, e.tok, v.df
           FROM {ex} e JOIN vocab v ON v.tok = e.tok),
    pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
                     CAST(count(*) AS BIGINT) AS n_ab,
                     max(a.df) AS n_a, max(b.df) AS n_b
              FROM oc a JOIN oc b
                ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY a.tok, b.tok)
    SELECT tok_a, tok_b, n_ab, n_a, n_b,
           CAST(CAST(round(log10(CAST(n_ab AS DOUBLE) * (SELECT n_docs FROM n)
                                 / (n_a * n_b)),
                           6) AS DECIMAL(18, 6)) AS DOUBLE) AS pmi
    FROM pairs
    ORDER BY pmi DESC, tok_a, tok_b LIMIT 20
    """


def presence_select(duck: bool) -> str:
    """Document-level token presence (DISTINCT doc_id, tok) — the shared
    base frame of cooccur_pmi and quality.label_leakage, built on the
    corpus tokenizer contract (functions/text.py) so every text op
    tokenizes identically."""
    if duck:
        return (
            "SELECT DISTINCT doc_id, unnest(toks) AS tok "
            f"FROM (SELECT doc_id, {T.TOKS_DUCK} AS toks FROM documents) tk"
        )
    return (
        "SELECT DISTINCT doc_id, tok "
        f"FROM (SELECT doc_id, {T.TOKS_SPARK} AS toks FROM documents) tk "
        "LATERAL VIEW explode(toks) t AS tok"
    )


def cooccur_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N97: top-vocab token co-occurrence PMI (collocation mining).

    The presence frame is referenced three times (corpus size, document
    frequencies, the pair join), so it is staged once through
    scoped_checkpoint rather than re-exploding the corpus per reference
    (Catalyst inlines CTEs — the kcore lesson)."""
    from ..checkpoints import scoped_checkpoint

    _docs(spark, sf_dir)
    ex = spark.sql(presence_select(duck=False))
    scoped_checkpoint(ex, "pmi_ex").createOrReplaceTempView("pmi_ex")
    return spark.sql("WITH " + _pmi_sql("pmi_ex"))


def cooccur_pmi_oracle() -> str:
    return (
        f"WITH ex AS MATERIALIZED ({presence_select(duck=True)}), "
        + _pmi_sql("ex")
    )


# ---------------------------------------------------------------------------
# zipf_fit — corpus-linguistics health audit: the Zipf exponent of the
# token frequency spectrum plus hapax share. A natural corpus sits
# near α ≈ 1 with a large hapax tail; template-generated, synthetic,
# or heavily duplicated text bends both (α drifts, hapaxes vanish) —
# the population-level screen that complements per-doc signals
# (token_entropy, repetition_filter) the way benford complements range
# checks.
#
# Fit: OLS of ln f on ln r over the FREQUENCY SPECTRUM — one point per
# distinct frequency at its tied-block midrank (lo + (t+1)/2),
# weighted by class size t. Midranks make the fit tie-invariant (a
# per-token rank would depend on arbitrary ordering within a tied
# block); the sufficient statistics Σt, Σt·x, Σt·y, Σt·x², Σt·x·y
# fold in one pass over the spectrum. Ranks come from the same
# digit-class bucketed two-phase prefix as q_gini (descending by
# frequency: r = V − asc_rank + 1, exact integers), so nothing sorts
# globally. Doubles enter only at ln() of exact rationals and the
# final closed-form slope/R², rounded 6 dp.
# ---------------------------------------------------------------------------


def _zipf_sql(tok_src: str, idiv: str) -> str:
    return f"""
    f AS (SELECT tok, CAST(count(*) AS BIGINT) AS fr
          FROM {tok_src} GROUP BY tok),
    vals AS (SELECT fr, CAST(count(*) AS BIGINT) AS t,
                    CAST(length(CAST(fr AS STRING)) * 1000
                         + fr {idiv} CAST(power(10, greatest(
                               length(CAST(fr AS STRING)) - 3, 0))
                             AS BIGINT) AS BIGINT) AS b
             FROM f GROUP BY fr),
    tot AS (SELECT CAST(sum(t) AS BIGINT) AS v,
                   CAST(sum(t * fr) AS BIGINT) AS n_tok,
                   CAST(sum(CASE WHEN fr = 1 THEN t ELSE 0 END)
                        AS BIGINT) AS hapax
            FROM vals),
    bt AS (SELECT b, CAST(sum(t) AS BIGINT) AS tb FROM vals GROUP BY b),
    boff AS (SELECT b,
               CAST(coalesce(sum(tb) OVER (ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS off
             FROM bt),
    pts AS (SELECT v.fr, v.t,
                   -- ascending tied-block low edge, flipped to a
                   -- DESCENDING midrank: r_mid = V - lo - (t-1)/2
                   ln(tot.v - (o.off
                        + sum(v.t) OVER (PARTITION BY v.b ORDER BY v.fr
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - v.t)
                      - (v.t - 1) / 2.0e0) AS x,
                   ln(CAST(v.fr AS DOUBLE)) AS y
            FROM vals v JOIN boff o ON o.b = v.b, tot),
    m AS (SELECT sum(CAST(t AS DOUBLE)) AS sw,
                 sum(t * x) AS sx, sum(t * y) AS sy,
                 sum(t * x * x) AS sxx, sum(t * x * y) AS sxy,
                 sum(t * y * y) AS syy
          FROM pts)
    SELECT tot.v AS vocab_size, tot.n_tok AS n_tokens,
           round(CAST(tot.hapax AS DOUBLE) / tot.v, 6) AS hapax_share,
           round(-(m.sw * m.sxy - m.sx * m.sy)
                 / (m.sw * m.sxx - m.sx * m.sx), 6) AS zipf_alpha,
           round(power(m.sw * m.sxy - m.sx * m.sy, 2)
                 / ((m.sw * m.sxx - m.sx * m.sx)
                    * (m.sw * m.syy - m.sy * m.sy)), 6) AS r2
    FROM tot, m
    """


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N123: Zipf-exponent OLS over the frequency spectrum, midrank ties."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _zipf_sql(
            "(SELECT explode(split(text, ' ', -1)) AS tok FROM documents) x",
            "div",
        )
    )


def zipf_fit_oracle() -> str:
    return "WITH " + _zipf_sql(
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) x",
        "//",
    )


# ---------------------------------------------------------------------------
# redundancy — cross-document redundancy per source: total vs distinct
# token-3-gram mass pooled over each source's documents. The
# templated-source detector: repetition_filter scores repetition
# WITHIN a document (Gopher-style), dedup catches whole near-duplicate
# documents — but a source whose documents each look fine yet all
# share the same boilerplate skeleton only shows up when grams are
# pooled ACROSS its documents, which is exactly what inflates
# total/distinct here. The integer-exact stand-in for the zlib
# compression-ratio signal the FineWeb/Gopher pipelines use (no
# compressor in SQL, but shared-gram mass is what a compressor
# exploits).
#
# All counts exact BIGINTs; the two ratios are the only doubles,
# rounded 6 dp. Shape: explode grams → one (source, gram) fold
# (map-side combinable; heavy grams combine before the shuffle) →
# one O(#sources) rollup.
# ---------------------------------------------------------------------------


def _redundancy_sql(tok3: str) -> str:
    return f"""
    g AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS n
          FROM {tok3} GROUP BY source, gram),
    s AS (SELECT source,
                 CAST(sum(n) AS BIGINT) AS total_grams,
                 CAST(count(*) AS BIGINT) AS distinct_grams,
                 CAST(max(n) AS BIGINT) AS top_gram_count
          FROM g GROUP BY source)
    SELECT source, total_grams, distinct_grams,
           round(CAST(total_grams AS DOUBLE) / distinct_grams, 6)
             AS redundancy,
           round(CAST(top_gram_count AS DOUBLE) / total_grams, 6)
             AS top_gram_share
    FROM s
    """


def redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N133: pooled cross-doc 3-gram redundancy per source."""
    _docs(spark, sf_dir)
    tok3 = (
        "(SELECT source, concat_ws(' ', toks[i], toks[i+1], toks[i+2]) "
        " AS gram "
        " FROM (SELECT source, split(text, ' ', -1) AS toks FROM documents) t "
        " LATERAL VIEW explode(sequence(0, size(toks) - 3)) x AS i "
        " WHERE size(toks) >= 3) z"
    )
    return spark.sql("WITH " + _redundancy_sql(tok3))


def redundancy_oracle() -> str:
    tok3 = (
        "(SELECT source, "
        "  concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS gram "
        " FROM (SELECT source, string_split(text, ' ') AS toks "
        "       FROM documents) t, "
        "      unnest(range(1, greatest(len(toks) - 1, 1))) AS u(i) "
        " WHERE len(toks) >= 3) z"
    )
    return "WITH " + _redundancy_sql(tok3)


# ---------------------------------------------------------------------------
# entropy_rate — corpus bigram CONDITIONAL entropy H(W₂|W₁) in bits
# (+ perplexity 2^H): the sequence-predictability number of the corpus
# itself. Complements the LM-quality ladder's held-out scores
# (unigram/bigram_logprob score DOCUMENTS against a trained model; this
# is the corpus-level statistic those models bottom out at — the
# compressibility floor any LM trained on this corpus can reach on it).
# Shannon: H(W₂|W₁) = −Σ_{w1,w2} (c12/N)·log2(c12/c1), c1 = Σ_w2 c12.
#
# Float discipline (the bigram_logprob pattern): each bigram's
# log2(c12/c1) is rounded to 6 dp and cast DECIMAL(18,6), multiplied by
# the exact DECIMAL(18,0) count — the weighted sum is EXACT decimal
# arithmetic, order-independent across partitions and engines; doubles
# exist only in the final 1-row division and the pow() readout.
#
# Scale: bigram frame = one narrow positional explode; the (w1,w2) fold
# shuffles once (map-side combinable); un/terms re-read the STAGED
# type frame (O(bigram types) ≤ min(tokens, V²), Heaps-sublinear), not
# the corpus — tr is checkpointed (Spark) / MATERIALIZED (DuckDB)
# because both optimizers would otherwise inline it twice.
# ---------------------------------------------------------------------------


def _entropy_body(tr: str) -> str:
    return f"""
    un AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
           FROM {tr} GROUP BY w1),
    nn AS (SELECT CAST(sum(c12) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS n_bigram_types
           FROM {tr}),
    cc AS (SELECT CAST(count(*) AS BIGINT) AS n_contexts FROM un),
    terms AS (SELECT CAST(t.c12 AS DECIMAL(18, 0))
                     * CAST(round(log2(CAST(t.c12 AS DOUBLE)
                                       / CAST(u.c1 AS DOUBLE)), 6)
                            AS DECIMAL(18, 6)) AS contrib
              FROM {tr} t JOIN un u ON u.w1 = t.w1),
    s AS (SELECT sum(contrib) AS sc FROM terms)
    SELECT nn.n AS n_bigrams, nn.n_bigram_types, cc.n_contexts,
           round(-CAST(s.sc AS DOUBLE) / CAST(nn.n AS DOUBLE), 6)
             AS entropy_bits,
           round(pow(CAST(2 AS DOUBLE),
                     round(-CAST(s.sc AS DOUBLE) / CAST(nn.n AS DOUBLE), 6)),
                 4) AS perplexity
    FROM s CROSS JOIN nn CROSS JOIN cc
    """


def entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N139: corpus bigram conditional entropy (bits) + perplexity."""
    from ..checkpoints import scoped_checkpoint

    _docs(spark, sf_dir)
    bg = spark.sql(
        """
        SELECT element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2
        FROM (SELECT split(text, ' ', -1) AS toks FROM documents)
        LATERAL VIEW explode(slice(sequence(1, size(toks)), 1,
                                   greatest(size(toks) - 1, 0))) t AS i
        """
    )
    tr = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    scoped_checkpoint(tr, "entropy_tr").createOrReplaceTempView("entropy_tr")
    return spark.sql("WITH " + _entropy_body("entropy_tr"))


def entropy_rate_oracle() -> str:
    return (
        "WITH tr AS MATERIALIZED ("
        "SELECT toks[i] AS w1, toks[i + 1] AS w2,"
        " CAST(count(*) AS BIGINT) AS c12"
        " FROM (SELECT string_split(text, ' ') AS toks FROM documents),"
        " unnest(range(1, len(toks))) AS t(i)"
        " GROUP BY toks[i], toks[i + 1]),"
        + _entropy_body("tr")
    )


# ---------------------------------------------------------------------------
# heaps_law — vocabulary-GROWTH exponent: V(N) ≈ K·N^β over cumulative
# corpus prefixes (Heaps/Herdan). The corpus-health twin of zipf_fit:
# Zipf describes the frequency SPECTRUM at a point in time, Heaps how
# the vocabulary will GROW as the crawl scales — the number that sizes
# vocab-keyed state (token dictionaries, BPE tables, dedup band
# indexes) at 10× the data. β ≈ 0.5 typical English; β near 1 means
# unbounded novelty (IDs, noise — a data-quality smell); β near 0 a
# closed vocabulary.
#
# Prefixes: 10 checkpoints by doc_id range fraction. A doc belongs to
# growth bucket b = ceil(10·(doc_id−dmin+1)/span) — spelled with the
# exact mod-subtract ceiling so both engines' integer division agrees.
# N_k = cumulative tokens, V_k = cumulative count of tokens whose FIRST
# doc falls in buckets ≤ k (first-doc = min(doc_id) per token — vocab
# novelty is an associative min, map-side combinable). OLS on
# (ln N_k, ln V_k): logs rounded 6 dp → DECIMAL(18,6), so the 10-point
# moment sums are exact and order-independent; β and K are single
# double expressions at the end.
#
# Scale: one token explode feeding TWO map-side-combinable folds (per
# doc: count; per token: min doc_id); the checkpoint frames are O(10);
# the only cross is the 1-row (dmin, span) extent frame (whitelisted).
# ---------------------------------------------------------------------------

HEAPS_POINTS = 10


def _heaps_sql(toks_explode: str, n_toks: str, idiv: str) -> str:
    p = HEAPS_POINTS
    # exact integer ceiling: ceil(a/s) = (a - 1) div s + 1 for a ≥ 1
    # ((a + s − 1) div s rounds in neither engine — both truncate BIGINT
    # div — but the a−1 form also never overflows a)
    bucket = f"(({p} * (doc_id - e.dmin + 1) - 1) {idiv} e.span + 1)"
    return f"""
    ext AS (SELECT CAST(min(doc_id) AS BIGINT) AS dmin,
                   CAST(max(doc_id) - min(doc_id) + 1 AS BIGINT) AS span
            FROM documents),
    dtok AS (SELECT doc_id, CAST({n_toks} AS BIGINT) AS n_toks
             FROM documents),
    nb AS (SELECT CAST({bucket} AS BIGINT) AS b,
                  CAST(sum(d.n_toks) AS BIGINT) AS toks
           FROM dtok d CROSS JOIN ext e
           GROUP BY CAST({bucket} AS BIGINT)),
    firsts AS (SELECT tok, CAST(min(doc_id) AS BIGINT) AS doc_id
               FROM {toks_explode} GROUP BY tok),
    vb AS (SELECT CAST({bucket} AS BIGINT) AS b,
                  CAST(count(*) AS BIGINT) AS novel
           FROM firsts d CROSS JOIN ext e
           GROUP BY CAST({bucket} AS BIGINT)),
    pts AS (SELECT n.b,
                   CAST(sum(n.toks) OVER (ORDER BY n.b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_toks,
                   CAST(sum(coalesce(v.novel, 0)) OVER (ORDER BY n.b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_vocab
            FROM nb n LEFT JOIN vb v ON v.b = n.b),
    lg AS (SELECT CAST(round(ln(CAST(cum_toks AS DOUBLE)), 6)
                       AS DECIMAL(18, 6)) AS x,
                  CAST(round(ln(CAST(cum_vocab AS DOUBLE)), 6)
                       AS DECIMAL(18, 6)) AS y
           FROM pts),
    m AS (SELECT CAST(count(*) AS DECIMAL(18, 0)) AS k,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM lg)
    SELECT CAST(k AS BIGINT) AS n_points,
           (SELECT max(cum_toks) FROM pts) AS total_tokens,
           (SELECT max(cum_vocab) FROM pts) AS total_vocab,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 4) AS beta,
           round(exp(CAST(sy AS DOUBLE) / CAST(k AS DOUBLE)
                 - (CAST(k * sxy - sx * sy AS DOUBLE)
                    / CAST(k * sxx - sx * sx AS DOUBLE))
                   * CAST(sx AS DOUBLE) / CAST(k AS DOUBLE)), 4) AS k_coeff
    FROM m
    """


def heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N140: Heaps-law vocabulary-growth exponent over corpus prefixes."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _heaps_sql(
            "(SELECT doc_id, explode(split(text, ' ', -1)) AS tok "
            "FROM documents) x",
            "size(split(text, ' ', -1))",
            "div",
        )
    )


def heaps_law_oracle() -> str:
    return "WITH " + _heaps_sql(
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents) x",
        "len(string_split(text, ' '))",
        "//",
    )


# ---------------------------------------------------------------------------
# source_diversity — per-source lexical-diversity panel: token count,
# vocabulary, Shannon entropy (bits), Simpson collision probability,
# and type-token ratio. The data-MIX audit at the source grain: the mix
# family (mix_temperature/mix_materialize) decides how much of each
# source to sample; this measures what each source's token DISTRIBUTION
# is worth — a source with high mass but near-zero entropy (templated,
# repetitive) adds tokens, not information. Complements q_redundancy
# (cross-doc 3-gram pooling) with the order-free unigram view, and
# q_entropy_rate (global bigram) with the per-source marginal.
#
# Exactness: Shannon = −Σ c·log2(c/n)/n with the 6-dp-DECIMAL-log
# pattern (exact, order-independent); Simpson = Σc(c−1)/(n(n−1)) in
# DECIMAL(38,0) carriers (c² sums overflow BIGINT at corpus scale) —
# one double division per source at the end.
#
# Shape: one explode → one (source, tok) map-side-combinable fold →
# per-source refold + equi-join on source (no crosses, no windows);
# O(#sources) output.
# ---------------------------------------------------------------------------


def _diversity_sql(toks_explode: str) -> str:
    return f"""
    tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM {toks_explode} GROUP BY source, tok),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS vocab
            FROM tc GROUP BY source),
    ent AS (SELECT t.source,
                   sum(CAST(t.c AS DECIMAL(18, 0))
                       * CAST(round(log2(CAST(t.c AS DOUBLE)
                                         / CAST(o.n AS DOUBLE)), 6)
                              AS DECIMAL(18, 6))) AS wlog,
                   sum(CAST(t.c AS DECIMAL(38, 0))
                       * CAST(t.c - 1 AS DECIMAL(38, 0))) AS coll
            FROM tc t JOIN tot o ON o.source = t.source
            GROUP BY t.source)
    SELECT o.source, o.n AS n_tokens, o.vocab,
           round(-CAST(e.wlog AS DOUBLE) / CAST(o.n AS DOUBLE), 6)
             AS shannon_bits,
           round(CAST(e.coll AS DOUBLE)
                 / (CAST(o.n AS DOUBLE) * CAST(o.n - 1 AS DOUBLE)), 6)
             AS simpson,
           round(CAST(o.vocab AS DOUBLE) / CAST(o.n AS DOUBLE), 6) AS ttr
    FROM tot o JOIN ent e ON e.source = o.source
    """


def source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N143: per-source Shannon/Simpson/TTR lexical-diversity panel."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _diversity_sql(
            "(SELECT source, explode(split(text, ' ', -1)) AS tok "
            "FROM documents) x"
        )
    )


def source_diversity_oracle() -> str:
    return "WITH " + _diversity_sql(
        "(SELECT source, unnest(string_split(text, ' ')) AS tok "
        "FROM documents) x"
    )


# ---------------------------------------------------------------------------
# vocab_overlap — pairwise source-vocabulary overlap: set Jaccard,
# small-side containment, AND the mass-weighted cosine of the two
# token-count profiles. The between-source companion of
# source_diversity's within-source panel — the mix-design question "are
# src3 and src7 the same content farm?" (near-1 cosine) vs "do they
# merely share a language" (high Jaccard, diverging mass profiles).
# On a closed shared vocabulary set-Jaccard saturates at 1.0 — the
# cosine is what still separates sources there (and the reason this op
# reports both).
#
# Exactness: intersections/vocab sizes exact BIGINTs; dot products and
# squared norms in DECIMAL(38,0) carriers; one double division per
# pair, round 6.
#
# Shape: (source, tok) count frame → self equi-join ON tok with
# source_a < source_b (token-keyed, never a cross: a token joins at
# most #sources² rows) → (pair) fold; norms equi-join back on source.
# O(#sources²) output rows — policy-bounded, not data-scaled.
# ---------------------------------------------------------------------------


def _overlap_sql(toks_explode: str) -> str:
    return f"""
    tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           FROM {toks_explode} GROUP BY source, tok),
    sz AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
                  CAST(sum(CAST(c AS DECIMAL(38, 0))
                           * CAST(c AS DECIMAL(38, 0))) AS DECIMAL(38, 0))
                    AS nrm2
           FROM tc GROUP BY source),
    pr AS (SELECT a.source AS src_a, b.source AS src_b,
                  CAST(count(*) AS BIGINT) AS inter,
                  CAST(sum(CAST(a.c AS DECIMAL(38, 0))
                           * CAST(b.c AS DECIMAL(38, 0))) AS DECIMAL(38, 0))
                    AS dot
           FROM tc a JOIN tc b
             ON b.tok = a.tok AND a.source < b.source
           GROUP BY a.source, b.source)
    SELECT p.src_a, p.src_b, p.inter AS inter_vocab,
           round(CAST(p.inter AS DOUBLE)
                 / CAST(sa.vocab + sb.vocab - p.inter AS DOUBLE), 6)
             AS jaccard,
           round(CAST(p.inter AS DOUBLE)
                 / CAST(least(sa.vocab, sb.vocab) AS DOUBLE), 6)
             AS containment,
           round(CAST(p.dot AS DOUBLE)
                 / (sqrt(CAST(sa.nrm2 AS DOUBLE))
                    * sqrt(CAST(sb.nrm2 AS DOUBLE))), 6) AS cosine
    FROM pr p
    JOIN sz sa ON sa.source = p.src_a
    JOIN sz sb ON sb.source = p.src_b
    """


def vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N144: pairwise source overlap — Jaccard/containment/mass cosine."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _overlap_sql(
            "(SELECT source, explode(split(text, ' ', -1)) AS tok "
            "FROM documents) x"
        )
    )


def vocab_overlap_oracle() -> str:
    return "WITH " + _overlap_sql(
        "(SELECT source, unnest(string_split(text, ' ')) AS tok "
        "FROM documents) x"
    )


# ---------------------------------------------------------------------------
# novelty — per-document NOVELTY score against the corpus prefix: the
# share of a doc's distinct token-3-grams never seen in any EARLIER doc
# (first-seen = min doc_id per gram — the Heaps-law machinery at gram
# grain, credited back to documents). The data-curation signal between
# dedup's binary verdicts and redundancy's source-level pooling: a
# feed whose novelty curve collapses has stopped paying for itself —
# the number crawl scheduling and mix rebalancing read per batch.
#
# All-integer (counts + basis points via dialect integer division).
# Shape: distinct (doc, gram) explode → one gram-keyed min fold (map-
# side combinable) → join back on gram → per-doc fold. Two shuffles,
# both on keys that scale sublinearly (grams Heaps-bounded).
# ---------------------------------------------------------------------------


def _novelty_sql(shingles: str, explode: str, idiv: str) -> str:
    return f"""
    sh AS (SELECT doc_id, {shingles} AS sh FROM documents),
    dg AS (SELECT doc_id, gram FROM sh {explode}),
    fs AS (SELECT gram, CAST(min(doc_id) AS BIGINT) AS first_doc
           FROM dg GROUP BY gram),
    d AS (SELECT dg.doc_id,
                 CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN fs.first_doc = dg.doc_id
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
          FROM dg JOIN fs ON fs.gram = dg.gram
          GROUP BY dg.doc_id)
    SELECT doc_id, n_grams, n_novel,
           CAST((10000 * n_novel) {idiv} n_grams AS BIGINT) AS novelty_bp
    FROM d
    """


def novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N162: first-seen gram share per doc — the curation novelty curve."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH tk0 AS (SELECT doc_id, split(text, ' ', -1) AS toks, text "
        "FROM documents),"
        + _novelty_sql(
            T.shingles_spark(),
            "LATERAL VIEW explode(sh) t AS gram",
            "div",
        ).replace("FROM documents", "FROM tk0", 1)
    )


def novelty_oracle() -> str:
    return (
        "WITH tk0 AS (SELECT doc_id, string_split(text, ' ') AS toks, text "
        "FROM documents),"
        + _novelty_sql(
            T.shingles_duck(),
            ", unnest(sh) AS t(gram)",
            "//",
        ).replace("FROM documents", "FROM tk0", 1)
    )


# ---------------------------------------------------------------------------
# heavy_hitters_cms — Count-Min Sketch heavy hitters, FULLY ORACLED.
# The streaming-sketch answer to "top tokens without a full groupBy": d=4
# hash rows × w=64 counters; every occurrence increments one counter per
# row; a token's estimate is the MIN over its d counters — always ≥ the
# true count (one-sided error), overshooting only when every row collides.
# Sketches are usually rows-only territory; THIS one is deterministic end
# to end because the hash is md5 (portable: conv-vs-0x hex-prefix int,
# the bootstrap_ci discipline), so DuckDB rebuilds the identical sketch
# and the differential pins estimate AND overestimate exactly.
# Scale shape: ONE corpus shuffle (token counts — map-side combinable);
# the sketch is then built FROM the vocab-sized count frame (d×w counters
# = 256 cells regardless of corpus), the estimate join is equi-keyed on
# (row, bucket), and the top-K cut is ORDER BY + LIMIT (TakeOrdered, no
# global window). The fixture's ~40-word closed vocab vs w=64 makes real
# collisions (and thus visible overestimates) likely — the property the
# pin verifies: est ≥ true, with equality iff no row-collision survived
# the min.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOPK = 15


def _cms_sql(md5int: str, explode_tok: str, explode_r: str) -> str:
    return f"""
    tok AS (SELECT tok, CAST(count(*) AS BIGINT) AS n
            FROM {explode_tok} GROUP BY tok),
    keyed AS (SELECT tok, n, r, {md5int} % {CMS_WIDTH} AS bucket
              FROM tok{explode_r}),
    counters AS (SELECT r, bucket, CAST(sum(n) AS BIGINT) AS c
                 FROM keyed GROUP BY r, bucket),
    est AS (SELECT k.tok, k.n, CAST(min(c.c) AS BIGINT) AS est
            FROM keyed k JOIN counters c
              ON c.r = k.r AND c.bucket = k.bucket
            GROUP BY k.tok, k.n)
    SELECT tok, n AS true_n, est AS est_n, est - n AS overestimate
    FROM est
    ORDER BY est DESC, n DESC, tok
    LIMIT {CMS_TOPK}
    """


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N181: Count-Min-Sketch heavy hitters with a deterministic md5 sketch."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _cms_sql(
            "CAST(conv(substr(md5(concat(CAST(r AS STRING), '#', tok)), "
            "1, 12), 16, 10) AS BIGINT)",
            "(SELECT tok FROM documents "
            "LATERAL VIEW explode(split(text, ' ', -1)) t AS tok) x",
            f" LATERAL VIEW explode(sequence(0, {CMS_DEPTH - 1})) d AS r",
        )
    )


def heavy_hitters_cms_oracle() -> str:
    return "WITH " + _cms_sql(
        "CAST(concat('0x', substr(md5(concat(CAST(r AS VARCHAR), '#', "
        "tok)), 1, 12)) AS BIGINT)",
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) x",
        f", unnest(range(0, {CMS_DEPTH})) AS d(r)",
    )


# ---------------------------------------------------------------------------
# feature_hashing — the hashing trick (Weinberger et al. 2009): tokens →
# signed {-1,+1} counts in a fixed 64-dim bucket space, the stateless
# vectorizer for models that can't carry a vocabulary (no fit step, no
# dictionary broadcast, new tokens never OOV). Signs make collisions
# cancel in expectation instead of always inflating (the property that
# separates it from plain modulo bucketing — and from the CMS above,
# whose collisions are one-sided by design).
# Everything integer: per-doc nnz / L1 / L2² of the hashed vector are
# exact, so the differential is hash-exact. Bucket and sign come from
# the same portable md5-int idiom as the CMS.
# Scale shape: explode → groupBy (doc_id, bucket) → re-agg by doc_id;
# both shuffles are doc-keyed and the second runs on the already-reduced
# ≤64-buckets-per-doc frame (AQE-coalesced) — narrow, linear, no corpus
# pair surface anywhere.
# ---------------------------------------------------------------------------

FH_DIM = 64


def _feature_hashing_sql(md5b: str, md5s: str, explode_tok: str) -> str:
    return f"""
    tk AS (SELECT doc_id, tok,
                  {md5b} % {FH_DIM} AS bucket,
                  CASE WHEN {md5s} % 2 = 0 THEN 1 ELSE -1 END AS sg
           FROM {explode_tok}),
    vec AS (SELECT doc_id, bucket, CAST(sum(sg) AS BIGINT) AS v
            FROM tk GROUP BY doc_id, bucket)
    SELECT doc_id,
           CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
           CAST(sum(abs(v)) AS BIGINT) AS l1,
           CAST(sum(v * v) AS BIGINT) AS l2sq
    FROM vec GROUP BY doc_id
    """


def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N182: signed hashing-trick vectors, exact integer per-doc norms."""
    _docs(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _feature_hashing_sql(
            "CAST(conv(substr(md5(concat('b#', tok)), 1, 12), 16, 10) "
            "AS BIGINT)",
            "CAST(conv(substr(md5(concat('s#', tok)), 1, 12), 16, 10) "
            "AS BIGINT)",
            "(SELECT doc_id, tok FROM documents "
            "LATERAL VIEW explode(split(text, ' ', -1)) t AS tok) x",
        )
    )


def feature_hashing_oracle() -> str:
    return "WITH " + _feature_hashing_sql(
        "CAST(concat('0x', substr(md5(concat('b#', tok)), 1, 12)) AS BIGINT)",
        "CAST(concat('0x', substr(md5(concat('s#', tok)), 1, 12)) AS BIGINT)",
        "(SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
        "FROM documents) x",
    )


# ---------------------------------------------------------------------------
# preference_pairs — (chosen, rejected) manifest construction for
# preference-tuning (DPO/RLHF reward-model data): per (lang, source)
# stratum, pair the HIGHEST-quality document with the LOWEST-quality one
# under the integer-basis-point quality blend. The pairing every
# preference pipeline starts from when no human labels exist yet —
# quality-score extremes as weak preference supervision — and the margin
# column is the filter knob (small-margin pairs are label noise; a real
# pipeline drops them).
# Determinism: arg-extremes via exact integer keys — chosen maximizes
# quality then takes the LOWEST doc_id (key = q·10¹² + (10¹²−1 − doc_id)),
# rejected minimizes quality then lowest doc_id (key = q·10¹² + doc_id) —
# no min_by/max_by tie ambiguity, no floats.
# Scale shape: one narrow scan → ONE (lang, source)-keyed fold (integer
# key min/max are map-side combinable) → decode. O(#strata) output.
# ---------------------------------------------------------------------------


def _preference_pairs_sql(quality: str, idiv: str) -> str:
    enc = "CAST(1000000000000 AS BIGINT)"
    return f"""
    q AS (SELECT doc_id, lang, source, {quality} AS qual FROM tk),
    k AS (SELECT lang, source,
                 CAST(max(qual * {enc} + ({enc} - 1 - doc_id))
                      AS BIGINT) AS kmax,
                 CAST(min(qual * {enc} + doc_id) AS BIGINT) AS kmin,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM q GROUP BY lang, source)
    SELECT lang, source, n_docs,
           CAST(({enc} - 1) - (kmax % {enc}) AS BIGINT) AS chosen_doc,
           CAST(kmax {idiv} {enc} AS BIGINT) AS chosen_q,
           CAST(kmin % {enc} AS BIGINT) AS rejected_doc,
           CAST(kmin {idiv} {enc} AS BIGINT) AS rejected_q,
           CAST(kmax {idiv} {enc} - kmin {idiv} {enc} AS BIGINT)
             AS margin
    FROM k
    """


def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N188: per-stratum (chosen, rejected) preference-pair manifest."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"WITH {_TK_SPARK}, "
        + _preference_pairs_sql(T.quality_spark(), "div")
    )


def preference_pairs_oracle() -> str:
    return (
        f"WITH {_TK_DUCK}, "
        + _preference_pairs_sql(T.quality_duck(), "//")
    )
