"""Tokenizer-side corpus operators: sequence packing + BPE pair counts.

Two passes every pretraining-data pipeline runs after cleaning/dedup and
before the tokenizer fleet (SURVEY §2.11 ext; the reference proxy —
/root/reference/main.go — has no document surface at all, this is
north-star scope per BASELINE.json):

- ``pack_global`` — GPT-style concat-and-chunk packing manifest: the
  corpus token stream (docs concatenated in deterministic ``doc_id``
  order) sliced into fixed-length training sequences, emitted as a
  (seq_id, doc_id, offsets) manifest so the tokenizer fleet can pack
  shards without ever materializing the concatenation. Complementary to
  ``pipeline_ops.sequence_pack`` (q_sequence_pack), which packs 8
  INDEPENDENT shard streams (shard = doc_id % 8) — the embarrassingly
  parallel layout; this one produces the single GLOBAL stream layout
  (one deterministic token order corpus-wide), whose prefix sum is the
  part that needs the two-phase distributed spelling.
- ``bpe_pairs`` — the inner step of BPE tokenizer training (Sennrich et
  al. 2016): adjacent character-pair frequencies, counted over word
  TYPES weighted by word frequency (the standard BPE efficiency trick —
  pair explosion runs over the vocabulary, not the token instances).

Both are pure-integer / exact-string computations, fully differentially
oracled against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

#: training-sequence length (tokens) for the packing manifest.
SEQ_LEN = 128

#: docs per prefix-sum bucket. The bucket-totals frame has ndocs/BUCKET
#: rows; its cumulative sum is the only single-partition step and it is
#: O(#buckets), not O(docs) — at 100 TB pick BUCKET so #buckets stays in
#: the millions (a few MB), exactly the two-phase distributed prefix-sum.
BUCKET = 100


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# pack_global — the scalable shape matters here: a naive
# `sum() OVER (ORDER BY doc_id)` plans ONE partition holding the whole
# corpus. Instead: (1) per-bucket token totals (map-side-combinable
# shuffle), (2) exclusive cumsum over the TINY bucket frame (single
# partition, O(#buckets) rows), (3) broadcast the offsets back, (4)
# within-bucket exclusive cumsum (window partitioned BY bucket — parallel),
# (5) explode each doc's span into the sequences it overlaps (bounded by
# ntoks/SEQ_LEN + 1 per doc — narrow). No stage ever holds more than a
# bucket in one task.
# ---------------------------------------------------------------------------


def pack_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The tk frame feeds BOTH the bucket-totals branch and the join
    # branch; Spark inlines CTEs, so without staging the corpus would be
    # scanned and re-tokenized twice (PLANS.md showed the two parquet
    # leaves). Stage the narrow (doc_id, ntoks, bucket) frame once —
    # ~24 bytes/doc vs the text column — via scoped localCheckpoint (on
    # a cluster: write the counts table, then run the tail over it).
    from ..checkpoints import scoped_checkpoint

    _docs(spark, sf_dir)
    tk = scoped_checkpoint(
        spark.sql(
            f"""
            SELECT doc_id,
                   CAST(size(split(text, ' ', -1)) AS BIGINT) AS ntoks,
                   doc_id div {BUCKET} AS bucket
            FROM documents
            """
        ),
        "pack_global_tk",
    )
    tk.createOrReplaceTempView("pack_global_tk")
    return spark.sql(
        f"""
        WITH tk AS (SELECT * FROM pack_global_tk),
        bt AS (SELECT bucket, sum(ntoks) AS btoks FROM tk GROUP BY bucket),
        bo AS (SELECT bucket,
                      coalesce(sum(btoks) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS bucket_off
               FROM bt),
        sp AS (SELECT tk.doc_id, tk.ntoks,
                      bo.bucket_off
                        + coalesce(sum(tk.ntoks) OVER (PARTITION BY tk.bucket
                            ORDER BY tk.doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS t0
               FROM tk JOIN bo ON tk.bucket = bo.bucket)
        SELECT seq_id, doc_id,
               greatest(t0, seq_id * {SEQ_LEN}) - t0 AS doc_off,
               greatest(t0, seq_id * {SEQ_LEN}) - seq_id * {SEQ_LEN} AS seq_off,
               least(t0 + ntoks, (seq_id + 1) * {SEQ_LEN})
                 - greatest(t0, seq_id * {SEQ_LEN}) AS n_tok
        FROM sp
        LATERAL VIEW explode(sequence(t0 div {SEQ_LEN},
                                      (t0 + ntoks - 1) div {SEQ_LEN})) t AS seq_id
        """
    )


def pack_global_oracle() -> str:
    # DuckDB can afford the direct single-window spelling — the oracle
    # states the SEMANTICS (global concat order), the Spark side the
    # distributed plan; both must agree token-for-token.
    return f"""
    WITH tk AS (SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS ntoks
                FROM documents),
    sp AS (SELECT doc_id, ntoks,
                  CAST(coalesce(sum(ntoks) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS t0
           FROM tk),
    e AS (SELECT doc_id, ntoks, t0,
                 unnest(range(t0 // {SEQ_LEN}, (t0 + ntoks - 1) // {SEQ_LEN} + 1))
                   AS seq_id
          FROM sp)
    SELECT seq_id, doc_id,
           greatest(t0, seq_id * {SEQ_LEN}) - t0 AS doc_off,
           greatest(t0, seq_id * {SEQ_LEN}) - seq_id * {SEQ_LEN} AS seq_off,
           least(t0 + ntoks, (seq_id + 1) * {SEQ_LEN})
             - greatest(t0, seq_id * {SEQ_LEN}) AS n_tok
    FROM e
    """


# ---------------------------------------------------------------------------
# bpe_pairs — BPE merge-candidate counting. Stage 1 folds corpus token
# instances into (word, count) — map-side-combinable, and Zipfian heavy
# hitters combine map-side so the shuffle carries word TYPES. Stage 2
# explodes character pairs over the vocabulary only (the BPE trick: cost
# O(|vocab| · word_len), independent of corpus size). Final top-k plans
# TakeOrderedAndProject — no global sort. Ties broken (count DESC, pair
# ASC) so the cut is engine-identical.
# ---------------------------------------------------------------------------

TOP_PAIRS = 32


def bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH w AS (SELECT explode(split(text, ' ', -1)) AS word FROM documents),
        wc AS (SELECT word, count(*) AS wcount FROM w GROUP BY word),
        p AS (SELECT substr(word, i, 2) AS pair, wcount
              FROM wc
              LATERAL VIEW explode(sequence(1, length(word) - 1)) t AS i
              WHERE length(word) >= 2)
        SELECT pair, CAST(sum(wcount) AS BIGINT) AS n_occ
        FROM p GROUP BY pair
        ORDER BY n_occ DESC, pair LIMIT {TOP_PAIRS}
        """
    )


def bpe_pairs_oracle() -> str:
    return f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    wc AS (SELECT word, count(*) AS wcount FROM w GROUP BY word),
    p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, wcount
          FROM wc, unnest(range(1, length(word))) AS t(i)
          WHERE length(word) >= 2)
    SELECT pair, CAST(sum(wcount) AS BIGINT) AS n_occ
    FROM p GROUP BY pair
    ORDER BY n_occ DESC, pair LIMIT {TOP_PAIRS}
    """


# ---------------------------------------------------------------------------
# bpe_apply — the APPLY half of BPE, closing the tokenizer loop:
# bpe_pairs learns merge candidates, tokenizer_fertility audits the
# result, this op actually segments the vocabulary with the top-4
# learned merges (Sennrich et al. 2016's encode step). One GENERATION:
# all four merges come from the initial character-pair statistics and
# apply in rank order — full BPE re-counts pairs after every merge,
# which is a learn→apply driver loop over exactly this plan (the
# kmeans_embed iteration contract; one generation keeps the op a single
# differentially-checkable query).
#
# Mechanics: each word type becomes a space-separated symbol string
# (" s p a r k "), and a rank-r merge rewrites " a b " → " ab ".
# String replace scans the SOURCE left-to-right, so one pass merges
# alternating occurrences of a run ("a a a a" → "aa a a"); each merge
# is therefore applied in FOUR passes — enough to reach the fixpoint
# for any word up to 16 symbols (runs halve per pass), pinned by an
# idempotence test (a fifth pass changes nothing). Both engines share
# the same greedy non-overlapping replace semantics, which the
# differential proves.
#
# At 100 TB: the merge table is a 1-row frame (the whitelisted scalar
# cross); segmentation is narrow codegen over word TYPES (the
# bpe_pairs vocabulary trick — cost O(|vocab| · word_len), independent
# of corpus size); the top-k cut plans TakeOrderedAndProject.
# ---------------------------------------------------------------------------

N_MERGES = 4
MERGE_PASSES = 4


def _bpe_apply_sql(wsplit: str, spaced: str, nsyms: str) -> str:
    s = "rep"
    for r in range(1, N_MERGES + 1):
        # coalesce guards the under-populated-vocabulary case: fewer than
        # N_MERGES distinct pairs leaves p{r} NULL, and replace(s, NULL, …)
        # would NULL-poison every segmentation; chr(0) can never occur in
        # the symbol string, so an absent merge becomes a no-op pass
        pat = (
            f"coalesce(concat(' ', substr(p{r}, 1, 1), ' ', "
            f"substr(p{r}, 2, 1), ' '), chr(0))"
        )
        sub = f"coalesce(concat(' ', p{r}, ' '), '')"
        for _ in range(MERGE_PASSES):
            s = f"replace({s}, {pat}, {sub})"
    ranked = ", ".join(
        f"max(CASE WHEN rnk = {r} THEN pair END) AS p{r}"
        for r in range(1, N_MERGES + 1)
    )
    return f"""
    w AS (SELECT {wsplit} AS word FROM documents),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wcount
           FROM w GROUP BY word),
    pr AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, wcount
           FROM wc{{posrange}}
           WHERE length(word) >= 2),
    pc AS (SELECT pair, CAST(sum(wcount) AS BIGINT) AS n_occ
           FROM pr GROUP BY pair
           ORDER BY n_occ DESC, pair LIMIT {N_MERGES}),
    m AS (SELECT {ranked} FROM (
            SELECT pair, row_number() OVER (ORDER BY n_occ DESC, pair)
              AS rnk FROM pc) x),
    seg AS (SELECT word, wcount, trim({s}) AS segmented
            FROM (SELECT word, wcount, {spaced} AS rep FROM wc)
            CROSS JOIN m)
    SELECT word, wcount, segmented,
           CAST(length(word) AS BIGINT) AS n_chars,
           CAST({nsyms} AS BIGINT) AS n_syms
    FROM seg
    ORDER BY wcount DESC, word LIMIT 20
    """


def bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N103: one-generation BPE encode with the top-4 learned merges."""
    _docs(spark, sf_dir)
    sql = _bpe_apply_sql(
        "explode(split(text, ' ', -1))",
        "concat(' ', regexp_replace(word, '(.)', '$1 '))",
        "size(split(segmented, ' ', -1))",
    ).format(
        posrange=" LATERAL VIEW explode(sequence(1, length(word) - 1)) t AS i"
    )
    return spark.sql("WITH " + sql)


def bpe_apply_oracle() -> str:
    sql = _bpe_apply_sql(
        "unnest(string_split(text, ' '))",
        r"concat(' ', regexp_replace(word, '(.)', '\1 ', 'g'))",
        "len(string_split(segmented, ' '))",
    ).format(posrange=", unnest(range(1, length(word))) AS t(i)")
    return "WITH " + sql
