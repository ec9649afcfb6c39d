"""Training-data pipeline operators over ``documents`` (SURVEY §2.11 ext).

The operations a large-scale LLM training-data pipeline runs between raw
crawl and tokenizer, beyond dedup/similarity (operators/dedup.py,
operators/similarity.py):

- ``doc_chunk``     — fixed-size token windows with stride/overlap (the
                      pre-tokenization chunking pass)
- ``hash_split``    — deterministic train/val/test assignment by content
                      hash (reproducible across engines and runs; no RNG)
- ``dedup_url``     — URL-level dedup: one canonical doc per ``source``
                      (keep the longest), over the injected-dup corpus
- ``ngram_stats``   — corpus-level top-k bigram counts (tokenizer/quality
                      diagnostics)
- ``length_filter`` — C4-style per-doc filter verdicts (too_short /
                      too_long / non_en / keep)

All are built-in expressions (whole-stage codegen) and differentially
tested against DuckDB. Tokens are materialized once per doc
(functions/text.py contract). Scale notes per op in docstrings.

Reference parity note: the reference proxy (see /root/reference/main.go)
has no document operators at all — this family is the north-star surface
mandated by BASELINE.json, not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.corpus import DOC_CORPUS_SQL, doc_corpus
from ..tables import table

# Chunking geometry: 32-token windows, stride 24 (8-token overlap).
CHUNK = 32
STRIDE = 24

_N_CHUNKS = (
    "CASE WHEN {ntoks} <= {chunk} THEN 1 "
    "ELSE CAST(ceil(({ntoks} - {chunk}) / {stride}.0) AS INT) + 1 END"
)


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# doc_chunk — one row per (doc, window). Narrow map + generate: no shuffle
# at all; at 100 TB this is the ideal embarrassingly-parallel pass (output
# partitioning inherits input file splits).
# ---------------------------------------------------------------------------


def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    n_chunks = _N_CHUNKS.format(ntoks="ntoks", chunk=CHUNK, stride=STRIDE)
    return spark.sql(
        f"""
        WITH tk AS (SELECT doc_id, split(text, ' ', -1) AS toks FROM documents),
        n AS (SELECT doc_id, toks, size(toks) AS ntoks FROM tk),
        c AS (SELECT doc_id, toks, {n_chunks} AS n_chunks FROM n)
        SELECT doc_id, chunk_id,
               CAST(size(slice(toks, chunk_id * {STRIDE} + 1, {CHUNK})) AS BIGINT)
                 AS chunk_tokens,
               concat_ws(' ', slice(toks, chunk_id * {STRIDE} + 1, {CHUNK})) AS chunk_text
        FROM c LATERAL VIEW explode(sequence(0, n_chunks - 1)) t AS chunk_id
        """
    )


def doc_chunk_oracle() -> str:
    n_chunks = _N_CHUNKS.format(ntoks="ntoks", chunk=CHUNK, stride=STRIDE)
    lo = f"chunk_id * {STRIDE} + 1"
    hi = f"chunk_id * {STRIDE} + {CHUNK}"
    return f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    n AS (SELECT doc_id, toks, len(toks) AS ntoks FROM tk),
    c AS (SELECT doc_id, toks, {n_chunks} AS n_chunks FROM n),
    e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c)
    SELECT doc_id, chunk_id,
           CAST(len(toks[{lo}:{hi}]) AS BIGINT) AS chunk_tokens,
           array_to_string(toks[{lo}:{hi}], ' ') AS chunk_text
    FROM e
    """


# ---------------------------------------------------------------------------
# hash_split — md5-keyed assignment compared as HEX STRINGS (portable: no
# hex→int conversion exists in both engines). First hex char: 0..c → train
# (13/16), d..e → val (2/16), f → test (1/16). Deterministic, stable under
# re-partitioning/re-runs — the property a training pipeline actually needs.
# ---------------------------------------------------------------------------

_SPLIT_CASE = (
    "CASE WHEN h < 'd' THEN 'train' WHEN h < 'f' THEN 'val' ELSE 'test' END"
)


def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH h AS (SELECT n_chars,
                          substr(md5(CAST(doc_id AS STRING)), 1, 1) AS h
                   FROM documents)
        SELECT {_SPLIT_CASE} AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM h GROUP BY 1
        """
    )


def hash_split_oracle() -> str:
    return f"""
    WITH h AS (SELECT n_chars,
                      substr(md5(CAST(doc_id AS STRING)), 1, 1) AS h
               FROM documents)
    SELECT {_SPLIT_CASE} AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM h GROUP BY 1
    """


# ---------------------------------------------------------------------------
# dedup_url — canonical doc per source (URL-level dedup: keep the longest).
# Window over partition key = one shuffle on `source`; at 100 TB this is the
# standard "group by url, argmax" pass — skewed hot URLs are absorbed by
# AQE skew-split since row_number only needs partition-local order.
# Runs over the injected-duplicate corpus (sources/corpus.py) where copies
# share their source.
# ---------------------------------------------------------------------------

_DEDUP_URL_SQL = """
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
  FROM corpus)
SELECT source, doc_id AS canonical_doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE rn = 1
"""


def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_corpus(spark, sf_dir).createOrReplaceTempView("corpus")
    return spark.sql(f"WITH {_DEDUP_URL_SQL}")


def dedup_url_oracle() -> str:
    return f"WITH corpus AS ({DOC_CORPUS_SQL}), {_DEDUP_URL_SQL}"


# ---------------------------------------------------------------------------
# ngram_stats — top-20 bigrams by count. Generate (narrow) → partial
# hash-agg map-side → single shuffle on bigram → TakeOrdered. The partial
# agg collapses the per-partition bigram multiset before shuffling, so
# shuffle volume is O(distinct bigrams), not O(tokens) — the property that
# keeps this viable at 100 TB.
# ---------------------------------------------------------------------------


def ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        """
        WITH tk AS (SELECT split(text, ' ', -1) AS toks FROM documents),
        bg AS (SELECT explode(transform(sequence(1, size(toks) - 1), i ->
                 concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))) AS bigram
               FROM tk WHERE size(toks) >= 2)
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
        """
    )


def ngram_stats_oracle() -> str:
    return """
    WITH tk AS (SELECT string_split(text, ' ') AS toks FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, len(toks)), i ->
             toks[i] || ' ' || toks[i + 1])) AS bigram
           FROM tk WHERE len(toks) >= 2)
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """


# ---------------------------------------------------------------------------
# length_filter — C4-style per-doc verdicts. Pure narrow projection (no
# shuffle); the funnel report is a trivial follow-up groupBy for the caller.
# ---------------------------------------------------------------------------

MIN_TOKENS = 20
MAX_TOKENS = 80

_VERDICT = (
    f"CASE WHEN ntoks < {MIN_TOKENS} THEN 'too_short' "
    f"WHEN ntoks > {MAX_TOKENS} THEN 'too_long' "
    "WHEN lang <> 'en' THEN 'non_en' ELSE 'keep' END"
)


def length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH tk AS (SELECT doc_id, lang, split(text, ' ', -1) AS toks FROM documents),
        n AS (SELECT doc_id, lang, size(toks) AS ntoks FROM tk)
        SELECT doc_id, CAST(ntoks AS BIGINT) AS n_tokens, {_VERDICT} AS verdict
        FROM n
        """
    )


def length_filter_oracle() -> str:
    return f"""
    WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    n AS (SELECT doc_id, lang, len(toks) AS ntoks FROM tk)
    SELECT doc_id, CAST(ntoks AS BIGINT) AS n_tokens, {_VERDICT} AS verdict
    FROM n
    """


# ---------------------------------------------------------------------------
# chunk_dedup — corpus-GLOBAL exact dedup of token chunks (the boilerplate-
# removal pass: a chunk appearing in many docs survives only at its first
# (doc_id, chunk_id) occurrence). One shuffle, partitioned by md5(chunk) —
# a uniform key by construction, so no skew at any corpus size; the window
# only ranks within single-hash groups (tiny), never sorts the corpus.
# The chunk geometry is doc_chunk's (CHUNK/STRIDE) — dedup composes on the
# same pass a tokenizer pipeline already runs.
# ---------------------------------------------------------------------------


def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    chunks = doc_chunk(spark, sf_dir)
    w = Window.partitionBy(F.md5("chunk_text")).orderBy("doc_id", "chunk_id")
    return (
        chunks.withColumn("rn", F.row_number().over(w))
        .select("doc_id", "chunk_id", (F.col("rn") == 1).alias("kept"))
    )


def chunk_dedup_oracle() -> str:
    return f"""
    WITH chunks AS ({doc_chunk_oracle()}),
    r AS (SELECT doc_id, chunk_id,
                 row_number() OVER (PARTITION BY md5(chunk_text)
                                    ORDER BY doc_id, chunk_id) AS rn
          FROM chunks)
    SELECT doc_id, chunk_id, rn = 1 AS kept FROM r
    """


# ---------------------------------------------------------------------------
# corpus_pipeline — the composed end-to-end preprocessing job: normalize →
# quality gate → exact dedup (keep min doc_id per normalized hash) → chunk
# → deterministic split. One DAG, ONE shuffle (the dedup window on the
# 16-byte normalized hash); everything else is narrow projections and a
# generate. This is the query a training-data run actually submits — the
# individual operators (q_text_normalize, q_quality_score, q_dedup_exact,
# q_doc_chunk, q_hash_split) are its unit-tested pieces.
#
# Scale (100 TB): the single shuffle moves (hash, doc_id) pairs only; the
# chunk explode inherits file-split partitioning; quality and split are
# integer/hash arithmetic. Output is (doc, chunk) grain with the chunk
# PAYLOAD as md5 — the narrow manifest shape a tokenizer fleet consumes.
# ---------------------------------------------------------------------------

QUALITY_GATE_BP = 5800  # keeps ~80% of the injected-dup corpus

# Spark regexp_replace replaces all matches; DuckDB needs the 'g' option to
# do the same (first-match-only by default). Keep both spellings in sync.
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''), "
    "'  +', ' '))"
)
_NORM_DUCK = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), "
    "'  +', ' ', 'g'))"
)


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_corpus(spark, sf_dir).createOrReplaceTempView("corpus")
    from ..functions import text as T

    n_chunks = _N_CHUNKS.format(ntoks="ntoks", chunk=CHUNK, stride=STRIDE)
    return spark.sql(
        f"""
        WITH tk AS (SELECT doc_id, text, split(text, ' ', -1) AS toks FROM corpus),
        q AS (SELECT doc_id, text, toks FROM tk
              WHERE {T.quality_spark()} >= {QUALITY_GATE_BP}),
        n AS (SELECT doc_id, toks, md5({_NORM}) AS h FROM q),
        k AS (SELECT doc_id, toks,
                     row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
              FROM n),
        keep AS (SELECT doc_id, toks, size(toks) AS ntoks FROM k WHERE rn = 1),
        c AS (SELECT doc_id, toks, {n_chunks} AS n_chunks FROM keep)
        SELECT doc_id, chunk_id,
               CAST(size(slice(toks, chunk_id * {STRIDE} + 1, {CHUNK})) AS BIGINT)
                 AS chunk_tokens,
               md5(concat_ws(' ', slice(toks, chunk_id * {STRIDE} + 1, {CHUNK})))
                 AS chunk_md5,
               {_SPLIT_CASE.replace("h <", "substr(md5(CAST(doc_id AS STRING)), 1, 1) <")}
                 AS split
        FROM c LATERAL VIEW explode(sequence(0, n_chunks - 1)) t AS chunk_id
        """
    )


def corpus_pipeline_oracle() -> str:
    from ..functions import text as T

    n_chunks = _N_CHUNKS.format(ntoks="ntoks", chunk=CHUNK, stride=STRIDE)
    lo = f"chunk_id * {STRIDE} + 1"
    hi = f"chunk_id * {STRIDE} + {CHUNK}"
    return f"""
    WITH corpus AS ({DOC_CORPUS_SQL}),
    tk AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM corpus),
    q AS (SELECT doc_id, text, toks FROM tk
          WHERE {T.quality_duck()} >= {QUALITY_GATE_BP}),
    n AS (SELECT doc_id, toks, md5({_NORM_DUCK}) AS h FROM q),
    k AS (SELECT doc_id, toks,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
          FROM n),
    keep AS (SELECT doc_id, toks, len(toks) AS ntoks FROM k WHERE rn = 1),
    c AS (SELECT doc_id, toks, {n_chunks} AS n_chunks FROM keep),
    e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id FROM c)
    SELECT doc_id, chunk_id,
           CAST(len(toks[{lo}:{hi}]) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(toks[{lo}:{hi}], ' ')) AS chunk_md5,
           {_SPLIT_CASE.replace("h <", "substr(md5(CAST(doc_id AS STRING)), 1, 1) <")}
             AS split
    FROM e
    """


# ---------------------------------------------------------------------------
# sequence_pack — chunks → fixed-length training sequences (the step between
# chunking and the trainer). Greedy concatenation packing: within a shard,
# chunks are laid end-to-end in deterministic (doc_id, chunk_id) order and a
# chunk's sequence is floor(tokens_before / SEQ_LEN); a chunk may straddle a
# sequence boundary (the trainer slices), which is exactly what makes the
# layout computable as a running sum instead of a serial first-fit bin-pack.
#
# Scale (100 TB): ONE shuffle (hash by shard), then a partitioned window —
# no global ordering bottleneck. The shard count is the parallelism knob
# (8 here so sf0.001 still exercises multi-row shards; thousands in
# production — each shard's packing is independent by construction).
# Integer-only arithmetic → bit-exact across engines.
# ---------------------------------------------------------------------------

SEQ_LEN = 128  # tokens per packed training sequence
N_PACK_SHARDS = 8


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    n_chunks = _N_CHUNKS.format(ntoks="ntoks", chunk=CHUNK, stride=STRIDE)
    return spark.sql(
        f"""
        WITH tk AS (SELECT doc_id, size(split(text, ' ', -1)) AS ntoks
                    FROM documents),
        c AS (SELECT doc_id, ntoks, {n_chunks} AS n_chunks FROM tk),
        e AS (SELECT doc_id, ntoks, chunk_id,
                     CAST(least({CHUNK}, ntoks - chunk_id * {STRIDE}) AS BIGINT)
                       AS chunk_tokens
              FROM c LATERAL VIEW explode(sequence(0, n_chunks - 1)) t AS chunk_id),
        w AS (SELECT doc_id % {N_PACK_SHARDS} AS shard, doc_id, chunk_id,
                     chunk_tokens,
                     coalesce(sum(chunk_tokens) OVER (
                         PARTITION BY doc_id % {N_PACK_SHARDS}
                         ORDER BY doc_id, chunk_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS tokens_before
              FROM e)
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(tokens_before DIV {SEQ_LEN} AS BIGINT) AS seq_id,
               doc_id, chunk_id, chunk_tokens,
               CAST(tokens_before % {SEQ_LEN} AS BIGINT) AS seq_offset
        FROM w
        """
    )


def sequence_pack_oracle() -> str:
    n_chunks = _N_CHUNKS.format(ntoks="ntoks", chunk=CHUNK, stride=STRIDE)
    return f"""
    WITH tk AS (SELECT doc_id, len(string_split(text, ' ')) AS ntoks
                FROM documents),
    c AS (SELECT doc_id, ntoks, {n_chunks} AS n_chunks FROM tk),
    e AS (SELECT doc_id, ntoks, unnest(range(0, n_chunks)) AS chunk_id FROM c),
    e2 AS (SELECT doc_id, chunk_id,
                  CAST(least({CHUNK}, ntoks - chunk_id * {STRIDE}) AS BIGINT)
                    AS chunk_tokens
           FROM e),
    w AS (SELECT doc_id % {N_PACK_SHARDS} AS shard, doc_id, chunk_id,
                 chunk_tokens,
                 coalesce(sum(chunk_tokens) OVER (
                     PARTITION BY doc_id % {N_PACK_SHARDS}
                     ORDER BY doc_id, chunk_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS tokens_before
          FROM e2)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(tokens_before // {SEQ_LEN} AS BIGINT) AS seq_id,
           doc_id, chunk_id, chunk_tokens,
           CAST(tokens_before % {SEQ_LEN} AS BIGINT) AS seq_offset
    FROM w
    """


# ---------------------------------------------------------------------------
# span_corruption — T5-style span-corruption manifest ("Exploring the
# Limits of Transfer Learning…", Raffel et al. 2020 §3.1.4: mask ~15% of
# tokens in length-3 spans). A denoising-pretraining data pipeline emits
# this manifest (doc, span offsets, masked text) for the tokenizer fleet;
# the spans must be DETERMINISTIC so re-runs and shard-retries mask the
# same positions — RNG is replaced by md5 arithmetic on (doc_id, span
# index), the same derivation discipline as q_hash_split. n_spans =
# floor(n_tokens/20) ≈ 15%/span_len=3 of the doc; spans may overlap (the
# reference T5 code prevents overlap with a running sampler — documented
# simplification, identical in both engines). Narrow: explode is bounded
# by the 15% mask budget, no shuffle at all.
# ---------------------------------------------------------------------------

SPAN_LEN = 3


def _span_sql(
    toks: str, size_fn: str, md5int: str, explode_spans: str, join_fn: str
) -> str:
    return f"""
    WITH tk AS (
      SELECT doc_id, {toks} AS toks, CAST({size_fn}({toks}) AS BIGINT) AS n
      FROM documents),
    spans AS (
      SELECT doc_id, n, CAST(floor(n / 20) AS BIGINT) AS n_spans, {explode_spans} AS i
      FROM tk WHERE n >= 20),
    placed AS (
      SELECT doc_id, n, n_spans, i,
             1 + ({md5int} % (n - {SPAN_LEN} + 1)) AS start
      FROM spans)
    SELECT doc_id, CAST(i AS BIGINT) AS span_idx, CAST(start AS BIGINT) AS start,
           n_spans, {join_fn} AS masked_text
    FROM placed p JOIN tk USING (doc_id)
    """


def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    md5int = (
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '#', "
        "CAST(i AS STRING))), 1, 14), 16, 10) AS BIGINT)"
    )
    return spark.sql(
        _span_sql(
            "split(text, ' ', -1)",
            "size",
            md5int,
            "explode(sequence(0, CAST(floor(n / 20) AS BIGINT) - 1))",
            f"array_join(slice(tk.toks, CAST(start AS INT), {SPAN_LEN}), ' ')",
        )
    )


def span_corruption_oracle() -> str:
    md5int = (
        "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#', "
        "CAST(i AS VARCHAR))), 1, 14)) AS BIGINT)"
    )
    return _span_sql(
        "string_split(text, ' ')",
        "len",
        md5int,
        "unnest(range(0, CAST(floor(n / 20) AS BIGINT)))",
        f"array_to_string(list_slice(tk.toks, start, start + {SPAN_LEN} - 1), ' ')",
    )
