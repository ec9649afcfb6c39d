"""Deduplication operators (SURVEY §2.11 N1/N4 + north-star dedup family).

Five dedup strategies over the injected-duplicate corpus
(sources/corpus.py), each Spark-first:

- exact:        hash-groupBy on md5(normalized text) — one shuffle on the
                hash, map-side partial agg; at 100 TB this is the cheapest
                possible dedup (the hash is 16 bytes/row into the shuffle).
- minhash LSH:  shingle → 8 md5-minhashes → 2 bands of 4 → band-key
                equi-join → exact Jaccard verify. The band join is the
                scale path: candidate generation is an equi-join on the
                band key (no all-pairs); hot buckets are bounded by the
                band width and can be salted/capped if a degenerate key
                appears.
- n-gram Jaccard: direct pairwise verify on known candidate pairs
                (array_intersect/array_union set arithmetic).
- SimHash:      16-bit md5-derived sign fingerprint; near-dups = Hamming
                distance <= 3 via bit_count(xor) within a blocking key.
- embedding cosine: same-label blocking join + cosine >= 0.9.

All signatures are md5-derived — deterministic, engine-independent, no
MLlib randomness — so every operator here is differentially testable
against DuckDB. (MLlib's MinHashLSH would tie signatures to JVM random
seeds and murmur3; re-expressing the sketch in portable expressions keeps
the oracle exact and the hot path in whole-stage codegen.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import text as T
from ..functions import vectors as V
from ..sources.corpus import DOC_CORPUS_SQL, doc_corpus, emb_corpus


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1: exact dedup by normalized-text hash; keeper = min doc_id."""
    doc_corpus(spark, sf_dir).createOrReplaceTempView("corpus")
    return spark.sql(
        """
        SELECT md5(trim(text)) AS h,
               CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM corpus GROUP BY 1
        """
    )


def dedup_exact_oracle() -> str:
    return f"""
    WITH corpus AS ({DOC_CORPUS_SQL})
    SELECT md5(trim(text)) AS h,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM corpus GROUP BY 1
    """


def _sig_cols(dialect: str) -> str:
    mk = T.minhash_spark if dialect == "spark" else T.minhash_duck
    return ", ".join(f"{mk(s)} AS m{s}" for s in range(T.N_HASHES))


def minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: MinHash-LSH near-duplicate pairs with exact-Jaccard verification."""
    doc_corpus(spark, sf_dir).createOrReplaceTempView("corpus")
    return spark.sql(
        f"""
        WITH sh AS (SELECT doc_id, {T.SHINGLES_SPARK} AS sh FROM corpus),
        sig AS (SELECT doc_id, sh, {_sig_cols('spark')} FROM sh),
        bands AS (
          SELECT doc_id, {T.band_key_spark(0)} AS band_key, 0 AS band FROM sig
          UNION ALL
          SELECT doc_id, {T.band_key_spark(1)} AS band_key, 1 AS band FROM sig),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_key = b.band_key AND a.band = b.band AND a.doc_id < b.doc_id),
        j AS (
          SELECT p.doc_a, p.doc_b,
                 CAST(size(array_intersect(x.sh, y.sh)) AS DOUBLE)
                 / size(array_union(x.sh, y.sh)) AS jac
          FROM pairs p JOIN sh x ON x.doc_id = p.doc_a
                       JOIN sh y ON y.doc_id = p.doc_b)
        SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.6
        """
    )


def minhash_neardup_oracle() -> str:
    return f"""
    WITH corpus AS ({DOC_CORPUS_SQL}),
    sh AS (SELECT doc_id, {T.SHINGLES_DUCK} AS sh FROM corpus),
    sig AS (SELECT doc_id, sh, {_sig_cols('duck')} FROM sh),
    bands AS (
      SELECT doc_id, {T.band_key_spark(0)} AS band_key, 0 AS band FROM sig
      UNION ALL
      SELECT doc_id, {T.band_key_spark(1)} AS band_key, 1 AS band FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.band = b.band AND a.doc_id < b.doc_id),
    j AS (
      SELECT p.doc_a, p.doc_b,
             CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
      FROM pairs p JOIN sh x ON x.doc_id = p.doc_a
                   JOIN sh y ON y.doc_id = p.doc_b)
    SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.6
    """


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard verify on the known near-copy pairs (d, d+2M)."""
    doc_corpus(spark, sf_dir).createOrReplaceTempView("corpus")
    return spark.sql(
        f"""
        WITH sh AS (SELECT doc_id, {T.SHINGLES_SPARK} AS sh FROM corpus)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE)
                     / size(array_union(a.sh, b.sh)), 4) AS jaccard
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 2000000
        """
    )


def ngram_jaccard_oracle() -> str:
    return f"""
    WITH corpus AS ({DOC_CORPUS_SQL}),
    sh AS (SELECT doc_id, {T.SHINGLES_DUCK} AS sh FROM corpus)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 2000000
    """


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-bit SimHash fingerprint."""
    doc_corpus(spark, sf_dir).createOrReplaceTempView("corpus")
    return spark.sql(
        f"SELECT doc_id, {T.SIMHASH_SPARK} AS simhash FROM corpus"
    )


def simhash_oracle() -> str:
    return f"""
    WITH corpus AS ({DOC_CORPUS_SQL})
    SELECT doc_id, {T.SIMHASH_DUCK} AS simhash FROM corpus
    """


def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups: Hamming(a, b) <= 3, blocked by lang."""
    doc_corpus(spark, sf_dir).createOrReplaceTempView("corpus")
    return spark.sql(
        f"""
        WITH s AS (SELECT doc_id, lang, {T.SIMHASH_SPARK} AS sim FROM corpus)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(a.sim ^ b.sim) AS INT) AS hamming
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE bit_count(a.sim ^ b.sim) <= 3
        """
    )


def simhash_neardup_oracle() -> str:
    return f"""
    WITH corpus AS ({DOC_CORPUS_SQL}),
    s AS (SELECT doc_id, lang, {T.SIMHASH_DUCK} AS sim FROM corpus)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (same-label blocking, cos >= 0.9).

    At 100 TB the label join IS the blocking strategy (cluster id / shard
    key); all-pairs within a block is quadratic in block size, so blocks
    must be bounded — LSH bucketing (q_knn_lsh) is the unbounded-scale
    alternative."""
    emb_corpus(spark, sf_dir).createOrReplaceTempView("embc")
    cos = V.cosine_spark("a.e", "b.e")
    return spark.sql(
        f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               round({cos}, 4) AS cos_sim
        FROM embc a JOIN embc b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {cos} >= 0.9
        """
    )


def embedding_neardup_oracle() -> str:
    from ..sources.corpus import EMB_CORPUS_DUCK

    cos = V.cosine_duck("a.e", "b.e")
    return f"""
    WITH embc AS ({EMB_CORPUS_DUCK})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round({cos}, 4) AS cos_sim
    FROM embc a JOIN embc b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {cos} >= 0.9
    """
