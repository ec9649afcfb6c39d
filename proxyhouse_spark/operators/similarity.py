"""Similarity search over embeddings (SURVEY §2.11 N2).

- ``knn_cosine``: brute-force cosine top-k — the correctness baseline.
  The probe is a single broadcast row (cross join with a 1-row frame: no
  driver collect, no shuffle of the big side); scoring is built-in
  higher-order array math inside whole-stage codegen.
- ``knn_lsh``: the scale path — sign-LSH over 8 deterministic hyperplanes
  buckets the corpus (256 buckets); the probe scans only its own bucket.
  At 100 TB the bucket id is the partition/cluster key: candidate
  generation becomes a partition-pruned scan instead of a full pass, at
  the cost of recall (multi-probe = also scan Hamming-adjacent buckets;
  not needed at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import vectors as V
from ..sources.corpus import EMB_CORPUS_DUCK, emb_corpus

PROBE_VEC_ID = 0
K = 10


def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb_corpus(spark, sf_dir).createOrReplaceTempView("embc")
    cos = V.cosine_spark("c.e", "p.e")
    return spark.sql(
        f"""
        SELECT c.vec_id, c.label, round({cos}, 6) AS cos_sim
        FROM embc c CROSS JOIN (SELECT e FROM embc WHERE vec_id = {PROBE_VEC_ID}) p
        WHERE c.vec_id <> {PROBE_VEC_ID}
        ORDER BY cos_sim DESC, c.vec_id
        LIMIT {K}
        """
    )


def knn_cosine_oracle() -> str:
    cos = V.cosine_duck("c.e", "p.e")
    return f"""
    WITH embc AS ({EMB_CORPUS_DUCK})
    SELECT c.vec_id, c.label, round({cos}, 6) AS cos_sim
    FROM embc c CROSS JOIN (SELECT e FROM embc WHERE vec_id = {PROBE_VEC_ID}) p
    WHERE c.vec_id <> {PROBE_VEC_ID}
    ORDER BY cos_sim DESC, c.vec_id
    LIMIT {K}
    """


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb_corpus(spark, sf_dir).createOrReplaceTempView("embc")
    bucket = V.lsh_bucket_spark("e")
    cos = V.cosine_spark("c.e", "p.e")
    return spark.sql(
        f"""
        WITH b AS (SELECT vec_id, label, e, {bucket} AS bucket FROM embc)
        SELECT c.vec_id, c.label, c.bucket, round({cos}, 6) AS cos_sim
        FROM b c JOIN (SELECT e, bucket FROM b WHERE vec_id = {PROBE_VEC_ID}) p
          ON c.bucket = p.bucket
        WHERE c.vec_id <> {PROBE_VEC_ID}
        ORDER BY cos_sim DESC, c.vec_id
        LIMIT {K}
        """
    )


def knn_lsh_oracle() -> str:
    bucket = V.lsh_bucket_duck("e")
    cos = V.cosine_duck("c.e", "p.e")
    return f"""
    WITH embc AS ({EMB_CORPUS_DUCK}),
    b AS (SELECT vec_id, label, e, {bucket} AS bucket FROM embc)
    SELECT c.vec_id, c.label, c.bucket, round({cos}, 6) AS cos_sim
    FROM b c JOIN (SELECT e, bucket FROM b WHERE vec_id = {PROBE_VEC_ID}) p
      ON c.bucket = p.bucket
    WHERE c.vec_id <> {PROBE_VEC_ID}
    ORDER BY cos_sim DESC, c.vec_id
    LIMIT {K}
    """
