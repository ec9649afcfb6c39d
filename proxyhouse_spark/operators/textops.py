"""Text-analysis operators (SURVEY §2.11 N3 + north-star text family).

Language-ID, quality scoring, token counting and fingerprinting over the
``documents`` table. Everything is built-in expression math (codegen'd);
at 100 TB these are embarrassingly-parallel narrow projections — no
shuffle except the final stats groupBy on `lang` (5 keys, map-side
combined)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import text as T
from ..tables import table


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: per-language corpus stats."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
               round(avg(CAST({T.TOKEN_WS_SPARK} AS DOUBLE)), 4) AS avg_tokens,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents GROUP BY lang
        """
    )


def text_stats_oracle() -> str:
    return f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars,
           round(avg(CAST({T.TOKEN_WS_DUCK} AS DOUBLE)), 4) AS avg_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
    """


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic (labels vs. ground truth)."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT doc_id, lang, {T.LANG_ID_SPARK} AS pred_lang,
               ({T.LANG_ID_SPARK} = lang) AS is_match
        FROM documents
        """
    )


def lang_id_oracle() -> str:
    return f"""
    SELECT doc_id, lang, {T.LANG_ID_DUCK} AS pred_lang,
           ({T.LANG_ID_DUCK} = lang) AS is_match
    FROM documents
    """


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality pre-filter: length / diversity / token-shape blend."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"SELECT doc_id, {T.QUALITY_SPARK} AS quality FROM documents"
    )


def quality_score_oracle() -> str:
    return f"SELECT doc_id, {T.QUALITY_DUCK} AS quality FROM documents"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT doc_id, CAST({T.TOKEN_WS_SPARK} AS BIGINT) AS n_tokens_ws,
               CAST({T.TOKEN_BPE_SPARK} AS BIGINT) AS n_tokens_bpe
        FROM documents
        """
    )


def token_count_oracle() -> str:
    return f"""
    SELECT doc_id, CAST({T.TOKEN_WS_DUCK} AS BIGINT) AS n_tokens_ws,
           CAST({T.TOKEN_BPE_DUCK} AS BIGINT) AS n_tokens_bpe
    FROM documents
    """


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-4 shingle-hash fingerprint."""
    _docs(spark, sf_dir)
    return spark.sql(
        f"SELECT doc_id, {T.FINGERPRINT_SPARK} AS fingerprint FROM documents"
    )


def doc_fingerprint_oracle() -> str:
    return f"SELECT doc_id, {T.FINGERPRINT_DUCK} AS fingerprint FROM documents"
