"""Dedup/similarity test corpora (SURVEY §2.11).

The fixture ``documents``/``embeddings`` tables contain no duplicates (the
driver generates them IID), so the dedup and near-dup operators would pass
vacuously. A real training-data pipeline dedups a corpus that *does*
contain copies; this module injects deterministic ones:

- exact text copies      (doc_id % 10 == 0 → doc_id + 1_000_000)
- near copies            (doc_id % 10 == 5 → doc_id + 2_000_000,
                          first token dropped: high-but-<1 Jaccard)
- near-duplicate vectors (vec_id % 25 == 0 → vec_id + 1_000_000,
                          first component shifted by +0.05: cosine ≈ 0.99)

Both corpora are defined as SQL usable verbatim in Spark (over registered
temp views) and in DuckDB (over the pre-registered fixture views), keeping
the differential oracle exact. Vector arithmetic is done in DOUBLE on both
sides (exact float→double widening).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

# Portable (identical in Spark SQL and DuckDB).
DOC_CORPUS_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + 2000000 AS doc_id,
       substr(text, instr(text, ' ') + 1) AS text,
       lang, source,
       CAST(n_chars - instr(text, ' ') AS BIGINT) AS n_chars
FROM documents WHERE doc_id % 10 = 5
"""

# Dialect-specific (array constructors / casts differ).
EMB_CORPUS_SPARK = """
SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS e FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id, label,
       concat(array(element_at(CAST(embedding AS ARRAY<DOUBLE>), 1) + 0.05),
              slice(CAST(embedding AS ARRAY<DOUBLE>), 2, 63)) AS e
FROM embeddings WHERE vec_id % 25 = 0
"""

EMB_CORPUS_DUCK = """
SELECT vec_id, label, e FROM
  (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
   FROM embeddings)
UNION ALL
SELECT vec_id + 1000000 AS vec_id, label,
       list_concat([e[1] + 0.05], e[2:64]) AS e FROM
  (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
   FROM embeddings WHERE vec_id % 25 = 0)
"""


def doc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(DOC_CORPUS_SQL)


def emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(EMB_CORPUS_SPARK)
