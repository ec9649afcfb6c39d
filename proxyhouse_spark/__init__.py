"""proxyhouse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of recoilme/proxyhouse (reference: /root/reference,
a ~900-LoC Go HTTP proxy that batches ClickHouse inserts).

The engine re-expresses the reference's semantics Spark-first:

- the reference's in-memory ``map[uri]*Buffer`` accumulate-and-flush loop
  (reference main.go:275-299) becomes micro-batch ``groupBy(uri).agg(...)``
  inside Structured Streaming ``foreachBatch``;
- its format-aware row delimiting (main.go:189-197) becomes declarative
  column expressions (see :mod:`proxyhouse_spark.functions.scalars`);
- its errors-directory dead-letter queue (main.go:365-373, 447-485) becomes a
  Parquet DLQ table with a retry-policy predicate;
- beyond the reference surface, the north-star adds the relational operators
  (joins, windows, rollup/grouping sets, set ops) and the LLM-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal columns)
  that a 100 TB training-data pipeline needs.

Everything is DataFrame/SQL-first so Catalyst owns optimization; Pandas UDFs
appear only where no builtin composition exists (multimodal decode plumbing).
"""

__version__ = "0.1.0"
