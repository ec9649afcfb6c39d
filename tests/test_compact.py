"""Sink-directory compaction: many-small-files -> few files, data intact."""

from pyspark.sql import functions as F

from proxyhouse_spark.sinks.compact import compact_parquet, parquet_file_count


def test_compact_bin_packs_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "sink")
    # simulate 40 micro-batch appends of a few rows each
    for batch in range(40):
        spark.range(batch * 5, batch * 5 + 5).withColumn(
            "uri", F.concat(F.lit("/t"), (F.col("id") % 3).cast("string"))
        ).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path).orderBy("id").collect()
    assert parquet_file_count(path) >= 40

    stats = compact_parquet(spark, path, target_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1
    assert stats["rows"] == 200
    after = spark.read.parquet(path).orderBy("id").collect()
    assert after == before


def test_compact_is_noop_when_already_packed(spark, tmp_path):
    path = str(tmp_path / "packed")
    spark.range(100).coalesce(1).write.parquet(path)
    stats = compact_parquet(spark, path)
    assert stats["files_before"] == stats["files_after"] == 1
