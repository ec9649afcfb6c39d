"""Phase-level wall attribution for q_stream_minhash / q_stream_kmeans.

Replays the query's exact structure with perf_counter brackets around
each phase (source writes, each availableNow pass, final read) and a
job-start listener counting jobs per phase — the r10 finding was that
the two foreachBatch merges are ~85% of q_stream_minhash's wall; this
tool re-measures that split so round-11 work targets the real cost.

Usage: python tools/stream_probe.py [minhash|kmeans] [reps]
Prints one line per phase per rep: phase, wall seconds; then a summary.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from proxyhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe_minhash(spark):
    from proxyhouse_spark.operators.cdc import _merge_minhash
    from proxyhouse_spark.sources.corpus import doc_corpus
    from proxyhouse_spark.streaming.pipeline import (
        _await_or_raise,
        _oracle_stream_conf,
        _scratch_dir,
    )

    phases = {}

    def mark(name, t0):
        phases[name] = phases.get(name, 0.0) + (time.perf_counter() - t0)

    def timed_merge(spark, df, base, bid):
        t0 = time.perf_counter()
        _merge_minhash(spark, df, base, bid)
        mark(f"merge_{bid}", t0)

    @_oracle_stream_conf
    def run(spark, sf_dir):
        base = _scratch_dir("probe_mh_")
        src = os.path.join(base, "source")
        ckpt = os.path.join(base, "ckpt")
        corpus = doc_corpus(spark, sf_dir).select("doc_id", "text")
        t0 = time.perf_counter()
        corpus.filter("doc_id % 2 = 0").coalesce(1).write.parquet(src)
        mark("src_write_1", t0)

        def one_pass():
            stream = spark.readStream.schema(
                "doc_id bigint, text string"
            ).parquet(src)
            return (
                stream.writeStream.trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda df, bid: timed_merge(spark, df, base, bid)
                )
                .start()
            )

        t0 = time.perf_counter()
        _await_or_raise(one_pass())
        mark("pass_1", t0)
        t0 = time.perf_counter()
        corpus.filter("doc_id % 2 = 1").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        mark("src_write_2", t0)
        t0 = time.perf_counter()
        _await_or_raise(one_pass())
        mark("pass_2", t0)
        t0 = time.perf_counter()
        (
            spark.read.parquet(os.path.join(base, "pairs"))
            .dropDuplicates(["doc_a", "doc_b"])
            .select("doc_a", "doc_b", "jaccard")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        mark("final_read", t0)
        return phases

    return run(spark, SF_DIR)


def probe_kmeans(spark):
    from proxyhouse_spark.operators.clustering import K, _merge_kmeans
    from proxyhouse_spark.operators.clustering import _EMB_PLAIN_SPARK
    from proxyhouse_spark.streaming.pipeline import (
        _await_or_raise,
        _oracle_stream_conf,
        _scratch_dir,
    )
    from proxyhouse_spark.tables import table

    phases = {}

    def mark(name, t0):
        phases[name] = phases.get(name, 0.0) + (time.perf_counter() - t0)

    @_oracle_stream_conf
    def run(spark, sf_dir):
        base = _scratch_dir("probe_km_")
        src = os.path.join(base, "source")
        cent = os.path.join(base, "quantizer")
        snap = os.path.join(base, "partials")
        ckpt = os.path.join(base, "ckpt")
        t0 = time.perf_counter()
        table(spark, sf_dir, "embeddings").createOrReplaceTempView(
            "embeddings"
        )
        corpus = spark.sql(_EMB_PLAIN_SPARK)
        corpus.filter(f"vec_id < {K}").selectExpr(
            "CAST(vec_id AS INT) AS c", "e AS ce"
        ).coalesce(1).write.parquet(cent)
        mark("cent_write", t0)
        t0 = time.perf_counter()
        corpus.filter("vec_id % 2 = 0").coalesce(1).write.parquet(src)
        mark("src_write_1", t0)

        def one_pass():
            stream = spark.readStream.schema(
                "vec_id bigint, e array<double>"
            ).parquet(src)
            return (
                stream.writeStream.trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda df, bid: _merge_kmeans(df, cent, snap, bid)
                )
                .start()
            )

        t0 = time.perf_counter()
        _await_or_raise(one_pass())
        mark("pass_1", t0)
        t0 = time.perf_counter()
        corpus.filter("vec_id % 2 = 1").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        mark("src_write_2", t0)
        t0 = time.perf_counter()
        _await_or_raise(one_pass())
        mark("pass_2", t0)
        t0 = time.perf_counter()
        from proxyhouse_spark import registry

        # final read: run the registered query's read-side SQL by calling
        # the full query would redo passes; instead reproduce the report
        spark.read.parquet(snap).createOrReplaceTempView("km_partials")
        spark.sql(
            "SELECT c, pos, CAST(sum(n) AS BIGINT) AS n, "
            "CAST(sum(s) AS BIGINT) AS s FROM km_partials GROUP BY c, pos"
        ).write.format("noop").mode("overwrite").save()
        mark("final_read_partials_only", t0)
        return phases

    return run(spark, SF_DIR)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    fn = probe_minhash if which == "minhash" else probe_kmeans
    fn(spark)  # warmup
    acc: dict[str, list[float]] = {}
    for i in range(reps):
        t0 = time.perf_counter()
        phases = fn(spark)
        total = time.perf_counter() - t0
        for k, v in phases.items():
            acc.setdefault(k, []).append(v)
        acc.setdefault("TOTAL", []).append(total)
        print(
            f"rep {i}: total {total:.3f}  "
            + "  ".join(f"{k}={v:.3f}" for k, v in phases.items())
        )
    print("--- medians ---")
    for k, vs in acc.items():
        vs = sorted(vs)
        print(f"{k}: {vs[len(vs) // 2]:.3f}")


if __name__ == "__main__":
    main()
