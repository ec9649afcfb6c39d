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
- ``knn_ivf``: IVF-style multi-probe — a coarse 16-cell quantizer (first
  4 LSH planes); the probe list is the query's cell plus its 4 Hamming-1
  neighbors, EXPLODED into rows and equi-joined on the cell id, so the
  candidate scan is a broadcast hash join that partition-prunes when the
  corpus is stored partitioned by cell — the IVF inverted-list shape.
- ``embedding_stats``: per-label centroid norms via posexplode → per-dim
  avg → fold; a two-shuffle dimension-parallel reduction whose state is
  O(labels × dim), independent of corpus size.
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


# ---------------------------------------------------------------------------
# IVF-style multi-probe ANN
# ---------------------------------------------------------------------------

N_CELL_BITS = 4


def _flip(cell: str, i: int) -> str:
    """Expression flipping bit-char ``i`` (1-based) of a cell bitstring —
    identical in both dialects (substr/CASE/||)."""
    return (
        f"substr({cell}, 1, {i - 1}) || "
        f"(CASE WHEN substr({cell}, {i}, 1) = '0' THEN '1' ELSE '0' END) || "
        f"substr({cell}, {i + 1})"
    )


def _probe_cells(cell: str) -> str:
    flips = ", ".join(_flip(cell, i) for i in range(1, N_CELL_BITS + 1))
    return f"{cell}, {flips}"


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb_corpus(spark, sf_dir).createOrReplaceTempView("embc")
    cell = f"substr({V.lsh_bucket_spark('e')}, 1, {N_CELL_BITS})"
    cos = V.cosine_spark("c.e", "p.e")
    return spark.sql(
        f"""
        WITH b AS (SELECT vec_id, label, e, {cell} AS cell FROM embc),
        p AS (SELECT e, explode(array({_probe_cells('cell')})) AS cell
              FROM b WHERE vec_id = {PROBE_VEC_ID})
        SELECT c.vec_id, c.label, c.cell, round({cos}, 6) AS cos_sim
        FROM b c JOIN p ON c.cell = p.cell
        WHERE c.vec_id <> {PROBE_VEC_ID}
        ORDER BY cos_sim DESC, c.vec_id
        LIMIT {K}
        """
    )


def knn_ivf_oracle() -> str:
    cell = f"substr({V.lsh_bucket_duck('e')}, 1, {N_CELL_BITS})"
    cos = V.cosine_duck("c.e", "p.e")
    return f"""
    WITH embc AS ({EMB_CORPUS_DUCK}),
    b AS (SELECT vec_id, label, e, {cell} AS cell FROM embc),
    p AS (SELECT e, unnest([{_probe_cells('cell')}]) AS cell
          FROM b WHERE vec_id = {PROBE_VEC_ID})
    SELECT c.vec_id, c.label, c.cell, round({cos}, 6) AS cos_sim
    FROM b c JOIN p ON c.cell = p.cell
    WHERE c.vec_id <> {PROBE_VEC_ID}
    ORDER BY cos_sim DESC, c.vec_id
    LIMIT {K}
    """


# ---------------------------------------------------------------------------
# Per-label centroid stats
# ---------------------------------------------------------------------------


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb_corpus(spark, sf_dir).createOrReplaceTempView("embc")
    return spark.sql(
        """
        WITH x AS (SELECT label, pos, v
                   FROM embc LATERAL VIEW posexplode(e) t AS pos, v),
        dim AS (SELECT label, pos, avg(v) AS m FROM x GROUP BY label, pos),
        cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embc GROUP BY label)
        SELECT d.label, c.n, round(sqrt(sum(d.m * d.m)), 6) AS centroid_norm
        FROM dim d JOIN cnt c ON d.label = c.label
        GROUP BY d.label, c.n
        """
    )


def embedding_stats_oracle() -> str:
    return f"""
    WITH embc AS ({EMB_CORPUS_DUCK}),
    x AS (SELECT label, i - 1 AS pos, e[i] AS v
          FROM embc CROSS JOIN range(1, {V.DIM + 1}) AS t(i)),
    dim AS (SELECT label, pos, avg(v) AS m FROM x GROUP BY label, pos),
    cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embc GROUP BY label)
    SELECT d.label, c.n, round(sqrt(sum(d.m * d.m)), 6) AS centroid_norm
    FROM dim d JOIN cnt c ON d.label = c.label
    GROUP BY d.label, c.n
    """


# ---------------------------------------------------------------------------
# Batch kNN — top-K for a SET of probes in one pass (the serving shape:
# queries arrive in batches, the corpus streams once). Probe set is
# broadcast; per-probe top-k via WindowGroupLimit (map-side pruned).
# ---------------------------------------------------------------------------

N_PROBES = 5
BATCH_K = 3


def knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-side norms folded ONCE per vector (embedding_neardup pattern):
    # inline cosine would re-fold the corpus norm once per probe — a P×
    # multiplier on the one pass this query exists to avoid. Same fold
    # order and sqrt placement, so values are bit-identical to the oracle's
    # inline spelling.
    emb_corpus(spark, sf_dir).createOrReplaceTempView("embc")
    nrm = (
        "sqrt(aggregate(transform(e, x -> x * x), CAST(0 AS DOUBLE), "
        "(acc, v) -> acc + v))"
    )
    dot = (
        "aggregate(zip_with(c.e, p.e, (x, y) -> x * y), CAST(0 AS DOUBLE), "
        "(acc, v) -> acc + v)"
    )
    return spark.sql(
        f"""
        WITH n AS (SELECT vec_id, e, {nrm} AS nrm FROM embc),
        p AS (SELECT vec_id AS probe_id, e, nrm FROM n WHERE vec_id < {N_PROBES}),
        scored AS (
          SELECT p.probe_id, c.vec_id,
                 round(({dot}) / (c.nrm * p.nrm), 6) AS cos_sim
          FROM n c CROSS JOIN p
          WHERE c.vec_id <> p.probe_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY probe_id
                                       ORDER BY cos_sim DESC, vec_id) AS rnk
          FROM scored)
        SELECT probe_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= {BATCH_K}
        """
    )


def knn_batch_oracle() -> str:
    cos = V.cosine_duck("c.e", "p.e")
    return f"""
    WITH embc AS ({EMB_CORPUS_DUCK}),
    p AS (SELECT vec_id AS probe_id, e FROM embc WHERE vec_id < {N_PROBES}),
    scored AS (
      SELECT p.probe_id, c.vec_id, round({cos}, 6) AS cos_sim
      FROM embc c CROSS JOIN p
      WHERE c.vec_id <> p.probe_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored)
    SELECT probe_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= {BATCH_K}
    """


# ---------------------------------------------------------------------------
# ts_similarity — time-series similarity search over the event stream
# (pattern anchor: "Time Series Similarity Search for Streaming Data in
# Distributed Systems", EDBT 2019 — the distributed profile-match shape,
# not its index): each user's activity is reduced to a 24-dim hour-of-day
# value profile map-side (conditional aggregation, partial combine), then
# scored by cosine against a constant business-hours query pattern.
# Shuffle volume is O(users × 24 doubles) regardless of event count, and
# the top-k plans TakeOrderedAndProject — the same sketch-then-score shape
# that scales the kNN family. Reference parity: ABSENT (no value/time
# analysis of any kind in /root/reference).
# ---------------------------------------------------------------------------

# query pattern: flat business-hours block (09:00-16:59 UTC)
TS_PATTERN = [1.0 if 9 <= h <= 16 else 0.0 for h in range(24)]
TS_K = 20

_TS_NB = sum(x * x for x in TS_PATTERN) ** 0.5


def _ts_sql(hour_fn: str) -> str:
    profile = ", ".join(
        f"sum(CASE WHEN {hour_fn} = {h} THEN value ELSE 0 END) AS s{h}"
        for h in range(24)
    )
    dot = " + ".join(f"s{h} * {TS_PATTERN[h]}" for h in range(24) if TS_PATTERN[h])
    na = " + ".join(f"s{h} * s{h}" for h in range(24))
    return f"""
    WITH p AS (SELECT user_id, {profile} FROM events GROUP BY user_id)
    SELECT user_id, round(({dot}) / nullif(sqrt({na}) * {_TS_NB}, 0), 4) AS cos_sim
    FROM p ORDER BY cos_sim DESC, user_id LIMIT {TS_K}
    """


def ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import table

    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ts_sql("hour(ts)"))


def ts_similarity_oracle() -> str:
    return _ts_sql("hour(ts)")
