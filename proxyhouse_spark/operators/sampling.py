"""Range join, hierarchical time rollup, and sampling/mix operators.

Second wave of the north-star surface (SURVEY §2.11 ext): the operators a
100 TB training-data pipeline runs to weight, sample, and band its corpus,
plus two scale-pattern relational ops the reference lacks entirely
(reference parity note: /root/reference/main.go has no joins or rollups of
any kind — see SURVEY §2.3/§2.4 ABSENT rows):

- ``range_join``        — point-in-interval join accelerated by bucket
                          equi-join (the manual spelling of the range-join
                          optimization; avoids BroadcastNestedLoopJoin)
- ``hyper_rollup``      — hypertable-style hierarchical time rollup
                          (day → hour continuous-aggregate shape)
- ``stratified_sample`` — deterministic per-stratum downsampling by md5
                          hex band (no RNG; stable across runs/partitions)
- ``mix_temperature``   — temperature-based corpus mix weights
                          (multilingual τ=2 resampling arithmetic)
- ``repetition_filter`` — Gopher-style within-doc repetition verdicts
                          (duplicate-bigram fraction, distinct-token ratio)

All built-in expressions; all differentially tested against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table


def _events(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "events").createOrReplaceTempView("events")


def _docs(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# range_join — each event assigned to an irregular value band.
#
# Scale shape: a naive `e.value >= lo AND e.value < hi` join has no equi
# key, so Spark plans BroadcastNestedLoopJoin — O(events × bands) predicate
# evaluations, and a hard wall when neither side is broadcastable. The
# bucket trick restores an equi key: explode each band into the fixed-width
# buckets it overlaps (bands are tiny — the explosion is bounded by
# range/width), map each event to its single bucket with arithmetic, then
# hash-join on bucket with the range test as a residual filter. The big
# side is touched once, map-side, with a broadcastable exploded dim; the
# same spelling works big-big with a shuffle hash join on bucket.
# ---------------------------------------------------------------------------

# Irregular band boundaries over events.value (domain [0, ~500)); hi exclusive.
BANDS: list[tuple[str, int, int]] = [
    ("micro", 0, 5),
    ("small", 5, 25),
    ("mid", 25, 75),
    ("large", 75, 150),
    ("xlarge", 150, 300),
    ("jumbo", 300, 500),
]
BUCKET_W = 25

_BANDS_ROWS = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in BANDS)


def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _events(spark, sf_dir)
    return spark.sql(
        f"""
        WITH bands AS (SELECT * FROM VALUES {_BANDS_ROWS} AS t(band, lo, hi)),
        -- integer boundaries: last overlapped bucket is (hi - 1) DIV W
        bb AS (SELECT band, lo, hi, explode(sequence(
                 CAST(floor(lo / {BUCKET_W}) AS INT),
                 CAST((hi - 1) DIV {BUCKET_W} AS INT))) AS bucket
               FROM bands),
        e AS (SELECT value, CAST(floor(value / {BUCKET_W}) AS INT) AS bucket
              FROM events)
        SELECT /*+ BROADCAST(bb) */ band,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM e JOIN bb ON e.bucket = bb.bucket AND e.value >= bb.lo AND e.value < bb.hi
        GROUP BY band
        """
    )


def range_join_oracle() -> str:
    return f"""
    WITH bands AS (SELECT * FROM (VALUES {_BANDS_ROWS}) AS t(band, lo, hi))
    SELECT band, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """


# ---------------------------------------------------------------------------
# hyper_rollup — hierarchical time rollup (TimescaleDB continuous-aggregate
# shape): one pass emits hour-grain rows plus day-grain and grand-total
# summary rows via ROLLUP. Spark plans a single Expand + hash aggregate
# with map-side partial combine, so the 100 TB cost is one shuffle of
# O(distinct (day, hour)) partial rows — the multi-resolution materialized
# view a hypertable maintains, computed declaratively.
# ---------------------------------------------------------------------------


def hyper_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _events(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ) AS day,
               CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ) AS hour,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value,
               round(avg(value), 4) AS avg_value
        FROM events
        GROUP BY ROLLUP (day, hour)
        """
    )


def hyper_rollup_oracle() -> str:
    # CAST: DuckDB's date_trunc('day') yields DATE; Spark yields TIMESTAMP
    return """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY ROLLUP (day, hour)
    """


# ---------------------------------------------------------------------------
# stratified_sample — per-stratum deterministic downsampling: keep a doc iff
# the first two hex chars of md5(doc_id) fall below the stratum's threshold
# (en ≈ 0.898 = 0xe6/0x100; other langs 0.25 = 0x40/0x100). Hex-string
# comparison is the portable spelling (hash_split contract); no RNG means
# the sample is reproducible across engines, runs, and repartitioning — the
# property `df.sample()` does NOT give you (its Bernoulli draw is seeded
# per-partition, so any repartition resamples). Pure narrow projection:
# zero shuffle at any scale.
# ---------------------------------------------------------------------------

_STRATA_THRESHOLD = "CASE WHEN lang = 'en' THEN 'e6' ELSE '40' END"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH h AS (SELECT doc_id, lang,
                          substr(md5(CAST(doc_id AS STRING)), 1, 2) AS h2
                   FROM documents)
        SELECT doc_id, lang, h2, h2 < {_STRATA_THRESHOLD} AS kept
        FROM h
        """
    )


def stratified_sample_oracle() -> str:
    return f"""
    WITH h AS (SELECT doc_id, lang,
                      substr(md5(CAST(doc_id AS STRING)), 1, 2) AS h2
               FROM documents)
    SELECT doc_id, lang, h2, h2 < {_STRATA_THRESHOLD} AS kept
    FROM h
    """


# ---------------------------------------------------------------------------
# mix_temperature — temperature-based corpus mix (the multilingual-training
# resampling rule: stratum share ∝ count^(1/τ), τ=2 → sqrt). Output is the
# per-language sampling plan: raw count, smoothed share, and epochs-per-doc
# needed to hit a fixed token budget at that share. One O(#strata) aggregate
# + a broadcast of the 1-row total: the planning step is free at any corpus
# size; the plan then drives stratified_sample-style filters.
# ---------------------------------------------------------------------------

MIX_BUDGET = 100_000  # total sampled-doc budget the shares are scaled to


def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        t AS (SELECT sum(sqrt(n_docs)) AS tot FROM s)
        SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
               round(sqrt(n_docs) / tot, 6) AS share,
               round(sqrt(n_docs) / tot * {MIX_BUDGET} / n_docs, 4) AS epochs
        FROM s CROSS JOIN t
        """
    )


def mix_temperature_oracle() -> str:
    return f"""
    WITH s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    t AS (SELECT sum(sqrt(n_docs)) AS tot FROM s)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           round(sqrt(n_docs) / tot, 6) AS share,
           round(sqrt(n_docs) / tot * {MIX_BUDGET} / n_docs, 4) AS epochs
    FROM s CROSS JOIN t
    """


# ---------------------------------------------------------------------------
# repetition_filter — Gopher-style within-doc repetition scoring: a doc is
# 'repetitive' when >20% of its bigrams are duplicates OR <30% of its tokens
# are distinct. The verdict compares INTEGERS (5*dup > n_bg; 10*distinct <
# 3*n) so both engines decide identically — the rounded ratios are display
# only, never compared against thresholds. Narrow per-doc array math, no
# shuffle; bigrams materialized once per doc.
# ---------------------------------------------------------------------------

_REP_VERDICT = (
    "CASE WHEN n_bg > 0 AND 5 * (n_bg - n_bg_d) > n_bg THEN 'repetitive' "
    "WHEN 10 * n_tok_d < 3 * n_tok THEN 'repetitive' ELSE 'ok' END"
)
_REP_SELECT = f"""
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       round(CASE WHEN n_bg > 0 THEN (n_bg - n_bg_d) / CAST(n_bg AS DOUBLE)
                  ELSE 0.0 END, 4) AS dup_bigram_frac,
       round(n_tok_d / CAST(n_tok AS DOUBLE), 4) AS distinct_token_ratio,
       {_REP_VERDICT} AS verdict
FROM n
"""


def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    return spark.sql(
        f"""
        WITH tk AS (SELECT doc_id, split(text, ' ', -1) AS toks FROM documents),
        -- CASE guard, not greatest(): Spark's sequence(1, 0) is DESCENDING
        -- [1, 0], not empty, so a 1-token doc must short-circuit to array()
        bg AS (SELECT doc_id, toks,
                      CASE WHEN size(toks) < 2 THEN array()
                           ELSE transform(sequence(1, size(toks) - 1), i ->
                             concat_ws(' ', element_at(toks, i),
                                       element_at(toks, i + 1))) END AS bgs
               FROM tk),
        n AS (SELECT doc_id, size(toks) AS n_tok,
                     size(array_distinct(toks)) AS n_tok_d,
                     size(bgs) AS n_bg, size(array_distinct(bgs)) AS n_bg_d
              FROM bg)
        {_REP_SELECT}
        """
    )


def repetition_filter_oracle() -> str:
    return f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (SELECT doc_id, toks,
                  list_transform(range(1, greatest(len(toks), 1)), i ->
                    toks[i] || ' ' || toks[i + 1]) AS bgs
           FROM tk),
    n AS (SELECT doc_id, len(toks) AS n_tok,
                 len(list_distinct(toks)) AS n_tok_d,
                 len(bgs) AS n_bg, len(list_distinct(bgs)) AS n_bg_d
          FROM bg)
    {_REP_SELECT}
    """


# ---------------------------------------------------------------------------
# gapfill_locf — hypertable-style gap filling (TimescaleDB
# time_bucket_gapfill + locf shape): materialize every hourly bucket
# between each series' first and last observation, mark the empty ones,
# and carry the last observed hourly value forward across gaps.
#
# Scale (100 TB): the observed aggregation is one map-side-combinable
# shuffle on (series, bucket); the grid explode is O(series × buckets) —
# bounded by wall-clock time span, not data volume — and the LOCF is a
# per-series carry-forward window over that bounded grid. At 100 TB the
# grid is still tiny; the data-sized work stays in the first aggregate.
# ---------------------------------------------------------------------------


def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _events(spark, sf_dir)
    return spark.sql(
        """
        WITH hourly AS (
          SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ) AS h,
                 CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS hour_value
          FROM events GROUP BY 1, 2),
        bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1
                   FROM hourly GROUP BY 1),
        grid AS (SELECT event_type,
                        explode(sequence(h0, h1, INTERVAL 1 HOUR)) AS h
                 FROM bounds),
        j AS (SELECT g.event_type, g.h, coalesce(hourly.n, 0) AS n,
                     hourly.hour_value, hourly.n IS NULL AS filled
              FROM grid g LEFT JOIN hourly
                ON g.event_type = hourly.event_type AND g.h = hourly.h)
        SELECT event_type, h AS hour, n, filled,
               round(last(hour_value, true) OVER (
                 PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS locf_value
        FROM j
        """
    )


def gapfill_locf_oracle() -> str:
    return """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS hour_value
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
    grid AS (SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             FROM bounds),
    j AS (SELECT g.event_type, g.h, coalesce(hourly.n, 0) AS n,
                 hourly.hour_value, hourly.n IS NULL AS filled
          FROM grid g LEFT JOIN hourly
            ON g.event_type = hourly.event_type AND g.h = hourly.h)
    SELECT event_type, h AS hour, n, filled,
           round(last_value(hour_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS locf_value
    FROM j
    """


# ---------------------------------------------------------------------------
# weighted_sample — deterministic quality-weighted corpus draw per
# stratum: the Efraimidis-Spirakis A-ES scheme (priority = u^(1/w), top-k
# by priority ⇒ inclusion probability ∝ weight) with md5 arithmetic as
# the uniform source — no RNG, so the draw is reproducible under any
# repartitioning / shard retry (the stratified_sample discipline applied
# to WEIGHTED selection, which a pipeline needs the moment docs carry a
# quality score). Spelled in log space (ln(u)/w, higher = better) to
# avoid pow(); the priority is rounded to 6 dp with doc_id tiebreak so
# cross-engine libm ulp noise cannot reorder the cut. Weight = n_chars
# (a stand-in for any quality score). One WindowGroupLimit per stratum —
# map-side pruned top-k, no global sort.
# ---------------------------------------------------------------------------

WSAMPLE_K = 25  # kept per language stratum


def _wsample_sql(md5int: str) -> str:
    # u in (0, 1]: 48-bit md5 slice scaled; +1 avoids ln(0)
    u = f"(({md5int}) + 1) / 281474976710656.0"
    # ``+ 0.0e0`` canonicalizes negative zero: when u is within 5e-7·w of
    # 1 the rounded priority is zero, and Spark's round() (BigDecimal
    # path) hands back +0.0 while DuckDB's (libm path) keeps -0.0 — a
    # "-0" vs "0" rendering split under stringify-then-hash. IEEE
    # guarantees -0.0 + 0.0 = +0.0 and x + 0.0 = x otherwise, on both
    # engines. Found by the 100× differential (~1-in-2e6 docs trip it).
    return f"""
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             round(ln({u}) / n_chars, 6) + 0.0e0 AS priority
      FROM documents),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY priority DESC, doc_id) AS rnk
      FROM w)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, priority,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {WSAMPLE_K}
    """


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    md5int = "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
    return spark.sql(_wsample_sql(md5int))


def weighted_sample_oracle() -> str:
    md5int = (
        "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)"
    )
    return _wsample_sql(md5int)


# ---------------------------------------------------------------------------
# incremental_rollup — materialized-aggregate maintenance (the
# TimescaleDB continuous-aggregate / Materialize shape, completing
# hyper_rollup's read side with the WRITE side): the persisted state
# holds mergeable partials (count, sum, min, max) per (event_type, day);
# a new delta batch is aggregated the same way and MERGED — sum the
# counts/sums, min the mins, max the maxes — never recomputed from raw
# history. Non-mergeable aggregates (avg here) must be DERIVED from
# merged partials (sum/count), which is exactly the modeling rule that
# makes incremental maintenance correct; storing avg itself and
# "merging" it is the classic bug this operator's oracle would catch.
# The oracle is the one-shot aggregation over all rows: merge(state,
# delta) == full recompute, the associativity contract. Scale: both
# passes are map-side-combinable aggs; the merge touches O(groups) rows
# regardless of history size — the entire point at 100 TB.
# ---------------------------------------------------------------------------

_INC_SPLIT = "2024-01-16 00:00:00"


def _inc_partial(pred: str, trunc: str) -> str:
    return f"""(
      SELECT event_type, {trunc} AS day,
             CAST(count(*) AS BIGINT) AS n,
             -- partials carry EXACT integer cents (the fixture value
             -- domain is the cents grid), so merge(state, delta) equals
             -- the one-shot recompute EXACTLY — float-sum partials are
             -- only associative up to ulp error, and the derived
             -- avg_value then sits half an ulp from a round() boundary
             -- that Spark (shortest-repr BigDecimal rounding) and
             -- DuckDB (binary rounding) resolve differently (r10: the
             -- sf0.001 signup/2024-01-18 group hit avg = 30703/800 =
             -- 38.37875 exactly and the engines split 38.3788/38.3787).
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             round(min(value), 2) AS vmin,
             round(max(value), 2) AS vmax
      FROM events WHERE {pred} GROUP BY event_type, {trunc})"""


def _inc_sql(trunc: str, split_lit: str) -> str:
    state = _inc_partial(f"ts < {split_lit}", trunc)
    delta = _inc_partial(f"ts >= {split_lit}", trunc)
    # avg_value = cents/(100·n) rounded HALF-UP to 4 decimals, computed
    # with the mod-subtract exact division (tv_distance pattern): with
    # b = 200·cents + n and d = 2·n, (b - b%d)/d is the exact half-up
    # integer of 10^4·avg (value domain nonnegative), and the final
    # /10000.0 renders it as the same double on both engines.
    b = "(200 * cents + n)"
    d = "(2 * n)"
    return f"""
    WITH state AS {state},
    delta AS {delta},
    merged AS (
      SELECT event_type, day,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS cents,
             round(min(vmin), 2) AS vmin,
             round(max(vmax), 2) AS vmax
      FROM (SELECT * FROM state UNION ALL SELECT * FROM delta) u
      GROUP BY event_type, day)
    SELECT event_type, day, n,
           CAST(cents AS DOUBLE) / 100 AS total, vmin, vmax,
           ({b} - {b} % {d}) / {d} / 10000.0 AS avg_value
    FROM merged
    """


def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _events(spark, sf_dir)
    return spark.sql(
        _inc_sql(
            "CAST(date_trunc('DAY', ts) AS TIMESTAMP_NTZ)",
            f"TIMESTAMP_NTZ '{_INC_SPLIT}'",
        )
    )


def incremental_rollup_oracle() -> str:
    # one-shot recompute over ALL rows — merge(state, delta) must equal it
    # (DuckDB date_trunc('day') yields DATE; cast to TIMESTAMP to match
    # Spark's NTZ day column). Carries the same exact-cents arithmetic as
    # the merged path: total and avg_value derive from the integer cents
    # sum, and avg_value is the mod-subtract exact half-up of
    # cents/(100·n) at 4 decimals — see _inc_sql.
    trunc = "CAST(date_trunc('day', ts) AS TIMESTAMP)"
    b = "(200 * cents + n)"
    d = "(2 * n)"
    return f"""
    WITH full_agg AS (
      SELECT event_type, {trunc} AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             round(min(value), 2) AS vmin,
             round(max(value), 2) AS vmax
      FROM events GROUP BY event_type, {trunc})
    SELECT event_type, day, n,
           CAST(cents AS DOUBLE) / 100 AS total, vmin, vmax,
           ({b} - {b} % {d}) / {d} / 10000.0 AS avg_value
    FROM full_agg
    """


# ---------------------------------------------------------------------------
# mix_materialize — turn the temperature-mix PLAN (mix_temperature's
# epochs-per-doc) into the per-doc MANIFEST a dataloader consumes:
# n_copies = floor(epochs) + one stochastic extra copy with probability
# frac(epochs), drawn DETERMINISTICALLY from a 24-bit md5 slice (the
# stratified_sample discipline — stable across runs, engines, and
# repartitioning; df.sample() is none of those). The per-lang epochs are
# the exact doubles the oracle-green mix_temperature computes, so the
# threshold compare `hash24 < frac * 2^24` cannot diverge cross-engine.
#
# Scale: the plan frame is O(#strata) — broadcast; the manifest is a
# narrow per-doc projection. Zero corpus shuffle. The expected
# materialized total equals MIX_BUDGET by construction.
# ---------------------------------------------------------------------------


def _mix_mat_sql(md5int24: str) -> str:
    return f"""
    WITH s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    t AS (SELECT sum(sqrt(n_docs)) AS tot FROM s),
    plan AS (SELECT lang,
                    sqrt(n_docs) / tot * {MIX_BUDGET} / n_docs AS epochs
             FROM s CROSS JOIN t),
    m AS (SELECT d.doc_id, d.lang, plan.epochs, ({md5int24}) AS h24
          FROM documents d JOIN plan ON d.lang = plan.lang)
    SELECT doc_id, lang,
           CAST(floor(epochs) +
                CASE WHEN h24 < (epochs - floor(epochs)) * 16777216.0
                     THEN 1 ELSE 0 END AS BIGINT) AS n_copies
    FROM m
    """


def mix_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    md5int24 = (
        "CAST(conv(substr(md5(CAST(d.doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"
    )
    return spark.sql(_mix_mat_sql(md5int24))


def mix_materialize_oracle() -> str:
    md5int24 = (
        "CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)"
    )
    return _mix_mat_sql(md5int24)


# ---------------------------------------------------------------------------
# corpus_shuffle — the deterministic GLOBAL SHUFFLE a training run reads:
# every doc gets a pseudo-random 48-bit md5 rank, a shard (top byte of an
# INDEPENDENT md5 slice, mod N_SHARDS — shard choice and within-shard
# order must not correlate), and its ordinal within the shard. This is
# the classic two-level dataloader order (shuffle shards, then stream
# each shard in stored order) made reproducible: same seed text → same
# order on any engine, any partitioning.
#
# Scale: assignment is a narrow projection; the only heavy step is the
# within-shard ordinal — a row_number PARTITIONED by shard, i.e. a
# parallel per-shard sort of corpus/N_SHARDS rows (exactly the sort a
# shard writer pays anyway). N_SHARDS is the scale knob: at 100 TB you
# size shards to executor memory and the window never sees more than one
# shard. No unpartitioned window, no global sort.
# ---------------------------------------------------------------------------

N_SHARDS = 8
SHUFFLE_SEED = "ep0"  # bump per epoch for a fresh order


def _shuffle_sql(md5int: str, md5shard: str) -> str:
    return f"""
    WITH k AS (SELECT doc_id,
                      ({md5int}) AS rank_key,
                      CAST(({md5shard}) % {N_SHARDS} AS BIGINT) AS shard
               FROM documents)
    SELECT doc_id, shard, rank_key,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY rank_key, doc_id) AS BIGINT)
             AS ordinal
    FROM k
    """


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    _docs(spark, sf_dir)
    seed_doc = f"concat('{SHUFFLE_SEED}', CAST(doc_id AS STRING))"
    md5int = f"CAST(conv(substr(md5({seed_doc}), 1, 12), 16, 10) AS BIGINT)"
    md5shard = f"CAST(conv(substr(md5({seed_doc}), 13, 2), 16, 10) AS BIGINT)"
    return spark.sql(_shuffle_sql(md5int, md5shard))


def corpus_shuffle_oracle() -> str:
    seed_doc = f"concat('{SHUFFLE_SEED}', CAST(doc_id AS VARCHAR))"
    md5int = f"CAST(concat('0x', substr(md5({seed_doc}), 1, 12)) AS BIGINT)"
    md5shard = f"CAST(concat('0x', substr(md5({seed_doc}), 13, 2)) AS BIGINT)"
    return _shuffle_sql(md5int, md5shard)


# ---------------------------------------------------------------------------
# neyman_alloc — optimal stratified-sampling ALLOCATION: given a total
# sample budget, how many documents to draw per source so the
# stratified estimator's variance is minimal (Neyman 1934:
# n_h ∝ N_h·σ_h — big AND internally-diverse strata earn more budget).
# The design-side companion of q_stratified_sample (which executes a
# fixed-rate draw): proportional allocation oversamples homogeneous
# strata; this op quantifies exactly how much budget they should give
# up. Reported against the proportional baseline per stratum.
#
# Exactness: N_h·σ_h = √(N_h·Q_h − S_h²) — the argument is an exact
# DECIMAL integer (n_chars moments), and IEEE sqrt is correctly
# rounded, so the per-stratum weights are deterministic across
# engines; shares and the floor allocations are the only doubles
# (rounded 6 dp / floored). One map-side-combinable fold to O(#sources)
# rows; the share denominator is a 1-row frame crossed back.
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 100  # total documents the sampling fleet may draw


def _neyman_sql() -> str:
    return f"""
    m AS (SELECT source,
                 CAST(count(*) AS DECIMAL(18,0)) AS n,
                 CAST(sum(n_chars) AS DECIMAL(18,0)) AS s,
                 CAST(sum(CAST(n_chars AS DECIMAL(18,0))
                          * CAST(n_chars AS DECIMAL(18,0)))
                      AS DECIMAL(38,0)) AS q
          FROM documents GROUP BY source),
    w AS (SELECT source, n,
                 sqrt(CAST(n * q - s * s AS DOUBLE)) AS nh_sigma
          FROM m),
    tot AS (SELECT sum(nh_sigma) AS denom,
                   CAST(sum(n) AS BIGINT) AS n_total
            FROM w)
    SELECT w.source,
           CAST(w.n AS BIGINT) AS n_rows,
           round(w.nh_sigma / CAST(w.n AS DOUBLE), 6) AS sd_chars,
           round(w.nh_sigma / tot.denom, 6) AS alloc_share,
           CAST(floor({NEYMAN_BUDGET} * w.nh_sigma / tot.denom)
                AS BIGINT) AS n_neyman,
           CAST(({NEYMAN_BUDGET} * CAST(w.n AS BIGINT)
                 - ({NEYMAN_BUDGET} * CAST(w.n AS BIGINT)) % tot.n_total)
                / tot.n_total AS BIGINT) AS n_proportional
    FROM w, tot
    """


def neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N127: Neyman-optimal stratified-sampling allocation per source."""
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("WITH " + _neyman_sql())


def neyman_alloc_oracle() -> str:
    return "WITH " + _neyman_sql()


# ---------------------------------------------------------------------------
# gapfill_interp — the LINEAR-INTERPOLATION sibling of gapfill_locf
# (TimescaleDB's interpolate() next to locf()): carry-forward is right
# for state-like series (a price holds until it changes); interpolation
# is right for flow-like series (a sensor that kept moving while
# unobserved). For every gap between consecutive observed hourly buckets
# the missing buckets get cents + (Δ·k) div gap — EXACT integer
# arithmetic with the division spelled sign-split (sign(Δ)·(|Δ|·k div
# gap)) because DuckDB's // floors negatives while Spark's div truncates
# toward zero; non-negative operands make them agree.
# Scale: same contract as locf — the data-sized work is one (type, hour)
# map-side-combinable fold; the gap explode is bounded by the wall-clock
# span (O(series × buckets)), never by data volume.
# ---------------------------------------------------------------------------

HOUR_US = 3_600_000_000


def _gapfill_interp_sql(epoch: str, idiv: str, explode_k: str) -> str:
    return f"""
    hourly AS (SELECT event_type,
                      CAST({epoch} {idiv} {HOUR_US} AS BIGINT) AS h,
                      CAST(sum(CAST(round(value * 100) AS BIGINT))
                           AS BIGINT) AS cents
               FROM events GROUP BY event_type,
                                    CAST({epoch} {idiv} {HOUR_US} AS BIGINT)),
    nxt AS (SELECT event_type, h, cents,
                   lead(h) OVER (PARTITION BY event_type ORDER BY h) AS h2,
                   lead(cents) OVER (PARTITION BY event_type ORDER BY h)
                     AS c2
            FROM hourly),
    gaps AS (SELECT event_type, h, cents, h2, c2, h2 - h AS gap
             FROM nxt WHERE h2 IS NOT NULL AND h2 - h > 1),
    filled AS (SELECT event_type, h + t.k AS h,
                      cents + CAST(sign(c2 - cents) AS BIGINT)
                              * (abs(c2 - cents) * t.k {idiv} gap)
                        AS cents,
                      true AS interpolated
               FROM gaps{explode_k})
    SELECT event_type, h AS hour, cents, interpolated FROM filled
    UNION ALL
    SELECT event_type, h AS hour, cents, false AS interpolated FROM hourly
    """


def gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N198: exact-integer linear interpolation across hourly gaps."""
    from ..tables import EPOCH_NTZ

    _events(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _gapfill_interp_sql(
            f"timestampdiff(MICROSECOND, {EPOCH_NTZ}, ts)",
            "div",
            " LATERAL VIEW explode(sequence(1, CAST(gap - 1 AS INT))) t AS k",
        )
    )


def gapfill_interp_oracle() -> str:
    return "WITH " + _gapfill_interp_sql(
        "epoch_us(ts)", "//", ", unnest(range(1, gap)) AS t(k)"
    )
