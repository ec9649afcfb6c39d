"""Spatial operators: the 2-D range-join family (SURVEY §2.11 extension).

A large-scale analytics engine needs the spatial-join-at-scale pattern —
points-within-radius and nearest-neighbor joins — spelled so the quadratic
candidate surface never materializes: GRID-CELL BUCKETING (the geohash /
S2-cell idiom): hash each point to a cell of side R, explode the probe side
into its 3×3 cell neighborhood (a bounded 9× blowup, the rolling_median
explode discipline), equi-join on the cell id, then the EXACT distance
filter on the survivors. At 100 TB the cell id is the partition key and the
candidate join partition-prunes — the same contract as the IVF inverted
list, in two dimensions.

The fixture has no geo columns, so coordinates are synthesized
deterministically from md5 (the corpus.py dup-injection discipline): each
customer gets planar (x, y) meters in a 1000 km square. Planar integer
coordinates keep every distance² an EXACT BIGINT — no haversine trig, whose
last-ulp libm differences would poison a cross-engine differential (sin/cos
are not IEEE-exactly-rounded; this family deliberately stays in exact
integer Euclidean space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import table

WORLD_M = 1_000_000   # 1000 km planar square
RADIUS_M = 20_000     # join radius = cell side (3x3 neighborhood suffices)


def _customer(spark: SparkSession, sf_dir: str) -> None:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")


def _pts_sql(md5x: str, md5y: str) -> str:
    """Deterministic planar points: one per customer, md5-placed."""
    return f"""
    pts AS (SELECT c_custkey AS id,
                   {md5x} % {WORLD_M} AS x,
                   {md5y} % {WORLD_M} AS y
            FROM customer)
    """


def _pairs_sql(idiv: str, explode_9: str) -> str:
    """Candidate generation + exact filter: probe side exploded into its
    3×3 cell neighborhood, equi-joined on the cell, exact integer d² cut.
    Each unordered pair survives exactly once: the probe row p reaches
    base row b in b's OWN cell, and the p.id < b.id guard kills the
    mirror orientation."""
    r2 = RADIUS_M * RADIUS_M
    return f"""
    cells AS (SELECT id, x, y,
                     CAST(x {idiv} {RADIUS_M} AS BIGINT) AS cx,
                     CAST(y {idiv} {RADIUS_M} AS BIGINT) AS cy
              FROM pts),
    probe AS (SELECT id, x, y,
                     CAST(x {idiv} {RADIUS_M} AS BIGINT) + t.dx AS cx,
                     CAST(y {idiv} {RADIUS_M} AS BIGINT) + u.dy AS cy
              FROM pts{explode_9}),
    pairs AS (SELECT p.id AS id_a, b.id AS id_b,
                     (p.x - b.x) * (p.x - b.x)
                       + (p.y - b.y) * (p.y - b.y) AS d2
              FROM probe p JOIN cells b
                ON b.cx = p.cx AND b.cy = p.cy AND p.id < b.id),
    hits AS (SELECT id_a, id_b, CAST(d2 AS BIGINT) AS d2
             FROM pairs WHERE d2 <= {r2})
    """


# ---------------------------------------------------------------------------
# spatial_join — all point pairs within RADIUS_M: the "which stores
# cannibalize each other" / "which sensors cover the same area" query.
# ---------------------------------------------------------------------------


def _spatial_join_sql(md5x: str, md5y: str, idiv: str, explode_9: str) -> str:
    return (
        _pts_sql(md5x, md5y)
        + ","
        + _pairs_sql(idiv, explode_9)
        + " SELECT id_a, id_b, d2 FROM hits"
    )


def spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N193: cell-bucketed points-within-radius join, exact integer d²."""
    _customer(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _spatial_join_sql(
            _MD5_SPARK.format(salt="x"),
            _MD5_SPARK.format(salt="y"),
            "div",
            " LATERAL VIEW explode(sequence(-1, 1)) t AS dx"
            " LATERAL VIEW explode(sequence(-1, 1)) u AS dy",
        )
    )


def spatial_join_oracle() -> str:
    return "WITH " + _spatial_join_sql(
        _MD5_DUCK.format(salt="x"),
        _MD5_DUCK.format(salt="y"),
        "//",
        ", unnest(range(-1, 2)) AS t(dx), unnest(range(-1, 2)) AS u(dy)",
    )


_MD5_SPARK = (
    "CAST(conv(substr(md5(concat(CAST(c_custkey AS STRING), '#{salt}')), "
    "1, 12), 16, 10) AS BIGINT)"
)
_MD5_DUCK = (
    "CAST(concat('0x', substr(md5(concat(CAST(c_custkey AS VARCHAR), "
    "'#{salt}')), 1, 12)) AS BIGINT)"
)


# ---------------------------------------------------------------------------
# spatial_nn — bounded-radius NEAREST NEIGHBOR per point ("closest store
# within 20 km, if any"): symmetrize the within-radius candidates, take
# the per-point argmin as the exact integer key d²·10⁷ + neighbor_id
# (nearest first, lowest id on ties — deterministic, no min_by
# ambiguity), LEFT-join back so isolated points stay visible with NULLs
# (the standard "no coverage" row a reader must see, not lose).
# ---------------------------------------------------------------------------


def _spatial_nn_sql(md5x: str, md5y: str, idiv: str, explode_9: str) -> str:
    enc = "CAST(10000000 AS BIGINT)"
    return (
        _pts_sql(md5x, md5y)
        + ","
        + _pairs_sql(idiv, explode_9)
        + f""",
    sym AS (SELECT id_a AS id, id_b AS nb, d2 FROM hits
            UNION ALL
            SELECT id_b AS id, id_a AS nb, d2 FROM hits),
    best AS (SELECT id, CAST(min(d2 * {enc} + nb) AS BIGINT) AS k
             FROM sym GROUP BY id)
    SELECT p.id, p.x, p.y,
           CAST(b.k % {enc} AS BIGINT) AS neighbor_id,
           CAST(b.k {idiv} {enc} AS BIGINT) AS d2
    FROM pts p LEFT JOIN best b ON b.id = p.id
    """
    )


def spatial_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N194: bounded-radius nearest neighbor, NULL for isolated points."""
    _customer(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _spatial_nn_sql(
            _MD5_SPARK.format(salt="x"),
            _MD5_SPARK.format(salt="y"),
            "div",
            " LATERAL VIEW explode(sequence(-1, 1)) t AS dx"
            " LATERAL VIEW explode(sequence(-1, 1)) u AS dy",
        )
    )


def spatial_nn_oracle() -> str:
    return "WITH " + _spatial_nn_sql(
        _MD5_DUCK.format(salt="x"),
        _MD5_DUCK.format(salt="y"),
        "//",
        ", unnest(range(-1, 2)) AS t(dx), unnest(range(-1, 2)) AS u(dy)",
    )
