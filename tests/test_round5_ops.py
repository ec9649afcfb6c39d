"""Round-5 operator pins.

q_mad_outliers_approx — the sketch swap of q_mad_outliers (VERDICT r04
item #6): same CTE chain with `approx_percentile` in place of the exact
`percentile`, so at scale the two median passes become mergeable-sketch
aggregations instead of per-group sorts. Rows-only in the registry;
this test IS its accuracy gate, pinned against the exact op.
"""

import pytest

from tests.conftest import SF_SMALL

from proxyhouse_spark import registry

SF_MID = "/root/testdata/sf0.1"


# parameterized at BOTH fixture scales (VERDICT r05 next-round #7) so the
# sketch-vs-exact bound stays honest as fixtures grow — a bound that only
# ever ran at sf0.01 could drift silently at 10x the group sizes
@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MID])
def test_mad_outliers_approx_matches_exact_within_sketch_bound(spark, sf_dir):
    """Since round 9 the sketch-vs-exact bounds (medians/MADs within 1%
    relative — approx_percentile default accuracy 10000 → rank error ≤
    1/10000 — and outlier counts within ±1% of the group, min 1 event)
    live IN the query as integer verdicts, hash-enforced by the DuckDB
    oracle. Pin here that every verdict is 1 at both fixture scales and
    that the cross-engine columns agree with the exact op; re-derive the
    median bound independently for one group so the in-query spelling
    can't go vacuously true."""
    exact = {
        r.event_type: r
        for r in registry.QUERIES["q_mad_outliers"](spark, sf_dir).collect()
    }
    approx = {
        r.event_type: r
        for r in registry.QUERIES["q_mad_outliers_approx"](
            spark, sf_dir
        ).collect()
    }
    # identical group set and per-group event counts (the sketch only
    # changes the quantile estimator, never the grouping)
    assert set(exact) == set(approx) and len(exact) > 0
    for t, e in exact.items():
        a = approx[t]
        assert a.n_events == e.n_events
        assert (a.med_ok, a.mad_ok, a.outliers_ok) == (1, 1, 1), (t, a)

    # independent re-derivation: the sketch median of one group must sit
    # within the same 1% bound of the exact op's published median
    t = sorted(exact)[0]
    from proxyhouse_spark.operators.behavior import _events

    _events(spark, sf_dir)
    sketch_med = spark.sql(
        "SELECT approx_percentile(CAST(round(value * 1000) AS BIGINT), 0.5)"
        " / 1000.0e0 AS m FROM events WHERE event_type = '{}'".format(t)
    ).collect()[0].m
    e = exact[t]
    assert abs(sketch_med - e.median) <= max(abs(e.median) * 0.01, 0.01)


# anomaly_p99's exact-percentile identity (behavior.py `_ANOM_P99`) holds
# because both the threshold and the cut live in EXACT milli-units — which
# assumes every `events.value` is milli-representable.  If a future data-gen
# change ever carries finer precision, round(value*1000) would quantize the
# cut away from raw-double semantics, and BOTH engines would agree on the
# quantized answer, so the differential could never catch the drift
# (ADVICE r05 #4).  This pins the assumption loudly, at both fixture scales.
@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MID])
def test_events_value_is_milli_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    bad = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("value") != F.round(F.col("value") * 1000) / 1000)
        .count()
    )
    assert bad == 0, f"{bad} events.value rows are not milli-unit exact"
