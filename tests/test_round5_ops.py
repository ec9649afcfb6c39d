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
        # approx_percentile default accuracy 10000 → rank error ≤ 1/10000;
        # on the fixture's value spread that keeps the medians within 1%
        # relative (generous: they are typically exact on these sizes)
        tol = max(abs(e.median) * 0.01, 0.01)
        assert abs(a.median - e.median) <= tol, (t, a.median, e.median)
        assert abs(a.mad - e.mad) <= max(abs(e.mad) * 0.01, 0.01)
        # the |z| > 3.5 cut is a tail count — a hair of median shift may
        # move a boundary event, so pin to ±1% of the group (min 1 event)
        slack = max(1, int(e.n_events * 0.01))
        assert abs(a.n_outliers - e.n_outliers) <= slack, (
            t, a.n_outliers, e.n_outliers,
        )


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
