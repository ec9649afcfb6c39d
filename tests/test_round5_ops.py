"""Round-5 operator pins.

q_mad_outliers_approx — the sketch swap of q_mad_outliers (VERDICT r04
item #6): same CTE chain with `approx_percentile` in place of the exact
`percentile`, so at scale the two median passes become mergeable-sketch
aggregations instead of per-group sorts. Rows-only in the registry;
this test IS its accuracy gate, pinned against the exact op.
"""

from tests.conftest import SF_SMALL

from proxyhouse_spark import registry


def test_mad_outliers_approx_matches_exact_within_sketch_bound(spark):
    exact = {
        r.event_type: r
        for r in registry.QUERIES["q_mad_outliers"](spark, SF_SMALL).collect()
    }
    approx = {
        r.event_type: r
        for r in registry.QUERIES["q_mad_outliers_approx"](
            spark, SF_SMALL
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
