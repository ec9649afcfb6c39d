"""bench.py settle guard (VERDICT r07 #3 suite tier, VERDICT r08 #2
per-query tier, r09 per-query steal tier).

The driver's per-round bench is a single shot with no noise defense; r07
proved the shared host can inject ±25% phantom swings into the recorded
suite total, r08 proved the suite-MEDIAN criterion alone cannot see a
heavy query's own 2.6x phantom (30+ fast quiet queries dominate the
median), and r09 proved a hypervisor-steal window spanning all 3 of a
query's samples slows them UNIFORMLY — tight spread, wrong level — so a
spread criterion alone cannot see it either. bench.py now:

- re-runs any query whose OWN spread >= PER_QUERY_THRESHOLD or whose OWN
  steal window >= PER_QUERY_STEAL_PCT, keeping the less-contaminated
  triple (lower steal first, then lower spread) and recording the
  discarded measurement;
- retries the whole suite when the median still crosses SETTLE_THRESHOLD,
  recording the discarded pass's median (ADVICE r08 #3);
- sets settled=true only when ALL tiers are quiet;
- stamps the compact line with the resample count and the pass's steal.

These tests drive main() with a stubbed runner — no Spark session.
"""

from __future__ import annotations

import json
import sys

import pytest


@pytest.fixture
def bench(monkeypatch):
    monkeypatch.syspath_prepend("/root/repo")
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "get_spark", lambda name: object())
    yield bench_mod
    sys.modules.pop("bench", None)


def _suite(timings, spreads, steals=None):
    steals = steals or {k: 0.1 for k in timings}
    return dict(timings), dict(spreads), dict(steals)


def _run(bench_mod, monkeypatch, capsys, passes, requeries=()):
    """Drive main() with scripted (timings, spreads, steals) per suite pass
    and scripted (median, spread, steal) per run_query resample call."""
    calls = {"suite": 0, "query": []}
    requeries = list(requeries)

    def fake_suite(spark):
        t, s, st = passes[min(calls["suite"], len(passes) - 1)]
        calls["suite"] += 1
        return dict(t), dict(s), dict(st)

    def fake_query(spark, name):
        calls["query"].append(name)
        assert requeries, f"unexpected resample of {name}"
        return requeries.pop(0)

    monkeypatch.setattr(bench_mod, "run_suite", fake_suite)
    monkeypatch.setattr(bench_mod, "run_query", fake_query)
    bench_mod.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    verbose, compact = json.loads(lines[0]), json.loads(lines[-1])
    return calls, verbose, compact


def test_quiet_pass_runs_once_and_is_settled(bench, monkeypatch, capsys):
    quiet = _suite({"q_a": 1.0, "q_b": 2.0}, {"q_a": 0.05, "q_b": 0.08})
    calls, verbose, compact = _run(bench, monkeypatch, capsys, [quiet])
    assert calls["suite"] == 1
    assert calls["query"] == []
    assert compact["settled"] is True
    assert compact["resampled"] == 0
    assert verbose["passes"] == 1
    assert compact["value"] == 3.0
    assert len(json.dumps(compact)) < 2000


def test_noisy_query_resampled_quieter_triple_wins(bench, monkeypatch, capsys):
    # q_heavy's own spread (0.9) crosses PER_QUERY_THRESHOLD while the
    # suite median (3 quiet queries) stays quiet — the exact BENCH_r08
    # shape the old guard missed. The retry is quieter and must replace
    # the timing/spread/steal; the discarded triple is recorded.
    noisy_q = _suite(
        {"q_a": 1.0, "q_b": 2.0, "q_c": 1.0, "q_heavy": 12.0},
        {"q_a": 0.05, "q_b": 0.08, "q_c": 0.06, "q_heavy": 0.9},
    )
    calls, verbose, compact = _run(
        bench, monkeypatch, capsys, [noisy_q], requeries=[(4.7, 0.1, 0.2)]
    )
    assert calls["suite"] == 1
    assert calls["query"] == ["q_heavy"]
    assert compact["queries"]["q_heavy"] == 4.7
    assert compact["value"] == 8.7
    assert compact["settled"] is True
    assert compact["resampled"] == 1
    assert verbose["resampled"]["q_heavy"] == {
        "timing": 12.0, "spread": 0.9, "steal": 0.1,
    }
    assert verbose["unsettled_queries"] == []


def test_steal_contaminated_query_resampled_even_with_tight_spread(
    bench, monkeypatch, capsys
):
    # The r09 shape: a steal window slows all 3 samples of q_a uniformly —
    # spread 0.06 (quiet!) but its own steal reads 8% — and the recorded
    # level is 6x wrong. The steal tier must trigger the retry, and the
    # lower-steal triple must win even though its spread is higher.
    stolen = _suite(
        {"q_a": 6.9, "q_b": 2.0},
        {"q_a": 0.06, "q_b": 0.08},
        {"q_a": 8.0, "q_b": 0.1},
    )
    calls, verbose, compact = _run(
        bench, monkeypatch, capsys, [stolen], requeries=[(1.1, 0.2, 0.3)]
    )
    assert calls["query"] == ["q_a"]
    assert compact["queries"]["q_a"] == 1.1
    assert compact["settled"] is True
    assert verbose["resampled"]["q_a"] == {
        "timing": 6.9, "spread": 0.06, "steal": 8.0,
    }


def test_steal_contaminated_both_triples_unsettles(bench, monkeypatch, capsys):
    # Retry also lands in a steal window: keep the lower-spread triple of
    # the two contaminated ones, but the pass must NOT claim settled.
    stolen = _suite(
        {"q_a": 6.9, "q_b": 2.0},
        {"q_a": 0.06, "q_b": 0.08},
        {"q_a": 8.0, "q_b": 0.1},
    )
    calls, verbose, compact = _run(
        bench, monkeypatch, capsys, [stolen], requeries=[(7.2, 0.5, 9.0)]
    )
    assert compact["queries"]["q_a"] == 6.9  # lower spread among contaminated
    assert compact["settled"] is False
    assert verbose["unsettled_queries"] == ["q_a"]


def test_noisy_query_retry_noisier_keeps_first_and_unsettles(
    bench, monkeypatch, capsys
):
    noisy_q = _suite(
        {"q_a": 1.0, "q_b": 2.0, "q_c": 1.0, "q_heavy": 6.0},
        {"q_a": 0.05, "q_b": 0.08, "q_c": 0.06, "q_heavy": 0.7},
    )
    calls, verbose, compact = _run(
        bench, monkeypatch, capsys, [noisy_q], requeries=[(20.0, 1.3, 0.1)]
    )
    assert calls["query"] == ["q_heavy"]
    assert compact["queries"]["q_heavy"] == 6.0
    assert compact["settled"] is False
    assert verbose["resampled"]["q_heavy"] == {
        "timing": 20.0, "spread": 1.3, "steal": 0.1,
    }
    assert verbose["unsettled_queries"] == ["q_heavy"]


def test_noisy_first_pass_retries_and_keeps_quieter(bench, monkeypatch, capsys):
    noisy = _suite({"q_a": 9.0, "q_b": 9.0}, {"q_a": 0.4, "q_b": 0.4})
    quiet = _suite({"q_a": 1.0, "q_b": 2.0}, {"q_a": 0.05, "q_b": 0.08})
    calls, verbose, compact = _run(bench, monkeypatch, capsys, [noisy, quiet])
    assert calls["suite"] == 2
    assert compact["settled"] is True
    assert verbose["passes"] == 2
    # the quieter (second) pass's totals are what get recorded, and the
    # discarded pass's median is kept for the audit trail (ADVICE r08 #3)
    assert compact["value"] == 3.0
    assert verbose["rejected_spread_median"] == 0.4


def test_noisy_both_passes_reports_unsettled(bench, monkeypatch, capsys):
    noisy1 = _suite({"q_a": 9.0}, {"q_a": 0.45})
    noisy2 = _suite({"q_a": 5.0}, {"q_a": 0.3})
    calls, verbose, compact = _run(bench, monkeypatch, capsys, [noisy1, noisy2])
    assert calls["suite"] == 2
    assert compact["settled"] is False
    # quieter of the two still wins
    assert compact["value"] == 5.0
    assert compact["spread_median"] == 0.3
    assert verbose["rejected_spread_median"] == 0.45


def test_steal_pct_arithmetic_and_presence(bench, monkeypatch, capsys):
    # steal share between two /proc/stat snapshots: 5 steal ticks out of
    # 100 total elapsed = 5%; degenerate snapshots (None, zero elapsed)
    # return None instead of dividing
    assert bench.steal_pct((10, 1000), (15, 1100)) == 5.0
    assert bench.steal_pct(None, (15, 1100)) is None
    assert bench.steal_pct((10, 1000), (10, 1000)) is None
    quiet = _suite({"q_a": 1.0}, {"q_a": 0.05})
    _, verbose, compact = _run(bench, monkeypatch, capsys, [quiet])
    assert "steal_pct" in verbose and "steal_pct" in compact
    assert verbose["query_steal"] == {"q_a": 0.1}
