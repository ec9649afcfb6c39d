"""bench.py settle guard (VERDICT r07 next-round #3).

The driver's per-round bench is a single shot with no noise defense; r07
proved the shared host can inject ±25% phantom swings into the recorded
suite total. bench.py therefore re-runs the suite once when the per-query
spread median crosses SETTLE_THRESHOLD, keeps the quieter pass, and stamps
``settled`` into the compact line so BENCH_r0N.json readers can tell a
regression from a shadowed measurement. These tests drive main() with a
stubbed suite runner — no Spark session — and pin:

- quiet pass: one suite run, settled=true;
- noisy-then-quiet: exactly two runs, the quieter pass's timings win;
- noisy-twice: settled=false reaches the compact line;
- the compact line stays under the driver's 2000-char tail window with the
  new field present.
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


def _run(bench_mod, monkeypatch, capsys, passes):
    """Drive main() with scripted (timings, spreads) per suite pass."""
    calls = {"n": 0}

    def fake_suite(spark):
        result = passes[min(calls["n"], len(passes) - 1)]
        calls["n"] += 1
        return result

    monkeypatch.setattr(bench_mod, "run_suite", fake_suite)
    bench_mod.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    verbose, compact = json.loads(lines[0]), json.loads(lines[-1])
    return calls["n"], verbose, compact


def test_quiet_pass_runs_once_and_is_settled(bench, monkeypatch, capsys):
    quiet = ({"q_a": 1.0, "q_b": 2.0}, {"q_a": 0.05, "q_b": 0.08})
    n, verbose, compact = _run(bench, monkeypatch, capsys, [quiet])
    assert n == 1
    assert compact["settled"] is True
    assert verbose["passes"] == 1
    assert compact["value"] == 3.0
    assert len(json.dumps(compact)) < 2000


def test_noisy_first_pass_retries_and_keeps_quieter(bench, monkeypatch, capsys):
    noisy = ({"q_a": 9.0, "q_b": 9.0}, {"q_a": 0.9, "q_b": 0.4})
    quiet = ({"q_a": 1.0, "q_b": 2.0}, {"q_a": 0.05, "q_b": 0.08})
    n, verbose, compact = _run(bench, monkeypatch, capsys, [noisy, quiet])
    assert n == 2
    assert compact["settled"] is True
    assert verbose["passes"] == 2
    # the quieter (second) pass's totals are what get recorded
    assert compact["value"] == 3.0


def test_noisy_both_passes_reports_unsettled(bench, monkeypatch, capsys):
    noisy1 = ({"q_a": 9.0}, {"q_a": 0.9})
    noisy2 = ({"q_a": 5.0}, {"q_a": 0.5})
    n, verbose, compact = _run(bench, monkeypatch, capsys, [noisy1, noisy2])
    assert n == 2
    assert compact["settled"] is False
    # quieter of the two still wins
    assert compact["value"] == 5.0
    assert compact["spread_median"] == 0.5
