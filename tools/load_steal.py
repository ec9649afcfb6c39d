"""Measure hypervisor steal UNDER LOAD — the probe that actually
predicts bench weather.

r10 finding: idle-window steal probes (two /proc/stat reads around a
sleep) do NOT predict in-run contention. Steal ticks only accrue while
this guest's vCPUs are runnable-but-not-running, so an idle host reads
~0% steal even when the co-tenant would contend the moment load
starts. Measured back-to-back on 2026-08-17: idle probe 0.3%,
immediately followed by this probe reading 24.9% — and seven
consecutive bench runs launched from "idle-quiet" windows all refused
to settle. Gate timing runs on THIS probe (e.g. two consecutive reads
< 1.5%), not on idle steal.

Usage: python tools/load_steal.py [seconds]     # default 6
Prints one number: steal percent over a full-width CPU burn.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time


def _burn(stop_t: float) -> float:
    x = 1.0
    while time.time() < stop_t:
        for _ in range(100000):
            x = x * 1.0000001 + 1e-9
    return x


def _read() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        p = fh.readline().split()
    return int(p[8]), sum(int(v) for v in p[1:])


def loaded_steal_pct(seconds: float = 6.0, workers: int | None = None) -> float:
    """Steal percent measured while `workers` processes spin full-tilt."""
    n = workers or os.cpu_count() or 1
    stop_t = time.time() + seconds
    s1, t1 = _read()
    with mp.Pool(n) as pool:
        pool.map(_burn, [stop_t] * n)
    s2, t2 = _read()
    return round(100.0 * (s2 - s1) / max(1, (t2 - t1)), 2)


if __name__ == "__main__":
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    print(loaded_steal_pct(dur))
