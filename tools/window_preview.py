"""Preview the driver's next correctness-sample window.

The round driver samples the FIRST 50 keys of ``__spark_entry__.queries()``
in dict order into CORRECTNESS_r{N}.json. ``registry._rotated()`` re-keys
the dict at import time from the CORRECTNESS_r*.json files present at the
repo root: gate-FAILED keys first (re-verify fixes), then never-confirmed
lead/rest, then confirmed. This tool prints that projected window plus the
coverage ledger, so a session can sanity-check rotation health before the
driver snapshot (e.g. after dropping in a new CORRECTNESS file or editing
registry._LEAD).

Usage: python tools/window_preview.py [--n 50]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50, help="window size")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from proxyhouse_spark.registry import _gate_results

    keys = list(entrymod.queries())
    passed, failed, _latest = _gate_results()
    sampled = passed | set(failed)

    window = keys[: args.n]
    print(f"registry: {len(keys)} queries")
    print(
        f"driver history: {len(sampled)} sampled, {len(passed)} confirmed, "
        f"{len(failed)} failed ({', '.join(failed) or '-'})"
    )
    print(f"never sampled: {len([k for k in keys if k not in sampled])}")
    wasted = [k for k in window if k in passed]
    print(f"\nnext {args.n}-key window ({len(wasted)} already-confirmed slots"
          f"{': ' + ', '.join(wasted) if wasted else ''}):")
    for i, k in enumerate(window):
        tag = "RETRY" if k in failed else ("dup" if k in passed else "new")
        print(f"  {i:2d} {k} [{tag}]")
    return 1 if wasted else 0


if __name__ == "__main__":
    sys.exit(main())
