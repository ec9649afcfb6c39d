"""Dump .explain("formatted") for named queries to plans/<tag>/<q>_<suffix>.txt.

Optimization-round evidence tool: captures the full formatted physical
plan (not just the tree — PushedFilters / ReadSchema / join build sides
are the claims being checked) for each named query, or the whole
headline suite when no names are given.

Usage:
    python tools/explain_dump.py --tag r10 --suffix before [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

from bench import HEADLINE, SF_DIR  # noqa: E402
from proxyhouse_spark import registry  # noqa: E402
from proxyhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or HEADLINE
    out_dir = os.path.join("/root/repo/plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_dump")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} chars -> {path}")


if __name__ == "__main__":
    main()
