#!/usr/bin/env python
"""Isolated per-query timing for optimization A/Bs: warm each named
query once at sf0.01 (JIT/codegen), then time N noop-sink passes at
$SPARK_GRAFT_SF_DIR and report min/median — the same methodology as
bench.py, scoped to the queries under the knife.

Usage: python tools/time_queries.py [-n N] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if not args:
        print(__doc__)
        return 1
    from database_convertor_spark.plans.catalog import CATALOG
    from database_convertor_spark.session import get_spark

    spark = get_spark("time-queries")
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    for name in args:
        if os.path.isdir(warm_dir) and warm_dir != SF_DIR.rstrip("/"):
            CATALOG[name].builder(spark, warm_dir).write.format(
                "noop").mode("overwrite").save()
    for name in args:
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            CATALOG[name].builder(spark, SF_DIR).write.format(
                "noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(times)} median="
              f"{statistics.median(times)} all={times}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
