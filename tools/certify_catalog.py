#!/usr/bin/env python
"""Local mirror of the driver's correctness gate over the FULL catalog:
every oracle query is compared cell-for-cell against DuckDB (row count
+ column names + order-insensitive values, tests/oracle_harness), and
every rows-only query is executed and must return >= 0 rows with a
stable schema.

Usage: python tools/certify_catalog.py [SF_DIR] [--window-only]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_convertor_spark.plans.catalog import CATALOG  # noqa: E402
from database_convertor_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = list(CATALOG)
    if "--window-only" in sys.argv:
        names = names[:50]
    spark = get_spark("certify", shuffle_partitions=16)
    con = duck_connection(sf_dir)
    fails, oracle_ok, rows_only = [], 0, 0
    t0 = time.time()
    for name in names:
        spec = CATALOG[name]
        try:
            df = spec.builder(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                rows_only += 1
                print(f"{name}: rows-only OK ({n} rows)", flush=True)
                continue
            ok, msg = compare(df, con, spec.oracle)
            print(f"{name}: {msg}", flush=True)
            if ok:
                oracle_ok += 1
            else:
                fails.append((name, msg))
        except Exception as exc:  # noqa: BLE001 - certification must report
            print(f"{name}: ERROR {exc}", flush=True)
            fails.append((name, str(exc)[:200]))
    print(f"\n=== {sf_dir}: {oracle_ok} oracle OK, {rows_only} rows-only OK, "
          f"{len(fails)} FAILED in {time.time() - t0:.0f}s ===")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
