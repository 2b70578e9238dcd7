#!/usr/bin/env python
"""Certify a SUBSET of catalog queries against the DuckDB oracle —
same compare as tools/certify_catalog.py, for fast re-verification of
the queries an optimization touched.

Usage: python tools/certify_subset.py SF_DIR name [name ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_convertor_spark.plans.catalog import CATALOG  # noqa: E402
from database_convertor_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare, duck_connection  # noqa: E402


def main() -> int:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_spark("certify-subset", shuffle_partitions=16)
    con = duck_connection(sf_dir)
    fails = []
    t0 = time.time()
    for name in names:
        spec = CATALOG[name]
        try:
            df = spec.builder(spark, sf_dir)
            if spec.oracle is None:
                print(f"{name}: rows-only OK ({df.count()} rows)", flush=True)
                continue
            ok, msg = compare(df, con, spec.oracle)
            print(f"{name}: {msg}", flush=True)
            if not ok:
                fails.append((name, msg))
        except Exception as exc:  # noqa: BLE001 - certification must report
            print(f"{name}: ERROR {exc}", flush=True)
            fails.append((name, str(exc)[:200]))
    print(f"=== {len(names) - len(fails)}/{len(names)} OK "
          f"in {time.time() - t0:.0f}s ===")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
