#!/usr/bin/env python
"""SemDeDup third-decade probe (round-9 verdict item 4): the cap
regime (`max_relabel_clusters` + `relabel_fit_rows`) was measured
ENGAGED at sf10 (200k vectors, 1.6x on 10x data); this runs the sf100
corner (2M vectors — 1000x the largest driver scale) with both
remedies live and records wall time + survivor accounting.

Usage: python tools/run_semdedup_probe.py .scratch/sf100 [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf100"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "96g")
             .config("spark.local.dir", os.environ.get(
                 "SPARK_LOCAL_DIRS", "/tmp"))
             .appName("semdedup-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from database_convertor_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        t0 = time.time()
        survivors = semantic_dedup(emb).count()
        el = time.time() - t0
    engaged = sorted({str(w.message)[:90] for w in caught})
    out = {"sf_dir": sf_dir, "n_vectors": n, "survivors": survivors,
           "wall_s": round(el, 1), "warnings": engaged}
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
