#!/usr/bin/env python
"""Warm single-query latency probe for the index-backed hybrid
endpoint (round-9 verdict item 5): SCALE.md's r8 rows measured the
per-query cost FLAT across a decade but ~4-5 s absolute — plan-compile
+ probe-job overhead, poor for an interactive endpoint. Round 9 moved
probe selection driver-side and memoized the sidecar parses + ADC rank
expressions per (session, index mtime); this measures cold-vs-warm
single-query latency on landed indexes over the scratch corpus, plus
the batched `_many` per-query amortization, and asserts results are
byte-identical between the first (cold) and later (warm) calls.

Usage: python tools/run_warm_latency_probe.py .scratch/sf1 [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "96g")
             .appName("warm-latency-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from database_convertor_spark.operators.search import (
        hybrid_search_rrf_indexed, hybrid_search_rrf_indexed_many)
    from database_convertor_spark.operators.similarity_search import (
        land_ivfpq_index)
    from database_convertor_spark.operators.search import land_text_index

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    work = os.path.join(os.path.dirname(sf_dir.rstrip("/")) or ".",
                        "warm_probe_idx")
    tpath, apath = os.path.join(work, "text"), os.path.join(work, "ann")
    t0 = time.time()
    land_text_index(docs, tpath)
    land_ivfpq_index(embs, apath)
    land_s = round(time.time() - t0, 1)

    qrows = embs.orderBy("vec_id").limit(20).collect()
    qvecs = [[float(x) for x in r.embedding] for r in qrows]
    queries = [f"data pipeline quality {i}" for i in range(len(qvecs))]

    lat, first_rows = [], None
    for i in range(6):
        t0 = time.time()
        rows = sorted(map(tuple, hybrid_search_rrf_indexed(
            spark, tpath, apath, queries[0], qvecs[0], embs,
            top_k=25).collect()), key=lambda t: tuple(
                (v is None, v) for v in t))
        lat.append(round(time.time() - t0, 2))
        if first_rows is None:
            first_rows = rows
        assert rows == first_rows, "warm call changed results"

    t0 = time.time()
    n = hybrid_search_rrf_indexed_many(
        spark, tpath, apath, queries, qvecs, embs, top_k=25).count()
    many_s = round(time.time() - t0, 2)

    out = {"sf_dir": sf_dir, "land_s": land_s, "cold_s": lat[0],
           "warm_s": lat[1:], "warm_min_s": min(lat[1:]),
           "many20_s": many_s, "many20_per_query_s": round(many_s / 20, 2),
           "many_rows": n, "results_stable": True}
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            json.dump(out, fh, indent=1)
    import shutil
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
