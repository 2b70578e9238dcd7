#!/usr/bin/env python
"""Measure that partition-scoped MERGE cost rides the batch's
touched-partition count, not the table size (the round-10 rework of
sources/writers.merge_upsert — previously every merge staged and
rewrote the ENTIRE table, the repo's last O(table)-per-batch sink).

Protocol, per table scale (rows = SMALL, 10x SMALL):

1. build a hash-bucketed warehouse table (256 buckets — the
   schemas.MERGE_PARTITION_SPECS default for companies) and an
   UNPARTITIONED twin of the same rows;
2. merge the same K-key batch into both, timing wall clock and
   counting bytes physically rewritten (files whose (inode, mtime,
   size) changed, plus new files);
3. repeat with a larger batch to show scoped cost scales with the
   batch's bucket coverage.

Expected shape: the unpartitioned merge rewrites ~100% of table bytes
at every scale (and its time grows with the table); the scoped merge
rewrites ~touched_buckets/256 of the table, and for a fixed batch its
rewritten-bytes fraction is CONSTANT across table scales. A batch of
K random keys touches <= K buckets (~K for K << 256), so weekly-style
incremental batches (the reference's 258-company anecdote,
weekly_scheduler.py:253-425) stop paying for the warehouse they did
not touch.

Usage: python tools/run_merge_probe.py [--small-rows 2000000]
         [--out .scratch/merge_probe.json]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_convertor_spark.session import get_spark  # noqa: E402
from database_convertor_spark.sources.writers import (  # noqa: E402
    merge_upsert,
)

BUCKETS = 256


def _file_identity(root: str) -> dict[str, tuple]:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_ino, st.st_mtime_ns,
                                             st.st_size)
    return out


def _rewritten_bytes(before: dict, after: dict) -> int:
    """Bytes of files that are new or physically replaced."""
    return sum(v[2] for k, v in after.items()
               if before.get(k) != v)


def _table_bytes(ident: dict) -> int:
    return sum(v[2] for v in ident.values())


def _mk_rows(spark, n: int):
    # ~220 B/row payload so table bytes are parquet-realistic
    return (spark.range(n)
            .select(F.format_string("C%09d", F.col("id"))
                    .alias("company_number"),
                    F.format_string("company name %d", F.col("id"))
                    .alias("company_name"),
                    F.sha2(F.col("id").cast("string"), 256).alias("blob1"),
                    F.sha2((F.col("id") + 1).cast("string"), 256)
                    .alias("blob2"),
                    (F.col("id") % 97).alias("score")))


def _mk_batch(spark, k: int, n: int):
    # k existing keys (updates) spread uniformly + k//4 fresh inserts
    upd = (spark.range(k)
           .select(F.format_string("C%09d", (F.col("id") * (n // k)))
                   .alias("company_number")))
    ins = (spark.range(k // 4 + 1)
           .select(F.format_string("N%09d", F.col("id"))
                   .alias("company_number")))
    return (upd.unionByName(ins)
            .withColumn("company_name", F.lit("updated name"))
            .withColumn("blob1", F.sha2(F.col("company_number"), 256))
            .withColumn("blob2", F.lit("fresh"))
            .withColumn("score", F.lit(-1)))


def _probe_scale(spark, scratch: str, rows: int, batches: list[int]) -> dict:
    res = {"table_rows": rows, "merges": []}
    base = _mk_rows(spark, rows)

    scoped_path = os.path.join(scratch, f"scoped_{rows}")
    flat_path = os.path.join(scratch, f"flat_{rows}")
    for p in (scoped_path, flat_path):
        if os.path.exists(p):
            shutil.rmtree(p)
    merge_upsert(spark, scoped_path, base, keys=["company_number"],
                 hash_buckets=BUCKETS)
    merge_upsert(spark, flat_path, base, keys=["company_number"])
    res["table_mb"] = round(_table_bytes(_file_identity(scoped_path)) / 2**20, 1)

    for k in batches:
        batch = _mk_batch(spark, k, rows)
        row = {"batch_keys": k}
        for label, path, kw in (
                ("scoped", scoped_path, {"hash_buckets": BUCKETS}),
                ("full", flat_path, {})):
            before = _file_identity(path)
            t0 = time.perf_counter()
            merge_upsert(spark, path, batch, keys=["company_number"], **kw)
            dt = time.perf_counter() - t0
            after = _file_identity(path)
            rw = _rewritten_bytes(before, after)
            row[label] = {
                "sec": round(dt, 2),
                "rewritten_mb": round(rw / 2**20, 2),
                "rewritten_frac": round(rw / max(_table_bytes(after), 1), 4),
            }
        res["merges"].append(row)
        print(json.dumps(row), flush=True)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-rows", type=int, default=2_000_000)
    ap.add_argument("--out", default=".scratch/merge_probe.json")
    args = ap.parse_args()
    os.makedirs(".scratch", exist_ok=True)
    scratch = ".scratch/merge_probe"
    os.makedirs(scratch, exist_ok=True)
    spark = get_spark("merge_probe")

    results = []
    for rows in (args.small_rows, args.small_rows * 10):
        print(f"== table_rows={rows}", flush=True)
        results.append(_probe_scale(spark, scratch, rows, batches=[8, 258]))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
