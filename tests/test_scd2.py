"""SCD2 history upsert: close-open-union semantics on parquet."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from database_convertor_spark.sources.writers import scd2_upsert

T1 = dt.datetime(2025, 1, 1)
T2 = dt.datetime(2025, 2, 1)
T3 = dt.datetime(2025, 3, 1)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, ["company_number", "company_status", "effective_at"])


def test_scd2_history(spark, tmp_path):
    path = os.path.join(tmp_path, "dim_companies")
    scd2_upsert(spark, path,
                _batch(spark, [("001", "active", T1), ("002", "active", T1)]),
                keys=["company_number"])
    # 001 changes status at T2; 002 untouched
    scd2_upsert(spark, path,
                _batch(spark, [("001", "dissolved", T2)]),
                keys=["company_number"])
    # 001 changes again at T3
    hist = scd2_upsert(spark, path,
                       _batch(spark, [("001", "restored", T3)]),
                       keys=["company_number"])

    rows = sorted(
        ((r.company_number, r.company_status, r.valid_from, r.valid_to,
          r.is_current) for r in hist.collect()))
    assert rows == [
        ("001", "active", T1, T2, False),
        ("001", "dissolved", T2, T3, False),
        ("001", "restored", T3, None, True),
        ("002", "active", T1, None, True),
    ]
    # point-in-time query: status of 001 as of mid-February
    asof = dt.datetime(2025, 2, 15)
    current_then = hist.filter(
        (F.col("company_number") == "001")
        & (F.col("valid_from") <= asof)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof)))
    assert [r.company_status for r in current_then.collect()] == ["dissolved"]


def test_scd2_replay_same_batch_is_stable(spark, tmp_path):
    path = os.path.join(tmp_path, "dim")
    b = _batch(spark, [("001", "active", T1)])
    scd2_upsert(spark, path, b, keys=["company_number"])
    hist = scd2_upsert(spark, path, b, keys=["company_number"])
    rows = [(r.company_status, r.valid_from, r.valid_to, r.is_current)
            for r in hist.collect()]
    # replaying the same version closes the old row at its own ts and
    # re-opens identically -> still exactly one current row, same ts
    current = [r for r in rows if r[3]]
    assert len(current) == 1 and current[0][1] == T1


def test_scd2_partition_scoped_history(spark, tmp_path):
    """Round-10: SCD2 with the hash-bucket partition contract — the
    close-open-union semantics are identical (a key's whole history
    lives in its bucket), and a batch touching one key leaves every
    other bucket's files physically untouched (inode/mtime)."""
    from .test_writers import _file_identity

    path = os.path.join(tmp_path, "dim")
    base = _batch(spark, [(f"{i:03d}", "active", T1) for i in range(40)])
    scd2_upsert(spark, path, base, keys=["company_number"],
                hash_buckets=16)
    assert any(d.startswith("_merge_bucket=") for d in os.listdir(path))
    before = _file_identity(path)

    # spec adopted from the sidecar (no kwargs on the second call)
    hist = scd2_upsert(spark, path,
                       _batch(spark, [("005", "dissolved", T2)]),
                       keys=["company_number"])
    rows = sorted((r.company_number, r.company_status, r.valid_to,
                   r.is_current)
                  for r in hist.filter("company_number = '005'").collect())
    assert rows == [("005", "active", T2, False),
                    ("005", "dissolved", None, True)]
    assert hist.count() == 41          # 40 open + 1 closed

    after = _file_identity(path)
    changed = {k.split("/")[0] for k in
               ((set(before) ^ set(after))
                | {k for k in before
                   if k in after and before[k] != after[k]})
               if k.startswith("_merge_bucket=")}
    assert len(changed) <= 1           # only 005's bucket rewritten
    same = {k: v for k, v in before.items()
            if k.split("/")[0] not in changed}
    for k, v in same.items():
        assert after.get(k) == v, k

    # history identical to an unpartitioned twin over the same batches
    flat = os.path.join(tmp_path, "flat")
    scd2_upsert(spark, flat, base, keys=["company_number"])
    twin = scd2_upsert(spark, flat,
                       _batch(spark, [("005", "dissolved", T2)]),
                       keys=["company_number"])
    got = sorted((r.company_number, r.company_status, r.valid_from,
                  r.valid_to, r.is_current) for r in hist.collect())
    want = sorted((r.company_number, r.company_status, r.valid_from,
                   r.valid_to, r.is_current) for r in twin.collect())
    assert got == want


def test_scd2_null_key_closes_history(spark, tmp_path):
    """A null-keyed key is one logical entity across batches (the same
    contract merge_upsert keeps via its null-safe anti-join): a new
    version must CLOSE the open null-keyed row, not pile up a second
    open row beside it. Plain `=` key joins silently do the latter."""
    schema = "company_number string, company_status string, " \
             "effective_at timestamp"
    path = os.path.join(tmp_path, "dim_null")
    scd2_upsert(spark, path,
                spark.createDataFrame(
                    [(None, "active", T1), ("002", "active", T1)], schema),
                keys=["company_number"])
    hist = scd2_upsert(spark, path,
                       spark.createDataFrame(
                           [(None, "dissolved", T2)], schema),
                       keys=["company_number"])
    rows = sorted(((r.company_number, r.company_status, r.valid_from,
                    r.valid_to, r.is_current) for r in hist.collect()),
                  key=lambda t: (t[0] or "", t[2]))
    assert rows == [
        (None, "active", T1, T2, False),
        (None, "dissolved", T2, None, True),
        ("002", "active", T1, None, True),
    ]
    # and under the hash-bucket contract: xxhash64 over the casted key
    # maps NULL deterministically, so the null key's history stays in
    # one bucket and still closes correctly
    bpath = os.path.join(tmp_path, "dim_null_bucketed")
    scd2_upsert(spark, bpath,
                spark.createDataFrame(
                    [(None, "active", T1), ("002", "active", T1)], schema),
                keys=["company_number"], hash_buckets=8)
    bhist = scd2_upsert(spark, bpath,
                        spark.createDataFrame(
                            [(None, "dissolved", T2)], schema),
                        keys=["company_number"])
    brows = sorted(((r.company_number, r.company_status, r.valid_from,
                     r.valid_to, r.is_current) for r in bhist.collect()),
                   key=lambda t: (t[0] or "", t[2]))
    assert brows == rows
