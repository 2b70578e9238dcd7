"""Rate-limited mapInPandas enrichment harness (SURVEY S3/S4/S10)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from database_convertor_spark.sources.enrichment import (
    FlakyResolver,
    MockCompanyResolver,
    RateLimiter,
    enrich,
)

FIELDS = {"status": "string", "n_officers": "int", "has_charges": "boolean"}


def _companies(spark, n=20):
    return spark.range(n).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("company_number"))


def test_enrich_attaches_columns(spark):
    out = enrich(_companies(spark), "company_number",
                 MockCompanyResolver, FIELDS, num_partitions=4)
    rows = out.collect()
    assert len(rows) == 20
    assert set(out.columns) == {"company_number", "status", "n_officers",
                                "has_charges"}
    assert all(r.status in ("active", "dissolved") for r in rows)


def test_enrich_deterministic_across_runs(spark):
    a = {r.company_number: r.n_officers for r in
         enrich(_companies(spark), "company_number",
                MockCompanyResolver, FIELDS, num_partitions=4).collect()}
    b = {r.company_number: r.n_officers for r in
         enrich(_companies(spark), "company_number",
                MockCompanyResolver, FIELDS, num_partitions=2).collect()}
    assert a == b  # same values regardless of partitioning


def test_retry_then_success(spark):
    out = enrich(_companies(spark, 5), "company_number",
                 lambda: FlakyResolver(MockCompanyResolver(), fail_times=1),
                 FIELDS, num_partitions=1, max_retries=2)
    assert all(r.status is not None for r in out.collect())


def test_exhausted_retries_yield_nulls_not_failure(spark):
    out = enrich(_companies(spark, 5), "company_number",
                 lambda: FlakyResolver(MockCompanyResolver(), fail_times=99),
                 FIELDS, num_partitions=1, max_retries=1)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r.status is None for r in rows)  # error side-output, no crash


def test_rate_limiter_spacing():
    rl = RateLimiter(rate_per_sec=50)  # 20ms interval
    t0 = time.monotonic()
    for _ in range(5):
        rl.wait()
    assert time.monotonic() - t0 >= 0.08  # 4 gaps x 20ms


def test_rate_limit_applies_per_batch(spark):
    t0 = time.monotonic()
    enrich(_companies(spark, 20), "company_number", MockCompanyResolver,
           FIELDS, rate_per_sec=20, batch_size=5, num_partitions=1).collect()
    # 4 batches in one partition at 20/s -> >= 150ms of spacing
    assert time.monotonic() - t0 >= 0.15


def test_resolve_grouped_one_call_per_group(spark):
    """S9: supported-group filter, one resolver call per group, result
    alignment, and N/A degradation for a failing group."""
    from database_convertor_spark.sources.enrichment import (
        FlakyResolver,
        MockUrlResolver,
        resolve_grouped,
    )
    rows = spark.createDataFrame(
        [("barnet", "R1"), ("barnet", "R2"), ("camden", "R3"),
         ("unsupported", "R4")],
        ["borough", "ref"])
    out = resolve_grouped(
        rows, "borough", "ref", MockUrlResolver, ["barnet", "camden"])
    got = {r.ref: r.url for r in out.collect()}
    # unsupported borough dropped (reference returns [] for it)
    assert "R4" not in got
    assert got == {"R1": "https://planning.example/R1",
                   "R2": "https://planning.example/R2",
                   "R3": "https://planning.example/R3"}

    # a group whose service call keeps failing degrades to N/A rows
    # (fail_times > max_retries), never a job failure
    broken = resolve_grouped(
        rows, "borough", "ref",
        lambda: FlakyResolver(MockUrlResolver(), fail_times=10),
        ["barnet"], max_retries=1)
    assert {r.url for r in broken.collect()} == {"N/A"}
