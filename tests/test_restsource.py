"""Python Data Source (paged REST-style scan) — partitioned pagination,
server-side filter pushdown, residual filter correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_convertor_spark.sources.restsource import (
    MockCompaniesAPI,
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _expected(total, status=None, sic=None):
    rows = []
    for page in range(total // 100):
        rows += MockCompaniesAPI.fetch_page(page, 100, status, sic)
    return rows


def test_full_scan_parallel_pages(spark):
    df = spark.read.format("companies_api").option("total", "600").load()
    assert df.count() == 600
    # 6 pages / 2 pages-per-partition -> 3 parallel partitions
    assert df.rdd.getNumPartitions() == 3


def test_status_filter_pushed_to_source(spark):
    df = (spark.read.format("companies_api").option("total", "500").load()
          .filter(F.col("company_status") == "active"))
    got = {r.company_number for r in df.collect()}
    want = {r[0] for r in _expected(500, status="active")}
    assert got == want
    # the pushed equality must be gone from the residual Spark filter
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "= active" not in plan


def test_residual_filter_stays_spark_side(spark):
    df = (spark.read.format("companies_api").option("total", "500").load()
          .filter((F.col("sic_code") == "41100")
                  & F.col("company_name").endswith("7 LIMITED")))
    got = {r.company_number for r in df.collect()}
    want = {r[0] for r in _expected(500, sic="41100")
            if r[1].endswith("7 LIMITED")}
    assert got == want


def test_combined_pushed_filters(spark):
    df = (spark.read.format("companies_api").option("total", "1000").load()
          .filter((F.col("company_status") == "dissolved")
                  & (F.col("sic_code") == "68100")))
    want = {r[0] for r in _expected(1000, status="dissolved", sic="68100")}
    assert {r.company_number for r in df.collect()} == want
