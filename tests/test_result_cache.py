"""Plan-keyed cross-session result cache (SURVEY §4 result caching /
C29 canonical cache keys)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from database_convertor_spark.plans.cache import ResultCache, plan_cache_key
from database_convertor_spark.sources.readers import read_table

from .conftest import SF_SMALL


def _query(spark):
    return (read_table(spark, SF_SMALL, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n")))


def test_same_plan_same_key_different_plan_different_key(spark):
    k1 = plan_cache_key(_query(spark))
    k2 = plan_cache_key(_query(spark))
    assert k1 == k2
    k3 = plan_cache_key(_query(spark).filter(F.col("n") > 0))
    assert k3 != k1


def test_get_or_compute_roundtrip_and_hit(spark, tmp_path):
    cache = ResultCache(str(tmp_path / "cache"))
    df = _query(spark)
    first = cache.get_or_compute(spark, df)
    want = sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, first.collect())) == want
    # second call must be served from the cached parquet
    entries = os.listdir(cache.root)
    assert len(entries) == 1
    again = cache.get_or_compute(spark, _query(spark))
    assert sorted(map(tuple, again.collect())) == want
    assert os.listdir(cache.root) == entries


def test_ttl_expiry_recomputes(spark, tmp_path):
    cache = ResultCache(str(tmp_path / "cache"), ttl_seconds=0.0)
    cache.get_or_compute(spark, _query(spark))
    out = cache.get_or_compute(spark, _query(spark))  # expired -> recompute
    assert out.count() > 0
