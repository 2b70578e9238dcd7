"""Outline-detection golden cases (reference utils.py:367-426 doc
examples — the SURVEY §5 test vectors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_convertor_spark.functions.planning import (
    is_outline,
    outline_detection_method,
)

CASES = [
    # (application_type, reference, description, expect, method)
    ("Outline Planning Permission", "24/01234/FUL", "new dwellings",
     True, "application_type"),
    ("Full", "24/00001/OUT", "erection of houses",
     True, "reference_pattern"),
    ("Full", "24/00002/OUTL", "erection of houses",
     True, "reference_pattern"),
    ("Full", "24/OUT/0003", "erection of houses",
     True, "reference_pattern"),
    ("Full", "24/00004/FUL", "Outline application for 12 dwellings",
     True, "description_phrase"),
    ("Full", "24/00005/FUL", "development with all matters reserved",
     True, "description_phrase"),
    ("Full", "24/00006/FUL", "full planning permission for extension",
     False, None),
    (None, None, None, False, None),
    # 'ROUTE' contains OUT but reference rung needs suffix/segment
    ("Full", "24/ROUTE/1", "road scheme", False, None),
]


def test_is_outline_golden_cases(spark):
    df = spark.createDataFrame(
        [(t, r, d) for t, r, d, _, _ in CASES],
        ["application_type", "reference", "description"])
    out = df.select(
        is_outline(F.col("application_type"), F.col("reference"),
                   F.col("description")).alias("o"),
        outline_detection_method(F.col("application_type"), F.col("reference"),
                                 F.col("description")).alias("m")).collect()
    for (t, r, d, expect, method), row in zip(CASES, out):
        assert row.o == expect, (t, r, d)
        assert row.m == method, (t, r, d)


def test_outline_predicate_is_pushable(spark, tmp_path):
    """The filter must reach the parquet scan as data filters (the
    reference needed a second, hand-written ES query for this)."""
    df = spark.createDataFrame(
        [("Outline", "X/OUT", "outline planning"), ("Full", "X/FUL", "n")],
        ["application_type", "reference", "description"])
    path = str(tmp_path / "apps")
    df.write.parquet(path)
    q = spark.read.parquet(path).filter(
        is_outline(F.col("application_type"), F.col("reference"),
                   F.col("description")))
    assert q.count() == 1
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "DataFilters: [" in plan and "Contains" in plan
