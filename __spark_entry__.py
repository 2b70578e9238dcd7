"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the shared-supplier graph
edges — the Spark transposition of the reference's shared-officer
network, DatabaseConverter/database.py:666-695) on sf0.001.

``queries()`` / ``oracle_sql()`` are generated from
``database_convertor_spark.plans.catalog.CATALOG`` — the single source
of truth binding each implemented SURVEY §2 operator to its Spark
builder and DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from database_convertor_spark.plans.catalog import CATALOG

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return CATALOG["shared_supplier_pairs"].builder(spark, SF0001)


def _wrap(builder: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # the Python-data-source reader implements pushFilters, which
        # errors if this (runtime-settable) conf is off in the host session
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        return builder(spark, sf_dir)
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(spec.builder) for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in CATALOG.items()
            if spec.oracle is not None}
