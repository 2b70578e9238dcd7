"""Readers — SURVEY §2.1 (S11-S15) re-expressed Spark-first.

Every reader returns a DataFrame with an explicit schema where one is
known; schema inference is reserved for exploratory edge ingestion
(the reference's CSV-upload path, app.py:2064-2120, accesses columns
defensively — Spark's PERMISSIVE mode + ``_corrupt_record`` is the
equivalent).

At 100 TB the parquet reader is the hot path: keeping it a plain
``spark.read.parquet`` call means Catalyst gives predicate pushdown,
column pruning and partition pruning on every query downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_SCHEMAS

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Schema comes from the parquet footer;
    TESTDATA_SCHEMAS documents the expected shape.

    events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; read the nanos as long
    (spark.sql.legacy.parquet.nanosAsLong) and rebuild the timestamp at
    microsecond precision — same truncation DuckDB applies, so the
    oracle sees identical values. Still a native columnar scan."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for the SQL API)."""
    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV reader (reference S11: pd.read_csv of uploads, app.py:2071).

    PERMISSIVE + _corrupt_record gives the reference's defensive
    .get(...) behavior: malformed rows land in a side column instead of
    failing the job."""
    reader = (spark.read.option("header", "true")
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record"))
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines reader (reference: raw API payload landing)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_excel(spark: SparkSession, path: str, sheet_name: str | int = 0) -> DataFrame:
    """Excel reader (reference S12: pd.read_excel, barnet_resolve script).

    Spark has no built-in Excel source; route through pandas on the
    driver (Excel files are small, driver-side by nature) and hand the
    result to the Arrow createDataFrame path. Prefers pd.read_excel
    (openpyxl engine — full format support); when openpyxl is absent
    (this image) falls back to the stdlib SpreadsheetML codec
    (sources/xlsx.py: zipfile + xml.etree — flat sheets, shared/inline
    strings, numbers, booleans)."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:  # openpyxl not in the image: stdlib fallback
        from .xlsx import read_xlsx

        header, rows = read_xlsx(path, sheet_name)
        pdf = pd.DataFrame(rows, columns=header)
    return spark.createDataFrame(pdf)


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 16,
              lower_bound=None, upper_bound=None, **options) -> DataFrame:
    """JDBC full-table read (reference S13: pd.read_sql_table,
    database.py:501-504). Partitioned read options are mandatory at
    scale — a single-connection JDBC scan does not survive 100 TB."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
