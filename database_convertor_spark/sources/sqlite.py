"""SQLite ingestion (reference S13/S15: pd.read_sql_table /
database_sqlite_backup.py reads; migrate_data.py's SQLite -> warehouse
migration).

Spark's JDBC source needs a SQLite JDBC jar that is not in this image,
so the reader goes sqlite3 -> Arrow -> DataFrame on the driver. SQLite
files are single-machine by nature (the reference's was ~MBs), so a
driver-side read is the honest scale story; a 100 TB source would be a
real database behind the partitioned JDBC reader in readers.read_jdbc."""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession


def read_sqlite(spark: SparkSession, db_path: str, query: str) -> DataFrame:
    """Run ``query`` against the SQLite file and land it as a DataFrame
    (Arrow createDataFrame path)."""
    import pandas as pd

    with sqlite3.connect(db_path) as con:
        pdf = pd.read_sql_query(query, con)
    return spark.createDataFrame(pdf)


def list_sqlite_tables(db_path: str) -> list[str]:
    with sqlite3.connect(db_path) as con:
        rows = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'").fetchall()
    return [r[0] for r in rows]


def migrate_sqlite_to_warehouse(spark: SparkSession, db_path: str,
                                engine, table_map: dict[str, str]) -> dict[str, int]:
    """migrate_data.py's flow: read each legacy table, upsert into the
    warehouse on the table's MERGE key contract. Returns row counts."""
    out = {}
    for src, dst in table_map.items():
        df = read_sqlite(spark, db_path, f"SELECT * FROM {src}")
        merged = engine.upsert(dst, df)
        out[dst] = merged.count()
    return out
