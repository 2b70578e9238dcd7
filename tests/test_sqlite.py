"""SQLite ingestion + migration to the warehouse (S13/S15,
migrate_data.py flow)."""

from __future__ import annotations

import sqlite3

import pytest

from database_convertor_spark.api import Engine
from database_convertor_spark.sources.sqlite import (
    list_sqlite_tables,
    migrate_sqlite_to_warehouse,
    read_sqlite,
)


@pytest.fixture()
def legacy_db(tmp_path):
    path = str(tmp_path / "legacy.db")
    with sqlite3.connect(path) as con:
        con.execute("""CREATE TABLE legacy_companies (
            id INTEGER, company_number TEXT, company_name TEXT)""")
        con.executemany(
            "INSERT INTO legacy_companies VALUES (?, ?, ?)",
            [(1, "00000001", "ACME LIMITED"),
             (2, "00000002", "BETA PLC"),
             (2, "00000002", "BETA PLC")])  # legacy dup, MERGE collapses
    return path


def test_read_and_list(spark, legacy_db):
    assert list_sqlite_tables(legacy_db) == ["legacy_companies"]
    df = read_sqlite(spark, legacy_db, "SELECT * FROM legacy_companies")
    assert df.count() == 3


def test_migrate_to_warehouse(spark, legacy_db, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    counts = migrate_sqlite_to_warehouse(
        spark, legacy_db, eng, {"legacy_companies": "companies"})
    assert counts == {"companies": 2}  # dup collapsed on company_number
    names = {r.company_name for r in eng.table("companies").collect()}
    assert names == {"ACME LIMITED", "BETA PLC"}
