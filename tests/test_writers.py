"""MERGE-upsert sink contract (reference S19: ON CONFLICT DO UPDATE)."""

from __future__ import annotations

import os

from database_convertor_spark.sources.writers import dedup_latest, merge_upsert


def test_merge_upsert_insert_then_update(spark, tmp_path):
    target = os.path.join(tmp_path, "companies")
    base = spark.createDataFrame(
        [("001", "Acme", 1), ("002", "Beta", 1)],
        ["company_number", "company_name", "version"])
    merge_upsert(spark, target, base, keys=["company_number"])

    updates = spark.createDataFrame(
        [("002", "Beta Renamed", 2), ("003", "Gamma", 1)],
        ["company_number", "company_name", "version"])
    result = merge_upsert(spark, target, updates, keys=["company_number"])

    rows = {r.company_number: (r.company_name, r.version)
            for r in result.collect()}
    assert rows == {"001": ("Acme", 1), "002": ("Beta Renamed", 2),
                    "003": ("Gamma", 1)}


def test_merge_upsert_idempotent(spark, tmp_path):
    target = os.path.join(tmp_path, "t")
    batch = spark.createDataFrame([("a", 1)], ["k", "v"])
    merge_upsert(spark, target, batch, keys=["k"])
    result = merge_upsert(spark, target, batch, keys=["k"])  # replay
    assert result.count() == 1


def test_dedup_latest(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)], ["k", "ts", "v"])
    out = {r.k: r.v for r in dedup_latest(df, ["k"], "ts").collect()}
    assert out == {"a": 20, "b": 30}


def test_write_training_shards_layout_and_roundtrip(spark, tmp_path):
    """Packed chunks land partitioned by (lang, shard) and round-trip
    losslessly; each partition directory exists for each assignment."""
    import os

    from database_convertor_spark.operators.curation import (
        assign_chunk_bins,
        chunk_documents,
    )
    from database_convertor_spark.sources.readers import read_table
    from database_convertor_spark.sources.writers import (
        write_training_shards,
    )

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    assigned = assign_chunk_bins(chunks, docs, budget=64, n_shards=2)
    out = os.path.join(tmp_path, "shards")
    write_training_shards(assigned, out)

    langs = {r.lang for r in assigned.select("lang").distinct().collect()}
    for lang in langs:
        assert os.path.isdir(os.path.join(out, f"lang={lang}"))

    back = spark.read.parquet(out)
    want = {tuple(sorted(r.asDict().items())) for r in assigned.collect()}
    got = {tuple(sorted(r.asDict().items())) for r in back.collect()}
    assert got == want

    # physical per-file order: each parquet file replays its bins in
    # (bin_id, doc_id, chunk_id) order — the training-loader contract
    import glob

    import pyarrow.parquet as pq

    for f in glob.glob(os.path.join(out, "lang=*", "shard=*", "*.parquet")):
        t = pq.read_table(f, columns=["bin_id", "doc_id", "chunk_id"])
        rows = list(zip(t["bin_id"].to_pylist(), t["doc_id"].to_pylist(),
                        t["chunk_id"].to_pylist()))
        assert rows == sorted(rows), f


# ----------------------------------------------------- stdlib xlsx codec
def test_xlsx_codec_roundtrip(tmp_path):
    """Pure-codec round-trip (no Spark): strings incl. XML-escapable
    chars and preserved whitespace, numbers, booleans, None holes,
    ragged rows."""
    from database_convertor_spark.sources.xlsx import read_xlsx, write_xlsx

    path = str(tmp_path / "t.xlsx")
    header = ["name", "n", "ok", "note"]
    rows = [
        ["a & b <c>", 1.5, True, " leading space"],
        ["plain", -2.0, False, None],
        [None, 0.0, None, 'quotes "here"'],
    ]
    write_xlsx(path, header, rows, sheet_name="My Sheet")
    h, got = read_xlsx(path, "My Sheet")
    assert h == header
    assert got == rows
    # index addressing resolves the same sheet
    assert read_xlsx(path, 0) == (h, got)
    import pytest

    with pytest.raises(ValueError, match="no sheet named"):
        read_xlsx(path, "Nope")


def test_excel_spark_roundtrip(spark, tmp_path):
    """S12/S17 un-gated in THIS image (no openpyxl): write_excel ->
    read_excel round-trips a Spark frame, complex columns riding as
    JSON like the CSV sink (C26)."""
    from pyspark.sql import functions as F

    from database_convertor_spark.sources.readers import read_excel
    from database_convertor_spark.sources.writers import write_excel

    df = spark.createDataFrame(
        [(1, "alice & co", 9.75, True, ["x", "y"]),
         (2, "bob <ltd>", -1.25, False, []),
         (3, None, 0.5, True, ["z"])],
        ["id", "name", "score", "flag", "tags"])
    path = str(tmp_path / "export.xlsx")
    write_excel(df, path, sheet_name="Export")
    back = read_excel(spark, path, "Export")
    got = sorted(map(tuple, back.collect()))
    assert got == [
        (1.0, "alice & co", 9.75, True, '["x","y"]'),
        (2.0, "bob <ltd>", -1.25, False, "[]"),
        (3.0, None, 0.5, True, '["z"]'),
    ]
    assert back.columns == df.columns


def test_xlsx_codec_property_roundtrip(tmp_path):
    """Hypothesis: any flat table of strings/floats/bools/None
    round-trips through the stdlib codec byte-for-value (NaN lands as
    an empty cell -> None, matching Excel semantics)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from database_convertor_spark.sources.xlsx import read_xlsx, write_xlsx

    # excel strips control chars; generate printable text (the writer
    # documents the strip — exercised separately in the golden test)
    cell = st.one_of(
        st.none(),
        st.text(alphabet=st.characters(min_codepoint=32,
                                       max_codepoint=0x2FF),
                max_size=20),
        st.floats(allow_nan=True, allow_infinity=False, width=32),
        st.booleans(),
    )

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.lists(cell, min_size=3, max_size=3),
                    min_size=1, max_size=6))
    def check(rows):
        path = str(tmp_path / "prop.xlsx")
        write_xlsx(path, ["a", "b", "c"], rows)
        _, got = read_xlsx(path)

        def norm(v):
            if isinstance(v, float) and math.isnan(v):
                return None
            if isinstance(v, bool) or v is None:
                return v
            if isinstance(v, float):
                return float(v)
            return str(v)

        assert got == [[norm(v) for v in row] for row in rows]

    check()


def test_xlsx_codec_integer_inference(tmp_path):
    """Round-6 ADVICE closure: integral cells (stored without a
    decimal point) come back as int — matching openpyxl/pandas
    inference, so the same file yields the same Spark schema whichever
    environment ingests it. Stored decimals stay float."""
    from database_convertor_spark.sources.xlsx import read_xlsx, write_xlsx

    path = str(tmp_path / "ints.xlsx")
    write_xlsx(path, ["i", "f", "neg"], [[7, 7.5, -3], [0, 2.0, -4]])
    _, rows = read_xlsx(path)
    assert rows == [[7, 7.5, -3], [0, 2.0, -4]]
    assert [type(v) for v in rows[0]] == [int, float, int]
    # 2.0 was WRITTEN as a decimal ('2.0') — it stays float
    assert type(rows[1][1]) is float


def test_xlsx_styled_export_in_stdlib_codec(spark, tmp_path):
    """S17 styling works WITHOUT openpyxl (round-7 closure of the S17
    remainder): bold-white-on-#366092 centered header + autofit column
    widths are legal plain SpreadsheetML — the zip carries the style
    parts, the sheet references them, and values still round-trip
    (styling is presentation-only)."""
    import zipfile

    from database_convertor_spark.sources.readers import read_excel
    from database_convertor_spark.sources.writers import write_excel
    from database_convertor_spark.sources.xlsx import read_xlsx

    df = spark.createDataFrame(
        [(1, "a-short", "x" * 80), (2, "b", "y")],
        ["id", "name", "long_text"])
    path = str(tmp_path / "styled.xlsx")
    write_excel(df, path, sheet_name="Companies", styled=True)

    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        assert "xl/styles.xml" in names
        styles = z.read("xl/styles.xml").decode()
        # the reference's header treatment (utils.py:88-92)
        assert "FF366092" in styles and "<b/>" in styles \
            and 'horizontal="center"' in styles
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        # header cells carry the style; width autofit caps at 50
        assert 'A1" s="1"' in sheet and "<cols>" in sheet
        assert 'width="50"' in sheet          # 80-char col capped
        assert 'width="4"' in sheet           # 'id' col: 2 + 2
    # values unaffected by styling
    h, rows = read_xlsx(path, "Companies")
    assert h == ["id", "name", "long_text"]
    assert rows == [[1, "a-short", "x" * 80], [2, "b", "y"]]
    back = read_excel(spark, path, "Companies")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))
