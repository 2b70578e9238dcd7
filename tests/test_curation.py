"""Corpus-curation operator semantics: decontamination, boilerplate
line removal, PII redaction, deterministic stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_convertor_spark.operators.curation import (
    benchmark_contamination,
    decontaminate,
    redact_pii,
    remove_boilerplate_lines,
    stratified_sample,
)


def test_decontaminate_drops_shingle_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely unrelated text about spark physical plans"),
         (3, "shares no five gram with anything else in this corpus")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        ["bench_id", "text"])
    hits = benchmark_contamination(docs, bench, shingle_n=5)
    got = {(r.doc_id, r.bench_id): r.n_shared_shingles for r in hits.collect()}
    # doc 1 shares 'the quick brown fox jumps' (and 'quick brown fox
    # jumps over') with the benchmark
    assert got[(1, 100)] >= 1
    assert all(d == 1 for d, _ in got)
    kept = {r.doc_id for r in decontaminate(docs, bench).collect()}
    assert kept == {2, 3}


def test_boilerplate_lines_removed_order_preserved(spark):
    banner = "ACCEPT COOKIES"
    rows = [(i, f"{banner}\nunique line {i} alpha\nunique line {i} beta")
            for i in range(1, 7)]
    rows.append((7, "no banner here\njust content"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text
           for r in remove_boilerplate_lines(docs, min_docs=5).collect()}
    assert out[3] == "unique line 3 alpha\nunique line 3 beta"  # order kept
    assert out[7] == "no banner here\njust content"             # untouched
    assert all(banner not in t for t in out.values())


def test_boilerplate_blank_lines_never_counted(spark):
    docs = spark.createDataFrame(
        [(i, f"top {i}\n\nbottom {i}") for i in range(1, 9)],
        ["doc_id", "text"])
    out = {r.doc_id: r.text
           for r in remove_boilerplate_lines(docs, min_docs=5).collect()}
    assert out[1] == "top 1\n\nbottom 1"  # the blank line survives


def test_redact_pii_goldens(spark):
    df = spark.createDataFrame(
        [("mail jane.doe+spam@sub.example.co.uk now",),
         ("call +44 20 7946 0958 or 020 7946 0958",),
         ("nothing to redact here",)],
        ["text"])
    got = [r.out for r in df.select(redact_pii(F.col("text")).alias("out"))
           .collect()]
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "call <PHONE> or <PHONE>"
    assert got[2] == "nothing to redact here"


def test_stratified_sample_deterministic_and_exclusive(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(1000)],
        ["doc_id", "lang"])
    frac = {"en": 0.5, "fr": 0.0}
    a = {r.doc_id for r in stratified_sample(docs, frac).collect()}
    b = {r.doc_id for r in
         stratified_sample(docs.repartition(7), frac).collect()}
    assert a == b                      # partitioning-independent
    assert all(i % 2 == 0 for i in a)  # fr rate 0 -> none kept
    assert 0.4 <= len(a) / 500 <= 0.6  # en rate near 0.5
    # different salt -> different (but still deterministic) sample
    c = {r.doc_id for r in stratified_sample(docs, frac, salt="v2").collect()}
    assert c != a
