"""r11 signature-kernel equivalence: the Arrow-batched numpy kernels
that replaced the interpreted HOF folds (the r10 SRP recipe ported to
SimHash, MinHash and winnowing) must be BIT-identical to the
expression paths they replaced — same fixture data, adversarial edge
rows (empty text, whitespace-only, sub-shingle-length, unicode
whitespace), cell for cell."""
from __future__ import annotations

from pyspark.sql import functions as F

from database_convertor_spark.operators import dedup
from tests.conftest import SF_SMALL


def _docs(spark):
    base = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    edge = spark.createDataFrame(
        [(900001, "en", 0, ""),
         (900002, "en", 4, "    "),
         (900003, "en", 2, "ab"),
         (900004, "de", 9, "one two"),
         (900005, "fr", 20, "tab\tand\nnewline mix"),
         (900006, "es", 30, "dup dup dup dup dup dup dup dup")],
        "doc_id long, lang string, n_chars int, text string")
    return base.select("doc_id", "lang", "n_chars", "text").unionByName(edge)


def test_simhash_kernel_matches_expression(spark):
    """simhash64_fast (JVM md5 + numpy bit fold) == the
    votes_to_simhash(simhash_votes(...)) expression for every doc,
    edge rows included."""
    df = _docs(spark)
    want = {r.doc_id: r.sh for r in df.select(
        "doc_id", dedup.simhash64(F.col("text")).alias("sh")).collect()}
    got = {r.doc_id: r.sh for r in df.select(
        "doc_id", dedup.simhash64_fast(F.col("text")).alias("sh")).collect()}
    assert got == want


def test_minhash_kernel_matches_expression(spark):
    """The affine-min signature kernel == the per-hash
    array_min(transform(...)) expression ladder, for the default and a
    non-default width."""
    from database_convertor_spark.functions.text import (
        HASH_PRIME,
        md5_long,
        shingles,
    )

    df = _docs(spark)
    for num_hashes in (32, 7):
        base = df.select(
            "doc_id",
            F.transform(shingles(F.col("text"), 3),
                        lambda s: md5_long(s) % HASH_PRIME).alias("_bh"))
        want = {r.doc_id: list(r.sig) for r in base.select(
            "doc_id",
            dedup._minhash_signature(F.col("_bh"), num_hashes)
            .alias("sig")).collect()}
        got = {r.doc_id: (None if r.sig is None else list(r.sig))
               for r in base.select(
                   "doc_id",
                   dedup._minhash_sig_udf(num_hashes)(F.col("_bh"))
                   .alias("sig")).collect()}
        assert got == want, num_hashes


def test_winnow_kernel_matches_expression(spark):
    """The per-doc k-gram hash + window-min kernel == the expression
    path (md5_long over substrings, array_min over slices) — exact
    (doc_id, fp) multisets at the default and a non-default (k, w)."""
    df = _docs(spark)
    for k, w in ((10, 8), (4, 3)):
        want = sorted((r.doc_id, r.fp) for r in
                      dedup._winnow_fingerprints_expr(df, k, w).collect())
        got = sorted((r.doc_id, r.fp) for r in
                     dedup.winnow_fingerprints(df, k, w).collect())
        assert got == want, (k, w)
