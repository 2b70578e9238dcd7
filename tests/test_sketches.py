"""Engine-portable sketches: HLL and Bloom under deterministic md5."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_convertor_spark.operators.sketches import (
    bloom_contamination,
    hll_distinct,
    hll_registers,
)
from database_convertor_spark.sources.readers import read_table

from .conftest import SF_SMALL


def test_hll_estimate_within_envelope(spark):
    """HLL with m=256 has ~6.5% standard error (1.04/sqrt(m)); the
    small-range linear-counting regime on the fixture is far tighter.
    Pin a 15% envelope against the exact distinct — deterministic
    (md5 registers), so this can never flake."""
    ev = read_table(spark, SF_SMALL, "events")
    exact = ev.select("user_id").distinct().count()
    est = hll_distinct(ev, "user_id").first()["hll_estimate"]
    assert abs(est - exact) / exact < 0.15, (est, exact)


def test_hll_registers_merge_as_max(spark):
    """The sketch state is MERGEABLE (the property that makes HLL a
    one-scan distributed aggregate): registers of a union equal the
    register-wise max of the parts' registers."""
    ev = read_table(spark, SF_SMALL, "events")
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    whole = {r.register: r.max_rho
             for r in hll_registers(ev, "user_id").collect()}
    ra = {r.register: r.max_rho
          for r in hll_registers(a, "user_id").collect()}
    rb = {r.register: r.max_rho
          for r in hll_registers(b, "user_id").collect()}
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == whole


def test_hll_rejects_bad_m(spark):
    import pytest

    ev = read_table(spark, SF_SMALL, "events")
    with pytest.raises(ValueError, match="power of two"):
        hll_distinct(ev, "user_id", m=100)


def test_bloom_has_no_false_negatives(spark):
    """Every doc sharing a verbatim 5-token shingle with the
    benchmark (computed exactly) MUST be flagged by the Bloom probe —
    the filter can over-flag (FPR), never under-flag."""
    from database_convertor_spark.functions.text import shingles

    docs = read_table(spark, SF_SMALL, "documents")
    bench = docs.filter("doc_id % 97 = 0")
    corp = docs.filter("doc_id % 97 <> 0")
    sh = F.array_distinct(shingles(F.col("text"), 5))
    bsh = bench.select(F.explode(sh).alias("s")).distinct()
    truth = {r.doc_id for r in
             (corp.select("doc_id", F.explode(sh).alias("s"))
              .join(bsh, "s", "left_semi")
              .select("doc_id").distinct().collect())}
    flagged = {r.doc_id for r in
               bloom_contamination(corp, bench).collect()}
    assert truth <= flagged
