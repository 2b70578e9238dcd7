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


def test_kmv_exact_below_k(spark):
    """With fewer than k distinct values the sketch IS the distinct
    set: every estimate must be exact, jaccard the true Jaccard."""
    from database_convertor_spark.operators.sketches import kmv_overlap

    ev = read_table(spark, SF_SMALL, "events")
    a = ev.filter("event_type = 'click'")
    b = ev.filter("event_type = 'purchase'")
    na = a.select("user_id").distinct().count()
    nb = b.select("user_id").distinct().count()
    nu = a.select("user_id").unionByName(
        b.select("user_id")).distinct().count()
    ni = (a.select("user_id").distinct()
          .intersect(b.select("user_id").distinct()).count())
    row = kmv_overlap(a, b, "user_id", k=4096).first()
    assert row.est_a == na and row.est_b == nb
    assert row.est_union == nu
    assert abs(row.est_intersection - ni) < 0.51
    assert abs(row.jaccard_est - ni / nu) < 1e-6


def test_kmv_estimate_envelope(spark):
    """Past the exact regime, the (k-1)/U_(k) estimator with k=64 has
    ~12.5% standard error; pin a 35% envelope (deterministic md5 —
    can never flake)."""
    from database_convertor_spark.operators.sketches import (
        kmv_overlap, kmv_sketch)

    ev = read_table(spark, SF_SMALL, "events")
    exact = ev.select("event_id").distinct().count()
    assert exact > 64  # estimator regime, not the exact one
    row = kmv_overlap(ev, ev.limit(0), "event_id", k=64).first()
    assert abs(row.est_a - exact) / exact < 0.35, (row.est_a, exact)
    assert kmv_sketch(ev, "event_id", k=64).count() == 64
