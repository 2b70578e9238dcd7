"""sf0.01 oracle parity for the SCALE-SENSITIVE queries — the local
twin of the driver's own check scale.

Why this exists (round-3 lesson): blocking/banding operators carry
calibration knobs that only engage beyond a data-size floor. The
fuzzy rescue's mega-gram frequency cap (df_floor=20) never fires
against sf0.001's 10-row supplier table, so blocking is effectively
exhaustive there and the sf0.001 suite stayed green while the driver
(sf0.01, 100 suppliers, cap active) returned 1,144/1,500 wrong
argmaxes. Every query whose candidate generation has a size-dependent
regime gets a parity row HERE, at the scale where those regimes are
live.
"""

from __future__ import annotations

import pytest

from database_convertor_spark.plans.catalog import CATALOG

from .conftest import SF_MEDIUM
from .oracle_harness import compare, duck_connection

# queries whose blocking/banding has size-dependent behavior: frequency
# caps (fuzzy), LSH band collision rates, simhash bit-vote margins,
# IVF centroid assignment, cosine bucket occupancy
SCALE_SENSITIVE = [
    "fuzzy_match_customers",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    # round-4 additions: not cap-gated, but their signals derive from
    # corpus-wide statistics (line document frequencies, unigram
    # frequencies, per-language counts, bin occupancy) that only get
    # interesting mass at this scale — driver-scale rows here keep
    # them from regressing silently
    "doc_line_dedup",
    "doc_lm_logprob",
    "corpus_temperature_sample",
    "training_shard_packing",
    "doc_cross_dup_spans",
]


@pytest.fixture(scope="module")
def duck_medium():
    con = duck_connection(SF_MEDIUM)
    yield con
    con.close()


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_oracle_parity_sf001(spark, duck_medium, name):
    spec = CATALOG[name]
    assert spec.oracle is not None, f"{name} lost its oracle"
    df = spec.builder(spark, SF_MEDIUM)
    ok, diag = compare(df, duck_medium, spec.oracle)
    assert ok, f"{name} @ sf0.01: {diag}"


def test_fuzzy_rescue_cap_regime_is_active_at_this_scale(spark):
    """Guard the guard: this file only protects against cap-regime
    regressions if the mega-gram frequency cap CAN fire here — i.e.
    the right side exceeds the df_floor below which the cap is inert.
    If the testdata shrinks, this fails loudly instead of the parity
    tests silently reverting to the exhaustive-blocking regime."""
    from database_convertor_spark.sources.readers import read_table

    n_supplier = read_table(spark, SF_MEDIUM, "supplier").count()
    assert n_supplier > 20, (
        "sf0.01 supplier table no longer exceeds df_floor=20; "
        "the cap-regime parity tests are not exercising the cap")
