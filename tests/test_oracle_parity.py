"""The main correctness gate, run locally at sf0.001 (fast) — the
driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from database_convertor_spark.plans.catalog import CATALOG

from .conftest import SF_SMALL
from .oracle_harness import compare, duck_connection

ORACLE_SPECS = [s for s in CATALOG.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in CATALOG.values() if s.oracle is None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec):
    df = spec.builder(spark, SF_SMALL)
    ok, diag = compare(df, duck, spec.oracle)
    assert ok, f"{spec.name}: {diag}"


def test_every_catalog_query_is_value_oracled():
    """Round 9: the four historical rows-only entries (rest source,
    mock enrichment, the multimodal pair) earned value oracles, so the
    rows-only set must STAY empty — a new catalog entry without an
    oracle regresses the 126/126 hash-verified surface and fails here
    instead of silently shrinking the driver's check."""
    assert ROWS_ONLY_SPECS == [], [s.name for s in ROWS_ONLY_SPECS]


def test_documents_fixture_is_ascii_single_spaced(duck):
    """The precondition doc_bpe_byte_merges' oracle rests on: GPT-2
    pre-tokenization is only RE2-expressible (DuckDB has no lookahead)
    when the text has no whitespace runs, no leading/trailing
    whitespace, and is printable ASCII (so UTF-8 bytes == characters
    and only the space byte remaps). If the fixture ever changes
    shape, this fails BEFORE the oracle silently diverges."""
    bad = duck.execute(r"""
        SELECT count(*) FROM documents
        WHERE regexp_matches(text, '\s\s')
           OR regexp_matches(text, '^\s|\s$')
           OR regexp_matches(text, '[^\x20-\x7E]')
    """).fetchone()[0]
    assert bad == 0
