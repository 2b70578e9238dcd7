"""D6 provider-priority merge semantics on reference-shaped rows
(data_enrichment.py:186-240): first-wins by priority with source
attribution, set-union of list fields, quality score."""

from __future__ import annotations

from database_convertor_spark.operators.provider_merge import (
    merge_provider_records,
)


def _records(spark):
    # (entity, provider, priority, name, domain, technologies)
    return spark.createDataFrame(
        [(1, "clearbit", 1, "Acme Ltd", None, ["react", "aws"]),
         (1, "hunter", 2, "Acme Limited", "acme.com", ["aws", "python"]),
         (1, "apollo", 3, "ACME", "acme.io", None),
         (2, "hunter", 2, None, None, None),
         (2, "apollo", 3, "Beta Inc", None, ["go"])],
        ["company_id", "provider", "priority", "name", "domain",
         "technologies"])


def test_first_wins_by_priority_with_source(spark):
    out = merge_provider_records(
        _records(spark), "company_id", ["name", "domain"], ["technologies"])
    rows = {r.company_id: r for r in out.collect()}
    # entity 1: clearbit (priority 1) wins name; domain is null there, so
    # hunter (priority 2) supplies it — per-field provenance, as in the
    # reference's field-by-field loop
    assert rows[1].name == "Acme Ltd" and rows[1].name_source == "clearbit"
    assert rows[1].domain == "acme.com" and rows[1].domain_source == "hunter"
    # entity 2: only apollo has data
    assert rows[2].name == "Beta Inc" and rows[2].name_source == "apollo"
    assert rows[2].domain is None and rows[2].domain_source is None


def test_list_fields_set_union_and_metadata(spark):
    out = merge_provider_records(
        _records(spark), "company_id", ["name", "domain"], ["technologies"])
    rows = {r.company_id: r for r in out.collect()}
    assert rows[1].technologies == ["aws", "python", "react"]  # sorted union
    assert rows[2].technologies == ["go"]
    assert rows[1].n_providers == 3 and rows[2].n_providers == 2
    assert rows[1].quality_score == 100.0   # both scalar fields populated
    assert rows[2].quality_score == 50.0    # name only
