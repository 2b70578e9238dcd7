"""Golden tests for the S5 ES bool-query construction
(sources/esquery.py) against the reference's request bodies
(api_clients.py:678-745, utils.py:428-457), plus the Catalyst
pushdown -> DSL bridge."""

from __future__ import annotations

from database_convertor_spark.sources.esquery import (
    LONDON_SOURCE_FIELDS,
    build_london_search_query,
    create_outline_es_query,
    filters_to_es_query,
)


def test_full_filter_stack_matches_reference_shape():
    body = build_london_search_query(
        local_authority="Camden", start_date="2024-03-01",
        application_type="Full", decision_status="Approved",
        outline_filter=True, limit=500, offset=100)
    must = body["query"]["bool"]["must"]
    assert must[0] == {"term": {"lpa_name.raw": "Camden"}}
    assert must[1] == {"range": {"valid_date": {"gte": "01/03/2024"}}}
    assert must[2] == {"term": {"application_type.raw": "Full"}}
    assert must[3] == create_outline_es_query()
    assert must[4] == {"term": {"decision.raw": "Approved"}}
    assert body["size"] == 500 and body["from"] == 100
    assert body["_source"] == LONDON_SOURCE_FIELDS


def test_reference_edge_semantics():
    # no filters -> match_all (api_clients.py:727-729)
    assert build_london_search_query()["query"] == {"match_all": {}}
    # blank/sentinel values are not filters
    assert build_london_search_query(
        local_authority="  ", decision_status="All Statuses"
    )["query"] == {"match_all": {}}
    # an unparseable date is skipped, not an error
    assert build_london_search_query(
        start_date="03/01/2024")["query"] == {"match_all": {}}


def test_outline_query_golden():
    q = create_outline_es_query()
    should = q["bool"]["should"]
    assert q["bool"]["minimum_should_match"] == 1
    assert {"match": {"lpa_app_no": "OUT"}} in should
    assert {"match_phrase":
            {"work_description": "outline planning permission"}} in should
    assert len(should) == 2 + 4 * 2     # 2 ref-number + 4 fields x 2 phrases


def test_catalyst_pushdown_bridge():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        StringContains,
    )

    filters = [
        EqualTo(("decision",), "Approved"),
        GreaterThanOrEqual(("valid_date",), "01/03/2024"),
        In(("application_type",), ("Full", "Outline")),
        IsNotNull(("lpa_app_no",)),
        StringContains(("description",), "outline"),   # residual
    ]
    query, residual = filters_to_es_query(
        filters, keyword_fields=frozenset({"decision",
                                           "application_type"}))
    must = query["bool"]["must"]
    assert {"term": {"decision.raw": "Approved"}} in must
    assert {"range": {"valid_date": {"gte": "01/03/2024"}}} in must
    assert {"terms": {"application_type.raw": ["Full", "Outline"]}} in must
    assert {"exists": {"field": "lpa_app_no"}} in must
    assert len(residual) == 1 and isinstance(residual[0], StringContains)
    # nothing pushable -> match_all, everything residual
    q2, r2 = filters_to_es_query([StringContains(("x",), "y")])
    assert q2 == {"match_all": {}} and len(r2) == 1
