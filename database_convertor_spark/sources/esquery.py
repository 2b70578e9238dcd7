"""Elasticsearch bool-query construction (S5) — the reference's
London-planning search DSL ported as pure functions, plus the bridge
from Spark DataSource pushdown filters to the same DSL.

Reference behavior (api_clients.py:678-745 `search_london_planning_
applications` request construction; utils.py:428-457
`create_outline_elasticsearch_query`):

- every selected filter appends to ``bool.must``;
- authority / application-type / decision-status use exact ``term``
  matches against the ``.raw`` keyword subfield;
- the date filter reformats ISO ``YYYY-MM-DD`` to the API's
  ``DD/MM/YYYY`` and becomes a ``range.gte``; an unparseable date is
  SKIPPED, not an error (the reference logs and continues);
- the outline filter is a ``should`` of reference-number matches and
  exact phrase matches over the four description fields,
  ``minimum_should_match: 1``;
- zero filters collapse to ``match_all``;
- the request body carries ``query`` + ``size`` + ``from`` + the
  explicit ``_source`` projection (the reference's column pruning —
  the same idea Catalyst's ReadSchema pushes into a parquet scan).

``filters_to_es_query`` is the Spark-first half: a live ES
DataSourceV2 reader receives Catalyst's pushed filters (the
``pushFilters`` surface demonstrated live in sources/restsource.py)
and must translate them into this DSL; the translation is pure and
testable without a cluster. Unsupported filters are returned for
Spark to re-apply as residuals — exactly the pushFilters contract.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

# the reference's _source projection (api_clients.py:736-743)
LONDON_SOURCE_FIELDS = [
    "lpa_name", "lpa_app_no", "last_updated", "valid_date",
    "decision_date", "decision", "decision_status", "status", "id",
    "application_type", "description", "development_description",
    "proposal_description", "work_description",
    "applicant", "applicant_name", "organisation", "name",
]

_OUTLINE_PHRASES = ("outline planning application",
                    "outline planning permission")
_DESCRIPTION_FIELDS = ("description", "development_description",
                       "proposal_description", "work_description")


def create_outline_es_query() -> dict[str, Any]:
    """utils.py:428-457 — reference-number OUT matches plus exact
    outline phrases over all four description fields."""
    should: list[dict[str, Any]] = [
        {"match": {"lpa_app_no": "OUT"}},
        {"query_string": {"default_field": "lpa_app_no", "query": "OUT"}},
    ]
    for field in _DESCRIPTION_FIELDS:
        for phrase in _OUTLINE_PHRASES:
            should.append({"match_phrase": {field: phrase}})
    return {"bool": {"should": should, "minimum_should_match": 1}}


def build_london_search_query(local_authority: str | None = None,
                              start_date: str | None = None,
                              application_type: str | None = None,
                              decision_status: str | None = None,
                              outline_filter: bool = False,
                              limit: int = 100,
                              offset: int = 0) -> dict[str, Any]:
    """The reference's request body, field for field
    (api_clients.py:678-745)."""
    must: list[dict[str, Any]] = []
    if local_authority and local_authority.strip():
        must.append({"term": {"lpa_name.raw": local_authority}})
    if start_date and start_date.strip():
        try:
            formatted = (datetime.strptime(start_date, "%Y-%m-%d")
                         .strftime("%d/%m/%Y"))
            must.append({"range": {"valid_date": {"gte": formatted}}})
        except ValueError:
            pass                       # reference skips bad dates
    if application_type and application_type.strip():
        must.append({"term": {"application_type.raw": application_type}})
    if outline_filter:
        must.append(create_outline_es_query())
    if (decision_status and decision_status.strip()
            and decision_status != "All Statuses"):
        must.append({"term": {"decision.raw": decision_status}})
    query: dict[str, Any] = ({"bool": {"must": must}} if must
                             else {"match_all": {}})
    return {"query": query, "size": limit, "from": offset,
            "_source": list(LONDON_SOURCE_FIELDS)}


# ------------------------------------- Catalyst pushdown -> ES DSL
def filters_to_es_query(filters: list,
                        keyword_fields: frozenset[str] | None = None
                        ) -> tuple[dict[str, Any], list]:
    """Translate Spark Python-DataSource pushdown filters into the ES
    bool DSL. Returns (query, unsupported) — unsupported filters go
    back to Spark as residuals, per the pushFilters contract.

    Supported: EqualTo (term; against ``<col>.raw`` when the column is
    a known keyword field), GreaterThan(OrEqual) / LessThan(OrEqual)
    (range), In (terms), IsNotNull (exists). Everything else —
    StringContains, complex boolean trees, UDF predicates — is a
    residual, which is also what a real ES connector does.
    """
    try:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            LessThan,
            LessThanOrEqual,
        )
    except ImportError:                # pragma: no cover - Spark < 4
        return {"match_all": {}}, list(filters)

    keyword_fields = keyword_fields or frozenset()

    def col(f) -> str:
        name = ".".join(f.attribute)
        return f"{name}.raw" if name in keyword_fields else name

    must: list[dict[str, Any]] = []
    unsupported: list = []
    for f in filters:
        if isinstance(f, EqualTo):
            must.append({"term": {col(f): f.value}})
        elif isinstance(f, In):
            must.append({"terms": {col(f): list(f.value)}})
        elif isinstance(f, GreaterThan):
            must.append({"range": {col(f): {"gt": f.value}}})
        elif isinstance(f, GreaterThanOrEqual):
            must.append({"range": {col(f): {"gte": f.value}}})
        elif isinstance(f, LessThan):
            must.append({"range": {col(f): {"lt": f.value}}})
        elif isinstance(f, LessThanOrEqual):
            must.append({"range": {col(f): {"lte": f.value}}})
        elif isinstance(f, IsNotNull):
            must.append({"exists": {"field": col(f)}})
        else:
            unsupported.append(f)
    query = {"bool": {"must": must}} if must else {"match_all": {}}
    return query, unsupported
