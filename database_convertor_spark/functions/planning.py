"""Planning-application domain predicates — the reference's outline
detection (SURVEY F4/F5), its most distinctive filter semantics.

``is_outline`` ports utils.py:367-426's three detection methods as one
boolean column expression (JVM-side, pushable):
  1. application_type contains 'outline' (case-insensitive)
  2. reference ends with OUT/OUTL or contains '/OUT'
  3. description contains one of the exact outline phrases

``outline_detection_method`` labels WHICH rung matched (the reference
logs detection methods for bias auditing, api_clients.py:826-864).

The reference also compiles the same predicate into an Elasticsearch
bool/should query for server-side filtering (utils.py:428-457 — hand
-rolled predicate pushdown); on Spark the same column expression
pushes into the scan automatically, so there is exactly one
implementation of the semantics instead of two.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OUTLINE_PHRASES = [
    "outline planning",
    "outline application",
    "outline permission",
    "outline consent",
    "all matters reserved",
    "some matters reserved",
    "reserved matters",
]


def _type_rung(application_type: Column) -> Column:
    return F.lower(F.coalesce(application_type, F.lit(""))).contains("outline")


def _reference_rung(reference: Column) -> Column:
    ref = F.upper(F.coalesce(reference, F.lit("")))
    return (ref.endswith("OUT") | ref.endswith("OUTL") | ref.contains("/OUT"))


def _description_rung(description: Column) -> Column:
    desc = F.lower(F.coalesce(description, F.lit("")))
    out = F.lit(False)
    for phrase in OUTLINE_PHRASES:
        out = out | desc.contains(phrase)
    return out


def is_outline(application_type: Column, reference: Column,
               description: Column) -> Column:
    """Three-method OR (utils.py:367-426)."""
    return (_type_rung(application_type)
            | _reference_rung(reference)
            | _description_rung(description))


def outline_detection_method(application_type: Column, reference: Column,
                             description: Column) -> Column:
    """First matching rung's label, or null (api_clients.py:826-864's
    detection-method annotation)."""
    return (F.when(_type_rung(application_type), "application_type")
            .when(_reference_rung(reference), "reference_pattern")
            .when(_description_rung(description), "description_phrase")
            .otherwise(F.lit(None).cast("string")))
