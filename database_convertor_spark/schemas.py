"""Explicit schemas.

Two families:

1. ``TESTDATA_SCHEMAS`` — the driver's TPC-H-ish star schema
   (/root/repo/TESTDATA.md). Declared explicitly so readers never fall
   back to inference in production paths.

2. ``WAREHOUSE_SCHEMAS`` — the reference platform's 14-table relational
   core re-expressed as Spark StructTypes (reference:
   DatabaseConverter/models.py:14-459; type mapping per SURVEY.md §1.2).
   PostgreSQL ARRAY -> ArrayType, JSON payloads -> StringType holding
   JSON (parse with from_json when shape is known), DateTime ->
   TimestampType, DECIMAL(10,2) -> DecimalType(10,2).
   SQL indexes (models.py __table_args__) have no Spark analog; at scale
   the same access paths come from partitioning/bucketing choices
   documented next to each table.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


STR = T.StringType()
I32 = T.IntegerType()
I64 = T.LongType()
F64 = T.DoubleType()
BOOL = T.BooleanType()
TS = T.TimestampType()
DATE = T.DateType()
ASTR = T.ArrayType(T.StringType())

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _s(("r_regionkey", I32), ("r_name", STR)),
    "nation": _s(("n_nationkey", I32), ("n_name", STR), ("n_regionkey", I32)),
    "customer": _s(("c_custkey", I64), ("c_name", STR), ("c_nationkey", I32),
                   ("c_acctbal", F64), ("c_mktsegment", STR)),
    "supplier": _s(("s_suppkey", I64), ("s_name", STR), ("s_nationkey", I32),
                   ("s_acctbal", F64)),
    "part": _s(("p_partkey", I64), ("p_name", STR), ("p_brand", STR),
               ("p_type", STR), ("p_size", I32), ("p_retailprice", F64)),
    "orders": _s(("o_orderkey", I64), ("o_custkey", I64), ("o_orderstatus", STR),
                 ("o_totalprice", F64), ("o_orderdate", TS), ("o_orderpriority", STR)),
    "lineitem": _s(("l_orderkey", I64), ("l_partkey", I64), ("l_suppkey", I64),
                   ("l_linenumber", I32), ("l_quantity", F64), ("l_extendedprice", F64),
                   ("l_discount", F64), ("l_tax", F64), ("l_returnflag", STR),
                   ("l_linestatus", STR), ("l_shipdate", TS)),
    "events": _s(("event_id", I64), ("ts", TS), ("user_id", I64),
                 ("event_type", STR), ("value", F64), ("props", STR)),
    "documents": _s(("doc_id", I64), ("text", STR), ("lang", STR),
                    ("source", STR), ("n_chars", I64)),
    "embeddings": _s(("vec_id", I64),
                     ("embedding", T.ArrayType(T.FloatType())), ("label", I32)),
}

# Reference warehouse (models.py). Partitioning guidance for 100 TB in
# comments: the reference's unique keys become MERGE keys; its secondary
# indexes become bucket/sort columns.
WAREHOUSE_SCHEMAS: dict[str, T.StructType] = {
    # models.py:14-46 — unique (borough, reference); partition by borough
    "planning_applications": _s(
        ("id", I64), ("reference", STR), ("borough", STR), ("address", STR),
        ("description", STR), ("application_type", STR), ("status", STR),
        ("decision", STR), ("is_outline", BOOL), ("latitude", F64),
        ("longitude", F64), ("valid_date", TS), ("decided_date", TS),
        ("planning_url", STR), ("raw_data", STR),
        ("created_at", TS), ("updated_at", TS)),
    # models.py:48-71 — FK planning_application_id
    "applicants": _s(
        ("id", I64), ("planning_application_id", I64), ("name", STR),
        ("normalized_name", STR), ("applicant_type", STR), ("address", STR),
        ("is_individual", BOOL), ("created_at", TS)),
    # models.py:73-118 — unique company_number; bucket by company_number
    "companies": _s(
        ("id", I64), ("company_number", STR), ("company_name", STR),
        ("company_status", STR), ("company_type", STR), ("incorporation_date", DATE),
        ("address_line_1", STR), ("address_line_2", STR), ("locality", STR),
        ("region", STR), ("postal_code", STR), ("country", STR),
        ("sic_codes", ASTR), ("tier", STR), ("raw_json", STR),
        ("created_at", TS), ("updated_at", TS)),
    # models.py:120-158 — unique ch_officer_id; DOB split month/year
    "officers": _s(
        ("id", I64), ("ch_officer_id", STR), ("name", STR), ("nationality", STR),
        ("occupation", STR), ("dob_month", I32), ("dob_year", I32),
        ("address", STR), ("created_at", TS)),
    # models.py:160-192 — unique (officer, company, role, appointed_on)
    "appointments": _s(
        ("id", I64), ("officer_id", I64), ("company_id", I64), ("role", STR),
        ("appointed_on", DATE), ("resigned_on", DATE), ("is_active", BOOL),
        ("created_at", TS)),
    # models.py:194-220 — fuzzy-join output (J5)
    "applicant_company_matches": _s(
        ("id", I64), ("applicant_id", I64), ("company_id", I64),
        ("match_method", STR), ("confidence_score", F64), ("created_at", TS)),
    # models.py:222-253 — polymorphic contact rows
    "contacts": _s(
        ("id", I64), ("company_id", I64), ("officer_id", I64), ("applicant_id", I64),
        ("contact_type", STR), ("contact_value", STR), ("source", STR),
        ("confidence_score", F64), ("verification_status", STR), ("created_at", TS)),
    # models.py:255-269 — precomputed graph edges (J3 materialization)
    "shared_officer_edges": _s(
        ("company_a_id", I64), ("company_b_id", I64),
        ("shared_officer_count", I64), ("updated_at", TS)),
    # models.py:273-293 — unique (company_id, provider)
    "enrichment_data": _s(
        ("id", I64), ("company_id", I64), ("provider", STR), ("success", BOOL),
        ("enrichment_data", STR), ("created_at", TS)),
    # models.py:295-314
    "processing_log": _s(
        ("id", I64), ("run_id", STR), ("stage", STR), ("status", STR),
        ("message", STR), ("created_at", TS)),
    # models.py:316-341 — webhook sink, keyed by linkedin_url
    "linkedhelper_connections": _s(
        ("id", I64), ("linkedin_url", STR), ("full_name", STR), ("company", STR),
        ("connection_status", STR), ("event_type", STR), ("updated_at", TS)),
    # models.py:343-369 (legacy)
    "planning_data": _s(
        ("id", I64), ("reference", STR), ("borough", STR), ("raw", STR),
        ("created_at", TS)),
    # models.py:371-384
    "automation_config": _s(
        ("config_key", STR), ("config_value", STR), ("updated_at", TS)),
    # models.py:386-426
    "automation_runs": _s(
        ("job_id", STR), ("job_type", STR), ("status", STR), ("started_at", TS),
        ("completed_at", TS), ("applications_discovered", I64),
        ("applications_processed", I64), ("companies_created", I64),
        ("contacts_created", I64), ("errors", I64), ("boroughs", ASTR)),
    # models.py:428-459
    "automation_schedules": _s(
        ("job_id", STR), ("cron", STR), ("enabled", BOOL), ("updated_at", TS)),
    # database.py:158-177 (ad-hoc DDL)
    "enrichment_spending": _s(
        ("id", I64), ("date", DATE), ("provider", STR),
        ("amount", T.DecimalType(10, 2)), ("created_at", TS)),
}

# MERGE key contracts from the reference's ON CONFLICT clauses (S19).
MERGE_KEYS: dict[str, list[str]] = {
    "companies": ["company_number"],
    "enrichment_data": ["company_id", "provider"],
    "planning_applications": ["borough", "reference"],
    "officers": ["ch_officer_id"],
    "appointments": ["officer_id", "company_id", "role", "appointed_on"],
    # database.py:1014-1094 upsert_contact dedups on entity+type+value
    "contacts": ["company_id", "contact_type", "contact_value"],
    "automation_config": ["config_key"],
    "automation_schedules": ["job_id"],
    "linkedhelper_connections": ["linkedin_url"],
}

# Partition contracts for partition-scoped MERGE (writers.merge_upsert):
# each incremental batch rewrites ONLY the partitions it touches, so
# merge I/O rides the batch, not the table. Two shapes:
#   {"partition_by": col}   — a natural partition column; must be part
#                             of the table's MERGE_KEYS (key identity
#                             pins the partition a row lives in).
#   {"hash_buckets": n}     — no natural clustering column: derive
#                             pmod(xxhash64(keys), n) instead. Sizing:
#                             n ≈ table_bytes / target_partition_bytes,
#                             and a batch of K keys touches ≤ K buckets
#                             — at warehouse scale raise n so routine
#                             batches touch a small fraction (e.g. a
#                             100 TB companies table at ~12 GB per
#                             bucket → n = 8192; the values below fit
#                             the reference's GB-scale warehouse).
# Tables absent here (config/schedule singletons) are small enough that
# a full staged rewrite IS the right plan.
MERGE_PARTITION_SPECS: dict[str, dict] = {
    "companies": {"hash_buckets": 256},
    "officers": {"hash_buckets": 256},
    "appointments": {"hash_buckets": 256},
    "contacts": {"hash_buckets": 256},
    "enrichment_data": {"partition_by": "provider"},
    "planning_applications": {"partition_by": "borough"},
    "linkedhelper_connections": {"hash_buckets": 64},
}
