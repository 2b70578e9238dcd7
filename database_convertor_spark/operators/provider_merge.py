"""Multi-provider enrichment merge — SURVEY D6: the reference's
merge_enrichment_data (data_enrichment.py:186-240) folds per-provider
result dicts into one profile: scalar fields are first-wins by
provider priority (most-trusted provider supplies the value, and a
``{field}_source`` column records which), list fields are set-unioned
across ALL providers, plus metadata (provider count, quality score =
%% of merged fields populated).

Spark-first shape: the reference loops providers per company in
Python; here the provider results are ROWS (entity_key, provider,
priority, fields...) and the whole merge is ONE partial-aggregable
groupBy — no loop, no UDF:

- first-wins = ``min(struct(priority, value, provider))`` over
  non-null values only (the when() wrapper nulls out the whole struct,
  and min ignores nulls) — the struct comparison orders by priority
  first, so the map side already combines down to one candidate per
  entity per field before the shuffle;
- set-union = ``sort_array(array_distinct(flatten(collect_list(...))))``
  (sorted for cross-engine determinism);
- quality score = share of merged scalar fields populated, as in the
  reference's _calculate_quality_score (data_enrichment.py:160-184).

One shuffle total, broadcast nothing, skew bounded by providers-per-
entity (small constant) — safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_provider_records(records: DataFrame,
                           entity_key: str,
                           fields: list[str],
                           list_fields: list[str] | None = None,
                           provider_col: str = "provider",
                           priority_col: str = "priority") -> DataFrame:
    """Collapse per-provider enrichment rows into one merged profile
    per entity (D6, data_enrichment.py:186-240).

    Output: entity_key, then for each scalar field ``f`` -> ``f`` and
    ``f_source``, each list field set-unioned, ``n_providers``, and
    ``quality_score`` (0-100, 2dp)."""
    list_fields = list_fields or []
    aggs = []
    for f in fields:
        picked = F.min(
            F.when(F.col(f).isNotNull(),
                   F.struct(F.col(priority_col).alias("p"),
                            F.col(f).alias("v"),
                            F.col(provider_col).alias("src"))))
        aggs.append(picked.alias(f"_{f}"))
    for lf in list_fields:
        aggs.append(
            F.sort_array(F.array_distinct(F.flatten(
                F.collect_list(F.coalesce(F.col(lf), F.array()))))).alias(lf))
    aggs.append(F.count(F.lit(1)).alias("n_providers"))
    merged = records.groupBy(entity_key).agg(*aggs)

    populated = sum(
        (F.when(F.col(f"_{f}").isNotNull(), 1).otherwise(0) for f in fields),
        F.lit(0))
    out_cols = [F.col(entity_key)]
    for f in fields:
        out_cols.append(F.col(f"_{f}.v").alias(f))
        out_cols.append(F.col(f"_{f}.src").alias(f"{f}_source"))
    out_cols.extend(F.col(lf) for lf in list_fields)
    out_cols.append(F.col("n_providers").cast("long").alias("n_providers"))
    out_cols.append(
        F.round(populated.cast("double") * 100.0 / len(fields), 2)
        .alias("quality_score"))
    return merged.select(*out_cols)
