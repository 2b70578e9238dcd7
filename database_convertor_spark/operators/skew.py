"""Skew-mitigation utilities — the explicit levers for hot keys when
AQE's skew handling isn't enough (SURVEY §7.4 risk 1: celebrity tokens
like 'developments' in the blocking join).

Both helpers are deterministic (salt = xxhash64 of row content, never
rand()): results are reproducible and replay-safe.

- ``salted_aggregate``: two-phase aggregate. Phase 1 groups by
  (key, salt) so a hot key's rows spread over ``num_salts`` reducers;
  phase 2 combines the tiny partials. Only works for algebraic
  aggregates (count/sum/min/max — exposed explicitly).
- ``salted_join``: explodes the *smaller* side ``num_salts``-fold and
  salts the bigger side, so a hot join key's probe rows spread over
  ``num_salts`` tasks. Use when the small side is too big to broadcast
  but the big side has hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, num_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(num_salts))


def salted_aggregate(df: DataFrame, key: str, num_salts: int = 16,
                     sum_cols: list[str] | None = None) -> DataFrame:
    """count(*) + optional sums per key, skew-proof. Output columns:
    key, n, sum_<col>..."""
    sum_cols = sum_cols or []
    salted = df.withColumn("_salt", _row_salt(df, num_salts))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.count(F.lit(1)).alias("_n"),
                    *[F.sum(c).alias(f"_s_{c}") for c in sum_cols]))
    return (partial.groupBy(key)
            .agg(F.sum("_n").cast("long").alias("n"),
                 *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols]))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the big side's hot keys spread across
    ``num_salts`` partitions; the small side is replicated x num_salts
    (a bounded blow-up — keep num_salts modest)."""
    big_salted = big.withColumn("_salt", _row_salt(big, num_salts))
    replicas = small.crossJoin(
        F.broadcast(big.sparkSession.range(num_salts)
                    .select(F.col("id").cast("long").alias("_salt"))))
    joined = big_salted.join(replicas, [key, "_salt"], how)
    return joined.drop("_salt")
