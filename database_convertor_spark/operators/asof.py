"""As-of (temporal) join — Spark has no native ASOF JOIN; this is the
standard union + last_value-window construction:

  tag left/right rows, union, sort within the join key by
  (event time, tag) with right rows first at equal timestamps
  (ASOF's ``<=`` semantics), then last(right payload, ignorenulls)
  over an unbounded-preceding window carries the most recent right
  match onto every left row.

One shuffle on the join key, no range explosion, no per-row Python —
this survives any scale where a groupBy on the key does. The
alternative (`applyInPandas` + pd.merge_asof per key group) is kept
out of the hot path; it only wins when per-key data is huge AND
already bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str = "ts", right_ts: str = "ts",
               right_payload: list[str] | None = None,
               suffix: str = "_matched") -> DataFrame:
    """For each left row, attach the most recent right row (by event
    time, right.ts <= left.ts) with the same ``on`` key. Left rows with
    no prior right row get nulls (ASOF LEFT JOIN)."""
    right_payload = right_payload or [c for c in right.columns
                                      if c not in (on, right_ts)]
    l_tag = left.select(
        F.col(on), F.col(left_ts).alias("_t"), F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_payload])
                         .alias("s")).schema["s"].dataType).alias("_r"))
    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("_t"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns])
                        .alias("s")).schema["s"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_r"))
    u = l_tag.unionByName(r_tag)
    w = (Window.partitionBy(on).orderBy("_t", "_is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1).select(
        F.col("_l.*"),
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_payload])
    return out


def range_join_count(left: DataFrame, right: DataFrame, on: str,
                     left_ts: str, right_ts: str,
                     window_seconds: int,
                     count_alias: str = "n_in_window") -> DataFrame:
    """Interval join: for each left row, count right rows with the same
    key and right_ts in (left_ts - window, left_ts]. Spark has no
    native range join, so the range predicate is bucketized: both
    sides get a time bucket of ``window_seconds``; a right row within
    the window lives in the left row's bucket or the one before — an
    equi-join on (key, bucket) x {b, b-1} plus the exact residual
    filter. Join fan-out is bounded by 2x, never O(range)."""
    lb = left.withColumn("_b", F.floor(F.unix_timestamp(left_ts)
                                       / window_seconds).cast("long"))
    rb = right.withColumn("_rb", F.floor(F.unix_timestamp(right_ts)
                                         / window_seconds).cast("long"))
    probes = lb.withColumn("_probe", F.explode(F.array(F.col("_b"),
                                                       F.col("_b") - 1)))
    gap = F.unix_timestamp(F.col(f"l.{left_ts}")) - F.unix_timestamp(
        F.col(f"r.{right_ts}"))
    joined = (probes.alias("l")
              .join(rb.alias("r"),
                    (F.col(f"l.{on}") == F.col(f"r.{on}"))
                    & (F.col("l._probe") == F.col("r._rb")), "left")
              .withColumn("_hit",
                          F.when((gap >= 0) & (gap < window_seconds), 1)
                           .otherwise(0)))
    left_cols = [F.col(f"l.{c}") for c in left.columns]
    return (joined.groupBy(*left_cols)
            .agg(F.sum("_hit").cast("long").alias(count_alias)))


def clicks_before_purchase(events: DataFrame,
                           window_seconds: int = 3600) -> DataFrame:
    """Catalog instantiation: clicks by the same user in the hour
    before each purchase (inclusive of the purchase instant)."""
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id", "ts"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts")))
    out = range_join_count(purchases, clicks, "user_id", "ts", "click_ts",
                           window_seconds, count_alias="n_clicks_1h")
    return out.select("purchase_id", "user_id",
                      F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                      .alias("purchase_ts"), "n_clicks_1h")


def purchases_with_last_click(events: DataFrame) -> DataFrame:
    """Catalog instantiation: for every purchase event, the most recent
    prior click by the same user + the gap in seconds. Click ties on
    (user, ts) are collapsed to the max event_id first so the match is
    unique (mirrors the oracle's dedup)."""
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = (events.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id")))
    joined = as_of_join(purchases, clicks, on="user_id",
                        left_ts="ts", right_ts="ts",
                        right_payload=["click_id"], suffix="")
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("click_id").alias("last_click_id"),
    )
