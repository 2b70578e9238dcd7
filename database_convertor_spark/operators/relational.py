"""Relational operator core — SURVEY §2.2-2.6 re-expressed over the
driver's star schema.

Every function takes DataFrames and returns a lazily-planned DataFrame;
Catalyst owns pushdown/pruning/join selection. Aggregated doubles are
rounded in-query so results are bit-stable across engines and
aggregation orders (floating-point addition is not associative; a
distributed partial-aggregate tree must not be expected to match a
single-threaded oracle to the last ulp).

Scale notes are inline per operator: which side broadcasts, where the
shuffle lands, what AQE is expected to do at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- A6 / TPC-H Q1
def pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-01") -> DataFrame:
    """Multi-aggregate roll-up (SURVEY A6; shape of TPC-H Q1).
    One hash-aggregate with map-side partial aggregation; the only
    shuffle is 2-key groupBy — survives any scale."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                          * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ------------------------------------------------------------------------- J2
def market_segment_revenue(orders: DataFrame, customer: DataFrame,
                           segment: str = "BUILDING") -> DataFrame:
    """Filtered inner equi-join + agg (SURVEY J2: the reference's
    'single optimized query instead of 2,467 individual queries').
    customer is the dimension: broadcast it so the orders fact never
    shuffles for the join."""
    dim = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


# ------------------------------------------------------------------------- J1
def customer_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT OUTER join + per-customer roll-up (SURVEY J1: Company ⟕
    EnrichmentData then group-to-map). Pre-aggregating orders BEFORE the
    join keeps the join input one row per custkey — at 100 TB this is
    the difference between joining 100 TB and joining the distinct-key
    aggregate."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("o_totalprice").alias("_sum"))
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey", "c_name",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_orders"),
            F.round(F.coalesce(F.col("_sum"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# ------------------------------------------------------------------------- J6
def customers_without_orders(customer: DataFrame, orders: DataFrame,
                             year: int = 1995) -> DataFrame:
    """Anti-join — the reference's incremental-dedup filter
    (weekly_scheduler.py:586-609): drop keys already present in the
    sink. Scoped to one order-year so the result is non-trivial at
    every scale factor (every customer has *some* order)."""
    seen = orders.filter(F.year("o_orderdate") == year).select("o_custkey")
    return (customer.join(seen, customer.c_custkey == seen.o_custkey, "left_anti")
            .select("c_custkey", "c_name", "c_acctbal"))


# ------------------------------------------------------------------------- F1
def multi_column_search(part: DataFrame, needle: str = "widget") -> DataFrame:
    """Multi-column ILIKE OR filter (SURVEY F1, database.py:298-307)."""
    q = needle.lower()
    cond = (F.lower(F.col("p_name")).contains(q)
            | F.lower(F.col("p_type")).contains(q)
            | F.lower(F.col("p_brand")).contains(q))
    return part.filter(cond).select("p_partkey", "p_name", "p_brand", "p_type")


# ------------------------------------------------------------------------- F3
def open_orders(orders: DataFrame, min_total: float = 1000.0) -> DataFrame:
    """Status equality + numeric predicate (SURVEY F3); both predicates
    push to the parquet scan."""
    return (orders.filter((F.col("o_orderstatus") == "O")
                          & (F.col("o_totalprice") > min_total))
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"))


# ------------------------------------------------------------------- F7 / C16
def shipments_by_month(lineitem: DataFrame,
                       date_from: str = "1996-01-01",
                       date_to: str = "1997-01-01") -> DataFrame:
    """Date-range predicate + month bucketing (SURVEY F7/C16). At scale
    the range predicate prunes date-partitioned input files."""
    return (
        lineitem.filter((F.col("l_shipdate") >= F.lit(date_from))
                        & (F.col("l_shipdate") < F.lit(date_to)))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


# ------------------------------------------------------------------- A4 / A5
def event_type_counts(events: DataFrame) -> DataFrame:
    """GROUP BY + COUNT + ORDER BY count DESC (SURVEY A4/A5,
    database.py:707-716)."""
    return (events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "event_type"))


# -------------------------------------------------------------- A1/A2/A3/A9
def order_stats_summary(orders: DataFrame) -> DataFrame:
    """Single-pass stats roll-up: total counts, distinct-key count,
    filtered count, derived rate (SURVEY A1/A2/A3/A9 — the reference's
    get_stats). One aggregate, no join, no second scan."""
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers_with_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
         .cast("long").alias("n_open"),
        F.round(100.0 * F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
                / F.count(F.lit(1)), 4).alias("open_rate_pct"),
    )


# ------------------------------------------------------------------------ A11
def event_funnel(events: DataFrame) -> DataFrame:
    """Funnel conversion: stage counts + rate vs previous stage via lag
    (SURVEY A11, app.py:2806-2828). The window runs over the tiny
    aggregated stage table, never the raw events."""
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.col("event_type"))
    return counts.select(
        "event_type", "n",
        F.round(100.0 * F.col("n") / F.lag("n").over(w), 2).alias("pct_of_prev"),
    )


# ------------------------------------------------------------------------- W1
def top_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """ORDER BY ... DESC LIMIT n (SURVEY W1) — Spark plans
    TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    driver; no global sort materializes."""
    return (orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .select("o_orderkey", "o_custkey", "o_totalprice").limit(k))


# ------------------------------------------------------------------------- W2
def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-N per group via row_number window (SURVEY W2). Shuffles once
    on the partition key; ties broken by orderkey for determinism."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                F.asc("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.col("rn").cast("int").alias("rn")))


# ------------------------------------------------------------------------- W3
def priority_order_pick(orders: DataFrame) -> DataFrame:
    """Priority-pick / argmax-by-predicate (SURVEY W3: 'first charge
    with status in {outstanding, part-satisfied} else first overall'):
    rank by CASE bucket then recency, keep rank 1."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.when(F.col("o_orderstatus") == "O", 0).otherwise(1),
        F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey", "o_orderstatus",
                    F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")))


# ------------------------------------------------------------------------- D1
def orders_union_dedup(orders: DataFrame) -> DataFrame:
    """Union of overlapping scans + dedup by id (SURVEY D1: the
    reference's seen_ids set across pagination strategies)."""
    a = orders.filter(F.year("o_orderdate") == 1995)
    b = orders.filter(F.col("o_totalprice") > 150000.0)
    return a.select("o_orderkey").unionByName(b.select("o_orderkey")).distinct()


# ------------------------------------------------------------------------- D2
def distinct_customer_priorities(orders: DataFrame) -> DataFrame:
    """Dedup on a composite business key (SURVEY D2)."""
    return orders.select("o_custkey", "o_orderpriority").distinct()


# ------------------------------------------------------------------------- D3
def active_customer_keys(orders: DataFrame, customer: DataFrame,
                         since: str = "1999-01-01",
                         min_bal: float = 5000.0) -> DataFrame:
    """Two-source union + distinct (SURVEY D3: recent-appointment ∪
    recently-created company ids)."""
    a = (orders.filter(F.col("o_orderdate") >= F.lit(since))
         .select(F.col("o_custkey").alias("custkey")))
    b = (customer.filter(F.col("c_acctbal") > min_bal)
         .select(F.col("c_custkey").alias("custkey")))
    return a.unionByName(b).distinct()


# ------------------------------------------------------------------ J10 / S15
def nation_customer_rollup(nation: DataFrame, customer: DataFrame) -> DataFrame:
    """LEFT JOIN + GROUP_CONCAT (SURVEY J10, database_sqlite_backup.py:
    201-228): string-agg of customer names per nation, sorted for
    determinism. collect_list happens after the shuffle on the group
    key; per-group payload stays bounded by group size."""
    joined = nation.join(customer, nation.n_nationkey == customer.c_nationkey, "left")
    return (joined.groupBy("n_name")
            .agg(F.count("c_custkey").alias("n_customers"),
                 F.array_join(F.array_sort(F.collect_list("c_name")), ",")
                  .alias("customer_names")))


# ------------------------------------------------------------------ C23 / C24
def customer_tiering(customer: DataFrame) -> DataFrame:
    """Tier classification + additive quality score (SURVEY C23/C24 and
    the weekly scheduler's lender-tier logic)."""
    score = (
        F.when(F.col("c_name").isNotNull(), 25).otherwise(0)
        + F.when(F.col("c_acctbal") > 0, 25).otherwise(0)
        + F.when(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"),
                 25).otherwise(0)
        + F.when(F.col("c_nationkey").isNotNull(), 25).otherwise(0)
    )
    tier = (F.when(F.col("c_acctbal") > 7500, "platinum")
            .when(F.col("c_acctbal") > 5000, "gold")
            .when(F.col("c_acctbal") > 2500, "silver")
            .otherwise("bronze"))
    return customer.select("c_custkey", tier.alias("tier"),
                           score.cast("int").alias("quality_score"))


# ------------------------------------------------------------- C2/C3/C5/C6
def scalar_cleaning_demo(customer: DataFrame) -> DataFrame:
    """Name normalization + key padding + shape validation as one
    codegen'd projection (SURVEY C2/C3/C5/C6)."""
    from ..functions.cleaning import normalize_company_name, pad_company_number
    padded = pad_company_number(F.col("c_custkey"))
    return customer.select(
        "c_custkey",
        normalize_company_name(F.col("c_name")).alias("norm_name"),
        padded.alias("padded_key"),
        padded.rlike(r"^\d{8}$").alias("is_valid_number"),
    )


# ------------------------------------------------------------------ C15-C18
def order_date_dimensions(orders: DataFrame) -> DataFrame:
    """Date-part extraction and week-boundary math (SURVEY C15-C18)."""
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("int").alias("order_year"),
        F.month(d).cast("int").alias("order_month"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("week_start"),
        F.date_format(d, "yyyy-MM-dd").alias("order_day"),
    )


# ------------------------------------------------------------------------ C27
def event_props_extract(events: DataFrame) -> DataFrame:
    """JSON payload extraction + bucketed aggregation (SURVEY C27: the
    reference stores raw API JSON and parses on read)."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (events.withColumn("k_bucket", k % 10)
            .groupBy("k_bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("value"), 4).alias("avg_value")))


# ------------------------------------------------------------------- sessions
def user_sessions(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Sessionization: a session breaks when the gap to the previous
    event exceeds ``gap_seconds``. lag + conditional sum — one shuffle
    on user_id. (Streaming analog: session_window in streaming/pipeline.)"""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return (events.withColumn("_new", is_new)
            .groupBy("user_id")
            .agg(F.sum("_new").cast("long").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


# ----------------------------------------------------------- multi-table join
def regional_revenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                     nation: DataFrame, region: DataFrame,
                     region_name: str = "ASIA",
                     date_from: str = "1996-01-01",
                     date_to: str = "1998-01-01") -> DataFrame:
    """TPC-H Q5-shaped multi-join: revenue per nation for one region and
    date window. Join strategy at scale: nation⋈region collapses to a
    tiny broadcast dim; customer joins it broadcast; the two fact
    tables (orders, lineitem) shuffle-join on their natural keys with
    the date filter pushed to the orders scan first."""
    dim = (nation.join(F.broadcast(region),
                       nation.n_regionkey == region.r_regionkey)
           .filter(F.col("r_name") == region_name)
           .select("n_nationkey", "n_name"))
    cust = customer.join(F.broadcast(dim),
                         customer.c_nationkey == dim.n_nationkey)
    ords = orders.filter((F.col("o_orderdate") >= F.lit(date_from))
                         & (F.col("o_orderdate") < F.lit(date_to)))
    joined = (ords.join(cust, ords.o_custkey == cust.c_custkey)
              .join(lineitem, ords.o_orderkey == lineitem.l_orderkey))
    return (joined.groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("revenue"),
                 F.countDistinct("o_orderkey").alias("n_orders")))


# ---------------------------------------------------------------- rollup/cube
def orders_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP (year, priority): per-(year,priority), per-year and grand
    totals in one pass — Spark plans a single expand + hash aggregate."""
    return (orders
            .withColumn("order_year", F.year("o_orderdate").cast("int"))
            .rollup("order_year", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


# -------------------------------------------------------------------- pivot
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def event_pivot_by_month(events: DataFrame) -> DataFrame:
    """Month × event-type count matrix via pivot (explicit value list so
    the schema is static — required for a one-pass plan AND for a
    deterministic oracle)."""
    return (events
            .withColumn("month", F.date_format("ts", "yyyy-MM"))
            .groupBy("month").pivot("event_type", EVENT_TYPES).count()
            .na.fill(0, EVENT_TYPES))


# ---------------------------------------------------------------- percentiles
def event_value_percentiles(events: DataFrame) -> DataFrame:
    """Exact percentiles (median/p90) per event type. Spark's exact
    `percentile` matches ANSI interpolation (quantile_cont); the
    documented scale fallback is approx_percentile with an error bound
    when an exact sort-based percentile is too expensive."""
    return (events.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
                 F.round(F.avg("value"), 4).alias("mean")))


def order_stats_summary_approx(orders: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Documented scale fallback for the A2/A9 distinct count: HLL++
    (approx_count_distinct) replaces the exact two-phase distinct with
    a fixed-size mergeable sketch — one pass, map-side combinable, no
    per-key state explosion when o_custkey cardinality approaches row
    count at 100 TB. ``rsd`` is the sketch's relative standard
    deviation knob; tolerance-tested against the exact twin."""
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.approx_count_distinct("o_custkey", rsd)
         .alias("n_customers_with_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
         .cast("long").alias("n_open"))


def event_value_percentiles_approx(events: DataFrame,
                                   accuracy: int = 10000) -> DataFrame:
    """Documented scale fallback for the exact percentile: Greenwald-
    Khanna sketches (approx_percentile) bound memory per group at any
    data size; error <= 1/accuracy quantile rank. Tolerance-tested
    against the exact twin."""
    pcts = F.expr(f"approx_percentile(value, array(0.5, 0.9), {accuracy})")
    return (events.groupBy("event_type")
            .agg(F.round(pcts.getItem(0), 4).alias("p50"),
                 F.round(pcts.getItem(1), 4).alias("p90"),
                 F.round(F.avg("value"), 4).alias("mean")))


# ---------------------------------------------------------------- A14 buckets
def event_value_histogram(events: DataFrame, bucket_width: int = 50) -> DataFrame:
    """Bucketed histogram (SURVEY A14: cache-age buckets): floor
    bucketing + count, one aggregate."""
    return (events
            .withColumn("bucket",
                        F.floor(F.col("value") / bucket_width).cast("int"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))


# ------------------------------------------------------------------ S7 / A10
def top_event_types(events: DataFrame, k: int = 3) -> DataFrame:
    """Terms aggregation (ES aggs.terms pushdown in the reference,
    investigate_app_types.py): top-k categories by count."""
    return (events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "event_type").limit(k))


# ---------------------------------------------------------------------- W5
def orders_page(orders: DataFrame, page: int = 3, page_size: int = 20) -> DataFrame:
    """Keyless pagination via row_number (SURVEY W5: UI page slices).
    At scale prefer ``orders_page_keyset`` (WHERE key > last_seen
    LIMIT n) — row_number pagination is O(offset) and plans a
    single-partition global window; kept because it is the reference's
    exact offset semantics (arbitrary page jumps)."""
    w = Window.orderBy("o_orderkey")
    lo, hi = (page - 1) * page_size, page * page_size
    return (orders.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") > lo) & (F.col("rn") <= hi))
            .select("o_orderkey", "o_custkey", "o_totalprice",
                    F.col("rn").cast("int").alias("rn")))


def orders_page_keyset(orders: DataFrame, after_key: int,
                       page_size: int = 20) -> DataFrame:
    """Keyset (seek) pagination — the scale twin of ``orders_page``:
    the page AFTER boundary ``after_key`` is the ``page_size`` lowest
    keys above it. For the same boundary (= last key of the previous
    page) it returns the identical page CONTENTS as the row_number
    version, but the plan is a pushed-down range filter on the sort
    key + TakeOrderedAndProject — per-page cost tracks the page, not
    the offset, and nothing ever funnels through one partition. The
    trade is sequential access only (next/prev, no arbitrary page
    jumps) — exactly the cursor-pagination contract the reference's
    own paged REST sources expose (startIndex cursors,
    api_clients.py:231-280)."""
    return (orders.filter(F.col("o_orderkey") > after_key)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy("o_orderkey")
            .limit(page_size))


# ---------------------------------------------------------------------- A13
def daily_spend(events: DataFrame, day: str = "2024-01-15") -> DataFrame:
    """Budget roll-up for one day (SURVEY A13: COALESCE(SUM(amount),0)
    WHERE date=:d). The date-equality predicate prunes partitions on a
    date-partitioned landing table."""
    return (events
            .filter((F.to_date("ts") == F.lit(day))
                    & (F.col("event_type") == "purchase"))
            .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2)
                 .alias("total_spend"),
                 F.count(F.lit(1)).alias("n_purchases")))


# -------------------------------------------------------------------- C8
def email_pattern_candidates(customer: DataFrame) -> DataFrame:
    """UDTF-style fan-out (SURVEY C8: 6 candidate email patterns per
    contact, contact_enrichment.py:226-268): explode over an array of
    format_string expressions — a generator, not a UDF."""
    first = F.lower(F.regexp_extract("c_name", r"^([A-Za-z]+)", 1))
    num = F.regexp_extract("c_name", r"(\d+)", 1).cast("long").cast("string")
    domain = F.concat(first, F.lit(".example.com"))
    patterns = F.array(
        F.concat_ws("@", F.concat(first, F.lit("."), num), domain),
        F.concat_ws("@", F.concat(first, num), domain),
        F.concat_ws("@", num, domain),
    )
    return (customer
            .select("c_custkey", F.posexplode(patterns).alias("pattern_id", "email"))
            .select("c_custkey", F.col("pattern_id").cast("int").alias("pattern_id"),
                    "email"))


# -------------------------------------------------------------------- F10
def event_validation_split(events: DataFrame) -> DataFrame:
    """Validation predicate split (SURVEY F10): required fields present,
    JSON payload parseable, value in range — counts per disposition.
    The invalid side is a side-output, never an error."""
    k = F.get_json_object("props", "$.k").cast("int")
    valid = (F.col("user_id").isNotNull() & k.isNotNull()
             & (F.col("value") >= 0) & (F.col("value") <= 180))
    return (events
            .withColumn("disposition", F.when(valid, "valid").otherwise("invalid"))
            .groupBy("disposition")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("value"), 4).alias("avg_value")))


# ------------------------------------------------------- running windows
def customer_running_totals(orders: DataFrame) -> DataFrame:
    """Frame-window analytics per customer: running revenue (rows
    unbounded-preceding frame) and days since the previous order (lag).
    One shuffle on the partition key serves both window functions."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = F.sum("o_totalprice").over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey", "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.round(running, 2).alias("running_revenue"),
        F.datediff("o_orderdate", prev).cast("int").alias("days_since_prev"),
    )


# ------------------------------------------------------------ set ops
def repeat_customers(orders: DataFrame,
                     year_a: int = 1995, year_b: int = 1996) -> DataFrame:
    """INTERSECT: customers active in both years (the set-op family the
    reference approximates with Python sets)."""
    a = (orders.filter(F.year("o_orderdate") == year_a)
         .select(F.col("o_custkey").alias("custkey")))
    b = (orders.filter(F.year("o_orderdate") == year_b)
         .select(F.col("o_custkey").alias("custkey")))
    return a.intersect(b)


# ---------------------------------------------------------------- profiling
def lineitem_profile(lineitem: DataFrame) -> DataFrame:
    """Column profiling in a single pass (df.summary()-style but exact
    and oracle-comparable): count / nulls / min / max / avg per metric
    column. One aggregate, no per-column scans."""
    def prof(col: str) -> list:
        c = F.col(col)
        return [
            F.count(F.lit(1)).alias(f"{col}_count"),
            F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long")
             .alias(f"{col}_nulls"),
            F.round(F.min(c), 4).alias(f"{col}_min"),
            F.round(F.max(c), 4).alias(f"{col}_max"),
            F.round(F.avg(c), 4).alias(f"{col}_avg"),
        ]
    return lineitem.agg(*prof("l_quantity"), *prof("l_extendedprice"),
                        *prof("l_discount"))


# ------------------------------------------------------------------------- T7
def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window aggregate — batch twin of the streaming
    windowed agg (SURVEY T7)."""
    return (events.groupBy(
                F.date_format(F.date_trunc("hour", F.col("ts")),
                              "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value")))
