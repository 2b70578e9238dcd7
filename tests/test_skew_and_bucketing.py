"""Scale levers: salted aggregation/join correctness, and bucketed
tables eliminating the join shuffle."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from database_convertor_spark.operators.skew import salted_aggregate, salted_join
from database_convertor_spark.sources.readers import read_table

from .conftest import SF_SMALL


def test_salted_aggregate_matches_plain(spark):
    orders = read_table(spark, SF_SMALL, "orders")
    plain = {(r.o_custkey): (r.n, round(r.s, 2)) for r in
             orders.groupBy("o_custkey")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("o_totalprice").alias("s")).collect()}
    salted = {(r.o_custkey): (r.n, round(r.sum_o_totalprice, 2)) for r in
              salted_aggregate(orders, "o_custkey", num_salts=8,
                               sum_cols=["o_totalprice"]).collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark):
    orders = read_table(spark, SF_SMALL, "orders")
    customer = read_table(spark, SF_SMALL, "customer").withColumnRenamed(
        "c_custkey", "o_custkey")
    plain = orders.join(customer, "o_custkey").select(
        "o_orderkey", "o_custkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", num_salts=4).select(
        "o_orderkey", "o_custkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark):
    """bucketBy on the join key co-locates both sides: the sort-merge
    join runs with zero Exchange operators — the shuffle the bucketing
    paid at write time is amortized over every later join."""
    suffix = uuid.uuid4().hex[:8]
    orders = read_table(spark, SF_SMALL, "orders")
    customer = read_table(spark, SF_SMALL, "customer")
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable(t_orders))
    (customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").saveAsTable(t_cust))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo = spark.table(t_orders)
        bc = spark.table(t_cust)
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cust}")
