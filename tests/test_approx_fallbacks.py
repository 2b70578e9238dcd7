"""The approx scale fallbacks (HLL++ distinct, GK percentile sketch)
must stay within their documented error bounds of the exact twins —
this is the contract that makes them safe to swap in at 100 TB."""

from __future__ import annotations

from database_convertor_spark.operators.relational import (
    event_value_percentiles,
    event_value_percentiles_approx,
    order_stats_summary,
    order_stats_summary_approx,
)
from database_convertor_spark.sources.readers import read_table

from .conftest import SF_SMALL


def test_approx_count_distinct_within_rsd(spark):
    orders = read_table(spark, SF_SMALL, "orders")
    exact = order_stats_summary(orders).first()
    approx = order_stats_summary_approx(orders, rsd=0.05).first()
    assert approx.n_orders == exact.n_orders          # plain counts exact
    assert approx.n_open == exact.n_open
    rel_err = (abs(approx.n_customers_with_orders
                   - exact.n_customers_with_orders)
               / exact.n_customers_with_orders)
    assert rel_err <= 0.15   # 3x the 5% rsd — generous, deterministic


def test_approx_percentiles_within_rank_error(spark):
    events = read_table(spark, SF_SMALL, "events")
    exact = {r.event_type: r for r in event_value_percentiles(events).collect()}
    approx = {r.event_type: r
              for r in event_value_percentiles_approx(events).collect()}
    assert exact.keys() == approx.keys()
    for et, e in exact.items():
        a = approx[et]
        assert a.mean == e.mean                        # avg is exact
        # GK guarantees rank error; at accuracy=10000 on these
        # distributions the VALUE error stays tiny too
        for col in ("p50", "p90"):
            ev, av = getattr(e, col), getattr(a, col)
            assert abs(av - ev) <= max(0.05 * abs(ev), 1.0), (et, col)
