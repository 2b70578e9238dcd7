"""Custom stateful streaming operator (applyInPandasWithState):
running per-user totals across micro-batches must converge to the
batch groupBy result."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from database_convertor_spark.sources.readers import read_table
from database_convertor_spark.streaming.stateful import run_stateful_totals

from .conftest import SF_SMALL


def test_stateful_totals_match_batch(spark, tmp_path):
    ckpt = os.path.join(tmp_path, "state_ckpt")
    final = run_stateful_totals(spark, SF_SMALL, ckpt, n_batches=4)
    got = {r.user_id: (r.n_events, r.sum_value) for r in final.collect()}

    batch = (read_table(spark, SF_SMALL, "events")
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("s")))
    want = {r.user_id: (r.n, r.s) for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid][0] == want[uid][0]
        # state accumulates floats serially; batch sum is distributed —
        # compare to cents
        assert abs(got[uid][1] - want[uid][1]) < 0.05


def test_streaming_health_equals_batch(spark, tmp_path):
    """The stateful health stream's FINAL verdict per run must equal
    the batch operator over the same events."""
    from database_convertor_spark.operators.monitoring import user_run_health
    from database_convertor_spark.sources.readers import read_table
    from database_convertor_spark.streaming.stateful import run_health_stream

    from .conftest import SF_SMALL

    got = sorted(tuple(r) for r in run_health_stream(
        spark, SF_SMALL, str(tmp_path / "ckpt_health")).collect())
    want = sorted(tuple(r) for r in
                  user_run_health(read_table(spark, SF_SMALL, "events"))
                  .collect())
    assert len(got) > 0
    assert got == want


def test_sessionization_stream_equals_batch(spark, tmp_path):
    """The interval-merge stateful operator must reproduce batch
    sessionization exactly even though the landing stage scatters each
    user's events RANDOMLY across micro-batches (round-robin repartition) —
    the order-insensitivity claim under its most adversarial split."""
    from database_convertor_spark.operators.relational import user_sessions
    from database_convertor_spark.sources.readers import read_table
    from database_convertor_spark.streaming.stateful import (
        run_sessionization_stream,
    )

    from .conftest import SF_SMALL

    got = {r.user_id: (r.n_sessions, r.n_events)
           for r in run_sessionization_stream(
               spark, SF_SMALL, str(tmp_path / "ckpt"),
               n_batches=5).collect()}
    want = {r.user_id: (r.n_sessions, r.n_events)
            for r in user_sessions(
                read_table(spark, SF_SMALL, "events")).collect()}
    assert got == want
