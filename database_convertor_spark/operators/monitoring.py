"""Run-health monitoring — SURVEY §3.3 stats/monitoring: the
reference's AutomationMonitor evaluates each automation run against
fixed performance thresholds and emits alerts
(automation_monitoring.py:52-57 thresholds, 148-155 alert hook):

    max_duration_minutes = 120, min_success_rate = 80%,
    max_error_rate = 20%, min processed = 1.

Spark-first shape: the reference updates counters row-by-row through
an ORM as the run progresses; here a "run" is a grouped aggregate over
its event rows and the health verdict is a pure column expression over
the aggregate — one partial-aggregable groupBy for ANY number of runs,
no per-run loop. Alert reasons are emitted in a fixed check order so
the output is deterministic and engine-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference's published thresholds (automation_monitoring.py:52-57)
MAX_DURATION_MINUTES = 120.0
MIN_SUCCESS_RATE = 80.0
MAX_ERROR_RATE = 20.0
MIN_PROCESSED = 1


def health_verdict(duration_minutes: Column, success_rate: Column,
                   error_rate: Column, n_processed: Column
                   ) -> tuple[Column, Column]:
    """(healthy, alert_reasons) columns from run metrics — the
    reference's check_performance ladder as expressions. Reasons are
    comma-joined in threshold-declaration order.

    Deliberate departures from the reference (kept because they are
    strictly more useful, and the oracle SQL applies the same rules —
    same policy as name_match_email_join's empty-name guards):
    - the reference DECLARES min_success_rate but never evaluates it
      (automation_monitoring.py: _check_performance_thresholds);
      the ``low_success_rate`` alert here actually fires;
    - the reference skips the error-rate check when 0 operations ran;
      here n_processed=0 yields success_rate 0 -> ``low_success_rate``
      alongside ``nothing_processed`` instead of silence."""
    checks = [
        (duration_minutes > MAX_DURATION_MINUTES, "duration_exceeded"),
        (success_rate < MIN_SUCCESS_RATE, "low_success_rate"),
        (error_rate > MAX_ERROR_RATE, "high_error_rate"),
        (n_processed < MIN_PROCESSED, "nothing_processed"),
    ]
    reasons = F.concat_ws(",", *[
        F.when(cond, F.lit(name)).otherwise(F.lit(None))
        for cond, name in checks])
    healthy = F.lit(True)
    for cond, _ in checks:
        healthy = healthy & ~cond
    return healthy, reasons


def run_health(runs: DataFrame,
               run_id: str = "run_id",
               duration_col: str = "duration_minutes",
               processed_col: str = "n_processed",
               errors_col: str = "n_errors") -> DataFrame:
    """Health report over a per-run stats frame: rates, verdict,
    alert reasons."""
    n = F.col(processed_col).cast("double")
    err = F.col(errors_col).cast("double")
    success = F.round(F.when(n > 0, (n - err) * 100.0 / n).otherwise(0.0), 2)
    error_rate = F.round(F.when(n > 0, err * 100.0 / n).otherwise(0.0), 2)
    out = runs.select(
        run_id,
        F.round(F.col(duration_col), 2).alias("duration_minutes"),
        F.col(processed_col).cast("long").alias("n_processed"),
        F.col(errors_col).cast("long").alias("n_errors"),
        success.alias("success_rate_pct"),
        error_rate.alias("error_rate_pct"))
    healthy, reasons = health_verdict(
        F.col("duration_minutes"), F.col("success_rate_pct"),
        F.col("error_rate_pct"), F.col("n_processed"))
    return out.select("*", healthy.alias("healthy"),
                      reasons.alias("alert_reasons"))


def user_run_health(events: DataFrame) -> DataFrame:
    """Driver-schema instantiation: each user-DAY of events plays an
    automation run (duration = first-to-last event that day, errors =
    'error' events), so all four thresholds genuinely vary. One
    groupBy builds the runs frame; run_health scores it."""
    run_key = F.concat_ws(":", F.col("user_id").cast("string"),
                          F.date_format("ts", "yyyy-MM-dd"))
    runs = (events.groupBy(run_key.alias("run_id"))
            .agg(((F.unix_timestamp(F.max("ts"))
                   - F.unix_timestamp(F.min("ts"))) / 60.0)
                 .alias("duration_minutes"),
                 F.count(F.lit(1)).alias("n_processed"),
                 F.sum(F.when(F.col("event_type") == "error", 1)
                       .otherwise(0)).alias("n_errors")))
    return run_health(runs)
