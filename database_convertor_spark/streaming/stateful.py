"""Custom stateful streaming operator (SURVEY T5: the reference's
progressively-updated run counters / budget accumulation) via
``applyInPandasWithState``: per-user running totals maintained across
micro-batches in managed state, emitted in update mode.

State size is bounded by the key cardinality (one small tuple per
user); at 100 TB of events the state store scales with users, not
events — this is the property that makes the operator viable."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([{"user_id": key[0], "n_events": n,
                         "sum_value": round(total, 2)}])


def run_stateful_totals(spark: SparkSession, sf_dir: str,
                        checkpoint: str, n_batches: int = 4) -> DataFrame:
    """Drive the events table through the stateful operator in
    ``n_batches`` micro-batches (landing staged as n files,
    maxFilesPerTrigger=1) and return the final per-user totals."""
    from ..sources.readers import read_table
    from ..schemas import TESTDATA_SCHEMAS

    landing = checkpoint + "_landing"
    (read_table(spark, sf_dir, "events")
     .repartition(n_batches).write.mode("overwrite").parquet(landing))

    stream = (spark.readStream.schema(TESTDATA_SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(landing))
    totals = (stream.groupBy("user_id")
              .applyInPandasWithState(
                  _update_totals, OUTPUT_SCHEMA, STATE_SCHEMA,
                  "update", GroupStateTimeout.NoTimeout))
    q = (totals.writeStream.outputMode("update")
         .format("memory").queryName("user_totals")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # update mode appends one row per (user, batch); the final state is
    # the row with the largest n_events per user
    return spark.sql("""
        SELECT user_id, n_events, sum_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM user_totals) WHERE rn = 1
    """)
