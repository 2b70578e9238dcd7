"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a cluster deployment would set
per-executor; the scale-relevant knobs (AQE, skew join handling,
shuffle partition sizing, Arrow) are on so the same plans survive a
100x scale-up: AQE re-coalesces the 32 local shuffle partitions today
and re-splits skewed partitions on a 1000-executor cluster tomorrow.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "database_convertor_spark",
              master: str | None = None,
              shuffle_partitions: str | int | None = None) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Pinned session timezone (UTC) keeps timestamp semantics identical
    to UTC-naive engines (the DuckDB correctness oracle). Arrow is on
    for every pandas-UDF boundary.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # reliable checkpoints (connected components) are deleted when
        # their RDDs are GC'd instead of accumulating until JVM exit —
        # a long-lived session runs components many times (catalog
        # sweeps, bench loops), each leaving per-round checkpoint files
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 128 MB matches cluster practice; the env override exists so
        # a local scale run over few-but-splittable files can emulate
        # the many-input-splits parallelism a real corpus arrives with
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                               str(128 * 1024 * 1024)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df):
    """Repartition ``df`` to the cluster's default parallelism ONLY
    when its source arrives with fewer partitions than that — the
    local/small-deployment fix for heavy per-row work (similarity
    ladders, shingle explodes, self-join probes) inheriting a
    single-file scan's 1-2 splits. A many-split 100-TB scan keeps its
    natural partitioning and pays no extra shuffle.

    Call this on SCAN-side frames only (projections/filters/explodes
    of a source): probing ``.rdd`` on a frame that already contains a
    broadcast join eagerly materializes the broadcast build, running
    its sub-plan twice (measured at the sf1 probe).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
