"""Sinks — SURVEY §2.1 S17-S19.

The reference leans on PostgreSQL ``INSERT ... ON CONFLICT DO UPDATE``
for every write (database.py:260-279, 573-615, 1296-1376). Vanilla
parquet has no MERGE, so ``merge_upsert`` implements the standard
dedup-union-overwrite pattern: new rows win over existing rows on the
key, exactly one row per key survives.

Scale notes: the anti-join inside merge_upsert broadcasts the incoming
batch when it is small (the common incremental case — a weekly batch
against a 100 TB table), so the existing table is never shuffled; only
rewritten partitions pay I/O. With a transactional table format
(Delta/Iceberg — jars not in this image) the same contract maps 1:1 to
``MERGE INTO``; the key contracts in schemas.MERGE_KEYS are
format-independent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV export sink (reference S18, app.py:1584-1597). ``single_file``
    coalesces to one partition — only for small download-style outputs.
    Complex columns (arrays/maps/structs) are JSON-serialized — the CSV
    analog of the reference's flatten_dict list handling (C26)."""
    from pyspark.sql import types as T
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    out = df.select(*cols)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", "true").csv(path)


def write_excel(df: DataFrame, path: str, sheet_name: str = "Export",
                max_rows: int = 1_000_000, styled: bool = False) -> None:
    """Excel export sink (reference S17: openpyxl styled workbook,
    utils.py:60-163). Excel is a driver-side, small-output format by
    nature: hard-capped, collected via Arrow, written with pandas when
    openpyxl exists; when it is absent (this image) the stdlib
    SpreadsheetML codec writes the sheet — INCLUDING the reference's
    styled treatment when ``styled`` is set (bold white header on
    #366092, centered, autofit column widths: plain styles.xml +
    <cols> markup, no openpyxl needed).
    Complex columns are JSON-serialized, as in write_csv (C26)."""
    from pyspark.sql import types as T

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    pdf = df.select(*cols).limit(max_rows).toPandas()
    try:
        import openpyxl  # noqa: F401

        pdf.to_excel(path, sheet_name=sheet_name, index=False)
    except ImportError:
        import pandas as pd

        from .xlsx import write_xlsx

        def _cell(v):
            try:
                if v is None or pd.isna(v):
                    return None
            except (TypeError, ValueError):
                pass
            if isinstance(v, pd.Timestamp):
                return v.isoformat()
            if hasattr(v, "item") and not isinstance(v, (str, bytes)):
                v = v.item()          # numpy scalar -> Python scalar
            return v

        rows = [[_cell(v) for v in row]
                for row in pdf.itertuples(index=False, name=None)]
        write_xlsx(path, [str(c) for c in pdf.columns], rows,
                   sheet_name=sheet_name, styled=styled)


def scd2_upsert(spark: SparkSession, target_path: str, updates: DataFrame,
                keys: list[str], ts_col: str = "effective_at") -> DataFrame:
    """Slowly-changing-dimension type 2 on parquet (the CDC/SCD2
    pattern MERGE would express on Delta; emulated with
    close-open-union semantics):

    - a key arriving with a new ``ts_col`` closes the currently-open
      row (valid_to = new ts, is_current = false),
    - the new version is appended open (valid_to = null,
      is_current = true),
    - unchanged keys keep their history untouched.

    The reference tracks only updated_at/onupdate (models.py:26);
    SCD2 is the warehouse-grade upgrade of that contract — full change
    history, point-in-time queries via valid_from/valid_to."""
    updates = dedup_latest(updates, keys, ts_col)
    incoming = (updates
                .withColumn("valid_from", F.col(ts_col))
                .withColumn("valid_to", F.lit(None).cast("timestamp"))
                .withColumn("is_current", F.lit(True)))
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
        upd_keys = F.broadcast(updates.select(*keys).dropDuplicates())
        touched_open = (existing.filter(F.col("is_current"))
                        .join(upd_keys, keys, "left_semi"))
        untouched = existing.join(
            touched_open.select(*keys, "valid_from"),
            keys + ["valid_from"], "left_anti")
        new_ts = updates.select(
            *keys, F.col(ts_col).alias("_new_ts"))
        closed = (touched_open.join(F.broadcast(new_ts), keys)
                  .withColumn("valid_to", F.col("_new_ts"))
                  .withColumn("is_current", F.lit(False))
                  .drop("_new_ts"))
        merged = (untouched
                  .unionByName(closed)
                  .unionByName(incoming.select(*untouched.columns)))
    else:
        merged = incoming
    parent = os.path.dirname(target_path) or "."
    os.makedirs(parent, exist_ok=True)
    staging = tempfile.mkdtemp(prefix="scd2_stage_", dir=parent)
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(staging, target_path)
    spark.catalog.refreshByPath(target_path)
    return spark.read.parquet(target_path)


def dedup_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the newest row per key (deterministic upsert semantics)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def merge_upsert(spark: SparkSession, target_path: str, updates: DataFrame,
                 keys: list[str], broadcast_updates: bool = True) -> DataFrame:
    """MERGE-equivalent on parquet: rows in ``updates`` replace rows in
    the target with the same key; unmatched update rows are inserted.

    Implements the reference's ON CONFLICT DO UPDATE contract (S19);
    key sets per table live in ``schemas.MERGE_KEYS``.
    """
    updates = updates.dropDuplicates(keys)  # idempotent within a batch
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path)
        upd_keys = updates.select(*keys)
        if broadcast_updates:
            upd_keys = F.broadcast(upd_keys)
        kept = existing.join(upd_keys, keys, "left_anti")
        merged = kept.unionByName(updates.select(*existing.columns))
    else:
        merged = updates
    # Parquet can't overwrite a path it is currently reading; stage then swap.
    parent = os.path.dirname(target_path) or "."
    os.makedirs(parent, exist_ok=True)
    staging = tempfile.mkdtemp(prefix="merge_stage_", dir=parent)
    merged.write.mode("overwrite").parquet(staging)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.rename(staging, target_path)
    # drop the session's cached file listing for the rewritten path
    spark.catalog.refreshByPath(target_path)
    return spark.read.parquet(target_path)


def write_training_shards(chunks_with_bins: DataFrame, path: str) -> None:
    """Land packed training chunks (the ``assign_chunk_bins`` output)
    as the on-disk layout a training loader consumes: one directory
    per (lang, shard) partition, rows inside each file sorted by
    (bin_id, doc_id, chunk_id) so a sequential read replays bins in
    packing order. ``partitionBy`` prunes language/shard subsets at
    read time; ``sortWithinPartitions`` costs a per-partition sort,
    never a global one — the same contiguity contract the packing
    window established."""
    # the sort MUST lead with the partitionBy columns: that satisfies
    # the write path's required ordering, so Spark reuses THIS sort
    # instead of inserting its own Sort(lang, shard) on top — which
    # would both double the sort work and, once large enough to spill,
    # merge tie runs arbitrarily and destroy the per-file bin order
    (chunks_with_bins
     .repartition("lang", "shard")
     .sortWithinPartitions("lang", "shard", "bin_id", "doc_id", "chunk_id")
     .write.mode("overwrite")
     .partitionBy("lang", "shard")
     .parquet(path))
