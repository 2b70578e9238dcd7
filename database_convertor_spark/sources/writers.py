"""Sinks — SURVEY §2.1 S17-S19.

The reference leans on PostgreSQL ``INSERT ... ON CONFLICT DO UPDATE``
for every write (database.py:260-279, 573-615, 1296-1376). Vanilla
parquet has no MERGE, so ``merge_upsert`` implements the standard
dedup-union-overwrite pattern: new rows win over existing rows on the
key, exactly one row per key survives.

Scale design (the part that matters at 100 TB): ``merge_upsert`` is
PARTITION-SCOPED. Each table declares either a natural partition
column (which must be part of the merge key, so a matched row always
lands in the partition that already holds it) or a derived
hash-bucket column computed from the full key
(``pmod(xxhash64(keys), n_buckets)`` — deterministic across sessions,
so every version of a key routes to the same bucket forever). A merge
then (1) computes the touched partition values from the update batch
(one distinct-collect, bounded by the batch), (2) reads ONLY those
partitions of the existing table (directory partition pruning — the
untouched 99% of the table is never listed, read, or written),
(3) anti-joins the broadcast update keys inside that scope, and
(4) swaps ONLY the touched partition directories. Untouched partition
files are left physically untouched — same inode, same mtime. I/O per
merge rides ``touched_partitions / total_partitions × table_bytes``,
not table size. Size ``hash_buckets`` so a typical batch touches a
small fraction: buckets ≈ table_bytes / target_partition_bytes, and a
batch of K random keys touches ≤ K buckets.

Crash safety: every swap is stage → rename-aside → rename-in →
delete-aside (the ``compact_text_index`` pattern, search.py). At every
intermediate point the data exists on disk under either the final or
the ``__aside`` name; ``_reconcile_asides`` (run at the start of every
merge) rolls an interrupted swap forward or back, so a crash can never
leave a table (or a partition of it) missing.

Per-table partition contracts live in ``schemas.MERGE_PARTITION_SPECS``
next to the key contracts in ``schemas.MERGE_KEYS``. With a
transactional table format (Delta/Iceberg — jars not in this image)
the same contract maps 1:1 to ``MERGE INTO``; both contract dicts are
format-independent.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_ASIDE_SUFFIX = "__aside"
_SPEC_FILE = "_merge_spec.json"  # leading '_' → invisible to Spark reads


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
                keys: list[str], ts_col: str = "effective_at",
                partition_by: str | None = None,
                hash_buckets: int | None = None) -> DataFrame:
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
    history, point-in-time queries via valid_from/valid_to.

    Partition scoping (round 10 — the same contract as
    ``merge_upsert``, see the module docstring): ``partition_by`` (a
    natural partition column, must be ∈ ``keys``) or ``hash_buckets``
    (a derived key-hash bucket column). A key's ENTIRE history lives
    in one partition — the partition value is a function of the key —
    so the close-open logic runs against only the touched partitions
    and only their directories are rewritten; history in every other
    partition is physically untouched. The spec persists in the same
    ``_merge_spec.json`` sidecar (validated, adopted by spec-less
    calls, migrated from pre-spec layouts with one full rewrite)."""
    if partition_by is not None and hash_buckets is not None:
        raise ValueError("pass partition_by OR hash_buckets, not both")
    if partition_by is not None and partition_by not in keys:
        raise ValueError(
            f"partition_by={partition_by!r} must be one of the SCD2 keys "
            f"{keys}: a key's history must live in one partition")
    _reconcile_asides(target_path)
    exists = os.path.exists(target_path)
    spec = _read_merge_spec(target_path) if exists else None
    if spec is not None and partition_by is None and hash_buckets is None:
        partition_by = spec["partition_by"]
        hash_buckets = spec["hash_buckets"]
    part_col = partition_by if partition_by is not None else (
        BUCKET_COL if hash_buckets else None)
    want_spec = {"partition_by": partition_by, "hash_buckets": hash_buckets,
                 "keys": sorted(keys)}
    if exists and spec is not None and part_col is not None \
            and spec != want_spec:
        raise ValueError(
            f"merge spec mismatch for {target_path}: table was built with "
            f"{spec}, called with {want_spec} — changing the partition "
            "contract on an existing table would route keys to fresh "
            "partitions; rebuild the table or keep the original spec")

    updates = dedup_latest(updates, keys, ts_col)
    if hash_buckets:
        updates = updates.withColumn(
            part_col, _bucket_expr(keys, hash_buckets))
    incoming = (updates
                .withColumn("valid_from", F.col(ts_col))
                .withColumn("valid_to", F.lit(None).cast("timestamp"))
                .withColumn("is_current", F.lit(True)))

    parent = os.path.dirname(target_path) or "."
    os.makedirs(parent, exist_ok=True)
    scoped = (exists and part_col is not None and spec == want_spec)

    if exists:
        existing = spark.read.parquet(target_path)
        if scoped:
            touched = [r[0] for r in
                       updates.select(part_col).distinct().collect()]
            non_null = [v for v in touched if v is not None]
            cond = F.col(part_col).isin(non_null)
            if len(non_null) < len(touched):
                cond = cond | F.col(part_col).isNull()
            existing = existing.filter(cond)
        elif hash_buckets and part_col not in existing.columns:
            # one-time layout migration of a pre-spec table
            existing = existing.withColumn(
                part_col, _bucket_expr(keys, hash_buckets))
        elif partition_by is not None \
                and partition_by not in existing.columns:
            raise ValueError(
                f"partition_by={partition_by!r} not a column of the "
                f"existing table at {target_path}")
        # every key join below is null-safe (`<=>`, _key_cond) so a
        # null-keyed key's history closes exactly like any other —
        # the same contract merge_upsert keeps via _anti_join_keys
        upd_keys = F.broadcast(updates.select(*keys).dropDuplicates())
        cur = existing.filter(F.col("is_current"))
        touched_open = cur.join(
            upd_keys, _key_cond(cur, upd_keys, keys), "left_semi")
        open_keys = touched_open.select(*keys, "valid_from")
        untouched = existing.join(
            open_keys,
            _key_cond(existing, open_keys, keys + ["valid_from"]),
            "left_anti")
        new_ts = F.broadcast(updates.select(
            *keys, F.col(ts_col).alias("_new_ts")))
        closed = (touched_open
                  .join(new_ts, _key_cond(touched_open, new_ts, keys))
                  .select(touched_open["*"], new_ts["_new_ts"])
                  .withColumn("valid_to", F.col("_new_ts"))
                  .withColumn("is_current", F.lit(False))
                  .drop("_new_ts"))
        merged = (untouched
                  .unionByName(closed)
                  .unionByName(incoming.select(*untouched.columns)))
    else:
        merged = incoming

    staging = tempfile.mkdtemp(prefix="scd2_stage_", dir=parent)
    writer = merged.write.mode("overwrite")
    if part_col:
        writer = writer.partitionBy(part_col)
    writer.parquet(staging)
    if scoped:
        for entry in os.listdir(staging):
            if entry.startswith(part_col + "="):
                _swap_dir(os.path.join(staging, entry),
                          os.path.join(target_path, entry))
        shutil.rmtree(staging)
    else:
        if part_col:
            _write_merge_spec(staging, want_spec)
        _swap_dir(staging, target_path)
    spark.catalog.refreshByPath(target_path)
    return spark.read.parquet(target_path)


def dedup_latest(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the newest row per key (deterministic upsert semantics)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def _aside_path(dst: str) -> str:
    """The aside name for a directory being swapped: dot-prefixed so
    Spark's file index never lists it (partition-dir names containing
    '=' are ONLY hidden when dot-prefixed — a bare ``provider=x__aside``
    would be read back as a phantom partition value)."""
    d, b = os.path.split(dst)
    return os.path.join(d, "." + b + _ASIDE_SUFFIX)


def _swap_dir(src: str, dst: str) -> None:
    """Atomic-as-possible directory replacement: rename the old ``dst``
    aside, rename ``src`` into place, delete the aside LAST. At every
    intermediate point the data exists on disk under either ``dst`` or
    its aside name — a crash anywhere is recoverable by
    ``_reconcile_asides`` (roll forward if the new dir landed, roll
    back if it did not). Never leaves ``dst`` missing with no aside."""
    aside = _aside_path(dst)
    if os.path.exists(aside):  # stale aside from a crashed *previous* swap
        _reconcile_one_aside(aside, dst)
    if os.path.exists(dst):
        os.rename(dst, aside)
    os.rename(src, dst)
    if os.path.exists(aside):
        shutil.rmtree(aside)


def _reconcile_one_aside(aside: str, primary: str) -> None:
    if os.path.exists(primary):
        # swap completed (new data renamed in) but cleanup died → finish it
        shutil.rmtree(aside)
    else:
        # crash between rename-aside and rename-in → roll back to old data
        os.rename(aside, primary)


def _reconcile_asides(target_path: str) -> None:
    """Recover from a crash mid-swap: for the table directory itself and
    for every partition directory inside it, an aside leftover is
    rolled forward (primary present → delete aside) or rolled back
    (primary missing → rename aside to primary). Run at the start of
    every merge/scd2 call, so the next write after a crash self-heals.
    A partition-scoped merge interrupted BETWEEN partition swaps leaves
    some partitions new and some old — never missing — and replaying
    the same batch (merge_upsert is idempotent) converges the rest."""
    def _primary_for(aside: str) -> str:
        d, b = os.path.split(aside)
        return os.path.join(d, b[1:-len(_ASIDE_SUFFIX)])

    top_aside = _aside_path(target_path)
    if os.path.exists(top_aside):
        _reconcile_one_aside(top_aside, target_path)
    if not os.path.isdir(target_path):
        return
    for entry in os.listdir(target_path):
        if entry.startswith(".") and entry.endswith(_ASIDE_SUFFIX):
            aside = os.path.join(target_path, entry)
            _reconcile_one_aside(aside, _primary_for(aside))


def _bucket_expr(keys: list[str], n_buckets: int):
    """Deterministic bucket id from the full merge key: stable across
    sessions and batches, so every version of a key routes to the same
    partition directory forever (the property partition-scoped MERGE
    rests on). Keys are cast to string first so e.g. int vs bigint
    representations of the same key value cannot diverge."""
    return F.pmod(
        F.xxhash64(*[F.col(k).cast("string") for k in keys]),
        F.lit(n_buckets)).cast("int")


def _read_merge_spec(target_path: str) -> dict | None:
    p = os.path.join(target_path, _SPEC_FILE)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return None


def _write_merge_spec(target_path: str, spec: dict) -> None:
    with open(os.path.join(target_path, _SPEC_FILE), "w") as fh:
        json.dump(spec, fh)


BUCKET_COL = "_merge_bucket"


def _key_cond(left: DataFrame, right: DataFrame, cols: list[str]):
    """NULL-SAFE key-equality join condition. A plain `join(keys, ...)`
    compares with `=`, where NULL = NULL is NULL — a null-keyed row
    would never match its replacement and duplicate keys would
    accumulate (while dropDuplicates / Window.partitionBy treat nulls
    as EQUAL within a batch; the semantics must agree across batches).
    `<=>` keeps the join a hash equi-join."""
    cond = None
    for k in cols:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    return cond


def _anti_join_keys(existing: DataFrame, upd_keys: DataFrame,
                    keys: list[str]) -> DataFrame:
    """Existing rows whose key matches NO update row (null-safe)."""
    return existing.join(upd_keys, _key_cond(existing, upd_keys, keys),
                         "left_anti")


def merge_upsert(spark: SparkSession, target_path: str, updates: DataFrame,
                 keys: list[str], broadcast_updates: bool = True,
                 partition_by: str | None = None,
                 hash_buckets: int | None = None) -> DataFrame:
    """MERGE-equivalent on parquet: rows in ``updates`` replace rows in
    the target with the same key; unmatched update rows are inserted.

    Implements the reference's ON CONFLICT DO UPDATE contract (S19);
    key sets per table live in ``schemas.MERGE_KEYS``, partition
    contracts in ``schemas.MERGE_PARTITION_SPECS``.

    Partition scoping (see module docstring for the full design):

    - ``partition_by`` — a natural partition column; MUST be one of
      ``keys`` (a matched row must land in the partition that already
      holds it, or the old version would survive in its old partition).
    - ``hash_buckets`` — derive a ``_merge_bucket`` partition column
      from the full key instead (for tables with no natural clustering
      column, e.g. ``companies`` keyed only by company_number).

    With either, only the partition directories the update batch
    touches are read, anti-joined, rewritten, and swapped; every other
    partition's files are left byte-identical on disk. Without either,
    the whole table is staged and swapped (correct, but O(table) I/O —
    fine for the small config tables, wrong for the warehouse facts).

    The chosen spec is persisted in a ``_merge_spec.json`` sidecar and
    validated on every later merge — changing ``hash_buckets`` on an
    existing table would silently route keys to fresh partitions, so a
    mismatch raises instead. A table that predates its spec (written
    unpartitioned) is migrated with one full rewrite, after which every
    merge is partition-scoped.
    """
    if partition_by is not None and hash_buckets is not None:
        raise ValueError("pass partition_by OR hash_buckets, not both")
    if partition_by is not None and partition_by not in keys:
        raise ValueError(
            f"partition_by={partition_by!r} must be one of the merge keys "
            f"{keys}: a matched row must route to the partition that "
            "already holds it, otherwise the old version survives in the "
            "old partition")
    _reconcile_asides(target_path)
    exists = os.path.exists(target_path)
    spec = _read_merge_spec(target_path) if exists else None
    if spec is not None and partition_by is None and hash_buckets is None:
        # caller passed no contract but the table has one persisted —
        # adopt it (a plain merge_upsert on a bucketed table must keep
        # routing keys to their buckets, not flatten the layout)
        partition_by = spec["partition_by"]
        hash_buckets = spec["hash_buckets"]
    part_col = partition_by if partition_by is not None else (
        BUCKET_COL if hash_buckets else None)

    updates = updates.dropDuplicates(keys)  # idempotent within a batch
    if hash_buckets:
        updates = updates.withColumn(
            part_col, _bucket_expr(keys, hash_buckets))

    parent = os.path.dirname(target_path) or "."
    os.makedirs(parent, exist_ok=True)

    want_spec = {"partition_by": partition_by, "hash_buckets": hash_buckets,
                 "keys": sorted(keys)}
    if exists and spec is not None and part_col is not None \
            and spec != want_spec:
        raise ValueError(
            f"merge spec mismatch for {target_path}: table was built with "
            f"{spec}, called with {want_spec} — changing the partition "
            "contract on an existing table would route keys to fresh "
            "partitions; rebuild the table or keep the original spec")

    if not exists:
        staging = tempfile.mkdtemp(prefix="merge_stage_", dir=parent)
        writer = updates.write.mode("overwrite")
        if part_col:
            writer = writer.partitionBy(part_col)
        writer.parquet(staging)
        if part_col:
            _write_merge_spec(staging, want_spec)
        _swap_dir(staging, target_path)
        spark.catalog.refreshByPath(target_path)
        return spark.read.parquet(target_path)

    existing = spark.read.parquet(target_path)
    # partition-scoped only when the on-disk layout already carries the
    # partition column as a directory level (spec sidecar says so);
    # otherwise this call performs the one-time layout migration below
    scoped = part_col is not None and spec == want_spec

    if scoped:
        # ---- touched partitions only -----------------------------------
        touched = [r[0] for r in
                   updates.select(part_col).distinct().collect()]
        non_null = [v for v in touched if v is not None]
        cond = F.col(part_col).isin(non_null)
        if len(non_null) < len(touched):        # null partition value
            cond = cond | F.col(part_col).isNull()
        # directory partition pruning: only the touched partitions'
        # files are listed and read
        in_scope = existing.filter(cond)
        upd_keys = updates.select(*keys)
        if broadcast_updates:
            upd_keys = F.broadcast(upd_keys)
        kept = _anti_join_keys(in_scope, upd_keys, keys)
        merged = kept.unionByName(updates.select(*existing.columns))
        staging = tempfile.mkdtemp(prefix="merge_stage_", dir=parent)
        merged.write.mode("overwrite").partitionBy(part_col).parquet(staging)
        # swap exactly the partition directories the staging write
        # produced (Spark's own dir-name encoding on both sides)
        for entry in os.listdir(staging):
            if entry.startswith(part_col + "="):
                _swap_dir(os.path.join(staging, entry),
                          os.path.join(target_path, entry))
        shutil.rmtree(staging)
    else:
        # ---- full rewrite: unpartitioned table, or one-time migration
        # of a pre-spec table into the partitioned layout ----------------
        if hash_buckets and part_col not in existing.columns:
            existing = existing.withColumn(
                part_col, _bucket_expr(keys, hash_buckets))
        if partition_by is not None and partition_by not in existing.columns:
            raise ValueError(
                f"partition_by={partition_by!r} not a column of the "
                f"existing table at {target_path}")
        upd_keys = updates.select(*keys)
        if broadcast_updates:
            upd_keys = F.broadcast(upd_keys)
        kept = _anti_join_keys(existing, upd_keys, keys)
        merged = kept.unionByName(updates.select(*existing.columns))
        staging = tempfile.mkdtemp(prefix="merge_stage_", dir=parent)
        writer = merged.write.mode("overwrite")
        if part_col:
            writer = writer.partitionBy(part_col)
        writer.parquet(staging)
        if part_col:
            _write_merge_spec(staging, want_spec)
        _swap_dir(staging, target_path)
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
