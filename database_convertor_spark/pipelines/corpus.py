"""End-to-end training-corpus curation pipeline: quality filter ->
near-duplicate removal -> per-language stats. This composes the
operators a training-data user actually chains (the reference's
pipeline idea generalized to corpus curation; its closest analog is
the staged weekly ingest in weekly_scheduler.py:253-425 — filter,
dedup-against-seen, persist, report):

  1. **filter**: Gopher-style quality rules (functions/text.py
     ``gopher_passes`` — published thresholds, pure column
     expressions, evaluated in the parquet scan stage);
  2. **dedup**: word-set Jaccard near-dup pairs within (lang,
     length-band) blocks over the SURVIVING docs only (filter-first
     ordering: at 100 TB the quality gate drops ~half the corpus
     before any pairwise work), then large-star/small-star connected
     components -> drop every non-canonical cluster member;
  3. **stats**: per-language doc/token counts over the curated corpus
     — the "what did curation keep" report.

Everything is DataFrame-native: the filter is a predicate on the scan,
the dedup is the blocked equi-join family from operators/dedup.py, the
stats are one partial-aggregable groupBy. No collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gopher_passes, tokens
from ..operators import components, dedup


def curate_corpus(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Quality-filter then near-dedup the corpus; returns surviving
    document rows (all input columns)."""
    kept = documents.filter(gopher_passes(F.col("text")))
    pairs = dedup.ngram_jaccard_pairs(kept, threshold=threshold)
    return components.drop_near_duplicates(kept, pairs)


def curation_stats(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """The curation report: per-language kept-doc and token counts over
    the filtered + deduped corpus."""
    curated = curate_corpus(documents, threshold)
    n = F.size(tokens(F.col("text")))
    return (curated
            .select("lang", n.alias("_n"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("_n").cast("long").alias("total_tokens"),
                 F.round(F.avg("_n"), 4).alias("avg_tokens")))
