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


def ingest_documents(new_docs: DataFrame, corpus_docs: DataFrame,
                     threshold: float = 0.5) -> DataFrame:
    """Incremental ingest dedup: return the subset of ``new_docs`` that
    belongs in the corpus, treating the existing corpus as IMMUTABLE
    (the reference's weekly ingest discipline — existing rows are never
    rewritten, weekly_scheduler.py:586-609):

    - a new doc in any near-dup cluster that touches a corpus doc is
      dropped (its content is already represented — transitively: a
      new doc chained to the corpus through other new dups drops too);
    - pure-new clusters keep their canonical (min doc_id) member only.

    Pairwise work is ``ngram_jaccard_pairs_incremental`` — |new| x
    block-overlap, never corpus x corpus — and components run over the
    touched neighborhood only (nodes appearing in some incremental
    pair), not the whole corpus.

    Contract (tested): incremental pairs between the survivors and the
    (deduped) corpus are EMPTY — nothing the ingest admits duplicates
    anything already admitted.
    """
    pairs = dedup.ngram_jaccard_pairs_incremental(
        new_docs, corpus_docs, threshold=threshold)
    comps = components.dedup_clusters(pairs, "doc_a", "doc_b")
    tainted = (comps.join(corpus_docs.select("doc_id"), "doc_id", "left_semi")
               .select("cluster_id").distinct())
    losers_tainted = (comps.join(tainted, "cluster_id", "left_semi")
                      .select("doc_id"))
    losers_new = comps.filter(~F.col("is_canonical")).select("doc_id")
    losers = losers_tainted.unionByName(losers_new).distinct()
    return new_docs.join(losers, "doc_id", "left_anti")


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
