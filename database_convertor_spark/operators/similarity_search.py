"""Similarity search over an embedding column (array<float>).

Two paths:
- ``brute_force_topk`` — exact top-k by cosine; the query set
  broadcasts, the corpus streams; per-partition top-k then a global
  k-merge (TakeOrdered via window over query_id). Baseline + oracle.
- ``ivf_topk`` — the scale path: probe only the coarse-quantizer
  bucket(s) of each query (the ``label`` column is the precomputed
  centroid assignment). Bucket pruning turns the scan into
  corpus/n_buckets per query, the IVF trade: recall bounded by bucket
  assignment.

The dot product / norms are higher-order-function expressions
(zip_with + aggregate) — JVM-side, no Python per row. For very wide
vectors a Pandas-UDF + numpy batch path would amortize better; at 64
dims the expression path wins (no Arrow transfer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_similarity


def _scored_pairs(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").cast("array<double>").alias("q_emb"),
                       F.col("label").alias("q_label"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").cast("array<double>").alias("c_emb"),
                      F.col("label").alias("c_label"))
    return q, c


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact ANN baseline: broadcast the (small) query set against the
    corpus, cosine per pair, row_number window per query."""
    q, c = _scored_pairs(queries, corpus)
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = cosine_similarity(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (pairs.withColumn("_sim", sim)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("_sim", 4).alias("cosine")))


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """IVF-bucketed ANN: only corpus vectors in the query's bucket are
    scored (label = coarse centroid assignment). The bucket equi-join
    replaces the cross join; at 100 TB the corpus is additionally
    partitioned by label on disk so the probe prunes files."""
    q, c = _scored_pairs(queries, corpus)
    pairs = c.join(F.broadcast(q), (F.col("c_label") == F.col("q_label"))
                   & (F.col("neighbor_id") != F.col("query_id")))
    sim = cosine_similarity(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (pairs.withColumn("_sim", sim)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("_sim", 4).alias("cosine")))
