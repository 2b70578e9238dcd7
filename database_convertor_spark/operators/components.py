"""Connected components over an edge list — turns near-duplicate PAIRS
(from minhash_lsh_pairs / simhash_pairs / embedding_neardup_pairs) into
duplicate GROUPS with a canonical representative, which is what a
dedup pipeline actually consumes ("keep one doc per cluster").

Algorithm: alternating large-star / small-star style label propagation
specialized to min-label convergence:

  repeat:
    for every node, new_label = min(own label, labels of neighbors)
  until no label changes.

Each iteration is one groupBy-min + one join — no driver-side graph,
no GraphFrames dependency. Converges in O(diameter) iterations; dedup
clusters are near-cliques (diameter 1-2), so 2-3 iterations in
practice. localCheckpoint() every iteration truncates the lineage so
plans don't grow exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iterations: int = 20) -> DataFrame:
    """Edge list (undirected) -> (node, component) where component is
    the minimum node id reachable. Output one row per distinct node."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct())
    labels = (sym.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("component", F.col("node")))
    changed = -1
    for _ in range(max_iterations):
        neighbor_min = (sym.join(labels, sym.b == labels.node)
                        .groupBy("a")
                        .agg(F.min("component").alias("nbr_min")))
        updated = (labels.join(neighbor_min,
                               labels.node == neighbor_min.a, "left")
                   .select("node",
                           F.least("component",
                                   F.coalesce("nbr_min", F.col("component")))
                           .alias("component")))
        updated = updated.localCheckpoint(eager=True)
        changed = (updated.alias("u")
                   .join(labels.alias("l"), "node")
                   .filter(F.col("u.component") != F.col("l.component"))
                   .limit(1).count())
        labels = updated
        if changed == 0:
            break
    if changed != 0:
        # min-label propagation needs O(diameter) rounds; returning
        # silently here would hand back under-merged clusters (e.g. a
        # chain of duplicate pairs longer than the cap).
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} iterations — raise max_iterations "
            f"(components with diameter > cap exist)")
    return labels


def dedup_clusters(pairs: DataFrame, left_col: str, right_col: str) -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id, is_canonical): cluster_id
    is the minimum doc id of the component; the canonical row is the
    one to keep."""
    comps = connected_components(pairs, left_col, right_col)
    return comps.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"))


def drop_near_duplicates(documents: DataFrame, pairs: DataFrame,
                         left_col: str = "doc_a",
                         right_col: str = "doc_b") -> DataFrame:
    """The end-to-end dedup contract: remove every non-canonical member
    of every near-dup cluster from the corpus."""
    losers = (dedup_clusters(pairs, left_col, right_col)
              .filter(~F.col("is_canonical"))
              .select(F.col("doc_id")))
    return documents.join(losers, "doc_id", "left_anti")
