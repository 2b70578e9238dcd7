"""The Arrow/numpy GEMM top-k must be row-for-row identical to the
HOF-expression baseline (same semantics, different execution)."""

from __future__ import annotations

from database_convertor_spark.operators.similarity_search import (
    brute_force_topk,
    brute_force_topk_numpy,
)
from database_convertor_spark.sources.readers import read_table

from .conftest import SF_SMALL


def test_numpy_topk_equals_expression_topk(spark):
    emb = read_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(emb.vec_id < 5)
    a = sorted(map(tuple, brute_force_topk(queries, emb, k=5).collect()))
    b = sorted(map(tuple, brute_force_topk_numpy(queries, emb, k=5).collect()))
    assert a == b


def test_multiprobe_all_buckets_equals_brute_force(spark):
    """nprobe = n_labels degenerates multi-probe IVF to an exact
    search — the recall lever's correctness anchor."""
    from database_convertor_spark.operators.similarity_search import (
        ivf_topk_multiprobe,
    )
    emb = read_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(emb.vec_id < 5)
    n_labels = emb.select("label").distinct().count()
    a = sorted(map(tuple, brute_force_topk(queries, emb, k=5).collect()))
    b = sorted(map(tuple,
                   ivf_topk_multiprobe(queries, emb, k=5,
                                       nprobe=n_labels).collect()))
    assert a == b
