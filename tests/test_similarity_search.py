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


def test_numpy_topk_empty_queries_returns_empty(spark):
    """An empty query frame must short-circuit to an empty, correctly
    typed result — not crash in np.vstack before any Spark work."""
    emb = read_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(emb.vec_id < 0)
    out = brute_force_topk_numpy(queries, emb, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "rank", "cosine"]
    # id types follow the input, not a hardcoded bigint
    assert dict(out.dtypes)["query_id"] == dict(emb.dtypes)["vec_id"]


def test_numpy_topk_broadcast_guard_raises(spark, monkeypatch):
    """The query set is broadcast by contract; above the size bound the
    operator must refuse loudly instead of OOMing the driver."""
    import pytest

    from database_convertor_spark.operators import similarity_search as ss

    emb = read_table(spark, SF_SMALL, "embeddings")
    monkeypatch.setattr(ss, "MAX_BROADCAST_QUERIES", 3)
    with pytest.raises(ValueError, match="broadcasts the query set"):
        ss.brute_force_topk_numpy(emb.filter(emb.vec_id < 10), emb, k=2)
