"""Connected components / dedup clustering vs a driver-side union-find
(small data ground truth)."""

from __future__ import annotations

from database_convertor_spark.operators.components import (
    connected_components,
    dedup_clusters,
    drop_near_duplicates,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


EDGES = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (3, 4)]


def test_connected_components_matches_union_find(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find(EDGES)


def test_dedup_clusters_canonical_flags(spark):
    pairs = spark.createDataFrame(EDGES, ["doc_a", "doc_b"])
    rows = dedup_clusters(pairs, "doc_a", "doc_b").collect()
    canon = {r.doc_id for r in rows if r.is_canonical}
    assert canon == {1, 10, 20}


def test_drop_near_duplicates(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]],
        ["doc_id", "text"])
    pairs = spark.createDataFrame(EDGES, ["doc_a", "doc_b"])
    kept = {r.doc_id for r in drop_near_duplicates(docs, pairs).collect()}
    # one canonical per cluster + untouched singletons
    assert kept == {1, 10, 20, 99}


def test_drop_near_duplicates_keep_best(spark):
    """score_col flips the winner rule: highest score per cluster wins
    (ties -> min doc_id); singletons untouched; null scores lose to
    any scored member."""
    docs = spark.createDataFrame(
        [(1, 10), (2, 90), (3, 90), (4, 5),        # cluster {1,2,3,4}
         (10, None), (11, 50),                     # cluster {10,11}
         (20, 70), (21, 70), (22, 70),             # cluster {20,21,22}
         (99, 1)],                                 # singleton
        "doc_id int, score int")
    pairs = spark.createDataFrame(EDGES, ["doc_a", "doc_b"])
    kept = {r.doc_id for r in
            drop_near_duplicates(docs, pairs, score_col="score").collect()}
    # 2 beats 3 on the id tiebreak; 11 beats null-scored 10;
    # 20 wins the three-way tie; 99 is no cluster member at all
    assert kept == {2, 11, 20, 99}


def test_connected_components_raises_on_iteration_cap(spark):
    from database_convertor_spark.operators.components import (
        connected_components,
    )
    import pytest as _pytest
    # a 7-node chain has diameter 6 > cap 2: silent return would hand
    # back under-merged clusters, so the cap must raise
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["src", "dst"])
    # local_edges_budget=0 forces the distributed star rounds — the
    # iteration cap is a property of that regime (the r10 local fast
    # path has no rounds to cap)
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=2,
                             local_edges_budget=0)
    # and a generous cap converges fine
    labels = connected_components(chain, max_iterations=10,
                                  local_edges_budget=0)
    assert {r.component for r in labels.collect()} == {0}


def test_incremental_pairs_union_invariant(spark):
    """pairs(new ∪ corpus) == incremental(new, corpus) ∪ pairs(corpus):
    the incremental operator finds exactly the pairs the full-batch
    operator would add when the new batch arrives."""
    from pyspark.sql import functions as F

    from database_convertor_spark.operators import dedup
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    full = {tuple(r) for r in dedup.ngram_jaccard_pairs(docs).collect()}
    inc = {tuple(r) for r in
           dedup.ngram_jaccard_pairs_incremental(new, corpus).collect()}
    old = {tuple(r) for r in dedup.ngram_jaccard_pairs(corpus).collect()}
    assert inc | old == full
    assert inc & old == set()          # disjoint: nothing re-found


def test_ingest_documents_admits_no_duplicates(spark):
    """The ingest contract: survivors of ingest_documents share no
    near-dup pair with the corpus or with each other."""
    from pyspark.sql import functions as F

    from database_convertor_spark.operators import dedup
    from database_convertor_spark.pipelines.corpus import ingest_documents
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = drop_near_duplicates(
        docs.filter(F.col("doc_id") % 5 != 0),
        dedup.ngram_jaccard_pairs(docs.filter(F.col("doc_id") % 5 != 0)))
    surv = ingest_documents(new, corpus)
    assert surv.count() > 0            # the ingest admits something
    assert surv.count() < new.count()  # ...and drops something
    leftover = dedup.ngram_jaccard_pairs_incremental(surv, corpus)
    assert leftover.count() == 0


def test_block_splits_pairs_identical(spark):
    """The straggler shard (block_splits=S) must produce EXACTLY the
    default path's pairs — every pair meets at exactly one (i, j)
    sub-bucket combination."""
    from database_convertor_spark.operators import dedup
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    base = sorted(tuple(r) for r in dedup.ngram_jaccard_pairs(docs).collect())
    shard = sorted(tuple(r) for r in
                   dedup.ngram_jaccard_pairs(docs, block_splits=4).collect())
    assert shard == base and len(base) > 0


def test_embedding_block_splits_pairs_identical(spark):
    from database_convertor_spark.operators import dedup
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    # 0.3: sf0.001 has no >=0.5-cosine near-dups — the shard
    # equivalence needs a non-trivial pair set to be meaningful
    base = sorted(tuple(r) for r in
                  dedup.embedding_neardup_pairs(emb, threshold=0.3).collect())
    shard = sorted(tuple(r) for r in
                   dedup.embedding_neardup_pairs(emb, threshold=0.3,
                                                 block_splits=3).collect())
    assert shard == base and len(base) > 0


def test_cross_corpus_overlap_is_strictly_between(spark):
    """Every reported pair must cross the corpus boundary, and the
    report must equal full-batch pairs minus both within-corpus sets."""
    from pyspark.sql import functions as F

    from database_convertor_spark.operators import dedup
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 != 0)
    cross = dedup.cross_corpus_overlap(a, b)
    rows = cross.collect()
    assert len(rows) > 0
    assert all(r.doc_a % 3 == 0 and r.doc_b % 3 != 0 for r in rows)
    full = {frozenset((r.doc_a, r.doc_b))
            for r in dedup.ngram_jaccard_pairs(docs).collect()}
    within = {frozenset((r.doc_a, r.doc_b))
              for r in dedup.ngram_jaccard_pairs(a).collect()}
    within |= {frozenset((r.doc_a, r.doc_b))
               for r in dedup.ngram_jaccard_pairs(b).collect()}
    assert {frozenset((r.doc_a, r.doc_b)) for r in rows} == full - within


# ----------------------------------------------------- semantic dedup
def test_semantic_dedup_golden(spark):
    """SemDeDup keep rule on a handcrafted cluster: {a, b} form a
    duplicate component (cos > 0.9), the survivor is the member LEAST
    similar to the label-0 centroid (a, which points away from the
    cluster mean), c and the singleton label survive untouched."""
    from database_convertor_spark.operators import dedup

    emb = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]),        # a
         (2, 0, [0.995, 0.0999]),   # b: cos(a,b) ~ 0.995
         (3, 0, [0.0, 1.0]),        # c: near nothing
         (4, 1, [0.5, 0.5])],       # other label, singleton
        ["vec_id", "label", "embedding"])
    kept = sorted(r.vec_id for r in
                  dedup.semantic_dedup(emb, threshold=0.9).collect())
    # centroid_0 = mean(a,b,c) = [0.665, 0.3666]; cos(a) ~ 0.876 <
    # cos(b) ~ 0.920 -> a survives, b is cut
    assert kept == [1, 3, 4]


def test_semantic_dedup_corpus_invariants(spark):
    """On the real embeddings table: exactly one survivor per
    duplicate component, every non-component vector survives, and the
    output carries the input schema."""
    from database_convertor_spark.operators import components, dedup
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    out = dedup.semantic_dedup(emb, threshold=0.3)
    assert out.columns == emb.columns
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.3)
    comp = components.dedup_clusters(pairs, "vec_a", "vec_b")
    by_cluster = {}
    for r in comp.collect():
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    assert by_cluster, "fixture must produce at least one component"
    for members in by_cluster.values():
        assert len(members & kept) == 1
    in_comp = set().union(*by_cluster.values())
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert (all_ids - in_comp) <= kept


def test_semantic_dedup_relabel_path(spark):
    """relabel_clusters=k re-blocks on a learned spherical k-means
    codebook: output schema/subset invariants hold, every duplicate
    component (under the learned labels) keeps exactly one member, and
    the keep rule uses the learned-cluster centroid."""
    from database_convertor_spark.operators import components, dedup
    from database_convertor_spark.operators.similarity_search import (
        kmeans_assign, kmeans_fit,
    )
    from database_convertor_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    out = dedup.semantic_dedup(emb, threshold=0.3, relabel_clusters=4)
    assert out.columns == emb.columns
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    assert kept <= {r.vec_id for r in emb.select("vec_id").collect()}
    # recompute the learned labels exactly (deterministic fit) and
    # check the one-survivor-per-component contract under THEM
    cents, _ = kmeans_fit(emb, k=4, normalize=True)
    relab = (emb.drop("label")
             .join(kmeans_assign(emb, cents, normalize=True)
                   .select("vec_id", F.col("cluster_id").alias("label")),
                   "vec_id"))
    pairs = dedup.embedding_neardup_pairs(relab, threshold=0.3)
    comp = components.dedup_clusters(pairs, "vec_a", "vec_b")
    by_cluster = {}
    for r in comp.collect():
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    assert by_cluster, "fixture must produce at least one component"
    for members in by_cluster.values():
        assert len(members & kept) == 1


def test_semantic_dedup_auto_relabel_gate(spark):
    """The scale-safe regime is the DEFAULT: when average label
    population exceeds auto_relabel_label_size the operator re-blocks
    on a learned codebook (kmeans_fit engages, with k = ceil(n /
    target), plus a visible warning); a properly-sized codebook is
    used as-is (no fit)."""
    import warnings

    from database_convertor_spark.operators import dedup, similarity_search

    calls: list[int] = []
    real_fit = similarity_search.kmeans_fit

    def spy_fit(emb, k, **kw):
        calls.append(k)
        return real_fit(emb, k, **kw)

    similarity_search.kmeans_fit = spy_fit
    try:
        # 40 vectors all under ONE label, target 8 -> the 4x trip
        # threshold (32) is exceeded, k sizes at ceil(40/8) = 5
        import math
        rows = [(i, 0, [math.cos(i * 0.17), math.sin(i * 0.17)])
                for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = dedup.semantic_dedup(emb, threshold=0.99,
                                       auto_relabel_label_size=8)
            n_kept = out.count()
        assert calls == [5]
        assert any("re-blocking" in str(x.message) for x in w)
        assert 0 < n_kept <= 40
        assert out.columns == emb.columns

        # proper codebook: 40 vectors over 8 labels (avg 5 <= 4x8) -> no fit
        calls.clear()
        rows = [(i, i % 8, [math.cos(i * 0.17), math.sin(i * 0.17)])
                for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
        dedup.semantic_dedup(emb, threshold=0.99,
                             auto_relabel_label_size=8).count()
        assert calls == []

        # explicit opt-out trusts any incoming label column
        rows = [(i, 0, [math.cos(i * 0.17), math.sin(i * 0.17)])
                for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
        dedup.semantic_dedup(emb, threshold=0.99,
                             auto_relabel_label_size=None).count()
        assert calls == []
    finally:
        similarity_search.kmeans_fit = real_fit


def test_ngram_pair_budget_gate(spark):
    """fuzzy_join-style regime discipline for the exact within-block
    path: past the estimated pair-mass budget the operator raises
    (naming minhash_lsh_pairs), or — opt-in — routes to the LSH path
    with identical output to calling it directly; below the budget the
    gated plan equals the ungated one."""
    import warnings

    import pytest

    from database_convertor_spark.operators import dedup

    text = "the quick brown fox jumps over the lazy dog number"
    docs = spark.createDataFrame(
        [(i, "en", len(text) + 2, f"{text} {i % 3}") for i in range(12)],
        ["doc_id", "lang", "n_chars", "text"])

    # 12 docs in one block -> mass 66 > 40: the default regime refuses
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        dedup.ngram_jaccard_pairs(docs, max_block_pairs=40).collect()

    # route mode: warns, and the result IS the LSH operator's result
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        routed = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            docs, max_block_pairs=40,
            on_budget_exceeded="route").collect()))
    assert any("routing to" in str(x.message) for x in w)
    direct = sorted(map(tuple,
                        dedup.minhash_lsh_pairs(docs,
                                                threshold=0.5).collect()))
    assert routed == direct and routed, "routed output must be LSH's"

    # below budget (and with the gate off) the exact plan is unchanged
    gated = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        docs, max_block_pairs=1_000).collect()))
    ungated = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        docs, max_block_pairs=None).collect()))
    assert gated == ungated and gated


def test_ngram_budget_trips_at_sf1_shape(spark):
    """The DEFAULT budget must trip at the sf1 probe's histogram shape
    (50k docs over ~5 langs x ~20 length bands -> ~12.5M within-block
    pairs, the regime SCALE.md measured at 45.5x on 10x data) — and
    must NOT trip at the driver scales (sf0.1 measured ~459k)."""
    import pytest

    from pyspark.sql import functions as F

    from database_convertor_spark.operators import dedup

    sf1_shape = (spark.range(50_000)
                 .select(F.col("id").alias("doc_id"),
                         (F.col("id") % 5).cast("string").alias("lang"),
                         ((F.floor(F.col("id") / 5) % 20) * 100 + 50)
                         .cast("int").alias("n_chars"),
                         F.lit("x").alias("text")))
    with pytest.raises(ValueError, match="max_block_pairs"):
        dedup.ngram_jaccard_pairs(sf1_shape)

    # the adjacent-band estimate counts the cross-band terms too
    mass_same = dedup._block_pair_mass(
        dedup._ngram_docs(sf1_shape, 100), adjacent_bands=False)
    mass_adj = dedup._block_pair_mass(
        dedup._ngram_docs(sf1_shape, 100), adjacent_bands=True)
    n = 50_000 / (5 * 20)
    assert mass_same == 5 * 20 * (n * (n - 1) / 2)
    assert mass_adj == mass_same + 5 * 19 * n * n

    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    mass = dedup._block_pair_mass(dedup._ngram_docs(docs, 100),
                                  adjacent_bands=False)
    assert mass < 5_000_000, "driver-scale corpora must stay ungated"


def test_minhash_incremental_pairs_union_invariant(spark):
    """The LSH route's decomposition identity: under the same banding,
    lsh_pairs(new ∪ corpus) == lsh_incremental(new, corpus) ∪
    lsh_pairs(corpus) — candidates decide on band-key equality on both
    paths, so the incremental candidates are exactly the full
    candidates with >= 1 new endpoint."""
    from pyspark.sql import functions as F

    from database_convertor_spark.operators import dedup
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    full = {tuple(r) for r in dedup.minhash_lsh_pairs(docs).collect()}
    inc = {tuple(r) for r in
           dedup.minhash_lsh_pairs_incremental(new, corpus).collect()}
    old = {tuple(r) for r in dedup.minhash_lsh_pairs(corpus).collect()}
    assert inc | old == full
    assert inc & old == set()


def test_ingest_documents_gate_raises_and_routes(spark):
    """The ingest regime gate (round 9 — the sf10 probe's 84x): a tiny
    budget must (a) raise naming the route, (b) under 'route' switch
    the pair stage to MinHash-LSH incremental with a warning and still
    admit a corpus whose LSH-incremental residual vs the corpus is
    empty, and (c) reject invalid on_budget_exceeded values."""
    import warnings

    import pytest
    from pyspark.sql import functions as F

    from database_convertor_spark.operators import dedup
    from database_convertor_spark.pipelines.corpus import ingest_documents
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = drop_near_duplicates(
        docs.filter(F.col("doc_id") % 5 != 0),
        dedup.ngram_jaccard_pairs(docs.filter(F.col("doc_id") % 5 != 0)))

    with pytest.raises(ValueError, match="on_budget_exceeded"):
        ingest_documents(new, corpus, on_budget_exceeded="reroute")
    with pytest.raises(RuntimeError, match="route"):
        ingest_documents(new, corpus, max_block_pairs=1.0)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        surv = ingest_documents(new, corpus, max_block_pairs=1.0,
                                on_budget_exceeded="route")
        n = surv.count()
    assert any("MinHash-LSH" in str(w.message) for w in caught)
    assert 0 < n <= new.count()
    leftover = dedup.minhash_lsh_pairs_incremental(surv, corpus)
    assert leftover.count() == 0


def test_incremental_block_pair_mass_is_exact_candidate_count(spark):
    """The ingest gate's estimate is not a heuristic: per (lang, band)
    block, c_new*(c_new-1)/2 + c_new*c_corpus IS the exact candidate
    count of the incremental join (before the Jaccard filter) — pin
    them equal so the gate's budget means what it says."""
    from pyspark.sql import functions as F

    from database_convertor_spark.operators import dedup
    from database_convertor_spark.operators.dedup import _ngram_docs
    from database_convertor_spark.sources.readers import read_table

    from .conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    est = dedup.incremental_block_pair_mass(new, corpus)

    nd, cd = _ngram_docs(new, 100), _ngram_docs(corpus, 100)
    a = nd.alias("a")
    b = (nd.withColumn("_new", F.lit(True))
         .unionByName(cd.withColumn("_new", F.lit(False))).alias("b"))
    n_cands = a.join(
        b, (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.band") == F.col("b.band"))
        & (~F.col("b._new") | (F.col("a.doc_id") < F.col("b.doc_id")))
    ).count()
    assert est == float(n_cands)


def test_local_components_match_distributed(spark):
    """r10 optimization pin: the driver-side DuckDB fast path must
    reproduce the star rounds' output exactly (min reachable id per
    node, one row per distinct node), including self-loops and
    singleton stars, on ids of both numeric and string type."""
    edges = EDGES + [(30, 30), (3, 2)]          # self-loop + back edge
    df = spark.createDataFrame(edges, ["src", "dst"])
    fast = {(r.node, r.component)
            for r in connected_components(df).collect()}
    slow = {(r.node, r.component)
            for r in connected_components(
                df, local_edges_budget=0).collect()}
    assert fast == slow

    sdf = spark.createDataFrame(
        [(f"d{a}", f"d{b}") for a, b in edges], ["src", "dst"])
    fast_s = {(r.node, r.component)
              for r in connected_components(sdf).collect()}
    slow_s = {(r.node, r.component)
              for r in connected_components(
                  sdf, local_edges_budget=0).collect()}
    assert fast_s == slow_s
