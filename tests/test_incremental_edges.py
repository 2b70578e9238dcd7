"""Incremental edge refresh must equal the full recompute for any
change set (the scale path vs the reference's full weekly rebuild)."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_convertor_spark.operators.graph import (
    refresh_edges_incremental,
    shared_supplier_pairs,
)
from database_convertor_spark.sources.readers import read_table

from .conftest import SF_SMALL


def test_incremental_refresh_matches_full(spark):
    lineitem = read_table(spark, SF_SMALL, "lineitem")
    # "last week's" state: drop lineitems of 20 parts, full-compute edges
    changed = (lineitem.select("l_partkey").distinct()
               .orderBy("l_partkey").limit(20))
    old_lineitem = lineitem.join(changed, "l_partkey", "left_anti")
    old_edges = shared_supplier_pairs(old_lineitem, min_shared=3)

    # this week: the 20 parts' lineitems arrive; incremental refresh
    new_edges_incr = refresh_edges_incremental(
        old_edges, lineitem.select("l_partkey", "l_suppkey"),
        changed, min_shared=3)
    full = shared_supplier_pairs(lineitem, min_shared=3)

    a = {(r.supp_a, r.supp_b): r.shared_parts for r in new_edges_incr.collect()}
    b = {(r.supp_a, r.supp_b): r.shared_parts for r in full.collect()}
    assert a == b


def test_incremental_restricts_selfjoin_build_side(spark):
    """The scale contract: the pair join's inputs are the SEMI-JOINED
    (affected-supplier) edge sets, never the full edges x edges
    product. A disjunctive filter above a full self-join (the round-1
    shape) shows no LeftSemi below the pair joins."""
    lineitem = read_table(spark, SF_SMALL, "lineitem")
    changed = (lineitem.select("l_partkey").distinct()
               .orderBy("l_partkey").limit(5))
    edges = shared_supplier_pairs(lineitem, min_shared=3)
    out = refresh_edges_incremental(
        edges, lineitem.select("l_partkey", "l_suppkey"), changed,
        min_shared=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the affected-edge restriction feeds the joins (build side bounded)
    assert "LeftSemi" in plan
    # unaffected complement + untouched-edge carryover are anti-joins
    assert plan.count("LeftAnti") >= 2


def test_incremental_noop_changeset_keeps_edges(spark):
    lineitem = read_table(spark, SF_SMALL, "lineitem")
    edges = shared_supplier_pairs(lineitem, min_shared=3)
    empty = spark.createDataFrame([], "l_partkey long")
    out = refresh_edges_incremental(
        edges, lineitem.select("l_partkey", "l_suppkey"), empty, min_shared=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, edges.collect()))


def test_pagerank_star_graph(spark):
    """PageRank invariants on a star: the hub outranks every leaf,
    leaves tie exactly (symmetric roles + per-iteration rounding),
    and total mass stays ~1 (no dangling leakage on a symmetric
    graph)."""
    from database_convertor_spark.operators.graph import pagerank

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], ["supp_a", "supp_b"])
    rows = {r.node: r.pagerank for r in pagerank(pairs).collect()}
    assert set(rows) == set(range(7))
    hub, leaves = rows[0], [rows[i] for i in range(1, 7)]
    assert all(hub > lv for lv in leaves)
    assert len(set(leaves)) == 1
    assert abs(sum(rows.values()) - 1.0) < 1e-4


def test_triangle_counts_match_bruteforce(spark):
    """Degree-ordered orientation must count exactly the triangles a
    brute-force driver-side enumeration finds, with the textbook
    clustering coefficient."""
    from itertools import combinations

    from database_convertor_spark.operators.graph import triangle_counts

    lineitem = read_table(spark, SF_SMALL, "lineitem")
    pairs = shared_supplier_pairs(lineitem, min_shared=2)
    adj: dict[int, set[int]] = {}
    for r in pairs.collect():
        adj.setdefault(r.supp_a, set()).add(r.supp_b)
        adj.setdefault(r.supp_b, set()).add(r.supp_a)
    want_tri = {n: 0 for n in adj}
    for n, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            if b in adj.get(a, ()):  # triangle (n, a, b)
                want_tri[n] += 1
    # each triangle visited once per vertex above -> already per-node
    got = {r.node: (r.deg, r.n_triangles, r.clustering_coeff)
           for r in triangle_counts(pairs).collect()}
    assert set(got) == set(adj)
    for n in adj:
        deg, t, cc = got[n]
        assert deg == len(adj[n])
        assert t == want_tri[n], (n, t, want_tri[n])
        want_cc = (round(2.0 * want_tri[n] / (deg * (deg - 1)), 6)
                   if deg >= 2 else 0.0)
        assert abs(cc - want_cc) < 1e-9


def test_triangle_counts_orientation_invariant(spark):
    """Feeding the edge list with endpoints swapped (id_b < id_a) must
    give identical results — canonicalization is internal."""
    from database_convertor_spark.operators.graph import triangle_counts

    lineitem = read_table(spark, SF_SMALL, "lineitem")
    pairs = shared_supplier_pairs(lineitem, min_shared=2)
    flipped = pairs.select(F.col("supp_b").alias("supp_a"),
                           F.col("supp_a").alias("supp_b"))
    a = {tuple(r) for r in triangle_counts(pairs).collect()}
    b = {tuple(r) for r in triangle_counts(flipped).collect()}
    assert a == b
