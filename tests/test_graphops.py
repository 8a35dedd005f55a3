"""Connected-components / dedup-cluster resolution (operators/graphops.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bbcrawl_spark.operators import graphops, textops


def _uf_reference(n_nodes, edges):
    """Tiny union-find oracle for the tests."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp: dict[int, int] = {}
    for x in range(n_nodes):
        r = find(x)
        comp[r] = min(comp.get(r, x), x)
    return {x: comp[find(x)] for x in range(n_nodes)}


def _cc(spark, edges, nodes=None):
    e = spark.createDataFrame(edges or [(None, None)], "id_a long, id_b long")
    if not edges:
        e = e.filter("id_a IS NOT NULL")
    nd = (
        spark.createDataFrame([(n,) for n in nodes], "doc_id long")
        if nodes is not None
        else None
    )
    out = graphops.connected_components(e, nodes=nd)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


class TestConnectedComponents:
    def test_chain_merges_transitively(self, spark):
        # A≈B, B≈C, C≈D -> one cluster labeled min
        assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_two_components_and_singletons(self, spark):
        got = _cc(spark, [(10, 11), (20, 21), (21, 22)], nodes=[5, 10, 11, 20, 21, 22])
        assert got == {5: 5, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_no_edges_all_singletons(self, spark):
        assert _cc(spark, [], nodes=[1, 2, 3]) == {1: 1, 2: 2, 3: 3}

    def test_long_chain_converges_via_pointer_jumping(self, spark):
        # path 0-1-2-...-63: diameter 63 ≫ max_iter 25; only the path-halving
        # step makes this converge — plain neighbor-min would need 63 rounds
        n = 64
        got = _cc(spark, [(i, i + 1) for i in range(n - 1)])
        assert got == {i: 0 for i in range(n)}

    def test_random_graphs_match_union_find(self, spark):
        rng = random.Random(42)
        for trial in range(3):
            n = 40
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(25 + 5 * trial)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            want = _uf_reference(n, edges)
            got = _cc(spark, edges, nodes=list(range(n)))
            assert got == want, f"trial {trial}"


class TestMemoryHygiene:
    def test_only_final_checkpoint_survives_and_cache_frees_it(self, spark):
        before = spark.sparkContext._jsc.getPersistentRDDs().size()
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(31)], "id_a long, id_b long"
        )
        bc: list = []
        out = graphops.connected_components(e, cache=bc)
        assert out.count() == 32
        # intermediate rounds were unpersisted inside the loop: at most the
        # one handed-back backing remains
        assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before + 1
        for d in bc:
            d.unpersist()
        assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


class TestDedupClusters:
    def test_keep_flag_marks_min_representative(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
        out = {
            r["doc_id"]: (r["cluster_id"], r["keep"])
            for r in graphops.dedup_clusters(docs, pairs).collect()
        }
        assert out == {
            0: (0, True), 1: (1, True), 2: (2, True),
            3: (0, False), 4: (4, True), 5: (0, False),
        }

    def test_end_to_end_over_jaccard_pairs(self, spark):
        """The full corpus-dedup chain on the real documents table: pair
        finding (ngram Jaccard) -> transitive cluster resolution -> keep
        manifest. Every dropped doc points at a kept representative in its
        own cluster."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pairs = textops.ngram_jaccard_pairs(docs, n=3, threshold=0.2)
        out = graphops.dedup_clusters(docs, pairs)
        rows = out.collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert len(rows) == docs.count()  # every doc labeled exactly once
        for r in rows:
            rep = by_id[r["cluster_id"]]
            assert rep["keep"] and rep["cluster_id"] == r["cluster_id"]
            assert r["keep"] == (r["doc_id"] == r["cluster_id"])
        n_dropped = sum(1 for r in rows if not r["keep"])
        n_pairs = pairs.count()
        assert (n_pairs == 0) == (n_dropped == 0)
