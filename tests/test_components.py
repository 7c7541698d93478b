"""Connected-components clustering + canonical selection (dedup.py)."""

import numpy as np
import pytest

from olympian_spark.operators.dedup import (
    connected_components,
    dedup_keep_canonical,
)


def _union_find(n_edges, nodes):
    parent = {x: x for x in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in nodes}


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_components_two_clusters_and_chain(spark):
    edges = [(1, 2), (2, 3), (10, 11), (3, 4)]
    got = _labels(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_long_chain_converges_fast(spark):
    """A 64-node chain is the adversarial case for naive label
    propagation (diameter 63); large/small-star must still converge
    within the O(log n) iteration budget."""
    edges = [(i, i + 1) for i in range(64)]
    got = _labels(spark, edges)
    assert set(got.values()) == {0} and len(got) == 65


def test_components_match_union_find_on_random_graphs(spark):
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = 60
        m = int(rng.integers(10, 80))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, (m, 2))
            if a != b
        ]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        expect = _union_find(edges, nodes)
        assert _labels(spark, edges) == expect


def test_components_empty_and_self_pairs(spark):
    df = spark.createDataFrame([(5, 5)], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_keep_canonical_min_id_and_quality(spark):
    docs = spark.createDataFrame(
        [(1, "a", 0.2), (2, "b", 0.9), (3, "c", 0.9), (4, "d", 0.5),
         (9, "solo", 0.1)],
        "doc_id long, text string, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    comp = connected_components(pairs)

    by_id = dedup_keep_canonical(docs, comp)
    rows = {r.doc_id: r for r in by_id.collect()}
    # cluster {1,2,3} -> keeps 1; 4 and 9 are singletons
    assert set(rows) == {1, 4, 9}
    assert rows[1].n_members == 3 and rows[4].n_members == 1
    assert rows[1].component == 1 and rows[9].component == 9

    by_q = dedup_keep_canonical(docs, comp, order_col="quality")
    rows = {r.doc_id: r for r in by_q.collect()}
    # quality tie 2 vs 3 at 0.9 -> smaller id 2 wins
    assert set(rows) == {2, 4, 9}
    assert rows[2].text == "b" and rows[2].n_members == 3


def test_components_cluster_jaccard_pairs_end_to_end(spark):
    """Chained near-dups A~B~C (A and C not a pair themselves) must land
    in ONE cluster — the property pairs alone cannot express."""
    from olympian_spark.operators.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " extra"),
            (2, base + " extra tokens"),
            (3, "completely different content about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_doc_freq=None)
    got = {(r.doc_a, r.doc_b) for r in pairs.select("doc_a", "doc_b").collect()}
    assert (0, 1) in got and (1, 2) in got
    comp = connected_components(pairs)
    kept = dedup_keep_canonical(docs, comp)
    assert {r.doc_id for r in kept.collect()} == {0, 3}
