"""Connected components diffed against a plain union-find, including the
adversarial long-chain shape pointer jumping exists for."""

import pyspark.sql.functions as F
import pytest

from full_text_index_spark.functions.components import (
    ComponentsDidNotConverge,
    connected_components,
    dedup_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges, max_rounds=30):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.node: r.component_id
        for r in connected_components(df, max_rounds=max_rounds).collect()
    }
    assert got == _union_find(edges)


def test_components_random_graph(spark):
    import random

    rng = random.Random(5)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_components_long_chain(spark):
    # Path of 64 nodes: min-propagation alone needs 63 rounds; pointer
    # jumping must finish well inside 30.
    edges = [(i, i + 1) for i in range(63)]
    _check(spark, edges, max_rounds=30)


def test_components_two_cliques_and_bridge(spark):
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    _check(spark, edges)
    # bridged: everything collapses to component 0
    _check(spark, edges + [(4, 12)])


def test_components_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(63)], "doc_a long, doc_b long")
    with pytest.raises(ComponentsDidNotConverge):
        connected_components(df, max_rounds=1)


def test_dedup_clusters_singletons_survive(spark):
    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "doc_a long, doc_b long")
    rows = {r.doc_id: (r.component_id, r.is_survivor)
            for r in dedup_clusters(docs, pairs).collect()}
    assert rows[1] == (1, True)
    assert rows[3] == (1, False)
    assert rows[5] == (1, False)
    for singleton in (0, 2, 4, 6, 7):
        assert rows[singleton] == (singleton, True)
