"""Connected-components cluster resolution (dedup pairs → clusters).

Oracle: a pure-Python union-find over the same edge list — independent
of the Spark implementation's large-star/small-star alternation.
"""

import random

import pytest
from pyspark.sql import functions as F

from bzzz_spark.functions.dedup import (
    connected_components,
    dedup_clusters,
    keep_canonical,
    minhash_lsh_pairs,
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
    # component label = min member id
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _cc_spark(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = connected_components(df, **kw).collect()
    return {r["id"]: r["component"] for r in got}


def test_cc_chain(spark):
    # a path graph is small-star's non-star fixpoint shape — the case
    # that breaks a small-star-only convergence check
    edges = [(i, i + 1) for i in range(1, 12)]
    assert _cc_spark(spark, edges) == {i: 1 for i in range(1, 13)}


def test_cc_star_and_cliques(spark):
    edges = [(100, v) for v in range(101, 110)]
    edges += [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = _cc_spark(spark, edges)
    assert got == {**{v: 100 for v in range(100, 110)},
                   **{v: 1 for v in range(1, 5)}}


def test_cc_self_loops_and_duplicates(spark):
    edges = [(7, 7), (1, 2), (2, 1), (1, 2), (9, 9)]
    got = _cc_spark(spark, edges)
    # pure self-loop nodes still appear as nodes, own component
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_cc_string_ids(spark):
    edges = [("b", "a"), ("c", "b"), ("x", "y")]
    got = _cc_spark(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cc_random_vs_union_find(spark, seed):
    rng = random.Random(seed)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(50, 260))
    ]
    edges = [e for e in edges if e[0] != e[1]]
    want = _union_find(edges)
    assert _cc_spark(spark, edges) == want


def test_cc_max_iter_bounded(spark):
    # worst-case path graph: alternation halves depth per round —
    # depth 64 must converge well inside 25 rounds
    edges = [(i, i + 1) for i in range(64)]
    got = _cc_spark(spark, edges, max_iter=25)
    assert set(got.values()) == {0}


def test_dedup_clusters_singletons(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(6)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1}
    only = dedup_clusters(docs, pairs, include_singletons=False).collect()
    assert {r["doc_id"] for r in only} == {1, 3, 5}


def test_keep_canonical_min_id_default(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", float(i % 3)) for i in range(6)],
        ["doc_id", "text", "quality"],
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5), (0, 4)],
                                  ["id_a", "id_b"])
    kept = sorted(r["doc_id"] for r in keep_canonical(docs, pairs).collect())
    assert kept == [0, 1, 2]  # min of {0,4}, min of {1,3,5}, singleton 2
    # schema passes through unchanged
    assert keep_canonical(docs, pairs).columns == docs.columns


def test_keep_canonical_prefer_col(spark):
    docs = spark.createDataFrame(
        [(1, "a", 0.1), (3, "b", 0.9), (5, "c", 0.9), (8, "d", 0.5)],
        ["doc_id", "text", "quality"],
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"]
        for r in keep_canonical(docs, pairs, prefer_col="quality").collect()
    )
    # cluster {1,3,5}: max quality 0.9 tie → min doc_id 3; singleton 8
    assert kept == [3, 8]


def test_end_to_end_minhash_to_canonical(spark):
    # near-identical docs must collapse to one representative
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base + f" tail{i % 2}") for i in range(8)]
    rows += [
        (100, "galaxies rotate under dark matter halos measured by lensing"),
        (101, "sourdough fermentation depends on wild yeast and lactobacilli"),
        (102, "quarterly revenue grew nine percent on cloud subscriptions"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, num_hashes=8, bands=4, shingle_n=3)
    kept = keep_canonical(docs, pairs)
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    # the 8 near-identical docs collapse (to 1-2 reps depending on the
    # tail split); the unrelated docs all survive
    assert set(kept_ids) >= {100, 101, 102}
    assert len([i for i in kept_ids if i < 100]) <= 2
    # no duplicate representative rows
    assert kept.count() == kept.select("doc_id").distinct().count()
