"""Block-max WAND path: rank parity vs the oracle AND the exhaustive
executor (SURVEY.md §7 M5 — 'fallback exhaustive scorer kept for
cross-checking')."""

import math

import pytest

from bzzz_spark.query import ast
from bzzz_spark.query.executor import search
from bzzz_spark.query.wand import classify, wand_search

FLAT_QUERIES = [
    ast.Term("the"),
    ast.Term("zzz"),
    ast.Term("the", boost=2.0),
    ast.Bool(must=[ast.Term("error"), ast.Term("query")]),
    ast.Bool(must=[ast.Term("the"), ast.Term("and"), ast.Term("data")]),
    ast.Bool(should=[ast.Term("error"), ast.Term("query"), ast.Term("spark")]),
    ast.Bool(
        should=[ast.Term("error"), ast.Term("query"), ast.Term("spark")],
        minimum_should_match=2,
    ),
    ast.Bool(must=[ast.Term("the"), ast.Term("nosuchterm")]),
    ast.Term("nosuchterm"),
    # must_not rides the kernel (ReqExclScorer analog)
    ast.Bool(must=[ast.Term("error")], must_not=[ast.Term("query")]),
    ast.Bool(must=[ast.Term("error"), ast.Term("the")],
             must_not=[ast.Term("data"), ast.Term("nosuchterm")]),
    ast.Bool(should=[ast.Term("error"), ast.Term("query")],
             must_not=[ast.Term("data")]),
    ast.Bool(must=[ast.Term("error")], must_not=[ast.Term("the")]),
    ast.Bool(must=[ast.Term("error")], must_not=[ast.Term("error")]),
]


@pytest.mark.parametrize("i", range(len(FLAT_QUERIES)))
def test_wand_matches_oracle(small_index, small_oracle, i):
    node = FLAT_QUERIES[i]
    got = [(r["docid"], r["score"]) for r in
           wand_search(small_index, node, size=10).collect()]
    want = small_oracle.search(node, size=10)
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12)


@pytest.mark.parametrize("i", [0, 3, 5])
def test_wand_matches_exhaustive(small_index, i):
    node = FLAT_QUERIES[i]
    fast = [(r["docid"], round(r["score"], 9)) for r in
            search(small_index, node, size=10, use_wand=True).collect()]
    slow = [(r["docid"], round(r["score"], 9)) for r in
            search(small_index, node, size=10, use_wand=False).collect()]
    assert fast == slow


def test_wand_paging(small_index, small_oracle):
    got = [(r["docid"], r["score"]) for r in
           wand_search(small_index, ast.Term("the"), size=5, page=2).collect()]
    want = small_oracle.search(ast.Term("the"), size=5, page=2)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_unsupported_shapes_fall_back(small_index):
    assert classify(ast.Filtered(ast.Term("a"), ast.Term("b"))) is None
    assert classify(ast.Bool(must=[ast.Bool(must=[ast.Term("a")])])) is None
    # nested/non-term must_not still falls back
    assert classify(
        ast.Bool(must=[ast.Term("a")], must_not=[ast.Wildcard("b*")])
    ) is None
    # flat must_not of terms is now kernel-handled
    assert classify(
        ast.Bool(must=[ast.Term("a")], must_not=[ast.Term("b")])
    ) is not None
    assert (
        wand_search(small_index, ast.Filtered(ast.Term("a"), ast.Term("b"))) is None
    )
    # repeated terms fall back too (weights would collapse)
    assert wand_search(
        small_index, ast.Bool(should=[ast.Term("the"), ast.Term("the")])
    ) is None


def test_search_uses_wand_transparently(small_index, small_oracle):
    node = ast.Bool(must=[ast.Term("error"), ast.Term("query")])
    got = [(r["docid"], r["score"]) for r in
           search(small_index, node, size=10).collect()]
    want = small_oracle.search(node, size=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12)


def test_segment_aligned_serving_is_narrow_and_identical(
    spark, small_transcripts, small_oracle
):
    """persist(layout=\"segment\") pays one repartition at pin time and
    buys shuffle-free queries: the WAND/phrase kernels become narrow
    mapInPandas (NO Exchange in the executed plan), with results
    identical to the default grouped path."""
    from bzzz_spark.build.indexer import IndexConfig, build_index

    idx = build_index(
        small_transcripts,
        IndexConfig(block_size=16, segment_size=64, num_partitions=4,
                    store_positions=True),
    ).persist(layout="segment")
    assert idx.segment_aligned
    nodes = [
        ast.Term("the"),
        ast.Bool(must=[ast.Term("error"), ast.Term("query")]),
        ast.Bool(should=[ast.Term("error"), ast.Term("query")],
                 minimum_should_match=1),
    ]
    for node in nodes:
        got = [(r["docid"], round(r["score"], 9)) for r in
               search(idx, node, size=10).collect()]
        want = [(d, round(s, 9)) for d, s in small_oracle.search(node, size=10)]
        assert got == want, node
    # plan shape: no Exchange on the QUERY side of the plan (above the
    # InMemoryTableScan of the pinned postings; the cached relation's
    # child text still shows the build's own exchanges, which ran once
    # at pin time)
    idx.postings.count()  # materialize the pinned layout

    def query_side(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.split("InMemoryTableScan")[0]

    top = search(idx, ast.Term("the"), size=10)
    assert "Exchange" not in query_side(top), query_side(top)
    # phrase path rides the same layout
    ph = search(idx, ast.Phrase(["error", "query"]), size=10)
    phs = [(r["docid"], round(r["score"], 9)) for r in ph.collect()]
    want = [(d, round(s, 9))
            for d, s in small_oracle.search(ast.Phrase(["error", "query"]), 10)]
    assert phs == want
    assert "Exchange" not in query_side(ph), query_side(ph)
    idx.unpersist()
