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
    assert classify(ast.Bool(must=[ast.Term("a")], must_not=[ast.Term("b")])) is None
    assert classify(ast.Bool(must=[ast.Bool(must=[ast.Term("a")])])) is None
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
