"""Query normalization (bzzz_spark/query/rewrite.py): every rule must
be score-preserving under the engine's pinned Bool semantics — checked
structurally (the rewritten tree is the flat form the kernels serve)
and behaviorally (the pure-Python oracle returns identical ranked
results for the original and the normalized tree).

Reference motivation: the JSON DSL's implicit AND of a multi-key map
(src/bzzz/query.clj:36-40) and the classic query parser both emit
nested Bool trees whose semantics are flat; Lucene normalizes these in
BooleanQuery#rewrite before scoring."""

import math

import pytest

from bzzz_spark.fixtures import synth_transcripts_pdf
from bzzz_spark.oracle.pyoracle import PyIndex
from bzzz_spark.query import ast
from bzzz_spark.query.rewrite import normalize
from bzzz_spark.query.wand import classify


def test_nested_must_flattens_to_kernel_shape():
    node = ast.Bool(
        must=[ast.Bool(must=[ast.Term("a"), ast.Term("b")]), ast.Term("c")]
    )
    out = normalize(node)
    assert isinstance(out, ast.Bool)
    assert [t.value for t in out.must] == ["a", "b", "c"]
    assert classify(out) is not None
    # and the inner must_not is lifted too
    node2 = ast.Bool(
        must=[
            ast.Bool(must=[ast.Term("a")], must_not=[ast.Term("x")]),
            ast.Term("b"),
        ]
    )
    out2 = normalize(node2)
    assert [t.value for t in out2.must] == ["a", "b"]
    assert [t.value for t in out2.must_not] == ["x"]


def test_nested_should_flattens_when_msm_safe():
    node = ast.Bool(
        should=[
            ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
            ast.Term("c"),
        ]
    )
    out = normalize(node)
    assert [t.value for t in out.should] == ["a", "b", "c"]
    # msm=2 on the outer CAN observe the splice — tree left alone
    node2 = ast.Bool(
        should=[
            ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
            ast.Term("c"),
        ],
        minimum_should_match=2,
    )
    out2 = normalize(node2)
    assert len(out2.should) == 2


def test_single_clause_collapse_and_dup_merge():
    assert normalize(ast.Bool(must=[ast.Term("a")])) == ast.Term("a")
    assert normalize(ast.Bool(should=[ast.Term("a")])) == ast.Term("a")
    # boost != 1 multiplies the sum — distribution folds it into the
    # clause, so the single-clause bool still collapses, boost intact
    assert normalize(
        ast.Bool(must=[ast.Term("a")], boost=2.0)
    ) == ast.Term("a", boost=2.0)
    # duplicate must terms merge by summing boosts (BM25 linear in boost)
    out = normalize(
        ast.Bool(must=[ast.Term("a"), ast.Term("a", boost=2.0),
                       ast.Term("b")])
    )
    assert [(t.value, t.boost) for t in out.must] == [("a", 3.0), ("b", 1.0)]
    # ... but SHOULD duplicates stay when msm counts occurrences
    keep = normalize(
        ast.Bool(should=[ast.Term("a"), ast.Term("a")],
                 minimum_should_match=2)
    )
    assert len(keep.should) == 2


def test_wrapper_rules():
    assert normalize(
        ast.Filtered(query=ast.Term("a"), filter=ast.MatchAll())
    ) == ast.Term("a")
    out = normalize(
        ast.ConstantScore(ast.ConstantScore(ast.Term("a"), boost=5.0),
                          boost=2.0)
    )
    assert out == ast.ConstantScore(ast.Term("a"), boost=2.0)
    # idempotent
    node = ast.Bool(
        must=[ast.Bool(must=[ast.Term("a"), ast.Term("b")]), ast.Term("c")],
        should=[ast.Term("d")],
    )
    once = normalize(node)
    assert normalize(once) == once


@pytest.fixture(scope="module")
def oracle():
    return PyIndex(
        synth_transcripts_pdf(n_conv=25, seed=11).to_dict("records")
    )


def _assert_same(oracle, node, size=10):
    want = oracle.search(node, size=size)
    got = oracle.search(normalize(node), size=size)
    assert [d for d, _ in got] == [d for d, _ in want], node
    for (_, g), (_, w) in zip(got, want):
        assert math.isclose(g, w, rel_tol=1e-12), node


def test_normalize_is_score_preserving_on_oracle(oracle):
    shapes = [
        ast.Bool(must=[ast.Bool(must=[ast.Term("scan"), ast.Term("the")]),
                       ast.Term("data")]),
        ast.Bool(
            must=[ast.Bool(must=[ast.Term("merge")],
                           must_not=[ast.Term("dup")])],
            should=[ast.Term("error"), ast.Term("query")],
        ),
        ast.Bool(should=[
            ast.Bool(should=[ast.Term("error"), ast.Term("merge")]),
            ast.Term("scan"),
        ]),
        ast.Bool(should=[
            ast.Bool(should=[ast.Term("error"), ast.Term("merge")]),
            ast.Term("scan"),
        ], minimum_should_match=1),
        ast.Bool(must=[ast.Term("the"), ast.Term("the", boost=0.5)]),
        ast.Filtered(query=ast.Bool(must=[ast.Term("merge")]),
                     filter=ast.MatchAll()),
        ast.Bool(must=[
            ast.Bool(must=[
                ast.Bool(must=[ast.Term("the"), ast.Term("data")]),
                ast.Term("a"),
            ]),
        ]),
        ast.DisMax(queries=[
            ast.Bool(must=[ast.Term("merge")]),
            ast.Term("error"),
        ], tie_breaker=0.4),
    ]
    for node in shapes:
        _assert_same(oracle, node)


def test_filtered_lowers_to_zero_boost_bool():
    # Filtered(q, f) == Bool(must=[q, f@boost=0]) — Lucene's
    # FilteredQuery -> BooleanQuery FILTER clause folding
    out = normalize(
        ast.Filtered(query=ast.Term("a"), filter=ast.Term("b"))
    )
    assert isinstance(out, ast.Bool)
    assert [(t.value, t.boost) for t in out.must] == [("a", 1.0), ("b", 0.0)]
    # filtered DISJUNCTION becomes a kernel-servable must+should shape
    # with the implicit msm=1 pinned explicitly
    out2 = normalize(
        ast.Filtered(
            query=ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
            filter=ast.Term("f"),
        )
    )
    assert isinstance(out2, ast.Bool)
    assert [(t.value, t.boost) for t in out2.must] == [("f", 0.0)]
    assert [t.value for t in out2.should] == ["a", "b"]
    assert out2.minimum_should_match == 1
    assert classify(out2) is not None
    # non-unit Filtered boost distributes into the query arm first,
    # then the boost-1 lowering applies
    out3 = normalize(
        ast.Filtered(query=ast.Term("a"), filter=ast.Term("b"), boost=2.0)
    )
    assert isinstance(out3, ast.Bool)
    assert [(t.value, t.boost) for t in out3.must] == [("a", 2.0),
                                                       ("b", 0.0)]
    # a boost-nonlinear query arm blocks distribution AND lowering
    kept = normalize(
        ast.Filtered(
            query=ast.RandomScore(query=ast.Term("a"), base=1.0, seed=3),
            filter=ast.Term("b"),
            boost=2.0,
        )
    )
    assert isinstance(kept, ast.Filtered)


def test_filtered_lowering_is_score_preserving_on_oracle(oracle):
    shapes = [
        ast.Filtered(query=ast.Term("merge"), filter=ast.Term("scan")),
        ast.Filtered(
            query=ast.Bool(should=[ast.Term("error"), ast.Term("merge")]),
            filter=ast.Term("the"),
        ),
        ast.Filtered(
            query=ast.Bool(
                should=[ast.Term("error"), ast.Term("merge"),
                        ast.Term("scan")],
                minimum_should_match=2,
            ),
            filter=ast.Term("the"),
        ),
        ast.Filtered(
            query=ast.Filtered(query=ast.Term("merge"),
                               filter=ast.Term("scan")),
            filter=ast.Term("the"),
        ),
        ast.Filtered(query=ast.MatchAll(boost=3.0), filter=ast.Term("dup")),
        ast.Filtered(query=ast.Term("merge"), filter=ast.Term("merge")),
        ast.Filtered(
            query=ast.DisMax(queries=[ast.Term("error"), ast.Term("merge")],
                             tie_breaker=0.4),
            filter=ast.Term("the"),
        ),
        # zero-boosting a BOOL filter must zero its whole sum without
        # perturbing its match set (must + msm over should)
        ast.Filtered(
            query=ast.Term("merge"),
            filter=ast.Bool(
                must=[ast.Term("the")],
                should=[ast.Term("error"), ast.Term("scan")],
            ),
        ),
        # constant-score filter arms (wildcard) zero the same way
        ast.Filtered(query=ast.Term("merge"), filter=ast.Wildcard("sca*")),
    ]
    for node in shapes:
        _assert_same(oracle, node)


def test_boost_distribution():
    # score(Bool) is linear in boost, so "(a b)^2" distributes into the
    # clauses and the boost-1 result classifies for the kernel
    out = normalize(ast.Bool(must=[ast.Term("a"), ast.Term("b")],
                             boost=2.0))
    assert isinstance(out, ast.Bool) and out.boost == 1.0
    assert [(t.value, t.boost) for t in out.must] == [("a", 2.0),
                                                      ("b", 2.0)]
    assert classify(out) is not None
    # distribution composes with the Filtered lowering: a boosted
    # filtered disjunction ends up a kernel-servable must+should Bool
    out2 = normalize(ast.Filtered(
        query=ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
        filter=ast.Term("f"),
        boost=3.0,
    ))
    assert isinstance(out2, ast.Bool) and out2.boost == 1.0
    assert [t.boost for t in out2.should] == [3.0, 3.0]
    assert [(t.value, t.boost) for t in out2.must] == [("f", 0.0)]
    assert classify(out2) is not None
    # non-linear clauses (RandomScore) block distribution
    kept = normalize(ast.Bool(
        must=[ast.RandomScore(query=ast.Term("a"), base=1.0, seed=7)],
        boost=2.0,
    ))
    assert isinstance(kept, ast.Bool) and kept.boost == 2.0


def test_boost_distribution_score_preserving_on_oracle(oracle):
    shapes = [
        ast.Bool(must=[ast.Term("the"), ast.Term("data")], boost=2.0),
        ast.Bool(should=[ast.Term("error"), ast.Term("merge")],
                 must_not=[ast.Term("dup")], boost=0.5),
        ast.Bool(must=[ast.Term("the")],
                 should=[ast.Term("error"), ast.Term("scan")],
                 minimum_should_match=1, boost=3.0),
        # negative boost: plain linear sum, still exact (executor path)
        ast.Bool(must=[ast.Term("the"), ast.Term("a")], boost=-1.5),
        ast.Filtered(query=ast.Term("merge"), filter=ast.Term("the"),
                     boost=2.0),
        ast.Filtered(query=ast.Bool(should=[ast.Term("error"),
                                            ast.Term("merge")]),
                     filter=ast.Term("the"), boost=4.0),
        ast.Filtered(query=ast.Term("merge"), filter=ast.MatchAll(),
                     boost=2.0),
        ast.Bool(must=[ast.Bool(must=[ast.Term("the")], boost=2.0),
                       ast.Term("data")], boost=3.0),
    ]
    for node in shapes:
        _assert_same(oracle, node)


def test_constant_score_folds_into_constant_nodes():
    # Wildcard/Fuzzy/MatchAll already score := boost, so the wrapper
    # folds into their boost (keeps patterns on the 'any' kernel)
    out = normalize(ast.ConstantScore(ast.Wildcard("sca*"), boost=2.5))
    assert out == ast.Wildcard("sca*", boost=2.5)
    out2 = normalize(ast.ConstantScore(ast.MatchAll(boost=9.0), boost=3.0))
    assert out2 == ast.MatchAll(boost=3.0)
    # scored inners keep the wrapper (score really is replaced)
    kept = normalize(ast.ConstantScore(ast.Term("a"), boost=2.0))
    assert isinstance(kept, ast.ConstantScore)


def test_constant_score_fold_score_preserving_on_oracle(oracle):
    for node in (
        ast.ConstantScore(ast.Wildcard("sca*"), boost=2.5),
        ast.ConstantScore(ast.MatchAll(), boost=3.0),
        ast.ConstantScore(ast.Fuzzy("merge"), boost=0.5),
    ):
        _assert_same(oracle, node)


def test_must_not_demorgan_splice():
    # NOT (a OR b) == NOT a AND NOT b — exclusion arms never score, so
    # the splice ignores the inner Bool's boost (unlike should-flatten)
    out = normalize(ast.Bool(
        must=[ast.Term("x")],
        must_not=[ast.Bool(should=[ast.Term("a"), ast.Term("b")],
                           boost=2.0)],
    ))
    assert [t.value for t in out.must_not] == ["a", "b"]
    assert classify(out) is not None
    # msm=2 on the inner disjunction CAN observe the splice — kept
    kept = normalize(ast.Bool(
        must=[ast.Term("x")],
        must_not=[ast.Bool(should=[ast.Term("a"), ast.Term("b"),
                                   ast.Term("c")],
                           minimum_should_match=2)],
    ))
    assert isinstance(kept.must_not[0], ast.Bool)
    # an all-prohibited inner Bool matches nothing -> excludes nothing
    dropped = normalize(ast.Bool(
        must=[ast.Term("x")],
        must_not=[ast.Bool(must_not=[ast.Term("a")])],
    ))
    assert dropped == ast.Term("x")


def test_must_not_rules_score_preserving_on_oracle(oracle):
    shapes = [
        ast.Bool(must=[ast.Term("the")],
                 must_not=[ast.Bool(should=[ast.Term("error"),
                                            ast.Term("merge")])]),
        ast.Bool(should=[ast.Term("error"), ast.Term("scan")],
                 must_not=[ast.Bool(should=[ast.Term("dup"),
                                            ast.Bool(should=[
                                                ast.Term("merge"),
                                                ast.Term("query"),
                                            ], boost=3.0)])]),
        ast.Bool(must=[ast.Term("the")],
                 must_not=[ast.Bool(must_not=[ast.Term("error")])]),
        ast.Bool(must=[ast.Term("the")],
                 must_not=[ast.Bool(should=[ast.Term("error"),
                                            ast.Term("merge")],
                                    minimum_should_match=2)]),
    ]
    for node in shapes:
        _assert_same(oracle, node)


def test_required_group_hoist_reaches_kernel():
    # "c AND (a OR b)" — the inner should-only Bool is a required
    # group; hoisting its members to the parent's should list with
    # minimum_should_match=1 is exact and rides the ReqOptSum kernel
    out = normalize(ast.Bool(must=[
        ast.Term("c"),
        ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
    ]))
    assert [t.value for t in out.must] == ["c"]
    assert [t.value for t in out.should] == ["a", "b"]
    assert out.minimum_should_match == 1
    shape = classify(out)
    assert shape is not None and shape.mode == "and"
    assert len(shape.opts) == 2 and shape.opt_msm == 1
    # the inner group's explicit msm is preserved
    out2 = normalize(ast.Bool(must=[
        ast.Term("c"),
        ast.Bool(should=[ast.Term("a"), ast.Term("b"), ast.Term("d")],
                 minimum_should_match=2),
    ]))
    assert out2.minimum_should_match == 2
    assert classify(out2).opt_msm == 2
    # inner must AND should both lift; inner must_not lifts too
    out3 = normalize(ast.Bool(must=[
        ast.Term("c"),
        ast.Bool(must=[ast.Term("d")], should=[ast.Term("a")],
                 must_not=[ast.Term("x")], minimum_should_match=1),
    ]))
    assert sorted(t.value for t in out3.must) == ["c", "d"]
    assert [t.value for t in out3.should] == ["a"]
    assert [t.value for t in out3.must_not] == ["x"]
    assert classify(out3) is not None
    # two groups: only the FIRST hoists (msm constraints cannot share
    # one should list) — the second stays an opaque must clause
    out4 = normalize(ast.Bool(must=[
        ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
        ast.Bool(should=[ast.Term("d"), ast.Term("e")]),
    ]))
    assert isinstance(out4.must[0], ast.Bool)
    assert [t.value for t in out4.should] == ["a", "b"]
    # a parent with its OWN should clauses is left alone (its implicit
    # msm over those clauses would collide with the group's)
    kept = normalize(ast.Bool(
        must=[ast.Term("c"),
              ast.Bool(should=[ast.Term("a"), ast.Term("b")])],
        should=[ast.Term("d")],
    ))
    assert any(isinstance(q, ast.Bool) for q in kept.must)
    # "(a OR b) AND ts>X": hoisting would leave a range-only must list
    # (no postings stream to drive the ReqOptSum kernel) — the group
    # stays required instead and classifies as a group conjunct whose
    # member decodes carry the doc-value streams for the range mask
    out5 = normalize(ast.Bool(must=[
        ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
        ast.Range("turn_idx", min=1),
    ]))
    assert any(isinstance(q, ast.Bool) for q in out5.must)
    shape5 = classify(out5)
    assert shape5 is not None and shape5.groups and shape5.ranges
    # a non-range sibling restores the hoist
    out6 = normalize(ast.Bool(must=[
        ast.Bool(should=[ast.Term("a"), ast.Term("b")]),
        ast.Term("c"),
        ast.Range("turn_idx", min=1),
    ]))
    assert not any(isinstance(q, ast.Bool) for q in out6.must)
    assert [t.value for t in out6.should] == ["a", "b"]
    # idempotent
    assert normalize(out) == out
    assert normalize(out4) == out4
    assert normalize(out5) == out5


def test_required_group_hoist_score_preserving_on_oracle(oracle):
    shapes = [
        ast.Bool(must=[
            ast.Term("data"),
            ast.Bool(should=[ast.Term("error"), ast.Term("merge")]),
        ]),
        ast.Bool(must=[
            ast.Term("the"),
            ast.Bool(should=[ast.Term("error"), ast.Term("merge"),
                             ast.Term("scan")],
                     minimum_should_match=2),
        ]),
        ast.Bool(must=[
            ast.Bool(must=[ast.Term("query")],
                     should=[ast.Term("error", boost=2.0),
                             ast.Term("dup")],
                     must_not=[ast.Term("zzznothere")]),
            ast.Term("the"),
        ]),
        ast.Bool(must=[
            ast.Bool(should=[ast.Term("error"), ast.Term("merge")]),
            ast.Bool(should=[ast.Term("scan"), ast.Term("data")]),
        ]),
        # group with boost != 1 — distribution runs first, then hoist
        ast.Bool(must=[
            ast.Term("data"),
            ast.Bool(should=[ast.Term("error"), ast.Term("merge")],
                     boost=2.0),
        ]),
        # unsatisfiable group msm -> empty both ways
        ast.Bool(must=[
            ast.Term("data"),
            ast.Bool(should=[ast.Term("error")],
                     minimum_should_match=3),
        ]),
    ]
    for node in shapes:
        _assert_same(oracle, node)


# ---- random-tree fuzz: EVERY rule, composed arbitrarily, must be ----
# ---- score-preserving under the pure-Python oracle ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_vocab = st.sampled_from(
    ["the", "a", "error", "merge", "scan", "data", "query", "dup",
     "zzznothere"]
)
_fz_term = st.builds(
    ast.Term, _vocab, st.just("text"), st.sampled_from([0.5, 1.0, 2.0])
)


def _fz_trees(children):
    return st.one_of(
        st.builds(
            lambda m, s, mn, msm, b: ast.Bool(
                must=m, should=s, must_not=mn,
                minimum_should_match=msm, boost=b,
            ),
            st.lists(children, max_size=2),
            st.lists(children, max_size=2),
            st.lists(children, max_size=2),
            st.integers(0, 2),
            st.sampled_from([1.0, 2.0, -0.5]),
        ).filter(lambda n: n.must or n.should or n.must_not),
        st.builds(
            lambda q, f, b: ast.Filtered(query=q, filter=f, boost=b),
            children, children, st.sampled_from([1.0, 2.0, -0.5]),
        ),
        st.builds(
            lambda q, b: ast.ConstantScore(q, boost=b),
            children, st.sampled_from([0.5, 1.5]),
        ),
        st.builds(
            lambda qs, t: ast.DisMax(queries=qs, tie_breaker=t),
            st.lists(children, min_size=1, max_size=2),
            st.sampled_from([0.0, 0.4]),
        ),
    )


_random_tree = st.recursive(_fz_term, _fz_trees, max_leaves=8)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_random_tree)
def test_normalize_score_preserving_on_random_trees(oracle, node):
    _assert_same(oracle, node)
