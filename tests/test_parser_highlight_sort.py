"""Query-string parser (Q9), highlighting (R2), field/expression sorts
(T3/T4) — reference test style: exact structures and offsets
(core_test.clj:354-419 highlight offsets, :471-576 sort permutations)."""

import math

from bzzz_spark.query import ast
from bzzz_spark.query.executor import search, sorted_search
from bzzz_spark.query.highlight import highlight_text, search_with_highlight
from bzzz_spark.query.parser import parse_query_string


# ------------------------------------------------------------------- parser


def test_parse_bare_term():
    n = parse_query_string("Hello")
    assert n == ast.Term("hello", "text", 1.0)


def test_parse_default_and():
    n = parse_query_string("foo bar")  # default-operator AND (reference)
    assert isinstance(n, ast.Bool)
    assert [t.value for t in n.must] == ["foo", "bar"]


def test_parse_default_or():
    n = parse_query_string("foo bar", default_operator="or")
    assert [t.value for t in n.should] == ["foo", "bar"]


def test_parse_explicit_or_and():
    n = parse_query_string("a AND b OR c")
    assert isinstance(n, ast.Bool) and len(n.should) == 2
    left = n.should[0]
    assert [t.value for t in left.must] == ["a", "b"]
    assert n.should[1] == ast.Term("c", "text", 1.0)


def test_parse_not_and_minus():
    n = parse_query_string("a -b NOT c")
    assert [t.value for t in n.must] == ["a"]
    assert sorted(t.value for t in n.must_not) == ["b", "c"]


def test_parse_parens_boost_field():
    n = parse_query_string("(a OR b) role:user^2")
    assert isinstance(n, ast.Bool)
    grp, fld = n.must
    assert [t.value for t in grp.should] == ["a", "b"]
    assert fld == ast.Term("user", "role", 2.0)


def test_parse_phrase():
    n = parse_query_string('"big data query"')
    assert n == ast.Phrase(["big", "data", "query"], "text", 1.0)
    assert parse_query_string('role:"big data"^2') == ast.Phrase(
        ["big", "data"], "role", 2.0
    )


def test_parse_wildcard_fuzzy_range():
    assert parse_query_string("tok*") == ast.Wildcard("tok*", "text", 1.0)
    assert parse_query_string("spark~1") == ast.Fuzzy(
        "spark", max_edits=1, field_name="text", boost=1.0
    )
    r = parse_query_string("turn_idx:[2 TO 6}")
    assert r == ast.Range("turn_idx", min=2.0, max=6.0,
                          min_inclusive=True, max_inclusive=False)


def test_parse_analyzer_applied_to_terms():
    # "Foo-Bar" analyzes to two terms → conjunction (index parity)
    n = parse_query_string("Foo-Bar")
    assert [t.value for t in n.must] == ["foo", "bar"]


def test_parsed_query_end_to_end(small_index, small_oracle):
    node = parse_query_string("the AND data -error")
    got = [(r["docid"], r["score"]) for r in search(small_index, node, size=10).collect()]
    want = small_oracle.search(node, size=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9)


def test_bare_string_query_is_query_parser(small_index, small_oracle):
    # reference: query.clj:32-33 — a bare string is a query-parser query
    got = [r["docid"] for r in search(small_index, "the AND data", size=10).collect()]
    want = [d for d, _ in small_oracle.search(
        ast.Bool(must=[ast.Term("the"), ast.Term("data")]), size=10)]
    assert got == want


# ---------------------------------------------------------------- highlight


def test_highlight_exact_offsets():
    text = "the quick brown fox jumps over the lazy dog"
    frags = highlight_text(text, {"quick", "lazy"}, fragment_size=20)
    # first fragment starts at 'quick' (offset 4), wraps it
    assert frags[0][1] == 4
    assert frags[0][0].startswith("<b>quick</b>")
    # second fragment wraps 'lazy' at offset 35
    assert any(f[1] == 35 and "<b>lazy</b>" in f[0] for f in frags)


def test_highlight_case_insensitive_and_scored():
    frags = highlight_text("Spark SPARK spark x", {"spark"}, fragment_size=100)
    assert len(frags) == 1
    assert frags[0][3] == 3.0  # three matches in one fragment
    assert frags[0][0].count("<b>") == 3


def test_highlight_no_match():
    assert highlight_text("nothing here", {"absent"}) == []


def test_search_with_highlight(small_index):
    node = ast.Term("zzz")
    rows = search_with_highlight(small_index, node, size=3).collect()
    assert rows
    for r in rows:
        assert r["_highlight"], "every hit must highlight its match"
        for frag in r["_highlight"]:
            assert "<b>zzz</b>" in frag["fragment"]
            assert r["text"][frag["start"]:frag["end"]] == (
                frag["fragment"].replace("<b>", "").replace("</b>", "")
            )


# -------------------------------------------------------------------- sorts


def _matched_docs(oracle, node):
    scored = oracle.execute(node)
    return [
        {**oracle.docs[d], "_score": s} for d, s in scored.items()
    ]


def test_sort_by_field_desc(small_index, small_oracle):
    node = ast.Term("the")
    got = [r["docid"] for r in
           sorted_search(small_index, node, sort=[("turn_idx", "desc")],
                         size=10).collect()]
    want = [
        d["docid"]
        for d in sorted(
            _matched_docs(small_oracle, node),
            key=lambda d: (-d["turn_idx"], d["docid"]),
        )[:10]
    ]
    assert got == want


def test_sort_multi_key_with_score(small_index, small_oracle):
    node = ast.Term("the")
    got = [r["docid"] for r in
           sorted_search(small_index, node,
                         sort=[("role", "asc"), ("_score", "desc")],
                         size=10).collect()]
    want = [
        d["docid"]
        for d in sorted(
            _matched_docs(small_oracle, node),
            key=lambda d: (d["role"], -d["_score"], d["docid"]),
        )[:10]
    ]
    assert got == want


def test_sort_by_expression(small_index, small_oracle):
    node = ast.Term("the")
    got = [r["docid"] for r in
           sorted_search(small_index, node,
                         sort=[{"expression": "dl * -1", "order": "asc"}],
                         size=10).collect()]
    want = [
        d["docid"]
        for d in sorted(
            _matched_docs(small_oracle, node),
            key=lambda d: (-d["dl"], d["docid"]),
        )[:10]
    ]
    assert got == want


def test_sort_doc_special(small_index, small_oracle):
    node = ast.Term("the")
    got = [r["docid"] for r in
           sorted_search(small_index, node, sort=[("_doc", "asc")], size=5).collect()]
    want = sorted(small_oracle.execute(node))[:5]
    assert got == want


def test_sort_paging(small_index, small_oracle):
    node = ast.Term("the")
    all10 = [r["docid"] for r in
             sorted_search(small_index, node, sort=[("turn_idx", "desc")],
                           size=10).collect()]
    page1 = [r["docid"] for r in
             sorted_search(small_index, node, sort=[("turn_idx", "desc")],
                           size=5, page=1).collect()]
    assert page1 == all10[5:]


def test_sort_values_in_hits(small_index, small_oracle):
    """T6: per-hit `_sort` array of {name, value, reverse} (reference
    index_search.clj:246-250,316-318)."""
    from bzzz_spark.query.executor import sorted_search

    rows = sorted_search(
        small_index, ast.Term("the"),
        sort=[("turn_idx", "desc"), ("_score", "asc")],
        size=5, with_sort_values=True,
    ).collect()
    assert rows
    by_doc = {d["docid"]: d for d in small_oracle.docs}
    for r in rows:
        s = r["_sort"]
        assert [e["name"] for e in s] == ["turn_idx", "_score"]
        assert [e["reverse"] for e in s] == [True, False]
        assert int(s[0]["value"]) == by_doc[r["docid"]]["turn_idx"]
        assert abs(float(s[1]["value"]) - r["score"]) < 1e-9


# ------------------------- parser robustness (hypothesis, no Spark) ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_parser_total_on_arbitrary_input(s):
    """The parser is TOTAL: any input either yields an AST or raises
    ValueError with a 'query-parser:' message — never an arbitrary
    exception (the reference leans on Lucene's parser for the same
    guarantee, queries/query_parser.clj:6-17)."""
    from bzzz_spark.query.parser import parse_query_string

    try:
        node = parse_query_string(s, default_field="text")
    except ValueError as e:
        assert "query-parser" in str(e)
    else:
        assert node is None or isinstance(node, ast.Query)


_simple_term = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=127),
    min_size=1, max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_simple_term, min_size=1, max_size=4),
    st.sampled_from(["AND", "OR"]),
)
def test_parser_wellformed_boolean_roundtrip(terms, op):
    """Well-formed boolean strings always parse, and every input term
    survives into the AST (modulo analyzer, identity for [a-z]+)."""
    from bzzz_spark.query import ast as qast
    from bzzz_spark.query.parser import parse_query_string

    node = parse_query_string(f" {op} ".join(terms), default_field="text")
    got = sorted(
        n.value for n in qast.iter_nodes(node) if isinstance(n, qast.Term)
    )
    assert got == sorted(set(terms)) or got == sorted(terms)
