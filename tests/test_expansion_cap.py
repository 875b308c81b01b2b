"""Bounded multi-term expansion (max_expansion, the reference's
`max-expansion`, fuzzy.clj:9-18) + fuzzy transpositions (Damerau/OSA).

The cap semantics pinned in all four expansion sites (executor Spark
job, wand kernel path, LocalIndex in-process, pyoracle): exact matches
first, then keep the top-N by (df desc, term asc) — Lucene's
TopTermsRewrite order.  Rank parity between engine and oracle must
hold WITH the cap applied on both sides.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bzzz_spark.oracle.pyoracle import levenshtein, osa_distance
from bzzz_spark.query import ast
from bzzz_spark.query.executor import expand_multiterm, search


def _assert_parity(index, oracle, node, size=10):
    got = [
        (r["docid"], r["score"])
        for r in search(index, node, size=size).collect()
    ]
    want = oracle.search(node, size=size)
    assert [d for d, _ in got] == [d for d, _ in want], (
        f"rank mismatch\n got={got}\nwant={want}"
    )
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12)


# ---------------------------------------------------------------- OSA metric


def test_osa_counts_adjacent_swap_as_one_edit():
    assert osa_distance("ab", "ba") == 1
    assert levenshtein("ab", "ba") == 2
    assert osa_distance("abc", "acb") == 1
    assert osa_distance("spark", "sprak") == 1
    assert levenshtein("spark", "sprak") == 2


def test_osa_is_restricted_damerau():
    # the classic OSA-vs-unrestricted-Damerau case: "ca" -> "abc" is 2
    # under full Damerau but 3 under OSA (no edits within a
    # transposed pair)
    assert osa_distance("ca", "abc") == 3
    assert osa_distance("", "abc") == 3
    assert osa_distance("abc", "abc") == 0


@given(
    st.text(alphabet="abcd", max_size=6), st.text(alphabet="abcd", max_size=6)
)
@settings(max_examples=200, deadline=None)
def test_osa_bounds_vs_levenshtein(a, b):
    o, l = osa_distance(a, b), levenshtein(a, b)
    assert o <= l <= 2 * o  # each transposition saves exactly one edit
    assert abs(len(a) - len(b)) <= o  # length band valid for OSA too


# ------------------------------------------------------------- cap semantics


def _oracle_expansion(oracle, rx=None, fuzzy=None, cap=None):
    if rx is not None:
        terms = [t for t in oracle.postings if ":" not in t and rx.match(t)]
    else:
        value, edits, dist = fuzzy
        terms = [
            t for t in oracle.postings
            if ":" not in t and dist(t, value) <= edits
        ]
    return oracle._cap_expansion(terms, cap)


def test_capped_wildcard_expansion_matches_oracle(small_index, small_oracle):
    import re

    from bzzz_spark.query.executor import glob_to_regex

    rx = re.compile(glob_to_regex("tok00*"))
    for cap in (1, 3, 7):
        [exp] = expand_multiterm(
            small_index.dictionary, [ast.Wildcard("tok00*", max_expansion=cap)]
        )
        want = _oracle_expansion(small_oracle, rx=rx, cap=cap)
        assert sorted(exp) == sorted(want)
        assert len(exp) == cap


def test_capped_fuzzy_expansion_matches_oracle(small_index, small_oracle):
    for cap in (1, 2, 5):
        [exp] = expand_multiterm(
            small_index.dictionary,
            [ast.Fuzzy("the", max_edits=2, max_expansion=cap)],
        )
        want = _oracle_expansion(
            small_oracle, fuzzy=("the", 2, levenshtein), cap=cap
        )
        assert sorted(exp) == sorted(want)


def test_capped_transpositions_paged_expand(small_index, small_oracle):
    """Fuzzy + transpositions + finite cap rides the keyset-paginated
    exact-fill (the SQL cond is a lev<=2e superset); results must
    still equal the oracle's OSA top-cap."""
    for cap in (1, 3, 8):
        [exp] = expand_multiterm(
            small_index.dictionary,
            [ast.Fuzzy(
                "the", max_edits=1, transpositions=True, max_expansion=cap
            )],
        )
        want = _oracle_expansion(
            small_oracle, fuzzy=("the", 1, osa_distance), cap=cap
        )
        assert sorted(exp) == sorted(want)


def test_transpositions_widen_the_match_set(small_index, small_oracle):
    """A swapped-letter typo matches at 1 edit only with
    transpositions=True."""
    plain = expand_multiterm(
        small_index.dictionary, [ast.Fuzzy("hte", max_edits=1)]
    )[0]
    osa = expand_multiterm(
        small_index.dictionary,
        [ast.Fuzzy("hte", max_edits=1, transpositions=True)],
    )[0]
    assert "the" in osa
    assert set(plain) <= set(osa)
    want = _oracle_expansion(small_oracle, fuzzy=("hte", 1, osa_distance))
    assert sorted(osa) == sorted(want)


# --------------------------------------------------------------- rank parity


def test_capped_query_rank_parity(small_index, small_oracle):
    _assert_parity(
        small_index, small_oracle, ast.Wildcard("tok0*", max_expansion=5)
    )
    _assert_parity(
        small_index, small_oracle,
        ast.Fuzzy("erorr", max_edits=2, max_expansion=3),
    )
    _assert_parity(
        small_index, small_oracle,
        ast.Bool(
            must=[ast.Term("the")],
            should=[ast.Fuzzy(
                "sprak", max_edits=1, transpositions=True, max_expansion=4
            )],
        ),
    )


def test_local_serve_capped_parity(tmp_path, small_index, small_oracle):
    """The in-process serving tier applies the identical cap."""
    from bzzz_spark.build.checkpoint import write_index
    from bzzz_spark.serve.local import LocalIndex, local_search

    out = str(tmp_path / "idx")
    write_index(small_index, out)
    li = LocalIndex(out)
    for node in (
        ast.Wildcard("tok0*", max_expansion=5),
        ast.Fuzzy("erorr", max_edits=2, max_expansion=3),
        ast.Fuzzy("sprak", max_edits=1, transpositions=True),
    ):
        got = local_search(li, ast.Bool(must=[ast.Term("the")], should=[node]),
                           size=10)
        want = small_oracle.search(
            ast.Bool(must=[ast.Term("the")], should=[node]), size=10
        )
        assert [int(d) for d in got["docid"]] == [d for d, _ in want]
        for gs, (_, ws) in zip(got["score"], want):
            assert math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12)


# ------------------------------------------------------------------ DSL keys


def test_dsl_passthrough_and_validation():
    q = ast.parse_query(
        {"fuzzy": {"value": "sprak", "max-edits": 1, "max-expansion": 7,
                   "transpositions": True}}
    )
    assert q == ast.Fuzzy(
        "sprak", max_edits=1, max_expansion=7, transpositions=True
    )
    w = ast.parse_query({"wildcard": {"value": "sp*", "max-expansion": 9}})
    assert w == ast.Wildcard("sp*", max_expansion=9)
    # reference default Integer/MAX_VALUE normalizes to unbounded
    q = ast.parse_query(
        {"fuzzy": {"value": "x", "max-expansion": (1 << 31) - 1}}
    )
    assert q.max_expansion is None
    with pytest.raises(ValueError, match="max-expansion"):
        ast.parse_query({"fuzzy": {"value": "x", "max-expansion": 0}})
