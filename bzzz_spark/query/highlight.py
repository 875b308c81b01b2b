"""Highlighting — re-analyze stored text, wrap matches, emit fragments.

The reference uses Lucene's Highlighter over the stored field with
configurable pre/post tags and fragment sizes, returning per-fragment
text, score and char offsets (reference: src/bzzz/index_search.clj:53-94;
exact-offset assertions in test/bzzz/core_test.clj:354-419).

Pinned spec (deterministic, oracle-testable):
- match = token (from the SAME pinned analyzer) ∈ query term set;
- every match is wrapped pre+token+post;
- fragments are fixed char windows of `fragment_size` centred greedily:
  each fragment starts at the first unconsumed match and extends
  fragment_size chars; matches inside it are consumed;
- fragment score = number of matches inside; top `max_fragments` by
  (score desc, start asc).

Vectorized pandas UDF (Arrow batches) — regex spans come from Python's
re over the lowercased text, which the tokenizer-parity test pins equal
to the JVM analyzer.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bzzz_spark.analysis.tokenizer import TOKEN_PATTERN_PY

FRAGMENT_SCHEMA = (
    "array<struct<fragment: string, start: int, end: int, score: double>>"
)


def highlight_text(
    text: str,
    terms: set[str],
    pre: str = "<b>",
    post: str = "</b>",
    fragment_size: int = 100,
    max_fragments: int = 3,
) -> list[tuple[str, int, int, float]]:
    """Pure-Python highlighter (also the test oracle)."""
    if not text:
        return []
    spans = [
        (m.start(), m.end())
        for m in TOKEN_PATTERN_PY.finditer(text.lower())
        if m.group() in terms
    ]
    if not spans:
        return []
    frags = []
    i = 0
    while i < len(spans):
        start = spans[i][0]
        end = min(len(text), start + fragment_size)
        inside = [s for s in spans[i:] if s[1] <= end]
        if not inside:  # a match longer than the fragment — take it whole
            inside = [spans[i]]
            end = spans[i][1]
        out, cur = [], start
        for s, e in inside:
            out.append(text[cur:s])
            out.append(pre + text[s:e] + post)
            cur = e
        out.append(text[cur:end])
        frags.append(("".join(out), start, end, float(len(inside))))
        i += len(inside)
    frags.sort(key=lambda f: (-f[3], f[1]))
    return frags[:max_fragments]


def highlight_col(
    text_col: Column | str,
    terms: list[str],
    pre: str = "<b>",
    post: str = "</b>",
    fragment_size: int = 100,
    max_fragments: int = 3,
) -> Column:
    """Column of highlight fragments for the given query terms."""
    tset = set(terms)

    @F.pandas_udf(FRAGMENT_SCHEMA)
    def hl(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(
                lambda t: highlight_text(
                    t, tset, pre, post, fragment_size, max_fragments
                )
            )

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return hl(c)


def search_with_highlight(
    index,
    query,
    size: int = 20,
    page: int = 0,
    text_col: str = "text",
    **hl_kwargs,
) -> DataFrame:
    """search() + a `_highlight` fragments column over the stored text
    (requires the index to have been built with store_text=True)."""
    from bzzz_spark.query import ast as ast_mod
    from bzzz_spark.query.executor import search

    node = query if isinstance(query, ast_mod.Query) else ast_mod.parse_query(query)
    terms = ast_mod.collect_terms(node)
    hits = search(index, node, size=size, page=page, fields=[text_col])
    return hits.withColumn(
        "_highlight", highlight_col(text_col, terms, **hl_kwargs)
    )
