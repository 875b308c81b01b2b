"""Pinned analyzer suite — the "scan/project" stage of the engine.

The reference (bzzz) parses a per-request analyzer chain with a default
of Lucene's StandardAnalyzer (reference: src/bzzz/analyzer.clj:119,
122-126) and warns that analyzer mismatch between index and query time
silently returns nothing (reference: README.md:104-105).  Our engine
pins ONE default analyzer spec in this module and uses it on the index
path, the query path, and the pure-Python oracle:

    standard(text) = extract all runs of [\\p{L}\\p{N}_] from lower(text)

This is the StandardAnalyzer-equivalent demanded by the build spec
("lowercase + Unicode word-boundary tokenization").  Deliberate
deviations from Lucene 4.10 StandardAnalyzer, documented once here:

- no English stop-word removal (the spec pins tokenize = lowercase +
  word boundary only);
- UAX#29 word-boundary niceties (apostrophe handling, CJK bigramming)
  are approximated by the Unicode character-class run above — pinned by
  the torture-fixture parity test in tests/test_tokenizer.py.

The JVM pattern below is valid Java regex (Spark) AND RE2 (DuckDB), so
the exact same tokenization runs engine-side and oracle-side.  The
Python mirror uses ``\\w`` (CPython: categories L*, N*, underscore),
which agrees with ``[\\p{L}\\p{N}_]`` on everything but exotic
combining marks; the parity test pins agreement on our vocabulary.

The rest of the reference analyzer zoo (reference: src/bzzz/analyzer.clj:46-118)
is reproduced as composable column transforms in
``bzzz_spark.analysis.analyzers``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Portable across Java regex (Spark) and RE2 (DuckDB oracle SQL).
TOKEN_PATTERN_JVM = r"[\p{L}\p{N}_]+"
# CPython mirror (see module docstring for the equivalence argument).
TOKEN_PATTERN_PY = re.compile(r"\w+", re.UNICODE)


def standard_tokenize(col: Column | str) -> Column:
    """lower + Unicode word-boundary tokenize, entirely JVM-side.

    Runs inside whole-stage codegen (no Python round-trip): this is the
    hot path of the index build, so it must stay on the JVM.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN_JVM), 0)


def py_tokenize(text: str) -> list[str]:
    """Pure-Python mirror of :func:`standard_tokenize` (oracle + query path)."""
    if text is None:
        return []
    return TOKEN_PATTERN_PY.findall(text.lower())


def tokenize_query_string(query: str) -> list[str]:
    """Analyze a query string driver-side.

    Must be token-identical to the index-time analyzer (reference lesson:
    README.md:104-105 — "You will find only what you bring in").  The
    parity test in tests/test_tokenizer.py pins py_tokenize ==
    standard_tokenize on the torture fixture, so the Python mirror is
    safe to use driver-side without a Spark round-trip.
    """
    return py_tokenize(query)
