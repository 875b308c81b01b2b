"""Lucene-classic query string syntax → AST (reference Q9).

The reference delegates to Lucene 4.10's QueryParser with configurable
default field and default operator (reference:
src/bzzz/queries/query_parser.clj:6-17; a bare string at the query root
is implicitly a query-parser query, src/bzzz/query.clj:32-33).

Supported subset, pinned here:
  term                      → Term on the default field
  field:term                → Term on that field (unknown fields parse
                              but the executor rejects them loudly)
  "a b c"                   → Phrase: terms at consecutive positions
                              (Lucene PhraseQuery; needs an index built
                              with store_positions=True)
  "a b"~2                   → sloppy phrase: ordered window (pinned
                              deviation — no reordering, unweighted
                              phrase_freq; see ast.Phrase docstring)
  +term / -term / NOT term  → must / must_not
  a AND b, a && b           → conjunction
  a OR b, a || b            → disjunction
  (grouping)                → sub-query
  term^2.5                  → boost
  te?m, ter*                → Wildcard
  term~1                    → Fuzzy (max edits, default 2)
  field:[a TO b]            → inclusive Range;  {a TO b} exclusive

Operator precedence is pinned (Lucene's own is famously ambiguous):
OR splits top-level groups; within a group, clauses combine with the
default operator unless an explicit AND/NOT/+/- modifier is present.
Query text is analyzed with the SAME pinned analyzer as indexing
(reference lesson README.md:104-105).
"""

from __future__ import annotations

import re

from bzzz_spark.analysis.tokenizer import py_tokenize
from bzzz_spark.query import ast

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
    (?P<plus>\+) | (?P<minus>-) |
    (?P<range>(?:[\w.]+):(?:\[|\{)[^\]\}]+(?:\]|\})) |
    (?P<phrase>(?:[\w.]+:)?"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?) |
    (?P<term>[^\s()"+\-!][^\s()"]*) |
    (?P<ws>\s+)
    """,
    re.VERBOSE | re.UNICODE,
)

_RANGE_RE = re.compile(
    r"(?P<field>[\w.]+):(?P<lb>\[|\{)\s*(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\s*(?P<rb>\]|\})"
)


def _lex(s: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"query-parser: cannot lex at {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    return out


def _num(v: str) -> float | None:
    if v == "*":
        return None
    return float(v)


def _leaf(text: str, default_field: str) -> ast.Query:
    """One bare term token → Term/Wildcard/Fuzzy with optional field,
    boost, fuzziness."""
    field = default_field
    if ":" in text:
        field, text = text.split(":", 1)
    boost = 1.0
    mb = re.search(r"\^(\d+(?:\.\d+)?)$", text)
    if mb:
        boost = float(mb.group(1))
        text = text[: mb.start()]
    mf = re.search(r"~(\d*)$", text)
    if mf:
        edits = int(mf.group(1)) if mf.group(1) else 2
        return ast.Fuzzy(
            value=text[: mf.start()].lower(), max_edits=edits,
            field_name=field, boost=boost,
        )
    if "*" in text or "?" in text:
        return ast.Wildcard(value=text.lower(), field_name=field, boost=boost)
    toks = py_tokenize(text)
    if not toks:
        return ast.MatchAll(boost=0.0)  # analyzes to nothing → matches nothing
    if len(toks) > 1:  # e.g. "foo-bar" analyzes to two terms → conjunction
        return ast.Bool(must=[ast.Term(t, field, 1.0) for t in toks], boost=boost)
    return ast.Term(toks[0], field, boost)


class _Parser:
    def __init__(self, tokens, default_field: str, default_operator: str):
        self.toks = tokens
        self.i = 0
        self.field = default_field
        self.op = default_operator.lower()

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> ast.Query:
        node = self.parse_or()
        if self.peek()[0] is not None:
            raise ValueError(f"query-parser: trailing input at {self.peek()[1]!r}")
        return node

    def parse_or(self) -> ast.Query:
        groups = [self.parse_group()]
        while self.peek()[0] == "or":
            self.next()
            groups.append(self.parse_group())
        if len(groups) == 1:
            return groups[0]
        return ast.Bool(should=groups, minimum_should_match=1)

    def parse_group(self) -> ast.Query:
        """Clauses joined by explicit AND, juxtaposition, or +/-/NOT."""
        clauses: list[tuple[str, ast.Query]] = []  # (modifier, node)
        saw_and = False
        while True:
            kind, _text = self.peek()
            if kind in (None, "rparen", "or"):
                break
            if kind == "and":
                self.next()
                saw_and = True
                continue
            mod = "default"
            if kind == "plus":
                self.next()
                mod = "must"
            elif kind in ("minus", "not"):
                self.next()
                mod = "not"
            clauses.append((mod, self.parse_atom()))
        if not clauses:
            raise ValueError("query-parser: empty clause group")
        if len(clauses) == 1 and clauses[0][0] == "default":
            return clauses[0][1]
        default_mod = "must" if (saw_and or self.op == "and") else "should"
        must, must_not, should = [], [], []
        for mod, node in clauses:
            mod = default_mod if mod == "default" else mod
            {"must": must, "not": must_not, "should": should}[mod].append(node)
        return ast.Bool(must=must, must_not=must_not, should=should)

    def parse_atom(self) -> ast.Query:
        kind, text = self.next()
        if kind == "lparen":
            node = self.parse_or()
            if self.next()[0] != "rparen":
                raise ValueError("query-parser: missing )")
            return node
        if kind == "range":
            m = _RANGE_RE.match(text)
            if not m:
                raise ValueError(f"query-parser: bad range {text!r}")
            return ast.Range(
                field_name=m.group("field"),
                min=_num(m.group("lo")),
                max=_num(m.group("hi")),
                min_inclusive=m.group("lb") == "[",
                max_inclusive=m.group("rb") == "]",
            )
        if kind == "phrase":
            field = self.field
            boost = 1.0
            mb = re.search(r"\^(\d+(?:\.\d+)?)$", text)
            if mb:
                boost = float(mb.group(1))
                text = text[: mb.start()]
            slop = 0
            ms = re.search(r"~(\d+)$", text)
            if ms:  # Lucene proximity: "a b"~2 (slop before boost)
                slop = int(ms.group(1))
                text = text[: ms.start()]
            if not text.startswith('"'):
                field, text = text.split(":", 1)
            terms = py_tokenize(text.strip('"'))
            if not terms:
                return ast.MatchAll(boost=0.0)
            if len(terms) == 1:
                return ast.Term(terms[0], field, boost)
            return ast.Phrase(terms, field, boost, slop=slop)
        if kind == "term":
            return _leaf(text, self.field)
        raise ValueError(f"query-parser: unexpected {text!r}")


def parse_query_string(
    query: str, default_field: str = "text", default_operator: str = "and"
) -> ast.Query:
    """Reference defaults: default-operator AND
    (src/bzzz/queries/query_parser.clj:11)."""
    return _Parser(_lex(query), default_field, default_operator).parse()
