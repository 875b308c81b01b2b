"""The reference's analyzer zoo as composable Spark column transforms.

bzzz composes char-filters → tokenizer → token-filters per field from a
per-request JSON spec (reference: src/bzzz/analyzer.clj:104-118).  We
reproduce each component as a pure Column expression (JVM-side, codegen)
and compose them with :func:`build_analyzer`.  No eval of user strings —
specs are plain dicts validated here.

Component inventory vs the reference (SURVEY.md §2.2):
  A1 standard        analyzer.clj:119
  A2 whitespace      analyzer.clj:60,117
  A3 keyword         analyzer.clj:64,118
  A4 letter          analyzer.clj:61
  A5 ngram           analyzer.clj:69-72,91-94
  A6 edge-ngram      analyzer.clj:65-68,87-90
  A10 lowercase      analyzer.clj:76
  A11 limit          analyzer.clj:77
  A12 length         analyzer.clj:78-81
  A14 reverse        analyzer.clj:83
  A15 pattern-replace analyzer.clj:46-48
  A16 html-strip     analyzer.clj:49
Payload-emitting tokenizers (A7 code, A8 byte-payload, A9
delimited-payload) need per-token side data and live in
``bzzz_spark.analysis.payloads`` as vectorized pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
import re

from pyspark.sql import functions as F

from bzzz_spark.analysis.tokenizer import TOKEN_PATTERN_JVM

# ---------------------------------------------------------------- char filters


def pattern_replace(col: Column, pattern: str, replacement: str) -> Column:
    return F.regexp_replace(col, pattern, replacement)


def html_strip(col: Column, escaped_tags: tuple = ()) -> Column:
    """Strip HTML tags; tags named in ``escaped_tags`` are preserved
    (Lucene HTMLStripCharFilter's escapedTags — reference
    src/bzzz/analyzer.clj:49).  Entities are left alone."""
    if not escaped_tags:
        return F.regexp_replace(col, r"<[^>]*>", " ")
    import re as _re

    alt = "|".join(_re.escape(t) for t in escaped_tags)
    # Java-regex negative lookahead: strip every tag whose name is NOT
    # in the whitelist (open or close form)
    return F.regexp_replace(col, rf"<(?!/?(?:{alt})\b)[^>]*>", " ")


# ---------------------------------------------------------------- tokenizers


def tok_standard(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN_JVM), 0)


def tok_whitespace(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def tok_keyword(col: Column) -> Column:
    return F.array(col)


def tok_letter(col: Column) -> Column:
    # Lucene LetterTokenizer: maximal runs of letters, case-preserving.
    return F.regexp_extract_all(col, F.lit(r"\p{L}+"), 0)


def tok_ngram(col: Column, min_gram: int, max_gram: int) -> Column:
    """All character n-grams of length min..max over the raw value.

    Emitted in (length, offset) order, matching a nested-loop reading of
    Lucene's NGramTokenizer output set (order is irrelevant to the index,
    which aggregates to (term, tf)).
    """
    empty = F.array().cast("array<string>")
    return F.flatten(
        F.transform(
            F.sequence(F.lit(min_gram), F.lit(max_gram)),
            # guard: F.sequence(1, end) DESCENDS when end < 1, which
            # would duplicate grams for values shorter than n
            lambda n: F.when(
                F.length(col) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length(col) - n + 1),
                    lambda i: F.substring(col, i, n),
                ),
            ).otherwise(empty),
        )
    )


def tok_edge_ngram(col: Column, min_gram: int, max_gram: int) -> Column:
    """Prefix n-grams of length min..max."""
    return F.filter(
        F.transform(
            F.sequence(F.lit(min_gram), F.lit(max_gram)),
            lambda n: F.when(F.length(col) >= n, F.substring(col, F.lit(1), n)),
        ),
        lambda t: t.isNotNull(),
    )


# -------------------------------------------------------------- token filters


def flt_lowercase(tokens: Column) -> Column:
    return F.transform(tokens, F.lower)


def flt_limit(tokens: Column, max_token_count: int) -> Column:
    return F.slice(tokens, 1, max_token_count)


def flt_length(tokens: Column, min_len: int, max_len: int) -> Column:
    return F.filter(tokens, lambda t: F.length(t).between(min_len, max_len))


def flt_reverse(tokens: Column) -> Column:
    return F.transform(tokens, F.reverse)


def flt_position(tokens: Column, position_increment: int = 0) -> Column:
    """A13 — the reference's `position` filter (Lucene PositionFilter,
    src/bzzz/analyzer.clj:82): overrides position increments.  The first
    token sits at position 0 and each later token advances by
    ``position_increment`` (0 → every token stacks at position 0, the
    'synonym' trick; 1 → standard consecutive positions).

    Returns array<struct<term:string, pos:int>>.  The default pipeline
    derives positions from array offsets (increment 1 implicitly); a
    chain ending in this filter feeds the positional index build via
    :func:`bzzz_spark.build.indexer.build_tf_positioned`."""
    return F.transform(
        tokens,
        lambda t, i: F.struct(
            t.alias("term"),
            (i * F.lit(position_increment)).cast("int").alias("pos"),
        ),
    )


def flt_ngram(tokens: Column, min_gram: int, max_gram: int) -> Column:
    return F.flatten(F.transform(tokens, lambda t: tok_ngram(t, min_gram, max_gram)))


def flt_edge_ngram(tokens: Column, min_gram: int, max_gram: int) -> Column:
    return F.flatten(
        F.transform(tokens, lambda t: tok_edge_ngram(t, min_gram, max_gram))
    )




# UAX#29-closer word segmentation (opt-in).  The pinned default
# tokenizer (tokenizer.standard_tokenize) stays the engine-wide,
# oracle-shared spec; this tokenizer closes the documented gaps vs
# Lucene's StandardTokenizer (UAX#29 word break, reference
# src/bzzz/analyzer.clj:119) for users who need them:
#   - apostrophes/dots/commas JOIN alphanumerics when flanked by them
#     on BOTH sides (UAX#29 MidLetter/MidNum/MidNumLet: "o'brien",
#     "u.s.a", "3,000.5" are each ONE token; trailing mids drop);
#   - CJK: Han and Hiragana emit one token PER CHARACTER (UAX#29
#     ideographic / WB999 behavior), Katakana emits runs (WB13);
#   - mixed alphanumerics and underscore join as before (ExtendNumLet).
# Implemented as ONE Java regex so it runs JVM-side inside codegen; the
# CPython mirror below is pinned token-identical by
# tests/test_tokenizer.py::test_uax29_spark_python_parity.  Not
# RE2-expressible (char-class intersection + lookahead), so it is NOT
# used by any DuckDB-checked contract row.
_UAX29_HAN = "\\u4e00-\\u9fff\\u3400-\\u4dbf\\uf900-\\ufaff"
_UAX29_HIRA = "\\u3041-\\u309f"
_UAX29_KATA = "\\u30a0-\\u30ff\\u31f0-\\u31ff"
_UAX29_CJK = _UAX29_HAN + _UAX29_HIRA + _UAX29_KATA
_UAX29_W_JVM = "[\\p{L}\\p{N}_&&[^" + _UAX29_CJK + "]]"
UAX29_PATTERN_JVM = (
    _UAX29_W_JVM
    + "(?:" + _UAX29_W_JVM + "|['\u2019.,](?=" + _UAX29_W_JVM + "))*"
    + "|[" + _UAX29_KATA + "]+"
    + "|[" + _UAX29_HAN + _UAX29_HIRA + "]"
)
_UAX29_W_PY = "(?:(?![" + _UAX29_CJK + "])\\w)"
UAX29_PATTERN_PY = re.compile(
    _UAX29_W_PY
    + "(?:" + _UAX29_W_PY + "|['\u2019.,](?=" + _UAX29_W_PY + "))*"
    + "|[" + _UAX29_KATA + "]+"
    + "|[" + _UAX29_HAN + _UAX29_HIRA + "]",
    re.UNICODE,
)


def tok_uax29(col: Column) -> Column:
    """UAX#29-closer word segmentation, lowercased, JVM-side."""
    return F.regexp_extract_all(F.lower(col), F.lit(UAX29_PATTERN_JVM), 0)


def py_uax29_tokenize(text: str) -> list:
    """CPython mirror of :func:`tok_uax29` for query-time parity."""
    if text is None:
        return []
    return UAX29_PATTERN_PY.findall(text.lower())


# ---------------------------------------------------------------- composition

_TOKENIZERS = {
    "standard": tok_standard,
    "uax29": tok_uax29,
    "whitespace": tok_whitespace,
    "keyword": tok_keyword,
    "letter": tok_letter,
}


def build_analyzer(spec: dict | str | None = None):
    """Compile an analyzer spec into text-Column → tokens-Column.

    Spec shape mirrors the reference JSON (reference: README.md:420-446):
      {"type": "custom",
       "char-filter": [{"type": "pattern-replace", "pattern": ..,
                        "replacement": ..} | {"type": "html-strip"}],
       "tokenizer": "standard" | "whitespace" | "keyword" | "letter"
                    | {"type": "ngram"|"edge-ngram", "min_gram": n,
                       "max_gram": m},
       "filter": [{"type": "lowercase"} | {"type": "limit", "max-token-count": n}
                  | {"type": "length", "min": a, "max": b}
                  | {"type": "reverse"}
                  | {"type": "ngram"|"edge-ngram", "min_gram": n, "max_gram": m}]}
    A bare string selects a named whole analyzer.  None → standard.
    """
    if spec is None or spec == "standard":
        return tok_standard
    if isinstance(spec, str):
        if spec in _TOKENIZERS:
            return _TOKENIZERS[spec]
        raise ValueError(f"unknown analyzer {spec!r}")

    char_filters = spec.get("char-filter", [])
    tok_spec = spec.get("tokenizer", "standard")
    filters = spec.get("filter", [])

    def analyze(col: Column) -> Column:
        c = col
        for cf in char_filters:
            if cf["type"] == "pattern-replace":
                c = pattern_replace(c, cf["pattern"], cf.get("replacement", ""))
            elif cf["type"] == "html-strip":
                c = html_strip(c, tuple(cf.get("escaped-tags", ())))
            else:
                raise ValueError(f"unknown char-filter {cf['type']!r}")
        if isinstance(tok_spec, str):
            toks = _TOKENIZERS[tok_spec](c)
        elif tok_spec["type"] == "ngram":
            toks = tok_ngram(c, tok_spec.get("min_gram", 1), tok_spec.get("max_gram", 2))
        elif tok_spec["type"] == "edge-ngram":
            toks = tok_edge_ngram(
                c, tok_spec.get("min_gram", 1), tok_spec.get("max_gram", 2)
            )
        else:
            raise ValueError(f"unknown tokenizer {tok_spec!r}")
        for f in filters:
            t = f["type"]
            if t == "lowercase":
                toks = flt_lowercase(toks)
            elif t == "limit":
                toks = flt_limit(toks, f["max-token-count"])
            elif t == "length":
                toks = flt_length(toks, f["min"], f["max"])
            elif t == "reverse":
                toks = flt_reverse(toks)
            elif t == "ngram":
                toks = flt_ngram(toks, f.get("min_gram", 1), f.get("max_gram", 2))
            elif t == "edge-ngram":
                toks = flt_edge_ngram(toks, f.get("min_gram", 1), f.get("max_gram", 2))
            else:
                raise ValueError(f"unknown token filter {t!r}")
        return toks

    return analyze
