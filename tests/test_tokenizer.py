"""Analyzer parity — the single highest-risk parity item (SURVEY.md §7 M1).

The reference lesson: analyzer mismatch between index and query time
silently returns nothing (reference README.md:104-105).  We pin that the
JVM tokenizer (index path), the Python tokenizer (query/oracle path),
and the analyzer-component transforms agree on a torture fixture.
"""

import pandas as pd
from pyspark.sql import functions as F

from bzzz_spark.analysis.analyzers import build_analyzer
from bzzz_spark.analysis.tokenizer import py_tokenize, standard_tokenize
from bzzz_spark.fixtures import TORTURE, synth_transcripts_pdf

TEXTS = [
    "Jack's naïve 日本語 FooBar 3.14 snake_case UPPER a " + "x" * 65,
    "hello,world  foo-bar\tbaz\nqux",
    "MiXeD CaSe AND punct!!! (parens) [brackets] {braces}",
    "",
    "   ",
    "123 0x1f 3.14159 1,000,000",
    " ".join(TORTURE),
    "l'élève déjà-vu C'est-à-dire",
    "ünïcödé ÅÄÖ ß Straße",
] + list(synth_transcripts_pdf(n_conv=5)["text"])


def test_jvm_python_tokenizer_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": TEXTS}))
    got = df.select(standard_tokenize(F.col("text")).alias("toks")).collect()
    for row, text in zip(got, TEXTS):
        assert row["toks"] == py_tokenize(text), f"mismatch on {text!r}"


def test_tokenize_lowercases_and_splits(spark):
    assert py_tokenize("Hello WORLD") == ["hello", "world"]
    assert py_tokenize("foo-bar") == ["foo", "bar"]
    assert py_tokenize("snake_case") == ["snake_case"]
    assert py_tokenize("3.14") == ["3", "14"]
    assert py_tokenize(None) == []


def _run(spark, analyzer, value):
    df = spark.createDataFrame(pd.DataFrame({"t": [value]}))
    return df.select(analyzer(F.col("t")).alias("o")).collect()[0]["o"]


def test_whitespace_analyzer(spark):
    a = build_analyzer("whitespace")
    assert _run(spark, a, "Foo  Bar\tbaz") == ["Foo", "Bar", "baz"]


def test_keyword_analyzer(spark):
    a = build_analyzer("keyword")
    assert _run(spark, a, "Foo Bar") == ["Foo Bar"]


def test_letter_analyzer(spark):
    a = build_analyzer("letter")
    assert _run(spark, a, "abc123def GHI") == ["abc", "def", "GHI"]


def test_ngram_analyzer(spark):
    # reference: test/bzzz/core_test.clj:297-317 (ngram min=2 max=3)
    a = build_analyzer({"tokenizer": {"type": "ngram", "min_gram": 2, "max_gram": 3}})
    out = _run(spark, a, "abcd")
    assert sorted(out) == sorted(["ab", "bc", "cd", "abc", "bcd"])


def test_edge_ngram_analyzer(spark):
    # reference: test/bzzz/core_test.clj:320-327
    a = build_analyzer(
        {"tokenizer": {"type": "edge-ngram", "min_gram": 1, "max_gram": 3}}
    )
    assert _run(spark, a, "abcd") == ["a", "ab", "abc"]


def test_filter_chain(spark):
    a = build_analyzer(
        {
            "char-filter": [
                {"type": "pattern-replace", "pattern": "<b>", "replacement": ""},
                {"type": "html-strip"},
            ],
            "tokenizer": "whitespace",
            "filter": [
                {"type": "lowercase"},
                {"type": "length", "min": 2, "max": 10},
                {"type": "limit", "max-token-count": 3},
            ],
        }
    )
    out = _run(spark, a, "<b>KEEP</b> <i>x</i> Second THIRD fourth fifth")
    assert out == ["keep", "second", "third"]


def test_reverse_filter(spark):
    a = build_analyzer({"tokenizer": "whitespace", "filter": [{"type": "reverse"}]})
    assert _run(spark, a, "abc def") == ["cba", "fed"]


UAX29_TEXTS = TEXTS + [
    "O'Brien's U.S.A. 3,000.5 foo_bar http://x",
    "don’t can't M*A*S*H I.B.M. 1,2 a,b",       # curly + straight apostrophes
    "日本語テスト です カタカナ run 漢字と ひらがな",
    "trailing' mid.dot. comma, 'leading",
    "a.b.c a..b a'b' 'a'",
]


def test_uax29_spark_python_parity(spark):
    """The opt-in UAX#29-closer tokenizer: JVM regex and the CPython
    mirror must be token-identical on the torture fixture + the
    apostrophe/CJK/mixed-alnum cases it exists for."""
    from bzzz_spark.analysis.analyzers import py_uax29_tokenize, tok_uax29

    df = spark.createDataFrame(pd.DataFrame({"text": UAX29_TEXTS}))
    got = df.select(tok_uax29(F.col("text")).alias("toks")).collect()
    for row, text in zip(got, UAX29_TEXTS):
        assert row["toks"] == py_uax29_tokenize(text), f"mismatch on {text!r}"


def test_uax29_segmentation_rules():
    """Hand-pinned UAX#29 behaviors the default tokenizer lacks:
    mid-token apostrophes/dots/commas join, trailing mids drop, Han and
    Hiragana emit per-character, Katakana emits runs."""
    from bzzz_spark.analysis.analyzers import py_uax29_tokenize as tk

    assert tk("O'Brien's") == ["o'brien's"]
    assert tk("U.S.A.") == ["u.s.a"]
    assert tk("3,000.5") == ["3,000.5"]
    assert tk("don’t") == ["don’t"]
    assert tk("http://x") == ["http", "x"]       # ':' and '/' never join
    assert tk("snake_case") == ["snake_case"]
    assert tk("trailing. x") == ["trailing", "x"]  # trailing mid drops
    assert tk("a,b 1,2") == ["a,b", "1,2"]
    assert tk("日本語") == ["日", "本", "語"]     # Han: one per character
    assert tk("テスト") == ["テスト"]             # Katakana: runs
    assert tk("です") == ["で", "す"]             # Hiragana: one per char
    assert tk("") == []
    assert tk(None) == []


def test_uax29_analyzer_spec(spark):
    """'uax29' is a registered tokenizer for custom analyzer chains."""
    a = build_analyzer({"type": "custom", "tokenizer": "uax29"})
    assert _run(spark, a, "O'Brien met 日本 people") == [
        "o'brien", "met", "日", "本", "people",
    ]
