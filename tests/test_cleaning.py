"""C4 line filtering and Gopher quality flags — checked against a
plain-Python re implementation as the independent third engine (the
driver gate compares Spark vs DuckDB on the same ops)."""

import re

import pytest
from pyspark.sql import functions as F

from bzzz_spark.functions.cleaning import (
    BULLET_RE,
    C4_BAD_LINE_RE,
    ELLIPSIS_END_RE,
    STOP_PROBE,
    SYMBOL_RE,
    TERMINAL_PUNCT_RE,
    c4_clean,
    gopher_flags,
)

DOCS = [
    (0, "A fine first sentence with enough words in it.\nshort one.\n"
        "This page requires JavaScript to display.\n"
        "- a bullet without terminal punctuation\n"
        "Ellipses trail off here and there and everywhere...\n"
        "Another perfectly good closing sentence right here!"),
    (1, "lorem ipsum dolor sit amet consectetur adipiscing elit today."),
    (2, "function f() { return 42; } is code not prose honestly."),
    (3, ""),
    (4, "no punctuation no keep"),
    (5, "#### #### #### symbols dominate this one completely here....\n"
        "But this line is a normal kept sentence with many words."),
    # CRLF + leading-tab torture: lines must tokenize \r-free (Java $
    # matches before a trailing \r, RE2's does not) and a leading tab
    # must not create a phantom '' word
    (6, "\tA tab led line that still ends properly.\r\n"
        "one two three four.\r\n"
        "Plenty of words make this line pass the filter fine.\r\n"),
]


def _py_words(s):
    return [w for w in re.split(r"\s+", s) if w != ""]


def _py_kept(text, min_words=5):
    out = []
    for line in re.split(r"\r?\n", text):
        if (re.search(TERMINAL_PUNCT_RE, line)
                and len(_py_words(line)) >= min_words
                and not re.search(C4_BAD_LINE_RE, line.lower())):
            out.append(line)
    return out


def _py_gopher(text):
    words = _py_words(text)
    lines = re.split(r"\r?\n", text)
    n = len(words)
    mwl = sum(len(w) for w in words) / n if n else None
    sym = len(re.findall(SYMBOL_RE, text)) / n if n else None
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w)) / n if n else None
    bullet = sum(1 for l in lines if re.match(BULLET_RE, l)) / len(lines)
    ellip = sum(1 for l in lines if re.search(ELLIPSIS_END_RE, l)) / len(lines)
    stops = len({w.lower() for w in words} & set(STOP_PROBE))
    return n, mwl, sym, alpha, bullet, ellip, stops


@pytest.fixture(scope="module")
def clean_df(spark):
    return gopher_flags(c4_clean(
        spark.createDataFrame(DOCS, ["doc_id", "text"])
    ))


class TestC4:
    def test_line_filter_matches_python(self, clean_df):
        rows = {r["doc_id"]: r for r in clean_df.collect()}
        for doc_id, text in DOCS:
            kept = _py_kept(text)
            got = rows[doc_id]
            assert got["n_lines"] == len(text.split("\n"))
            assert got["n_kept_lines"] == len(kept), (doc_id, kept)
            assert got["text_clean"] == "\n".join(kept)

    def test_doc_flags(self, clean_df):
        rows = {r["doc_id"]: r for r in clean_df.collect()}
        assert rows[1]["has_lorem_ipsum"] and not rows[1]["c4_keep"]
        assert rows[2]["has_curly"] and not rows[2]["c4_keep"]
        assert rows[0]["c4_keep"]          # good lines survive
        assert not rows[3]["c4_keep"]      # empty doc keeps nothing
        assert not rows[4]["c4_keep"]      # unpunctuated line dropped

    def test_reserved_columns_guarded(self, spark):
        df = spark.createDataFrame([(0, "x", 1)],
                                   ["doc_id", "text", "c4_keep"])
        with pytest.raises(ValueError, match="c4_keep"):
            c4_clean(df)


class TestGopher:
    def test_signals_match_python(self, clean_df):
        rows = {r["doc_id"]: r for r in clean_df.collect()}
        for doc_id, text in DOCS:
            n, mwl, sym, alpha, bullet, ellip, stops = _py_gopher(text)
            got = rows[doc_id]
            assert got["n_words"] == n, doc_id
            for col, exp in [("mean_word_len", mwl), ("symbol_ratio", sym),
                             ("frac_alpha_words", alpha),
                             ("frac_bullet_lines", bullet),
                             ("frac_ellipsis_lines", ellip)]:
                if exp is None:
                    assert got[col] is None, (doc_id, col)
                else:
                    assert got[col] == pytest.approx(exp, abs=1e-6), (doc_id, col)
            assert got["n_stop_hits"] == stops, doc_id

    def test_keep_composite(self, spark):
        # 60 plain words with stopwords → keep; same doc drowned in
        # symbols → reject via symbol_ratio; tiny doc → reject via
        # word-count bound
        good = "the quick brown fox jumps over a lazy dog in the yard " * 6
        out = {r["doc_id"]: r["gopher_keep"] for r in gopher_flags(
            spark.createDataFrame(
                [(0, good.strip()),
                 (1, (good + "#### " * 30).strip()),
                 (2, "the tiny one.")],
                ["doc_id", "text"],
            )
        ).collect()}
        assert out[0] is True
        assert out[1] is False
        assert out[2] is False

    def test_empty_doc_fails_not_errors(self, clean_df):
        r = [x for x in clean_df.collect() if x["doc_id"] == 3][0]
        assert r["gopher_keep"] is False  # via word-count bound, no NaN


def test_map_stage_ops_have_no_exchange(spark):
    """The 100 TB scale claim for pii/cleaning/sampling rests on them
    being pure map stages: the physical plan must contain no Exchange
    (deterministic_shuffle is the one op whose JOB is an exchange)."""
    from bzzz_spark.functions.pii import pii_profile
    from bzzz_spark.functions.sampling import (
        assign_split, hash_sample, stratified_sample,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("words with a period.").alias("text"),
        F.lit("en").alias("lang"),
    )
    plans = {
        "pii": pii_profile(df),
        "clean": gopher_flags(c4_clean(df)),
        "sample": hash_sample(df, 0.5, "doc_id"),
        "split": assign_split(df, "doc_id"),
        "strat": stratified_sample(df, {"en": 0.5}, "lang", "doc_id"),
    }
    for name, out in plans.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (name, plan)
