"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting
(analyzer + BPE-ish regex), and document fingerprinting — all as
JVM-side column expressions (whole-stage codegen; no Python in the hot
path), each mirrored exactly by DuckDB SQL in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bzzz_spark.analysis.tokenizer import TOKEN_PATTERN_JVM, standard_tokenize

# Valid in both Java regex and RE2: GPT-2-flavoured pretokenizer shape.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ich", "ein", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pas"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un", "una", "no"],
}


def token_count(col: Column | str) -> Column:
    """Analyzer token count (the BM25 dl)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(standard_tokenize(c))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate LLM token count via a BPE-style pretokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def _stopword_hits(tokens: Column, lang: str) -> Column:
    return F.size(
        F.filter(tokens, lambda t: t.isin(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


def lang_id(col: Column | str) -> Column:
    """Heuristic language id: argmax stopword-hit ratio over {en,de,fr,es},
    'und' (undetermined) when nothing hits.  Ties break by language code
    order — pinned so the oracle agrees."""
    c = F.col(col) if isinstance(col, str) else col
    toks = standard_tokenize(c)
    hits = {lang: _stopword_hits(toks, lang) for lang in sorted(STOPWORDS)}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_features(col: Column | str) -> dict[str, Column]:
    """Raw quality signals; combine with quality_score()."""
    c = F.col(col) if isinstance(col, str) else col
    toks = standard_tokenize(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    return {
        "n_tokens": n_tok,
        "n_chars": n_chars,
        "mean_word_len": F.when(
            n_tok > 0,
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast(
                "double"
            )
            / n_tok,
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tok > 0, _stopword_hits(toks, "en").cast("double") / n_tok
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0,
            F.size(F.regexp_extract_all(c, F.lit(r"[^\s\p{L}\p{N}]"), 0)).cast(
                "double"
            )
            / n_chars,
        ).otherwise(F.lit(0.0)),
        "upper_ratio": F.when(
            n_chars > 0,
            F.size(F.regexp_extract_all(c, F.lit(r"\p{Lu}"), 0)).cast("double")
            / n_chars,
        ).otherwise(F.lit(0.0)),
    }


def quality_score(col: Column | str) -> Column:
    """Composite quality in [0,1]: rewards prose-like length/stopword
    structure, penalizes punctuation/uppercase noise.  The formula is
    arbitrary but pinned — the value is the cross-engine determinism."""
    f = quality_features(col)
    length_part = F.least(f["n_tokens"].cast("double") / 100.0, F.lit(1.0))
    stop_part = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    noise = F.greatest(
        F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 3.0 - f["upper_ratio"]
    )
    return (0.4 * length_part + 0.3 * stop_part + 0.3 * noise).cast("double")


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprint/dedup: lower, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (portable across
    Spark / DuckDB / Python for exact oracle checks)."""
    return F.md5(normalize_text(col))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct token n-gram shingles (strings joined by single spaces).

    Docs shorter than n tokens yield an empty array — guarded
    explicitly, because Spark's sequence(1, 0) produces a DESCENDING
    [1, 0] whose 0 then crashes slice()."""
    c = F.col(col) if isinstance(col, str) else col
    toks = standard_tokenize(c)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                ),
                lambda s: F.length(s) > 0,
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc: all text-analysis signals."""
    feats = quality_features(text_col)
    return df.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        bpe_ish_token_count(text_col).cast("long").alias("n_bpe_tokens"),
        lang_id(text_col).alias("lang_pred"),
        F.round(quality_score(text_col), 6).alias("quality"),
        F.round(feats["mean_word_len"], 6).alias("mean_word_len"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        fingerprint(text_col).alias("fingerprint"),
    )


def intra_doc_repetition(col: Column | str, n: int = 3) -> Column:
    """Within-document repetition: the fraction of token n-grams that
    are duplicates of an earlier n-gram in the SAME document (one of
    the Gopher/MassiveText quality-filter signals — high values mean
    boilerplate or looping text).  0.0 for docs with < n tokens.
    Pure column expression; pairs with repeated_ngram_spans (dedup.py)
    which handles the CROSS-document case."""
    c = F.col(col) if isinstance(col, str) else col
    toks = standard_tokenize(c)
    all_grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(all_grams)
    return F.when(
        total > 0,
        (total - F.size(F.array_distinct(all_grams)))
        / total.cast("double"),
    ).otherwise(F.lit(0.0))
