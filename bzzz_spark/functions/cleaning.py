"""C4- and Gopher-style corpus cleaning for training-data pipelines.

The two canonical published rule sets a web-scale pretraining pipeline
runs after dedup:

- **C4 line filtering** (Raffel et al., "Exploring the Limits of
  Transfer Learning...", §2.2): keep only lines that end in terminal
  punctuation and have enough words, drop boilerplate lines
  (javascript / cookie / policy notices), and flag documents containing
  "lorem ipsum" or curly braces for removal.
- **Gopher quality rules** (Rae et al., "Scaling Language Models:
  ... Gopher", A1.1.2): document-level bounds on word count, mean word
  length, symbol-to-word ratio, bullet/ellipsis line fractions,
  alphabetic-word fraction, and stopword presence.

Everything is built from `split` / higher-order array functions /
`regexp_count` — JVM-side column expressions, zero Python in the hot
path, and restricted to regex syntax with identical semantics in Java
regex (Spark) and RE2 (DuckDB) so both ops are oracle-checkable.

At 100 TB both are pure map stages: no shuffle, scale with scan
bandwidth — the same shape as `functions/pii.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# line must end in terminal punctuation (C4 keeps '.', '!', '?', '"';
# we accept the closing-quote variant too)
TERMINAL_PUNCT_RE = r'[.!?"]$'
# boilerplate line markers (matched on the lowercased line)
C4_BAD_LINE_RE = r"javascript|cookie policy|terms of use"
LOREM_RE = r"lorem ipsum"
# Gopher counts '#' and '...' as symbols for the symbol-to-word ratio
SYMBOL_RE = r"#|\.\.\."
BULLET_RE = r"^\s*[-*•]"
ELLIPSIS_END_RE = r"\.\.\.\s*$"
# language-agnostic-enough English stopword probe (Gopher requires >= 2
# of a small set; shared with text.STOPWORDS['en'] semantics)
STOP_PROBE = ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"]

C4_OUTPUT_COLS = ("n_lines", "n_kept_lines", "text_clean", "has_lorem_ipsum",
                  "has_curly", "c4_keep")
GOPHER_OUTPUT_COLS = ("n_words", "mean_word_len", "symbol_ratio",
                      "frac_bullet_lines", "frac_ellipsis_lines",
                      "frac_alpha_words", "n_stop_hits", "gopher_keep")


# split on \r?\n so CRLF text tokenizes into \r-free lines — Java's $
# matches before a trailing \r where RE2's does not, so lines must
# never carry one (text_clean consequently normalizes newlines to \n)
LINE_SPLIT_RE = r"\r?\n"


def _words(text: Column) -> Column:
    # split-then-drop-empties instead of trim+split: Spark's trim only
    # strips SPACES, so a leading tab/newline would otherwise produce a
    # phantom '' word that inflates n_words and every ratio
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def _guard_clash(df: DataFrame, reserved: tuple[str, ...], op: str) -> None:
    clash = set(reserved) & set(df.columns)
    if clash:
        raise ValueError(
            f"{op} writes output column(s) {sorted(clash)} "
            "which already exist on the input — rename them first"
        )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4 §2.2 line filtering.  Appends (reserved — raises on clash):

    - n_lines / n_kept_lines: before/after the line filter
    - text_clean: surviving lines re-joined with '\\n'
    - has_lorem_ipsum / has_curly: document-level removal flags
    - c4_keep: enough lines survived and neither flag fired

    A line survives iff it ends in terminal punctuation, has at least
    `min_words_per_line` whitespace words, and matches no boilerplate
    marker.  One pass over the lines array per doc; no shuffle.
    """
    _guard_clash(df, C4_OUTPUT_COLS, "c4_clean")
    text = F.col(text_col)
    lines = F.split(text, LINE_SPLIT_RE)
    kept = F.filter(
        lines,
        lambda l: l.rlike(TERMINAL_PUNCT_RE)
        & (F.size(_words(l)) >= min_words_per_line)
        & ~F.lower(l).rlike(C4_BAD_LINE_RE),
    )
    out = (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn("text_clean", F.array_join(kept, "\n"))
        .withColumn("has_lorem_ipsum", F.lower(text).rlike(LOREM_RE))
        .withColumn("has_curly", text.contains("{"))
    )
    return out.withColumn(
        "c4_keep",
        (F.col("n_kept_lines") >= min_kept_lines)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_curly"),
    )


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher A1.1.2 document-quality flags.  Appends (reserved —
    raises on clash) the measured signals plus the composite
    `gopher_keep`; thresholds are the paper's defaults.

    All ratios are NULL-safe at n_words = 0 / n_lines = 0 (a degenerate
    doc fails `gopher_keep` via the word-count bound, not via a
    divide-by-zero).
    """
    _guard_clash(df, GOPHER_OUTPUT_COLS, "gopher_flags")
    text = F.col(text_col)
    words = _words(text)
    lines = F.split(text, LINE_SPLIT_RE)
    n_words = F.size(words)
    n_lines = F.size(lines)
    safe_w = F.when(n_words > 0, n_words.cast("double"))
    safe_l = F.when(n_lines > 0, n_lines.cast("double"))
    mean_wl = (
        F.aggregate(
            words, F.lit(0).cast("double"),
            lambda acc, w: acc + F.length(w),
        ) / safe_w
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(BULLET_RE)))
    n_ellips = F.size(F.filter(lines, lambda l: l.rlike(ELLIPSIS_END_RE)))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in STOP_PROBE]),
        )
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_wl, 6))
        .withColumn(
            "symbol_ratio",
            F.round(F.regexp_count(text, F.lit(SYMBOL_RE)) / safe_w, 6),
        )
        .withColumn("frac_bullet_lines", F.round(n_bullet / safe_l, 6))
        .withColumn("frac_ellipsis_lines", F.round(n_ellips / safe_l, 6))
        .withColumn("frac_alpha_words", F.round(n_alpha / safe_w, 6))
        .withColumn("n_stop_hits", stop_hits)
    )
    return out.withColumn(
        "gopher_keep",
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("frac_bullet_lines") <= max_bullet_frac)
        & (F.col("frac_ellipsis_lines") <= max_ellipsis_frac)
        & (F.col("frac_alpha_words") >= min_alpha_frac)
        & (F.col("n_stop_hits") >= min_stop_hits),
    )
