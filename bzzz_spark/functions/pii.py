"""PII detection and redaction for training-data pipelines.

The scrubbing pass web-corpus pipelines (C4, RefinedWeb, Dolma) run
before training: find and replace emails, IPv4 addresses and phone
numbers with typed placeholders.  Everything is `regexp_count` /
`regexp_replace` — JVM-side, whole-stage-codegen, zero Python in the
hot path — and the patterns are restricted to syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
bounded repetition, \\b word boundaries, non-capturing groups; no
backreferences, no lookaround.  That keeps the op oracle-checkable
byte-for-byte.

At 100 TB this is a pure map stage: no shuffle, scales with scan
bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: emails first (their local/domain parts
# contain digits and dots that the looser patterns could clip), then
# IPv4 (dotted digits), then phones (the greediest digit runs).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# international-ish: optional +CC, then 8-14 digits broken by at most
# single separators — anchored on word boundaries to avoid eating
# arbitrary digit runs inside identifiers.
#
# PINNED \b CAVEAT: Java's \b (Spark) is Unicode-aware — 'ü' counts as
# a word char, so 'ü10.0.0.1' contains NO IP by Java's reading — while
# RE2's \b (DuckDB) is ASCII, which would match there.  Python 3's
# default re agrees with Java.  The engines are byte-identical on text
# where PII tokens abut ASCII or whitespace (all of the oracle corpus);
# a non-ASCII word character directly touching a token is the one
# divergent case — there the Unicode reading redacts LESS (no boundary,
# no match); pipelines that care should normalize such punctuation
# upstream before the scrub.
PHONE_RE = r"\+?\b[0-9]{2,4}(?:[-. ()][0-9]{2,4}){2,4}\b"

PLACEHOLDERS = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}

_PATTERNS = (("email", EMAIL_RE), ("ipv4", IPV4_RE), ("phone", PHONE_RE))


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII occurrence counts: {email, ipv4, phone} →
    integer Column.  Counts overlap-free leftmost matches (both engines
    agree on that semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat in _PATTERNS
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its typed placeholder, in the fixed
    email → ipv4 → phone order (see module comment)."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat in _PATTERNS:
        c = F.regexp_replace(c, pat, PLACEHOLDERS[name])
    return c


PII_OUTPUT_COLS = ("n_email", "n_ipv4", "n_phone", "text_redacted",
                   "has_pii")


def pii_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-category PII counts, a has_pii flag, and the redacted
    text — the columnar scrub report a pipeline persists next to the
    cleaned corpus.  Input columns pass through unchanged (so downstream
    stages keep their source/lang/id columns); the output columns are
    reserved and raise on clash, like the cleaning ops."""
    from bzzz_spark.functions.cleaning import _guard_clash

    _guard_clash(df, PII_OUTPUT_COLS, "pii_profile")
    out = df
    for name, col in pii_counts(text_col).items():
        out = out.withColumn(f"n_{name}", col)
    out = out.withColumn("text_redacted", redact_pii(text_col))
    return out.withColumn(
        "has_pii",
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0,
    )
