"""DSIR-style importance weighting for training-data selection.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", NeurIPS) selects raw web documents that look
like a small high-quality TARGET corpus: estimate a bag-of-hashed-ngram
generative model on each corpus, weight every raw document by the
log-likelihood ratio

    log w(x) = sum over x's hashed n-grams b of (log p_target[b]
                                                 - log p_raw[b])

and resample without replacement via Gumbel-top-k on
``log w(x) + Gumbel noise``.  This module is the distributed form of
that recipe, with every stage a Spark primitive and every number
replayable in ANSI SQL (the DuckDB oracle in __spark_entry__.py
mirrors it term for term, the ``functions/lm.py`` discipline):

- :func:`train_ngram_importance` — hashed unigram+bigram bucket counts
  on each corpus are two groupBy aggregations per corpus (map-side
  partial combine; the shuffle key is the md5 bucket, uniform by
  construction — at most ``n_buckets`` rows survive, so the shuffle is
  bounded regardless of corpus size).  The bucket log-ratio uses add-k
  smoothing over bucket counts:

      log_ratio[b] = log((c_t[b] + k) / (N_t + k*B))
                   - log((c_r[b] + k) / (N_r + k*B))

  (B = n_buckets, N = total gram count) — the paper's Laplace-style
  smoothing pinned to a rule DuckDB reproduces exactly.
- :func:`importance_weight` — per-document sum of bucket log-ratios.
  ``mode="broadcast"`` collects the ratio table (<= B rows, B defaults
  to 10k) into a dense numpy array and scores as a PURE MAP stage over
  Arrow batches — zero shuffle, scan-bandwidth-bound at 100 TB.
  ``mode="join"`` makes no size assumption: explode each document's
  grams once, equi-join the ratio table on the bucket key (AQE picks
  broadcast-hash for a 10k-row build side), fold back with one groupBy
  on the document key.  Both modes produce identical numbers
  (tests/test_dsir.py fuzzes the equality).
- :func:`gumbel_key` / :func:`dsir_select` — seeded Gumbel perturbation
  ``-ln(-ln(u))`` with u drawn from md5(seed ':' doc key), the
  ``functions/sampling.py`` convention: reproducible across runs,
  partitionings and cluster sizes.  Selection is orderBy + limit —
  TakeOrderedAndProject keeps it a bounded per-partition top-k, never
  a full sort.

Feature hashing is md5-prefix mod B (shared Spark/DuckDB/Python
convention, fuzz-pinned alongside sampling.py's): unigrams hash the
token, bigrams hash ``w1 || chr(31) || w2`` (the unit separator cannot
appear inside analyzer output).  Reference scope note: the reference
engine (jackdoe/bzzz) has no data-selection layer — this module is
part of the training-pipeline surface the build brief adds on top;
its semantics come from the published paper, not the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from bzzz_spark.analysis.tokenizer import standard_tokenize

DSIR_OUTPUT_COLS = ("n_grams", "log_importance_weight")
_SEP = "\x1f"  # unit separator — analyzer output never contains it


@dataclass(frozen=True)
class NgramImportance:
    """A trained hashed-ngram importance model.

    ``ratios`` (bucket, log_ratio) stays a DataFrame of at most
    ``n_buckets`` rows; ``default_ratio`` is the log-ratio of a bucket
    unseen in BOTH corpora (both sides at the add-k floor), applied to
    buckets absent from the table.  ``n_target_grams``/``n_raw_grams``
    are the corpus totals the smoothing denominators need.
    """

    ratios: DataFrame
    n_buckets: int
    k: float
    n_target_grams: int
    n_raw_grams: int
    default_ratio: float


def _guard_clash(df: DataFrame, op: str) -> None:
    clash = set(DSIR_OUTPUT_COLS) & set(df.columns)
    if clash:
        raise ValueError(
            f"{op} writes output column(s) {sorted(clash)} "
            "which already exist on the input — rename them first"
        )


def _gram_strings(tokens: Column) -> Column:
    """array<string> of the doc's features: every unigram plus every
    adjacent bigram joined on the unit separator — JVM-side (slice +
    zip_with run in whole-stage codegen)."""
    n = F.greatest(F.size(tokens) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(tokens, 1, n),
        F.slice(tokens, 2, n),
        lambda a, b: F.concat(a, F.lit(_SEP), b),
    )
    return F.concat(tokens, bigrams)


def _bucket_of(gram: Column, n_buckets: int) -> Column:
    """Hash bucket in [0, n_buckets): int(md5(gram)[:8], 16) % B —
    bit-identical in DuckDB as
    ('0x' || substr(md5(gram), 1, 8))::BIGINT % B and in Python as
    int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def _py_buckets(text, n_buckets: int) -> "list[int]":
    """Python twin of tokenize -> grams -> buckets for the broadcast
    scorer (and the plain-Python third-engine test)."""
    import hashlib

    from bzzz_spark.analysis.tokenizer import py_tokenize

    ws = py_tokenize(text) if isinstance(text, str) else []
    grams = ws + [a + _SEP + b for a, b in zip(ws[:-1], ws[1:])]
    return [
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) % n_buckets
        for g in grams
    ]


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    toks = standard_tokenize(F.col(text_col))
    return (
        df.select(F.explode(_gram_strings(toks)).alias("g"))
        .select(_bucket_of(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_ngram_importance(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    k: float = 0.1,
) -> NgramImportance:
    """Estimate per-bucket log importance ratios target vs raw.

    Two groupBy counts per corpus, one outer join on the bucket key —
    every intermediate is bounded by ``n_buckets`` rows after the
    partial-combine, so the plan's shuffles stay tiny at any corpus
    size.  Raises on an empty corpus (a zero total makes the smoothed
    distribution degenerate).
    """
    if k <= 0:
        raise ValueError(f"add-k smoothing needs k > 0, got {k}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    # join the two count tables FIRST and persist the result (at most
    # n_buckets rows — always tiny) so the expensive corpus-scan
    # lineages behind them run exactly once: the totals aggregation
    # below and every later ratio consumer read the cached join
    joined = (
        _bucket_counts(target_df, text_col, n_buckets)
        .withColumnRenamed("c", "c_t")
        .join(
            _bucket_counts(raw_df, text_col, n_buckets)
            .withColumnRenamed("c", "c_r"),
            on="bucket", how="full_outer",
        )
        .persist()
    )
    tot = joined.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    ).collect()[0]
    n_t = int(tot["n_t"] or 0)
    n_r = int(tot["n_r"] or 0)
    if n_t == 0 or n_r == 0:
        joined.unpersist()
        raise ValueError(
            "cannot train importance ratios on an empty corpus "
            f"(target grams={n_t}, raw grams={n_r})"
        )
    import math

    denom_t, denom_r = n_t + k * n_buckets, n_r + k * n_buckets
    ratios = joined.select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(k))
                / F.lit(denom_t)
            )
            - F.log(
                (F.coalesce(F.col("c_r"), F.lit(0)) + F.lit(k))
                / F.lit(denom_r)
            )
        ).alias("log_ratio"),
    )
    default = math.log(k / denom_t) - math.log(k / denom_r)
    return NgramImportance(
        ratios, int(n_buckets), float(k), n_t, n_r, float(default)
    )


def _weight_join(
    df: DataFrame, model: NgramImportance, text_col: str, id_col: str
) -> DataFrame:
    toks = standard_tokenize(F.col(text_col))
    grams = df.select(
        F.col(id_col).alias("__bzzz_dsir_id"),
        F.explode(_gram_strings(toks)).alias("g"),
    ).select(
        "__bzzz_dsir_id",
        _bucket_of(F.col("g"), model.n_buckets).alias("bucket"),
    )
    agg = (
        grams.join(model.ratios, on="bucket", how="left")
        .groupBy("__bzzz_dsir_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.coalesce(F.col("log_ratio"), F.lit(model.default_ratio))
            ).alias("log_importance_weight"),
        )
    )
    return (
        df.join(agg, on=F.col(id_col) == F.col("__bzzz_dsir_id"), how="left")
        .drop("__bzzz_dsir_id")
        .withColumn(
            "n_grams",
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")),
        )
        .withColumn(
            "log_importance_weight",
            F.coalesce(F.col("log_importance_weight"), F.lit(0.0)),
        )
    )


def _weight_broadcast(
    df: DataFrame, model: NgramImportance, text_col: str
) -> DataFrame:
    import numpy as np

    table = np.full(model.n_buckets, model.default_ratio, dtype=np.float64)
    for row in model.ratios.collect():  # <= n_buckets rows by construction
        table[int(row["bucket"])] = float(row["log_ratio"])
    b_table = df.sparkSession.sparkContext.broadcast(table)
    n_buckets = model.n_buckets
    cols = list(df.columns)
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_grams", LongType()),
            StructField("log_importance_weight", DoubleType()),
        ]
    )

    def run(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        tab = b_table.value
        for pdf in it:
            bucket_lists = [
                _py_buckets(t, n_buckets) for t in pdf[text_col]
            ]
            n_grams = np.array(
                [len(bs) for bs in bucket_lists], dtype=np.int64
            )
            flat = np.fromiter(
                (b for bs in bucket_lists for b in bs),
                dtype=np.int64,
                count=int(n_grams.sum()),
            )
            ratios_all = tab[flat]
            starts = np.concatenate(([0], np.cumsum(n_grams)[:-1]))
            nonempty = n_grams > 0
            sums = np.zeros(len(pdf), dtype=np.float64)
            if ratios_all.size:
                # reduceat needs strictly valid offsets; empty docs
                # share their successor's start, so mask them after
                sums[nonempty] = np.add.reduceat(
                    ratios_all, starts[nonempty]
                )
            pdf = pdf[cols].copy()
            pdf["n_grams"] = pd.Series(n_grams, dtype="int64")
            pdf["log_importance_weight"] = pd.Series(
                sums, dtype="float64"
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def importance_weight(
    df: DataFrame,
    model: NgramImportance,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "broadcast",
) -> DataFrame:
    """Score each document's target-likeness under ``model``.  Appends
    (reserved — raises on clash):

    - n_grams: number of hashed features (unigrams + bigrams; 0 for
      empty docs)
    - log_importance_weight: sum of bucket log-ratios (0.0 for empty
      docs — the empty product) — higher = more target-like

    ``mode="broadcast"`` (default; the ratio table is at most
    ``n_buckets`` rows, always collectable) is a pure map stage;
    ``mode="join"`` keeps everything distributed and needs ``id_col``
    to be a unique document key for the per-doc fold.
    """
    _guard_clash(df, "importance_weight")
    if mode == "broadcast":
        return _weight_broadcast(df, model, text_col)
    if mode == "join":
        if id_col not in df.columns:
            raise ValueError(
                f"mode='join' folds per document on id_col={id_col!r}, "
                "which is not a column of the input"
            )
        return _weight_join(df, model, text_col, id_col)
    raise ValueError(f"unknown mode {mode!r} (use 'broadcast' or 'join')")


def gumbel_key(key: Column | str, seed: str = "bzzz") -> Column:
    """Seeded standard-Gumbel draw -ln(-ln(u)) with u from the md5
    prefix of (seed ':' key) — the sampling.py convention, so the draw
    is reproducible across runs, partitionings and cluster sizes, and
    DuckDB replays it as
    -ln(-ln((('0x' || substr(md5(seed || ':' || key), 1, 8))::BIGINT
    + 0.5) / 4294967296.0))."""
    key = F.col(key) if isinstance(key, str) else key
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    n: int,
    weight_col: str = "log_importance_weight",
    id_col: str = "doc_id",
    seed: str = "bzzz",
) -> DataFrame:
    """Gumbel-top-k resampling without replacement: the ``n`` docs with
    the largest ``weight + Gumbel(seed, id)`` keys — equivalent to
    sampling n docs without replacement with probability proportional
    to exp(weight) (the Gumbel-max trick), but deterministic under the
    seed.  orderBy + limit lowers to TakeOrderedAndProject: a bounded
    per-partition top-n and one final merge, never a full sort."""
    key = F.col(weight_col) + gumbel_key(F.col(id_col), seed)
    return (
        df.orderBy(key.desc(), F.col(id_col).asc())
        .limit(int(n))
    )
