"""Deterministic distributed sequence packing (concat-and-chunk).

LLM pre-training consumes fixed-length token sequences, not documents:
the standard pipeline (GPT-2/3, Llama, Pythia) concatenates the
shuffled corpus into one token stream and slices it every `seq_len`
tokens, so a document may span two (or more) sequences and a sequence
may hold many documents.  At 100 TB the hard part is the GLOBAL
exclusive prefix-sum of token counts over a deterministic corpus
order — a naive `Window.orderBy` with no partition key serializes the
corpus through ONE task.  This module computes it with the classic
two-level scan:

  1. order key   = md5(seed ':' doc_key)  (the same engine-portable
     arithmetic as functions/sampling.py — reproducible across runs,
     partitionings and cluster sizes, and replayable in DuckDB);
  2. bucket      = first 4 hex chars of the key (65 536 uniform
     buckets; ordering by (bucket, key) == ordering by key since the
     bucket IS the key's prefix);
  3. bucket sums = one partial-aggregatable groupBy (65 536 rows),
     collected to the driver, prefix-summed there, broadcast back;
  4. offset      = bucket base + within-bucket running sum
     (`Window.partitionBy(bucket)` — 65 536-way parallel, one shuffle).

Every output value is a pure function of (seed, doc_key, n_tokens), so
packing is reproducible and incremental re-runs place unchanged docs
at unchanged offsets as long as the corpus set is unchanged.

Scale shape: the corpus is scanned + tokenized ONCE into a slim
persisted projection (key, n_tokens, bucket, okey — ~50 B/doc); the
bucket-sums collect materializes the cache, and both the groupBy agg
and the 65 536-way window read the cached slim rows, so the window
shuffle moves ~50 B/doc, not full documents.  Offsets then join back
to the input on key_col (one hash-join shuffle) — strictly cheaper at
scale than the previous shape, which tokenized twice AND windowed the
full-width rows.  No Python, no driver data beyond the 65 536 bucket
sums.  The slim cache is left persisted (MEMORY_AND_DISK, evictable)
because the returned DataFrame's lineage reads it; callers that are
done with the result may `spark.catalog.clearCache()`.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bzzz_spark.analysis.tokenizer import standard_tokenize

_B = "__bzzz_pack_bucket"
_K = "__bzzz_pack_okey"
_BASE = "__bzzz_pack_base"

# 4 hex chars = 65 536 buckets: small enough that the per-bucket sums
# are a trivial driver collect, large enough that a 10^12-doc corpus
# still puts only ~10^7 rows through any single window partition.
_BUCKET_HEX = 4


def _with_order_key(df: DataFrame, key_col: str, seed: str) -> DataFrame:
    okey = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    )
    return df.withColumn(_K, okey).withColumn(
        _B, F.conv(F.substring(F.col(_K), 1, _BUCKET_HEX), 16, 10).cast("long")
    )


def token_offsets(
    df: DataFrame,
    key_col: str,
    tokens_col: str | None = None,
    text_col: str | None = None,
    seed: str = "bzzz",
) -> DataFrame:
    """Add a global, deterministic, exclusive token-offset column.

    Docs are ordered by md5(seed ':' key) (a reproducible global
    shuffle); `offset` is the number of tokens in all docs strictly
    before this one in that order.  Exactly one of tokens_col /
    text_col must name the token count source (text_col counts via the
    engine's standard tokenizer, JVM-side).  Zero-token docs are
    dropped — they occupy no space in the packed stream.

    key_col must be unique and non-NULL: duplicate keys share one md5
    order key, so their relative order (hence their offsets) would be
    partitioning-dependent — both conditions are detected in the same
    bucket-sums pass and raise, rather than silently breaking the
    determinism contract.

    Output: input columns (any pre-existing n_tokens/offset replaced)
    + n_tokens + offset (long).
    """
    if (tokens_col is None) == (text_col is None):
        raise ValueError("pass exactly one of tokens_col / text_col")
    n = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else F.size(standard_tokenize(F.col(text_col))).cast("long")
    )
    # ONE scan+tokenize of the corpus: the slim (key, n_tokens, bucket,
    # okey) projection is persisted; the bucket-sums collect below
    # materializes it, and the window stage reuses the cached rows
    slim = _with_order_key(
        df.select(F.col(key_col), n.alias("n_tokens")).filter(
            F.col("n_tokens") > 0
        ),
        key_col,
        seed,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stats = slim.groupBy(_B).agg(
        F.sum("n_tokens").alias("s"),
        F.count(F.lit(1)).alias("c"),
        F.countDistinct(key_col).alias("cd"),
    ).collect()
    sums = {r[_B]: r["s"] for r in stats}
    if None in sums:
        slim.unpersist()  # don't leak the cache on the error path
        raise ValueError(
            f"packing key column {key_col!r} contains NULLs — a null key "
            "has no deterministic position in the packed order"
        )
    if any(r["c"] != r["cd"] for r in stats):
        slim.unpersist()
        raise ValueError(
            f"packing key column {key_col!r} contains duplicates — "
            "duplicate keys share one md5 order key, so their packed "
            "offsets would be partitioning-dependent; deduplicate or "
            "pick a unique key"
        )
    acc = 0
    bases = []
    for b in sorted(sums):
        bases.append((b, acc))
        acc += sums[b]
    spark = df.sparkSession
    base_df = F.broadcast(
        spark.createDataFrame(bases, schema=f"{_B} long, {_BASE} long")
    )
    w = (
        Window.partitionBy(_B)
        .orderBy(_K, F.col(key_col).cast("string"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        slim.join(base_df, _B, "left")
        .withColumn(
            "offset",
            F.col(_BASE) + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .select(key_col, "n_tokens", "offset")
    )
    return df.drop("n_tokens", "offset").join(offs, key_col, "inner")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    key_col: str,
    tokens_col: str | None = None,
    text_col: str | None = None,
    seed: str = "bzzz",
) -> DataFrame:
    """Concat-and-chunk packing: map each doc onto fixed-length
    training sequences.

    Returns one row per (sequence, doc-slice): a doc whose token span
    [offset, offset + n_tokens) crosses sequence boundaries emits one
    row per sequence it touches.

    Output columns:
      seq_id         sequence index (floor(token_pos / seq_len))
      <key_col>      the doc key
      n_tokens       doc token count
      offset         the doc's global start offset (token space)
      doc_tok_start  first token of the doc inside this sequence
      doc_tok_end    one past the last token (doc-relative)
      seq_tok_start  where the slice begins inside the sequence

    Invariants (pinned in tests): slices of one doc are contiguous and
    cover [0, n_tokens); every sequence except the last holds exactly
    seq_len tokens; a sequence's slices tile [0, seq_len) with no gaps
    or overlap.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    off = token_offsets(
        df, key_col, tokens_col=tokens_col, text_col=text_col, seed=seed
    )
    L = F.lit(int(seq_len)).cast("long")
    # integer division (`div`), not floor(double division): exact at
    # any offset, matching the oracle's `//` with no float caveat
    first = F.expr(f"offset div {int(seq_len)}")
    last = F.expr(f"(offset + n_tokens - 1) div {int(seq_len)}")
    out = off.withColumn(
        "seq_id", F.explode(F.sequence(first, last))
    )
    return out.select(
        "seq_id",
        key_col,
        "n_tokens",
        "offset",
        F.greatest(F.lit(0).cast("long"), F.col("seq_id") * L - F.col("offset"))
        .alias("doc_tok_start"),
        F.least(
            F.col("n_tokens"),
            (F.col("seq_id") + 1) * L - F.col("offset"),
        ).alias("doc_tok_end"),
        F.greatest(F.lit(0).cast("long"), F.col("offset") - F.col("seq_id") * L)
        .alias("seq_tok_start"),
    )
