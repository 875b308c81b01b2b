"""Deterministic sampling, splitting, mixing and ordering for
training-data pipelines.

Everything here is keyed on md5(seed ':' key) — bit-identical in
Spark, DuckDB and Python — so every decision is:

- reproducible: re-running the pipeline keeps/drops the SAME rows,
  independent of partitioning, task order, or cluster size (a
  `rand()`-based sample is none of these);
- stable under data growth: a doc keeps its sample/split assignment
  when the corpus around it changes (critical for incremental corpus
  builds — yesterday's eval doc never silently migrates into train);
- oracle-checkable: the same arithmetic runs as plain SQL.

Scale shape: each op is one JVM-side hash + filter/orderBy — no
shuffle for sampling/splitting (the filter pushes into the scan), one
range-partition shuffle for the global shuffle (that IS the job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 32 uniform bits from the md5 hex prefix; BUCKETS divides the space so
# rate arithmetic is exact in integers (no float-boundary drift between
# engines).
BUCKETS = 1_000_000


def _bucket_of(key: Column, seed: str) -> Column:
    """THE bucket arithmetic — every sampler routes through here so the
    md5-prefix width / BUCKETS can only ever change in one place."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % BUCKETS
    )


def _bucket_expr(key_col: str, seed: str) -> Column:
    return _bucket_of(F.col(key_col), seed)


def hash_bucket(key: Column | str, seed: str = "bzzz") -> Column:
    """Uniform bucket in [0, BUCKETS) from md5(seed ':' key).

    First 8 hex chars → 32 uniform bits → modulo; identical in DuckDB as
    ('0x' || substr(md5(seed || ':' || key), 1, 8))::BIGINT % BUCKETS.
    """
    return _bucket_of(
        F.col(key) if isinstance(key, str) else key, seed
    ).alias("bucket")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    seed: str = "bzzz",
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows, keyed on key_col.

    Unlike df.sample(), membership is a pure function of (seed, key):
    stable across runs, partitionings and cluster sizes, and the filter
    is a JVM-side expression that pushes into the scan (no shuffle).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(round(rate * BUCKETS))
    return df.filter(_bucket_expr(key_col, seed) < cut)


def assign_split(
    df: DataFrame,
    key_col: str,
    eval_frac: float = 0.01,
    seed: str = "bzzz-split",
    out_col: str = "split",
) -> DataFrame:
    """Label each row 'train' / 'eval' deterministically by key hash.

    The held-out set is a property of the KEY, not of this run: docs
    keep their split when the corpus is rebuilt or extended, which is
    what makes the eval set trustworthy over time.
    """
    if not 0.0 <= eval_frac <= 1.0:
        raise ValueError(f"eval_frac must be in [0, 1], got {eval_frac}")
    if out_col in df.columns:
        raise ValueError(
            f"assign_split would overwrite existing column {out_col!r} — "
            "drop it or pass a different out_col"
        )
    cut = int(round(eval_frac * BUCKETS))
    bucket = _bucket_expr(key_col, seed)
    return df.withColumn(
        out_col, F.when(bucket < cut, F.lit("eval")).otherwise(F.lit("train"))
    )


def mix_corpora(
    sources: list[tuple[DataFrame, str, float]],
    key_col: str = "doc_id",
    seed: str = "bzzz-mix",
    source_col: str = "source_name",
) -> DataFrame:
    """Weighted deterministic corpus mixing: each (df, name, weight)
    contributes a hash_sample at its weight, tagged with `source_col`.

    The standard pretraining-mixture op (sample each source at its
    mixture rate, union, then globally shuffle for training order).
    Weights are per-source KEEP RATES in [0, 1], not relative
    proportions — callers converting token budgets to rates do so
    upstream.  Per-source seeds derive from (seed, name) so re-weighting
    one source never reshuffles another's membership.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    parts = []
    for df, name, weight in sources:
        parts.append(
            hash_sample(df, weight, key_col, seed=f"{seed}:{name}")
            .withColumn(source_col, F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: str = "bzzz-shuffle",
) -> DataFrame:
    """Global pseudo-random training order, reproducible from (seed,
    key): ORDER BY md5(seed ':' key).  One range-partition shuffle —
    that shuffle IS the operation; re-seeding gives an independent
    order.  Ties (duplicate keys) break by the key itself.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    return df.orderBy(h.asc(), F.col(key_col).asc())


def rates_from_token_budgets(
    available_tokens: dict[str, int],
    budget_tokens: dict[str, int],
) -> dict[str, float]:
    """Convert per-source token budgets into the keep-rates
    `mix_corpora` consumes: rate = min(1, budget / available).

    Pure driver-side arithmetic (the dicts come from a token-count agg
    like text.text_profile's n_tokens sum).  A budget above what the
    source holds clips to 1.0 — up-sampling (epochs > 1) is a training
    -loader concern, not a corpus-membership one.
    """
    rates = {}
    for name, budget in budget_tokens.items():
        if name not in available_tokens:
            raise KeyError(f"no token count for source {name!r}")
        avail = available_tokens[name]
        if avail < 0 or budget < 0:
            raise ValueError(f"negative token count for {name!r}")
        rates[name] = 1.0 if avail == 0 else min(1.0, budget / avail)
    return rates


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str,
    key_col: str,
    seed: str = "bzzz-strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each `strat_col` value keeps
    its own rate (e.g. per-language or per-source rates from
    rates_from_token_budgets).  Strata absent from `rates` use
    `default_rate` (0.0 = drop, 1.0 = pass through).

    One JVM-side hash + a CASE over the stratum column — still a pure
    map stage, no shuffle, and membership stays a function of
    (seed, stratum, key): re-tuning one stratum's rate never reshuffles
    another's, and raising a rate only ADDS rows (nested cuts).

    Rows with a NULL stratum are dropped (NULL hashes to NULL, which
    never passes the cut) — filter them up front to treat them
    differently.
    """
    for name, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    cut = F.lit(int(round(default_rate * BUCKETS)))
    for name, rate in rates.items():
        cut = F.when(
            F.col(strat_col) == name, F.lit(int(round(rate * BUCKETS)))
        ).otherwise(cut)
    # per-stratum seed: reusing the stratum value in the hash key keeps
    # the cuts independent across strata even for the same doc key
    bucket = _bucket_of(
        F.concat(F.col(strat_col), F.lit(":"),
                 F.col(key_col).cast("string")),
        seed,
    )
    return df.filter(bucket < cut)
