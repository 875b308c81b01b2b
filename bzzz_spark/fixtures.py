"""Deterministic synthetic transcript corpora (FIXTURES.md §1).

Two generators, both seeded and wall-clock-free:

- :func:`synth_transcripts_pdf` — numpy/pandas, for tiny/small pytest
  corpora with hand-checkable term statistics (the reference's test
  style: exact tf/df assertions, e.g. test/bzzz/core_test.clj:38-75
  where marker terms appear with known frequencies).
- :func:`synth_transcripts_spark` — pure Spark column expressions
  (spark.range → hash-derived values), for bench-scale corpora
  (1–5 M turns) generated distributed with zero driver memory.

Both use a zipfian vocabulary so head-term skew is real (the salting
path gets exercised), plus pinned marker terms and analyzer torture
tokens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = pd.Timestamp("2026-01-01T00:00:00Z").tz_localize(None)  # session TZ = UTC

HEAD_TERMS = [
    "the", "and", "error", "run", "test", "file", "data", "query", "spark",
    "index", "search", "token", "build", "user", "tool", "call", "result",
    "code", "line", "term", "doc", "scan", "join", "sort", "hash", "block",
    "merge", "score", "rank", "shard",
]
MARKERS = ["zzz", "jack", "doe", "anduril", "hello_world"]
TORTURE = [
    "Jack's", "FooBar", "foo-bar", "3.14", "naïve", "日本語", "snake_case",
    "UPPER", "a", "x" * 65,
]
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "bash", "read", ""]
N_BODY_TERMS = 5000


def _zipf_terms(rng: np.random.RandomState, n: int) -> list[str]:
    """n terms with zipf(1.1)-ish skew: head terms dominate."""
    u = rng.random_sample(n)
    # inverse-CDF of p(k) ∝ k^-1.1 over 1..V, cheap approximation
    v = N_BODY_TERMS
    ranks = np.floor(np.power(v, np.power(u, 1.35))).astype(int)
    ranks = np.clip(ranks, 1, v)
    return [
        HEAD_TERMS[r - 1] if r <= len(HEAD_TERMS) else f"tok{r:05d}" for r in ranks
    ]


def synth_transcripts_pdf(
    n_conv: int = 30, seed: int = 42, max_turns: int = 12
) -> pd.DataFrame:
    """Deterministic pandas transcript table (tiny/small scales)."""
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    for c in range(n_conv):
        conv = f"conv{c:06d}"
        for t in range(1 + rng.randint(max_turns)):
            n_tok = 3 + rng.randint(58)
            toks = _zipf_terms(rng, n_tok)
            # pinned markers with knowable df (FIXTURES.md §1)
            if i % 7 == 0:
                toks.append(MARKERS[i % len(MARKERS)])
            if i % 13 == 0:
                toks.append("zzz")
            if i % 17 == 0:
                toks.append(TORTURE[i % len(TORTURE)])
            rows.append(
                (
                    conv,
                    t,
                    ROLES[i % 3],
                    " ".join(toks),
                    TOOLS[i % 4],
                    EPOCH + pd.Timedelta(seconds=i),
                )
            )
            i += 1
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(
        pdf, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )


def synth_transcripts_spark(
    spark: SparkSession, n_turns: int, seed: int = 42, parallelism: int | None = None
) -> DataFrame:
    """Bench-scale transcripts generated fully distributed.

    Every value is a deterministic function of (row id, seed) via
    xxhash64 — no RNG state, no driver memory, embarrassingly parallel.
    ~8 turns/conv; 3–60 zipfian tokens per turn.
    """
    n_part = parallelism or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_turns, 1, n_part)
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))  # noqa: E731
    n_tok = (h("ntok") % 58 + 3).cast("int")
    # token j: u = hash(id, j) ∈ [0,1) → zipf-ish rank = floor(V ** (u ** 1.35));
    # ranks 1..len(HEAD_TERMS) hit the head array, all deeper ranks map to
    # the formatted body token (element len+1 of the lookup array).
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda j: F.element_at(
            F.array(
                *[F.lit(t) for t in HEAD_TERMS],
                F.format_string(
                    "tok%05d",
                    F.least(
                        F.lit(N_BODY_TERMS),
                        F.greatest(
                            F.lit(1),
                            F.floor(
                                F.pow(
                                    F.lit(float(N_BODY_TERMS)),
                                    F.pow(
                                        (
                                            F.abs(
                                                F.xxhash64(
                                                    F.col("id"), F.lit(seed), j
                                                )
                                            )
                                            % 1000000
                                        )
                                        / 1000000.0,
                                        F.lit(1.35),
                                    ),
                                )
                            ).cast("int"),
                        ),
                    ),
                ).alias("body"),
            ),
            F.least(
                F.greatest(
                    F.lit(1),
                    F.floor(
                        F.pow(
                            F.lit(float(N_BODY_TERMS)),
                            F.pow(
                                (
                                    F.abs(F.xxhash64(F.col("id"), F.lit(seed), j))
                                    % 1000000
                                )
                                / 1000000.0,
                                F.lit(1.35),
                            ),
                        )
                    ).cast("int"),
                ),
                F.lit(len(HEAD_TERMS) + 1),
            ).cast("int"),
        ),
    )
    return df.select(
        F.format_string("conv%09d", (F.col("id") / 8).cast("long")).alias("conv_id"),
        (F.col("id") % 8).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(*[F.lit(r) for r in ROLES]), (h("role") % 3 + 1).cast("int")
        ).alias("role"),
        F.array_join(tokens, " ").alias("text"),
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]), (h("tool") % 4 + 1).cast("int")
        ).alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(
            secs=F.col("id").cast("double")
        )).alias("ts"),
    )
