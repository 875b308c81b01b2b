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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — deterministic, partition-independent."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def synth_transcripts_spark(
    spark: SparkSession, n_turns: int, seed: int = 42, parallelism: int | None = None
) -> DataFrame:
    """Bench-scale transcripts generated fully distributed.

    Every value is a deterministic function of (row id, seed) via a
    vectorized splitmix64 inside mapInPandas — no RNG state, no driver
    memory, embarrassingly parallel, identical output under any
    partitioning.  ~8 turns/conv; 3–60 zipfian tokens per turn.
    (An earlier all-column-expression version was ~10× slower: the
    per-token 31-literal array build never constant-folds inside a
    higher-order-function lambda.)
    """
    import pandas as pd  # noqa: F811 (module-level import exists)

    n_part = parallelism or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_turns, 1, n_part)
    v = N_BODY_TERMS
    # rank → token string lookup (rank 1..len(HEAD) = head terms)
    tbl = np.array(
        ["", *HEAD_TERMS]
        + [f"tok{r:05d}" for r in range(len(HEAD_TERMS) + 1, v + 1)],
        dtype=object,
    )
    roles = np.array(ROLES, dtype=object)
    tools = np.array(TOOLS, dtype=object)
    seed64 = np.uint64(seed * 0x9E3779B9)

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            n = len(ids)
            with np.errstate(over="ignore"):
                n_tok = (
                    _splitmix64(ids * np.uint64(31) + seed64) % np.uint64(58)
                ).astype(np.int64) + 3
                offsets = np.concatenate(([0], np.cumsum(n_tok)))
                total = int(offsets[-1])
                rep_ids = np.repeat(ids, n_tok)
                j = (np.arange(total, dtype=np.uint64)
                     - np.repeat(offsets[:-1].astype(np.uint64), n_tok))
                hv = _splitmix64(rep_ids * np.uint64(1000003) + j + seed64)
            u = (hv % np.uint64(1000000)).astype(np.float64) / 1e6
            ranks = np.clip(
                np.floor(np.power(float(v), np.power(u, 1.35))).astype(np.int64),
                1, v,
            )
            toks = tbl[ranks]
            texts = [
                " ".join(toks[offsets[i]:offsets[i + 1]]) for i in range(n)
            ]
            yield pd.DataFrame(
                {
                    "conv_id": [f"conv{int(i) >> 3:09d}" for i in ids],
                    "turn_idx": (ids % np.uint64(8)).astype(np.int32),
                    "role": roles[
                        (_splitmix64(ids + np.uint64(7)) % np.uint64(3)).astype(int)
                    ],
                    "text": texts,
                    "tool": tools[
                        (_splitmix64(ids + np.uint64(13)) % np.uint64(4)).astype(int)
                    ],
                    "ts": pd.Timestamp("2026-01-01")
                    + pd.to_timedelta(ids.astype(np.int64), unit="s"),
                }
            )

    return df.mapInPandas(
        gen,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
