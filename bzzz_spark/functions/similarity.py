"""Embedding similarity search over array<float> columns.

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Query vectors are broadcast; the dot product is a JVM-side
  F.aggregate/F.zip_with fold (no Python in the scan).
- ivf_topk: the scale path — IVF-style bucketing.  Deterministic
  centroids (seeded numpy, no wall clock), assignment + probing as
  Arrow-batched numpy matmuls.  At 100 TB the brute-force scan reads
  everything per query; IVF prunes to nprobe/nlist of the corpus, and
  the centroid assignment is a one-off narrow pass.
- cosine_near_dup_pairs: embedding near-duplicate detection (cos ≥ τ)
  via the same IVF buckets (candidate pairs only within a bucket).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos_col(vec_col, qlit) -> "F.Column":
    """Cosine similarity between an array<float> column and a literal
    query array, entirely JVM-side."""
    dot = F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    n2 = F.sqrt(
        F.aggregate(
            qlit, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return dot / (n1 * n2)


def brute_force_topk(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, vec_id, cos) with rank ≤ k per query, ties broken
    by vec_id — deterministic, oracle-comparable.  One scan of the
    corpus serves ALL queries (the per-query cosine columns are computed
    in the same codegen stage)."""
    scored = None
    for qid, qv in queries:
        qlit = F.array(*[F.lit(float(x)) for x in qv])
        part = embeddings.select(
            F.lit(qid).alias("query_id"),
            F.col(id_col).alias("vec_id"),
            F.round(_cos_col(F.col(vec_col), qlit), 6).alias("cos"),
        )
        scored = part if scored is None else scored.unionByName(part)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def make_centroids(dim: int, nlist: int, seed: int = 42) -> np.ndarray:
    """Deterministic unit-norm RANDOM centroids — the data-independent
    fallback.  Random centroids bucket arbitrarily, so recall at
    nprobe << nlist is poor on clustered data; prefer
    :func:`train_centroids` (the ivf_topk default)."""
    rng = np.random.RandomState(seed)
    c = rng.standard_normal((nlist, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_centroids(
    embeddings: DataFrame,
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 65536,
    iters: int = 12,
) -> np.ndarray:
    """Deterministic sampled spherical k-means → unit-norm centroids.

    Scale shape: ONE narrow scan collects a bounded deterministic sample
    (rows ordered by xxhash64 of the id — stable across partitionings),
    then Lloyd iterations run as numpy matmuls on the driver.  At 100 TB
    the sample stays 64k rows regardless of corpus size; assignment of
    the full corpus stays distributed (assign_buckets).  Seeded and
    wall-clock-free → the same table always trains the same centroids,
    so bucket assignments are reproducible across jobs (required for
    partition-pruned IVF tables)."""
    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(int(sample_size))
        .collect()
    )
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms
    rng = np.random.RandomState(seed)
    n = X.shape[0]
    if n <= nlist:
        pad = make_centroids(X.shape[1], nlist - n, seed)
        return np.vstack([X, pad]) if n else pad
    cents = X[rng.choice(n, size=nlist, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ cents.T).argmax(axis=1)
        for k in range(nlist):
            members = X[assign == k]
            if len(members) == 0:
                # empty cluster: reseed from the globally worst-served
                # point (deterministic)
                worst = (X @ cents.T).max(axis=1).argmin()
                cents[k] = X[worst]
                continue
            m = members.sum(axis=0)
            nm = np.linalg.norm(m)
            cents[k] = m / nm if nm > 0 else cents[k]
    return cents


def assign_buckets(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket, embedding) — nearest centroid by cosine, computed
    as one numpy matmul per Arrow batch."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (m / norms) @ cents.T
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["bucket"] = sims.argmax(axis=1).astype(np.int32)
            yield pdf

    return embeddings.mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} array<float>, bucket int"
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train: bool = True,
) -> DataFrame:
    """Approximate top-k: scan only the nprobe nearest buckets per query.

    The bucket filter prunes the scan to ~nprobe/nlist of the corpus —
    at scale, write the bucketed table partitioned by bucket and the
    filter becomes partition pruning (zero I/O for unprobed buckets).
    Centroids are k-means-trained on a deterministic sample by default
    (train=False falls back to seeded random — fine only when
    nprobe == nlist, i.e. exact mode)."""
    dim = len(queries[0][1])
    cents = (
        train_centroids(embeddings, nlist, id_col, vec_col, seed)
        if train
        else make_centroids(dim, nlist, seed)
    )
    bucketed = assign_buckets(embeddings, cents, id_col, vec_col)
    out = None
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        probes = np.argsort(-(cents @ qn))[:nprobe].tolist()
        qlit = F.array(*[F.lit(float(x)) for x in qv])
        part = (
            bucketed.filter(F.col("bucket").isin(probes))
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("vec_id"),
                F.round(_cos_col(F.col(vec_col), qlit), 6).alias("cos"),
            )
        )
        out = part if out is None else out.unionByName(part)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train: bool = True,
) -> DataFrame:
    """Embedding near-dup pairs (cos ≥ threshold), candidates restricted
    to IVF-bucket cohabitants (no all-pairs product at scale).  Trained
    centroids put near-duplicates in the same bucket far more reliably
    than random ones (near-dups are by definition in dense regions)."""
    dim = len(embeddings.select(vec_col).first()[0])
    cents = (
        train_centroids(embeddings, nlist, id_col, vec_col, seed)
        if train and nlist > 1
        else make_centroids(dim, nlist, seed)
    )
    bucketed = assign_buckets(embeddings, cents, id_col, vec_col)
    a = bucketed.select(
        "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = bucketed.select(
        "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
