"""DSIR importance weighting (functions/dsir.py) — plain-Python
third-engine parity, mode equality, Gumbel selection determinism, and
guards."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from bzzz_spark.analysis.tokenizer import py_tokenize
from bzzz_spark.functions.dsir import (
    dsir_select,
    gumbel_key,
    importance_weight,
    train_ngram_importance,
)

B = 64  # tiny bucket space so collisions happen in the test


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(i, f"clean prose about data and queries {i % 3}")
         for i in range(8)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(100, "clean prose about data and queries 0"),
         (101, "zz9 qq8 xx7 junk junk junk zz9 qq8"),
         (102, "data queries and clean prose"),
         (103, "solo"),
         (104, ""),
         (105, None)],
        ["doc_id", "text"],
    )
    return target, raw


def _py_model(target_rows, raw_rows, n_buckets, k):
    """Independent plain-Python replica of train + score."""
    def buckets(text):
        ws = py_tokenize(text) if isinstance(text, str) else []
        grams = ws + [a + "\x1f" + b for a, b in zip(ws[:-1], ws[1:])]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
            for g in grams
        ]

    def counts(rows):
        c = {}
        for t in rows:
            for b in buckets(t):
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = counts(target_rows), counts(raw_rows)
    n_t, n_r = sum(ct.values()), sum(cr.values())
    dt, dr = n_t + k * n_buckets, n_r + k * n_buckets

    def ratio(b):
        return (
            math.log((ct.get(b, 0) + k) / dt)
            - math.log((cr.get(b, 0) + k) / dr)
        )

    def score(text):
        bs = buckets(text)
        return len(bs), sum(ratio(b) for b in bs)

    return score


def test_plain_python_parity(spark, corpora):
    target, raw = corpora
    model = train_ngram_importance(target, raw, n_buckets=B, k=0.3)
    score = _py_model(
        [r["text"] for r in target.collect()],
        [r["text"] for r in raw.collect()],
        B, 0.3,
    )
    got = {r["doc_id"]: r for r in
           importance_weight(raw, model, mode="broadcast").collect()}
    for r in raw.collect():
        n, w = score(r["text"])
        assert got[r["doc_id"]]["n_grams"] == n, r
        assert got[r["doc_id"]]["log_importance_weight"] == \
            pytest.approx(w, rel=1e-12), r
    # the target's own docs score higher than junk under the model
    tgt = importance_weight(target, model).collect()
    junk_w = got[101]["log_importance_weight"]
    assert all(r["log_importance_weight"] > junk_w for r in tgt)


def test_mode_equality(spark, corpora):
    target, raw = corpora
    model = train_ngram_importance(target, raw, n_buckets=B, k=0.1)
    a = {r["doc_id"]: r for r in
         importance_weight(raw, model, mode="broadcast").collect()}
    b = {r["doc_id"]: r for r in
         importance_weight(raw, model, mode="join").collect()}
    assert set(a) == set(b)
    for d in a:
        assert a[d]["n_grams"] == b[d]["n_grams"], d
        assert a[d]["log_importance_weight"] == pytest.approx(
            b[d]["log_importance_weight"], rel=1e-12, abs=1e-12
        ), d
    # empty / null docs: 0 grams, weight 0.0 (the empty product)
    for d in (104, 105):
        assert a[d]["n_grams"] == 0
        assert a[d]["log_importance_weight"] == 0.0


def test_gumbel_select_deterministic(spark, corpora):
    target, raw = corpora
    model = train_ngram_importance(target, raw, n_buckets=B, k=0.1)
    scored = importance_weight(raw, model).cache()
    s1 = [r["doc_id"] for r in dsir_select(scored, 3, seed="s1").collect()]
    s1b = [r["doc_id"] for r in
           dsir_select(scored.repartition(7), 3, seed="s1").collect()]
    s2 = [r["doc_id"] for r in dsir_select(scored, 3, seed="s2").collect()]
    assert s1 == s1b  # partitioning-independent
    assert len(s1) == 3 and len(set(s1)) == 3  # without replacement
    # gumbel key replays in plain python
    def py_gumbel(seed, key):
        v = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16)
        return -math.log(-math.log((v + 0.5) / 4294967296.0))

    keyed = scored.select(
        "doc_id",
        (F.col("log_importance_weight")
         + gumbel_key(F.col("doc_id"), "s1")).alias("key"),
    ).collect()
    w = {r["doc_id"]: r for r in scored.collect()}
    for r in keyed:
        expect = (w[r["doc_id"]]["log_importance_weight"]
                  + py_gumbel("s1", r["doc_id"]))
        assert r["key"] == pytest.approx(expect, rel=1e-12)
    want = [d for d, _ in sorted(
        ((r["doc_id"], r["key"]) for r in keyed),
        key=lambda t: (-t[1], t[0]),
    )[:3]]
    assert s1 == want
    assert s1 != s2 or True  # different seeds may coincide on tiny data


def test_select_plan_is_bounded_topk(spark, corpora):
    target, raw = corpora
    model = train_ngram_importance(target, raw, n_buckets=B, k=0.1)
    plan = dsir_select(
        importance_weight(raw, model), 2
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_guards(spark, corpora):
    target, raw = corpora
    with pytest.raises(ValueError, match="k > 0"):
        train_ngram_importance(target, raw, k=0.0)
    with pytest.raises(ValueError, match="n_buckets"):
        train_ngram_importance(target, raw, n_buckets=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        train_ngram_importance(empty, raw, n_buckets=B)
    model = train_ngram_importance(target, raw, n_buckets=B)
    clash = raw.withColumn("n_grams", F.lit(1))
    with pytest.raises(ValueError, match="n_grams"):
        importance_weight(clash, model)
    with pytest.raises(ValueError, match="id_col"):
        importance_weight(raw.drop("doc_id"), model, mode="join")
    with pytest.raises(ValueError, match="unknown mode"):
        importance_weight(raw, model, mode="nope")
