"""Bigram-LM perplexity scoring (functions/lm.py) — hand-checked
probabilities, count-cutoff pruning, mode equality, and guards."""

import math

import pytest
from pyspark.sql import functions as F

from bzzz_spark.functions.lm import perplexity, train_bigram_lm


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "solo"), (4, "")],
        ["doc_id", "text"],
    )


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_hand_checked_probabilities(spark, tiny):
    # corpus tokens: doc1 a,b,a  doc2 b,a  doc3 solo  doc4 (none)
    # uni: a=3 b=2 solo=1 -> V=3;  bi: (a,b)=1 (b,a)=2
    lm = train_bigram_lm(tiny, k=0.5, min_count=1)
    assert lm.vocab_size == 3
    rows = _by_id(perplexity(tiny, lm, mode="join"))
    kv = 0.5 * 3
    lp_ab = math.log((1 + 0.5) / (3 + kv))  # P(b|a)
    lp_ba = math.log((2 + 0.5) / (2 + kv))  # P(a|b)
    exp1 = (lp_ab + lp_ba) / 2
    assert rows[1]["n_scored_bigrams"] == 2
    assert rows[1]["logprob_per_token"] == pytest.approx(exp1)
    assert rows[1]["perplexity"] == pytest.approx(math.exp(-exp1))
    assert rows[2]["n_scored_bigrams"] == 1
    assert rows[2]["logprob_per_token"] == pytest.approx(lp_ba)
    # < 2 tokens: nothing to score
    for d in (3, 4):
        assert rows[d]["n_scored_bigrams"] == 0
        assert rows[d]["logprob_per_token"] is None
        assert rows[d]["perplexity"] is None


def test_min_count_prunes_bigrams_to_unseen(spark, tiny):
    # min_count=2 drops (a,b); it scores with c_bi = 0
    lm = train_bigram_lm(tiny, k=0.5, min_count=2)
    assert lm.bigrams.count() == 1  # only (b,a)
    rows = _by_id(perplexity(tiny, lm, mode="join"))
    kv = 0.5 * 3
    lp_ab = math.log(0.5 / (3 + kv))
    lp_ba = math.log((2 + 0.5) / (2 + kv))
    assert rows[1]["logprob_per_token"] == pytest.approx((lp_ab + lp_ba) / 2)


def test_unseen_history_scores_uniform(spark, tiny):
    # cross-corpus scoring: a doc whose history word the LM never saw
    lm = train_bigram_lm(tiny, k=0.5)
    other = spark.createDataFrame([(9, "zz qq")], ["doc_id", "text"])
    rows = _by_id(perplexity(other, lm, mode="join"))
    # c_bi = c_uni = 0 -> P = k / (k*V) = 1/V
    assert rows[9]["logprob_per_token"] == pytest.approx(math.log(1 / 3))


def test_broadcast_mode_matches_join(spark):
    import random

    rnd = random.Random(7)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "x1", "y2"]
    docs = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(0, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    lm = train_bigram_lm(df, k=0.25, min_count=2)
    a = _by_id(perplexity(df, lm, mode="join"))
    b = _by_id(perplexity(df, lm, mode="broadcast"))
    assert set(a) == set(b)
    for d in a:
        assert a[d]["n_scored_bigrams"] == b[d]["n_scored_bigrams"]
        if a[d]["logprob_per_token"] is None:
            assert b[d]["logprob_per_token"] is None
        else:
            assert a[d]["logprob_per_token"] == pytest.approx(
                b[d]["logprob_per_token"], abs=1e-12
            )


def test_lower_perplexity_for_natural_text(spark):
    # the filter signal: text drawn from the training corpus scores
    # lower ppl than shuffled junk over a held-out alphabet
    base = [(i, "the cat sat on the mat and the dog ran") for i in range(20)]
    df = spark.createDataFrame(base, ["doc_id", "text"])
    lm = train_bigram_lm(df, k=0.1)
    probe = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the ran cat dog sat on")],
        ["doc_id", "text"],
    )
    rows = _by_id(perplexity(probe, lm, mode="join"))
    assert rows[1]["perplexity"] < rows[2]["perplexity"]


def test_guards(spark, tiny):
    lm = train_bigram_lm(tiny, k=0.5)
    with pytest.raises(ValueError, match="reserved|already exist"):
        perplexity(tiny.withColumn("perplexity", F.lit(1.0)), lm)
    with pytest.raises(ValueError, match="id_col"):
        perplexity(tiny.withColumnRenamed("doc_id", "other"), lm)
    with pytest.raises(ValueError, match="unknown mode"):
        perplexity(tiny, lm, mode="nope")
    with pytest.raises(ValueError, match="k > 0"):
        train_bigram_lm(tiny, k=0.0)
    with pytest.raises(ValueError, match="empty corpus"):
        train_bigram_lm(
            spark.createDataFrame([], "doc_id long, text string")
        )
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        perplexity(tiny, lm, mode="broadcast", max_broadcast_rows=2)


def test_composes_with_cleaning(spark, tiny):
    # pipeline shape: clean -> score -> filter, one logical plan
    from bzzz_spark.functions.cleaning import gopher_flags

    lm = train_bigram_lm(tiny, k=0.5)
    out = perplexity(gopher_flags(tiny), lm, mode="join")
    got = out.filter(F.col("n_scored_bigrams") > 0).count()
    assert got == 2
