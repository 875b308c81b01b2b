"""Sequence packing (functions/packing.py): determinism, the Python
third-engine mirror, and the tiling invariants training code relies on."""

import hashlib

import pytest
from pyspark.sql import functions as F

from bzzz_spark.analysis.tokenizer import py_tokenize
from bzzz_spark.functions.packing import pack_sequences, token_offsets

SEED = "pk"


@pytest.fixture(scope="module")
def docs(spark, small_pdf):
    pdf = small_pdf[["conv_id", "turn_idx", "text"]].copy()
    pdf["doc_id"] = pdf["conv_id"] + ":" + pdf["turn_idx"].astype(str)
    return spark.createDataFrame(pdf[["doc_id", "text"]])


def py_offsets(rows, seed=SEED):
    """Plain-Python mirror: md5-ordered exclusive prefix sum."""
    toks = [
        (r["doc_id"], len(py_tokenize(r["text"])))
        for r in rows
    ]
    toks = [(d, n) for d, n in toks if n > 0]
    keyed = sorted(
        (hashlib.md5(f"{seed}:{d}".encode()).hexdigest(), d, n)
        for d, n in toks
    )
    out, acc = {}, 0
    for _, d, n in keyed:
        out[d] = (acc, n)
        acc += n
    return out


def test_offsets_match_python_mirror(docs):
    got = {
        r["doc_id"]: (r["offset"], r["n_tokens"])
        for r in token_offsets(
            docs, "doc_id", text_col="text", seed=SEED
        ).collect()
    }
    want = py_offsets([r.asDict() for r in docs.collect()])
    assert got == want


def test_offsets_partitioning_invariant(docs):
    a = token_offsets(
        docs.repartition(1), "doc_id", text_col="text", seed=SEED
    )
    b = token_offsets(
        docs.repartition(13), "doc_id", text_col="text", seed=SEED
    )
    ra = sorted((r["doc_id"], r["offset"]) for r in a.collect())
    rb = sorted((r["doc_id"], r["offset"]) for r in b.collect())
    assert ra == rb


def test_offsets_are_a_permutation_of_token_space(docs):
    rows = token_offsets(docs, "doc_id", text_col="text", seed=SEED).collect()
    total = sum(r["n_tokens"] for r in rows)
    spans = sorted((r["offset"], r["offset"] + r["n_tokens"]) for r in rows)
    assert spans[0][0] == 0
    for (_, e0), (s1, _) in zip(spans, spans[1:]):
        assert e0 == s1  # no gaps, no overlap
    assert spans[-1][1] == total


def test_pack_tiling_invariants(docs):
    L = 64
    rows = pack_sequences(
        docs, L, "doc_id", text_col="text", seed=SEED
    ).collect()
    total = sum(
        r["doc_tok_end"] - r["doc_tok_start"] for r in rows
    )
    n_seqs = max(r["seq_id"] for r in rows) + 1
    # every sequence except possibly the last is exactly full
    by_seq: dict = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    assert set(by_seq) == set(range(n_seqs))
    for sid, slices in by_seq.items():
        slices = sorted(slices, key=lambda r: r["seq_tok_start"])
        pos = 0
        for s in slices:
            assert s["seq_tok_start"] == pos
            pos += s["doc_tok_end"] - s["doc_tok_start"]
        if sid < n_seqs - 1:
            assert pos == L
        else:
            assert 0 < pos <= L
    # per-doc slices are contiguous and cover [0, n_tokens)
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, slices in by_doc.items():
        slices = sorted(slices, key=lambda r: r["doc_tok_start"])
        assert slices[0]["doc_tok_start"] == 0
        for a, b in zip(slices, slices[1:]):
            assert a["doc_tok_end"] == b["doc_tok_start"]
            assert b["seq_tok_start"] == 0  # continuation starts a new seq
        assert slices[-1]["doc_tok_end"] == slices[-1]["n_tokens"]
    assert total == sum(
        r["n_tokens"] for r in
        token_offsets(docs, "doc_id", text_col="text", seed=SEED).collect()
    )


def test_pack_respects_precomputed_token_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 0), ("d", 9)], "doc_id string, n int"
    )
    rows = pack_sequences(
        df, 4, "doc_id", tokens_col="n", seed=SEED
    ).collect()
    assert {r["doc_id"] for r in rows} == {"a", "b", "d"}  # c dropped
    assert sum(r["doc_tok_end"] - r["doc_tok_start"] for r in rows) == 17


def test_pack_validates_args(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0, "doc_id", text_col="text")
    with pytest.raises(ValueError):
        token_offsets(docs, "doc_id")
    with pytest.raises(ValueError):
        token_offsets(docs, "doc_id", tokens_col="n", text_col="text")


def test_no_exchange_beyond_bucket_window(docs):
    """Plan shape: the offset computation shuffles ONCE (the bucket
    window); no global single-partition sort sneaks in."""
    plan = token_offsets(
        docs, "doc_id", text_col="text", seed=SEED
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_null_key_raises(spark):
    df = spark.createDataFrame(
        [("a", 5), (None, 3)], "doc_id string, n int"
    )
    with pytest.raises(ValueError, match="NULL"):
        token_offsets(df, "doc_id", tokens_col="n").collect()


def test_duplicate_key_raises(spark):
    """Duplicate keys share one md5 order key → their offsets would be
    partitioning-dependent; the bucket-sums pass detects and raises."""
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("a", 7)], "doc_id string, n int"
    )
    with pytest.raises(ValueError, match="duplicate"):
        token_offsets(df, "doc_id", tokens_col="n").collect()


def test_offsets_read_persisted_slim_frame(docs):
    """The tokenize pass runs ONCE: the window stage's lineage reads
    the persisted slim projection (InMemoryTableScan in the plan), not
    a re-tokenization of the input."""
    out = token_offsets(docs, "doc_id", text_col="text", seed=SEED)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    # NB: no spark.catalog.clearCache() here — it would also drop the
    # session fixtures' persisted id-assignment frames, whose
    # monotonically_increasing_id lineage does NOT recompute
    # deterministically (observed poisoning later tests in-suite)
