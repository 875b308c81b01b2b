"""Payload tokenizers + payload-scored queries (reference test style:
byte-level payload assertions, term_payload_clj_score_test.clj:152-185;
FBA bucket counts :127-150; code-tokenizer line bitmaps)."""

import pandas as pd

from bzzz_spark.analysis.payloads import (
    bitmap_decode,
    bitmap_encode,
    byte_payload_tokenize,
    code_tokenize,
    delimited_payload_tokenize,
    payload_score_search,
    py_code_tokenize,
)


def _df(spark, rows, schema="docid long, text string"):
    return spark.createDataFrame(rows, schema)


def test_bitmap_roundtrip():
    for s in [set(), {0}, {7}, {8}, {0, 1, 2, 63, 64, 200}]:
        assert bitmap_decode(bitmap_encode(s)) == s


def test_code_tokenizer_lines_and_dedup():
    text = "foo = bar(1)\nfoo += 2\n   baz(foo)"
    toks = py_code_tokenize(text)
    assert toks["foo"] == {0, 1, 2}  # deduped, all lines recorded
    assert toks["bar"] == {0}
    assert toks["baz"] == {2}
    assert toks["="] == {0, 1}  # '=' on lines 0 and 1 ('+=' is two runs)
    assert toks["+"] == {1}


def test_code_tokenizer_symbol_runs():
    toks = py_code_tokenize("a === b !! c")
    assert "===" in toks and "!!" in toks


def test_code_tokenizer_length_bound():
    toks = py_code_tokenize("x" * 65 + " ok")
    assert ("x" * 65).lower() not in toks
    assert "ok" in toks


def test_code_tokenize_df(spark):
    df = _df(spark, [(1, "foo bar\nfoo")])
    rows = {r["term"]: r for r in code_tokenize(df).collect()}
    assert bitmap_decode(bytes(rows["foo"]["payloads"][0])) == {0, 1}
    assert bitmap_decode(bytes(rows["bar"]["payloads"][0])) == {0}


def test_byte_payload_exact_bytes(spark):
    # reference: hex payload bytes asserted one by one
    # (term_payload_clj_score_test.clj:158-185)
    df = _df(spark, [(1, "jack|ff00aa doe|0102 jack|bb")])
    rows = {r["term"]: r for r in byte_payload_tokenize(df).collect()}
    assert [bytes(p) for p in rows["jack"]["payloads"]] == [
        b"\xff\x00\xaa", b"\xbb"
    ]
    assert [bytes(p) for p in rows["doe"]["payloads"]] == [b"\x01\x02"]


def test_delimited_payload_int(spark):
    df = _df(spark, [(1, "zzz|5 zzz|100000 yyy|1")])
    rows = {r["term"]: r for r in delimited_payload_tokenize(df).collect()}
    vals = [int.from_bytes(bytes(p), "big") for p in rows["zzz"]["payloads"]]
    assert vals == [5, 100000]


def test_payload_score_search_and_fba(spark):
    docs = _df(
        spark,
        [(i, f"marker|{i:02x} filler|00") for i in range(1, 9)],
    )
    payloads = byte_payload_tokenize(docs).cache()
    doc_table = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "docid long, weight long"
    )

    def score(ctx):
        # score = first payload's big-endian int + weight doc value
        return int.from_bytes(bytes(ctx["payloads"][0]), "big") + ctx["weight"]

    hits, buckets = payload_score_search(
        payloads, doc_table, "marker", score,
        doc_value_cols=["weight"], size=3,
        bucket_fn=lambda ctx: int(ctx["docid"] % 2), n_buckets=4,
    )
    got = [(r["docid"], r["score"]) for r in hits.collect()]
    assert got == [(8, 88.0), (7, 77.0), (6, 66.0)]
    bk = {r["bucket"]: r["cnt"] for r in buckets.collect()}
    assert bk == {0: 4, 1: 4}  # 8 docs, docid parity buckets


def test_payload_no_zero(spark):
    docs = _df(spark, [(1, "m|00"), (2, "m|07")])
    payloads = byte_payload_tokenize(docs)
    doc_table = spark.createDataFrame([(1,), (2,)], "docid long")
    hits, _ = payload_score_search(
        payloads, doc_table, "m",
        lambda ctx: int.from_bytes(bytes(ctx["payloads"][0]), "big"),
        size=10, no_zero=True,
    )
    assert [r["docid"] for r in hits.collect()] == [2]


def test_payload_state_broadcast(spark):
    """Q17 read-only global state (reference EXPR_GLOBAL_STATE_RO,
    src/bzzz/state.clj:11-89; test shapes at
    test/bzzz/term_payload_clj_score_test.clj:59-150): the scoring fn
    reads a broadcast dict, identically on every executor."""
    docs = _df(spark, [(i, f"m|{i:02x}") for i in range(1, 5)])
    payloads = byte_payload_tokenize(docs)

    def score(ctx, state):
        v = int.from_bytes(bytes(ctx["payloads"][0]), "big")
        return v * state["mult"] + state["offsets"]["all"]

    hits, _ = payload_score_search(
        payloads, None, "m", score,
        state={"mult": 10.0, "offsets": {"all": 0.5}}, size=10,
    )
    got = [(r["docid"], r["score"]) for r in hits.collect()]
    assert got == [(4, 40.5), (3, 30.5), (2, 20.5), (1, 10.5)]


def test_payload_result_state_columns(spark):
    """R4 result-state: extra per-doc values from the scorer returned
    with the hits (reference ExpressionContext.java:196-208)."""
    docs = _df(spark, [(i, f"m|{i:02x}") for i in range(1, 5)])
    payloads = byte_payload_tokenize(docs)

    def pay(ctx):
        return int.from_bytes(bytes(ctx["payloads"][0]), "big")

    hits, _ = payload_score_search(
        payloads, None, "m", lambda c: float(pay(c)),
        result_fields={
            "parity": lambda c: pay(c) % 2,
            "tag": lambda c: f"v{pay(c)}",
        },
        result_schema="parity int, tag string",
        size=2,
    )
    rows = hits.collect()
    assert [(r["docid"], r["score"], r["parity"], r["tag"]) for r in rows] == [
        (4, 4.0, 0, "v4"), (3, 3.0, 1, "v3")
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="go together"):
        payload_score_search(
            payloads, None, "m", lambda c: 1.0,
            result_fields={"x": lambda c: 1},
        )
