"""Payload-emitting tokenizers + payload-scored queries (A7-A9, Q17, F3).

The reference attaches per-position byte payloads to terms and scores
them with eval'd Clojure closures over an ExpressionContext exposing
payloads, FieldCache doc values, collection stats and bucket
aggregation (reference: src/java/bzzz/java/analysis/CodeTokenizer.java:15-108,
BytePayloadTokenizer.java:13-92, src/bzzz/analyzer.clj:84-86,
TermPayloadClojureScoreQuery.java:21-310).  That surface is an
intentional RCE ("user input here simply leads to RCE",
reference example/app.rb:274); our rebuild supports the *deterministic
subset* with **registered Python functions, never eval of user
strings**, and stores payloads in a dedicated DataFrame:

  payload_postings(docid long, term string, payloads array<binary>)

one array element per token position, exactly the reference's
per-position payload model.  Scoring = Arrow-batched pandas UDF over
(docid, payloads, doc values); fixed-bucket aggregation (F3) =
groupBy(bucket).count() over the scored rows.

Deviation pinned here: the code tokenizer's line sets are plain
little-endian bitset bytes, not EWAH-compressed (reference uses
com.googlecode.javaewah — compression is an encoding detail; the
semantics, a set of line numbers per (term, doc), are identical).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = "docid long, term string, payloads array<binary>"

# CodeTokenizer: identifier runs and same-symbol runs, per line, length
# bounds (reference: CodeTokenizer.java:16-17 MIN=1/MAX=64, :28-108)
_CODE_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|(.)\1*", re.DOTALL)
_MAX_CODE_TOKEN = 64


def bitmap_encode(lines: set[int]) -> bytes:
    """Line-number set → little-endian bitset bytes."""
    if not lines:
        return b""
    arr = np.zeros((max(lines) // 8) + 1, dtype=np.uint8)
    for ln in lines:
        arr[ln // 8] |= 1 << (ln % 8)
    return arr.tobytes()


def bitmap_decode(b: bytes) -> set[int]:
    arr = np.frombuffer(b, dtype=np.uint8)
    out = set()
    for i in np.flatnonzero(arr):
        v = int(arr[i])
        for bit in range(8):
            if v & (1 << bit):
                out.add(i * 8 + bit)
    return out


def py_code_tokenize(text: str) -> dict[str, set[int]]:
    """term → set of line numbers (deduped within doc), the reference's
    CodeTokenizer semantics: identifiers + repeated-symbol runs per
    line, whitespace skipped, length-bounded."""
    out: dict[str, set[int]] = {}
    for line_no, line in enumerate((text or "").split("\n")):
        for m in _CODE_TOKEN_RE.finditer(line):
            tok = m.group()
            if not tok.strip() or len(tok) > _MAX_CODE_TOKEN:
                continue
            out.setdefault(tok.lower(), set()).add(line_no)
    return out


def code_tokenize(df: DataFrame, text_col: str = "text",
                  id_col: str = "docid") -> DataFrame:
    """(docid, term, payloads=[line_bitmap]) — A7."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, terms, pays = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                for term, lines in py_code_tokenize(text).items():
                    ids.append(i)
                    terms.append(term)
                    pays.append([bitmap_encode(lines)])
            yield pd.DataFrame({"docid": ids, "term": terms, "payloads": pays})

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def byte_payload_tokenize(df: DataFrame, text_col: str = "text",
                          id_col: str = "docid") -> DataFrame:
    """'term|hexbytes' pairs → per-position raw byte payloads — A8
    (reference BytePayloadTokenizer.java:40-91)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[tuple, list] = {}
            for i, text in zip(pdf[id_col], pdf[text_col]):
                for pair in (text or "").split():
                    term, _, hexpart = pair.partition("|")
                    payload = bytes.fromhex(hexpart) if hexpart else b""
                    rows.setdefault((i, term), []).append(payload)
            yield pd.DataFrame(
                {
                    "docid": [k[0] for k in rows],
                    "term": [k[1] for k in rows],
                    "payloads": list(rows.values()),
                }
            )

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def delimited_payload_tokenize(df: DataFrame, text_col: str = "text",
                               id_col: str = "docid") -> DataFrame:
    """'term|int' pairs → 4-byte big-endian int payloads — A9
    (reference analyzer.clj:84-86 uses Lucene's IntegerEncoder)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[tuple, list] = {}
            for i, text in zip(pdf[id_col], pdf[text_col]):
                for pair in (text or "").split():
                    term, _, num = pair.partition("|")
                    payload = int(num).to_bytes(4, "big") if num else b""
                    rows.setdefault((i, term), []).append(payload)
            yield pd.DataFrame(
                {
                    "docid": [k[0] for k in rows],
                    "term": [k[1] for k in rows],
                    "payloads": list(rows.values()),
                }
            )

    return df.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def payload_score_search(
    payload_postings: DataFrame,
    docs: DataFrame,
    term: str,
    score_fn: Callable[..., float],
    doc_value_cols: list[str] | None = None,
    size: int = 20,
    no_zero: bool = False,
    bucket_fn: Callable[[dict], int] | None = None,
    n_buckets: int = 0,
    state: dict | None = None,
    result_fields: dict[str, Callable[[dict], object]] | None = None,
    result_schema: str = "",
):
    """Q17's deterministic subset: a REGISTERED Python scoring function
    over per-doc context {docid, payloads, <doc value cols>}, plus
    optional fixed-bucket aggregation (F3).

    ``state`` is the reference's read-only global state
    (EXPR_GLOBAL_STATE_RO pushed via /_state and read from scoring
    closures — src/bzzz/state.clj:11-89,
    TermPayloadClojureScoreQuery.java:25-28): a dict broadcast to every
    executor; when given, score_fn is called as score_fn(ctx, state).
    Mutable cross-doc state is intentionally NOT replicated (the
    reference marks its engine NOT THREAD SAFE; order-dependent state is
    non-reproducible by construction).

    ``result_fields`` + ``result_schema`` are the reference's
    result-state: extra per-doc values emitted from the scorer and
    returned with the hits (ExpressionContext.java:196-208,
    query.clj:59-68).  Each named callable maps ctx → value; the schema
    string types the extra columns (e.g. "pay_mod int, tag string").

    Prefer vectorized score_fns operating on whole batches where
    possible; the row loop here is the compatibility hook for arbitrary
    per-doc closures, not the engine's hot path.

    Returns (hits_df, buckets_df_or_None): hits = top `size`
    (score desc, docid asc) with any result-state columns; buckets =
    (bucket, cnt) counts over ALL matched docs (reference: int-array
    buckets filled from the scoring closure,
    TermPayloadClojureScoreQuery.java:65-127).
    """
    dvc = doc_value_cols or []
    rfs = result_fields or {}
    if bool(rfs) != bool(result_schema):
        raise ValueError("result_fields and result_schema go together")
    cand = payload_postings.filter(F.col("term") == term)
    if dvc:
        cand = cand.join(docs.select("docid", *dvc), "docid")

    out_schema = "docid long, score double"
    if bucket_fn:
        out_schema += ", bucket int"
    if result_schema:
        out_schema += ", " + result_schema

    bc_state = (
        payload_postings.sparkSession.sparkContext.broadcast(state)
        if state is not None
        else None
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = bc_state.value if bc_state is not None else None
        score = (
            (lambda c: score_fn(c, st)) if st is not None else score_fn
        )
        for pdf in it:
            ctxs = pdf.to_dict("records")
            out = {
                "docid": pdf["docid"],
                "score": [float(score(c)) for c in ctxs],
            }
            if bucket_fn:
                out["bucket"] = [
                    min(max(int(bucket_fn(c)), 0), n_buckets - 1) for c in ctxs
                ]
            for name, fn in rfs.items():
                out[name] = [fn(c) for c in ctxs]
            yield pd.DataFrame(out)

    scored = cand.mapInPandas(run, schema=out_schema)
    if no_zero:  # Q15 semantics fused into the payload path
        scored = scored.filter(F.col("score") != 0.0)
    keep = ["docid", "score"] + list(rfs)
    hits = (
        scored.select(*keep)
        .orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(size)
    )
    buckets = None
    if bucket_fn:
        buckets = (
            scored.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("bucket")
        )
    return hits, buckets
