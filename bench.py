"""Benchmark harness — prints ONE JSON line for the driver.

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS]:
  1. index build over the documents table + the headline query set
     (per-query wall seconds in "queries");
  2. index-build throughput in turns/sec over a synthetic transcript
     corpus (BZZZ_BENCH_TURNS, default 200k) — the BASELINE.md metric;
  3. BM25 query latency p50/p99 over the reference query set.

"value" is the total wall-clock of the headline work (seconds, lower is
better).  Scaling-efficiency evidence (same build at local[8] vs
local[32]) lives in tools/scaling_bench.py → BASELINE.md, since it needs
two SparkContexts.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bzzz_spark.build.indexer import IndexConfig, build_index  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.query import ast  # noqa: E402
from bzzz_spark.query.executor import facet_counts, search  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402

DOC_QUERIES = {
    "q_term_head": ast.Term("batch"),
    "q_term_rare": ast.Term("dup"),
    "q_and2": ast.Bool(must=[ast.Term("scan"), ast.Term("filter")]),
    "q_and3_skew": ast.Bool(
        must=[ast.Term("batch"), ast.Term("scan"), ast.Term("dup")]
    ),
    "q_must_not": ast.Bool(must=[ast.Term("merge")], must_not=[ast.Term("dup")]),
    "q_paging": ast.Term("merge"),
    "q_match_all": ast.MatchAll(),
    "q_wildcard": ast.Wildcard("s*"),
}

TRANSCRIPT_QUERIES = {
    "t_term_head": ast.Term("the"),
    "t_term_mid": ast.Term("error"),
    "t_term_rare": ast.Term("tok04321"),
    "t_and2": ast.Bool(must=[ast.Term("error"), ast.Term("query")]),
    "t_and3_skew": ast.Bool(
        must=[ast.Term("the"), ast.Term("and"), ast.Term("data")]
    ),
    "t_range": ast.Bool(
        must=[ast.Term("error"), ast.Range("turn_idx", min=1, max=5)]
    ),
}


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("BZZZ_BENCH_TURNS", "200000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bzzz-bench", cpus=cpus)

    timings: dict[str, float] = {}
    total_t0 = time.perf_counter()

    # 1. documents index build + headline queries
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = IndexConfig(key_cols=("doc_id",), text_col="text", ts_col=None,
                      segment_size=1 << 14)
    dt, idx = timed(lambda: build_index(docs, cfg))
    idx.postings.cache()
    timings["build_documents"], _ = timed(lambda: idx.postings.count())
    timings["build_documents"] += dt
    for name, node in DOC_QUERIES.items():
        page = 1 if name == "q_paging" else 0
        timings[name], _ = timed(
            lambda n=node, p=page: search(idx, n, size=10, page=p).collect()
        )
    timings["q_facet_lang"], _ = timed(
        lambda: facet_counts(idx, ast.Term("dup"), "lang").collect()
    )

    # 2. transcript-corpus build throughput (the BASELINE.md headline).
    # The corpus is materialized to parquet first so the timed region is
    # the index build over a table — the north-rule input shape — not
    # the synthetic generator.
    import shutil
    import tempfile

    corpus_dir = tempfile.mkdtemp(prefix="bzzz_bench_corpus_")
    synth_transcripts_spark(spark, n_turns).write.mode("overwrite").parquet(
        corpus_dir
    )
    tdf = spark.read.parquet(corpus_dir)
    tdf.count()  # warm file listing/footers, untimed
    tcfg = IndexConfig(segment_size=1 << 15)
    dt, tidx = timed(lambda: build_index(tdf, tcfg))
    tidx.postings.cache()
    dt2, n_blocks = timed(lambda: tidx.postings.count())
    timings["build_transcripts"] = dt + dt2
    turns_per_sec = n_turns / timings["build_transcripts"]

    # 3. BM25 latency distribution over the reference query set
    lat = []
    for name, node in TRANSCRIPT_QUERIES.items():
        timings[name], _ = timed(lambda n=node: search(tidx, n, size=10).collect())
        lat.append(timings[name])
    lat.sort()
    p50 = statistics.median(lat)
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]

    shutil.rmtree(corpus_dir, ignore_errors=True)
    total = time.perf_counter() - total_t0
    print(
        json.dumps(
            {
                "metric": "bzzz_spark bench: doc-index build + headline queries "
                "+ transcript build throughput + BM25 latency",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "build_turns_per_sec": round(turns_per_sec, 1),
                "bench_turns": n_turns,
                "n_posting_blocks": n_blocks,
                "bm25_p50_sec": round(p50, 3),
                "bm25_p99_sec": round(p99, 3),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
