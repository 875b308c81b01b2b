"""Measure ingest-to-visible lag for the streaming → serving loop.

The reference's freshness bar: data is queryable ≤5 s after store (a
SearcherManager refresh every 5 s — src/bzzz/core.clj:209,
index_directory.clj:291-297).  Our loop has two freshness tiers:

  1. LIVE tier — file lands in the stream source → StreamingIndexer's
     1 s-trigger micro-batch appends docs + delta postings → the row is
     visible to live_index() queries.  Measured here as the median over
     `reps` single-file drops, polled with pyarrow (50 ms resolution,
     no Spark job in the poll loop).
  2. SERVING tier — compaction (checkpointed rebuild) + LocalIndex
     refresh() generation swap.  Amortized, not per-row: measured once
     as compact_sec + refresh_sec + first-query_sec.

Usage: python tools/ingest_lag.py [n_seed_turns] [reps]
Writes tools/ingest_lag_result.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from bzzz_spark.build.indexer import IndexConfig  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_pdf  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402
from bzzz_spark.streaming.ingest import StreamingIndexer  # noqa: E402

# int64 to match the pandas-written parquet physical type
SCHEMA = (
    "conv_id string, turn_idx long, role string, text string, "
    "tool string, ts long"
)


def _count_rows(path: str) -> int:
    import pyarrow.dataset as pads

    try:
        return pads.dataset(path, format="parquet").count_rows()
    except Exception:
        return 0


def main() -> None:
    n_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ingest-lag", cpus=8, shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="bzzz_lag_")
    src, ckpt, live, gen = (os.path.join(base, d) for d in
                            ("src", "ckpt", "live", "gen"))
    q = None
    try:
        cfg = IndexConfig(segment_size=4096, num_partitions=4)
        ing = StreamingIndexer(spark, live, cfg)
        pdf = synth_transcripts_pdf(n_conv=max(2, n_seed // 8), seed=11)
        pdf = pdf.iloc[:n_seed].copy()
        pdf["ts"] = pdf["ts"].astype("int64")  # epoch ns, matches SCHEMA
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        # write with the STREAM schema (ts long): to_spark would coerce
        # ts back to timestamp and the file lands INT96 ≠ bigint
        spark.createDataFrame(pdf[cols], SCHEMA).coalesce(2).write.parquet(
            os.path.join(src, "seed")
        )
        stream = (
            spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "*"))
        )
        q = ing.start(stream, ckpt, trigger_sec=1)
        q.processAllAvailable()
        seen = _count_rows(os.path.join(live, "docs"))

        lags = []
        for i in range(reps):
            row = pdf.iloc[[i]].copy()
            row["conv_id"] = f"lag-probe-{i}"
            row["turn_idx"] = 0
            t0 = time.perf_counter()
            spark.createDataFrame(row[cols], SCHEMA).coalesce(1).write.parquet(
                os.path.join(src, f"probe{i}")
            )
            while _count_rows(os.path.join(live, "docs")) <= seen:
                time.sleep(0.05)
                if time.perf_counter() - t0 > 60:
                    raise TimeoutError("probe row never became visible")
            lags.append(time.perf_counter() - t0)
            seen = _count_rows(os.path.join(live, "docs"))
        q.stop()

        t0 = time.perf_counter()
        ing.compact(gen)
        compact_sec = time.perf_counter() - t0
        from bzzz_spark.query import ast
        from bzzz_spark.serve.local import LocalIndex, local_search

        t0 = time.perf_counter()
        li = LocalIndex(gen)
        first = local_search(li, ast.Term("the"), size=10)
        open_query_sec = time.perf_counter() - t0
        lags_s = sorted(lags)
        out = {
            "n_seed_turns": n_seed,
            "reps": reps,
            "trigger_sec": 1,
            "live_lag_sec": {
                "min": round(lags_s[0], 3),
                "median": round(lags_s[len(lags_s) // 2], 3),
                "max": round(lags_s[-1], 3),
            },
            "serving_compact_sec": round(compact_sec, 3),
            "serving_open_plus_first_query_sec": round(open_query_sec, 3),
            "first_query_rows": int(len(first)),
        }
        print(json.dumps(out))
        with open(
            os.path.join(os.path.dirname(__file__), "ingest_lag_result.json"),
            "w",
        ) as f:
            json.dump(out, f, indent=2)
    finally:
        # stop the streaming query BEFORE deleting its source/checkpoint
        # (a live 1 s trigger against removed paths spews failures)
        if q is not None and q.isActive:
            q.stop()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
