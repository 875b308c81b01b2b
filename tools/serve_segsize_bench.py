"""Measure the serving-shard segment-size lever.

The x100 rung showed a single in-process LocalIndex over a 20M-doc
corpus pays a serial per-segment loop (~610 segments at the Spark-tuned
segment_size of 32k docs).  The documented lever is to build serving
shards with LARGER segments — fewer per-segment kernel invocations,
same block-max pruning inside each.  This tool measures it: build the
same corpus at two segment sizes, write both serving layouts, and
compare hot in-process latencies per query shape (min-of-5).

Usage: python tools/serve_segsize_bench.py [n_turns] (default 2M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

os.environ.setdefault("BZZZ_BENCH_SF_DIR", "/root/testdata/sf0.1")

from bench import PHRASE_QUERIES, TRANSCRIPT_QUERIES, min_of_interleaved  # noqa: E402
from bzzz_spark.build.checkpoint import write_index  # noqa: E402
from bzzz_spark.build.indexer import IndexConfig, build_index  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.serve.local import LocalIndex, local_search  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    seg_sizes = (1 << 15, 1 << 19)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("serve-segsize", cpus=cpus, shuffle_partitions=cpus)

    corpus_dir = tempfile.mkdtemp(prefix="bzzz_segsize_corpus_")
    out: dict = {"n_turns": n_turns, "by_segment_size": {}}
    try:
        synth_transcripts_spark(spark, n_turns).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        tdf = spark.read.parquet(corpus_dir)
        tdf.count()
        for seg in seg_sizes:
            serve_t = tempfile.mkdtemp(prefix=f"bzzz_segsize_t_{seg}_")
            serve_p = tempfile.mkdtemp(prefix=f"bzzz_segsize_p_{seg}_")
            try:
                tix = build_index(
                    tdf,
                    IndexConfig(segment_size=seg,
                                docvalue_cols=("turn_idx",)),
                ).persist(layout="segment")
                tix.postings.count()
                write_index(tix, serve_t)
                tix.unpersist()
                pix = build_index(
                    tdf, IndexConfig(segment_size=seg, store_positions=True)
                ).persist(layout="segment")
                pix.postings.count()
                write_index(pix, serve_p)
                pix.unpersist()

                ltix, lpix = LocalIndex(serve_t), LocalIndex(serve_p)
                jobs = {
                    name: (lambda q=node: local_search(ltix, q, size=10))
                    for name, node in TRANSCRIPT_QUERIES.items()
                }
                jobs.update({
                    name: (lambda q=node: local_search(lpix, q, size=10))
                    for name, node in PHRASE_QUERIES.items()
                })
                tm = min_of_interleaved(jobs, 5)
                n_segs = -(-n_turns // seg)
                out["by_segment_size"][str(seg)] = {
                    "n_segments": n_segs,
                    "timings": {k: round(v, 4) for k, v in tm.items()},
                }
                print(seg, n_segs, {k: round(v, 3) for k, v in tm.items()})
            finally:
                shutil.rmtree(serve_t, ignore_errors=True)
                shutil.rmtree(serve_p, ignore_errors=True)
        with open(os.path.join(os.path.dirname(__file__),
                               "serve_segsize_result.json"), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
