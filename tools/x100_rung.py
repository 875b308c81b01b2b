"""One-off x100 scale rung: the full transcript workload at 20M turns.

VERDICT r3 "Next round" #5 asked for a 20M-turn rung (100x the 200k
base corpus).  The driver bench runs 200k/2M/4M each round; this tool
runs the SAME workload once at 20M — build, pin, every headline query
(min-of-3 interleaved), the 24-query batch, the positional build +
phrase group, the span-dedup / decontamination / packing pipelines,
AND the in-process serving tier (write_index + local_search per
query), which bench.py only measures at base scale.

Memory discipline (this box has 125 GiB and the OS OOM-killed a 96g
run that pinned both indexes at once): 56g heap, ONE index pinned at a
time — the serving layouts are written before the pin drops, so the
l_* serving queries at the end need no Spark memory at all.  Partial
timings checkpoint to tools/x100_partial.json after every phase.

Usage: python tools/x100_rung.py [n_turns]  (default 20_000_000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("BZZZ_BENCH_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("BZZZ_DRIVER_MEM", "56g")

from bench import (  # noqa: E402
    PHRASE_BATCH,
    PHRASE_QUERIES,
    TRANSCRIPT_QUERIES,
    _batch_workload,
    min_of_interleaved,
    timed,
)
from bzzz_spark.build.checkpoint import write_index  # noqa: E402
from bzzz_spark.build.indexer import IndexConfig, build_index  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.query.batch import search_many  # noqa: E402
from bzzz_spark.query.executor import search  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402

_PARTIAL = os.path.join(os.path.dirname(__file__), "x100_partial.json")


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("x100-rung", cpus=cpus, shuffle_partitions=cpus)
    workload = _batch_workload()
    tm: dict[str, float] = {}
    t0 = time.perf_counter()

    def ckpt(phase: str) -> None:
        with open(_PARTIAL, "w") as f:
            json.dump({"phase": phase, "n_turns": n_turns,
                       "timings": {k: round(v, 3) for k, v in tm.items()}},
                      f, indent=2)

    corpus_dir = tempfile.mkdtemp(prefix="bzzz_x100_corpus_")
    serve_t = tempfile.mkdtemp(prefix="bzzz_x100_serve_t_")
    serve_p = tempfile.mkdtemp(prefix="bzzz_x100_serve_p_")
    try:
        tm["synth"] = timed(
            lambda: synth_transcripts_spark(spark, n_turns)
            .write.mode("overwrite")
            .parquet(corpus_dir)
        )[0]
        tdf = spark.read.parquet(corpus_dir)
        tdf.count()  # warm file listing/footers, untimed
        ckpt("synth")

        # ---- transcript index: build once (one-off rung), pin, query
        tcfg = IndexConfig(segment_size=1 << 15, docvalue_cols=("turn_idx",))
        tidx = None
        n_blocks = 0

        def build_once():
            nonlocal tidx, n_blocks
            tidx = build_index(tdf, tcfg).persist(layout=None)
            n_blocks = tidx.postings.count()

        tm["build_transcripts"] = timed(build_once)[0]
        tm["pin_transcripts"] = timed(
            lambda: (tidx.persist(layout="segment"), tidx.postings.count())
        )[0]
        ckpt("build")

        t_jobs = {
            name: (lambda n=node: search(tidx, n, size=10).collect())
            for name, node in TRANSCRIPT_QUERIES.items()
        }
        t_jobs["batch_all"] = lambda: search_many(
            tidx, workload, size=10
        ).collect()
        tm.update(min_of_interleaved(t_jobs, 3))
        ckpt("t_queries")

        # serving handoff BEFORE the pin drops; then free everything so
        # the positions build gets the whole heap
        tm["write_serving_transcripts"] = timed(
            lambda: write_index(tidx, serve_t)
        )[0]
        tidx.unpersist()
        tidx = None
        ckpt("serve_t_written")

        # ---- positional index: build, query, hand off, free
        pcfg = IndexConfig(segment_size=1 << 15, store_positions=True)
        pidx = None

        def build_pos_once():
            nonlocal pidx
            pidx = build_index(tdf, pcfg).persist(layout="segment")
            pidx.postings.count()

        tm["build_transcripts_pos"] = timed(build_pos_once)[0]
        ckpt("pos_build")
        p_jobs = {
            name: (lambda n=node: search(pidx, n, size=10).collect())
            for name, node in PHRASE_QUERIES.items()
        }
        p_jobs["batch_phrases"] = lambda: search_many(
            pidx, PHRASE_BATCH, size=10
        ).collect()
        tm.update(min_of_interleaved(p_jobs, 3))
        ckpt("p_queries")
        tm["write_serving_pos"] = timed(lambda: write_index(pidx, serve_p))[0]
        pidx.unpersist()
        pidx = None
        ckpt("serve_p_written")

        # ---- in-process serving at 100x the base corpus (zero Spark
        # memory: pyarrow over the persisted layouts)
        from bzzz_spark.serve.local import LocalIndex, local_search

        ltix, lpix = LocalIndex(serve_t), LocalIndex(serve_p)
        l_jobs = {
            f"l_{name}": (lambda q=node: local_search(ltix, q, size=10))
            for name, node in TRANSCRIPT_QUERIES.items()
        }
        l_jobs.update({
            f"l_{name}": (lambda q=node: local_search(lpix, q, size=10))
            for name, node in PHRASE_QUERIES.items()
        })
        tm.update(min_of_interleaved(l_jobs, 3))
        ckpt("serving")

        # ---- data-bound pipelines (same shapes as bench.py)
        def spans_strip():
            from pyspark.sql import functions as F

            from bzzz_spark.functions.dedup import strip_repeated_spans

            base = tdf.select(
                F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
            )
            strip_repeated_spans(base, n=8, min_df=2).agg(
                F.sum(F.length("text_clean")),
                F.sum("repeated_token_frac"),
            ).collect()

        tm["d_spans_strip"] = timed(spans_strip)[0]
        ckpt("spans")

        def decontam():
            from pyspark.sql import functions as F

            from bzzz_spark.analysis.tokenizer import standard_tokenize
            from bzzz_spark.functions.dedup import decontaminate

            base = tdf.select(
                F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
            )
            bench_df = base.filter(F.abs(F.col("doc_id")) % 101 == 3).select(
                F.array_join(
                    F.slice(standard_tokenize(F.col("text")), 4, 12), " "
                ).alias("text")
            )
            decontaminate(base, bench_df, n=8).agg(
                F.sum("hit_grams"),
                F.sum(F.col("contaminated").cast("long")),
            ).collect()

        tm["d_decontam"] = timed(decontam)[0]
        ckpt("decontam")

        def pack_scan():
            from pyspark.sql import functions as F

            from bzzz_spark.functions.packing import pack_sequences

            base = tdf.select(
                F.concat_ws(":", "conv_id", "turn_idx").alias("doc_id"),
                "text",
            )
            pack_sequences(base, 2048, "doc_id", text_col="text").agg(
                F.max("seq_id"), F.sum("doc_tok_end")
            ).collect()

        tm["d_pack_scan"] = timed(pack_scan)[0]
        ckpt("pack")

        out = {
            "n_turns": n_turns,
            "cpus": cpus,
            "n_posting_blocks": n_blocks,
            "build_turns_per_sec": round(
                n_turns / tm["build_transcripts"], 1
            ),
            "total_sec": round(time.perf_counter() - t0, 1),
            "timings": {k: round(v, 3) for k, v in tm.items()},
        }
        print(json.dumps(out))
        with open(
            os.path.join(os.path.dirname(__file__), "x100_result.json"), "w"
        ) as f:
            json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(serve_t, ignore_errors=True)
        shutil.rmtree(serve_p, ignore_errors=True)


if __name__ == "__main__":
    main()
