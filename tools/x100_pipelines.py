"""The three data-bound pipeline lines of the x100 rung, standalone.

The main tools/x100_rung.py run captured build/query/serving at 20M
turns but was OOM-killed entering this phase (the Python driver still
held the serving tier's block caches next to the 56g JVM).  This
runner does ONLY synth + spans/decontam/pack, so the JVM gets the
whole box.  Results merge into tools/x100_result.json by hand (see
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

os.environ.setdefault("BZZZ_BENCH_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("BZZZ_DRIVER_MEM", "80g")

from bench import timed  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("x100-pipelines", cpus=cpus, shuffle_partitions=cpus)
    tm: dict[str, float] = {}

    corpus_dir = tempfile.mkdtemp(prefix="bzzz_x100p_corpus_")
    try:
        synth_transcripts_spark(spark, n_turns).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        tdf = spark.read.parquet(corpus_dir)
        tdf.count()

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

        out = {"n_turns": n_turns, "cpus": cpus,
               "timings": {k: round(v, 3) for k, v in tm.items()}}
        print(json.dumps(out))
        with open(os.path.join(os.path.dirname(__file__),
                               "x100_pipelines.json"), "w") as f:
            json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
