"""Per-phase build profiler — finds which stage fails to scale.

Usage: python tools/profile_build.py <cpus> [n_turns]
Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 400000

    from pyspark.sql import functions as F

    from bzzz_spark.build.ids import assign_sequential_ids
    from bzzz_spark.build.indexer import (
        IndexConfig,
        build_dictionary,
        build_posting_rows,
        build_tf,
        encode_postings,
    )
    from bzzz_spark.analysis.tokenizer import standard_tokenize
    from bzzz_spark.fixtures import synth_transcripts_spark
    from bzzz_spark.session import get_spark

    n_parts = int(os.environ.get("BZZZ_PROFILE_PARTS", str(cpus)))
    spark = get_spark(f"profile-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    cfg = IndexConfig(segment_size=1 << 15, num_partitions=n_parts)
    t: dict[str, float] = {}

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 2)
        return out

    raw = synth_transcripts_spark(spark, n_turns, parallelism=cpus)
    raw = phase("gen_materialize", lambda: raw.persist()) or raw
    phase("gen_count", lambda: raw.count())

    ids = phase(
        "assign_ids",
        lambda: assign_sequential_ids(raw, list(cfg.key_cols), "docid", n_parts),
    )
    docs = ids.withColumn("tokens", standard_tokenize(F.col(cfg.text_col))) \
              .withColumn("dl", F.size("tokens")) \
              .select("docid", "conv_id", "turn_idx", "dl", "tokens")
    stats = phase(
        "stats_collect",
        lambda: docs.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a"))
        .collect()[0],
    )
    n_docs, avgdl = int(stats["n"]), float(stats["a"])

    tf = build_tf(docs).persist()
    phase("tf_materialize", lambda: tf.count())
    dictionary = phase("dictionary", lambda: build_dictionary(tf, cfg).cache())
    phase("dictionary_count", lambda: dictionary.count())
    rows = build_posting_rows(tf, dictionary, cfg)
    enc = encode_postings(rows, n_docs, avgdl, cfg)
    phase("encode_count", lambda: enc.count())

    t["total"] = round(sum(v for k, v in t.items()), 2)
    print("PROFILE " + json.dumps({"cpus": cpus, "turns": n_turns, **t}))


if __name__ == "__main__":
    main()
