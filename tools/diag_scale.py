"""Diagnose the 32-thread build slowdown: time the build under config
variants and report JVM GC totals.

Usage:
  python tools/diag_scale.py gen /tmp/corpus400k 400000
  python tools/diag_scale.py run <cpus> /tmp/corpus400k [key=val ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gc_stats(spark):
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory \
        .getGarbageCollectorMXBeans()
    out = {}
    for i in range(beans.size()):
        b = beans.get(i)
        out[b.getName()] = {
            "count": b.getCollectionCount(), "ms": b.getCollectionTime()
        }
    return out


def main() -> None:
    mode = sys.argv[1]
    if mode == "gen":
        from bzzz_spark.fixtures import synth_transcripts_spark
        from bzzz_spark.session import get_spark

        path, n = sys.argv[2], int(sys.argv[3])
        spark = get_spark("diag-gen", cpus=32)
        synth_transcripts_spark(spark, n, parallelism=64).write.mode(
            "overwrite"
        ).parquet(path)
        print("generated", n)
        return

    cpus, corpus = int(sys.argv[2]), sys.argv[3]
    extra = dict(kv.split("=", 1) for kv in sys.argv[4:])

    from bzzz_spark.build.indexer import IndexConfig, build_index
    from bzzz_spark.session import get_spark

    spark = get_spark(
        f"diag-{cpus}", cpus=cpus, shuffle_partitions=cpus, extra_conf=extra
    )
    df = spark.read.parquet(corpus)
    n_turns = df.count()
    g0 = gc_stats(spark)
    cfg = IndexConfig(segment_size=1 << 15, num_partitions=cpus)
    t0 = time.perf_counter()
    idx = build_index(df, cfg)
    n_blocks = idx.postings.count()
    dt = time.perf_counter() - t0
    g1 = gc_stats(spark)
    gc_ms = sum(v["ms"] for v in g1.values()) - sum(v["ms"] for v in g0.values())
    print(
        "DIAG "
        + json.dumps(
            {
                "cpus": cpus, "conf": extra, "sec": round(dt, 2),
                "turns_per_sec": round(n_turns / dt, 1),
                "gc_ms": gc_ms, "gc_frac": round(gc_ms / 1000.0 / dt, 3),
                "n_blocks": n_blocks,
            }
        )
    )


if __name__ == "__main__":
    main()
