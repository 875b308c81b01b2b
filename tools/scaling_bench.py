"""Two-cluster-size scaling evidence (BASELINE.md target: ≥0.8
efficiency between N and 4N executors).

No real cluster exists in this sandbox, so the same index build runs at
two parallelism levels — local[N] and local[4N] — on the identical
synthetic transcript corpus, in separate subprocesses (one SparkContext
each).  Efficiency = (throughput@4N / throughput@N) / 4.

Usage:
  python tools/scaling_bench.py                 # N=8 vs 32, 400k turns
  BZZZ_SCALING_TURNS=1000000 python tools/scaling_bench.py
  python tools/scaling_bench.py --worker 8 400000   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cpus: int, n_turns: int) -> None:
    from bzzz_spark.build.indexer import IndexConfig, build_index
    from bzzz_spark.fixtures import synth_transcripts_spark
    from bzzz_spark.session import get_spark

    spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    df = synth_transcripts_spark(spark, n_turns, parallelism=cpus)
    cfg = IndexConfig(segment_size=1 << 15, num_partitions=cpus)
    t0 = time.perf_counter()
    idx = build_index(df, cfg)
    n_blocks = idx.postings.count()  # materialize the full pipeline
    dt = time.perf_counter() - t0
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "turns": n_turns,
                "sec": round(dt, 3),
                "turns_per_sec": round(n_turns / dt, 1),
                "n_blocks": n_blocks,
            }
        )
    )


def run_worker(cpus: int, n_turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus),
         str(n_turns)],
        capture_output=True, text=True, timeout=3000, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):])
    raise RuntimeError(
        f"worker {cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_turns = int(os.environ.get("BZZZ_SCALING_TURNS", "400000"))
    n_small = int(os.environ.get("BZZZ_SCALING_N", "8"))
    n_big = 4 * n_small
    small = run_worker(n_small, n_turns)
    big = run_worker(n_big, n_turns)
    eff = (big["turns_per_sec"] / small["turns_per_sec"]) / (n_big / n_small)
    result = {
        "metric": "index-build scaling efficiency N->4N (local mode)",
        "n_small": n_small, "n_big": n_big, "turns": n_turns,
        "small": small, "big": big,
        "speedup": round(big["turns_per_sec"] / small["turns_per_sec"], 3),
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
