"""Two-cluster-size scaling evidence (BASELINE.md target: ≥0.8
efficiency between N and 4N executors).

No real cluster exists in this sandbox, so the same index build runs at
two parallelism levels — local[N] and local[4N] — on the identical
input, in separate subprocesses (one SparkContext each).
Efficiency = (throughput@4N / throughput@N) / 4.

Measurement discipline (this box is a shared-host VM with bursty
neighbor load — identical stages were observed to vary several-fold
between runs):
  * the corpus is materialized ONCE to parquet and every worker reads
    the same files, so generation cost and plan differences are outside
    the timed region (it also matches the north rule's input shape: the
    build consumes a table, it does not synthesize data);
  * N- and 4N-runs ALTERNATE, `--reps` times each, and each level is
    scored by its fastest run (min wall time) — under additive external
    noise the minimum is the consistent estimator of the machine's true
    capability at that parallelism.

Usage:
  python tools/scaling_bench.py                    # 8 vs 32, 400k turns
  BZZZ_SCALING_TURNS=1000000 BZZZ_SCALING_REPS=3 python tools/scaling_bench.py
  python tools/scaling_bench.py --worker 8 /tmp/corpus   # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def generate(path: str, n_turns: int) -> None:
    from bzzz_spark.fixtures import synth_transcripts_spark
    from bzzz_spark.session import get_spark

    spark = get_spark("scaling-gen", cpus=32, shuffle_partitions=32)
    synth_transcripts_spark(spark, n_turns, parallelism=64).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def worker(cpus: int, corpus: str) -> None:
    from bzzz_spark.build.indexer import IndexConfig, build_index
    from bzzz_spark.session import get_spark

    spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    df = spark.read.parquet(corpus)
    n_turns = df.count()  # warm the file-listing/footer caches, untimed
    # 4 tasks per core: straggler smoothing — on a shared host a stolen
    # core stalls a 1-task-per-core schedule for a whole partition, but
    # with finer tasks the scheduler routes around it (and at cluster
    # scale this is the standard 2-4x tasks-per-slot sizing anyway)
    cfg = IndexConfig(segment_size=1 << 15, num_partitions=4 * cpus)
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


def _burn(q):
    # fixed arithmetic work unit, ~1s on one quiet core
    s = 0
    for i in range(12_000_000):
        s += i * i & 1023
    q.put(s)


def _stream(q):
    # STREAM-triad-style pass over 256 MB: memory-bandwidth-bound work
    # (the build's Arrow/numpy encode kernels look like this, not like
    # cache-resident arithmetic)
    import numpy as np

    a = np.ones(16_000_000)
    b = np.ones(16_000_000)
    for _ in range(6):
        a = a * 1.0001 + b
    q.put(float(a[0]))


def mem_ceiling(n_procs: int) -> float:
    """Concurrent-process memory-bandwidth throughput (passes/sec).
    SMT shares one membw domain per core pair and the VM shares the
    host's: bandwidth-bound phases cannot scale past this ratio no
    matter the thread count."""
    import multiprocessing as mp

    q = mp.Queue()
    procs = [mp.Process(target=_stream, args=(q,)) for _ in range(n_procs)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return n_procs / (time.perf_counter() - t0)


def cpu_ceiling(n_procs: int) -> float:
    """Pure-Python hardware throughput at n_procs concurrent processes
    (work-units/sec).  No Spark: this bounds what ANY job can scale to
    on this box (SMT: 32 vCPUs = 16 physical cores; shared-host
    neighbors steal cycles).  Efficiency is reported both raw and
    relative to the same-window ceiling ratio."""
    import multiprocessing as mp

    q = mp.Queue()
    procs = [mp.Process(target=_burn, args=(q,)) for _ in range(n_procs)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return n_procs / (time.perf_counter() - t0)


def run_worker(cpus: int, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), corpus],
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
        worker(int(sys.argv[2]), sys.argv[3])
        return
    n_turns = int(os.environ.get("BZZZ_SCALING_TURNS", "400000"))
    n_small = int(os.environ.get("BZZZ_SCALING_N", "8"))
    reps = int(os.environ.get("BZZZ_SCALING_REPS", "3"))
    n_big = 4 * n_small

    corpus = tempfile.mkdtemp(prefix="bzzz_scaling_corpus_")
    try:
        generate(corpus, n_turns)
        runs: dict[int, list[dict]] = {n_small: [], n_big: []}
        ceil: dict[int, list[float]] = {n_small: [], n_big: []}
        mceil: dict[int, list[float]] = {n_small: [], n_big: []}
        for _ in range(reps):
            for cpus in (n_small, n_big):  # alternate to cancel host drift
                ceil[cpus].append(cpu_ceiling(cpus))
                mceil[cpus].append(mem_ceiling(cpus))
                runs[cpus].append(run_worker(cpus, corpus))
        small = min(runs[n_small], key=lambda r: r["sec"])
        big = min(runs[n_big], key=lambda r: r["sec"])
        eff = (big["turns_per_sec"] / small["turns_per_sec"]) / (n_big / n_small)
        # same-window hardware ceiling: best pure-CPU throughput at each
        # level bounds the achievable speedup on this shared box
        ceil_speedup = max(ceil[n_big]) / max(ceil[n_small])
        mem_speedup = max(mceil[n_big]) / max(mceil[n_small])
        eff_vs_ceiling = (
            (big["turns_per_sec"] / small["turns_per_sec"]) / ceil_speedup
            if ceil_speedup > 0 else 0.0
        )
        result = {
            "metric": "index-build scaling efficiency N->4N (local mode)",
            "n_small": n_small, "n_big": n_big, "turns": n_turns,
            "reps": reps,
            "small": small, "big": big,
            "small_secs": [r["sec"] for r in runs[n_small]],
            "big_secs": [r["sec"] for r in runs[n_big]],
            "speedup": round(big["turns_per_sec"] / small["turns_per_sec"], 3),
            "efficiency": round(eff, 3),
            "hw_ceiling_speedup": round(ceil_speedup, 3),
            "hw_membw_ceiling_speedup": round(mem_speedup, 3),
            "hw_ceiling_units_per_sec": {
                str(n): [round(x, 2) for x in xs] for n, xs in ceil.items()
            },
            "hw_membw_units_per_sec": {
                str(n): [round(x, 2) for x in xs] for n, xs in mceil.items()
            },
            "efficiency_vs_hw_ceiling": round(eff_vs_ceiling, 3),
            "target": 0.8,
            # "pass" keeps the raw north-rule criterion; ceiling-relative
            # efficiency is reported separately so downstream readers see
            # exactly which bar was met on this shared box
            "pass": eff >= 0.8,
            "pass_vs_cpu_ceiling": eff_vs_ceiling >= 0.8,
            "pass_vs_membw_ceiling": (
                (big["turns_per_sec"] / small["turns_per_sec"]) / mem_speedup
                >= 0.8 if mem_speedup > 0 else False
            ),
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(corpus, ignore_errors=True)


if __name__ == "__main__":
    main()
