"""batch_all regression diagnosis (BASELINE.md, round 4).

Round 3's driver bench measured the 24-query batch at 5.68 s (round 2:
4.25 s) while every other query improved 1.2-6.7x.  Hypotheses:
(a) window noise (this host's neighbor load swings identical runs
6-9x); (b) the positions-bearing index — new in the r3 bench, built in
the SAME session before the batch timing — perturbing the measurement
(its 100 s build shares the window; its pinned blocks share storage
memory with the serving index).

Measures the batch isolated, min-of-N, in consecutive session phases:
  phase1: fresh session, 200k-turn corpus, serving pin → batch;
  phase2: after building + pinning the positions index → batch again;
  phase3 (optional arg "3"): after building the 10x corpus → again.

A single-term canary query rides every phase: if the canary moves with
the batch, the cause is the window, not the batch plan.

Prints one JSON line; run alone in a quiet window (see BASELINE.md
measurement discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bzzz_spark.build.indexer import IndexConfig, build_index  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.query import ast  # noqa: E402
from bzzz_spark.query.batch import search_many  # noqa: E402
from bzzz_spark.query.executor import search  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402


def _workload() -> dict:
    from bzzz_spark.fixtures import HEAD_TERMS

    qs: dict[str, object] = {}
    for t in HEAD_TERMS[:12]:
        qs[f"b_term_{t}"] = ast.Term(t)
    for a, b in zip(HEAD_TERMS[:6], HEAD_TERMS[6:12]):
        qs[f"b_and_{a}_{b}"] = ast.Bool(must=[ast.Term(a), ast.Term(b)])
    for a, b in zip(HEAD_TERMS[12:16], HEAD_TERMS[16:20]):
        qs[f"b_not_{a}_{b}"] = ast.Bool(must=[ast.Term(a)],
                                        must_not=[ast.Term(b)])
    qs["b_msm"] = ast.Bool(
        should=[ast.Term(t) for t in HEAD_TERMS[20:24]],
        minimum_should_match=2,
    )
    qs["b_rare"] = ast.Term("tok04321")
    return qs


def min_of(fn, n: int) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    phases = sys.argv[1] if len(sys.argv) > 1 else "2"
    reps = int(os.environ.get("DIAG_REPS", "5"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("BZZZ_BENCH_TURNS", "200000"))
    spark = get_spark("bzzz-diag-batch", cpus=cpus)
    out: dict = {"n_turns": n_turns, "reps": reps, "cpus": cpus,
                 "loadavg": os.getloadavg()}

    corpus = synth_transcripts_spark(spark, n_turns)
    corpus.cache().count()
    tidx = build_index(
        corpus, IndexConfig(segment_size=1 << 15, docvalue_cols=("turn_idx",))
    ).persist(layout="segment")
    tidx.postings.count()
    wl = _workload()
    out["n_queries"] = len(wl)

    def batch():
        search_many(tidx, wl, size=10).collect()

    def canary():
        search(tidx, ast.Term("error"), size=10).collect()

    batch()  # warm plan/code paths once, untimed
    out["phase1_batch_sec"] = round(min_of(batch, reps), 3)
    out["phase1_canary_sec"] = round(min_of(canary, reps), 3)

    if phases >= "2":
        pidx = build_index(
            corpus, IndexConfig(segment_size=1 << 15, store_positions=True)
        ).persist(layout="segment")
        pidx.postings.count()
        out["phase2_batch_sec"] = round(min_of(batch, reps), 3)
        out["phase2_canary_sec"] = round(min_of(canary, reps), 3)

    if phases >= "3":
        big = synth_transcripts_spark(spark, n_turns * 10)
        bidx = build_index(
            big, IndexConfig(segment_size=1 << 15)
        ).persist(layout="segment")
        bidx.postings.count()
        search(bidx, ast.Term("the"), size=10).collect()
        out["phase3_batch_sec"] = round(min_of(batch, reps), 3)
        out["phase3_canary_sec"] = round(min_of(canary, reps), 3)

    out["loadavg_end"] = os.getloadavg()
    out["per_query_phase1"] = round(out["phase1_batch_sec"] / len(wl), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
