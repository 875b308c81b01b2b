"""One-off 10^8-turn scale rung: build + headline-query sample.

VERDICT r4 "Next round" #7: extend the flat-throughput curve one more
decade (200k → 2M → 4M → 20M → 10^8).  A first attempt at 2·10^8 was
OOM-killed in the docs stage (java anon-RSS 50 GB + 77 GB tmpfs
shuffle/persist spill > the box's 125 GB — dmesg 2026-08-22); at 10^8
with a 44 GB heap the same phases fit.  At this scale the in-memory
build (tools/x100_rung.py's shape) cannot hold: the persisted tf frame
alone would exceed box memory.  So this rung exercises the engine's
SCALE path instead — the checkpointed chunked build
(build/checkpoint.build_and_write), which bounds memory by recomputing
each chunk's tf from the docs parquet slice and is exactly what a
100 TB deployment runs:

  * the synthetic corpus is NOT materialized — synth_transcripts_spark
    is a deterministic function of the row id, so the docs stage scans
    its lineage directly (saves ~30 GB of disk);
  * docs / dictionary / postings land on disk under /root (the virtio
    disk, not tmpfs — only shuffle scratch lives in /dev/shm per the
    box discipline), n_chunks=16 keeps every chunk at ~12.5M turns,
    the scale the box has already proven;
  * queries run twice: the Spark path over the pinned encoded postings
    (min-of-3 interleaved, 6 headline shapes + match-all count), and
    the in-process serving tier (LocalIndex) directly over the SAME
    checkpoint directory — no duplicate serving write needed.

Partial timings checkpoint to tools/x1000_partial.json after every
phase (the build itself also resumes from its own manifest if the
process dies).  Result: tools/x1000_result.json.

Usage: python tools/x1000_rung.py [n_turns] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("BZZZ_BENCH_SF_DIR", "/root/testdata/sf0.1")
# 44g, NOT 56g: heap and tmpfs shuffle spill share the box's physical
# RAM (the 2·10^8 attempt died at 50G RSS + 77G /dev/shm — BASELINE.md)
os.environ.setdefault("BZZZ_DRIVER_MEM", "44g")

from bench import min_of_interleaved, timed  # noqa: E402
from bzzz_spark.build.checkpoint import build_and_write, read_index  # noqa: E402
from bzzz_spark.build.indexer import IndexConfig  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.query import ast  # noqa: E402
from bzzz_spark.query.executor import search, total_hits  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402

_PARTIAL = os.path.join(os.path.dirname(__file__), "x1000_partial.json")

# the 5-query headline sample VERDICT asked for, plus the skew stressor
SAMPLE = {
    "t_term_head": ast.Term("the"),
    "t_term_rare": ast.Term("tok04321"),
    "t_and2": ast.Bool(must=[ast.Term("error"), ast.Term("query")]),
    "t_and3_skew": ast.Bool(
        must=[ast.Term("the"), ast.Term("and"), ast.Term("data")]
    ),
    "t_range": ast.Bool(
        must=[ast.Term("error"), ast.Range("turn_idx", min=1, max=5)]
    ),
    "t_or2_head": ast.Bool(should=[ast.Term("error"), ast.Term("the")]),
}


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/bzzz_x1000_idx"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("x1000-rung", cpus=cpus, shuffle_partitions=cpus * 4)
    tm: dict[str, float] = {}
    t0 = time.perf_counter()

    def ckpt(phase: str) -> None:
        with open(_PARTIAL, "w") as f:
            json.dump({"phase": phase, "n_turns": n_turns,
                       "timings": {k: round(v, 3) for k, v in tm.items()}},
                      f, indent=2)

    # NO cleanup on failure: build_and_write checkpoints per stage/chunk
    # in its manifest, so a crashed run (the box OOM-kills big JVMs —
    # see the 200M attempt in BASELINE.md) RESUMES by re-running this
    # tool with the same out_dir; only a completed run removes it.
    tdf = synth_transcripts_spark(spark, n_turns)
    cfg = IndexConfig(segment_size=1 << 15, docvalue_cols=("turn_idx",))
    tm["build_checkpointed"] = timed(
        lambda: build_and_write(tdf, out_dir, cfg, n_chunks=16)
    )[0]
    ckpt("build")

    tidx = read_index(spark, out_dir)
    tm["pin"] = timed(
        lambda: (tidx.persist(layout="segment"), tidx.postings.count())
    )[0]
    ckpt("pin")

    jobs = {
        name: (lambda n=node: search(tidx, n, size=10).collect())
        for name, node in SAMPLE.items()
    }
    tm.update(min_of_interleaved(jobs, 3))
    n_match_all = total_hits(tidx, ast.MatchAll())
    ckpt("queries")

    # in-process serving straight off the checkpoint directory
    from bzzz_spark.serve.local import LocalIndex, local_search

    lix = LocalIndex(out_dir)
    l_jobs = {
        f"l_{name}": (lambda q=node: local_search(lix, q, size=10))
        for name, node in SAMPLE.items()
    }
    tm.update(min_of_interleaved(l_jobs, 3))
    ckpt("serving")

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    out = {
        "n_turns": n_turns,
        "cpus": cpus,
        "n_docs": manifest["stages"]["docs"]["n_docs"],
        "n_terms": manifest["stages"]["dictionary"]["n_terms"],
        "n_match_all": int(n_match_all),
        "build_turns_per_sec": round(
            n_turns / tm["build_checkpointed"], 1
        ),
        "total_sec": round(time.perf_counter() - t0, 1),
        "timings": {k: round(v, 3) for k, v in tm.items()},
    }
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(__file__), "x1000_result.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
