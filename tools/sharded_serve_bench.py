"""Sharded serving at transcript scale: the x1000 conclusion, measured.

The 10^8 rung showed a single fat shard is the wrong serving topology
(l_t_and3_skew 54.8 s at 100M docs — ~18× the reference's ~5.5M-doc
per-node shard, ref README.md:570).  This tool measures the fix the
engine already ships: `build_sharded` (serve/scatter.py) splits the
SAME corpus into N global-stats shards whose coordinator merge is
bit-identical to the fat index, and per-shard work drops to 1/N.

For the 2M-turn corpus (10× bench base) it builds (a) one fat serving
index and (b) an N-shard layout, then times the headline shapes three
ways, min-of-3 interleaved:

  * fat        — LocalIndex over the single index (the x100 rung's l_*)
  * coord_wall — ShardedIndex.search in THIS process; the shard loop
                 is serial here (GIL), so this is ~sum(shard times) +
                 merge — the honest single-process number
  * shard_max  — max over per-shard local_search times; in deployment
                 each shard is its own process/host, so query latency
                 is max(shard) + merge, which this models

Parity is asserted on every shape (coordinator hits == fat-index hits,
scores included) before anything is timed.

Usage: python tools/sharded_serve_bench.py [n_turns] [n_shards]
Writes tools/sharded_serve_result.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from bench import min_of_interleaved, timed  # noqa: E402
from bzzz_spark.build.checkpoint import build_and_write  # noqa: E402
from bzzz_spark.build.indexer import IndexConfig  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.query import ast  # noqa: E402
from bzzz_spark.serve.local import LocalIndex, local_search  # noqa: E402
from bzzz_spark.serve.scatter import ShardedIndex, build_sharded  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402

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
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("sharded-serve-bench")
    base = tempfile.mkdtemp(prefix="bzzz_shardbench_")
    fat_dir = os.path.join(base, "fat")
    sh_dir = os.path.join(base, "shards")
    tm: dict[str, float] = {}
    try:
        tdf = synth_transcripts_spark(spark, n_turns)
        cfg = IndexConfig(segment_size=1 << 15, docvalue_cols=("turn_idx",))
        # both layouts get the serving 512k-doc re-segmentation default
        tm["build_fat"] = timed(
            lambda: build_and_write(tdf, fat_dir, cfg, n_chunks=4)
        )[0]
        tm["build_sharded"] = timed(
            lambda: build_sharded(tdf, sh_dir, n_shards, cfg)
        )[0]

        fat = LocalIndex(fat_dir)
        six = ShardedIndex(sh_dir)

        # parity gate before timing: coordinator == fat index, scores
        # included (the sharding_test.clj invariant, strengthened)
        for name, node in SAMPLE.items():
            want = local_search(fat, node, size=10)
            got = six.search(node, size=10)
            assert want["docid"].tolist() == got["docid"].tolist(), name
            wd = (want["score"] - got["score"]).abs().max()
            assert float(wd if len(want) else 0.0) < 1e-9, (name, wd)

        jobs = {}
        for name, node in SAMPLE.items():
            jobs[f"fat_{name}"] = (
                lambda q=node: local_search(fat, q, size=10)
            )
            jobs[f"coord_{name}"] = (lambda q=node: six.search(q, size=10))
        tm.update(min_of_interleaved(jobs, 3))

        # per-shard times: deployment latency is max(shard) + merge
        for name, node in SAMPLE.items():
            per = []
            for s in six.shards:
                per.append(
                    min(
                        timed(lambda q=node, sh=s: local_search(sh, q, size=10))[0]
                        for _ in range(3)
                    )
                )
            tm[f"shard_max_{name}"] = max(per)
            tm[f"shard_sum_{name}"] = sum(per)

        out = {
            "n_turns": n_turns,
            "n_shards": n_shards,
            "docs_per_shard": n_turns // n_shards,
            "timings": {k: round(v, 3) for k, v in tm.items()},
        }
        print(json.dumps(out))
        with open(
            os.path.join(
                os.path.dirname(__file__), "sharded_serve_result.json"
            ),
            "w",
        ) as f:
            json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
