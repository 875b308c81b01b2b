"""Cold-I/O serving evidence (BASELINE.md): pruned bytes READ, not
just pruned decode.

The serving-latency numbers in bench.py ride Spark-cached columnar
batches; the 100 TB claim rests on the index ALSO pruning physical
reads when I/O is real.  This script builds a transcript index to DISK
(the checkpointed layout: postings parquet written sorted by term_id,
so row-group min/max stats carry tight term_id bounds), then — with NO
.cache() anywhere — measures per-query wall time and parquet bytes
read via Hadoop FileSystem statistics ("file" scheme; local mode runs
executors in the same JVM, so the counter sees every read the query
triggers):

  - cold rare/mid/head term queries: the term_id isin filter must reach
    the scan (PushedFilters) and skip non-matching row groups;
  - an unpruned baseline: an aggregate over the payload column with no
    term filter (reads every row group's doc_gaps);
  - the same queries warm (persist(layout="segment")) for the
    cold-vs-warm delta.

Prints one JSON line.  Usage:
  python tools/cold_io_bench.py [n_turns] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bzzz_spark.build.checkpoint import build_and_write, read_index  # noqa: E402
from bzzz_spark.build.indexer import IndexConfig  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.query import ast  # noqa: E402
from bzzz_spark.query.executor import search  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402


def fs_bytes_read(spark) -> int:
    """Total bytes read through the local filesystem scheme."""
    jvm = spark._jvm
    try:
        total = 0
        it = jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics()
        for s in it:
            if s.getScheme() == "file":
                total += s.getBytesRead()
        return int(total)
    except Exception:
        g = jvm.org.apache.hadoop.fs.GlobalStorageStatistics.INSTANCE
        st = g.get("file")
        return int(st.getLong("bytesRead")) if st is not None else -1


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else ""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bzzz-cold-io", cpus=cpus)

    idx_dir = tempfile.mkdtemp(prefix="bzzz_cold_idx_")
    out: dict = {"n_turns": n_turns, "cpus": cpus}
    try:
        corpus = synth_transcripts_spark(spark, n_turns)
        build_and_write(corpus, idx_dir,
                        IndexConfig(segment_size=1 << 15), n_chunks=4)
        out["postings_bytes_on_disk"] = du(os.path.join(idx_dir, "postings"))

        idx = read_index(spark, idx_dir)  # NO cache anywhere

        def measure(label: str, fn) -> None:
            b0 = fs_bytes_read(spark)
            t0 = time.perf_counter()
            fn()
            out[f"{label}_sec"] = round(time.perf_counter() - t0, 3)
            out[f"{label}_bytes_read"] = fs_bytes_read(spark) - b0

        queries = {
            "cold_term_rare": ast.Term("tok04321"),
            "cold_term_mid": ast.Term("error"),
            "cold_term_head": ast.Term("the"),
            "cold_and2": ast.Bool(must=[ast.Term("error"),
                                        ast.Term("query")]),
        }
        # dictionary lookups are memoized per BzzzIndex — use a FRESH
        # read_index per query so each measurement includes the real
        # cold dictionary + postings reads
        for label, node in queries.items():
            cold_idx = read_index(spark, idx_dir)
            measure(label, lambda i=cold_idx, n=node:
                    search(i, n, size=10).collect())

        # unpruned baseline: touch every row group's payload column
        measure(
            "full_scan",
            lambda: idx.postings.agg(
                F.sum(F.octet_length("doc_gaps"))).collect(),
        )

        # warm serving: segment-aligned pin, then the same queries
        idx.persist(layout="segment")
        idx.postings.count()
        for label, node in queries.items():
            measure(label.replace("cold_", "warm_"),
                    lambda n=node: search(idx, n, size=10).collect())

        # the evidence: a pruned term read must touch a small fraction
        # of what the unpruned scan reads
        frac = out["cold_term_rare_bytes_read"] / max(
            out["full_scan_bytes_read"], 1
        )
        out["rare_vs_fullscan_bytes_frac"] = round(frac, 4)
        out["pruning_holds"] = bool(frac < 0.2)
        print(json.dumps(out))
        if out_json:
            with open(out_json, "w") as f:
                json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
