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
  - an unpruned baseline: the SAME query with
    spark.sql.parquet.filterPushdown=false (identical plan, identical
    columns — the delta is exactly what the stats-based pruning skips);
  - the same queries warm (persist(layout="segment")) for the
    cold-vs-warm delta.

Measurement sources (NOT Hadoop FileSystem.Statistics — parquet's
vectored-IO read path bypasses that counter on this stack, measured
inverted results):
  - bytes: the JVM's /proc/<pid>/io rchar delta (every read syscall,
    page-cache hits included — "bytes requested from storage");
  - rows:  the FileScan node's numOutputRows runtime metric = block
    rows surviving row-group pruning (vs the postings total).

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


def jvm_pid() -> int | None:
    """The Spark driver JVM's pid (local mode: executors share it)."""
    import glob

    me = os.getpid()
    for p in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(p).read().split()
            if parts[3] == str(me) and "java" in parts[1]:
                return int(parts[0])
        except Exception:
            continue
    return None


def jvm_rchar(pid: int) -> int:
    for line in open(f"/proc/{pid}/io"):
        if line.startswith("rchar:"):
            return int(line.split()[1])
    return -1


def scan_rows(df) -> int:
    """Sum of the executed plan's leaf-scan numOutputRows — block rows
    that survived parquet row-group pruning."""
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return int(total)


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

        pid = jvm_pid()
        out["jvm_pid_found"] = pid is not None

        idx = read_index(spark, idx_dir)  # NO cache anywhere
        out["total_block_rows"] = idx.postings.count()

        def run_query(label: str, index, node) -> None:
            r0 = jvm_rchar(pid) if pid else 0
            t0 = time.perf_counter()
            search(index, node, size=10).collect()
            out[f"{label}_sec"] = round(time.perf_counter() - t0, 3)
            if pid:
                out[f"{label}_rchar_bytes"] = jvm_rchar(pid) - r0

        queries = {
            "term_rare": ["tok04321"],
            "term_mid": ["error"],
            "term_head": ["the"],
            "and2": ["error", "query"],
        }

        def node_of(terms):
            if len(terms) == 1:
                return ast.Term(terms[0])
            return ast.Bool(must=[ast.Term(t) for t in terms])

        # one throwaway query first: the JVM's first parquet read also
        # loads codec/reader classes from jars, which would bias the
        # first measured query's rchar upward
        search(read_index(spark, idx_dir), ast.Term("filler"), size=10
               ).collect()

        # end-to-end cold query: wall time + JVM read bytes, pushdown
        # on vs off (identical plan and columns; the delta is what the
        # term_id row-group stats skip).  Fresh read_index per run so
        # dictionary memoization never hides I/O.
        for label, terms in queries.items():
            spark.conf.set("spark.sql.parquet.filterPushdown", "true")
            run_query(f"cold_{label}_pruned", read_index(spark, idx_dir),
                      node_of(terms))
            spark.conf.set("spark.sql.parquet.filterPushdown", "false")
            run_query(f"cold_{label}_unpruned", read_index(spark, idx_dir),
                      node_of(terms))

        # scan-level pruning evidence: the query's own block filter on
        # a bare postings read (a non-adaptive plan, so the FileScan
        # leaf's numOutputRows runtime metric is reachable) — rows
        # surviving row-group pruning vs the unpruned scan
        def block_scan_rows(terms, pushdown: str) -> int:
            spark.conf.set("spark.sql.parquet.filterPushdown", pushdown)
            fresh = read_index(spark, idx_dir)
            meta = fresh.lookup_terms(terms)
            tids = sorted(int(t) for t, _df in meta.values())
            df = fresh.postings.filter(F.col("term_id").isin(tids))
            # collect() (not count()) — count() spawns a DIFFERENT
            # query execution, leaving THIS df's plan metrics at zero
            df.collect()
            return scan_rows(df)

        for label, terms in queries.items():
            out[f"{label}_scan_rows_pruned"] = block_scan_rows(terms, "true")
            out[f"{label}_scan_rows_unpruned"] = block_scan_rows(
                terms, "false"
            )
        spark.conf.set("spark.sql.parquet.filterPushdown", "true")

        # warm serving: segment-aligned pin, then the same queries
        idx.persist(layout="segment")
        idx.postings.count()
        for label, terms in queries.items():
            run_query(f"warm_{label}", idx, node_of(terms))

        for label in queries:
            out[f"{label}_scan_rows_frac"] = round(
                out[f"{label}_scan_rows_pruned"]
                / max(out[f"{label}_scan_rows_unpruned"], 1),
                4,
            )
        out["pruning_holds"] = bool(
            out["term_rare_scan_rows_frac"] < 0.2
            and out["term_rare_scan_rows_unpruned"]
            == out["total_block_rows"]
        )
        print(json.dumps(out))
        if out_json:
            with open(out_json, "w") as f:
                json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
