"""Disk-layout pruning regression: a term query against an ON-DISK
index (build_and_write → read_index, NO caching) must scan only a
small fraction of the postings block rows — file-level skipping via
range-partitioned term_id files plus row-group min/max stats.  This is
the bytes-read half of the scale claim (a plan-shape PushedFilters
assertion alone said nothing about whether the stats actually pruned:
round 4 found 128 MB default row groups silently disabled it)."""

from pyspark.sql import functions as F

from bzzz_spark.build.checkpoint import build_and_write, read_index
from bzzz_spark.build.indexer import IndexConfig
from bzzz_spark.fixtures import synth_transcripts_spark


def _scan_rows(df) -> int:
    """The executed plan's leaf-scan numOutputRows — block rows that
    survived parquet row-group/file pruning."""
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return int(total)


def test_disk_term_scan_prunes_block_rows(spark, tmp_path):
    corpus = synth_transcripts_spark(spark, 20000)
    out = str(tmp_path / "idx")
    build_and_write(corpus, out, IndexConfig(segment_size=1 << 14),
                    n_chunks=2)
    idx = read_index(spark, out)
    total = idx.postings.count()
    meta = idx.lookup_terms(["tok04321"])
    tid = int(meta["tok04321"][0])

    def rows_scanned(pushdown: str) -> int:
        spark.conf.set("spark.sql.parquet.filterPushdown", pushdown)
        fresh = read_index(spark, out)
        df = fresh.postings.filter(F.col("term_id").isin([tid]))
        df.collect()  # count() would execute a different plan
        return _scan_rows(df)

    try:
        pruned = rows_scanned("true")
        unpruned = rows_scanned("false")
    finally:
        spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    assert unpruned == total  # no pushdown = every block row scanned
    # rare term: stats pruning must skip the vast majority of blocks
    assert pruned < 0.2 * total, (pruned, total)
