"""End-to-end streaming ingest → compaction → serving refresh
(VERDICT r4 #4): a REAL StreamingQuery (file source + foreachBatch)
killed and restarted mid-stream must lose nothing and duplicate
nothing (the reference's 2-phase-commit S8 semantics via the
checkpointed source offsets), and a compacted new generation must
become visible through LocalIndex.refresh() (the S9 searcher-refresh
analog, reference core.clj:209 ≤5 s visibility bar) with rank parity
vs a from-scratch batch build."""

import shutil

import pytest

from bzzz_spark.build.indexer import IndexConfig
from bzzz_spark.query import ast
from bzzz_spark.query.executor import search
from bzzz_spark.streaming.ingest import StreamingIndexer

CFG = IndexConfig(block_size=16, segment_size=64, num_partitions=2)

# the stream schema must match the chunks' parquet physical types
# (int64 from pandas; ts normalized to an epoch long — the fixture's
# datetime64 would write INT96 and break the vectorized reader)
SCHEMA = (
    "conv_id string, turn_idx long, role string, text string, "
    "tool string, ts long"
)


def _write_chunk(spark, pdf, src_dir, name):
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype("int64")  # ns ticks; order-preserving
    spark.createDataFrame(pdf[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ]).coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/{name}")


def test_streaming_ingest_kill_restart_refresh(spark, tmp_path, small_pdf):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    live = str(tmp_path / "live")
    gen = str(tmp_path / "gen")

    pdf = small_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    thirds = [
        pdf.iloc[i * len(pdf) // 3:(i + 1) * len(pdf) // 3] for i in range(3)
    ]

    ing = StreamingIndexer(spark, live, CFG)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )

    # phase 1: first chunk flows through a live StreamingQuery
    _write_chunk(spark, thirds[0], src, "c0")
    q = ing.start(stream, ckpt, trigger_sec=1)
    q.processAllAvailable()
    n1 = spark.read.parquet(f"{live}/docs").count()
    assert n1 == len(thirds[0])

    # first generation compacts and opens for serving
    ing.compact(gen)
    from bzzz_spark.serve.local import LocalIndex, local_search

    li = LocalIndex(gen)
    node = ast.Bool(must=[ast.Term("the")])
    hits_gen1 = local_search(li, node, size=10)

    # KILL mid-stream; more data arrives while the query is down
    q.stop()
    _write_chunk(spark, thirds[1], src, "c1")

    # restart from the same checkpoint: the missed file is picked up
    # exactly once, then a third chunk arrives while running
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q2 = ing.start(stream2, ckpt, trigger_sec=1)
    q2.processAllAvailable()
    _write_chunk(spark, thirds[2], src, "c2")
    q2.processAllAvailable()
    q2.stop()

    # no loss, no dupes (S8): every (conv_id, turn_idx) exactly once
    docs = spark.read.parquet(f"{live}/docs")
    assert docs.count() == len(pdf)
    assert docs.select("conv_id", "turn_idx").distinct().count() == len(pdf)

    # stale generation still serves the old snapshot (torn reads are
    # the failure mode refresh() exists to prevent)
    assert local_search(li, node, size=10)["docid"].tolist() == (
        hits_gen1["docid"].tolist()
    )

    # compact the full corpus as a NEW generation in place → refresh()
    # swaps the searcher (S9) and the new docs are visible
    shutil.rmtree(gen)
    ing.compact(gen)
    assert li.refresh() is True
    assert li.refresh() is False  # idempotent until the next generation
    hits_gen2 = local_search(li, node, size=10)

    # rank parity vs a from-scratch batch build over the same rows
    from bzzz_spark.build.indexer import build_index
    from bzzz_spark.fixtures import to_spark

    scratch = build_index(to_spark(spark, pdf), CFG)
    want = [(r["docid"], round(r["score"], 9))
            for r in search(scratch, node, size=10).collect()]
    got = [
        (int(d), round(float(s), 9))
        for d, s in zip(hits_gen2["docid"], hits_gen2["score"])
    ]
    assert got == want
    assert got != [
        (int(d), round(float(s), 9))
        for d, s in zip(hits_gen1["docid"], hits_gen1["score"])
    ] or len(thirds[0]) == len(pdf)
