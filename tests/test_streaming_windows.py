"""Watermarked streaming operators: cross-batch exact dedup, windowed
turn stats with late data, and the applyInPandasWithState sessionizer.

Driven through REAL streaming queries (file source → availableNow
trigger → memory sink), not by calling the batch bodies directly —
cross-batch state is the thing under test."""

import pandas as pd
import pytest

from bzzz_spark.streaming.windows import (
    conversation_sessions,
    streaming_exact_dedup,
    streaming_turn_stats,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _rows(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf, SCHEMA)


def _run_stream(spark, src_dir, ckpt, transform, sink_name):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {sink_name}")


def _run_stream_to_dir(spark, src_dir, ckpt, transform, out_dir,
                       mode="append"):
    """Restartable runner: the memory sink cannot recover from a
    checkpoint, so cross-restart tests sink via foreachBatch (which
    can) into a per-run parquet dir."""
    import os

    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)

    def sink(bdf, _eid):
        bdf.write.mode("append").parquet(out_dir)

    q = (
        transform(stream)
        .writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if not os.path.exists(out_dir):
        return None
    return spark.read.parquet(out_dir)


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """A copy arriving in a LATER micro-batch (separate availableNow
    run, state restored from the checkpoint) must still dedup."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, [
        ("c1", 0, "user", "the same text", "", "2026-01-01 00:00:00"),
        ("c1", 1, "user", "something else", "", "2026-01-01 00:00:10"),
    ]).write.parquet(src)
    out1 = _run_stream_to_dir(
        spark, src, ckpt, streaming_exact_dedup, str(tmp_path / "out1")
    )
    assert out1.count() == 2
    # batch 2: one exact copy (normalized: case/whitespace differ), one new
    _rows(spark, [
        ("c2", 0, "user", "  THE   same TEXT ", "", "2026-01-01 00:01:00"),
        ("c2", 1, "user", "a genuinely new turn", "", "2026-01-01 00:01:10"),
    ]).write.mode("append").parquet(src)
    out2 = _run_stream_to_dir(
        spark, src, ckpt, streaming_exact_dedup, str(tmp_path / "out2")
    )
    texts = [r["text"] for r in out2.collect()]
    assert texts == ["a genuinely new turn"], texts


def test_streaming_turn_stats_windows_and_late_rows(spark, tmp_path):
    """Per-(1-minute window, role) counts; a late-but-within-watermark
    row lands in its own event-time window."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, [
        ("c1", 0, "user", "one two three", "", "2026-01-01 00:00:05"),
        ("c1", 1, "assistant", "four five", "", "2026-01-01 00:00:40"),
        ("c1", 2, "user", "six", "", "2026-01-01 00:01:10"),
        # late row: event time in the FIRST window, arrives last
        ("c1", 3, "user", "seven eight", "", "2026-01-01 00:00:50"),
        # push the watermark past 00:01 + 5m so earlier windows close
        ("c1", 4, "user", "nine", "", "2026-01-01 00:07:30"),
    ]).write.parquet(src)
    out = _run_stream(
        spark, src, ckpt, streaming_turn_stats, "stats_sink"
    ).collect()
    got = {
        (str(r["window_start"]), r["role"]): (r["n_turns"], r["n_tokens"])
        for r in out
    }
    assert got[("2026-01-01 00:00:00", "user")] == (2, 5)
    assert got[("2026-01-01 00:00:00", "assistant")] == (1, 2)
    assert got[("2026-01-01 00:01:00", "user")] == (1, 1)


def test_conversation_sessions_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: counters accumulate across
    micro-batches (checkpointed state), keyed per conversation."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, [
        ("c1", 0, "user", "a b c", "", "2026-01-01 00:00:00"),
        ("c1", 1, "assistant", "d e", "", "2026-01-01 00:00:05"),
        ("c2", 0, "user", "x", "", "2026-01-01 00:00:07"),
    ]).write.parquet(src)

    def run(out_name):
        out = _run_stream_to_dir(
            spark, src, ckpt, conversation_sessions,
            str(tmp_path / out_name), mode="update",
        )
        if out is None:
            return {}
        return {
            r["conv_id"]: (r["n_turns"], r["n_tokens"], r["max_turn_idx"])
            for r in out.collect()
        }

    got1 = run("out1")
    assert got1["c1"] == (2, 5, 1)
    assert got1["c2"] == (1, 1, 0)
    # second micro-batch: state restored from the checkpoint and
    # extended; only the conversation that received rows re-emits
    _rows(spark, [
        ("c1", 2, "user", "f g h i", "", "2026-01-01 00:00:20"),
    ]).write.mode("append").parquet(src)
    got2 = run("out2")
    assert got2["c1"] == (3, 9, 2)
    assert "c2" not in got2


def test_streaming_ops_also_correct_in_batch_mode(spark):
    """The windowed-stats transformation is plan-identical for batch
    DataFrames (Structured Streaming's unified model) — pin the batch
    answer so the streaming one above can be trusted as the same op."""
    df = _rows(spark, [
        ("c1", 0, "user", "one two three", "", "2026-01-01 00:00:05"),
        ("c1", 1, "user", "four", "", "2026-01-01 00:00:59"),
    ])
    got = {
        (str(r["window_start"]), r["role"]): (r["n_turns"], r["n_tokens"])
        for r in streaming_turn_stats(df).collect()
    }
    assert got == {("2026-01-01 00:00:00", "user"): (2, 4)}


def test_streaming_map_stage_ops_compose(spark, tmp_path):
    """The stateless pipeline ops (PII scrub, C4/Gopher cleaning,
    hash-bucket splitting) are pure column expressions, so they must
    run unchanged inside a streaming query — the shape an ingest-time
    scrub/filter/split pipeline uses."""
    from pyspark.sql import functions as F

    from bzzz_spark.functions.cleaning import c4_clean, gopher_flags
    from bzzz_spark.functions.pii import pii_profile
    from bzzz_spark.functions.sampling import assign_split

    src = str(tmp_path / "src")
    rows = [
        ("c0", 0, "user", "Mail me at a@b.co with the result please.",
         "", "2026-01-01 00:00:00"),
        ("c0", 1, "assistant", "Done. The server is 10.0.0.1 as you said.",
         "", "2026-01-01 00:00:10"),
        ("c1", 0, "user", "no punctuation no keep", "",
         "2026-01-01 00:01:00"),
    ]
    _rows(spark, rows).write.mode("overwrite").parquet(src)

    def transform(stream):
        docs = stream.select(
            F.concat_ws("-", "conv_id",
                        F.col("turn_idx").cast("string")).alias("doc_id"),
            "text",
        )
        out = gopher_flags(c4_clean(
            pii_profile(docs).drop("text")
            .withColumnRenamed("text_redacted", "text")))
        return assign_split(out, "doc_id").select(
            "doc_id", "n_email", "n_ipv4", "c4_keep", "split", "text")

    got = {
        r["doc_id"]: r
        for r in _run_stream(
            spark, src, str(tmp_path / "ckpt"), transform, "scrub_sink"
        ).collect()
    }
    assert len(got) == 3
    assert got["c0-0"]["n_email"] == 1
    assert "<EMAIL>" in got["c0-0"]["text"]
    assert got["c0-1"]["n_ipv4"] == 1 and "<IP>" in got["c0-1"]["text"]
    assert got["c0-0"]["c4_keep"] and got["c0-1"]["c4_keep"]
    assert not got["c1-0"]["c4_keep"]
    assert all(r["split"] in ("train", "eval") for r in got.values())
