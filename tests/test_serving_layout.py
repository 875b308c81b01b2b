"""write_index serving-segment preset: fat segments are the measured
serving sweet spot (tools/serve_segsize_bench: 512k-doc segments halve
hot p50 at 10× base), so serving writes re-segment by default — pure
metadata (segment := docid // new_size merges whole old segments) with
bit-identical query results, pinned here."""

import math

import pytest

from bzzz_spark.build.checkpoint import (
    SERVING_SEGMENT_SIZE,
    load_config,
    write_index,
)
from bzzz_spark.query import ast
from bzzz_spark.query.executor import search
from bzzz_spark.serve.local import LocalIndex, local_search


@pytest.fixture(scope="module")
def shuffle_index(spark, small_transcripts):
    from bzzz_spark.build.indexer import IndexConfig, build_index

    idx = build_index(
        small_transcripts,
        IndexConfig(
            block_size=16, segment_size=64, num_partitions=4,
            merge_mode="shuffle",
        ),
    )
    idx.postings.cache().count()
    return idx


def test_serving_write_resegments_by_default(tmp_path, shuffle_index):
    out = str(tmp_path / "fat")
    write_index(shuffle_index, out)
    cfg = load_config(out)
    assert cfg.segment_size == SERVING_SEGMENT_SIZE
    li = LocalIndex(out)
    n_docs, _ = li.scalar_stats()
    segs = set()
    for tid in (0, 1, 2):
        blocks = li.fetch_blocks([tid])
        segs.update(blocks["segment"].tolist())
    want_n = math.ceil(n_docs / SERVING_SEGMENT_SIZE)
    assert segs and len(segs) <= want_n
    assert max(segs) < want_n


def test_serving_write_opt_out_keeps_build_segments(tmp_path, shuffle_index):
    out = str(tmp_path / "thin")
    write_index(shuffle_index, out, serving_segment_size=None)
    assert load_config(out).segment_size == 64


def test_aligned_index_keeps_layout(tmp_path, small_index):
    """Aligned-merge segment numbering is not docid//segment_size, so
    the relabel must not apply."""
    out = str(tmp_path / "aligned")
    write_index(small_index, out)
    assert load_config(out).segment_size == small_index.config.segment_size


def test_resegmented_results_identical(tmp_path, shuffle_index, small_oracle):
    """Fat-segment serving returns exactly the thin-segment (and Spark
    path) hits — relabeling only merges kernel task granularity."""
    fat, thin = str(tmp_path / "fat"), str(tmp_path / "thin")
    write_index(shuffle_index, fat)
    write_index(shuffle_index, thin, serving_segment_size=None)
    lfat, lthin = LocalIndex(fat), LocalIndex(thin)
    for node in (
        ast.Term("error"),
        ast.Bool(must=[ast.Term("error"), ast.Term("data")]),
        ast.Bool(should=[ast.Term("error"), ast.Term("the")]),
        ast.Wildcard("err*"),
        ast.Bool(must=[ast.Term("error")], must_not=[ast.Term("the")]),
    ):
        a = local_search(lfat, node, size=10)
        b = local_search(lthin, node, size=10)
        assert a["docid"].tolist() == b["docid"].tolist()
        assert a["score"].tolist() == pytest.approx(
            b["score"].tolist(), rel=1e-12
        )
        spark_hits = [
            r["docid"] for r in search(shuffle_index, node, size=10).collect()
        ]
        assert a["docid"].tolist() == spark_hits
