"""Benchmark harness — prints ONE JSON line for the driver.

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS]:
  1. index build over the documents table + the headline query set;
  2. index-build throughput in turns/sec over a synthetic transcript
     corpus (BZZZ_BENCH_TURNS, default 200k) — the BASELINE.md metric;
  3. BM25 query latency p50/p99 over the reference query set;
  4. the same build + query set over a 10× corpus (BZZZ_BENCH_TURNS2,
     default 2M turns; 0 disables) — the scale-growth evidence: per-
     query latency ratios at 10× the corpus ("scale2" in the output).

Measurement discipline (BASELINE.md): this host's neighbor noise swings
identical runs 6-9x, so every query is timed N times with the rounds
INTERLEAVED (run all queries, then all again, ...) and scored by its
MINIMUM — under additive external noise the minimum is the consistent
estimator of the machine's capability.  Builds are timed min-of-
BZZZ_BENCH_BUILD_REPS (default 2).  "value" is the total wall-clock of
the headline work.  Scaling-efficiency evidence (same build at local[8]
vs local[32]) lives in tools/scaling_bench.py → BASELINE.md, since it
needs two SparkContexts.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bzzz_spark.build.indexer import IndexConfig, build_index  # noqa: E402
from bzzz_spark.fixtures import synth_transcripts_spark  # noqa: E402
from bzzz_spark.query import ast  # noqa: E402
from bzzz_spark.query.executor import facet_counts, search  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402

N_QUERY_REPS = int(os.environ.get("BZZZ_BENCH_QUERY_REPS", "3"))
N_BUILD_REPS = int(os.environ.get("BZZZ_BENCH_BUILD_REPS", "2"))

DOC_QUERIES = {
    "q_term_head": ast.Term("batch"),
    "q_term_rare": ast.Term("dup"),
    "q_and2": ast.Bool(must=[ast.Term("scan"), ast.Term("filter")]),
    "q_and3_skew": ast.Bool(
        must=[ast.Term("batch"), ast.Term("scan"), ast.Term("dup")]
    ),
    "q_must_not": ast.Bool(must=[ast.Term("merge")], must_not=[ast.Term("dup")]),
    "q_paging": ast.Term("merge"),
    "q_match_all": ast.MatchAll(),
    "q_wildcard": ast.Wildcard("s*"),
}

# batched-execution workload: a realistic evaluation-set shape — dozens
# of term/bool queries over the same corpus, answered in ONE job.
# Vocabulary = the synthetic transcripts' head terms (fixtures.HEAD_TERMS).
def _batch_workload() -> dict:
    from bzzz_spark.fixtures import HEAD_TERMS

    qs: dict[str, object] = {}
    for t in HEAD_TERMS[:12]:
        qs[f"b_term_{t}"] = ast.Term(t)
    for a, b in zip(HEAD_TERMS[:6], HEAD_TERMS[6:12]):
        qs[f"b_and_{a}_{b}"] = ast.Bool(must=[ast.Term(a), ast.Term(b)])
    for a, b in zip(HEAD_TERMS[12:16], HEAD_TERMS[16:20]):
        qs[f"b_not_{a}_{b}"] = ast.Bool(
            must=[ast.Term(a)], must_not=[ast.Term(b)]
        )
    qs["b_msm"] = ast.Bool(
        should=[ast.Term(t) for t in HEAD_TERMS[20:24]],
        minimum_should_match=2,
    )
    qs["b_rare"] = ast.Term("tok04321")
    return qs


TRANSCRIPT_QUERIES = {
    "t_term_head": ast.Term("the"),
    "t_term_mid": ast.Term("error"),
    "t_term_rare": ast.Term("tok04321"),
    "t_and2": ast.Bool(must=[ast.Term("error"), ast.Term("query")]),
    "t_and3_skew": ast.Bool(
        must=[ast.Term("the"), ast.Term("and"), ast.Term("data")]
    ),
    "t_range": ast.Bool(
        must=[ast.Term("error"), ast.Range("turn_idx", min=1, max=5)]
    ),
    # disjunction over a mid + head term: the MaxScore path — the head
    # term's blocks decode only where they overlap θ-surviving candidates
    "t_or2_head": ast.Bool(should=[ast.Term("error"), ast.Term("the")]),
    # wildcard inside a conjunction: the expansion rides the mixed
    # kernel as a constant-score term set — decodes only blocks
    # overlapping the scored term's candidates
    "t_wild_and": ast.Bool(must=[ast.Term("error"), ast.Wildcard("tok04*")]),
    # mixed must+should (ReqOptSumScorer): the required mid term drives
    # candidates; the optional HEAD term decodes only blocks overlapping
    # them instead of its full postings
    "t_req_opt": ast.Bool(
        must=[ast.Term("error")],
        should=[ast.Term("the"), ast.Term("data")],
    ),
    # dis-max over a mid + head term: the MaxScore kernel's dismax
    # combiner ((1-tie)*max + tie*sum) — same head-block pruning as
    # t_or2_head once the mid term's candidates establish θ
    "t_dismax": ast.DisMax(
        queries=[ast.Term("error"), ast.Term("the")], tie_breaker=0.3
    ),
    # required disjunction inside a conjunction — "error AND (the OR
    # data)": the required-group hoist moves the group onto the
    # ReqOptSum kernel with opt_msm=1, so the mid term drives
    # candidates and the head-term group members decode only
    # candidate-overlapping blocks (previously the exhaustive path,
    # which full-decoded "the")
    "t_or_in_and": ast.Bool(must=[
        ast.Term("error"),
        ast.Bool(should=[ast.Term("the"), ast.Term("data")]),
    ]),
    # synonym-expansion conjunction — "(error OR query) AND (the OR
    # data)": group 1 hoists to msm-gated optionals, group 2 rides the
    # mixed kernel as a required 'g' conjunct; the rarer group's union
    # drives and the head-term group decodes only candidate-overlapping
    # blocks (previously exhaustive)
    "t_syn_and": ast.Bool(must=[
        ast.Bool(should=[ast.Term("error"), ast.Term("query")]),
        ast.Bool(should=[ast.Term("the"), ast.Term("data")]),
    ]),
    # filtered disjunction: normalize() lowers Filtered to a zero-boost
    # must clause, so the RARE filter term anchors the conjunction and
    # both head/mid shoulds decode only candidate-overlapping blocks
    "t_filt_or": ast.Filtered(
        query=ast.Bool(should=[ast.Term("error"), ast.Term("the")]),
        filter=ast.Term("tok04321"),
    ),
    # set conjunct + dv range with NO term conjunct (r4, late): the
    # range row-mask rides the wildcard expansion's own decode (every
    # member posting of a doc inlines the same dv value) — previously
    # the exhaustive path, which joined the docs table
    "t_wild_range": ast.Bool(
        must=[ast.Wildcard("tok04*"), ast.Range("turn_idx", min=1, max=5)]
    ),
    # required group + dv range (r4, late): the hoist is skipped (a
    # range-only must list cannot drive ReqOptSum), the group's member
    # union drives the mixed kernel and masks at its own decode
    "t_or_range": ast.Bool(must=[
        ast.Bool(should=[ast.Term("error"), ast.Term("query")]),
        ast.Range("turn_idx", min=1, max=5),
    ]),
}

# phrase queries run against a SEPARATE positions-bearing index (the
# main throughput build stays positions-free so build_transcripts is
# comparable across rounds); the block-pruned positional kernel decodes
# the head term's position lists only where they overlap the rarer
# term's candidates
PHRASE_QUERIES = {
    "t_phrase_exact": ast.Phrase(["the", "error"]),
    "t_phrase_slop": ast.Phrase(["error", "query"], slop=3),
    # hybrid shape on the mixed-conjunction kernel: the phrase is a
    # pseudo-term anchored by estimated size, so the head term ("the")
    # decodes only candidate-overlapping blocks instead of everything
    "t_phrase_and": ast.Bool(
        must=[ast.Phrase(["error", "query"], slop=3), ast.Term("the")]
    ),
    # phrase as a DISJUNCTION clause (r4): MaxScore with the phrase as
    # a pseudo-term — its high upper bound (sum of leg idfs) admits
    # first, so the head term decodes only candidate-overlapping blocks
    "t_phrase_or": ast.Bool(
        should=[ast.Phrase(["error", "query"], slop=3), ast.Term("the")]
    ),
}

# batched phrases (r4): every distinct (terms, slop) phrase in the
# batch evaluates inside ONE shared positional mapInPandas
# (query/batch._phrase_contribs), each rarest-leg block-pruned, so a
# mixed phrase+term workload pays one job — the per-query cost to
# compare against the isolated t_phrase_* lines above
PHRASE_BATCH = {
    "pb_exact": ast.Phrase(["the", "error"]),
    "pb_slop": ast.Phrase(["error", "query"], slop=3),
    "pb_and": ast.Bool(
        must=[ast.Phrase(["error", "query"], slop=3), ast.Term("the")]
    ),
    "pb_not": ast.Bool(
        must=[ast.Term("error")], must_not=[ast.Phrase(["the", "data"])]
    ),
    "pb_term_mid": ast.Term("error"),
    "pb_term_head": ast.Term("data"),
    "pb_and2": ast.Bool(must=[ast.Term("error"), ast.Term("query")]),
    "pb_msm": ast.Bool(
        should=[ast.Term("error"), ast.Term("query"), ast.Term("data")],
        minimum_should_match=2,
    ),
    # wildcard leaf: the expansion shares the batch's postings decode
    # as a constant-score term set (query/batch.py, r4 late)
    "pb_wild": ast.Bool(must=[ast.Term("error"), ast.Wildcard("tok04*")]),
}


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def min_of_interleaved(jobs: dict, n_reps: int) -> dict[str, float]:
    """jobs: name -> thunk.  Runs all jobs per round, n_reps rounds,
    returns each job's minimum wall time across rounds."""
    best: dict[str, float] = {}
    for _ in range(n_reps):
        for name, fn in jobs.items():
            dt, _ = timed(fn)
            best[name] = min(best.get(name, float("inf")), dt)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("BZZZ_BENCH_TURNS", "200000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bzzz-bench", cpus=cpus)

    timings: dict[str, float] = {}
    total_t0 = time.perf_counter()

    # 1. documents index build (min-of-N full rebuilds) + headline queries
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cfg = IndexConfig(key_cols=("doc_id",), text_col="text", ts_col=None,
                      segment_size=1 << 14)
    idx = None

    def build_docs_once():
        nonlocal idx
        if idx is not None:
            idx.unpersist()
        # the timed region is the BUILD (pin in build layout + postings
        # materialization); the serving re-layout is timed separately
        # below — it is a one-off serving-setup cost, not build work
        idx = build_index(docs, cfg).persist(layout=None)
        idx.postings.count()

    timings["build_documents"] = min(
        timed(build_docs_once)[0] for _ in range(N_BUILD_REPS)
    )
    # serving mode: segment-aligned layout → narrow shuffle-free queries
    timings["pin_documents"] = timed(
        lambda: (idx.persist(layout="segment"), idx.postings.count())
    )[0]

    doc_jobs = {}
    for name, node in DOC_QUERIES.items():
        page = 1 if name == "q_paging" else 0
        doc_jobs[name] = (
            lambda n=node, p=page: search(idx, n, size=10, page=p).collect()
        )
    doc_jobs["q_facet_lang"] = lambda: facet_counts(
        idx, ast.Term("dup"), "lang"
    ).collect()

    # map-stage training-pipeline ops over the documents table: pure
    # column expressions, so the number is scan+expression throughput
    # (the 100 TB shape — no shuffle, no Python)
    def _pii_scan():
        from bzzz_spark.functions.pii import pii_profile

        pii_profile(docs).agg(
            F.sum(F.col("has_pii").cast("int")),
            F.sum(F.length("text_redacted")),
        ).collect()

    def _clean_scan():
        from bzzz_spark.functions.cleaning import c4_clean, gopher_flags

        gopher_flags(c4_clean(docs)).agg(
            F.sum(F.col("c4_keep").cast("int")),
            F.sum(F.col("gopher_keep").cast("int")),
            F.sum("n_words"),
        ).collect()

    def _sample_scan():
        from bzzz_spark.functions.sampling import assign_split, hash_sample

        hash_sample(docs, 0.25, "doc_id").count()
        assign_split(docs, "doc_id").groupBy("split").count().collect()

    def _ppl_scan():
        # LM quality scoring end-to-end: estimate the bigram LM (two
        # groupBy counts) + broadcast-mode scoring (pure map stage) —
        # the deployment shape of the CCNet filter
        from bzzz_spark.functions.lm import perplexity, train_bigram_lm

        lm = train_bigram_lm(docs, k=0.5, min_count=2)
        perplexity(docs, lm, mode="broadcast").agg(
            F.sum("n_scored_bigrams"), F.avg("perplexity")
        ).collect()

    def _dsir_scan():
        # DSIR data selection end-to-end: hashed-ngram bucket counts on
        # target + raw (two bounded groupBys each), broadcast-mode
        # scoring (pure map stage), Gumbel-top-k resample (bounded
        # per-partition top-k) — the deployment shape of the Xie et al.
        # importance-resampling filter
        from bzzz_spark.functions.dsir import (
            dsir_select, importance_weight, train_ngram_importance,
        )

        model = train_ngram_importance(
            docs.filter(F.col("doc_id") % 7 == 0), docs, n_buckets=10_000
        )
        dsir_select(
            importance_weight(docs, model, mode="broadcast"), 100
        ).count()

    doc_jobs["d_pii_scan"] = _pii_scan
    doc_jobs["d_clean_scan"] = _clean_scan
    doc_jobs["d_sample_scan"] = _sample_scan
    doc_jobs["d_ppl_scan"] = _ppl_scan
    doc_jobs["d_dsir_scan"] = _dsir_scan
    timings.update(min_of_interleaved(doc_jobs, N_QUERY_REPS))

    # 1b. serving-tier facets + multi-shard serving over the documents
    # index: l_facet_lang is the in-process facet line (matched set via
    # kernels at k=n_docs, labels from the cached doc-values column);
    # ls_* lines run the SAME queries through ShardedIndex (4 shards
    # built with GLOBAL stats, scatter + exact k-way merge) — the
    # serving deployment shape at 100 TB.  build_sharded is the one-off
    # handoff cost, not per-query work.
    import shutil
    import tempfile

    from bzzz_spark.build.checkpoint import write_index
    from bzzz_spark.serve.local import (
        LocalIndex, local_facet_counts, local_sorted_search,
    )
    from bzzz_spark.serve.scatter import ShardedIndex, build_sharded

    serve_d = tempfile.mkdtemp(prefix="bzzz_serve_d_")
    shard_d = tempfile.mkdtemp(prefix="bzzz_shards_d_")
    try:
        timings["write_serving_documents"] = timed(
            lambda: write_index(idx, serve_d)
        )[0]
        timings["build_sharded_documents"] = timed(
            lambda: build_sharded(docs, shard_d, 4, cfg)
        )[0]
        ldix, sdix = LocalIndex(serve_d), ShardedIndex(shard_d)
        serve_jobs = {
            "l_facet_lang": lambda: local_facet_counts(
                ldix, ast.Term("dup"), "lang"
            ),
            "l_sorted_nchars": lambda: local_sorted_search(
                ldix, ast.Term("merge"), [("n_chars", "desc")], size=10
            ),
            "ls_term_head": lambda: sdix.search(ast.Term("batch"), size=10),
            "ls_and2": lambda: sdix.search(
                ast.Bool(must=[ast.Term("scan"), ast.Term("filter")]), size=10
            ),
            "ls_facet_lang": lambda: sdix.facet_counts(
                ast.Term("dup"), "lang"
            ),
            "ls_sorted_nchars": lambda: sdix.sorted_search(
                ast.Term("merge"), [("n_chars", "desc")], size=10
            ),
        }
        timings.update(min_of_interleaved(serve_jobs, N_QUERY_REPS))
    finally:
        shutil.rmtree(serve_d, ignore_errors=True)
        shutil.rmtree(shard_d, ignore_errors=True)

    # 2. transcript-corpus build throughput (the BASELINE.md headline).
    # The corpus is materialized to parquet first so the timed region is
    # the index build over a table — the north-rule input shape — not
    # the synthetic generator.
    import shutil
    import tempfile

    from bzzz_spark.query.batch import search_many

    workload = _batch_workload()

    def transcript_scale(n_turns: int, prefix: str, build_reps: int):
        """Build + query the synthetic transcript corpus at one scale.
        Returns (timings dict with `prefix`ed keys, summary dict)."""
        corpus_dir = tempfile.mkdtemp(prefix="bzzz_bench_corpus_")
        try:
            synth_transcripts_spark(spark, n_turns).write.mode(
                "overwrite"
            ).parquet(corpus_dir)
            tdf = spark.read.parquet(corpus_dir)
            tdf.count()  # warm file listing/footers, untimed
            # turn_idx rides the blocks as an inline doc-value, so the
            # t_range query stays on the narrow WAND kernel path
            tcfg = IndexConfig(segment_size=1 << 15,
                               docvalue_cols=("turn_idx",))
            tidx = None
            n_blocks = 0
            tm: dict[str, float] = {}

            def build_once():
                nonlocal tidx, n_blocks
                if tidx is not None:
                    tidx.unpersist()
                tidx = build_index(tdf, tcfg).persist(layout=None)
                n_blocks = tidx.postings.count()

            tm[f"{prefix}build_transcripts"] = min(
                timed(build_once)[0] for _ in range(build_reps)
            )
            tm[f"{prefix}pin_transcripts"] = timed(
                lambda: (tidx.persist(layout="segment"),
                         tidx.postings.count())
            )[0]

            # BM25 latency distribution over the reference query set.
            # The positions-bearing index is built AFTER this group (it
            # previously ran before, and its 100 s build + cached blocks
            # shared the window/storage with batch_all — the r3
            # batch_all regression's prime suspect; see BASELINE.md).
            t_jobs = {
                f"{prefix}{name}": (
                    lambda n=node: search(tidx, n, size=10).collect()
                )
                for name, node in TRANSCRIPT_QUERIES.items()
            }
            # batched execution — the whole workload as ONE Spark job
            # (shared postings scan, one shuffle): the per-query cost an
            # analytics workload actually pays, vs the fixed per-job
            # overhead dominating the isolated timings
            t_jobs[f"{prefix}batch_all"] = lambda: search_many(
                tidx, workload, size=10
            ).collect()
            tm.update(min_of_interleaved(t_jobs, N_QUERY_REPS))

            # positional index for phrase queries: built once (1 rep —
            # positions roughly double the encode work, so it is timed
            # under its own key, not folded into build_transcripts);
            # phrase queries form their own interleaved min-of-N group
            pcfg = IndexConfig(segment_size=1 << 15, store_positions=True)
            pidx = None

            def build_pos_once():
                nonlocal pidx
                pidx = build_index(tdf, pcfg).persist(layout="segment")
                pidx.postings.count()

            tm[f"{prefix}build_transcripts_pos"] = timed(build_pos_once)[0]
            p_jobs = {
                f"{prefix}{name}": (
                    lambda n=node: search(pidx, n, size=10).collect()
                )
                for name, node in PHRASE_QUERIES.items()
            }
            # batched phrases: the whole PHRASE_BATCH as one action —
            # phrases share one positional scan, terms share the
            # postings scan (query/batch.py)
            p_jobs[f"{prefix}batch_phrases"] = lambda: search_many(
                pidx, PHRASE_BATCH, size=10
            ).collect()
            tm.update(min_of_interleaved(p_jobs, N_QUERY_REPS))

            # in-process serving (base scale only): Spark builds, the
            # persisted layout serves via pyarrow + the SAME numpy
            # kernels with ZERO Spark jobs per query
            # (bzzz_spark.serve.local) — the reference's deployment
            # shape (long-lived in-process searchers).  write_serving_*
            # is the one-off build→serve handoff cost; l_* lines are
            # the per-query serving latencies the reference's ~150 ms
            # figure should be compared against.
            if prefix == "":
                from bzzz_spark.build.checkpoint import write_index
                from bzzz_spark.serve.local import LocalIndex, local_search

                serve_t = tempfile.mkdtemp(prefix="bzzz_serve_t_")
                serve_p = tempfile.mkdtemp(prefix="bzzz_serve_p_")
                try:
                    tm["write_serving_transcripts"] = timed(
                        lambda: write_index(tidx, serve_t)
                    )[0]
                    tm["write_serving_pos"] = timed(
                        lambda: write_index(pidx, serve_p)
                    )[0]
                    ltix, lpix = LocalIndex(serve_t), LocalIndex(serve_p)
                    l_jobs = {
                        f"l_{name}": (
                            lambda q=node: local_search(ltix, q, size=10)
                        )
                        for name, node in TRANSCRIPT_QUERIES.items()
                    }
                    l_jobs.update({
                        f"l_{name}": (
                            lambda q=node: local_search(lpix, q, size=10)
                        )
                        for name, node in PHRASE_QUERIES.items()
                    })
                    tm.update(min_of_interleaved(l_jobs, N_QUERY_REPS))
                finally:
                    shutil.rmtree(serve_t, ignore_errors=True)
                    shutil.rmtree(serve_p, ignore_errors=True)

            # span-level dedup pipeline (Lee et al. exact-substring at
            # 8-gram granularity) over the same corpus — linear in
            # corpus tokens by design; the growth ratio across scales
            # is the evidence.  The agg forces text_clean computation
            # (a bare count would let Catalyst prune the strip work).
            def spans_strip():
                from pyspark.sql import functions as F

                from bzzz_spark.functions.dedup import strip_repeated_spans

                base = tdf.select(
                    F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
                )
                strip_repeated_spans(base, n=8, min_df=2).agg(
                    F.sum(F.length("text_clean")),
                    F.sum("repeated_token_frac"),
                ).collect()

            tm[f"{prefix}d_spans_strip"] = timed(spans_strip)[0]

            # decontamination (r4): distinct corpus 8-grams vs a
            # broadcast benchmark gram set (~1% of docs' token windows)
            # — the corpus side sees one gram explode + one uniform
            # doc_id groupBy, so growth should track corpus tokens
            def decontam():
                from pyspark.sql import functions as F

                from bzzz_spark.analysis.tokenizer import standard_tokenize
                from bzzz_spark.functions.dedup import decontaminate

                base = tdf.select(
                    F.xxhash64("conv_id", "turn_idx").alias("doc_id"), "text"
                )
                bench = base.filter(
                    F.abs(F.col("doc_id")) % 101 == 3
                ).select(
                    F.array_join(
                        F.slice(standard_tokenize(F.col("text")), 4, 12), " "
                    ).alias("text")
                )
                decontaminate(base, bench, n=8).agg(
                    F.sum("hit_grams"),
                    F.sum(F.col("contaminated").cast("long")),
                ).collect()

            tm[f"{prefix}d_decontam"] = timed(decontam)[0]

            # sequence packing (r4): md5-ordered bucketed prefix-sum +
            # slice onto 2048-token sequences — one small agg + one
            # bucket-partitioned window shuffle, linear in corpus tokens
            def pack_scan():
                from pyspark.sql import functions as F

                from bzzz_spark.functions.packing import pack_sequences

                base = tdf.select(
                    F.concat_ws(":", "conv_id", "turn_idx").alias("doc_id"),
                    "text",
                )
                pack_sequences(base, 2048, "doc_id", text_col="text").agg(
                    F.max("seq_id"), F.sum("doc_tok_end")
                ).collect()

            tm[f"{prefix}d_pack_scan"] = timed(pack_scan)[0]

            # p50/p99 cover the BM25 latency set benchmarked since r2 —
            # t_wild_and (constant-score dictionary-expansion shape),
            # t_req_opt (mixed must+should) and t_dismax (all added r4)
            # report their own lines but stay out of the distribution so
            # the headline percentiles remain round-over-round comparable
            lat = sorted(
                tm[f"{prefix}{name}"]
                for name in TRANSCRIPT_QUERIES
                if name not in ("t_wild_and", "t_req_opt", "t_dismax",
                                "t_filt_or", "t_or_in_and", "t_syn_and",
                                "t_wild_range", "t_or_range")
            )
            summary = {
                "turns": n_turns,
                "n_posting_blocks": n_blocks,
                "build_turns_per_sec": round(
                    n_turns / tm[f"{prefix}build_transcripts"], 1
                ),
                "bm25_p50_sec": round(statistics.median(lat), 3),
                "bm25_p99_sec": round(
                    lat[min(len(lat) - 1, int(len(lat) * 0.99))], 3
                ),
                "batched_per_query_sec": round(
                    tm[f"{prefix}batch_all"] / len(workload), 4
                ),
            }
            if f"{prefix}l_t_term_head" in tm:
                llat = sorted(
                    tm[f"{prefix}l_{name}"]
                    for name in TRANSCRIPT_QUERIES
                    if name not in ("t_wild_and", "t_req_opt", "t_dismax",
                                    "t_filt_or", "t_or_in_and", "t_syn_and",
                                    "t_wild_range", "t_or_range")
                )
                summary["local_p50_sec"] = round(statistics.median(llat), 4)
                summary["local_p99_sec"] = round(
                    llat[min(len(llat) - 1, int(len(llat) * 0.99))], 4
                )
            tidx.unpersist()
            if pidx is not None:
                pidx.unpersist()
            return tm, summary
        finally:
            shutil.rmtree(corpus_dir, ignore_errors=True)

    tm1, s1 = transcript_scale(n_turns, "", N_BUILD_REPS)
    timings.update(tm1)
    turns_per_sec = s1["build_turns_per_sec"]
    n_blocks = s1["n_posting_blocks"]
    p50, p99 = s1["bm25_p50_sec"], s1["bm25_p99_sec"]
    batched_per_query = s1["batched_per_query_sec"]

    # 4. scale-growth evidence: the same query set over a 10× corpus —
    # block-max/leapfrog pruning should keep single-term latency
    # sublinear in corpus size (VERDICT r2 #5)
    growth_keys = (
        list(TRANSCRIPT_QUERIES) + list(PHRASE_QUERIES)
        + ["batch_all", "batch_phrases", "d_spans_strip", "d_decontam",
           "d_pack_scan"]
    )
    n_turns2 = int(os.environ.get("BZZZ_BENCH_TURNS2", "2000000"))
    scale2 = None
    if n_turns2 > 0:
        tm2, s2 = transcript_scale(
            n_turns2, "x10_", int(os.environ.get("BZZZ_BENCH_BUILD_REPS2", "1"))
        )
        timings.update(tm2)
        scale2 = s2
        scale2["latency_growth_vs_corpus_10x"] = {
            name: round(timings[f"x10_{name}"] / timings[name], 2)
            for name in growth_keys
        }
    # third rung (x20 the base corpus): any query growing superlinearly
    # across BOTH steps needs a plan explanation — 3 points separate
    # "sublinear with noise" from "quietly linear" (VERDICT r3 #5)
    n_turns3 = int(os.environ.get("BZZZ_BENCH_TURNS3", "4000000"))
    scale3 = None
    if n_turns3 > 0:
        tm3, s3 = transcript_scale(
            n_turns3, "x20_", int(os.environ.get("BZZZ_BENCH_BUILD_REPS3", "1"))
        )
        timings.update(tm3)
        scale3 = s3
        scale3["latency_growth_vs_corpus_20x"] = {
            name: round(timings[f"x20_{name}"] / timings[name], 2)
            for name in growth_keys
        }
    total = time.perf_counter() - total_t0
    print(
        json.dumps(
            {
                "metric": "bzzz_spark bench: doc-index build + headline queries "
                "+ transcript build throughput + BM25 latency "
                f"(interleaved min-of-{N_QUERY_REPS} per query, "
                f"min-of-{N_BUILD_REPS} per build)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "n": N_QUERY_REPS,
                "build_reps": N_BUILD_REPS,
                "build_turns_per_sec": round(turns_per_sec, 1),
                "bench_turns": n_turns,
                "n_posting_blocks": n_blocks,
                "bm25_p50_sec": round(p50, 3),
                "bm25_p99_sec": round(p99, 3),
                "local_serve_p50_sec": s1.get("local_p50_sec"),
                "local_serve_p99_sec": s1.get("local_p99_sec"),
                "bm25_batched_per_query_sec": round(batched_per_query, 4),
                "batch_n_queries": len(workload),
                "scale2": scale2,
                "scale3": scale3,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
