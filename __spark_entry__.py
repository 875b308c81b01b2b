"""Driver contract for the spark-graft builder (PySpark target).

Engine side: every query runs through bzzz_spark's REAL code path —
index build (SPIMI + varint blocks) then the AST executor — over the
driver's parquet tables.  Oracle side: hand-derived ANSI SQL for DuckDB
computing the same result from first principles (tokenize → tf/df →
BM25), so the comparison crosses two independent implementations.

Column-name discipline: every computed column is aliased identically in
the Spark result and the oracle SQL (the driver hashes values after
sorting columns by name).  Scores are rounded to 4 decimals on both
sides (both engines do float64 BM25; cross-engine libm differences are
~1e-15, far below the rounding grain).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bzzz_spark import BM25_B, BM25_K1
from bzzz_spark.build.indexer import BzzzIndex, IndexConfig, build_index
from bzzz_spark.functions.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from bzzz_spark.functions.similarity import brute_force_topk, ivf_topk
from bzzz_spark.functions.text import BPE_ISH_PATTERN, STOPWORDS, text_profile
from bzzz_spark.query import ast
from bzzz_spark.query.executor import execute, facet_counts, search

TOK = r"[\p{L}\p{N}_]+"
K1P1 = BM25_K1 + 1.0

_IDX_CACHE: dict = {}


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _index(spark: SparkSession, sf_dir: str) -> BzzzIndex:
    """Build (once per sf_dir per session) the inverted index over the
    documents table.  doc_id is dense and unique, so docid == doc_id."""
    key = (id(spark), sf_dir)
    if key not in _IDX_CACHE:
        # deterministic synthetic coordinates (the corpus ships none):
        # the spatial operators need a lat/lon pair per doc, derived
        # identically here and in the DuckDB oracle
        docs_in = (
            _documents(spark, sf_dir)
            .withColumn(
                "lat", ((F.col("doc_id") * 7 % 160) - 80 + 0.25).cast("double")
            )
            .withColumn(
                "lon", ((F.col("doc_id") * 13 % 340) - 170 + 0.25).cast("double")
            )
        )
        idx = build_index(
            docs_in,
            IndexConfig(
                key_cols=("doc_id",), text_col="text", ts_col=None,
                block_size=128, segment_size=1024, store_positions=True,
                extra_fields=(("lang", "keyword"), ("source", "keyword")),
                # inline n_chars doc-values (r4, late): contract ranges
                # (q_filtered_range, q_batch/b_range) ride the kernel's
                # inline-dv path instead of the docs-table plan — same
                # results, the plan the engine serves at scale
                docvalue_cols=("n_chars",),
            ),
        )
        idx.docs.cache().count()
        idx.dictionary.cache().count()
        idx.postings.cache().count()
        _IDX_CACHE[key] = idx
    return _IDX_CACHE[key]


def _local_index(spark: SparkSession, sf_dir: str):
    """Persist the contract index to the on-disk serving layout (once
    per sf_dir per session) and open it with the in-process reader."""
    import tempfile

    from bzzz_spark.build.checkpoint import write_index
    from bzzz_spark.serve.local import LocalIndex

    key = ("local", id(spark), sf_dir)
    if key not in _IDX_CACHE:
        out = tempfile.mkdtemp(prefix="bzzz_entry_serve_")
        write_index(_index(spark, sf_dir), out)
        _IDX_CACHE[key] = LocalIndex(out)
    return _IDX_CACHE[key]


def _sharded_index(spark: SparkSession, sf_dir: str):
    """3-shard serving build over the contract documents table (once
    per sf_dir per session): global-stats shards + exact merge, so its
    hits must equal the single index's — and the DuckDB oracle's."""
    import tempfile

    from bzzz_spark.build.indexer import IndexConfig
    from bzzz_spark.serve.scatter import ShardedIndex, build_sharded

    key = ("sharded", id(spark), sf_dir)
    if key not in _IDX_CACHE:
        out = tempfile.mkdtemp(prefix="bzzz_entry_shards_")
        docs = _documents(spark, sf_dir)
        build_sharded(
            docs, out, 3,
            IndexConfig(key_cols=("doc_id",), text_col="text", ts_col=None,
                        segment_size=1 << 12, num_partitions=8,
                        store_positions=True),
        )
        _IDX_CACHE[key] = ShardedIndex(out)
    return _IDX_CACHE[key]


def _hits(index: BzzzIndex, node, size: int = 10, page: int = 0) -> DataFrame:
    return search(index, node, size=size, page=page).select(
        F.col("docid").alias("doc_id"), F.round("score", 4).alias("score")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conjunctive BM25 top-k with a must-not, over sf0.001."""
    idx = _index(spark, "/root/testdata/sf0.001")
    node = ast.Bool(
        must=[ast.Term("scan"), ast.Term("agg")], must_not=[ast.Term("dup")]
    )
    return _hits(idx, node, size=10)


# ---------------------------------------------------------------- oracle SQL
# Shared CTE prefix: tokenize → tf → dl → stats → df, all from first
# principles in DuckDB (independent of the engine's index structures).

_BASE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOK}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (
  SELECT d.doc_id, coalesce(t.dl, 0) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1) t USING (doc_id)
),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
"""


def _score_expr(tf="tf.tf", dl="dl.dl", df="dfx.df") -> str:
    return (
        f"ln(1.0 + (stats.n - {df} + 0.5) / ({df} + 0.5)) * "
        f"(({tf}) * {K1P1} / (({tf}) + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * ({dl}) / stats.avgdl)))"
    )


def _term_scores(terms: list[str]) -> str:
    """Per-doc summed BM25 over the given terms + per-doc matched count."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""scores AS (
  SELECT tf.doc_id, sum({_score_expr()}) AS score, count(*) AS nmatch
  FROM tf
  JOIN dfx USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  WHERE tf.term IN ({tlist})
  GROUP BY tf.doc_id
)"""


def _topk(inner: str, k: int, offset: int = 0) -> str:
    return f"""SELECT doc_id, round(score, 4) AS score FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rn
  FROM ({inner})
) WHERE rn > {offset} AND rn <= {offset + k}"""


# ------------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- search operators (SURVEY.md §2.3/§2.4/§2.5) ---
    def q_terms(spark, sf):
        # head + rare single-term top-k, folded into one row (r4: funds
        # q_local_serve at the 50-row ceiling)
        idx = _index(spark, sf)
        return (
            _hits(idx, ast.Term("merge"), size=10)
            .withColumn("part", F.lit("head"))
            .unionByName(
                _hits(idx, ast.Term("dup"), size=10)
                .withColumn("part", F.lit("rare"))
            )
        )

    def q_local_serve(spark, sf):
        # the in-process serving runtime (bzzz_spark/serve/local.py):
        # Spark builds + write_index persists the serving layout, then
        # LocalIndex answers via pyarrow + the SAME numpy kernels with
        # zero Spark jobs — the reference's long-lived in-process
        # searcher shape.  Each member must be rank/score-identical to
        # the engine AND to the DuckDB oracle (UNION ALL of the member
        # oracles), so the contract pins cross-RUNTIME parity, not just
        # cross-engine.
        import pandas as pd

        from bzzz_spark.serve.local import local_search

        lix = _local_index(spark, sf)
        members = {
            "ls_term": ast.Term("merge"),
            "ls_and2": ast.Bool(must=[ast.Term("scan"), ast.Term("filter")]),
            "ls_not": ast.Bool(
                must=[ast.Term("merge")], must_not=[ast.Term("dup")]
            ),
            "ls_msm": ast.Bool(
                should=[ast.Term("dup"), ast.Term("window"),
                        ast.Term("stream")],
                minimum_should_match=2,
            ),
            "ls_phrase": ast.Bool(
                must=[ast.Term("scan"), ast.Phrase(["filter", "merge"])]
            ),
            "ls_range": ast.Bool(
                must=[ast.Term("merge"),
                      ast.Range("n_chars", min=200, max=400)]
            ),
            "ls_wild": ast.Bool(
                must=[ast.Term("merge"), ast.Wildcard("du*")]
            ),
            "ls_dismax": ast.DisMax(
                queries=[
                    ast.Term("merge"),
                    ast.Phrase(["filter", "merge"]),
                    ast.Wildcard("du*"),
                ],
                tie_breaker=0.3,
            ),
        }
        parts = []
        for name, node in members.items():
            pdf = local_search(lix, node, size=10)
            parts.append(pdf.assign(query_id=name))
        # the THIRD runtime: the same queries through the multi-shard
        # coordinator (serve/scatter.py — 3 global-stats shards + exact
        # k-way merge); hits must equal the single index's AND DuckDB's
        six = _sharded_index(spark, sf)
        for name, node in {
            "sh_term": members["ls_term"],
            "sh_and2": members["ls_and2"],
            "sh_phrase": members["ls_phrase"],
            "sh_dismax": members["ls_dismax"],
        }.items():
            pdf = six.search(node, size=10)[["docid", "score"]]
            parts.append(pdf.assign(query_id=name))
        allp = pd.concat(parts, ignore_index=True)
        allp["score"] = allp["score"].round(4)
        allp = allp.rename(columns={"docid": "doc_id"})
        return spark.createDataFrame(
            allp[["query_id", "doc_id", "score"]],
            "query_id string, doc_id long, score double",
        )

    def q_and2(spark, sf):
        node = ast.Bool(must=[ast.Term("scan"), ast.Term("filter")])
        return _hits(_index(spark, sf), node, size=10)

    def q_and3_skew(spark, sf):
        node = ast.Bool(must=[ast.Term("batch"), ast.Term("scan"), ast.Term("dup")])
        return _hits(_index(spark, sf), node, size=10)

    def q_must_not(spark, sf):
        node = ast.Bool(must=[ast.Term("merge")], must_not=[ast.Term("dup")])
        return _hits(_index(spark, sf), node, size=10)

    def q_should_msm2(spark, sf):
        node = ast.Bool(
            should=[ast.Term("dup"), ast.Term("window"), ast.Term("stream")],
            minimum_should_match=2,
        )
        return _hits(_index(spark, sf), node, size=10)

    def q_filtered_range(spark, sf):
        node = ast.Filtered(
            query=ast.Term("merge"), filter=ast.Range("n_chars", min=200, max=400)
        )
        return _hits(_index(spark, sf), node, size=10)

    def q_match_all(spark, sf):
        return _hits(_index(spark, sf), ast.MatchAll(), size=20)

    def q_paging(spark, sf):
        return _hits(_index(spark, sf), ast.Term("merge"), size=5, page=1)

    def q_const_nozero(spark, sf):
        # Q10 constant-score + Q15 no-zero-score folded into ONE
        # contract entry (50-row budget; same UNION-ALL pattern as
        # e_batch) — part='const' wraps a term in a fixed boost,
        # part='nozero' drops zero-scored hits of an expr-score
        idx = _index(spark, sf)
        cs = _hits(
            idx, ast.ConstantScore(ast.Term("dup"), boost=2.5), size=20
        ).select(F.lit("const").alias("part"), "doc_id", "score")
        nz = _hits(
            idx,
            ast.NoZeroScore(
                ast.CustomScore(
                    ast.Term("merge"),
                    expression="greatest(cast(n_chars as double) - 300.0, 0.0)",
                    replace=True,
                )
            ),
            size=20,
        ).select(F.lit("nozero").alias("part"), "doc_id", "score")
        return cs.unionByName(nz)

    def q_dismax(spark, sf):
        node = ast.DisMax(
            queries=[ast.Term("merge"), ast.Term("filter")], tie_breaker=0.3
        )
        return _hits(_index(spark, sf), node, size=10)

    def q_phrase(spark, sf):
        # part='exact' — PhraseQuery: exact adjacency over positional
        # postings; score = (Σ idf) × tfc(phrase_freq, dl) — Lucene's
        # PhraseWeight model.  part='opt' (r4) — the same phrase as an
        # OPTIONAL clause of a required term (ReqOptSumScorer): every
        # scan-doc matches, the phrase adds its score where present;
        # the kernel runs the positional evaluation restricted to
        # scan's candidates
        idx = _index(spark, sf)
        ex = _hits(idx, ast.Phrase(["filter", "merge"]), size=10).select(
            F.lit("exact").alias("part"), "doc_id", "score"
        )
        op = _hits(
            idx,
            ast.Bool(must=[ast.Term("scan")],
                     should=[ast.Phrase(["filter", "merge"])]),
            size=10,
        ).select(F.lit("opt").alias("part"), "doc_id", "score")
        # part='or' (r4) — the phrase as a DISJUNCTION clause next to a
        # term (MaxScore kernel with the phrase as a pseudo-term):
        # score = phrase BM25 + term BM25 over docs matching either
        orp = _hits(
            idx,
            ast.Bool(should=[ast.Phrase(["filter", "merge"]),
                             ast.Term("dup")]),
            size=10,
        ).select(F.lit("or").alias("part"), "doc_id", "score")
        return ex.unionByName(op).unionByName(orp)

    def q_phrase_slop(spark, sf):
        # sloppy phrase "merge filter"~2 — Lucene SloppyPhraseScorer
        # semantics: UNORDERED with 1/(1+matchLength) weighting, so the
        # corpus's adjacent "filter merge" occurrences match this
        # REVERSED query at matchLength 2.  The oracle replays the
        # scorer's greedy crossing walk as a recursive CTE.
        # part='repeat' adds the REPEATED-terms machinery (r4,
        # query/phrase_repeats.py): "merge merge"~6 — two legs of one
        # term claim distinct occurrences, which for a 2-leg same-term
        # phrase reduces to consecutive occurrence pairs with
        # matchLength = gap - 1 (closed form cross-fuzzed against both
        # collision-walk ports in tests/test_phrase.py); idf is summed
        # per leg, so the duplicated term counts twice.
        idx = _index(spark, sf)
        sl = _hits(
            idx, ast.Phrase(["merge", "filter"], slop=2), size=10
        ).select(F.lit("slop").alias("part"), "doc_id", "score")
        rp = _hits(
            idx, ast.Phrase(["merge", "merge"], slop=6), size=10
        ).select(F.lit("repeat").alias("part"), "doc_id", "score")
        return sl.unionByName(rp)

    def q_multiterm(spark, sf):
        # multi-term (dictionary-expansion) suite as ONE entry (r4 fold
        # of q_wildcard + q_fuzzy to fund d_pack at the 50-row budget).
        # part='top': top-level glob (constant-score rewrite on the
        # 'any' kernel).  part='and' (r4): the same glob INSIDE a
        # conjunction — the mixed kernel serves it as a constant-score
        # term set, so `merge AND s*` scores BM25(merge) + 1.0 and
        # never decodes expansion blocks outside merge's candidates.
        # part='fuzzy': Q8 Levenshtein expansion on the same
        # constant-score kernel.
        idx = _index(spark, sf)
        top = _hits(idx, ast.Wildcard("s*"), size=10).select(
            F.lit("top").alias("part"), "doc_id", "score"
        )
        conj = _hits(
            idx,
            ast.Bool(must=[ast.Term("merge"), ast.Wildcard("s*")]),
            size=10,
        ).select(F.lit("and").alias("part"), "doc_id", "score")
        # part='or' (r4, late): the glob as a DISJUNCTION clause — the
        # MaxScore kernel serves it as a constant-score term set
        # (contribution 1.0 if any s* term matches) next to BM25(merge)
        disj = _hits(
            idx,
            ast.Bool(should=[ast.Wildcard("s*"), ast.Term("merge")]),
            size=10,
        ).select(F.lit("or").alias("part"), "doc_id", "score")
        fz = _hits(idx, ast.Fuzzy("scan", max_edits=1), size=10).select(
            F.lit("fuzzy").alias("part"), "doc_id", "score"
        )
        return top.unionByName(conj).unionByName(disj).unionByName(fz)

    def q_field(spark, sf):
        # per-field index suite as ONE entry (50-row budget; r4 fold of
        # q_field_term + q_field_wildcard to fund d_ppl).
        # part='scored' — keyword field term (norms disabled → score is
        # the field term's idf) summed with the text BM25 score
        # (exhaustive plan: scored field terms own the no-norm scoring).
        # part='filter' — the same field term as a Filtered FILTER arm:
        # membership only, so it rides the block-max kernel via its
        # 'lang:en' dictionary key and the score is merge's BM25 alone.
        # part='wildcard' — a glob scoped to a keyword field's key
        # space (constant-score 'any' kernel).
        idx = _index(spark, sf)
        sc = _hits(
            idx,
            ast.Bool(must=[ast.Term("merge"),
                           ast.Term("en", field_name="lang")]),
            size=10,
        ).select(F.lit("scored").alias("part"), "doc_id", "score")
        fl = _hits(
            idx,
            ast.Filtered(query=ast.Term("merge"),
                         filter=ast.Term("en", field_name="lang")),
            size=10,
        ).select(F.lit("filter").alias("part"), "doc_id", "score")
        wc = _hits(
            idx, ast.Wildcard("src1*", field_name="source"), size=10
        ).select(F.lit("wildcard").alias("part"), "doc_id", "score")
        return sc.unionByName(fl).unionByName(wc)

    def q_batch(spark, sf):
        # batched multi-query execution: 8 queries, ONE postings scan,
        # ONE shuffle, ONE Spark job (bzzz_spark/query/batch.py) — the
        # scale answer to Spark's fixed per-job overhead.  Each
        # query_id's rows are exactly what search() returns for it;
        # the oracle is the UNION ALL of the per-query oracles.
        from bzzz_spark.query.batch import search_many

        batch = {
            "b_term": ast.Term("merge"),
            "b_and2": ast.Bool(must=[ast.Term("scan"), ast.Term("filter")]),
            "b_not": ast.Bool(
                must=[ast.Term("merge")], must_not=[ast.Term("dup")]
            ),
            "b_msm": ast.Bool(
                should=[ast.Term("dup"), ast.Term("window"), ast.Term("stream")],
                minimum_should_match=2,
            ),
            "b_field": ast.Bool(
                must=[ast.Term("merge"), ast.Term("en", field_name="lang")]
            ),
            # Range leaf → the batch's shared docs scan (score := boost)
            "b_range": ast.Bool(
                must=[ast.Term("merge"), ast.Range("n_chars", min=200, max=400)]
            ),
            # mixed must+should (Lucene ReqOptSumScorer): required term
            # drives matching, optionals add score, msm over optionals
            "b_req_opt": ast.Bool(
                must=[ast.Term("merge")],
                should=[ast.Term("scan"), ast.Term("window")],
                minimum_should_match=1,
            ),
            # nested-but-flat tree: rewrite.normalize flattens it onto
            # the shared scan; scores equal the flat 3-term AND
            "b_nested": ast.Bool(
                must=[
                    ast.Bool(must=[ast.Term("scan"), ast.Term("filter")]),
                    ast.Term("merge"),
                ]
            ),
            # phrase leaf on the batch's SHARED positional scan (r4,
            # late): one mapInPandas evaluates every phrase in the
            # batch; score = BM25(scan) + (Σ leg idf)·tfc(ptf, dl)
            "b_phrase": ast.Bool(
                must=[ast.Term("scan"),
                      ast.Phrase(["filter", "merge"])]
            ),
            # wildcard leaf in a conjunction (r4, late): the dictionary
            # expansion rides the batch's shared postings decode as a
            # constant-score term set — score = BM25(merge) + 1.0 on
            # docs matching ANY 'du*' term
            "b_wild": ast.Bool(
                must=[ast.Term("merge"), ast.Wildcard("du*")]
            ),
            # required disjunction groups (r4, late) — the synonym-
            # expansion shape "(scan OR filter) AND (merge OR dup)":
            # normalize hoists group 1 into msm-gated optionals, group
            # 2 rides the mixed conjunction kernel as a required 'g'
            # conjunct; inside the batch the shape takes the per-query
            # kernel path (batch.py rest loop)
            "b_groups": ast.Bool(must=[
                ast.Bool(should=[ast.Term("scan"), ast.Term("filter")]),
                ast.Bool(should=[ast.Term("merge"), ast.Term("dup")]),
            ]),
            # mixed dis-max (r4, late): Term / Phrase / Wildcard members
            # all emit role-d contributions on the SAME shared scan;
            # combiner max + tie*(sum - max) runs in the one groupBy
            "b_dismax": ast.DisMax(
                queries=[
                    ast.Term("merge"),
                    ast.Phrase(["filter", "merge"]),
                    ast.Wildcard("du*"),
                ],
                tie_breaker=0.3,
            ),
        }
        return search_many(_index(spark, sf), batch, size=10).select(
            "query_id",
            F.col("docid").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )

    def q_score_exprs(spark, sf):
        # Q12 custom-score + Q13 expr-score folded into ONE contract
        # entry (50-row budget; the q_const_nozero pattern) to fund
        # d_dsir — part='custom' multiplies BM25 by the expression,
        # part='expr' REPLACES the score with it
        idx = _index(spark, sf)
        cu = _hits(
            idx,
            ast.CustomScore(ast.Term("merge"), expression="sqrt(n_chars)"),
            size=10,
        ).select(F.lit("custom").alias("part"), "doc_id", "score")
        ex = _hits(
            idx,
            ast.CustomScore(
                ast.Term("merge"), expression="ln(1.0 + n_chars)",
                replace=True,
            ),
            size=10,
        ).select(F.lit("expr").alias("part"), "doc_id", "score")
        return cu.unionByName(ex)

    def q_no_norm(spark, sf):
        # Q16: length-norm disabled → BM25 with b = 0
        return _hits(_index(spark, sf), ast.NoNorm(ast.Term("merge")), size=10)

    def q_random_score(spark, sf):
        # Q14, pinned seed: score = base + md5-derived per-doc rand
        node = ast.RandomScore(ast.Term("dup"), base=1.0, seed=7)
        return _hits(_index(spark, sf), node, size=20)

    def q_parser(spark, sf):
        # Q9: Lucene-classic query-string syntax → AST → same executor
        from bzzz_spark.query.parser import parse_query_string

        node = parse_query_string("scan AND (dup OR window)")
        return _hits(_index(spark, sf), node, size=10)

    def q_sorts(spark, sf):
        # T3 + T4 as ONE contract entry (50-row budget; same UNION-ALL
        # pattern as e_batch): part='field' = top-k by stored field,
        # part='expr' = top-k by a SQL expression over stored fields
        from bzzz_spark.query.executor import sorted_search

        by_field = sorted_search(
            _index(spark, sf), ast.Term("merge"), sort=[("n_chars", "desc")],
            size=10, fields=["n_chars"],
        ).select(
            F.lit("field").alias("part"),
            F.col("docid").alias("doc_id"), "n_chars",
        )
        by_expr = sorted_search(
            _index(spark, sf), ast.Term("scan"),
            sort=[{"expression": "n_chars % 7", "order": "asc"}],
            size=10, fields=["n_chars"],
        ).select(
            F.lit("expr").alias("part"),
            F.col("docid").alias("doc_id"), "n_chars",
        )
        return by_field.unionByName(by_expr)

    def q_explain(spark, sf):
        # R3: per-hit per-term BM25 component breakdown
        from bzzz_spark.query.explain import explain_search

        node = ast.Bool(must=[ast.Term("scan"), ast.Term("agg")])
        ex = explain_search(_index(spark, sf), node, size=5)
        part = F.explode("_explain").alias("p")
        return ex.select(F.col("docid").alias("doc_id"), part).select(
            "doc_id",
            F.col("p.term").alias("term"),
            F.col("p.tf").alias("tf"),
            F.round("p.idf", 4).alias("idf"),
            F.round("p.term_score", 4).alias("term_score"),
        )

    def q_highlight(spark, sf):
        # R2, offsets-checked: with fragment_size >= any doc length each
        # hit yields ONE fragment starting at the first token match and
        # spanning to end-of-text, so (start, end, n_matches) are exactly
        # SQL-expressible (DuckDB prefix-length regex).  The fragment
        # TEXT (tag wrapping) is pinned by pytest against the pure-Python
        # highlighter instead.
        from bzzz_spark.query.highlight import search_with_highlight

        hl = search_with_highlight(
            _index(spark, sf), ast.Term("dup"), size=5, fragment_size=100000
        )
        frag = F.explode("_highlight").alias("f")
        return hl.select(F.col("docid").alias("doc_id"), frag).select(
            "doc_id", "f.start", "f.end",
            F.col("f.score").cast("long").alias("n_matches"),
        )

    def q_spatial(spark, sf):
        # Q18 circle filter + T5 distance sort over the synthetic
        # lat/lon columns (reference index_spatial.clj:29-32,
        # expr.clj:19-23)
        from bzzz_spark.query.spatial import spatial_filter_search

        sp = spatial_filter_search(
            _index(spark, sf), ast.Term("merge"), center=(10.25, 20.25),
            radius_m=3_000_000, size=10, sort_by_distance=True,
        )
        return sp.select(
            F.col("docid").alias("doc_id"),
            F.round("score", 4).alias("score"),
            F.round("distance_m", 3).alias("distance_m"),
        )

    def q_facets(spark, sf):
        # F1 faceting as ONE contract entry (50-row budget; same
        # UNION-ALL pattern as e_batch):
        #   part='lang'    single-dim doc counts over the matched set
        #   part='multi'   two dims counted in ONE pass (dim, label)
        #   part='tokens'  `use-analyzer` token faceting: labels are
        #                  analyzed tokens, counted per occurrence
        #                  (reference index_store.clj:86-93)
        from bzzz_spark.query.executor import facet_counts_multi

        idx = _index(spark, sf)
        lang = facet_counts(idx, ast.Term("dup"), "lang", size=10).select(
            F.lit("lang").alias("part"), F.lit("lang").alias("dim"),
            F.col("lang").alias("label"), "cnt",
        )
        multi = facet_counts_multi(
            idx, ast.Term("merge"), ["lang", "source"], size=5
        ).select(F.lit("multi").alias("part"), "dim", "label", "cnt")
        tokens = facet_counts_multi(
            idx, ast.Term("dup"), ["text"], size=10, use_analyzer=True,
        ).select(F.lit("tokens").alias("part"), "dim", "label", "cnt")
        return lang.unionByName(multi).unionByName(tokens)

    def q_total_hits(spark, sf):
        return (
            execute(_index(spark, sf), ast.Bool(must=[ast.Term("scan"),
                                                      ast.Term("agg")]))
            .agg(F.count(F.lit(1)).alias("total"))
        )

    def q_index_meta(spark, sf):
        # S10 index metadata as ONE entry (50-row budget):
        #   part='dict'   full term dictionary (term, df, cf)
        #   part='stats'  corpus stats (n_docs, avgdl) folded into the
        #                 same shape: key='', df=n_docs, x=avgdl
        idx = _index(spark, sf)
        d = idx.dictionary.select(
            F.lit("dict").alias("part"), F.col("term").alias("key"),
            "df", "cf", F.lit(None).cast("double").alias("x"),
        )
        s = idx.stats.select(
            F.lit("stats").alias("part"), F.lit("").alias("key"),
            F.col("n_docs").cast("long").alias("df"),
            F.lit(None).cast("long").alias("cf"),
            F.round("avgdl", 6).alias("x"),
        )
        return d.unionByName(s)

    # --- training-data pipeline operators ---
    def d_dedup_exact(spark, sf):
        # union a deterministic duplicate block so the check is
        # non-vacuous (the synthetic corpus has no natural exact dups)
        docs = _documents(spark, sf)
        dups = docs.filter(F.col("doc_id") < 20).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
        return exact_duplicates(docs.unionByName(dups)).select(
            "fp", "canonical_id", "n_dups"
        )

    def d_near_dup_cosine(spark, sf):
        # embedding-cosine near-dup; nlist=1 → exact all-pairs (the
        # oracle-checkable configuration; nlist>1 is the scale path)
        from bzzz_spark.functions.similarity import cosine_near_dup_pairs

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        # the synthetic embeddings have no true dups (max pairwise cos
        # ≈ 0.51) — 0.45 keeps the check non-vacuous
        return cosine_near_dup_pairs(emb, threshold=0.45, nlist=1)

    def d_minhash_lsh(spark, sf):
        return minhash_lsh_pairs(
            _documents(spark, sf), num_hashes=8, bands=4, shingle_n=3
        )

    def d_jaccard(spark, sf):
        return ngram_jaccard_pairs(
            _documents(spark, sf), shingle_n=3, threshold=0.03
        )

    def d_simhash(spark, sf):
        return simhash(_documents(spark, sf)).select(
            F.col("id").alias("doc_id"), "simhash"
        )

    def d_spans(spark, sf):
        # span-level dedup suite as ONE contract entry (50-row budget;
        # same UNION-ALL pattern as e_batch): Lee et al. exact-substring
        # dedup at n-gram granularity —
        #   part='span'  one row per merged repeated span [start, end)
        #   part='frac'  repeated_token_frac per flagged doc
        #   part='clean' strip_repeated_spans text_clean (flagged docs
        #                + a pinned passthrough sample)
        #   part='intra' Gopher-style within-doc repetition signal
        # The corpus unions deterministic "quoter" docs copying each
        # low-id doc's first 20 tokens so the flagging is non-vacuous
        # on the synthetic corpus (it has no natural exact 8-grams).
        from bzzz_spark.analysis.tokenizer import standard_tokenize
        from bzzz_spark.functions.dedup import (
            repeated_ngram_spans,
            strip_repeated_spans,
        )
        from bzzz_spark.functions.text import intra_doc_repetition

        docs = _documents(spark, sf).select("doc_id", "text")
        quoters = docs.filter(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(
                F.array_join(
                    F.slice(standard_tokenize(F.col("text")), 1, 20), " "
                ),
                F.lit(" zqx"),
                (F.col("doc_id") % 7).cast("string"),
            ).alias("text"),
        )
        corpus = docs.unionByName(quoters)
        spans = repeated_ngram_spans(corpus, n=8, min_df=2)
        span_rows = spans.select(
            "doc_id", F.explode("spans").alias("s")
        ).select(
            F.lit("span").alias("part"),
            F.concat_ws(":", F.col("doc_id"), F.col("s.start")).alias("key"),
            F.col("s.end").cast("double").alias("val"),
            F.lit("").alias("txt"),
        )
        frac_rows = spans.select(
            F.lit("frac").alias("part"),
            F.col("doc_id").cast("string").alias("key"),
            F.round("repeated_token_frac", 6).alias("val"),
            F.lit("").alias("txt"),
        )
        clean_rows = strip_repeated_spans(corpus, n=8, min_df=2).filter(
            (F.col("repeated_token_frac") > 0) | (F.col("doc_id") < 5)
        ).select(
            F.lit("clean").alias("part"),
            F.col("doc_id").cast("string").alias("key"),
            F.round("repeated_token_frac", 6).alias("val"),
            F.col("text_clean").alias("txt"),
        )
        intra_rows = docs.filter(F.col("doc_id") < 200).select(
            F.lit("intra").alias("part"),
            F.col("doc_id").cast("string").alias("key"),
            F.round(intra_doc_repetition("text", n=3), 6).alias("val"),
            F.lit("").alias("txt"),
        )
        return (
            span_rows.unionByName(frac_rows)
            .unionByName(clean_rows)
            .unionByName(intra_rows)
        )

    def d_decontam(spark, sf):
        # LLM-pipeline decontamination (GPT-3 appendix C style n-gram
        # collision filter): the benchmark is synthesized
        # deterministically from the corpus itself — a 12-token window
        # lifted from every 13th doc — so collisions are non-vacuous
        # and the oracle can rebuild the exact same benchmark in SQL.
        from bzzz_spark.analysis.tokenizer import standard_tokenize
        from bzzz_spark.functions.dedup import decontaminate

        docs = _documents(spark, sf).select("doc_id", "text")
        bench = docs.filter(F.col("doc_id") % 13 == 2).select(
            F.array_join(
                F.slice(standard_tokenize(F.col("text")), 4, 12), " "
            ).alias("text")
        )
        return decontaminate(docs, bench, n=8)

    def s_similarity(spark, sf):
        # brute-force + IVF similarity as ONE contract entry (50-row
        # budget; same UNION-ALL pattern as e_batch):
        #   part='brute'  exact cosine top-5 for 3 query vectors
        #   part='ivf'    IVF with nprobe == nlist → must reproduce
        #                 brute force exactly (the plumbing check)
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        qs = [
            (int(r["vec_id"]), list(r["embedding"]))
            for r in emb.filter(F.col("vec_id") < 3).collect()
        ]
        brute = brute_force_topk(emb, qs, k=5).select(
            F.lit("brute").alias("part"), "query_id", "vec_id", "cos", "rank"
        )
        ivf = ivf_topk(
            emb, [q for q in qs if q[0] < 2], k=5, nlist=8, nprobe=8
        ).select(
            F.lit("ivf").alias("part"), "query_id", "vec_id", "cos", "rank"
        )
        return brute.unionAll(ivf)

    def d_clusters(spark, sf):
        # cluster resolution: the stage AFTER pair generation — near-dup
        # pairs → connected components (large-star/small-star) → one
        # canonical doc per duplicate cluster.
        #   part='cc'    (doc_id, cluster_id) for every doc in a pair;
        #                cluster_id = min doc id in the component
        #   part='keep'  the keep_canonical survivor set over the FULL
        #                corpus (singletons pass through; each cluster
        #                keeps its min doc_id)
        from bzzz_spark.functions.dedup import dedup_clusters, keep_canonical

        docs = _documents(spark, sf).select("doc_id", "text")
        pairs = minhash_lsh_pairs(
            docs, num_hashes=8, bands=4, shingle_n=3
        ).localCheckpoint(eager=True)
        cc = dedup_clusters(docs, pairs, include_singletons=False).select(
            F.lit("cc").alias("part"), "doc_id", "cluster_id"
        )
        kept = keep_canonical(docs, pairs).select(
            F.lit("keep").alias("part"),
            "doc_id",
            F.col("doc_id").alias("cluster_id"),
        )
        return cc.unionAll(kept)

    def d_pii(spark, sf):
        # PII scrub report: counts per category + redacted text.  The
        # synthetic corpus has no natural PII, so union a deterministic
        # block whose PII is derived from doc_id (non-vacuous check;
        # both engines synthesize the same rows).
        from bzzz_spark.functions.pii import pii_profile

        docs = _documents(spark, sf).select("doc_id", "text")
        pii = docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com or 10.0."),
                (F.col("doc_id") % 256).cast("string"), F.lit(".7 tel +1 415-555-01"),
                F.lpad(F.col("doc_id").cast("string"), 2, "0"),
            ).alias("text"),
        )
        return pii_profile(docs.unionByName(pii)).drop("text")

    def d_clean(spark, sf):
        # C4 line filtering + Gopher quality flags in one pass.  The
        # synthetic corpus is single-line with no terminal punctuation
        # (every natural doc keeps 0 lines), so union a deterministic
        # multi-line block derived from doc_id: a too-short line, a
        # javascript boilerplate line, an unpunctuated bullet, one good
        # sentence, and doc_id-gated lorem-ipsum / curly-brace tails.
        from bzzz_spark.functions.cleaning import c4_clean, gopher_flags

        docs = _documents(spark, sf).select("doc_id", "text")
        aug = docs.filter(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 3000000).alias("doc_id"),
            F.concat(
                F.col("text"),
                F.lit("\nshort line"
                      "\nThis page requires Javascript to view properly."
                      "\n- bullet item without punctuation"
                      "\nA good closing sentence with plenty of words"
                      " here."),
                F.when(F.col("doc_id") % 3 == 0,
                       F.lit("\nlorem ipsum dolor sit amet etc.")
                       ).otherwise(F.lit("")),
                F.when(F.col("doc_id") % 5 == 0,
                       F.lit("\ncode { sample } trailing...")
                       ).otherwise(F.lit("")),
            ).alias("text"),
        )
        return gopher_flags(c4_clean(docs.unionByName(aug))).drop("text")

    def d_ppl(spark, sf):
        # CCNet-style quality signal (functions/lm.py): train the add-k
        # bigram LM on the documents corpus itself, score every doc's
        # mean token log-probability + perplexity.  min_count=2
        # exercises the count-cutoff path (singleton bigrams score as
        # unseen); join mode is the SQL-mirrorable plan the oracle
        # replays.  Docs with < 2 tokens drop out (nothing to score) —
        # the oracle's GROUP BY has the same inner semantics.
        from bzzz_spark.functions.lm import perplexity, train_bigram_lm

        docs = _documents(spark, sf).select("doc_id", "text")
        lm = train_bigram_lm(docs, k=0.5, min_count=2)
        out = perplexity(docs, lm, mode="join")
        return out.filter(F.col("n_scored_bigrams") >= 1).select(
            "doc_id",
            "n_scored_bigrams",
            F.round("logprob_per_token", 4).alias("logprob_per_token"),
            F.round("perplexity", 4).alias("perplexity"),
        )

    def d_dsir(spark, sf):
        # DSIR data selection (functions/dsir.py, Xie et al. 2023):
        # hashed unigram+bigram importance ratios between a target
        # subset (doc_id % 7 == 0 — deterministic, ~14% of the corpus)
        # and the full corpus, add-k smoothed over 512 md5 buckets.
        #   part='weight'  every doc's gram count + summed log-ratio
        #   part='select'  Gumbel-top-20 resample (seeded, md5-keyed)
        # join mode is the SQL-mirrorable plan the oracle replays.
        from bzzz_spark.functions.dsir import (
            gumbel_key, importance_weight, train_ngram_importance,
        )

        docs = _documents(spark, sf).select("doc_id", "text")
        model = train_ngram_importance(
            docs.filter(F.col("doc_id") % 7 == 0), docs,
            n_buckets=512, k=0.25,
        )
        scored = importance_weight(docs, model, mode="join")
        weight = scored.select(
            F.lit("weight").alias("part"), "doc_id", "n_grams",
            F.round("log_importance_weight", 4).alias("w"),
        )
        keyed = scored.withColumn(
            "__key",
            F.col("log_importance_weight") + gumbel_key("doc_id", "dsir"),
        )
        sel = (
            keyed.orderBy(F.col("__key").desc(), F.col("doc_id").asc())
            .limit(20)
            .select(
                F.lit("select").alias("part"), "doc_id", "n_grams",
                F.round("__key", 4).alias("w"),
            )
        )
        return weight.unionByName(sel)

    def d_pack(spark, sf):
        # deterministic concat-and-chunk sequence packing (the
        # GPT/Llama pre-training shape, functions/packing.py): docs are
        # md5(seed:key)-ordered, token offsets come from a bucketed
        # two-level prefix-sum (NO single-partition window), and each
        # doc maps onto fixed-length 256-token training sequences — one
        # row per (sequence, doc-slice), every value a pure function of
        # (seed, doc_id, n_tokens).
        from bzzz_spark.functions.packing import pack_sequences

        return pack_sequences(
            _documents(spark, sf).select("doc_id", "text"),
            256,
            "doc_id",
            text_col="text",
            seed="pk",
        )

    def d_sample(spark, sf):
        # deterministic sampling/splitting/mixing/ordering as ONE entry:
        #   part='sample'  hash_sample keep-set at rate 0.25
        #   part='split'   train/eval assignment at eval_frac 0.125
        #   part='mix'     two-source weighted mixture (0.5 / 0.3),
        #                  label = source tag
        #   part='order'   first 50 docs of the deterministic global
        #                  shuffle, label = rank (ordering made
        #                  hashable via an explicit rank column)
        from pyspark.sql import Window

        from bzzz_spark.functions.sampling import (
            assign_split, hash_sample, mix_corpora,
        )

        docs = _documents(spark, sf).select("doc_id")
        sample = hash_sample(docs, 0.25, "doc_id").select(
            F.lit("sample").alias("part"), "doc_id",
            F.lit("kept").alias("label"),
        )
        split = assign_split(docs, "doc_id", eval_frac=0.125).select(
            F.lit("split").alias("part"), "doc_id",
            F.col("split").alias("label"),
        )
        mixed = mix_corpora(
            [(docs.filter(F.col("doc_id") % 2 == 0), "even", 0.5),
             (docs.filter(F.col("doc_id") % 2 == 1), "odd", 0.3)],
        ).select(
            F.lit("mix").alias("part"), "doc_id",
            F.col("source_name").alias("label"),
        )
        h = F.md5(F.concat(F.lit("bzzz-shuffle:"),
                           F.col("doc_id").cast("string")))
        order = (
            docs.withColumn(
                "rank",
                F.row_number().over(Window.orderBy(h.asc(),
                                                   F.col("doc_id").asc())),
            )
            .filter(F.col("rank") <= 50)
            .select(F.lit("order").alias("part"), "doc_id",
                    F.col("rank").cast("string").alias("label"))
        )
        return sample.unionByName(split).unionByName(mixed).unionByName(order)

    # --- events table: log-search over a derived text column ---
    def _events_index(spark, sf):
        key = (id(spark), sf, "events")
        if key not in _IDX_CACHE:
            ev = spark.read.parquet(f"{sf}/events.parquet").withColumn(
                "etext", F.concat_ws(" ", F.col("event_type"), F.col("props"))
            )
            idx = build_index(
                ev,
                IndexConfig(key_cols=("event_id",), text_col="etext",
                            ts_col=None, segment_size=4096),
            )
            idx.docs.cache().count()
            idx.dictionary.cache().count()
            idx.postings.cache().count()
            _IDX_CACHE[key] = idx
        return _IDX_CACHE[key]

    def e_batch(spark, sf):
        # the events-table suite as ONE contract entry (keeps the
        # registered-query count inside the driver's 50-row budget
        # without losing any operator's oracle): term top-k + filtered
        # range + facet, unified as (part, key, val) rows; the oracle
        # is the UNION ALL of the three per-part oracles
        idx = _events_index(spark, sf)
        term = _hits(idx, ast.Term("error"), size=10).select(
            F.lit("term").alias("part"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("score").alias("val"),
        )
        rng = _hits(
            idx,
            ast.Filtered(
                query=ast.Term("click"),
                filter=ast.Range("value", min=5.0, max=50.0),
            ),
            size=10,
        ).select(
            F.lit("range").alias("part"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("score").alias("val"),
        )
        fac = facet_counts(
            idx, ast.Range("value", min=20.0), "event_type", size=10
        ).select(
            F.lit("facet").alias("part"),
            F.col("event_type").alias("key"),
            F.col("cnt").cast("double").alias("val"),
        )
        return term.unionByName(rng).unionByName(fac)

    def a_grams(spark, sf):
        # A5 + A6 in one contract entry (50-row budget): edge-ngrams
        # over `source` tagged kind='edge', all char n-grams over
        # `lang` tagged kind='ngram'; oracle = UNION ALL of the two
        from bzzz_spark.analysis.analyzers import tok_edge_ngram, tok_ngram

        docs = _documents(spark, sf)
        edge = (
            docs.select(
                F.explode(tok_edge_ngram(F.col("source"), 2, 4)).alias("gram")
            )
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit("edge").alias("kind"), "gram", "cnt")
        )
        ng = (
            docs.select(F.explode(tok_ngram(F.col("lang"), 2, 3)).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit("ngram").alias("kind"), "gram", "cnt")
        )
        return edge.unionByName(ng)

    def _event_payloads(spark, sf):
        # A9 shape: 'term|int' pairs — synthesized deterministically from
        # the events table (event_type carries floor(value) as payload)
        from bzzz_spark.analysis.payloads import delimited_payload_tokenize

        ev = spark.read.parquet(f"{sf}/events.parquet").select(
            F.col("event_id").alias("docid"),
            F.concat(
                F.col("event_type"), F.lit("|"),
                F.floor("value").cast("int").cast("string"),
            ).alias("ptext"),
        )
        return delimited_payload_tokenize(ev, text_col="ptext", id_col="docid")

    def p_payload_score(spark, sf):
        # Q17 deterministic subset: registered Python scoring fn over
        # per-position payloads
        from bzzz_spark.analysis.payloads import payload_score_search

        hits, _ = payload_score_search(
            _event_payloads(spark, sf), None, "click",
            score_fn=lambda c: sum(
                int.from_bytes(p, "big") for p in c["payloads"]
            ),
            size=10,
        )
        return hits.select(
            F.col("docid").alias("doc_id"), F.round("score", 4).alias("score")
        )

    def p_payload_state(spark, sf):
        # Q17 broadcast read-only global state (reference
        # EXPR_GLOBAL_STATE_RO, src/bzzz/state.clj:11-89): the scoring
        # fn reads a broadcast dict on every executor
        from bzzz_spark.analysis.payloads import payload_score_search

        hits, _ = payload_score_search(
            _event_payloads(spark, sf), None, "click",
            score_fn=lambda c, st: (
                sum(int.from_bytes(p, "big") for p in c["payloads"])
                * st["mult"] + st["base"]
            ),
            state={"mult": 2.5, "base": 3.0},
            size=10,
        )
        return hits.select(
            F.col("docid").alias("doc_id"), F.round("score", 4).alias("score")
        )

    def p_result_state(spark, sf):
        # R4 result-state: extra per-doc values emitted from the scorer
        # with the hits (reference ExpressionContext.java:196-208)
        from bzzz_spark.analysis.payloads import payload_score_search

        def pay(c):
            return sum(int.from_bytes(p, "big") for p in c["payloads"])

        hits, _ = payload_score_search(
            _event_payloads(spark, sf), None, "click",
            score_fn=lambda c: float(pay(c)),
            result_fields={"pay_mod": lambda c: pay(c) % 7},
            result_schema="pay_mod int",
            size=10,
        )
        return hits.select(
            F.col("docid").alias("doc_id"),
            F.round("score", 4).alias("score"),
            "pay_mod",
        )

    def p_payload_buckets(spark, sf):
        # F3: fixed-bucket aggregation filled from the scoring closure
        from bzzz_spark.analysis.payloads import payload_score_search

        def pay(c):
            return sum(int.from_bytes(p, "big") for p in c["payloads"])

        _, buckets = payload_score_search(
            _event_payloads(spark, sf), None, "click",
            score_fn=lambda c: float(pay(c)),
            bucket_fn=lambda c: pay(c) % 8, n_buckets=8, size=10,
        )
        return buckets

    def m_features(spark, sf):
        # multimodal: part='fake' is the format-agnostic feature path
        # over text payloads; part='png'/'wav' exercise the REAL stdlib
        # decode (zlib inflate + unfilter / wave PCM) on deterministic
        # in-test fixtures whose decoded stats have closed forms the
        # oracle computes from doc_id alone — a true end-to-end check
        # of the decoder, not the plumbing
        import pandas as pd

        from bzzz_spark.functions.multimodal import (
            attach_payload, decode_media, extract_features, synth_png,
            synth_wav,
        )

        media = attach_payload(
            _documents(spark, sf).filter(F.col("doc_id") < 50), "text", "doc_id"
        )
        fake = extract_features(media, feat_dim=8).select(
            F.lit("fake").alias("part"), "media_id",
            F.round(F.element_at("features", 1), 6).alias("v1"),
            F.lit(0.0).alias("v2"),
        )
        ids = _documents(spark, sf).filter(F.col("doc_id") < 50).select("doc_id")

        def synth(kind):
            def gen(it):
                for pdf in it:
                    mids = [int(i) for i in pdf["doc_id"]]
                    if kind == "png":
                        pay = [
                            synth_png(i % 7 + 1, i % 5 + 1, (i * 37) % 256)
                            for i in mids
                        ]
                    else:
                        pay = [
                            synth_wav((i % 50 + 1) * 10, 8000, (i * 131) % 32768)
                            for i in mids
                        ]
                    yield pd.DataFrame({"media_id": mids, "payload": pay})
            return gen

        schema = "media_id long, payload binary"
        png = decode_media(ids.mapInPandas(synth("png"), schema)).select(
            F.lit("png").alias("part"), "media_id",
            (F.col("width") * 100 + F.col("height")).cast("double").alias("v1"),
            F.round("mean_val", 6).alias("v2"),
        )
        wav = decode_media(ids.mapInPandas(synth("wav"), schema)).select(
            F.lit("wav").alias("part"), "media_id",
            F.col("n_samples").cast("double").alias("v1"),
            F.round("rms", 6).alias("v2"),
        )
        return fake.unionByName(png).unionByName(wav)

    def t_profile(spark, sf):
        # text-analysis suite as one contract entry (50-row budget):
        # part='doc' rows carry the per-doc profile (lang-id, quality,
        # token counts, fingerprint), part='source' rows the per-source
        # token rollup; sentinel '' / -1.0 instead of NULLs so the
        # driver's value hash is null-free
        from bzzz_spark.functions.text import bpe_ish_token_count, token_count

        docs = _documents(spark, sf)
        prof = text_profile(docs).select(
            F.lit("doc").alias("part"),
            F.col("doc_id").cast("string").alias("key"),
            "n_tokens", "n_bpe_tokens",
            F.lit(1).cast("long").alias("n_docs"),
            "lang_pred", "quality", "mean_word_len", "stopword_ratio",
            "punct_ratio", "fingerprint",
        )
        src = (
            docs.groupBy("source")
            .agg(
                F.sum(token_count("text")).alias("n_tokens"),
                F.sum(bpe_ish_token_count("text")).alias("n_bpe_tokens"),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .select(
                F.lit("source").alias("part"),
                F.col("source").alias("key"),
                "n_tokens", "n_bpe_tokens", "n_docs",
                F.lit("").alias("lang_pred"),
                F.lit(-1.0).alias("quality"),
                F.lit(-1.0).alias("mean_word_len"),
                F.lit(-1.0).alias("stopword_ratio"),
                F.lit(-1.0).alias("punct_ratio"),
                F.lit("").alias("fingerprint"),
            )
        )
        return prof.unionByName(src)

    q.update(
        q_terms=q_terms, q_local_serve=q_local_serve, q_and2=q_and2,
        q_and3_skew=q_and3_skew, q_must_not=q_must_not,
        q_should_msm2=q_should_msm2, q_filtered_range=q_filtered_range,
        q_match_all=q_match_all, q_paging=q_paging,
        q_const_nozero=q_const_nozero, q_dismax=q_dismax,
        q_phrase=q_phrase, q_phrase_slop=q_phrase_slop,
        q_field=q_field,
        q_multiterm=q_multiterm, q_batch=q_batch,
        q_score_exprs=q_score_exprs, q_no_norm=q_no_norm,
        q_random_score=q_random_score, q_parser=q_parser,
        q_sorts=q_sorts,
        q_explain=q_explain, q_highlight=q_highlight,
        q_facets=q_facets,
        q_spatial=q_spatial,
        p_payload_state=p_payload_state, p_result_state=p_result_state,
        q_total_hits=q_total_hits, q_index_meta=q_index_meta,
        d_dedup_exact=d_dedup_exact, d_near_dup_cosine=d_near_dup_cosine,
        d_minhash_lsh=d_minhash_lsh,
        d_jaccard=d_jaccard, d_simhash=d_simhash, d_spans=d_spans,
        d_decontam=d_decontam, d_clusters=d_clusters,
        d_pii=d_pii, d_sample=d_sample, d_clean=d_clean, d_ppl=d_ppl,
        d_dsir=d_dsir, d_pack=d_pack,
        a_grams=a_grams,
        p_payload_score=p_payload_score, p_payload_buckets=p_payload_buckets,
        m_features=m_features,
        s_similarity=s_similarity,
        t_profile=t_profile,
        e_batch=e_batch,
    )
    # the driver records at most 50 CORRECTNESS rows; every registered
    # query must get one (no silently-unchecked operators), so the
    # contract is pinned at exactly <= 50 entries — suites that would
    # overflow it (events, text-analysis, char-grams) are folded into
    # single batched entries whose oracles are UNION ALLs
    assert len(q) <= 50, f"contract over the 50-row budget: {len(q)}"
    return q


# ---------------------------------------------------------------- oracle SQL


def _shingle_cte(n: int = 3) -> str:
    leads = " || ' ' || ".join(
        ["term"] + [f"lead(term, {i}) OVER w" for i in range(1, n)]
    )
    return f"""toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l FROM documents)
),
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, {leads} AS s
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE s IS NOT NULL
)"""


def _minhash_ctes(num_hashes: int = 8, bands: int = 4) -> str:
    """CTE chain ending in mh_pairs(id_a, id_b) — shared by the
    d_minhash_lsh and d_clusters oracles."""
    r = num_hashes // bands
    sig_cols = ", ".join(
        f"min(md5('{i}:' || s)) AS m{i}" for i in range(num_hashes)
    )
    band_exprs = []
    for bi in range(bands):
        parts = " || '|' || ".join(f"m{i}" for i in range(bi * r, (bi + 1) * r))
        band_exprs.append(f"md5('band{bi}:' || {parts}) AS band{bi}")
    joins = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sigs a JOIN sigs b "
        f"ON a.band{bi} = b.band{bi} AND a.doc_id < b.doc_id"
        for bi in range(bands)
    )
    return f"""{_shingle_cte(3)},
sigs AS (
  SELECT doc_id, {', '.join(band_exprs)}
  FROM (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id)
),
mh_pairs AS (SELECT DISTINCT id_a, id_b FROM ({joins}))"""


def _minhash_sql(num_hashes: int = 8, bands: int = 4) -> str:
    return (
        f"WITH {_minhash_ctes(num_hashes, bands)}\n"
        "SELECT id_a, id_b FROM mh_pairs"
    )


def _simhash_sql(bits: int = 32) -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    return f"""WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOK}')) AS term
  FROM documents
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM tok
),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, ({assemble})::BIGINT AS simhash FROM votes"""


def _lang_sql() -> str:
    toks = f"regexp_extract_all(lower(text), '{TOK}')"
    hits = {
        lang: (
            f"len(list_filter({toks}, t -> t IN "
            f"({', '.join(repr(w) for w in STOPWORDS[lang])})))"
        )
        for lang in sorted(STOPWORDS)
    }
    best = f"greatest({', '.join(hits.values())})"
    out = "'und'"
    for lang in sorted(STOPWORDS, reverse=True):
        out = (
            f"CASE WHEN {best} > 0 AND {hits[lang]} = {best} "
            f"THEN '{lang}' ELSE {out} END"
        )
    return out


def oracle_sql() -> dict[str, str]:
    bpe_sql = BPE_ISH_PATTERN.replace("'", "''")
    en_stop = ", ".join(repr(w) for w in STOPWORDS["en"])
    toks = f"regexp_extract_all(lower(text), '{TOK}')"
    o: dict[str, str] = {}

    term_topk = f"{_BASE}, {_term_scores(['merge'])}\n{_topk('SELECT doc_id, score FROM scores', 10)}"
    term_rare = f"{_BASE}, {_term_scores(['dup'])}\n{_topk('SELECT doc_id, score FROM scores', 10)}"
    o["q_terms"] = (
        f"SELECT 'head' AS part, doc_id, score FROM ({term_topk})"
        "\nUNION ALL\n"
        f"SELECT 'rare' AS part, doc_id, score FROM ({term_rare})"
    )
    o["q_and2"] = (
        f"{_BASE}, {_term_scores(['scan', 'filter'])}\n"
        + _topk("SELECT doc_id, score FROM scores WHERE nmatch = 2", 10)
    )
    o["q_and3_skew"] = (
        f"{_BASE}, {_term_scores(['batch', 'scan', 'dup'])}\n"
        + _topk("SELECT doc_id, score FROM scores WHERE nmatch = 3", 10)
    )
    o["q_must_not"] = (
        f"{_BASE}, {_term_scores(['merge'])}\n"
        + _topk(
            "SELECT doc_id, score FROM scores WHERE doc_id NOT IN "
            "(SELECT doc_id FROM tf WHERE term = 'dup')",
            10,
        )
    )
    o["q_should_msm2"] = (
        f"{_BASE}, {_term_scores(['dup', 'window', 'stream'])}\n"
        + _topk("SELECT doc_id, score FROM scores WHERE nmatch >= 2", 10)
    )
    o["q_filtered_range"] = (
        f"{_BASE}, {_term_scores(['merge'])}\n"
        + _topk(
            "SELECT s.doc_id, s.score FROM scores s JOIN documents d "
            "ON d.doc_id = s.doc_id WHERE d.n_chars BETWEEN 200 AND 400",
            10,
        )
    )
    o["q_match_all"] = _topk(
        "SELECT doc_id, 1.0::DOUBLE AS score FROM documents", 20
    )
    o["q_paging"] = (
        f"{_BASE}, {_term_scores(['merge'])}\n"
        + _topk("SELECT doc_id, score FROM scores", 5, offset=5)
    )
    const_sql = f"{_BASE}\n" + _topk(
        "SELECT DISTINCT doc_id, 2.5::DOUBLE AS score FROM tf WHERE term = 'dup'", 20
    )
    nozero_sql = f"""{_BASE}
{_topk("SELECT tf.doc_id, greatest(d.n_chars::DOUBLE - 300.0, 0.0) AS score "
       "FROM tf JOIN documents d ON d.doc_id = tf.doc_id "
       "WHERE tf.term = 'merge' "
       "AND greatest(d.n_chars::DOUBLE - 300.0, 0.0) <> 0.0", 20)}"""
    o["q_const_nozero"] = (
        f"SELECT 'const' AS part, doc_id, score FROM ({const_sql})\n"
        f"UNION ALL\nSELECT 'nozero', doc_id, score FROM ({nozero_sql})"
    )
    o["q_dismax"] = (
        f"{_BASE},\nsub AS (\n"
        f"  SELECT tf.doc_id, {_score_expr()} AS s\n"
        "  FROM tf JOIN dfx USING (term) JOIN dl ON dl.doc_id = tf.doc_id "
        "CROSS JOIN stats\n"
        "  WHERE tf.term IN ('merge', 'filter')\n)\n"
        + _topk(
            "SELECT doc_id, max(s) + 0.3 * (sum(s) - max(s)) AS score "
            "FROM sub GROUP BY doc_id",
            10,
        )
    )
    _phrase_ctes = f"""
tok_pos AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l FROM documents)
),
pf AS (
  SELECT a.doc_id, count(*) AS ptf
  FROM tok_pos a JOIN tok_pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'filter' AND b.term = 'merge'
  GROUP BY a.doc_id
),
widf AS (
  SELECT sum(ln(1.0 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))) AS w
  FROM dfx CROSS JOIN stats WHERE dfx.term IN ('filter', 'merge')
),
ph AS (
  SELECT pf.doc_id,
         widf.w * (pf.ptf * {K1P1} / (pf.ptf + {BM25_K1} *
           (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))) AS score
  FROM pf
  JOIN dl ON dl.doc_id = pf.doc_id
  CROSS JOIN stats CROSS JOIN widf
)"""
    phrase_exact_sql = (
        f"{_BASE},{_phrase_ctes}\n"
        + _topk("SELECT doc_id, score FROM ph", 10)
    )
    # opt part: Bool(must=[scan], should=[phrase]) — ReqOptSum: every
    # scan-doc qualifies (msm 0), the phrase adds its score where present
    phrase_opt_sql = (
        f"{_BASE},{_phrase_ctes},\n{_term_scores(['scan'])}\n"
        + _topk(
            "SELECT s.doc_id, s.score + coalesce(ph.score, 0.0) AS score "
            "FROM scores s LEFT JOIN ph ON ph.doc_id = s.doc_id",
            10,
        )
    )
    # or part: Bool(should=[phrase, dup]) — disjunction: docs matching
    # either clause, scores additive where both match
    phrase_or_sql = (
        f"{_BASE},{_phrase_ctes},\n{_term_scores(['dup'])}\n"
        + _topk(
            "SELECT coalesce(s.doc_id, ph.doc_id) AS doc_id, "
            "coalesce(s.score, 0.0) + coalesce(ph.score, 0.0) AS score "
            "FROM scores s FULL OUTER JOIN ph ON ph.doc_id = s.doc_id",
            10,
        )
    )
    o["q_phrase"] = (
        f"SELECT 'exact' AS part, doc_id, score FROM ({phrase_exact_sql})\n"
        f"UNION ALL\nSELECT 'opt', doc_id, score FROM ({phrase_opt_sql})\n"
        f"UNION ALL\nSELECT 'or', doc_id, score FROM ({phrase_or_sql})"
    )
    # sloppy phrase "merge filter"~2, Lucene SloppyPhraseScorer: terms
    # in ANY order, each match weighted 1/(1+matchLength).  The greedy
    # PQ walk has a closed form for 2 distinct terms — crossing points
    # y alternate between the two adjusted-position lists (y0 = larger
    # head, then the opposite list's smallest value > y), and each
    # crossing pairs y with the opposite list's largest value <= y —
    # replayed here as a RECURSIVE CTE.  ptf = sum of 1/(1+ml) over
    # crossings with ml <= slop.
    slop_part_sql = f"""{_BASE.replace("WITH ", "WITH RECURSIVE ", 1)},
tok_pos AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l FROM documents)
),
p0 AS (SELECT doc_id, pos AS p FROM tok_pos WHERE term = 'merge'),
p1 AS (SELECT doc_id, pos - 1 AS p FROM tok_pos WHERE term = 'filter'),
heads AS (
  SELECT a.doc_id, greatest(a.h0, b.h1) AS y,
         CASE WHEN a.h0 > b.h1 THEN 0 ELSE 1 END AS side
  FROM (SELECT doc_id, min(p) AS h0 FROM p0 GROUP BY 1) a
  JOIN (SELECT doc_id, min(p) AS h1 FROM p1 GROUP BY 1) b USING (doc_id)
),
walk AS (
  SELECT doc_id, y, side FROM heads
  UNION ALL
  SELECT w.doc_id,
         CASE WHEN w.side = 0
              THEN (SELECT min(p) FROM p1 WHERE doc_id = w.doc_id AND p > w.y)
              ELSE (SELECT min(p) FROM p0 WHERE doc_id = w.doc_id AND p > w.y)
         END,
         1 - w.side
  FROM walk w
  WHERE (CASE WHEN w.side = 0
              THEN (SELECT min(p) FROM p1 WHERE doc_id = w.doc_id AND p > w.y)
              ELSE (SELECT min(p) FROM p0 WHERE doc_id = w.doc_id AND p > w.y)
         END) IS NOT NULL
),
mtch AS (
  SELECT w.doc_id,
         w.y - (CASE WHEN w.side = 0
                     THEN (SELECT max(p) FROM p1 WHERE doc_id = w.doc_id AND p <= w.y)
                     ELSE (SELECT max(p) FROM p0 WHERE doc_id = w.doc_id AND p <= w.y)
                END) AS ml
  FROM walk w
),
pf AS (
  SELECT doc_id, sum(1.0 / (1.0 + ml)) AS ptf FROM mtch
  WHERE ml <= 2 GROUP BY doc_id
),
widf AS (
  SELECT sum(ln(1.0 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))) AS w
  FROM dfx CROSS JOIN stats WHERE dfx.term IN ('filter', 'merge')
),
scores AS (
  SELECT pf.doc_id,
         widf.w * (pf.ptf * {K1P1} / (pf.ptf + {BM25_K1} *
           (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))) AS score
  FROM pf
  JOIN dl ON dl.doc_id = pf.doc_id
  CROSS JOIN stats CROSS JOIN widf
)
{_topk('SELECT doc_id, score FROM scores', 10)}"""
    # repeated-term sloppy phrase "merge merge"~6: two legs of ONE term
    # never claim the same token occurrence (Lucene repeating-terms
    # collision groups), which for a 2-leg same-term phrase reduces to
    # consecutive occurrence pairs — matchLength = gap - 1, weight
    # 1/(1+ml) = 1/gap — a lead() window instead of a walk (closed form
    # verified against both collision-walk ports over 3000 random
    # cases, tests/test_phrase.py).  idf is summed per leg: 2×idf.
    repeat_part_sql = f"""{_BASE},
tok_pos AS (
  SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l FROM documents)
),
rp AS (
  SELECT doc_id, pos,
         lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM tok_pos WHERE term = 'merge'
),
pf AS (
  SELECT doc_id, sum(1.0 / (nxt - pos)) AS ptf FROM rp
  WHERE nxt IS NOT NULL AND nxt - pos - 1 <= 6 GROUP BY doc_id
),
widf AS (
  SELECT 2.0 * sum(ln(1.0 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5))) AS w
  FROM dfx CROSS JOIN stats WHERE dfx.term = 'merge'
),
scores AS (
  SELECT pf.doc_id,
         widf.w * (pf.ptf * {K1P1} / (pf.ptf + {BM25_K1} *
           (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))) AS score
  FROM pf
  JOIN dl ON dl.doc_id = pf.doc_id
  CROSS JOIN stats CROSS JOIN widf
)
{_topk('SELECT doc_id, score FROM scores', 10)}"""
    o["q_phrase_slop"] = (
        f"SELECT 'slop' AS part, doc_id, score FROM ({slop_part_sql})\n"
        f"UNION ALL\nSELECT 'repeat', doc_id, score FROM ({repeat_part_sql})"
    )
    field_scored_sql = f"""{_BASE}, {_term_scores(['merge'])},
fld AS (SELECT count(*) AS df FROM documents WHERE lower(lang) = 'en'),
fs AS (
  SELECT d.doc_id,
         ln(1.0 + (stats.n - fld.df + 0.5) / (fld.df + 0.5)) AS fscore
  FROM documents d CROSS JOIN fld CROSS JOIN stats
  WHERE lower(d.lang) = 'en'
)
{_topk("SELECT s.doc_id, s.score + fs.fscore AS score "
       "FROM scores s JOIN fs ON fs.doc_id = s.doc_id", 10)}"""
    # filter part: the field term intersects without scoring — the hits
    # are merge's BM25 over lang='en' docs (kernel filter-arm semantics)
    field_filter_sql = (
        f"{_BASE}, {_term_scores(['merge'])}\n"
        + _topk(
            "SELECT s.doc_id, s.score FROM scores s "
            "JOIN documents d ON d.doc_id = s.doc_id "
            "WHERE lower(d.lang) = 'en'",
            10,
        )
    )
    field_wc_sql = _topk(
        "SELECT doc_id, 1.0::DOUBLE AS score FROM documents "
        "WHERE lower(source) LIKE 'src1%'",
        10,
    )
    o["q_field"] = (
        f"SELECT 'scored' AS part, doc_id, score FROM ({field_scored_sql})\n"
        f"UNION ALL\nSELECT 'filter', doc_id, score FROM ({field_filter_sql})\n"
        f"UNION ALL\nSELECT 'wildcard', doc_id, score FROM ({field_wc_sql})"
    )
    wc_top_sql = (
        f"{_BASE}\n"
        + _topk(
            "SELECT DISTINCT doc_id, 1.0::DOUBLE AS score FROM tf WHERE term LIKE 's%'",
            10,
        )
    )
    # nested glob = constant-score set conjunct: BM25(merge) + boost
    # for docs containing merge AND any s% term
    wc_and_sql = (
        f"{_BASE}, {_term_scores(['merge'])},\n"
        "wmatch AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 's%')\n"
        + _topk(
            "SELECT s.doc_id, s.score + 1.0 AS score "
            "FROM scores s JOIN wmatch ON wmatch.doc_id = s.doc_id",
            10,
        )
    )
    # glob as a disjunction clause: 1.0 for any-s%-match, plus
    # BM25(merge) where merge matches, docs matching either
    wc_or_sql = (
        f"{_BASE}, {_term_scores(['merge'])},\n"
        "wmatch AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 's%')\n"
        + _topk(
            "SELECT coalesce(s.doc_id, w.doc_id) AS doc_id, "
            "coalesce(s.score, 0.0) + "
            "CASE WHEN w.doc_id IS NULL THEN 0.0 ELSE 1.0 END AS score "
            "FROM scores s FULL OUTER JOIN wmatch w ON w.doc_id = s.doc_id",
            10,
        )
    )
    fuzzy_sql = f"{_BASE}\n" + _topk(
        "SELECT DISTINCT doc_id, 1.0::DOUBLE AS score FROM tf "
        "WHERE levenshtein(term, 'scan') <= 1",
        10,
    )
    o["q_multiterm"] = (
        f"SELECT 'top' AS part, doc_id, score FROM ({wc_top_sql})\n"
        f"UNION ALL\nSELECT 'and', doc_id, score FROM ({wc_and_sql})\n"
        f"UNION ALL\nSELECT 'or', doc_id, score FROM ({wc_or_sql})\n"
        f"UNION ALL\nSELECT 'fuzzy', doc_id, score FROM ({fuzzy_sql})"
    )
    custom_sql = (
        f"{_BASE}, {_term_scores(['merge'])}\n"
        + _topk(
            "SELECT s.doc_id, s.score * sqrt(d.n_chars) AS score "
            "FROM scores s JOIN documents d ON d.doc_id = s.doc_id",
            10,
        )
    )
    expr_sql = f"""{_BASE}
{_topk("SELECT tf.doc_id, ln(1.0 + d.n_chars) AS score "
       "FROM tf JOIN documents d ON d.doc_id = tf.doc_id "
       "WHERE tf.term = 'merge'", 10)}"""
    o["q_score_exprs"] = (
        f"SELECT 'custom' AS part, doc_id, score FROM ({custom_sql})\n"
        f"UNION ALL\nSELECT 'expr', doc_id, score FROM ({expr_sql})"
    )
    # Q16: BM25 with the length-norm factor pinned to 1 (b = 0)
    nn_score = (
        f"ln(1.0 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5)) * "
        f"(tf.tf * {K1P1} / (tf.tf + {BM25_K1}))"
    )
    o["q_no_norm"] = f"""{_BASE},
scores AS (
  SELECT tf.doc_id, sum({nn_score}) AS score
  FROM tf JOIN dfx USING (term) CROSS JOIN stats
  WHERE tf.term = 'merge' GROUP BY tf.doc_id
)
{_topk('SELECT doc_id, score FROM scores', 10)}"""
    o["q_random_score"] = f"""{_BASE},
matched AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup')
{_topk("SELECT doc_id, 1.0 + ('0x' || substr(md5('7:' || doc_id), 1, 8))::BIGINT "
       "/ 4294967296.0 AS score FROM matched", 20)}"""
    o["q_parser"] = f"""{_BASE},
ts AS (
  SELECT tf.doc_id, tf.term, {_score_expr()} AS s
  FROM tf JOIN dfx USING (term) JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  WHERE tf.term IN ('scan', 'dup', 'window')
),
agg AS (
  SELECT doc_id, sum(s) AS score,
         max(CASE WHEN term = 'scan' THEN 1 ELSE 0 END) AS has_must,
         max(CASE WHEN term IN ('dup', 'window') THEN 1 ELSE 0 END) AS has_should
  FROM ts GROUP BY doc_id
)
{_topk("SELECT doc_id, score FROM agg WHERE has_must = 1 AND has_should = 1", 10)}"""
    o["q_sorts"] = f"""{_BASE}
SELECT 'field' AS part, doc_id, n_chars FROM (
  SELECT d.doc_id, d.n_chars,
         row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id) AS rn
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'merge')
) WHERE rn <= 10
UNION ALL
SELECT 'expr' AS part, doc_id, n_chars FROM (
  SELECT d.doc_id, d.n_chars,
         row_number() OVER (ORDER BY d.n_chars % 7 ASC, d.doc_id) AS rn
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'scan')
) WHERE rn <= 10"""
    o["q_explain"] = f"""{_BASE}, {_term_scores(['scan', 'agg'])},
top AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
    FROM scores WHERE nmatch = 2
  ) WHERE rn <= 5
)
SELECT tf.doc_id, tf.term, tf.tf,
       round(ln(1.0 + (stats.n - dfx.df + 0.5) / (dfx.df + 0.5)), 4) AS idf,
       round({_score_expr()}, 4) AS term_score
FROM tf JOIN dfx USING (term) JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN stats
WHERE tf.term IN ('scan', 'agg') AND tf.doc_id IN (SELECT doc_id FROM top)"""

    from bzzz_spark.query.spatial import haversine_sql

    hav = haversine_sql("lat", "lon", 10.25, 20.25)
    o["q_spatial"] = f"""{_BASE}, {_term_scores(['merge'])},
loc AS (
  SELECT doc_id,
         ((doc_id * 7) % 160 - 80 + 0.25)::DOUBLE AS lat,
         ((doc_id * 13) % 340 - 170 + 0.25)::DOUBLE AS lon
  FROM documents
),
sp AS (
  SELECT s.doc_id, s.score, {hav} AS d
  FROM scores s JOIN loc ON loc.doc_id = s.doc_id
)
SELECT doc_id, round(score, 4) AS score, round(d, 3) AS distance_m FROM (
  SELECT doc_id, score, d, row_number() OVER (ORDER BY d, doc_id) AS rn
  FROM sp WHERE d <= 3000000
) WHERE rn <= 10"""
    o["q_facets"] = f"""{_BASE},
m_merge AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'merge'),
m_dup AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup'),
melted AS (
  SELECT 'lang' AS dim, lang AS label FROM documents
  WHERE doc_id IN (SELECT doc_id FROM m_merge)
  UNION ALL
  SELECT 'source', source FROM documents
  WHERE doc_id IN (SELECT doc_id FROM m_merge)
)
SELECT 'lang' AS part, 'lang' AS dim, label, cnt FROM (
  SELECT lang AS label, count(*) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, lang) AS rn
  FROM documents WHERE doc_id IN (SELECT doc_id FROM m_dup)
  GROUP BY lang
) WHERE rn <= 10
UNION ALL
SELECT 'multi' AS part, dim, label, cnt FROM (
  SELECT dim, label, cnt,
         row_number() OVER (PARTITION BY dim ORDER BY cnt DESC, label) AS rn
  FROM (SELECT dim, label, count(*) AS cnt FROM melted GROUP BY dim, label)
) WHERE rn <= 5
UNION ALL
SELECT 'tokens' AS part, 'text' AS dim, label, cnt FROM (
  SELECT label, cnt,
         row_number() OVER (ORDER BY cnt DESC, label) AS rn
  FROM (
    SELECT tok.term AS label, count(*) AS cnt FROM tok
    WHERE tok.doc_id IN (SELECT doc_id FROM m_dup)
    GROUP BY tok.term
  )
) WHERE rn <= 10"""
    # start = length of the prefix before the first TOKEN-boundary 'dup'
    # (the corpus is pure ASCII, so RE2's [^0-9a-z_] boundary equals the
    # engine tokenizer's \\w-run boundary); end = end-of-text because
    # fragment_size exceeds every doc; n_matches = tf.
    o["q_highlight"] = f"""{_BASE}, {_term_scores(['dup'])},
top AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
    FROM scores
  ) WHERE rn <= 5
)
SELECT d.doc_id,
       length(regexp_replace(lower(d.text),
              '^(.*?)(^|[^0-9a-z_])dup([^0-9a-z_]|$).*$', '\\1\\2', 's'))::INT
         AS start,
       length(d.text)::INT AS "end",
       tf.tf AS n_matches
FROM documents d
JOIN tf ON tf.doc_id = d.doc_id AND tf.term = 'dup'
WHERE d.doc_id IN (SELECT doc_id FROM top)"""
    o["q_total_hits"] = f"""{_BASE}
SELECT count(*) AS total FROM (
  SELECT doc_id FROM tf WHERE term IN ('scan', 'agg')
  GROUP BY doc_id HAVING count(*) = 2
)"""
    o["q_index_meta"] = f"""{_BASE}
SELECT 'dict' AS part, term AS key, df, cf, NULL::DOUBLE AS x FROM (
  SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term
  UNION ALL
  SELECT 'lang:' || lower(lang), count(*), count(*)::BIGINT
  FROM documents GROUP BY lang
  UNION ALL
  SELECT 'source:' || lower(source), count(*), count(*)::BIGINT
  FROM documents GROUP BY source
)
UNION ALL
SELECT 'stats', '', (SELECT count(*) FROM documents), NULL::BIGINT,
       round((SELECT avgdl FROM stats), 6)"""

    o["d_dedup_exact"] = """
WITH alldocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20
)
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS canonical_id, count(*) AS n_dups
FROM alldocs GROUP BY 1 HAVING count(*) >= 2"""
    o["d_near_dup_cosine"] = """
WITH comp AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS cos
  FROM comp GROUP BY 1, 2
)
SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.45"""
    o["a_grams"] = """
SELECT 'edge' AS kind, gram, count(*) AS cnt FROM (
  SELECT substr(source, 1, n) AS gram
  FROM documents, (SELECT unnest(generate_series(2, 4)) AS n) ns
  WHERE length(source) >= n
) GROUP BY gram
UNION ALL
SELECT 'ngram', gram, count(*) FROM (
  SELECT substr(lang, i, n) AS gram
  FROM documents
  CROSS JOIN (SELECT unnest(generate_series(2, 3)) AS n) ns
  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) pos
  WHERE i + n - 1 <= length(lang)
) GROUP BY gram"""
    o["p_payload_score"] = """
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT event_id AS doc_id, floor(value)::DOUBLE AS score,
         row_number() OVER (ORDER BY floor(value) DESC, event_id) AS rn
  FROM events WHERE event_type = 'click'
) WHERE rn <= 10"""
    o["p_payload_state"] = """
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT event_id AS doc_id,
         floor(value) * 2.5 + 3.0 AS score,
         row_number() OVER (ORDER BY floor(value) * 2.5 + 3.0 DESC, event_id) AS rn
  FROM events WHERE event_type = 'click'
) WHERE rn <= 10"""
    o["p_result_state"] = """
SELECT doc_id, round(score, 4) AS score, pay_mod FROM (
  SELECT event_id AS doc_id, floor(value)::DOUBLE AS score,
         floor(value)::INT % 7 AS pay_mod,
         row_number() OVER (ORDER BY floor(value) DESC, event_id) AS rn
  FROM events WHERE event_type = 'click'
) WHERE rn <= 10"""
    o["p_payload_buckets"] = """
SELECT floor(value)::INT % 8 AS bucket, count(*) AS cnt
FROM events WHERE event_type = 'click'
GROUP BY 1 ORDER BY bucket"""
    # the fake feature extractor is a bucketed byte histogram; the text
    # payload is UTF-8 of an ASCII corpus, so ord(char) == byte value
    # part='fake': byte-histogram bucket 0 share of the utf-8 text
    # payload.  part='png'/'wav': the REAL decoders run Spark-side on
    # synthesized fixtures whose decoded stats have closed forms —
    # a constant-gray PNG's mean pixel equals its gray level, a
    # constant-sample WAV's rms equals |sample|/32768 — so the oracle
    # needs no media decode at all, just the same arithmetic on doc_id
    o["m_features"] = """
SELECT 'fake' AS part, doc_id AS media_id,
       round(CASE WHEN len(codes) > 0
             THEN len(list_filter(codes, c -> c % 8 = 0))::DOUBLE / len(codes)
             ELSE 0.0 END, 6) AS v1,
       0.0 AS v2
FROM (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> ord(substr(text, i, 1))) AS codes
  FROM documents WHERE doc_id < 50
)
UNION ALL
SELECT 'png', doc_id,
       ((doc_id % 7 + 1) * 100 + (doc_id % 5 + 1))::DOUBLE,
       round(((doc_id * 37) % 256)::DOUBLE, 6)
FROM documents WHERE doc_id < 50
UNION ALL
SELECT 'wav', doc_id,
       ((doc_id % 50 + 1) * 10)::DOUBLE,
       round(((doc_id * 131) % 32768)::DOUBLE / 32768.0, 6)
FROM documents WHERE doc_id < 50"""
    o["d_minhash_lsh"] = _minhash_sql(8, 4)
    o["d_jaccard"] = f"""WITH {_shingle_cte(3)},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(shared::DOUBLE / (sa.n + sb.n - shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(shared::DOUBLE / (sa.n + sb.n - shared), 6) >= 0.03"""
    o["d_simhash"] = _simhash_sql(32)
    # span-level dedup (Lee et al. exact-substring at 8-gram
    # granularity): same quoter-doc corpus, gram df count, window-based
    # island merge, token strip, and Gopher intra-doc repetition — all
    # from first principles (the engine hashes grams with md5; the df
    # count is identical on the raw gram strings)
    o["d_spans"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000,
         array_to_string(list_slice(regexp_extract_all(lower(text), '{TOK}'),
                                    1, 20), ' ')
           || ' zqx' || (doc_id % 7)::VARCHAR
  FROM documents WHERE doc_id < 15
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l FROM corpus
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(l, i, i + 7), ' ') AS gram
  FROM (SELECT doc_id, l,
               unnest(generate_series(1, greatest(len(l) - 7, 0))) AS i
        FROM toks)
),
freq AS (
  SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM grams)
  GROUP BY gram HAVING count(*) >= 2
),
flagged AS (SELECT g.doc_id, g.pos FROM grams g JOIN freq USING (gram)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN prev_max_end IS NULL OR pos > prev_max_end
              THEN 1 ELSE 0 END AS new_island
  FROM (
    SELECT doc_id, pos,
           max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
    FROM flagged
  )
),
isl2 AS (
  SELECT doc_id, pos,
         sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, min(pos) AS s_start, max(pos) + 8 AS s_end
  FROM isl2 GROUP BY doc_id, island
),
ntok AS (SELECT doc_id, len(l) AS n_tokens FROM toks),
fracs AS (
  SELECT s.doc_id,
         round(sum(s_end - s_start)::DOUBLE / n_tokens, 6) AS frac
  FROM spans s JOIN ntok USING (doc_id) GROUP BY s.doc_id, n_tokens
),
tok_idx AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS idx
  FROM toks
),
keep AS (
  SELECT t.doc_id, t.idx, t.tok
  FROM tok_idx t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = t.doc_id AND t.idx >= s.s_start AND t.idx < s.s_end
  )
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean
  FROM keep GROUP BY doc_id
),
clean AS (
  SELECT c.doc_id, coalesce(a.text_clean, '') AS text_clean,
         coalesce(f.frac, 0.0) AS frac
  FROM corpus c
  LEFT JOIN agg a USING (doc_id)
  LEFT JOIN fracs f USING (doc_id)
),
intra AS (
  SELECT doc_id,
         round(CASE WHEN len(g) > 0
               THEN (len(g) - len(list_distinct(g)))::DOUBLE / len(g)
               ELSE 0.0 END, 6) AS v
  FROM (
    SELECT doc_id,
           CASE WHEN len(l) >= 3 THEN
             list_transform(generate_series(1, len(l) - 2),
                            i -> array_to_string(list_slice(l, i, i + 2), ' '))
           ELSE []::VARCHAR[] END AS g
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l
          FROM documents WHERE doc_id < 200)
  )
)
SELECT 'span' AS part, doc_id::VARCHAR || ':' || s_start::VARCHAR AS key,
       s_end::DOUBLE AS val, '' AS txt
FROM spans
UNION ALL
SELECT 'frac', doc_id::VARCHAR, frac, '' FROM fracs
UNION ALL
SELECT 'clean', doc_id::VARCHAR, frac, text_clean FROM clean
WHERE frac > 0 OR doc_id < 5
UNION ALL
SELECT 'intra', doc_id::VARCHAR, v, '' FROM intra"""

    # decontamination: distinct corpus 8-grams vs the 8-gram set of a
    # benchmark rebuilt exactly as the Spark entry builds it (12-token
    # window, 1-based elements 4..15, of every doc_id % 13 == 2 doc)
    o["d_decontam"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l FROM documents
),
dg AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(l, i, i + 7), ' ') AS gram
  FROM (SELECT doc_id, l,
               unnest(generate_series(1, greatest(len(l) - 7, 0))) AS i
        FROM toks)
),
btoks AS (
  SELECT list_slice(l, 4, 15) AS bl FROM toks WHERE doc_id % 13 = 2
),
bg AS (
  SELECT DISTINCT array_to_string(list_slice(bl, i, i + 7), ' ') AS gram
  FROM (SELECT bl,
               unnest(generate_series(1, greatest(len(bl) - 7, 0))) AS i
        FROM btoks)
),
agg AS (
  SELECT doc_id, count(*) AS n_grams,
         sum(CASE WHEN gram IN (SELECT gram FROM bg)
                  THEN 1 ELSE 0 END) AS hit_grams
  FROM dg GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_grams, 0)::BIGINT AS n_grams,
       coalesce(a.hit_grams, 0)::BIGINT AS hit_grams,
       round(CASE WHEN coalesce(a.n_grams, 0) > 0
                  THEN coalesce(a.hit_grams, 0)::DOUBLE / a.n_grams
                  ELSE 0.0 END, 6) AS contaminated_frac,
       coalesce(a.hit_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)"""

    o["s_similarity"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
comp AS (
  SELECT q.query_id, e.vec_id,
         unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
  FROM embeddings e CROSS JOIN q
),
scored AS (
  SELECT query_id, vec_id,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS cos
  FROM comp GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT 'brute' AS part, query_id, vec_id, cos, rank::INTEGER AS rank
FROM ranked WHERE rank <= 5
UNION ALL
SELECT 'ivf' AS part, query_id, vec_id, cos, rank::INTEGER AS rank
FROM ranked WHERE rank <= 5 AND query_id < 2"""
    # connected components = transitive min-label closure; the recursive
    # CTE is the oracle-side equivalent of the large-star/small-star
    # alternation (same fixpoint: component label = min member id)
    o["d_clusters"] = f"""
WITH RECURSIVE {_minhash_ctes(8, 4)},
edges AS (
  SELECT id_a AS u, id_b AS v FROM mh_pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM mh_pairs
),
reach AS (
  SELECT u AS id, u AS r FROM edges
  UNION
  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r
),
cc AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT 'cc' AS part, doc_id, cluster_id FROM cc
UNION ALL
SELECT 'keep' AS part, d.doc_id, d.doc_id AS cluster_id
FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
WHERE cc.doc_id IS NULL OR cc.cluster_id = d.doc_id"""

    # PII patterns are restricted to syntax with identical semantics in
    # Java regex (Spark) and RE2 (DuckDB) — see functions/pii.py.  All
    # three counts run on the ORIGINAL text; redaction is sequential
    # email → ipv4 → phone.
    from bzzz_spark.functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    o["d_pii"] = f"""
WITH alldocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000,
         text || ' contact user' || doc_id::VARCHAR
              || '@example.com or 10.0.' || (doc_id % 256)::VARCHAR
              || '.7 tel +1 415-555-01' || lpad(doc_id::VARCHAR, 2, '0')
  FROM documents WHERE doc_id < 10
)
SELECT doc_id,
  len(regexp_extract_all(text, '{EMAIL_RE}'))::INT AS n_email,
  len(regexp_extract_all(text, '{IPV4_RE}'))::INT AS n_ipv4,
  len(regexp_extract_all(text, '{PHONE_RE}'))::INT AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{EMAIL_RE}', '<EMAIL>', 'g'),
      '{IPV4_RE}', '<IP>', 'g'),
      '{PHONE_RE}', '<PHONE>', 'g') AS text_redacted,
  len(regexp_extract_all(text, '{EMAIL_RE}'))
    + len(regexp_extract_all(text, '{IPV4_RE}'))
    + len(regexp_extract_all(text, '{PHONE_RE}')) > 0 AS has_pii
FROM alldocs"""

    # C4 line filter + Gopher flags (functions/cleaning.py); regexes
    # are Java-regex/RE2-common.  coalesce: DuckDB's array_to_string of
    # an empty list is NULL where Spark's array_join gives ''.
    _wl = "(CASE WHEN len(words) > 0 THEN len(words) END)"
    _ll = "(CASE WHEN len(lines) > 0 THEN len(lines) END)"
    _gop = {
        "mwl": f"round(list_sum(list_transform(words, w -> len(w)))::DOUBLE"
               f" / {_wl}, 6)",
        "sym": f"round(len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE"
               f" / {_wl}, 6)",
        "bul": f"round(len(list_filter(lines, l -> regexp_matches(l,"
               f" '^\\s*[-*•]')))::DOUBLE / {_ll}, 6)",
        "ell": f"round(len(list_filter(lines, l -> regexp_matches(l,"
               f" '\\.\\.\\.\\s*$')))::DOUBLE / {_ll}, 6)",
        "alp": f"round(len(list_filter(words, w -> regexp_matches(w,"
               f" '[A-Za-z]')))::DOUBLE / {_wl}, 6)",
        "stp": "len(list_intersect(list_distinct(list_transform(words,"
               " w -> lower(w))), ['the','and','of','to','a','in','is',"
               "'it','you','that']))",
    }
    o["d_clean"] = f"""
WITH alldocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000,
         text || chr(10) || 'short line' || chr(10) ||
         'This page requires Javascript to view properly.' || chr(10) ||
         '- bullet item without punctuation' || chr(10) ||
         'A good closing sentence with plenty of words here.' ||
         CASE WHEN doc_id % 3 = 0
              THEN chr(10) || 'lorem ipsum dolor sit amet etc.'
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN chr(10) || 'code {{ sample }} trailing...'
              ELSE '' END
  FROM documents WHERE doc_id < 15
),
base AS (
  SELECT doc_id, text,
         string_split_regex(text, '\\r?\\n') AS lines,
         list_filter(string_split_regex(text, '\\s+'),
                     w -> w != '') AS words
  FROM alldocs
),
c4 AS (
  SELECT *,
    list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
      AND len(list_filter(string_split_regex(l, '\\s+'),
                          w -> w != '')) >= 5
      AND NOT regexp_matches(lower(l),
              'javascript|cookie policy|terms of use')) AS kept
  FROM base
)
SELECT doc_id,
  len(lines)::INT AS n_lines, len(kept)::INT AS n_kept_lines,
  coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
  regexp_matches(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
  contains(text, '{{') AS has_curly,
  len(kept) >= 1 AND NOT regexp_matches(lower(text), 'lorem ipsum')
    AND NOT contains(text, '{{') AS c4_keep,
  len(words)::INT AS n_words,
  {_gop['mwl']} AS mean_word_len,
  {_gop['sym']} AS symbol_ratio,
  {_gop['bul']} AS frac_bullet_lines,
  {_gop['ell']} AS frac_ellipsis_lines,
  {_gop['alp']} AS frac_alpha_words,
  {_gop['stp']}::INT AS n_stop_hits,
  (len(words) BETWEEN 50 AND 100000)
    AND ({_gop['mwl']} BETWEEN 3.0 AND 10.0)
    AND {_gop['sym']} <= 0.1 AND {_gop['bul']} <= 0.9
    AND {_gop['ell']} <= 0.3 AND {_gop['alp']} >= 0.8
    AND {_gop['stp']} >= 2 AS gopher_keep
FROM c4"""

    # bucket arithmetic: first 8 md5 hex chars → 32 uniform bits →
    # modulo 1e6 — bit-identical to sampling._bucket_expr
    def _bucket_sql(seed: str) -> str:
        return (
            f"('0x' || substr(md5('{seed}:' || doc_id::VARCHAR), 1, 8))"
            "::BIGINT % 1000000"
        )

    # d_ppl — the add-k bigram LM (functions/lm.py) replayed in SQL:
    # unigram/bigram counts over the pinned tokenizer, HAVING >= 2 is
    # the count cutoff (min_count=2), unseen pairs coalesce to 0, and
    # the per-doc fold averages ln P(w2|w1).  Inner GROUP BY drops
    # docs with < 2 tokens, matching the Spark entry's filter.
    o["d_ppl"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l
  FROM documents
),
pos AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS w FROM toks
),
bi_doc AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
uni AS (SELECT w, count(*)::DOUBLE AS c_uni FROM pos GROUP BY w),
v AS (SELECT count(*)::DOUBLE AS nv FROM uni),
bi AS (
  SELECT w1, w2, count(*)::DOUBLE AS c_bi FROM bi_doc
  GROUP BY w1, w2 HAVING count(*) >= 2
),
lp AS (
  SELECT d.doc_id,
         ln((coalesce(bi.c_bi, 0) + 0.5) / (u.c_uni + 0.5 * v.nv)) AS lp
  FROM bi_doc d
  LEFT JOIN bi ON bi.w1 = d.w1 AND bi.w2 = d.w2
  JOIN uni u ON u.w = d.w1
  CROSS JOIN v
)
SELECT doc_id,
       count(*) AS n_scored_bigrams,
       round(avg(lp), 4) AS logprob_per_token,
       round(exp(-avg(lp)), 4) AS perplexity
FROM lp GROUP BY doc_id"""

    # DSIR (functions/dsir.py): hashed unigram+bigram bucket counts,
    # add-k log-ratio target-vs-raw, per-doc summed weight, and the
    # seeded Gumbel-top-20 resample — replayed bucket for bucket
    # (md5-prefix hashing and the gumbel draw are the engine's shared
    # Spark/DuckDB/Python convention)
    o["d_dsir"] = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOK}') AS l
  FROM documents
),
uni AS (SELECT doc_id, unnest(l) AS g FROM toks),
big AS (
  SELECT doc_id, l[i] || chr(31) || l[i + 1] AS g
  FROM (SELECT doc_id, l, generate_subscripts(l, 1) AS i FROM toks)
  WHERE i < len(l)
),
grams AS (SELECT doc_id, g FROM uni UNION ALL SELECT doc_id, g FROM big),
buck AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 512 AS b
  FROM grams
),
rcnt AS (SELECT b, count(*)::DOUBLE AS c FROM buck GROUP BY b),
tcnt AS (
  SELECT b, count(*)::DOUBLE AS c FROM buck WHERE doc_id % 7 = 0 GROUP BY b
),
tot AS (
  SELECT (SELECT sum(c) FROM tcnt) AS nt, (SELECT sum(c) FROM rcnt) AS nr
),
ratio AS (
  SELECT r.b,
         ln((coalesce(t.c, 0) + 0.25) / (tot.nt + 0.25 * 512))
       - ln((r.c + 0.25) / (tot.nr + 0.25 * 512)) AS lr
  FROM rcnt r LEFT JOIN tcnt t USING (b) CROSS JOIN tot
),
score AS (
  SELECT d.doc_id, coalesce(s.n_grams, 0) AS n_grams,
         coalesce(s.w, 0.0) AS w
  FROM documents d LEFT JOIN (
    SELECT buck.doc_id, count(*) AS n_grams, sum(ratio.lr) AS w
    FROM buck JOIN ratio USING (b) GROUP BY buck.doc_id
  ) s USING (doc_id)
),
keyed AS (
  SELECT doc_id, n_grams,
         w + (-ln(-ln(((('0x' || substr(md5('dsir:' || doc_id::VARCHAR),
                                        1, 8))::BIGINT) + 0.5)
                      / 4294967296.0))) AS key
  FROM score
)
SELECT 'weight' AS part, doc_id, n_grams, round(w, 4) AS w FROM score
UNION ALL
SELECT 'select', doc_id, n_grams, round(key, 4) FROM (
  SELECT * FROM keyed ORDER BY key DESC, doc_id LIMIT 20
)"""

    # concat-and-chunk sequence packing: md5-ordered exclusive prefix
    # sum of token counts, then each doc sliced onto 256-token
    # sequences — the oracle replays the two-level scan as ONE global
    # ordered window (ORDER BY okey == ORDER BY (bucket, okey): the
    # bucket IS the key's hex prefix), then explodes the touched
    # sequence range per doc (functions/packing.py)
    o["d_pack"] = f"""
WITH toks AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOK}'))::BIGINT AS n_tokens
  FROM documents
),
nz AS (
  SELECT doc_id, n_tokens, md5('pk:' || doc_id) AS okey
  FROM toks WHERE n_tokens > 0
),
offs AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY okey, doc_id::VARCHAR
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS "offset"
  FROM nz
),
ex AS (
  SELECT doc_id, n_tokens, "offset",
         unnest(generate_series("offset" // 256,
                                ("offset" + n_tokens - 1) // 256)) AS seq_id
  FROM offs
)
SELECT seq_id, doc_id, n_tokens, "offset",
       greatest(0, seq_id * 256 - "offset") AS doc_tok_start,
       least(n_tokens, (seq_id + 1) * 256 - "offset") AS doc_tok_end,
       greatest(0, "offset" - seq_id * 256) AS seq_tok_start
FROM ex"""

    o["d_sample"] = f"""
SELECT 'sample' AS part, doc_id, 'kept' AS label FROM documents
WHERE {_bucket_sql('bzzz')} < 250000
UNION ALL
SELECT 'split', doc_id,
       CASE WHEN {_bucket_sql('bzzz-split')} < 125000
            THEN 'eval' ELSE 'train' END
FROM documents
UNION ALL
SELECT 'mix', doc_id, 'even' FROM documents
WHERE doc_id % 2 = 0 AND {_bucket_sql('bzzz-mix:even')} < 500000
UNION ALL
SELECT 'mix', doc_id, 'odd' FROM documents
WHERE doc_id % 2 = 1 AND {_bucket_sql('bzzz-mix:odd')} < 300000
UNION ALL
SELECT 'order', doc_id, rank::VARCHAR FROM (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY md5('bzzz-shuffle:' || doc_id::VARCHAR), doc_id
         ) AS rank
  FROM documents
) WHERE rank <= 50"""

    ev_base = f"""
WITH ev AS (
  SELECT row_number() OVER (ORDER BY event_id) - 1 AS doc_id,
         event_type, value,
         concat_ws(' ', event_type, props) AS text
  FROM events
),
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOK}')) AS term
  FROM ev
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (
  SELECT e.doc_id, coalesce(t.dl, 0) AS dl
  FROM ev e
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1) t USING (doc_id)
),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
"""
    e_term_sql = (
        f"{ev_base}, {_term_scores(['error'])}\n"
        + _topk("SELECT doc_id, score FROM scores", 10)
    )
    e_range_sql = (
        f"{ev_base}, {_term_scores(['click'])}\n"
        + _topk(
            "SELECT s.doc_id, s.score FROM scores s JOIN ev ON ev.doc_id = s.doc_id "
            "WHERE ev.value BETWEEN 5.0 AND 50.0",
            10,
        )
    )
    e_facet_sql = f"""{ev_base}
SELECT event_type, count(*) AS cnt FROM ev
WHERE value >= 20.0
GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 10"""
    o["e_batch"] = f"""
SELECT 'term' AS part, doc_id::VARCHAR AS key, score AS val FROM ({e_term_sql})
UNION ALL
SELECT 'range', doc_id::VARCHAR, score FROM ({e_range_sql})
UNION ALL
SELECT 'facet', event_type, cnt::DOUBLE FROM ({e_facet_sql})"""

    mean_wl = (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"list_sum(list_transform({toks}, t -> length(t)))::DOUBLE / len({toks}) "
        f"ELSE 0.0 END"
    )
    stop_ratio = (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, t -> t IN ({en_stop})))::DOUBLE / len({toks}) "
        f"ELSE 0.0 END"
    )
    punct_ratio = (
        "CASE WHEN length(text) > 0 THEN "
        f"len(regexp_extract_all(text, '[^\\s\\p{{L}}\\p{{N}}]'))::DOUBLE / length(text) "
        "ELSE 0.0 END"
    )
    upper_ratio = (
        "CASE WHEN length(text) > 0 THEN "
        "len(regexp_extract_all(text, '\\p{Lu}'))::DOUBLE / length(text) "
        "ELSE 0.0 END"
    )
    quality = (
        f"0.4 * least(len({toks})::DOUBLE / 100.0, 1.0) "
        f"+ 0.3 * least(({stop_ratio}) * 4.0, 1.0) "
        f"+ 0.3 * greatest(0.0, 1.0 - ({punct_ratio}) * 3.0 - ({upper_ratio}))"
    )
    o["t_profile"] = f"""
SELECT 'doc' AS part, doc_id::VARCHAR AS key,
       len({toks}) AS n_tokens,
       len(regexp_extract_all(text, '{bpe_sql}')) AS n_bpe_tokens,
       1::BIGINT AS n_docs,
       {_lang_sql()} AS lang_pred,
       round({quality}, 6) AS quality,
       round({mean_wl}, 6) AS mean_word_len,
       round({stop_ratio}, 6) AS stopword_ratio,
       round({punct_ratio}, 6) AS punct_ratio,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
UNION ALL
SELECT 'source', source,
       sum(len({toks}))::BIGINT,
       sum(len(regexp_extract_all(text, '{bpe_sql}')))::BIGINT,
       count(*),
       '', -1.0, -1.0, -1.0, -1.0, ''
FROM documents GROUP BY source"""

    # batched multi-query search: by construction the oracle is the
    # UNION ALL of the member queries' own oracles (DuckDB allows a
    # full WITH...SELECT inside each branch's subquery)
    # b_range: Bool(must=[term, range]) sums child scores, and a Range
    # child contributes its boost (1.0) — unlike q_filtered_range's
    # Filtered node, whose filter arm is scoreless
    b_range = (
        f"{_BASE}, {_term_scores(['merge'])}\n"
        + _topk(
            "SELECT s.doc_id, s.score + 1.0 AS score FROM scores s "
            "JOIN documents d ON d.doc_id = s.doc_id "
            "WHERE d.n_chars BETWEEN 200 AND 400",
            10,
        )
    )
    # b_req_opt: Bool(must=[merge], should=[scan, window], msm=1) —
    # required term drives matching; optional terms add their BM25
    # score where present and >= msm of them must match
    b_req_opt = (
        f"{_BASE}, {_term_scores(['merge'])},\n"
        "opt AS (\n"
        f"  SELECT tf.doc_id, sum({_score_expr()}) AS score,\n"
        "         count(*) AS nmatch\n"
        "  FROM tf JOIN dfx USING (term) JOIN dl ON dl.doc_id = tf.doc_id\n"
        "  CROSS JOIN stats WHERE tf.term IN ('scan', 'window')\n"
        "  GROUP BY tf.doc_id\n"
        ")\n"
        + _topk(
            "SELECT s.doc_id, s.score + coalesce(opt.score, 0.0) AS score "
            "FROM scores s LEFT JOIN opt ON opt.doc_id = s.doc_id "
            "WHERE coalesce(opt.nmatch, 0) >= 1",
            10,
        )
    )
    # b_nested: the nested Bool is semantically the flat 3-term AND
    # (rewrite.normalize) — the oracle IS the flat form, so a rewrite
    # bug that changed scores or matching would fail this row
    b_nested = (
        f"{_BASE}, {_term_scores(['scan', 'filter', 'merge'])}\n"
        + _topk("SELECT doc_id, score FROM scores WHERE nmatch = 3", 10)
    )
    # phrase leaf in a conjunction: BM25(scan) + phrase score on docs
    # matching BOTH (the ph CTE is the q_phrase machinery)
    b_phrase = (
        f"{_BASE},{_phrase_ctes},\n{_term_scores(['scan'])}\n"
        + _topk(
            "SELECT s.doc_id, s.score + ph.score AS score "
            "FROM scores s JOIN ph ON ph.doc_id = s.doc_id",
            10,
        )
    )
    # wildcard leaf in a conjunction (constant-score term set): the
    # DISTINCT dedupes docs matching several 'du%' expansions — each
    # matching doc gains exactly 1.0 (the leaf boost), executor parity
    b_wild = (
        f"{_BASE}, {_term_scores(['merge'])},\n"
        "wmatch AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'du%')\n"
        + _topk(
            "SELECT s.doc_id, s.score + 1.0 AS score "
            "FROM scores s JOIN wmatch w ON w.doc_id = s.doc_id",
            10,
        )
    )
    # mixed dis-max: member scores per doc — BM25(merge) where present,
    # the phrase score (ph CTE) where the phrase matches, constant 1.0
    # for docs matching any 'du%' expansion — combined per Lucene's
    # DisjunctionMaxQuery: max + tie*(sum - max) over matching members
    b_dismax = (
        f"{_BASE},{_phrase_ctes},\n"
        "members AS (\n"
        f"  SELECT tf.doc_id, {_score_expr()} AS s\n"
        "  FROM tf JOIN dfx USING (term) JOIN dl ON dl.doc_id = tf.doc_id\n"
        "  CROSS JOIN stats WHERE tf.term = 'merge'\n"
        "  UNION ALL SELECT doc_id, score AS s FROM ph\n"
        "  UNION ALL SELECT DISTINCT doc_id, 1.0 AS s FROM tf "
        "WHERE term LIKE 'du%'\n"
        ")\n"
        + _topk(
            "SELECT doc_id, max(s) + 0.3 * (sum(s) - max(s)) AS score "
            "FROM members GROUP BY doc_id",
            10,
        )
    )
    # b_groups: each group is a per-doc (summed BM25, matched count)
    # CTE; a doc qualifies with >= 1 match in BOTH groups and scores
    # the sum of all matched members (executor Bool-sum semantics)
    def _group_cte(name: str, terms: list[str]) -> str:
        tlist = ", ".join(f"'{t}'" for t in terms)
        return (
            f"{name} AS (\n"
            f"  SELECT tf.doc_id, sum({_score_expr()}) AS score,\n"
            "         count(*) AS nmatch\n"
            "  FROM tf JOIN dfx USING (term) JOIN dl ON dl.doc_id = tf.doc_id\n"
            f"  CROSS JOIN stats WHERE tf.term IN ({tlist})\n"
            "  GROUP BY tf.doc_id\n"
            ")"
        )

    b_groups = (
        f"{_BASE}, {_group_cte('g1', ['scan', 'filter'])},\n"
        f"{_group_cte('g2', ['merge', 'dup'])}\n"
        + _topk(
            "SELECT g1.doc_id, g1.score + g2.score AS score "
            "FROM g1 JOIN g2 ON g2.doc_id = g1.doc_id "
            "WHERE g1.nmatch >= 1 AND g2.nmatch >= 1",
            10,
        )
    )
    o["q_batch"] = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS query_id, doc_id, score FROM ({sql})"
        for name, sql in [
            ("b_term", term_topk),
            ("b_and2", o["q_and2"]),
            ("b_not", o["q_must_not"]),
            ("b_msm", o["q_should_msm2"]),
            ("b_field", field_scored_sql),
            ("b_range", b_range),
            ("b_req_opt", b_req_opt),
            ("b_nested", b_nested),
            ("b_phrase", b_phrase),
            ("b_wild", b_wild),
            ("b_groups", b_groups),
            ("b_dismax", b_dismax),
        ]
    )
    # in-process serving runtime: the members reuse the SAME oracle SQL
    # as their Spark-path twins — the driver row therefore pins
    # LocalIndex (pyarrow + numpy kernels, zero Spark jobs) against the
    # independent DuckDB derivation
    o["q_local_serve"] = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS query_id, doc_id, score FROM ({sql})"
        for name, sql in [
            ("ls_term", term_topk),
            ("ls_and2", o["q_and2"]),
            ("ls_not", o["q_must_not"]),
            ("ls_msm", o["q_should_msm2"]),
            ("ls_phrase", b_phrase),
            ("ls_range", b_range),
            ("ls_wild", b_wild),
            ("ls_dismax", b_dismax),
            # sharded-coordinator twins (serve/scatter.py): same member
            # oracles — 3 global-stats shards + exact merge must be
            # indistinguishable from the single index in DuckDB's eyes
            ("sh_term", term_topk),
            ("sh_and2", o["q_and2"]),
            ("sh_phrase", b_phrase),
            ("sh_dismax", b_dismax),
        ]
    )
    return o
