"""Batched multi-query execution: N queries, ONE Spark job.

The reference engine serves one query per HTTP request off an
always-hot in-process Lucene searcher (src/bzzz/index_search.clj), so
its per-query cost is microseconds of JVM work.  Spark's unit of cost
is the *job* — driver planning, task scheduling, Arrow worker spin-up —
a fixed ~1-2 s tax that dwarfs the actual scoring at test scale and is
pure waste when a workload carries many queries (the normal shape for
an analytics engine: evaluation sets, offline relevance sweeps, data
labeling passes over a fixed corpus).

This module makes the query set *data*:

  spec      (query_id, term, role, boost)        — broadcast
  consts    (query_id, n_must, msm, boost)       — broadcast
  postings  decode ONCE for the union of all queries' terms
  score     one JVM column expression per (term, docid)
  combine   groupBy (query_id, docid) — the ONLY data shuffle
  top-k     row_number() over Window.partitionBy(query_id)

so the whole batch costs one postings scan + one docs scan (only if
some query carries a Range/MatchAll leaf) + one shuffle + one job,
independent of how many queries share it.  Per-query semantics are
rank-identical to executor._execute with scores equal within FP
tolerance (the batched path sums score contributions in one groupBy
while the executor sums must/should stages separately, so float
addition order differs; parity-tested in tests/test_batch.py): Term / Range / MatchAll leaves under Bool
(must / should / must_not / minimum_should_match, per-leaf and
per-query boosts, no-norm extra-field terms) and dis-max over terms
(score = max + tie*(sum - max), executor parity) run on the
shared-scan path; any other AST shape falls back to the per-query
executor plan and is unioned into the same single action, so callers
get one DataFrame either way.

At 100 TB the shared scan is also the *correct* plan, not just the
cheap one: the posting blocks for hot terms are read once per batch
instead of once per query, and the one wide shuffle is keyed on
(query_id, docid) — adding queries widens the key space, so skew goes
DOWN as the batch grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bzzz_spark.build.indexer import BzzzIndex
from bzzz_spark.query import ast
from bzzz_spark.query.executor import (
    decode_postings,
    extra_field_map,
    term_key,
    validate_fields,
)
from bzzz_spark.query.scoring import score_col


_LEAF = (ast.Term, ast.Range, ast.MatchAll)


def _as_bool(node: ast.Query) -> ast.Bool | None:
    """Normalize a batchable node to a Bool of Term/Range/MatchAll
    leaves, else None."""
    if isinstance(node, _LEAF):
        return ast.Bool(must=[node])
    if isinstance(node, ast.Bool):
        kids = list(node.must) + list(node.should) + list(node.must_not)
        if kids and all(isinstance(k, _LEAF) for k in kids):
            return node
    return None


def _range_cond(node: ast.Range):
    c = F.col(node.field_name)
    cond = F.lit(True)
    if node.min is not None:
        cond = cond & (c >= node.min if node.min_inclusive else c > node.min)
    if node.max is not None:
        cond = cond & (c <= node.max if node.max_inclusive else c < node.max)
    return cond


def search_many(
    index: BzzzIndex,
    queries: dict[str, ast.Query | dict | str],
    size: int = 10,
    page: int = 0,
) -> DataFrame:
    """Top-k for every query in one DataFrame / one Spark job.

    Returns (query_id, docid, score) in (query_id asc, score desc,
    docid asc) order — per query, exactly the rows ``search()`` returns
    with the same size/page.
    """
    from bzzz_spark.query.rewrite import normalize

    nodes: dict[str, ast.Query] = {}
    for qid, q in queries.items():
        node = q if isinstance(q, ast.Query) else ast.parse_query(q)
        validate_fields(index, node)
        # flattened trees ride the shared scan instead of the per-query
        # exhaustive fallback (score-preserving, rewrite.py)
        nodes[qid] = normalize(node)

    # dis-max of plain terms rides the shared scan too: role "d"
    # contributions, score = max + tie*(sum - max) (executor parity)
    dismaxable = {
        qid: n
        for qid, n in nodes.items()
        if isinstance(n, ast.DisMax)
        and n.queries
        and all(isinstance(q, ast.Term) for q in n.queries)
    }
    batchable = {
        qid: b
        for qid, n in nodes.items()
        if qid not in dismaxable and (b := _as_bool(n))
    }
    rest = {
        qid: n
        for qid, n in nodes.items()
        if qid not in batchable and qid not in dismaxable
    }

    spark = index.docs.sparkSession
    parts: list[DataFrame] = []

    if batchable or dismaxable:
        n_docs, avgdl = index.scalar_stats()
        efields = extra_field_map(index)

        # one spec row per (query, term, role); duplicates kept so a
        # doubled must-term needs the doc twice, matching the executor's
        # tagged-union count semantics.  Range/MatchAll leaves become
        # doc-level contributions: score := boost, evaluated in ONE
        # shared docs scan for the whole batch.
        spec_rows: list[tuple] = []
        consts_rows: list[tuple] = []
        doc_leaves: list[tuple] = []  # (qid, role, leaf node)
        keys: set[str] = set()
        for qid, node in batchable.items():
            for role, kids in (
                ("m", node.must), ("s", node.should), ("n", node.must_not)
            ):
                for t in kids:
                    if isinstance(t, ast.Term):
                        key = term_key(index, t.field_name, t.value)
                        keys.add(key)
                        spec_rows.append(
                            (qid, key, role, float(t.boost),
                             t.field_name in efields)
                        )
                    else:  # Range / MatchAll
                        doc_leaves.append((qid, role, t))
            consts_rows.append(
                (qid, len(node.must), node.effective_msm(),
                 len(node.must) + len(node.should), float(node.boost), None)
            )
        for qid, node in dismaxable.items():
            for t in node.queries:
                key = term_key(index, t.field_name, t.value)
                keys.add(key)
                spec_rows.append(
                    (qid, key, "d", float(t.boost), t.field_name in efields)
                )
            consts_rows.append(
                (qid, 0, 0, len(node.queries), float(node.boost),
                 float(node.tie_breaker))
            )

        meta = index.lookup_terms(keys) if keys else {}
        # per-(qid, docid, role) score contributions, from two shared scans
        contribs: list[DataFrame] = []
        if meta:
            meta_df = spark.createDataFrame(
                [(t, tid, df) for t, (tid, df) in meta.items()],
                "term string, term_id long, df long",
            )
            spec_df = spark.createDataFrame(
                spec_rows, "qid string, term string, role string, "
                           "tboost double, nonorm boolean",
            )

            decoded = decode_postings(
                index.postings, [tid for tid, _ in meta.values()]
            )
            if "dl" not in decoded.columns:  # legacy layout: join norms
                decoded = decoded.join(index.docs.select("docid", "dl"), "docid")
            dl_eff = F.when(F.col("dl") == 0, F.lit(avgdl)).otherwise(
                F.col("dl")
            )
            # nonorm terms (extra fields, norms disabled at build) score
            # with dl := avgdl, i.e. BM25 b = 0
            dl_used = F.when(F.col("nonorm"), F.lit(avgdl)).otherwise(dl_eff)
            tscore = (
                score_col(F.col("tf"), dl_used, F.col("df"),
                          float(n_docs), avgdl)
                * F.col("tboost")
            )
            contribs.append(
                decoded.join(F.broadcast(meta_df), "term_id")
                .join(F.broadcast(spec_df), "term")
                .select("qid", "docid", "role", tscore.alias("tscore"))
            )
        if doc_leaves:
            # every Range/MatchAll leaf in the batch, one docs scan:
            # each doc emits a struct per satisfied leaf
            structs = [
                F.when(
                    _range_cond(leaf)
                    if isinstance(leaf, ast.Range)
                    else F.lit(True),
                    F.struct(
                        F.lit(qid).alias("qid"),
                        F.lit(role).alias("role"),
                        F.lit(float(leaf.boost)).alias("tscore"),
                    ),
                )
                for qid, role, leaf in doc_leaves
            ]
            contribs.append(
                index.docs.select(
                    "docid",
                    F.explode(
                        F.filter(
                            F.array(*structs), lambda x: x.isNotNull()
                        )
                    ).alias("c"),
                ).select("c.qid", "docid", "c.role", "c.tscore")
            )
        if contribs:
            allc = contribs[0]
            for c in contribs[1:]:
                allc = allc.unionByName(c)
            consts_df = spark.createDataFrame(
                consts_rows,
                "qid string, n_must int, msm int, n_pos int, qboost double, "
                "tie double",
            )
            role = F.col("role")
            per_doc = (
                allc.groupBy("qid", "docid")
                .agg(
                    F.sum(F.when(role != "n", F.col("tscore"))
                          .otherwise(F.lit(0.0))).alias("pscore"),
                    F.max(F.when(role == "d", F.col("tscore"))).alias("d_max"),
                    F.sum(F.when(role == "m", 1).otherwise(0)).alias("m_cnt"),
                    F.sum(F.when(role == "s", 1).otherwise(0)).alias("s_cnt"),
                    F.sum(F.when(role == "n", 1).otherwise(0)).alias("n_cnt"),
                )
                .join(F.broadcast(consts_df), "qid")
                .filter(
                    (F.col("m_cnt") == F.col("n_must"))
                    & (F.col("s_cnt") >= F.col("msm"))
                    & (F.col("n_cnt") == 0)
                    & (F.col("n_pos") > 0)
                )
                .select(
                    F.col("qid").alias("query_id"),
                    "docid",
                    (
                        F.when(
                            F.col("tie").isNotNull(),
                            # executor DisMax: max + tie*(sum - max)
                            F.col("d_max")
                            + F.col("tie") * (F.col("pscore") - F.col("d_max")),
                        ).otherwise(F.col("pscore"))
                        * F.col("qboost")
                    ).alias("score"),
                )
            )
            parts.append(per_doc)

    # non-batchable shapes: the exhaustive per-query plan, unioned into
    # the same action — one job either way, just without scan sharing
    from bzzz_spark.query.executor import execute

    for qid, node in rest.items():
        parts.append(
            execute(index, node).select(
                F.lit(qid).alias("query_id"), "docid", "score"
            )
        )

    if not parts:
        return spark.createDataFrame(
            [], "query_id string, docid long, score double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") > page * size) & (F.col("__rn") <= (page + 1) * size)
        )
        .drop("__rn")
        .orderBy("query_id", F.col("score").desc(), F.col("docid").asc())
    )
