"""Per-hit score explanation (reference R3).

The reference returns Lucene's Explanation tree per hit when
`explain: true` (reference: src/bzzz/index_search.clj:314-315; the
expression-context explanation API is ExpressionContext.java:210-233).
Our explanation is the BM25 component breakdown per matched query term:

  _explain: array<struct<term, tf, df, idf, tf_component, term_score>>

summing term_score over the array reproduces the hit's score for
term/AND/OR queries (asserted in tests), which is exactly the
check a Lucene Explanation supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bzzz_spark import BM25_B, BM25_K1
from bzzz_spark.build.indexer import BzzzIndex
from bzzz_spark.query import ast
from bzzz_spark.query.executor import decode_postings, search


def explain_search(
    index: BzzzIndex, query, size: int = 20, page: int = 0
) -> DataFrame:
    """search() plus an `_explain` column of per-term BM25 components."""
    node = query if isinstance(query, ast.Query) else ast.parse_query(query)
    hits = search(index, node, size=size, page=page)
    n_docs, avgdl = index.scalar_stats()
    terms = list(dict.fromkeys(ast.collect_terms(node)))
    if not terms:
        return hits.withColumn("_explain", F.array())
    spark = index.docs.sparkSession
    meta = index.dictionary.filter(F.col("term").isin(terms)).select(
        "term", "term_id", "df"
    )
    rows = meta.collect()
    if not rows:
        return hits.withColumn("_explain", F.array())
    decoded = decode_postings(index.postings, [r["term_id"] for r in rows])
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    # dl comes from the blocks' inline norms stream (0 = norms disabled
    # → avgdl), so no docs join is needed
    dl_eff = F.when(F.col("dl") == 0, F.lit(avgdl)).otherwise(
        F.col("dl").cast("double")
    )
    tfc = (
        F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl_eff / F.lit(avgdl))
        )
    )
    parts = (
        decoded.join(F.broadcast(meta), "term_id")
        .join(hits.select("docid"), "docid", "left_semi")
        .withColumn("idf", idf)
        .withColumn("tf_component", tfc)
        .withColumn("term_score", F.col("idf") * F.col("tf_component"))
    )
    expl = parts.groupBy("docid").agg(
        F.sort_array(
            F.collect_list(
                F.struct("term", "tf", "df", "idf", "tf_component", "term_score")
            )
        ).alias("_explain")
    )
    return hits.join(expl, "docid", "left").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
