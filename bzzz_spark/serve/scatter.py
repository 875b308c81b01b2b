"""Multi-shard serving: scatter/gather + exact k-way merge.

The reference's deployment story is N shards, each a node-local Lucene
searcher, with the coordinator merging per-shard results
(src/bzzz/index_search.clj:115-155 `reduce-collection`: sum totals,
concat hits, re-sort with the full comparator, re-limit;
index_search.clj:209-244 the comparator incl. reverse sorts;
src/bzzz/index_store.clj:119-122 routes a doc to
`hash(id) mod n-shards`).  `sharding_test.clj:27-78` pins the
invariant this module's tests strengthen: sharding must not change
results — here hit-for-hit, scores included.

Per-shard Lucene scores with SHARD-LOCAL idf/norms stats, so the
reference's merged ranking drifts from a single index's.  We fix that
the way distributed Lucene deployments do (Elasticsearch's
dfs_query_then_fetch, made static): `build_sharded` runs ONE global
pass for docids + dictionary (global df) + stats (global n_docs,
avgdl), then encodes each shard's postings AGAINST THOSE GLOBAL STATS.
Every shard therefore scores — and block-max-prunes, the baked
block_max_score bounds being globally correct — exactly as the single
fat index would, docids are GLOBAL (assigned before routing), and the
gather's (score desc, docid asc) merge reproduces the single-index
result bit-for-bit, ties included.

Scale shape: the global pass is the standard distributed build; each
shard's postings encode is a distributed job over ~1/n of the corpus
(the checkpoint module's chunk discipline — total work ≈ one build
plus one extra tokenize pass), and shards can build concurrently.  In
this process the scatter loop is serial per shard (kernels convoy on
the GIL under threads — measured in serve.local); in deployment each
shard is its own process/host, so query wall-clock is max(shard) +
merge, not sum.
"""

from __future__ import annotations

import json
import os
from dataclasses import replace

import numpy as np
import pandas as pd

from bzzz_spark.query import ast
from bzzz_spark.serve.local import (
    LocalIndex,
    _apply_sort,
    _facet_cut,
    _label_counts,
    _sorted_candidates,
    local_matched,
    local_search,
    local_total_hits,
)

SHARD_MANIFEST = "sharded.json"


def shard_id(key: str, n_shards: int):
    """Routing Column: shard = pmod(xxhash64(key), n_shards) — the
    reference's `mod(hash(id), n-shards)` (index_store.clj:119-122)
    with a portable, partitioning-independent hash."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_shards))


def build_sharded(
    table, out_dir: str, n_shards: int, cfg=None, route_col: str | None = None
) -> dict:
    """Build N serving shards (out_dir/shard=i/, each a complete
    LocalIndex directory) that together answer EXACTLY like one index.

    One global pass assigns docids (dense over key_cols — the same
    order a single build uses), computes the dictionary (global df per
    term) and the corpus stats; each shard then re-derives tf for its
    routed docs (hash(route_col) — default the first key column, the
    reference's doc-id routing) and encodes postings with the GLOBAL
    stats, so per-posting scores and block-max bounds match the
    single-index build exactly.  Every shard carries the full (shared)
    dictionary and global stats; its docs/postings hold only its slice.
    """
    from pyspark.sql import functions as F

    from bzzz_spark.build.checkpoint import _full_tf, write_index
    from bzzz_spark.build.indexer import (
        BzzzIndex,
        IndexConfig,
        build_dictionary,
        build_docs,
        encode_postings,
    )

    if int(n_shards) <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    cfg = cfg or IndexConfig()
    # shard postings use the docid//segment_size numbering (the
    # checkpoint/shuffle discipline) — record that in the per-shard
    # manifests whatever the caller's merge_mode preference was
    cfg = replace(cfg, merge_mode="shuffle")
    route = route_col or cfg.key_cols[0]
    os.makedirs(out_dir, exist_ok=True)

    docs = build_docs(table, cfg).persist()  # GLOBAL docids, key order
    tf = _full_tf(docs, cfg).persist()
    n_docs = docs.count()
    tot = tf.agg(
        F.sum(F.when(F.col("dl") > 0, F.col("tf")).otherwise(F.lit(0)))
        .alias("t")
    ).collect()[0]["t"]
    avgdl = (float(tot or 0) / n_docs) if n_docs else 0.0
    dictionary = build_dictionary(tf, cfg).persist()
    dictionary.count()
    # tf is dead once the dictionary materialized: the per-shard loops
    # below re-derive tf from their docs slice, so free the largest
    # cached frame BEFORE the heavy encode phase
    tf.unpersist()
    stats = docs.sparkSession.createDataFrame(
        [(n_docs, avgdl)], "n_docs long, avgdl double"
    )
    extra = (["positions"] if cfg.store_positions else []) + list(
        cfg.docvalue_cols
    )
    for i in range(n_shards):
        docs_i = docs.filter(shard_id(route, n_shards) == i)
        rows = (
            _full_tf(docs_i, cfg)
            .join(dictionary.select("term", "term_id", "df"), "term")
            .withColumn(
                "segment",
                (F.col("docid") / F.lit(cfg.segment_size)).cast("int"),
            )
            .select("term_id", "segment", "docid", "tf", "dl", "df", *extra)
        )
        idx = BzzzIndex(
            docs=docs_i.withColumn(
                "segment",
                (F.col("docid") / F.lit(cfg.segment_size)).cast("int"),
            ).drop("tokens"),
            dictionary=dictionary,
            postings=encode_postings(rows, n_docs, avgdl, cfg),
            stats=stats,
            config=cfg,
        )
        write_index(idx, os.path.join(out_dir, f"shard={i}"))
    docs.unpersist()
    dictionary.unpersist()
    m = {"n_shards": int(n_shards), "route_col": route,
         "n_docs": int(n_docs)}
    tmp = os.path.join(out_dir, SHARD_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, os.path.join(out_dir, SHARD_MANIFEST))
    return m


class ShardedIndex:
    """Coordinator over N LocalIndex shards — the serving analog of the
    reference's `search-many` fan-out + `reduce-collection` merge
    (index_search.clj:115-155,256-276)."""

    def __init__(self, out_dir: str, **local_kwargs):
        with open(os.path.join(out_dir, SHARD_MANIFEST)) as f:
            m = json.load(f)
        self.out_dir = out_dir
        self.n_shards = int(m["n_shards"])
        self.route_col = m["route_col"]
        self.shards = [
            LocalIndex(os.path.join(out_dir, f"shard={i}"), **local_kwargs)
            for i in range(self.n_shards)
        ]

    def refresh(self) -> bool:
        """Reopen every shard whose on-disk generation changed."""
        return any([s.refresh() for s in self.shards])

    def total_hits(self, query) -> int:
        """Sum of per-shard totals (index_search.clj:121) — except a
        bare term, whose GLOBAL df sits in the shared dictionary every
        shard carries: one zero-I/O lookup instead of N counts."""
        node = query if isinstance(query, ast.Query) else ast.parse_query(query)
        if isinstance(node, ast.Term):
            return local_total_hits(self.shards[0], node)
        return sum(local_total_hits(s, node) for s in self.shards)

    def search(
        self, query, size: int = 20, page: int = 0,
        fields: list[str] | None = None,
    ) -> pd.DataFrame:
        """Global top-k: per-shard kernel top-k (k = page·size + size —
        the global top-k is a subset of the union of per-shard top-k),
        concat, ONE stable re-sort on (score desc, docid asc), page
        slice.  Docids are global, so this is the single-index
        comparator verbatim — hit-for-hit parity, ties included."""
        k = page * size + size
        parts = []
        for si, s in enumerate(self.shards):
            pdf = local_search(s, query, size=k, page=0).copy()
            pdf["__shard"] = si  # internal: a stored column may be 'shard'
            parts.append(pdf)
        allh = pd.concat(parts, ignore_index=True)
        order = np.lexsort(
            (allh["docid"].to_numpy(), -allh["score"].to_numpy())
        )
        top = allh.iloc[order[:k]].iloc[page * size:].reset_index(drop=True)
        if fields:
            top = self._attach_fields(top, fields)
        return self._expose_shard(top)

    def sorted_search(
        self, query, sort: list, size: int = 20, page: int = 0,
    ) -> pd.DataFrame:
        """Field-sorted top-k across shards with the full comparator
        (asc/desc per key, nulls last, docid tiebreak) applied at the
        merge — reference index_search.clj:209-244.  Expression sorts
        raise in _sorted_candidates → Spark runtime."""
        k = page * size + size
        parts, specs = [], None
        for si, s in enumerate(self.shards):
            pdf, specs = _sorted_candidates(s, query, sort)
            pdf = _apply_sort(pdf, specs, ["docid"]).iloc[:k].copy()
            pdf["__shard"] = si
            parts.append(pdf)
        allh = pd.concat(parts, ignore_index=True)
        top = (
            _apply_sort(allh, specs, ["docid"])
            .iloc[page * size: k]
            .reset_index(drop=True)
        )
        out = top.rename(columns={"_score": "score"})
        keep = ["__shard", "docid", "score"]
        keep += [n for n, _ in specs if n not in keep and n != "_score"]
        return self._expose_shard(out[[c for c in keep if c in out.columns]])

    def facet_counts(
        self, query, facet_field: str, size: int = 20,
        use_analyzer: bool = False,
    ) -> pd.DataFrame:
        """EXACT cross-shard facet merge: per-shard label counts over
        the full matched set, summed UNCUT, then one (count desc,
        label asc) cut — the correctness the reference documents as
        unreachable for its post-cut merge (index_search.clj:186-204
        'broken by design'); parity with the Spark path's global
        groupBy is pinned in tests."""
        totals: dict = {}
        for s in self.shards:
            docids = (
                local_matched(s, query)["docid"].to_numpy().astype(np.int64)
            )
            for lbl, c in _label_counts(
                s, docids, facet_field, use_analyzer
            ).items():
                totals[lbl] = totals.get(lbl, 0) + c
        return _facet_cut(totals, size)

    def _attach_fields(
        self, pdf: pd.DataFrame, fields: list[str]
    ) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["__pos"] = np.arange(len(pdf))
        parts = []
        for si, g in pdf.groupby("__shard", sort=False):
            stored = self.shards[int(si)].fetch_docs(
                g["docid"].tolist(), columns=["docid", *fields]
            )
            parts.append(g.merge(stored, on="docid", how="left"))
        out = pd.concat(parts, ignore_index=True) if parts else pdf
        return (
            out.sort_values("__pos").drop(columns="__pos")
            .reset_index(drop=True)
        )

    @staticmethod
    def _expose_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        """Expose the internal routing column as 'shard' unless a
        stored/sort column of that name is present (then it stays
        '__shard' rather than clobbering user data)."""
        if "shard" in pdf.columns:
            return pdf
        return pdf.rename(columns={"__shard": "shard"})


def open_serving(out_dir: str, **kw):
    """Open either layout: a sharded root (sharded.json) → ShardedIndex,
    a single index directory → LocalIndex."""
    if os.path.exists(os.path.join(out_dir, SHARD_MANIFEST)):
        return ShardedIndex(out_dir, **kw)
    return LocalIndex(out_dir, **kw)
