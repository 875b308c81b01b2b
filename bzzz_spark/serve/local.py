"""In-process serving over a Spark-built index — zero Spark jobs.

The reference's deployment shape is a long-lived process holding hot
Lucene searchers (src/bzzz/index_directory.clj:129-132 refreshes an
in-process IndexSearcher per shard): queries cost microseconds of
scheduling, not a cluster round-trip.  Spark's analog has a structural
floor — even a fully-pruned narrow job pays ~0.1-0.2 s of driver
scheduling + Python-worker round-trip — so a latency-critical serving
tier should not run queries AS Spark jobs at all.  This module is that
tier: it opens the persisted index layout (build/checkpoint.py's
docs/ dictionary/ stats/ postings/ parquet directories) with pyarrow
and answers queries by running the SAME per-segment numpy kernels the
Spark path uses (query/wand.py plan_candidates → KernelPlan), so the
two runtimes are rank- and score-identical by construction — one
planner, one kernel, two block-fetch strategies.

Division of labor at 100 TB:
  * Spark builds (and incrementally rebuilds) the index — the scan,
    tokenize, shuffle, encode work that needs a cluster.
  * Each serving node opens its shard's directory with LocalIndex —
    the dictionary is memory-resident (Lucene's FST analog), postings
    stay on disk and are fetched per-query via parquet row-group
    pruning on term_id (postings files are written term_id-sorted, so
    a query reads only its own terms' blocks — the same pruned-bytes
    property tools/cold_io_bench.py measures for the Spark reader).
  * Scatter/gather across shards is the caller's (or Spark's) job;
    one LocalIndex = one shard, mirroring one reference node.

Scope: the block-max kernel shapes (term / bool / phrase / dv-range /
wildcard / fuzzy / constant-score / dis-max — everything
plan_candidates serves).  Shapes only the exhaustive executor answers
(spatial sorts, custom-score rescoring, facets) raise: they are
analytics, not serving-path lookups, and belong on the Spark runtime.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd

from bzzz_spark.query import ast


class _ColumnsShim:
    """Duck-types the one DataFrame attribute the planner reads."""

    def __init__(self, columns: list[str]):
        self.columns = list(columns)


class LocalIndex:
    """A read-only, in-process view of one persisted index directory.

    Duck-types the planner-facing surface of BzzzIndex (config,
    scalar_stats, lookup_terms, postings.columns, the expansion cache)
    so query/wand.py's plan_candidates serves both runtimes unchanged.
    Snapshot-immutable: caches never go stale (a rebuilt index is a new
    directory generation, reopened as a new LocalIndex — the serving
    analog of the reference's 5 s searcher refresh)."""

    wand_safe = True

    def __init__(self, out_dir: str, cache_blocks: bool = True,
                 max_cached_terms: int = 100_000):
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        from bzzz_spark.build.checkpoint import load_config

        self.out_dir = out_dir
        self.config = load_config(out_dir)
        self._post_ds = pads.dataset(
            os.path.join(out_dir, "postings"), format="parquet",
            partitioning="hive",
        )
        self._dict_ds = pads.dataset(
            os.path.join(out_dir, "dictionary"), format="parquet"
        )
        self._docs_ds = pads.dataset(
            os.path.join(out_dir, "docs"), format="parquet"
        )
        st = pq.read_table(os.path.join(out_dir, "stats")).to_pylist()[0]
        self._stats = (int(st["n_docs"]), float(st["avgdl"]))
        self._block_cols = [
            n for n in self._post_ds.schema.names if n != "chunk"
        ]
        self.postings = _ColumnsShim(self._block_cols)
        self._term_cache: dict = {}
        self._expansion_cache: dict = {}
        self._terms_arr = None  # lazy full term list (expansion only)
        # hot-term block cache: term_id → its (encoded) block rows.
        # The serving analog of a hot Lucene searcher's working set —
        # repeat queries over a hot index never touch parquet again.
        # Entries hold ENCODED blocks (varint bytes, ~3 B/posting), so
        # the cap bounds memory at roughly the hot terms' index bytes;
        # plain LRU via dict reinsertion order.
        self._cache_blocks = bool(cache_blocks)
        self._max_cached_terms = int(max_cached_terms)
        self._block_cache: dict[int, pd.DataFrame] = {}
        self._manifest_mtime = os.path.getmtime(
            os.path.join(out_dir, "manifest.json")
        )

    def refresh(self) -> bool:
        """Reopen when the on-disk index generation changed — the
        serving analog of the reference's 5 s SearcherManager refresh
        (index_directory.clj:129-132).  Returns True if a new
        generation was opened (all caches drop).  The writers
        (write_index / build_and_write) replace the manifest atomically
        via os.replace, so its mtime marks the generation.  Unlike
        Lucene's immutable segment files, an in-place overwrite deletes
        the old parquet files — call refresh() before serving after a
        rewrite; a stale handle errors loudly rather than serving a
        torn snapshot."""
        p = os.path.join(self.out_dir, "manifest.json")
        if os.path.getmtime(p) == self._manifest_mtime:
            return False
        self.__init__(self.out_dir, self._cache_blocks,
                      self._max_cached_terms)
        return True

    # -- planner surface -------------------------------------------------

    def scalar_stats(self) -> tuple[int, float]:
        return self._stats

    def lookup_terms(self, keys) -> dict:
        """Same contract as BzzzIndex.lookup_terms: {key: (term_id, df)}
        for the present subset, negative results cached, fetch cost only
        for never-seen keys — a pyarrow predicate scan of the dictionary
        instead of a Spark job."""
        import pyarrow.compute as pc

        keys = list(keys)
        missing = [k for k in keys if k not in self._term_cache]
        if missing:
            tbl = self._dict_ds.to_table(
                columns=["term", "term_id", "df"],
                filter=pc.field("term").isin(missing),
            )
            found = {
                t: (int(i), int(d))
                for t, i, d in zip(
                    tbl["term"].to_pylist(),
                    tbl["term_id"].to_pylist(),
                    tbl["df"].to_pylist(),
                )
            }
            for k in missing:
                self._term_cache[k] = found.get(k)
        return {k: v for k in keys if (v := self._term_cache[k]) is not None}

    def expand_candidates(self, patterns, prefixes) -> list[str]:
        """Wildcard/Fuzzy pattern expansion against the memory-resident
        term dictionary — the LocalIndex analog of
        executor.expand_multiterm's dictionary-scan job, with identical
        match semantics (anchored glob regex; length-band + prefix_len
        + levenshtein for fuzzy, measured on the bare token).  The full
        term list loads lazily on first pattern query and stays resident
        (Lucene keeps its term dictionary FST memory-resident the same
        way)."""
        from bzzz_spark.oracle.pyoracle import levenshtein
        from bzzz_spark.query.executor import glob_to_regex

        if self._terms_arr is None:
            self._terms_arr = (
                self._dict_ds.to_table(columns=["term"])["term"].to_pylist()
            )
        out: set[str] = set()
        for p, pre in zip(patterns, prefixes):
            if isinstance(p, ast.Wildcard):
                rx = re.compile(glob_to_regex(pre + p.value))
                out.update(t for t in self._terms_arr if rx.match(t))
            else:  # Fuzzy
                lo = len(p.value) - p.max_edits
                hi = len(p.value) + p.max_edits
                lit = pre + p.value[: p.prefix_len]
                for t in self._terms_arr:
                    if pre and not t.startswith(pre):
                        continue
                    bare = t[len(pre):]
                    if not (lo <= len(bare) <= hi):
                        continue
                    if p.prefix_len > 0 and not t.startswith(lit):
                        continue
                    if levenshtein(bare, p.value) <= p.max_edits:
                        out.add(t)
        return sorted(out)

    # -- block + doc fetch -------------------------------------------------

    def fetch_blocks(self, term_ids) -> pd.DataFrame:
        """Posting blocks for the given terms, as one pandas frame.
        The term_id filter prunes parquet row groups via min/max stats
        (blocks are written term_id-sorted within files), so a query
        reads only its own terms' bytes — the on-disk analog of the
        Spark path's pushed isin filter.  Cache hits skip parquet
        entirely (see _block_cache)."""
        import pyarrow.compute as pc

        tids = [int(t) for t in term_ids]
        if not self._cache_blocks:
            return self._post_ds.to_table(
                columns=self._block_cols,
                filter=pc.field("term_id").isin(tids),
            ).to_pandas()
        missing = [t for t in tids if t not in self._block_cache]
        if missing:
            fresh = self._post_ds.to_table(
                columns=self._block_cols,
                filter=pc.field("term_id").isin(missing),
            ).to_pandas()
            groups = {t: g for t, g in fresh.groupby("term_id", sort=False)}
            empty = fresh.iloc[0:0]
            for t in missing:
                self._block_cache[t] = groups.get(t, empty)
        parts = []
        for t in tids:
            g = self._block_cache.pop(t)  # reinsert = LRU touch
            self._block_cache[t] = g
            if len(g):
                parts.append(g)
        while len(self._block_cache) > self._max_cached_terms:
            self._block_cache.pop(next(iter(self._block_cache)))
        if not parts:
            return self._block_cache[tids[0]].iloc[0:0] if tids else (
                pd.DataFrame(columns=self._block_cols)
            )
        return pd.concat(parts, ignore_index=True)

    def fetch_docs(self, docids, columns=None) -> pd.DataFrame:
        """Stored fields for the given docids (R1 field projection).
        docs/ is written docid-sorted, so the isin filter prunes row
        groups the same way the Spark reader's pushed filter does."""
        import pyarrow.compute as pc

        cols = None
        if columns is not None:
            cols = list(dict.fromkeys(columns))
        tbl = self._docs_ds.to_table(
            columns=cols,
            filter=pc.field("docid").isin([int(d) for d in docids]),
        )
        pdf = tbl.to_pandas()
        if "tokens" in pdf.columns and (columns is None):
            pdf = pdf.drop(columns=["tokens"])
        return pdf


_EMPTY = pd.DataFrame(
    {"docid": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
)


def local_candidates(
    index: LocalIndex, node: ast.Query, k: int
) -> pd.DataFrame | None:
    """Per-segment top-k (docid, score) via the shared KernelPlan; None
    for shapes the kernels can't serve."""
    from bzzz_spark.query.wand import plan_candidates

    if isinstance(node, ast.Phrase) and node.boost >= 0:
        # a bare phrase is the one kernel-family shape classify() only
        # accepts inside a conjunction; Bool(must=[phrase]) is
        # score-identical (the must-sum of one clause)
        node = ast.Bool(must=[node])
    plan = plan_candidates(index, node, k)
    if plan is None:
        return None
    if plan.empty:
        return _EMPTY.copy()
    blocks = index.fetch_blocks(plan.tids)
    if not len(blocks):
        return _EMPTY.copy()
    # per-segment kernels run SERIALLY in this process: measured on
    # this box, a thread pool over segments is 2-7x SLOWER (the
    # kernels interleave many small numpy calls, so threads convoy on
    # the GIL).  Cross-segment/shard parallelism belongs to processes
    # — one LocalIndex per shard, like one reference node per shard.
    outs = [
        plan.kernel(g) for _, g in blocks.groupby("segment", sort=False)
    ]
    outs = [o for o in outs if len(o)]
    if not outs:
        return _EMPTY.copy()
    return pd.concat(outs, ignore_index=True)


def local_search(
    index: LocalIndex, query: "ast.Query | dict | str", size: int = 20,
    page: int = 0
) -> pd.DataFrame:
    """Top-k hits (docid, score), rank- and score-identical to the
    Spark path's executor.search: same parse → validate → normalize
    pipeline, same per-segment kernels, same (score desc, docid asc)
    merge order and page slice (reference paging semantics,
    index_search.clj:272-273,306).  Raises for shapes outside the
    kernel family — those are analytics queries that belong on the
    Spark runtime (executor.search)."""
    from bzzz_spark.query.executor import validate_fields
    from bzzz_spark.query.rewrite import normalize

    node = query if isinstance(query, ast.Query) else ast.parse_query(query)
    validate_fields(index, node)
    node = normalize(node)
    cand = local_candidates(index, node, size * page + size)
    if cand is None:
        raise ValueError(
            f"query shape {type(node).__name__} is outside the in-process "
            "serving family (block-max kernel shapes); run it through "
            "bzzz_spark.query.executor.search on the Spark runtime"
        )
    if not len(cand):
        return _EMPTY.copy()
    order = np.lexsort((cand["docid"].to_numpy(), -cand["score"].to_numpy()))
    k = size * page + size
    top = cand.iloc[order[:k]].iloc[page * size:].reset_index(drop=True)
    return top
