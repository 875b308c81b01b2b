"""Phrase execution: block-pruned positional decode + Lucene-parity
matching.

Semantics (pinned in :class:`bzzz_spark.query.ast.Phrase`):

- slop == 0 — Lucene ExactPhraseScorer: phrase_freq = number of start
  positions p with term_i at p + i for every i.
- slop > 0 — Lucene SloppyPhraseScorer: terms may
  appear in ANY order; each match is weighted 1/(1 + matchLength) where
  matchLength is the span slack in adjusted-position space (position -
  phrase_offset), exactly the greedy PQ walk of Lucene's
  SloppyPhraseScorer.phraseFreq (the reference serves this through the
  classic parser's `"a b"~N` syntax — src/bzzz/queries/query_parser.clj:6-17
  delegates to Lucene's PhraseQuery with setSlop).

Scale shape (the point of this module): the reference leapfrogs from the
rarest term's postings (TermPayloadClojureScoreQuery.java:237-257 shows
the per-segment leapfrog discipline); naively decoding every phrase
term's full position lists re-reads all of "the"'s positions for the
phrase "the merge".  Here each segment task:

  1. sorts the phrase's terms by their postings count in this segment;
  2. decodes the rarest term's blocks fully;
  3. for every other term keeps ONLY the blocks whose
     [first_docid, last_docid] range intersects the surviving candidate
     docids (np.searchsorted over block metadata — blocks that cannot
     contain a candidate are never decoded, positions included);
  4. intersects candidates term by term (docids only);
  5. verifies positions just for the final intersection, vectorized.

The per-term decoded-block count is therefore bounded by the rare
term's candidate ranges, not the head term's posting count —
tests/test_phrase.py asserts this with the kernel's stats output.

The matching kernels are numpy-vectorized across documents:
- exact: a (doc, start_position) group-count — a start matches iff all
  k legs contain it, so the composite key appears exactly k times;
- sloppy k == 2: a vectorized "crossing walk" over the two merged
  adjusted-position lists.  Derivation: Lucene's PQ walk records one
  match per role swap, pairing each crossing point y with the opposite
  list's largest value x <= y (matchLength = y - x); crossing points
  are y0 = max of the two heads, then alternately the opposite list's
  smallest value > y.  Each iteration advances ALL documents one
  crossing (global searchsorted), so the Python-loop count is the max
  crossings per doc (~2*min(tf)+1), not the doc count.
- sloppy k >= 3: batched greedy walk (every active doc advances one
  PhrasePositions per numpy step) — candidates at this point are docs
  containing ALL phrase terms;
- sloppy with REPEATED terms ("a b a"): Lucene's repeating-terms
  machinery (collision groups; see bzzz_spark.query.phrase_repeats),
  per candidate doc after a tf >= multiplicity prefilter.

The pure-Python oracle (bzzz_spark.oracle.pyoracle) carries an
INDEPENDENT heapq port of the same Lucene algorithm; the two are
cross-checked by randomized fuzz in tests/test_phrase.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bzzz_spark.build.codec import (
    decode_blocks_batch,
    decode_positions,
    decode_varints,
)
from bzzz_spark.query.phrase_repeats import repeat_groups

PHRASE_SCHEMA = "docid long, ptf double, dl long"

_EMPTY = pd.DataFrame(
    {
        "docid": pd.Series(dtype="int64"),
        "ptf": pd.Series(dtype="float64"),
        "dl": pd.Series(dtype="int64"),
    }
)


def _decode_blocks_pos(rows: pd.DataFrame):
    """Blocks (sorted by first_docid) → (docids, tfs, dls, flat_positions).
    docids ascending across the concatenation (blocks of one term in one
    segment have disjoint increasing ranges).  Batched: one varint pass
    per stream across all blocks (codec.decode_blocks_batch); the
    positions stream concatenates safely because each posting's first
    value is absolute, and block boundaries coincide with posting
    boundaries."""
    d, tf, _seg = decode_blocks_batch(
        rows["first_docid"].to_numpy(),
        rows["count"].to_numpy(),
        rows["doc_gaps"].tolist(),
        rows["tfs"].tolist(),
    )
    dl = decode_varints(b"".join(rows["dls"]))
    pos = decode_positions(b"".join(rows["positions"]), tf)
    return d, tf, dl, pos


def _exact_freqs(legs, n_cand: int):
    """legs: [(doc_rank, adjusted_pos)] per phrase offset, each sorted by
    (doc_rank, adj).  Returns (doc_rank, ptf) for docs with >=1 match."""
    k = len(legs)
    shift = 1
    for _, adj in legs:
        if adj.size:
            shift = max(shift, int(adj.max()) + 2)
    keys = []
    for doc_rank, adj in legs:
        m = adj >= 0  # a phrase cannot start before token 0
        # np.unique: stacked same-position tokens (position-filter
        # increment 0) must not double-count a single start position
        keys.append(np.unique(doc_rank[m].astype(np.int64) * shift + adj[m]))
    allk = np.concatenate(keys)
    u, c = np.unique(allk, return_counts=True)
    match = u[c == k]
    if match.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0)
    ur, cnt = np.unique(match // shift, return_counts=True)
    return ur, cnt.astype(np.float64)


def _sloppy_freqs_2(leg_a, leg_b, slop: int, n_cand: int):
    """Vectorized Lucene sloppy freq for 2 distinct terms — the crossing
    walk (see module docstring).  Every candidate doc has occurrences in
    both legs (guaranteed by the docid intersection)."""
    da, pa = leg_a
    db, pb = leg_b
    off = 4  # adjusted positions are >= -(k-1) = -1; keep keys positive
    hi = 1
    if pa.size:
        hi = max(hi, int(pa.max()))
    if pb.size:
        hi = max(hi, int(pb.max()))
    m = hi + off + 2
    ga = da.astype(np.int64) * m + pa + off
    gb = db.astype(np.int64) * m + pb + off
    docs = np.arange(n_cand, dtype=np.int64)
    a_hi = np.searchsorted(ga, (docs + 1) * m, "left")
    b_hi = np.searchsorted(gb, (docs + 1) * m, "left")
    a_lo = np.searchsorted(ga, docs * m, "left")
    b_lo = np.searchsorted(gb, docs * m, "left")
    ha, hb = ga[a_lo], gb[b_lo]
    # y = larger head; on ties the lower phrase offset (leg a) advances
    # first (Lucene PQ tie-break), so y stays with leg b
    side_a = ha > hb
    y = np.maximum(ha, hb)
    freq = np.zeros(n_cand)
    active = np.ones(n_cand, dtype=bool)
    while active.any():
        idx = np.flatnonzero(active)
        yi = y[idx]
        sa = side_a[idx]
        ib = np.searchsorted(gb, yi, "right") - 1  # largest b <= y
        ia = np.searchsorted(ga, yi, "right") - 1  # largest a <= y
        x = np.where(sa, gb[np.clip(ib, 0, gb.size - 1)],
                     ga[np.clip(ia, 0, ga.size - 1)])
        ml = yi - x
        ok = ml <= slop
        np.add.at(freq, idx[ok], 1.0 / (1.0 + ml[ok]))
        # next crossing: opposite list's smallest value > y (same doc)
        nxt = np.where(sa, ib + 1, ia + 1)
        lim = np.where(sa, b_hi[idx], a_hi[idx])
        has = nxt < lim
        nv = np.where(
            sa, gb[np.clip(nxt, 0, gb.size - 1)],
            ga[np.clip(nxt, 0, ga.size - 1)],
        )
        active[idx[~has]] = False
        goes = idx[has]
        y[goes] = nv[has]
        side_a[goes] = ~sa[has]  # the crossing value is from the opposite list
    got = freq > 0
    return np.flatnonzero(got), freq[got]


def _sloppy_freq_one(lists: list[np.ndarray], slop: int) -> float:
    """Array-based greedy walk for one doc, k >= 3 distinct terms —
    Lucene SloppyPhraseScorer.phraseFreq with an argmin scan instead of
    a heap (k is tiny).  Ties break by phrase offset, like Lucene's
    PhrasePositions PQ."""
    k = len(lists)
    ptr = [0] * k
    pos = [int(l[0]) for l in lists]
    end = max(pos)

    def argmin_leg():
        best = 0
        for i in range(1, k):
            if (pos[i], i) < (pos[best], best):
                best = i
        return best

    cur = argmin_leg()
    nxt = min(pos[i] for i in range(k) if i != cur)
    ml = end - pos[cur]
    freq = 0.0
    while True:
        ptr[cur] += 1
        if ptr[cur] >= len(lists[cur]):
            break
        p = int(lists[cur][ptr[cur]])
        pos[cur] = p
        if p > end:
            end = p
        if p > nxt:
            if ml <= slop:
                freq += 1.0 / (1.0 + ml)
            cur = argmin_leg()
            nxt = min(pos[i] for i in range(k) if i != cur)
            ml = end - pos[cur]
        else:
            ml = min(ml, end - p)
    if ml <= slop:
        freq += 1.0 / (1.0 + ml)
    return freq


def _sloppy_freqs_repeats(legs, groups, slop: int, n_cand: int):
    """Sloppy freq when the phrase REPEATS a term ("a b a") — per
    candidate doc, the Lucene repeating-terms walk from
    :mod:`bzzz_spark.query.phrase_repeats` (collision groups keep two
    legs of one term off the same token occurrence).

    Per-doc Python loop, deliberately: candidates here already contain
    every unique term with tf >= its multiplicity (the kernel
    prefilters), so the set is small the same way the distinct-terms
    k>=3 walk's candidate set is; the collision-resolution state
    machine's data-dependent control flow is what the batched walks
    avoid and repeats reintroduce."""
    from bzzz_spark.query.phrase_repeats import sloppy_freq_repeats

    k = len(legs)
    bounds = []
    docs = np.arange(n_cand + 1, dtype=np.int64)
    for doc_rank, _adj in legs:
        bounds.append(np.searchsorted(doc_rank, docs, "left"))
    out_r, out_f = [], []
    for r in range(n_cand):
        lists = [
            legs[j][1][bounds[j][r]:bounds[j][r + 1]] for j in range(k)
        ]
        f = sloppy_freq_repeats(lists, groups, slop)
        if f > 0:
            out_r.append(r)
            out_f.append(f)
    return (
        np.asarray(out_r, dtype=np.int64),
        np.asarray(out_f, dtype=np.float64),
    )


def _sloppy_freqs_k(legs, slop: int, n_cand: int):
    """Batched greedy walk for k >= 3 distinct terms — the same Lucene
    SloppyPhraseScorer.phraseFreq state machine as _sloppy_freq_one, but
    every ACTIVE candidate doc advances one PhrasePositions per numpy
    step, so the Python-loop count is the MAX total occurrence count in
    any single doc, not the doc count (the k=2 crossing walk's
    discipline, generalized).  legs are flat (doc_rank, adj) arrays
    sorted by (doc_rank, adj); per-doc slices via searchsorted.

    Cross-checked against _sloppy_freq_one and the oracle's independent
    heapq port in tests/test_phrase.py."""
    k = len(legs)
    docs = np.arange(n_cand + 1, dtype=np.int64)
    lo = np.empty((n_cand, k), dtype=np.int64)
    hi = np.empty((n_cand, k), dtype=np.int64)
    flat = []
    for j, (doc_rank, adj) in enumerate(legs):
        b = np.searchsorted(doc_rank, docs, "left")
        lo[:, j] = b[:-1]
        hi[:, j] = b[1:]
        flat.append(np.asarray(adj, dtype=np.int64))
    # upstream docid intersection guarantees every leg occurs in every
    # candidate; guard anyway (a missing leg means no match)
    valid = (hi > lo).all(axis=1)
    ptr = lo.copy()
    pos = np.zeros((n_cand, k), dtype=np.int64)
    for j in range(k):
        if flat[j].size:
            idx = np.clip(ptr[:, j], 0, flat[j].size - 1)
            pos[:, j] = flat[j][idx]
    end = pos.max(axis=1)
    cur = pos.argmin(axis=1)  # ties -> lowest phrase offset (Lucene PQ)
    nxt = np.partition(pos, 1, axis=1)[:, 1]  # min over legs != cur
    ml = end - pos[np.arange(n_cand), cur]
    freq = np.zeros(n_cand)
    active = valid.copy()
    while active.any():
        ids = np.flatnonzero(active)
        c = cur[ids]
        ptr[ids, c] += 1
        done = ptr[ids, c] >= hi[ids, c]
        fin = ids[done]
        if fin.size:
            # cur leg exhausted: the final pending match, then retire
            m = ml[fin] <= slop
            np.add.at(freq, fin[m], 1.0 / (1.0 + ml[fin[m]]))
            active[fin] = False
        go = ids[~done]
        if go.size == 0:
            continue
        cg = cur[go]
        p = np.empty(go.size, dtype=np.int64)
        for j in range(k):
            mj = cg == j
            if mj.any():
                p[mj] = flat[j][ptr[go[mj], j]]
        pos[go, cg] = p
        end[go] = np.maximum(end[go], p)
        swap = p > nxt[go]
        sw = go[swap]
        if sw.size:
            # role swap: record one match at the current matchLength,
            # then re-aim at the new min leg (greedy PQ discipline)
            m = ml[sw] <= slop
            np.add.at(freq, sw[m], 1.0 / (1.0 + ml[sw[m]]))
            ps = pos[sw]
            cur[sw] = ps.argmin(axis=1)
            nxt[sw] = np.partition(ps, 1, axis=1)[:, 1]
            ml[sw] = end[sw] - ps[np.arange(sw.size), cur[sw]]
        ns = go[~swap]
        if ns.size:
            ml[ns] = np.minimum(ml[ns], end[ns] - p[~swap])
    got = freq > 0
    return np.flatnonzero(got), freq[got]


def phrase_segment_kernel(
    blocks: pd.DataFrame, tid_order: list[int], slop: int,
    stats: dict | None = None, restrict: np.ndarray | None = None,
) -> pd.DataFrame:
    """One segment's phrase evaluation → (docid, ptf, dl).

    ``stats`` (tests/plan audits) accumulates
    {"total_blocks": {tid: n}, "decoded_blocks": {tid: n}} — the pruning
    guarantee is decoded_blocks[head] << total_blocks[head] when a rare
    term anchors the phrase.

    ``restrict`` (sorted docid array): pre-established candidate set
    from an enclosing conjunction (the WAND mixed-conjunction path —
    `error AND "stack trace"` hands the phrase only error's survivors).
    Every leg's blocks — including the rarest — are pruned against it,
    and the output docids are a subset of it."""
    if restrict is not None and restrict.size == 0:
        return _EMPTY
    uniq = list(dict.fromkeys(int(t) for t in tid_order))
    per = {}
    for tid in uniq:
        sub = blocks[blocks["term_id"] == tid]
        if len(sub) == 0:
            return _EMPTY  # a missing must-term: no phrase in this segment
        per[tid] = sub.sort_values("first_docid")
        if stats is not None:
            tb = stats.setdefault("total_blocks", {})
            tb[tid] = tb.get(tid, 0) + len(sub)
    order = sorted(uniq, key=lambda t: int(per[t]["count"].sum()))
    decoded = {}
    cand = cand_dl = None
    for i, tid in enumerate(order):
        sub = per[tid]
        bound_to = cand if i > 0 else restrict
        if bound_to is not None:
            # block-range pruning: decode only blocks that can hold a
            # surviving candidate
            lo = np.searchsorted(bound_to, sub["first_docid"].to_numpy(),
                                 "left")
            hi = np.searchsorted(bound_to, sub["last_docid"].to_numpy(),
                                 "right")
            sub = sub[hi > lo]
            if len(sub) == 0:
                return _EMPTY
        if stats is not None:
            db = stats.setdefault("decoded_blocks", {})
            db[tid] = db.get(tid, 0) + len(sub)
        d, tf, dl, flat_pos = _decode_blocks_pos(sub)
        decoded[tid] = (d, tf, flat_pos)
        if i == 0:
            cand, cand_dl = d, dl
            if restrict is not None:
                idx = np.clip(
                    np.searchsorted(restrict, cand), 0, restrict.size - 1
                )
                hit = restrict[idx] == cand
                cand, cand_dl = cand[hit], cand_dl[hit]
                if cand.size == 0:
                    return _EMPTY
        else:
            idx = np.clip(np.searchsorted(d, cand), 0, d.size - 1)
            hit = d[idx] == cand
            cand, cand_dl = cand[hit], cand_dl[hit]
            if cand.size == 0:
                return _EMPTY
    # one grouping rule for the engine: phrase_repeats.repeat_groups
    # (the oracle keeps its own deliberately-independent copy)
    rpt_groups = repeat_groups([int(t) for t in tid_order])
    if rpt_groups:
        # a repeated term needs one DISTINCT occurrence per leg: docs
        # with tf < multiplicity can never match — drop them before the
        # (repeats: per-doc) matching walk
        keep = np.ones(cand.size, dtype=bool)
        for g in rpt_groups:
            tid = int(tid_order[g[0]])
            d, tf, _ = decoded[tid]
            idx = np.clip(np.searchsorted(d, cand), 0, d.size - 1)
            keep &= tf[idx] >= len(g)
        cand, cand_dl = cand[keep], cand_dl[keep]
        if cand.size == 0:
            return _EMPTY
    legs = []
    for off, tid in enumerate(int(t) for t in tid_order):
        d, tf, flat_pos = decoded[tid]
        occ_doc = np.repeat(d, tf)
        idx = np.clip(np.searchsorted(cand, occ_doc), 0, max(cand.size - 1, 0))
        keep = cand[idx] == occ_doc
        legs.append((idx[keep], flat_pos[keep] - off))
    if slop == 0 or len(tid_order) == 1:
        # one leg: every occurrence matches with matchLength 0 (Lucene
        # rewrites a 1-term PhraseQuery to a TermQuery), so the exact
        # group-count — which degenerates to ptf = tf for k == 1 —
        # already gives the right sloppy freq
        doc_rank, ptf = _exact_freqs(legs, cand.size)
    elif rpt_groups:
        doc_rank, ptf = _sloppy_freqs_repeats(legs, rpt_groups, slop,
                                              cand.size)
    elif len(tid_order) == 2:
        doc_rank, ptf = _sloppy_freqs_2(legs[0], legs[1], slop, cand.size)
    else:
        doc_rank, ptf = _sloppy_freqs_k(legs, slop, cand.size)
    if doc_rank.size == 0:
        return _EMPTY
    return pd.DataFrame(
        {"docid": cand[doc_rank], "ptf": ptf, "dl": cand_dl[doc_rank]}
    )


def phrase_matches(index, tid_order: list[int], slop: int) -> DataFrame:
    """Distributed phrase match → DataFrame(docid, ptf, dl).

    One task per touched segment; within a task the kernel decodes
    positions only for block ranges that can still hold a candidate.
    On a segment-aligned serving index (BzzzIndex.persist(
    layout="segment")) this runs as a NARROW mapInPandas — no shuffle;
    otherwise the blocks are grouped by segment first (small shuffle:
    only the phrase terms' blocks move)."""
    if "positions" not in index.postings.columns:
        raise ValueError(
            "this index stores no positions — build it with "
            "IndexConfig(store_positions=True) to answer phrase queries"
        )
    uniq = sorted(set(int(t) for t in tid_order))
    blocks = index.postings.filter(F.col("term_id").isin(uniq))
    if getattr(index, "segment_aligned", False):

        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts = [p for p in it if len(p)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True)
            for _, g in pdf.groupby("segment", sort=False):
                out = phrase_segment_kernel(g, tid_order, slop)
                if len(out):
                    yield out

        return blocks.mapInPandas(run, PHRASE_SCHEMA)
    return blocks.groupby("segment").applyInPandas(
        lambda pdf: phrase_segment_kernel(pdf, tid_order, slop), PHRASE_SCHEMA
    )
