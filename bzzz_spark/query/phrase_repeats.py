"""Sloppy phrases with REPEATED terms — Lucene SloppyPhraseMatcher's
repeating-terms machinery (the last pinned phrase-semantics exclusion).

Lucene's sloppy walk for distinct terms advances one PhrasePositions at
a time from a PQ keyed by adjusted position (pos - phrase_offset),
recording a match of weight 1/(1 + matchLength) at each role swap.
With repeated terms ("a b a"), two legs of the same term walk the SAME
occurrence list and must never claim one token occurrence twice.
Lucene (SloppyPhraseMatcher.java, public Apache source; the reference
serves the behavior through the classic parser's `"..."~N` → Lucene
PhraseQuery.setSlop path, src/bzzz/queries/query_parser.clj:6-17)
handles this with repeat GROUPS:

- group = the legs sharing one term, ordered by phrase offset;
- init: every leg starts at the term's first occurrence, then the i-th
  group member is advanced i extra times, so member i sits on the
  (i+1)-th occurrence (distinct tokens by construction);
- walk: after the current leg advances, collisions are resolved —
  while any same-group member sits on the same TOKEN position
  (tpPos = adjusted + offset = the raw occurrence), the LESSER of the
  two (by (adjusted, offset)) advances; exhaustion anywhere ends the
  walk (the pending match still scores, same as Lucene's phraseFreq
  tail).

The cached-`next` discipline is preserved exactly: `next` (the PQ
top's position) refreshes ONLY at role swaps, never after collision
resolution moves queue members — that is Lucene's observable behavior
and both this port and the oracle's independent port pin it.

Multi-term repeat groups (overlapping repeats of DIFFERENT terms via
MultiPhraseQuery synonyms) cannot be produced by the plain string
phrases this engine parses, so each repeated term is its own group —
the `hasMultiTermRpts == false` branch of Lucene's init, which is the
complete case here.

Scale shape: this runs per candidate doc AFTER the docid intersection
(docs containing every unique phrase term, further pre-filtered by
tf >= multiplicity in the caller), on positions already block-pruned —
the same bounded-candidate discipline as the distinct-terms k>=3 walk.
"""

from __future__ import annotations

import numpy as np


def repeat_groups(terms: list) -> list[list[int]]:
    """Leg indexes per repeated term, offsets ascending — Lucene's
    rptGroups for the plain-phrase (no synonym) case."""
    by_term: dict = {}
    for off, t in enumerate(terms):
        by_term.setdefault(t, []).append(off)
    return [legs for legs in by_term.values() if len(legs) > 1]


def sloppy_freq_repeats(
    adj_lists: list[np.ndarray], groups: list[list[int]], slop: int
) -> float:
    """One doc's sloppy phrase_freq with repeated terms.

    ``adj_lists[j]``: leg j's ADJUSTED positions (occurrence - j),
    sorted ascending; repeated-term legs carry the same occurrences
    under different adjustments.  ``groups``: repeat_groups(terms).
    """
    k = len(adj_lists)
    if k == 1:
        return float(len(adj_lists[0]))
    ptr = [0] * k
    pos = [0] * k
    for j in range(k):
        if len(adj_lists[j]) == 0:
            return 0.0
        pos[j] = int(adj_lists[j][0])
    end = max(pos)

    def advance(j: int) -> bool:
        nonlocal end
        ptr[j] += 1
        if ptr[j] >= len(adj_lists[j]):
            return False
        pos[j] = int(adj_lists[j][ptr[j]])
        if pos[j] > end:
            end = pos[j]
        return True

    group_of = {}
    for gi, g in enumerate(groups):
        for j in g:
            group_of[j] = gi
    # init stagger: group member i -> (i+1)-th occurrence
    for g in groups:
        for i, j in enumerate(g):
            for _ in range(i):
                if not advance(j):
                    return 0.0

    in_pq = set(range(k))

    def pq_pop() -> int:
        j = min(in_pq, key=lambda x: (pos[x], x))
        in_pq.discard(j)
        return j

    cur = pq_pop()
    match_length = end - pos[cur]
    next_pos = min(pos[j] for j in in_pq)
    freq = 0.0
    while True:
        if not advance(cur):
            break
        if cur in group_of:
            # resolve collisions: follow the advanced leg, like Lucene's
            # advanceRpts rebinds pp to the lesser it just moved
            p = cur
            dead = False
            while True:
                g = groups[group_of[p]]
                tp = pos[p] + p
                coll = next(
                    (j2 for j2 in g if j2 != p and pos[j2] + j2 == tp), None
                )
                if coll is None:
                    break
                lo = p if (pos[p], p) < (pos[coll], coll) else coll
                if not advance(lo):
                    dead = True
                    break
                p = lo
            if dead:
                break
        if pos[cur] > next_pos:
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            in_pq.add(cur)
            cur = pq_pop()
            next_pos = min(pos[j] for j in in_pq)
            match_length = end - pos[cur]
        else:
            ml2 = end - pos[cur]
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq
