"""Phrase- and boolean-retrieval kernels (pure numpy, no Ray).

The reference engine (retrieval.py) is bag-of-words only; phrase and
boolean queries are the standard fulltext features a user of a Lucene-
class engine expects, so we add them on top of the same index layout
WITHOUT changing it (the shard files stay byte-identical to rounds
1-3).  That layout stores, per (term, doc), the reference's *character
offsets* into the normalized chunk (indexing.py:126-135), not token
ordinals — which shapes the phrase design:

- candidate generation is exact set algebra over posting doc-id arrays
  (conjunction of the phrase's stems);
- an *ordered-chain* prefilter over the stored char offsets keeps only
  docs where the phrase stems occur at strictly increasing offsets
  (optionally gap-bounded) — a true phrase occurrence always satisfies
  it within one tokenizer chunk, so the prefilter never drops a real
  match for docs under ``chunk_chars`` (the 800k default);
- exact verification retokenizes ONLY the surviving candidates' texts
  (a docstore point lookup + :func:`contains_consecutive` scan), the
  classic approximate-then-verify serving pattern.

Phrase semantics match the index's token stream: stopwords are dropped
and stems compared, so the phrase "data the stream" matches a document
reading "data ... the ... stream" — the same gap behaviour Lucene's
analyzer-then-PhraseQuery produces with a stopword filter.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "positions_by_doc",
    "ordered_chain_docs",
    "contains_consecutive",
    "intersect_doc_ids",
    "boolean_doc_ids",
    "sum_scores_for_docs",
]


def positions_by_doc(doc_ids: np.ndarray, counts: np.ndarray,
                     flat_positions: np.ndarray,
                     wanted: np.ndarray) -> list[np.ndarray]:
    """Per-doc position slices for ``wanted`` docs (sorted ascending).

    ``doc_ids`` is a term's posting doc array (segmented — sorted
    within a segment, not globally); ``flat_positions`` is the
    concatenation of per-doc position groups of lengths ``counts``.
    Docs absent from the posting list get an empty slice.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    order = np.argsort(doc_ids, kind="stable")
    sorted_ids = doc_ids[order]
    idx = np.searchsorted(sorted_ids, wanted)
    out: list[np.ndarray] = []
    empty = flat_positions[:0]
    for w, i in zip(wanted, idx):
        if i < len(sorted_ids) and sorted_ids[i] == w:
            row = order[i]
            out.append(flat_positions[starts[row]:starts[row + 1]])
        else:
            out.append(empty)
    return out


def _chain_exists(slots: list[np.ndarray], max_gap: int | None) -> bool:
    """True iff positions p1 < p2 < ... < pk exist, one from each slot
    in order (each gap <= ``max_gap`` when given).  Standard forward
    DP: the reachable set for slot i+1 is every q with some reachable
    p < q (within the gap bound)."""
    reach = np.sort(slots[0])
    if not reach.size:
        return False
    for pos in slots[1:]:
        pos = np.sort(pos)
        # largest reachable offset strictly below each candidate
        idx = np.searchsorted(reach, pos, side="left") - 1
        ok = idx >= 0
        if max_gap is not None:
            prev = reach[np.maximum(idx, 0)]
            ok &= (pos - prev) <= max_gap
        reach = pos[ok]
        if not reach.size:
            return False
    return True


def ordered_chain_docs(candidates: np.ndarray,
                       slot_positions: list[list[np.ndarray]],
                       max_gap: int | None = None) -> np.ndarray:
    """Filter ``candidates`` to docs whose per-slot position arrays
    (``slot_positions[slot][i]`` for candidate ``i``) admit a strictly
    increasing chain.  Identical stems in two slots share a position
    array; the strict ``<`` forces two distinct occurrences, so a
    repeated-word phrase ("data data") needs the word twice."""
    keep = np.fromiter(
        (_chain_exists([sp[i] for sp in slot_positions], max_gap)
         for i in range(len(candidates))),
        dtype=bool, count=len(candidates),
    )
    return candidates[keep]


def contains_consecutive(stream: list[str], phrase: list[str]) -> bool:
    """Exact phrase check over a token stream (the verify step)."""
    k = len(phrase)
    if k == 0 or k > len(stream):
        return False
    first = phrase[0]
    limit = len(stream) - k
    for j, tok in enumerate(stream):
        if j > limit:
            return False
        if tok == first and stream[j:j + k] == phrase:
            return True
    return False


def intersect_doc_ids(arrays: list[np.ndarray]) -> np.ndarray:
    """Sorted intersection of posting doc-id arrays (empty list -> empty)."""
    if not arrays:
        return np.empty(0, dtype=np.int64)
    out = np.unique(np.asarray(arrays[0], dtype=np.int64))
    for a in arrays[1:]:
        out = np.intersect1d(out, a, assume_unique=False)
        if not out.size:
            break
    return out


def boolean_doc_ids(
    must_groups: list[list[np.ndarray]],
    should_arrays: list[np.ndarray],
    must_not_arrays: list[np.ndarray],
) -> np.ndarray:
    """Sorted doc ids satisfying Lucene-style occurs clauses.

    ``must_groups``: one group per MUST clause; a clause that tokenized
    to several stems requires ALL of them (a missing stem's empty array
    empties the result).  With no MUST clauses, candidates are the
    union of the SHOULD arrays.  Docs holding ANY must-not stem drop.
    """
    if must_groups:
        flat: list[np.ndarray] = []
        for group in must_groups:
            if not group:
                return np.empty(0, dtype=np.int64)
            flat.extend(group)
        cands = intersect_doc_ids(flat)
    elif should_arrays:
        cands = np.unique(np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in should_arrays]))
    else:
        return np.empty(0, dtype=np.int64)
    for a in must_not_arrays:
        if cands.size and len(a):
            cands = cands[~np.isin(cands, a)]
    return cands


def sum_scores_for_docs(candidates: np.ndarray,
                        postings: list[tuple[np.ndarray, np.ndarray]],
                        ) -> np.ndarray:
    """Per-candidate sum of each term's index-time BM25 contribution
    (candidates sorted ascending; one (doc_ids, scores) pair per term).
    ``np.add.at`` keeps per-doc FP addition order = term order, the
    same order the sequential loop would produce."""
    totals = np.zeros(len(candidates))
    for ids, scores in postings:
        ids = np.asarray(ids, dtype=np.int64)
        mask = np.isin(ids, candidates)
        if mask.any():
            np.add.at(totals,
                      np.searchsorted(candidates, ids[mask]),
                      scores[mask])
    return totals


def contains_near(stream: list[str], first: str, second: str,
                  slop: int) -> bool:
    """Ordered span-near check (Lucene SpanNearQuery, inOrder=true):
    some occurrence of ``first`` is followed by ``second`` with at
    most ``slop`` intervening tokens.  ``slop=0`` degenerates to the
    exact two-token phrase.  Vectorized over the occurrence position
    lists — for each ``second`` position, one searchsorted probe finds
    whether a ``first`` sits within the window."""
    pa_ = [i for i, t in enumerate(stream) if t == first]
    if not pa_:
        return False
    pb = [i for i, t in enumerate(stream) if t == second]
    if not pb:
        return False
    a = np.asarray(pa_, dtype=np.int64)
    b = np.asarray(pb, dtype=np.int64)
    # window for b at position j: exists a in [j - slop - 1, j - 1]
    lo = np.searchsorted(a, b - slop - 1, side="left")
    hi = np.searchsorted(a, b - 1, side="right")
    return bool(np.any(hi > lo))
