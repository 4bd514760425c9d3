"""Distributed BPE-merge tokenizer training (VERDICT r4 #6).

The reference engine has no subword tokenizer (its tokenizer is
stop→lemma→stem over words, /root/reference/indexing.py:130-159); this
is one of the LLM-training-data operators the build adds as
first-class.  The algorithm is the published byte-pair-encoding merge
procedure (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units"): start from words split into
characters with an end-of-word marker, repeatedly count adjacent
symbol pairs (occurrence-weighted by word frequency) and merge the
most frequent pair, recording the merge order.

Distributed shape — what scales and what is bounded:

1. **Word counting is the 100-TB step** and is fully distributed:
   per-block ``Counter`` partials inside ``map_batches`` (map-side
   combine), then ONE ``groupby(word).sum`` exchange.  Corpus size
   never matters again after this pass.
2. **The merge loop runs over the DISTINCT-WORD table**, which is
   bounded (vocabulary-sized, not corpus-sized) and further pruned by
   ``min_count`` — the same reduction every published BPE trainer
   (subword-nmt, SentencePiece, HF tokenizers) relies on.  Two tiers
   share one pair-count/rewrite kernel:

   - ``reduce="driver"`` (default): the pruned word-count table is
     pulled once (an O(distinct words) aggregate — the repo's
     bounded-``take_all`` contract) and the R rounds run locally.
   - ``reduce="partitioned"``: the word table stays a Dataset; each
     round maps per-block pair-count partials, folds the SMALL
     (distinct-pairs-sized) partials on the driver for the global
     argmax, and rewrites blocks with the chosen merge.  Zero
     whole-table driver materialization; R bounded rounds.

   Tie-break is total and deterministic everywhere: max count, then
   lexicographically smallest ``(left, right)`` — so both tiers and
   any block layout produce byte-identical merge lists (pinned by
   tests/test_bpe.py).
3. **Encoding** applies learned merges greedily by rank (the standard
   inference rule); the merge table is tiny (R rows) and ships by
   closure — at R in the tens of thousands, move it to ``ray.put``
   and resolve inside the actor.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

#: end-of-word marker (subword-nmt's convention)
EOW = "</w>"


# ---------------------------------------------------------------------------
# shared kernels (both tiers, and the tests' sequential reference)
# ---------------------------------------------------------------------------

def word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence for a word: characters + EOW marker."""
    return tuple(word[:-1]) + (word[-1] + EOW,)


def pair_counts(words: list[tuple[str, ...]],
                counts: list[int]) -> Counter:
    """Occurrence-weighted adjacent-pair counts over a word slice."""
    out: Counter = Counter()
    for syms, c in zip(words, counts):
        for i in range(len(syms) - 1):
            out[(syms[i], syms[i + 1])] += c
    return out


def best_pair(pc: Counter) -> tuple[tuple[str, str], int] | None:
    """Deterministic argmax: max count, tie -> lexicographically
    smallest (left, right).  None when no pair repeats (count < 2 —
    merging a unique pair gains nothing and subword-nmt stops too)."""
    best = None
    for pair, c in pc.items():
        if c < 2:
            continue
        key = (-c, pair)
        if best is None or key < best[0]:
            best = (key, pair, c)
    if best is None:
        return None
    return best[1], best[2]


def apply_merge(syms: tuple[str, ...],
                pair: tuple[str, str]) -> tuple[str, ...]:
    """Rewrite one symbol sequence with ``pair`` merged (left-to-right,
    non-overlapping — the published rewrite rule)."""
    left, right = pair
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word: str,
                ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order encoding (standard BPE inference): repeatedly
    merge the adjacent pair with the LOWEST merge rank until none of
    the present pairs was learned."""
    syms = list(word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# ---------------------------------------------------------------------------
# distributed word counting (the corpus-sized pass)
# ---------------------------------------------------------------------------

def word_count_table(ds, text_col: str = "text",
                     min_count: int = 1):
    """(word, cnt) Dataset via map-side combine + one groupby exchange.
    ``min_count`` prunes the long hapax tail BEFORE the merge loop —
    the standard trainer knob that bounds the word table at web
    scale (a pruned word can never change a pair argmax by more than
    its count, and every published trainer prunes identically)."""
    from ray.data.aggregate import Sum

    from ..functions.simple_tokens import simple_tokens

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_col].to_pylist():
            c.update(simple_tokens(text))
        if not c:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        words, cnts = zip(*sorted(c.items()))
        return pa.table({"word": pa.array(words, pa.string()),
                         "cnt": pa.array(cnts, pa.int64())})

    wc = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))
    if min_count > 1:
        def prune(batch: pa.Table) -> pa.Table:
            keep = batch["cnt"].to_numpy(zero_copy_only=False) \
                >= min_count
            return batch.filter(pa.array(keep))
        wc = wc.map_batches(prune, batch_format="pyarrow")
    return wc


# ---------------------------------------------------------------------------
# the merge loop (two tiers, one kernel)
# ---------------------------------------------------------------------------

def train_bpe(ds, text_col: str = "text", num_merges: int = 32,
              min_count: int = 1, reduce: str = "driver",
              num_partitions: int | None = None) -> list[dict]:
    """Learn ``num_merges`` BPE merges over ``ds[text_col]``.

    Returns the merge list ``[{rank, left, right, pair_count}, ...]``
    (possibly shorter than ``num_merges`` when no pair repeats).
    Both tiers produce byte-identical lists — see module docstring
    for the partitioning story."""
    if reduce not in ("driver", "partitioned"):
        raise ValueError(f"unknown reduce tier: {reduce!r}")
    wc = word_count_table(ds, text_col, min_count=min_count)

    if reduce == "driver":
        tab = wc.to_pandas()  # bounded: distinct words post-prune
        words = [word_symbols(w) for w in tab["word"]]
        counts = [int(c) for c in tab["cnt"]]
        merges: list[dict] = []
        for rank in range(num_merges):
            pick = best_pair(pair_counts(words, counts))
            if pick is None:
                break
            pair, c = pick
            merges.append({"rank": rank, "left": pair[0],
                           "right": pair[1], "pair_count": int(c)})
            words = [apply_merge(s, pair) for s in words]
        return merges

    # partitioned tier: the word table never leaves the cluster;
    # only distinct-pair partials (bounded by the round's live pair
    # vocabulary) fold on the driver for the global argmax
    from .dedup import default_join_partitions

    nparts = num_partitions or default_join_partitions()

    def to_syms(batch: pa.Table) -> pa.Table:
        return pa.table({
            "syms": pa.array([list(word_symbols(w))
                              for w in batch["word"].to_pylist()],
                             pa.list_(pa.string())),
            "cnt": batch["cnt"],
        })

    word_ds = wc.map_batches(to_syms, batch_format="pyarrow") \
        .repartition(nparts).materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        pc = pair_counts(
            [tuple(s) for s in batch["syms"].to_pylist()],
            batch["cnt"].to_pylist())
        if not pc:
            return pa.table({"left": pa.array([], pa.string()),
                             "right": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        items = sorted(pc.items())
        return pa.table({
            "left": pa.array([p[0] for p, _ in items], pa.string()),
            "right": pa.array([p[1] for p, _ in items], pa.string()),
            "c": pa.array([c for _, c in items], pa.int64()),
        })

    merges = []
    for rank in range(num_merges):
        folded: Counter = Counter()
        for b in word_ds.map_batches(
                pair_partial, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for l, r, c in zip(b["left"].to_pylist(),
                               b["right"].to_pylist(),
                               b["c"].to_pylist()):
                folded[(l, r)] += c
        pick = best_pair(folded)
        if pick is None:
            break
        pair, c = pick
        merges.append({"rank": rank, "left": pair[0],
                       "right": pair[1], "pair_count": int(c)})

        def rewrite(batch: pa.Table, pair=pair) -> pa.Table:
            return pa.table({
                "syms": pa.array(
                    [list(apply_merge(tuple(s), pair))
                     for s in batch["syms"].to_pylist()],
                    pa.list_(pa.string())),
                "cnt": batch["cnt"],
            })

        word_ds = word_ds.map_batches(
            rewrite, batch_format="pyarrow").materialize()
    return merges


def encode_dataset(ds, merges: list[dict], text_col: str = "text",
                   id_col: str = "doc_id"):
    """Encode every doc with the learned merges; returns
    ``(id, n_words, n_tokens, token_chars)`` rows where
    ``token_chars`` is the
    EOW-stripped character mass of the encoding — BPE conserves it
    exactly (merges concatenate, never create or drop characters), so
    SQL can recompute it from the raw text and gate the encoder."""
    from ..functions.simple_tokens import simple_tokens

    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}

    def enc(batch: pa.Table) -> pa.Table:
        ids, n_wrd, n_tok, n_chr = [], [], [], []
        for i, text in zip(batch[id_col].to_pylist(),
                           batch[text_col].to_pylist()):
            words = simple_tokens(text)
            toks: list[str] = []
            for w in words:
                toks.extend(encode_word(w, ranks))
            ids.append(i)
            n_wrd.append(len(words))
            n_tok.append(len(toks))
            n_chr.append(sum(len(t.removesuffix(EOW)) for t in toks))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_words": pa.array(n_wrd, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "token_chars": pa.array(n_chr, pa.int64()),
        })

    return ds.map_batches(enc, batch_format="pyarrow")
