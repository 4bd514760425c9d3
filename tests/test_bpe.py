"""BPE trainer (stages/bpe.py): published-example conformance,
tier parity, block-layout invariance, determinism, early stop, and
the greedy-encode == training-segmentation property.  The SQL gate in
test_driver_queries covers the first-merge argmax and char-mass
conservation at sf0.01; these pin the merge PROCEDURE itself."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest

from modernsearchengines_ray.stages.bpe import (
    EOW,
    apply_merge,
    best_pair,
    encode_word,
    pair_counts,
    word_symbols,
)


def _reference_bpe(word_freq: dict[str, int],
                   num_merges: int) -> list[tuple[str, str]]:
    """Independent sequential reference (the Sennrich et al. 2016
    pseudocode, re-derived here rather than shared with the module)."""
    vocab = {word_symbols(w): c for w, c in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        eligible = [(p, c) for p, c in pc.items() if c >= 2]
        if not eligible:
            break
        best = min(eligible, key=lambda x: (-x[1], x[0]))[0]
        merges.append(best)
        vocab = {apply_merge(s, best): c for s, c in vocab.items()}
    return merges


class TestKernels:
    def test_sennrich_worked_example(self):
        """The paper's example vocabulary: first merges must pick the
        most frequent pair with the deterministic tie-break."""
        freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        words = [word_symbols(w) for w in freq]
        counts = list(freq.values())
        pc = pair_counts(words, counts)
        # 'es' occurs in newest(6) + widest(3) = 9 — the paper's pick
        assert pc[("e", "s")] == 9
        pair, c = best_pair(pc)
        assert pair == ("e", "s") and c == 9
        # second merge: ('es','t</w>') at 9
        words = [apply_merge(s, pair) for s in words]
        pair2, c2 = best_pair(pair_counts(words, counts))
        assert pair2 == ("es", "t" + EOW) and c2 == 9

    def test_tie_break_lexicographic(self):
        pc = Counter({("b", "a"): 3, ("a", "b"): 3, ("z", "z"): 2})
        pair, _c = best_pair(pc)
        assert pair == ("a", "b")

    def test_no_repeated_pair_stops(self):
        assert best_pair(Counter({("a", "b"): 1})) is None

    def test_apply_merge_non_overlapping(self):
        # 'aaa' with merge (a,a): left-to-right -> ('aa', 'a</w>')
        syms = word_symbols("aaa")
        assert apply_merge(syms, ("a", "a")) == ("aa", "a" + EOW)

    def test_encode_word_matches_training_segmentation(self):
        freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
                "lowest": 4}
        merges = _reference_bpe(freq, 8)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in freq:
            syms = word_symbols(w)
            for p in merges:
                syms = apply_merge(syms, p)
            assert tuple(encode_word(w, ranks)) == syms, w


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data as rd

    texts = [
        "low low low low low lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest lowest lowest lowest lowest",
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ] * 3
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


class TestTrainBpe:
    def test_matches_reference_and_deterministic(self, corpus_ds):
        from modernsearchengines_ray.functions.simple_tokens import (
            simple_tokens,
        )
        from modernsearchengines_ray.stages.bpe import train_bpe

        freq: Counter = Counter()
        for row in corpus_ds.take_all():
            freq.update(simple_tokens(row["text"]))
        want = _reference_bpe(dict(freq), 10)

        got1 = train_bpe(corpus_ds, num_merges=10)
        got2 = train_bpe(corpus_ds, num_merges=10)
        assert got1 == got2  # determinism
        assert [(m["left"], m["right"]) for m in got1] == want

    def test_tier_parity_and_block_invariance(self, corpus_ds):
        from modernsearchengines_ray.stages.bpe import train_bpe

        driver = train_bpe(corpus_ds, num_merges=6)
        p2 = train_bpe(corpus_ds, num_merges=6, reduce="partitioned",
                       num_partitions=2)
        p5 = train_bpe(corpus_ds, num_merges=6, reduce="partitioned",
                       num_partitions=5)
        assert driver == p2 == p5

    def test_early_stop_when_no_pair_repeats(self, ray_session):
        import ray.data as rd
        from modernsearchengines_ray.stages.bpe import train_bpe

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["ab cd ef"], pa.string()),
        }))
        assert train_bpe(ds, num_merges=5) == []

    def test_min_count_prunes_hapaxes(self, corpus_ds):
        from modernsearchengines_ray.stages.bpe import word_count_table

        wc = word_count_table(corpus_ds, min_count=4).to_pandas()
        assert (wc["cnt"] >= 4).all()
        assert "low" in set(wc["word"])

    def test_encode_dataset_sandwich(self, corpus_ds):
        from modernsearchengines_ray.stages.bpe import (
            encode_dataset, train_bpe,
        )

        merges = train_bpe(corpus_ds, num_merges=6)
        enc = encode_dataset(corpus_ds, merges).to_pandas()
        assert (enc["n_words"] <= enc["n_tokens"]).all()
        assert (enc["n_tokens"] <= enc["token_chars"]).all()
        # merges actually compress: fewer tokens than chars overall
        assert enc["n_tokens"].sum() < enc["token_chars"].sum()
