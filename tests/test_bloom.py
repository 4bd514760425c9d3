"""Bloom filter properties: no false negatives, bounded false
positives, determinism, OR-merge."""

from __future__ import annotations

import numpy as np
import pytest

from modernsearchengines_ray.functions.bloom import BloomFilter


class TestBloomFilter:
    def test_no_false_negatives_ever(self):
        bf = BloomFilter(num_bits=256, num_hashes=3)  # tiny: saturated
        items = [f"item-{i}" for i in range(500)]
        bf.add_many(items)
        assert all(it in bf for it in items)

    def test_false_positive_rate_near_target(self):
        n, fpr = 5_000, 0.01
        bf = BloomFilter.for_capacity(n, fpr)
        bf.add_many(f"in-{i}" for i in range(n))
        hits = sum(1 for i in range(20_000) if f"out-{i}" in bf)
        assert hits / 20_000 < 5 * fpr  # generous margin

    def test_empty_contains_nothing(self):
        bf = BloomFilter()
        assert "anything" not in bf
        assert bf.fill_ratio == 0.0

    def test_merge_is_union(self):
        a = BloomFilter(num_bits=4096, num_hashes=5)
        b = BloomFilter(num_bits=4096, num_hashes=5)
        a.add("only-a")
        b.add("only-b")
        a.merge(b)
        assert "only-a" in a and "only-b" in a

    def test_deterministic_across_instances(self):
        a, b = BloomFilter(), BloomFilter()
        for v in ("x", "y", b"bytes", 123):
            a.add(v)
            b.add(v)
        assert np.array_equal(a.bits, b.bits)

    def test_round_trip(self):
        a = BloomFilter(num_bits=1024, num_hashes=4)
        a.add("q")
        b = BloomFilter.from_bits(a.bits, 1024, 4)
        assert "q" in b and "r" not in b

    def test_bad_params_raise(self):
        with pytest.raises(ValueError):
            BloomFilter(num_bits=0)
