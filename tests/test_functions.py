"""Unit tests for the pure kernels: stemmer, normalizer, tokenizer,
extractor, codecs, proximity.  These pin the per-value semantics the
distributed stages rely on."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modernsearchengines_ray.functions.html_extract import extract_page, extract_text
from modernsearchengines_ray.functions.porter import porter_stem
from modernsearchengines_ray.functions.proximity import calculate_proximity_score
from modernsearchengines_ray.functions.simhash import hamming_distance, simhash64
from modernsearchengines_ray.functions.textnorm import (
    convert_umlaute,
    normalize_chunk,
    substitute_dots_in_urls,
    url_to_comma_separated_words,
)
from modernsearchengines_ray.functions.tokenizer import tokenize
from modernsearchengines_ray.functions.varint import (
    decode_position_lists,
    decode_varint_deltas,
    encode_position_lists,
    encode_varint_deltas,
)


class TestPorter:
    @pytest.mark.parametrize(
        "word,expected",
        [
            ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
            ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
            ("motoring", "motor"), ("hopping", "hop"), ("filing", "file"),
            ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
            ("conditional", "condit"), ("rational", "ration"),
            ("digitizer", "digit"), ("operator", "oper"),
            ("triplicate", "triplic"), ("hopeful", "hope"),
            ("goodness", "good"), ("electrical", "electr"),
            ("adjustable", "adjust"), ("replacement", "replac"),
            ("adoption", "adopt"), ("activate", "activ"),
            ("effective", "effect"), ("rate", "rate"), ("roll", "roll"),
            ("controll", "control"), ("a", "a"), ("be", "be"),
        ],
    )
    def test_canonical_pairs(self, word, expected):
        assert porter_stem(word) == expected


class TestTextNorm:
    def test_umlaute(self):
        assert convert_umlaute("tübingen straße schön ähnlich") == \
            "tuebingen strasse schoen aehnlich"

    def test_url_words(self):
        assert url_to_comma_separated_words(
            "https://www.uni-tuebingen.de/studium/index.html"
        ) == "uni, tuebingen, de, studium, index, html"

    def test_url_words_no_www(self):
        assert url_to_comma_separated_words("http://example.com/a-b") == \
            "example, com, a, b"

    def test_dots_in_urls(self):
        assert substitute_dots_in_urls("see www.foo.de/bar.html now") == \
            "see www foo de/bar html now"

    def test_chain_order(self):
        # numbers: paren strip, comma join, ordinal strip
        assert normalize_chunk("1,000 3) 2nd") == "1000 3 2"
        # separators to space, dotted words split, whitespace collapse
        assert normalize_chunk("open-air  a.b\tx\ny") == "open air a b x y"
        assert normalize_chunk("Fish & Chips") == "fish & chips"


class TestTokenizer:
    def test_basic(self):
        toks = tokenize("the castle gardens")
        assert [t for t, _ in toks] == ["castl", "garden"]

    def test_positions_in_normalized_chunk(self):
        toks = tokenize("castle river")
        assert toks == [("castl", 0), ("river", 7)]

    def test_stopwords_dropped(self):
        assert tokenize("the a is was") == []

    def test_unique_mode_keeps_first(self):
        toks = tokenize("castle river castle", only_unique_tokens=True)
        assert toks == [("castl", 0), ("river", 7)]

    def test_umlaut_path(self):
        toks = tokenize("Tübingen")
        assert toks == [("tuebingen", 0)]

    def test_chunk_positions_restart(self):
        # two chunks of 10 chars; positions restart per chunk
        text = "aaa bbb cc" + "ddd eee ff"
        toks = tokenize(text, chunk_chars=10)
        stems = [t for t, _ in toks]
        positions = [p for _, p in toks]
        assert stems == ["aaa", "bbb", "cc", "ddd", "eee", "ff"]
        assert positions == [0, 4, 8, 0, 4, 8]

    def test_empty_and_punct(self):
        assert tokenize("...!!!") == []
        assert tokenize("") == []


class TestExtractor:
    def test_simple(self):
        html = "<html><body><p>Hello world</p></body></html>"
        assert extract_text(html) == "Hello world"

    def test_strip_and_join(self):
        html = "<div>  a  </div><div>\n b \n</div>"
        assert extract_text(html) == "a b"

    def test_internal_newline_replaced(self):
        html = "<p>line one\nline two</p>"
        assert extract_text(html) == "line one line two"

    def test_entities_converted(self):
        html = "<p>Fish &amp; Chips &lt;daily&gt;</p>"
        assert extract_text(html) == "Fish & Chips <daily>"

    def test_script_style_included_comment_excluded(self):
        html = ("<html><head><style>.x{}</style></head>"
                "<body><script>var i=0;</script><!-- nav --><p>t</p></body></html>")
        assert extract_text(html) == ".x{} var i=0; t"

    def test_tags_split_runs(self):
        html = "<p>a<b>b</b>c</p>"
        assert extract_text(html) == "a b c"

    def test_lang_default_en(self):
        _, lang, _ = extract_page("<html><body>x</body></html>")
        assert lang == "en"

    def test_lang_attr(self):
        _, lang, _ = extract_page('<html lang="de"><body>x</body></html>')
        assert lang == "de"

    def test_title_and_fallback(self):
        _, _, site = extract_page(
            "<html><head><title>My Site</title></head><body>x</body></html>",
            "https://www.foo.com/a",
        )
        assert site == "My Site"
        _, _, site = extract_page(
            "<html><body>x</body></html>", "https://www.foo.com/a"
        )
        assert site == "foo.com"

    def test_bytes_input(self):
        assert extract_text("<p>héllo</p>".encode()) == "héllo"


class TestVarint:
    def test_round_trip_deltas(self):
        vals = np.array([3, 7, 7, 120, 10_000, 10_000_000], dtype=np.int64)
        buf = encode_varint_deltas(vals, delta=True)
        out = decode_varint_deltas(buf, len(vals), delta=True)
        np.testing.assert_array_equal(out, vals)

    def test_round_trip_raw(self):
        vals = [0, 1, 127, 128, 300, 2**40]
        buf = encode_varint_deltas(vals, delta=False)
        out = decode_varint_deltas(buf, len(vals), delta=False)
        assert list(out) == vals

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=60))
    def test_round_trip_property(self, values):
        values = sorted(values)
        buf = encode_varint_deltas(values, delta=True)
        out = decode_varint_deltas(buf, len(values), delta=True)
        assert list(out) == values

    def test_position_lists(self):
        lists = [[1, 5, 9], [], [100], [2, 2, 7]]
        buf = encode_position_lists(lists)
        out = decode_position_lists(buf, len(lists))
        assert [list(a) for a in out] == lists


class TestProximity:
    def test_single_list_zero(self):
        assert calculate_proximity_score([[1, 2, 3]]) == 0.0
        assert calculate_proximity_score([]) == 0.0

    def test_adjacent_terms(self):
        # two lists, overlapping positions 10 and 12 -> span 3, /2 -> 1.5 -> 1/1.5
        score = calculate_proximity_score([[10], [12]])
        assert score == pytest.approx(1 / 1.5)

    def test_reference_early_break(self):
        # the sweep stops when any list exhausts (reference semantics):
        # lists [[0, 100], [1]]: heap pops 0 (advance to 100, max=100),
        # pops 1 -> span min(101, 100-1+1)=100... then list 1 exhausted -> break.
        # min_span = min(1-0+1, 100-1+1) = 2 -> normalized 1.0 -> score 1.0
        score = calculate_proximity_score([[0, 100], [1]])
        assert score == pytest.approx(1.0)


class TestSimhash:
    def test_deterministic_and_equal_for_equal_text(self):
        a = simhash64("the quick brown fox jumps over the lazy dog")
        b = simhash64("the quick brown fox jumps over the lazy dog")
        assert a == b and a != 0

    def test_similar_texts_close(self):
        a = simhash64("the quick brown fox jumps over the lazy dog " * 10)
        b = simhash64("the quick brown fox jumped over the lazy dog " * 10)
        c = simhash64("completely unrelated content about databases and ray")
        assert hamming_distance(a, b) < hamming_distance(a, c)


class TestProximityFastPath:
    def test_matches_heap_sweep(self):
        import random

        import numpy as np

        from modernsearchengines_ray.functions.proximity import (
            _heap_sweep,
            calculate_proximity_score,
        )

        rng = random.Random(99)
        for _ in range(500):
            k = rng.randint(2, 5)
            lists = []
            for _ in range(k):
                n = rng.choice([0, 1, 1, 1, 2, 3])
                lists.append(np.array(sorted(rng.sample(range(500), n)),
                                      dtype=np.int64))
            fast = calculate_proximity_score(lists)
            if any(len(p) for p in lists):
                assert fast == _heap_sweep(lists), [p.tolist() for p in lists]
        # empty/singleton contract
        assert calculate_proximity_score([]) == 0.0
        assert calculate_proximity_score([np.array([3])]) == 0.0


class TestHyperLogLog:
    def test_estimate_accuracy_and_merge(self):
        from modernsearchengines_ray.functions.hll import HyperLogLog

        full = HyperLogLog()
        a, b = HyperLogLog(), HyperLogLog()
        n = 50_000
        for i in range(n):
            full.add(i)
            (a if i % 2 else b).add(i)
        # p=14 => ~0.81% stderr; allow 4 sigma
        assert abs(full.estimate() - n) / n < 0.033
        merged = a.merge(b)
        assert abs(merged.estimate() - full.estimate()) < 1e-9

    def test_duplicates_dont_inflate(self):
        from modernsearchengines_ray.functions.hll import HyperLogLog

        s = HyperLogLog()
        for _ in range(10):
            s.add_many(range(1000))
        assert abs(s.estimate() - 1000) / 1000 < 0.05

    def test_small_range_linear_counting(self):
        from modernsearchengines_ray.functions.hll import HyperLogLog

        s = HyperLogLog()
        s.add_many(range(10))
        assert round(s.estimate()) == 10
