"""Unit tests for the curation-extension kernels (PII scrub, stratified
sampling hash, window chunking, unigram-LM scoring) — the SQL-parity
gate runs in test_driver_queries; these pin the kernel semantics on
hand-built inputs, including cases the synthetic corpus never hits."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from modernsearchengines_ray.functions.pii import (
    EMAIL_TOKEN, IP_TOKEN, PHONE_TOKEN, redact_pii,
)


class TestRedactPii:
    def test_email(self):
        t, ne, ni, np_ = redact_pii("write to alice.smith+x@mail.example.org now")
        assert t == f"write to {EMAIL_TOKEN} now"
        assert (ne, ni, np_) == (1, 0, 0)

    def test_ipv4(self):
        t, ne, ni, np_ = redact_pii("server at 192.168.0.1 responded")
        assert t == f"server at {IP_TOKEN} responded"
        assert (ne, ni, np_) == (0, 1, 0)

    def test_phone(self):
        t, ne, ni, np_ = redact_pii("call +49 (0)30 123-4567 today")
        assert t == f"call {PHONE_TOKEN} today"
        assert (ne, ni, np_) == (0, 0, 1)

    def test_sequential_no_double_count(self):
        # the IP is redacted before the phone pass, so its digit run
        # must NOT also count as a phone
        t, ne, ni, np_ = redact_pii("a@b.co 10.0.0.1 555 123 4567")
        assert t == f"{EMAIL_TOKEN} {IP_TOKEN} {PHONE_TOKEN}"
        assert (ne, ni, np_) == (1, 1, 1)

    def test_email_swallows_its_domain_dots(self):
        # the mailbox pattern consumes the whole address: no residual
        # host fragment left for the IP pass
        t, _, ni, _ = redact_pii("x@1.2.3.com")
        assert t == EMAIL_TOKEN
        assert ni == 0

    def test_clean_text_unchanged(self):
        src = "no identifiers here, just words and the number 42"
        t, ne, ni, np_ = redact_pii(src)
        assert t == src
        assert (ne, ni, np_) == (0, 0, 0)


class TestStratifiedSampleHash:
    def test_keep_decision_matches_sql_formula(self):
        from modernsearchengines_ray.pipelines.driver_queries import (
            _SAMPLE_HASH_MULT,
        )

        ids = np.arange(0, 5000, dtype=np.uint64)
        h = (ids * np.uint64(_SAMPLE_HASH_MULT)) & np.uint64(0xFFFFFFFF)
        buckets = (h % np.uint64(1000)).astype(int)
        # pure-Python reference of the SQL expression
        for i in (0, 1, 17, 4999):
            assert buckets[i] == ((i * _SAMPLE_HASH_MULT) % (1 << 32)) % 1000
        # rate monotonicity: higher permille keeps a superset
        k300 = set(ids[buckets < 300].tolist())
        k700 = set(ids[buckets < 700].tolist())
        assert k300 <= k700
        # roughly uniform buckets (binomial 3-sigma)
        frac = len(k300) / 5000
        assert abs(frac - 0.3) < 3 * math.sqrt(0.3 * 0.7 / 5000)


class TestChunkWindows:
    @staticmethod
    def chunks(tokens, w, s):
        n = len(tokens)
        return [tokens[i * s : i * s + w]
                for i in range((n - 1) // s + 1 if n else 0)]

    def test_full_coverage_and_overlap(self):
        toks = [f"t{i}" for i in range(100)]
        out = self.chunks(toks, 64, 48)
        assert [len(c) for c in out] == [64, 52, 4]
        # stride-48 windows overlap by 16 and jointly cover every token
        assert out[0][48:] == out[1][:16]
        covered = set()
        for c in out:
            covered.update(c)
        assert covered == set(toks)

    def test_exact_multiple_no_empty_tail(self):
        out = self.chunks(list("abcdefgh"), 4, 4)
        assert [len(c) for c in out] == [4, 4]

    def test_empty_doc_no_chunks(self):
        assert self.chunks([], 64, 48) == []

    def test_md5_matches_duckdb_formulation(self):
        import duckdb

        piece = ["row", "scan", "agg"]
        want = duckdb.connect().execute(
            "SELECT md5(array_to_string(['row','scan','agg'], ' '))"
        ).fetchone()[0]
        assert hashlib.md5(" ".join(piece).encode()).hexdigest() == want


class TestLmScoreVocabTruncation:
    def test_top_v_truncation_scores_oov_at_floor(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.pipelines.driver_queries import q_lm_score

        # vocab_size smaller than the corpus vocabulary: the entry must
        # still run and every score must be <= the best in-vocab logprob
        df = q_lm_score("/root/testdata/sf0.001", vocab_size=5)
        out = df.to_pandas() if not isinstance(df, pd.DataFrame) else df
        assert len(out) > 0
        assert (out["lm_logprob"] < 0).all()

    def test_exact_mode_mean_of_unigram_logprobs(self, ray_session):
        # tiny closed-form check: corpus of two docs over {a, b}
        import pyarrow as pa
        import pyarrow.parquet as pq
        import tempfile, os

        from modernsearchengines_ray.pipelines.driver_queries import q_lm_score

        with tempfile.TemporaryDirectory() as d:
            tbl = pa.table({
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a a b", "b"], pa.string()),
            })
            pq.write_table(tbl, os.path.join(d, "documents.parquet"))
            out = q_lm_score(d).to_pandas().set_index("doc_id")
        # counts: a=2, b=2, total=4 -> lp(a)=lp(b)=ln(0.5)
        assert out.loc[1, "lm_logprob"] == pytest.approx(
            round(math.log(0.5), 6))
        assert out.loc[2, "lm_logprob"] == pytest.approx(
            round(math.log(0.5), 6))
