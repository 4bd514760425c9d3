"""doc_similarity prefix-filter tier: planted hot-term fan-out bound
and prefix/exact tier parity (VERDICT r4 #2).

The SQL-parity gate in test_driver_queries covers the default tier's
end-to-end correctness at sf0.01; these tests pin the SCALE claim the
gate cannot see — that a stopword-like term (huge df, tiny idf, tiny
unit weight) is pruned from every doc's rarest-first prefix, so its
O(df²) pair fan-out never materializes — and the exactness contract
(a genuinely qualifying pair is always mined from prefix rows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _unit_rows(doc_terms: dict[int, dict[str, float]]) -> pa.Table:
    """Build (doc_id, term, df, u) unit rows from raw weights."""
    df = {}
    for terms in doc_terms.values():
        for t in terms:
            df[t] = df.get(t, 0) + 1
    out_d, out_t, out_df, out_u = [], [], [], []
    for doc_id, terms in doc_terms.items():
        nrm = np.sqrt(sum(w * w for w in terms.values()))
        for t, w in sorted(terms.items()):
            out_d.append(doc_id)
            out_t.append(t)
            out_df.append(df[t])
            out_u.append(w / nrm)
    return pa.table({
        "doc_id": pa.array(out_d, pa.int64()),
        "term": pa.array(out_t, pa.string()),
        "df": pa.array(out_df, pa.int64()),
        "u": pa.array(out_u, pa.float64()),
    })


class TestPrefixKernel:
    def test_hot_term_pruned_from_every_prefix(self):
        """200 docs all share one stopword but are otherwise
        disjoint: the exact plan would mine C(200,2)=19,900 pairs
        from the stopword alone; the prefix tier mines ZERO."""
        from modernsearchengines_ray.pipelines.driver_queries import (
            _docsim_mine_pairs, _docsim_prefix_rows)

        n = 200
        docs = {}
        for i in range(n):
            # three doc-unique rare terms carry the mass; the shared
            # stopword has a tiny weight (tiny idf at df=n)
            docs[i] = {f"rare{i}_{j}": 1.0 for j in range(3)}
            docs[i]["stopword"] = 0.05
        rows = _unit_rows(docs)

        kept = _docsim_prefix_rows(rows)
        kept_terms = set(kept["term"].to_pylist())
        assert "stopword" not in kept_terms
        # every doc still mines from its rare head
        assert len(set(kept["doc_id"].to_pylist())) == n

        mined = _docsim_mine_pairs(kept)
        assert mined.num_rows == 0  # no shared prefix terms

        exact = _docsim_mine_pairs(rows)
        assert exact.num_rows == n * (n - 1) // 2  # the avoided blowup

    def test_qualifying_pair_always_mined(self):
        """Exactness: a pair with cosine >= tau shares its first
        (df, term)-ordered common term in BOTH prefixes."""
        from modernsearchengines_ray.pipelines.driver_queries import (
            _docsim_mine_pairs, _docsim_prefix_rows)

        docs = {
            1: {"alpha": 1.0, "beta": 1.0, "only1": 0.3},
            2: {"alpha": 1.0, "beta": 1.0, "only2": 0.3},
            3: {"zeta": 1.0},
        }
        rows = _unit_rows(docs)
        u = {(d, t): v for d, t, v in zip(rows["doc_id"].to_pylist(),
                                          rows["term"].to_pylist(),
                                          rows["u"].to_pylist())}
        cos = sum(u[(1, t)] * u[(2, t)] for t in ("alpha", "beta"))
        assert cos >= 0.80  # the planted qualifying pair

        mined = _docsim_mine_pairs(_docsim_prefix_rows(rows))
        pairs = set(zip(mined["id_a"].to_pylist(),
                        mined["id_b"].to_pylist()))
        assert (1, 2) in pairs

    def test_prefix_is_a_head_in_global_order(self):
        """Kept rows per doc form a contiguous head of the
        (df asc, term asc) order — the property the completeness
        proof needs."""
        from modernsearchengines_ray.pipelines.driver_queries import (
            _docsim_prefix_rows)

        rng = np.random.RandomState(7)
        docs = {}
        for i in range(40):
            k = rng.randint(2, 12)
            docs[i] = {f"t{rng.randint(0, 30)}": float(w)
                       for w in rng.uniform(0.1, 2.0, size=k)}
        rows = _unit_rows(docs)
        kept = _docsim_prefix_rows(rows)
        kept_set = set(zip(kept["doc_id"].to_pylist(),
                           kept["term"].to_pylist()))

        df_map = {t: d for t, d in zip(rows["term"].to_pylist(),
                                       rows["df"].to_pylist())}
        for doc_id in docs:
            terms = sorted(docs[doc_id], key=lambda t: (df_map[t], t))
            flags = [(doc_id, t) in kept_set for t in terms]
            # once a row is dropped, every later row is dropped too
            assert flags == sorted(flags, reverse=True)


class TestTierParity:
    def test_planted_corpus_prefix_equals_exact(self, ray_session,
                                                tmp_path):
        """End-to-end: planted near-dup docs (shared rare vocabulary)
        plus a corpus-wide stopword; both tiers byte-identical."""
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_doc_similarity)

        rng = np.random.RandomState(11)
        words = [f"w{i}" for i in range(50)]
        ids, texts = [], []
        for i in range(60):
            doc_id = i * 5  # survive the doc_id % 5 sample
            body = " ".join(rng.choice(words, size=12))
            ids.append(doc_id)
            texts.append("the " + body)  # "the" in every doc
        # planted near-dup pair sharing rare vocabulary
        ids += [1000, 1005]
        texts += ["the quixotic zanzibar xylophone quorum",
                  "the quixotic zanzibar xylophone quorum extra"]
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), tmp_path / "documents.parquet")

        sf = str(tmp_path)
        got = q_doc_similarity(sf).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        want = q_doc_similarity(sf, pair_mining="exact").to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert got.equals(want)
        assert ((got["id_a"] == 1000) & (got["id_b"] == 1005)).any()
