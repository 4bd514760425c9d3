"""Distributed conformance tests: the Ray pipelines vs the sequential
oracle on the deterministic pages fixture.

These are the SURVEY.md §5 conformance gates:
- extractor byte-identity per url,
- index conformance: (term, doc_id, bm25, positions) sets exact,
  including the df<=5 prune and the chars/tokens length-norm quirk,
- rank identity: doc-id order + scores vs the oracle on the fixture
  query set,
- dedup determinism (exact simhash groups, keep-min-url),
- kill-and-resume: rebuilding after losing shards touches only the
  missing partitions and reproduces the identical index.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from fixtures import QUERIES


# the shared `prepared` fixture (corpus prep + index build + oracle
# index) lives in conftest.py — session-scoped, reused by
# test_ancillary.py too


class TestExtract:
    def test_byte_identity_per_url(self, ray_session, pages_parquet, pages_table):
        import ray.data as rd

        from modernsearchengines_ray.stages.extract import extract_pages

        ds = rd.read_parquet(pages_parquet, columns=["url", "html"])
        got = extract_pages(ds).to_pandas().set_index("url")["text"]
        want = pages_table.to_pandas().set_index("url")["text"]
        # url-extension filter may drop .png rows from got
        for url in got.index:
            assert got[url] == want[url], f"extract mismatch for {url}"
        assert len(got) > 0

    def test_extension_filter(self, ray_session, pages_parquet):
        import ray.data as rd

        from modernsearchengines_ray.stages.extract import extract_pages

        got = extract_pages(rd.read_parquet(pages_parquet)).to_pandas()
        assert not got["url"].str.endswith((".png", ".jpg", ".pdf")).any()


class TestCorpusPrep:
    def test_english_only(self, prepared):
        corpus_df = prepared[0]
        assert corpus_df["lang"].str.startswith("en").all()

    def test_dedup_exact_simhash_keeps_min_url(self, prepared):
        from modernsearchengines_ray.functions.simhash import simhash64

        corpus_df = prepared[0]
        hashes = corpus_df["text"].map(simhash64)
        assert hashes.is_unique
        # doc ids are the dense rank of sorted urls
        sorted_urls = sorted(corpus_df["url"])
        expect = {u: i for i, u in enumerate(sorted_urls)}
        assert all(expect[r.url] == r.doc_id for r in corpus_df.itertuples())


class TestIndexConformance:
    def test_postings_exact(self, prepared):
        from modernsearchengines_ray.state.shards import load_index_postings

        _, index_dir, _, oracle_index = prepared
        engine = load_index_postings(index_dir)
        assert set(engine.keys()) == set(oracle_index.index.keys())
        for term, docs in oracle_index.index.items():
            got_docs = engine[term]
            assert set(got_docs.keys()) == set(docs.keys()), term
            for doc_id, (bm25, positions) in docs.items():
                got_bm25, got_positions = got_docs[doc_id]
                assert got_bm25 == pytest.approx(bm25, abs=1e-12), (term, doc_id)
                assert got_positions == positions, (term, doc_id)

    def test_meta_stats(self, prepared):
        from modernsearchengines_ray.pipelines.build_index import read_meta

        corpus_df, index_dir, _, oracle_index = prepared
        meta = read_meta(index_dir)
        assert meta["num_documents"] == oracle_index.num_documents == len(corpus_df)
        assert meta["avg_doc_len"] == pytest.approx(oracle_index.avg_doc_len)

    def test_df_prune_applied(self, prepared):
        from modernsearchengines_ray.state.shards import load_index_postings

        _, index_dir, _, _ = prepared
        engine = load_index_postings(index_dir)
        assert all(len(docs) > 5 for docs in engine.values())


class TestRankIdentity:
    def test_reference_query_set(self, prepared):
        from modernsearchengines_ray.oracle import oracle_search
        from modernsearchengines_ray.pipelines.query import QueryEngine

        _, index_dir, _, oracle_index = prepared
        engine = QueryEngine(index_dir, num_scorers=2)
        try:
            for qid, query in QUERIES:
                got = engine.search(query)
                want = oracle_search(oracle_index, query)
                assert [d for d, _ in got] == [d for d, _ in want], f"q{qid} ids"
                np.testing.assert_allclose(
                    [s for _, s in got], [s for _, s in want],
                    atol=1e-12, err_msg=f"q{qid} scores",
                )
        finally:
            engine.shutdown()


class TestResume:
    def test_kill_and_resume_rebuilds_only_missing(
        self, ray_session, prepared, tmp_path_factory
    ):
        import ray.data as rd

        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.state.shards import load_index_postings

        corpus_df, index_dir, first, _ = prepared
        clone_dir = str(tmp_path_factory.mktemp("resume") / "idx")
        shutil.copytree(index_dir, clone_dir)
        before = load_index_postings(clone_dir)

        # simulate a mid-build failure: lose 3 shard partitions
        for shard_id in (0, 5, 11):
            os.remove(os.path.join(clone_dir, f"shard={shard_id}.parquet"))
            os.remove(os.path.join(clone_dir, "_manifest", f"shard_{shard_id}.json"))

        second = build_index(
            rd.from_pandas(corpus_df[["doc_id", "url", "text"]]),
            clone_dir,
            corpus_id="test",
        )
        assert second.shards_skipped == first.shards_built - 3
        assert second.shards_built == 3
        after = load_index_postings(clone_dir)
        assert set(after.keys()) == set(before.keys())
        for term in before:
            assert after[term] == before[term], term

    def test_fingerprint_mismatch_rebuilds_all(self, prepared):
        from modernsearchengines_ray.state.manifest import completed_shards

        _, index_dir, first, _ = prepared
        assert completed_shards(index_dir, first.fingerprint) != set()
        assert completed_shards(index_dir, "other-input") == set()


class TestMinhashDedup:
    def test_near_dups_collapse(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_minhash

        base = (
            "the castle above the river hosts a chocolate festival every "
            "december with stalls along the old town bridge and market"
        )
        near = base.replace("december", "january")
        other = "completely different content about ray data pipelines and arrow batches"
        df = pd.DataFrame(
            {"doc_id": [1, 2, 3, 4], "text": [base, near, other, base + " extra"]}
        )
        kept = dedup_minhash(rd.from_pandas(df), concurrency=2).to_pandas()
        assert 3 in set(kept["doc_id"])          # unique doc survives
        assert len(kept) < 4                      # near-dups collapsed
        assert min(set(kept["doc_id"]) & {1, 2, 4}) == 1  # keep-min rule


class TestSimhashNearDedup:
    def test_hamming_radius_collapse(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.functions.simhash import (
            hamming_distance,
            simhash64,
        )
        from modernsearchengines_ray.stages.dedup import dedup_simhash_near

        base = (
            "the castle above the river hosts a chocolate festival every "
            "december with stalls along the old town bridge and market "
            "square where visitors taste wine and swabian noodles all day"
        )
        near = base.replace("day", "night")      # tiny perturbation
        other = (
            "ray data pipelines stream arrow record batches through "
            "map operators with backpressure and object store spilling"
        )
        assert hamming_distance(simhash64(base), simhash64(near)) <= 3
        assert hamming_distance(simhash64(base), simhash64(other)) > 3

        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, other]})
        kept = dedup_simhash_near(rd.from_pandas(df)).to_pandas()
        assert set(kept["doc_id"]) == {1, 3}     # near pair collapsed, keep-min

    def test_brute_force_agreement(self, ray_session):
        """LSH banding must find exactly the brute-force hamming<=3 pairs."""
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.functions.simhash import (
            hamming_distance,
            simhash64,
        )
        from modernsearchengines_ray.stages.dedup import (
            simhash_near_duplicate_pairs,
        )
        from tests.fixtures import make_pages

        pages = make_pages(n=80, seed=7)
        texts = pages["text"].to_pylist()
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

        hashes = [simhash64(t) for t in texts]
        brute_linked = {
            (i, j)
            for i in range(len(texts))
            for j in range(i + 1, len(texts))
            if hamming_distance(hashes[i], hashes[j]) <= 3
        }
        roots = simhash_near_duplicate_pairs(rd.from_pandas(df))
        lsh_linked = {
            (int(r), int(i)) for i, r in zip(roots["doc_id"], roots["dup_root"])
            if r != i
        }
        # every brute pair must be reachable: both ends share a root
        root_of = dict(zip(roots["doc_id"].astype(int),
                           roots["dup_root"].astype(int)))
        for i, j in brute_linked:
            assert root_of[i] == root_of[j] or (root_of[j] == i), (i, j)


class TestJaccardPairs:
    def test_known_pair_found_and_scored(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.functions.minhash import ngram_jaccard
        from modernsearchengines_ray.stages.dedup import (
            jaccard_candidate_pairs,
        )

        base = (
            "one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
        )
        near = base + " nineteen"
        other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, other]})
        pairs = jaccard_candidate_pairs(rd.from_pandas(df), threshold=0.5)
        assert [(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])] == [(1, 2)]
        expected = round(ngram_jaccard(base, near), 6)
        assert abs(pairs["jaccard"].iloc[0] - expected) < 1e-9


class TestEmbeddingDedup:
    def test_dominance_rule(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_embedding_cosine

        v = [1.0, 0.0, 0.0]
        near = [0.999, 0.04, 0.0]       # cos > 0.95 vs v
        far = [0.0, 1.0, 0.0]
        df = pd.DataFrame({
            "vec_id": [10, 11, 12],
            "embedding": [v, near, far],
        })
        kept = dedup_embedding_cosine(rd.from_pandas(df)).to_pandas()
        assert set(kept["vec_id"]) == {10, 12}


class TestMultimodal:
    def test_image_features_deterministic(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.stages.multimodal import (
            _fake_image_meta,
            image_features,
        )

        payloads = [b"abc", b"longer payload bytes", b""]
        df = pd.DataFrame({
            "item_id": [1, 2, 3],
            "payload": payloads,
            "mime": ["image/fake"] * 3,
        })
        out = image_features(rd.from_pandas(df), concurrency=1).to_pandas()
        out = out.sort_values("item_id").reset_index(drop=True)
        for i, payload in enumerate(payloads):
            w, h, c, luma = _fake_image_meta(payload)
            assert out.loc[i, "width"] == w
            assert out.loc[i, "height"] == h
            assert out.loc[i, "channels"] == c
            assert abs(out.loc[i, "mean_luma"] - luma) < 1e-12

    def test_real_codec_rejects_undecodable_payload(self):
        # codec="real" now genuinely decodes PNG/BMP (tests/test_codecs);
        # undecodable payloads must fail LOUDLY, not produce fake metadata
        import pytest as _pytest

        from modernsearchengines_ray.functions.codecs import (
            UnsupportedMediaError,
        )
        from modernsearchengines_ray.stages.multimodal import ImageDecode

        dec = ImageDecode(codec="real")
        if dec.pil is not None:
            _pytest.skip("Pillow present: unknown formats go to PIL")
        with _pytest.raises(UnsupportedMediaError):
            dec._decode_real(b"not an image")

    def test_frame_sampling_fanout(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.stages.multimodal import frame_samples

        df = pd.DataFrame({
            "item_id": [1, 2],
            "payload": [b"x" * 10000, b"y" * 100],
            "mime": ["video/fake"] * 2,
        })
        out = frame_samples(rd.from_pandas(df), every_n_bytes=4096).to_pandas()
        got = out.groupby("item_id")["frame_idx"].count().to_dict()
        assert got == {1: 3, 2: 1}
        assert all(len(f) <= 256 for f in out["frame"])


class TestIVF:
    def test_ivf_matches_brute_force_with_full_probe(self, ray_session, tmp_path):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.stages.ann import (
            IVFIndex,
            brute_force_topk,
        )

        rng = np.random.RandomState(3)
        vecs = rng.randn(200, 16)
        df = pd.DataFrame({
            "vec_id": range(200),
            "embedding": [list(map(float, v)) for v in vecs],
        })
        ds = rd.from_pandas(df)
        index = IVFIndex.build(ds, str(tmp_path / "ivf"), num_clusters=8)
        query = vecs[0]

        exact = brute_force_topk(ds, query[None, :], k=10)
        exact_ids = list(exact["vec_id"])
        # probing ALL buckets must equal the exact scan
        full = [i for i, _ in index.search(query, k=10, nprobe=8)]
        assert full == exact_ids
        # probing few buckets keeps high recall (isotropic gaussian data
        # is IVF's worst case — real embeddings cluster far better)
        approx = [i for i, _ in index.search(query, k=10, nprobe=3)]
        assert len(set(approx) & set(exact_ids)) >= 8


class TestSkewAndSpillResume:
    def test_hot_term_skew(self, ray_session, tmp_path):
        """SURVEY §5 skew test: one stopword-like term in 90% of docs.

        The segmented layout must keep the hot shard's merge linear and
        the index content exact."""
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.state.shards import load_index_postings

        rng = __import__("random").Random(13)
        vocab = [f"w{i}" for i in range(50)]
        texts = []
        for i in range(400):
            words = [rng.choice(vocab) for _ in range(30)]
            if i % 10 != 0:
                words.insert(rng.randrange(len(words)), "hotword")
            texts.append(" ".join(words))
        df = pd.DataFrame({"doc_id": range(400), "text": texts})
        cfg = IndexConfig(prepend_url_words=False, num_shards=8)
        idx = str(tmp_path / "skew")
        result = build_index(rd.from_pandas(df), idx, cfg=cfg,
                             corpus_id="skew")
        postings = load_index_postings(idx)
        assert "hotword" in postings
        assert len(postings["hotword"]) == 360
        # every doc's tf/positions present exactly once
        for d, (score, positions) in postings["hotword"].items():
            assert len(positions) >= 1
        assert result.postings > 0

    def test_spill_reused_on_merge_failure(self, ray_session,
                                           pages_parquet, tmp_path):
        """Kill between spill and merge: the rebuilt index must reuse
        the spill (manifest short-circuit) and match a fresh build."""
        import os
        import shutil

        import ray.data as rd

        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.pipelines.corpus_prep import prepare_corpus
        from modernsearchengines_ray.state.shards import load_index_postings

        corpus_df = prepare_corpus(
            rd.read_parquet(pages_parquet),
            doc_id_mode="dense_rank").to_pandas()
        cols = corpus_df[["doc_id", "url", "text"]]

        fresh_dir = str(tmp_path / "fresh")
        build_index(rd.from_pandas(cols), fresh_dir, corpus_id="sp",
                    keep_runs=True)
        want = load_index_postings(fresh_dir)

        # simulate dying after the spill: copy only the runs dir
        crashed = str(tmp_path / "crashed")
        os.makedirs(crashed)
        shutil.copytree(os.path.join(fresh_dir, "_runs"),
                        os.path.join(crashed, "_runs"))
        result = build_index(rd.from_pandas(cols), crashed, corpus_id="sp")
        assert result.shards_built == result.stats.num_documents * 0 + 16
        got = load_index_postings(crashed)
        assert set(got) == set(want)
        for term in want:
            assert got[term] == want[term], term


class TestSaltedMerge:
    def test_bit_identical_to_single_level(self, ray_session,
                                           pages_parquet, tmp_path):
        """merge_salts=3 must reproduce the single-level index exactly
        (same parquet content per shard — not just same postings)."""
        import hashlib
        import os

        import pyarrow.parquet as pq
        import ray.data as rd

        from modernsearchengines_ray.config import IndexConfig
        from modernsearchengines_ray.pipelines.build_index import build_index
        from modernsearchengines_ray.pipelines.corpus_prep import prepare_corpus

        corpus_df = prepare_corpus(
            rd.read_parquet(pages_parquet),
            doc_id_mode="dense_rank").to_pandas()
        cols = corpus_df[["doc_id", "url", "text"]]
        cfg = IndexConfig(num_shards=8)

        single = str(tmp_path / "single")
        salted = str(tmp_path / "salted")
        # same corpus_id -> same spill key; use separate dirs so each
        # spills independently (block structure identical: same input)
        build_index(rd.from_pandas(cols), single, cfg=cfg, corpus_id="s1")
        build_index(rd.from_pandas(cols), salted, cfg=cfg, corpus_id="s1",
                    merge_salts=3)

        for k in range(cfg.num_shards):
            a = pq.read_table(os.path.join(single, f"shard={k}.parquet"))
            b = pq.read_table(os.path.join(salted, f"shard={k}.parquet"))
            assert a.schema == b.schema
            assert a.num_rows == b.num_rows, k
            for name in a.column_names:
                assert a[name].to_pylist() == b[name].to_pylist(), (k, name)


class TestEmbeddingLsh:
    def test_lsh_candidates_cover_exact_pairs(self, ray_session):
        """Hyperplane LSH must find (nearly) all >=0.95-cosine pairs on
        a corpus with planted near-dups, and verification keeps no
        false positives."""
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            embedding_lsh_candidate_pairs,
        )

        rng = np.random.RandomState(4)
        base = rng.randn(60, 24)
        rows, ids = [], []
        for i, v in enumerate(base):
            rows.append(v)
            ids.append(2 * i)
            if i % 3 == 0:                   # plant a near-dup
                rows.append(v + 0.02 * rng.randn(24))
                ids.append(2 * i + 1)
        mat = np.stack(rows)
        mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat_n @ mat_n.T
        exact = {
            (ids[i], ids[j])
            for i in range(len(ids)) for j in range(i + 1, len(ids))
            if sims[i, j] >= 0.95
        }
        assert exact, "fixture must contain near-dup pairs"

        df = pd.DataFrame({
            "vec_id": ids,
            "embedding": [list(map(float, v)) for v in mat],
        })
        pairs = embedding_lsh_candidate_pairs(rd.from_pandas(df))
        got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        # every returned pair is truly >= threshold (verified)
        assert got <= exact | {(min(a, b), max(a, b)) for a, b in exact}
        # recall: the 8x12 table config catches ~89% per pair; on this
        # fixture demand >= 80% of the planted pairs
        assert len(got & exact) / len(exact) >= 0.8, (len(got), len(exact))
