"""Dedup reduce tiers + pair-filter semantics.

Covers the round-2 hardening:
- ``reduce="partitioned"`` (distributed groupby + hash-shuffle join)
  must be bit-identical to ``reduce="driver"`` on the same input;
- winner filters match the full (hash, key) pair — multi-snapshot
  inputs (same url, different content) must not resurrect losers;
- ingestion guards: ``assert_unique_keys`` and hash-id collision check;
- the LSH-default embedding dedup equals the matrix-mode oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def docs_df():
    from tests.fixtures import make_pages

    pages = make_pages(n=60, seed=11)
    texts = pages["text"].to_pylist()
    # plant exact duplicates so dedup actually drops rows
    texts = texts + [texts[0], texts[1], texts[1]]
    return pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
    })


class TestPartitionedReduceParity:
    def test_exact_simhash_modes_agree(self, ray_session, docs_df):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_exact_simhash

        a = dedup_exact_simhash(rd.from_pandas(docs_df), keep_key="doc_id",
                                reduce="driver").to_pandas()
        b = dedup_exact_simhash(rd.from_pandas(docs_df), keep_key="doc_id",
                                reduce="partitioned").to_pandas()
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b))
        assert len(a) == len(docs_df) - 3        # planted dups dropped

    def test_exact_hash_modes_agree(self, ray_session, docs_df):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_exact_hash

        a = dedup_exact_hash(rd.from_pandas(docs_df),
                             keep_key="doc_id", reduce="driver").to_pandas()
        b = dedup_exact_hash(rd.from_pandas(docs_df), keep_key="doc_id",
                             reduce="partitioned").to_pandas()
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b))

    def test_minhash_modes_agree(self, ray_session, docs_df):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_minhash

        a = dedup_minhash(rd.from_pandas(docs_df),
                          reduce="driver").to_pandas()
        b = dedup_minhash(rd.from_pandas(docs_df),
                          reduce="partitioned").to_pandas()
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b))

    def test_unknown_mode_rejected(self, ray_session, docs_df):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_exact_hash

        with pytest.raises(ValueError, match="reduce"):
            dedup_exact_hash(rd.from_pandas(docs_df), keep_key="doc_id",
                             reduce="bogus")


class TestPairFilterSemantics:
    """ADVICE r1 (medium): key-only winner filtering keeps every row
    sharing a winning url; the (hash, key) pair filter must not."""

    def test_losing_snapshot_of_winning_url_is_dropped(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_exact_hash

        # url B's text-X snapshot LOSES its hash group to url A, but
        # url B also owns a unique snapshot Z which it wins.
        df = pd.DataFrame({
            "url": ["a", "b", "b"],
            "text": ["same content x", "same content x", "unique content z"],
        })
        for mode in ("driver", "partitioned"):
            kept = dedup_exact_hash(rd.from_pandas(df), keep_key="url",
                                    reduce=mode).to_pandas()
            got = set(zip(kept["url"], kept["text"]))
            assert got == {("a", "same content x"),
                           ("b", "unique content z")}, mode

    def test_simhash_pair_filter_in_streaming_prep(self, ray_session,
                                                   tmp_path):
        """Same scenario through prepare_corpus_streaming: the winning
        url's losing snapshot must not survive the semi-join."""
        import pyarrow as pa
        import ray.data as rd

        from modernsearchengines_ray.pipelines.corpus_prep import (
            prepare_corpus_streaming,
        )

        def wrap(text: str) -> bytes:
            return (f'<html lang="en"><head><title>t</title></head>'
                    f"<body><p>{text}</p></body></html>").encode()

        text_x = ("the castle above the river hosts a chocolate festival "
                  "every december with stalls along the old town bridge")
        text_z = ("ray data pipelines stream arrow record batches through "
                  "map operators with backpressure and object store spill")
        pages = pa.table({
            "url": ["http://a.example/p", "http://b.example/p",
                    "http://b.example/q"],
            "warc_ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "html": [wrap(text_x), wrap(text_x), wrap(text_z)],
            "text": ["", "", ""],
            "lang": ["en", "en", "en"],
        })
        src = tmp_path / "pages.parquet"
        import pyarrow.parquet as pq

        pq.write_table(pages, str(src))
        corpus = prepare_corpus_streaming(
            rd.read_parquet(str(src)), str(tmp_path / "work"),
            doc_id_mode="hash").to_pandas()
        assert set(corpus["url"]) == {"http://a.example/p",
                                      "http://b.example/q"}


class TestStreamingPrepPartitioned:
    def test_streaming_prep_modes_agree(self, ray_session, tmp_path):
        """prepare_corpus_streaming driver vs partitioned winner
        election: identical corpus rows (incl. restored uint64 simhash
        column and hash doc ids)."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from modernsearchengines_ray.pipelines.corpus_prep import (
            prepare_corpus_streaming,
        )
        from tests.fixtures import make_pages

        src = tmp_path / "pages.parquet"
        pq.write_table(make_pages(n=80, seed=5), str(src))
        outs = {}
        for mode in ("driver", "partitioned"):
            corpus = prepare_corpus_streaming(
                rd.read_parquet(str(src)), str(tmp_path / f"work_{mode}"),
                doc_id_mode="hash", reduce=mode).to_pandas()
            outs[mode] = _sorted(corpus)
        pd.testing.assert_frame_equal(outs["driver"], outs["partitioned"])
        assert str(outs["driver"]["simhash"].dtype) == "uint64"


class TestIngestionGuards:
    def test_assert_unique_keys_passes_and_raises(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.pipelines.corpus_prep import (
            assert_unique_keys,
        )

        ok = pd.DataFrame({"url": ["a", "b", "c"]})
        assert assert_unique_keys(rd.from_pandas(ok)) == 3
        dup = pd.DataFrame({"url": ["a", "b", "a"]})
        with pytest.raises(ValueError, match="not unique"):
            assert_unique_keys(rd.from_pandas(dup))

    def test_hash_id_collision_fails_loudly(self, ray_session, monkeypatch):
        import ray.data as rd

        from modernsearchengines_ray.pipelines import corpus_prep

        df = pd.DataFrame({"url": ["u1", "u2"], "text": ["x", "y"]})
        # force a collision: constant hash for every url
        monkeypatch.setattr(corpus_prep, "stable_hash64", lambda u: 7)
        with pytest.raises(ValueError, match="collision"):
            corpus_prep.assign_doc_ids(rd.from_pandas(df), mode="hash",
                                       check_collisions=True).materialize()

    def test_hash_ids_clean_when_injective(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.pipelines.corpus_prep import (
            assign_doc_ids,
        )

        df = pd.DataFrame({"url": [f"http://x/{i}" for i in range(50)],
                           "text": ["t"] * 50})
        out = assign_doc_ids(rd.from_pandas(df), mode="hash",
                             check_collisions=True).to_pandas()
        assert out["doc_id"].nunique() == 50

    def test_default_mode_is_hash_not_driver_materializing(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.pipelines.corpus_prep import (
            assign_doc_ids,
        )

        df = pd.DataFrame({"url": ["http://x/a", "http://x/b"],
                           "text": ["t", "t"]})
        out = assign_doc_ids(rd.from_pandas(df)).to_pandas()
        # hash ids, not dense ranks: not the 0..n-1 contiguous range
        assert set(out["doc_id"]) != {0, 1}

    def test_dense_rank_refuses_above_driver_cap(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.pipelines.corpus_prep import (
            assign_doc_ids,
        )

        df = pd.DataFrame({"url": [f"http://x/{i}" for i in range(10)]})
        with pytest.raises(ValueError, match="driver"):
            assign_doc_ids(rd.from_pandas(df), mode="dense_rank",
                           max_driver_rows=5)
        ok = assign_doc_ids(rd.from_pandas(df), mode="dense_rank",
                            max_driver_rows=10).to_pandas()
        assert sorted(ok["doc_id"]) == list(range(10))


class TestEmbeddingDedupLshDefault:
    def test_lsh_equals_matrix_oracle_on_planted_dups(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_embedding_cosine

        rng = np.random.RandomState(3)
        base = rng.randn(40, 32)
        rows = [v / np.linalg.norm(v) for v in base]
        # plant near-dups: tiny perturbations of rows 0..4
        for i in range(5):
            v = rows[i] + rng.randn(32) * 0.01
            rows.append(v / np.linalg.norm(v))
        df = pd.DataFrame({
            "vec_id": range(len(rows)),
            "embedding": [r.tolist() for r in rows],
        })
        lsh = dedup_embedding_cosine(rd.from_pandas(df),
                                     method="lsh").to_pandas()
        mat = dedup_embedding_cosine(rd.from_pandas(df),
                                     method="matrix").to_pandas()
        assert set(lsh["vec_id"]) == set(mat["vec_id"])
        assert set(range(40)).issubset(set(lsh["vec_id"]))
        assert not (set(range(40, 45)) & set(lsh["vec_id"]))


class TestMinhashChainPropagation:
    def _chain_df(self):
        """A five-doc chain: adjacent docs differ by two words (near
        dups), the endpoints differ by eight (far apart).  The fixture
        asserts its own precondition — endpoints share NO bucket, every
        adjacent pair shares one — so a collapse of the whole chain can
        only come from ITERATED propagation."""
        import pyarrow as pa

        from modernsearchengines_ray.stages.dedup import MinHashBands

        words = [f"w{i:02d}" for i in range(60)]
        docs = [" ".join(words)]
        for hop in range(4):
            words = list(words)
            words[3 + hop * 13] = f"x{hop}a"
            words[9 + hop * 11] = f"x{hop}b"
            docs.append(" ".join(words))
        docs.append("completely different words about ray data arrow batches")
        df = pd.DataFrame({"doc_id": range(1, len(docs) + 1),
                           "text": docs})

        buckets: dict[str, set] = {}
        table = MinHashBands()(pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "text": pa.array(df["text"]),
        }))
        for i, k in zip(table["doc_id"].to_pylist(),
                        table["band_key"].to_pylist()):
            buckets.setdefault(k, set()).add(i)
        shared = [v for v in buckets.values() if len(v) > 1]
        assert not any({1, 5} <= s for s in shared), \
            "precondition: endpoints must not share a bucket"
        for a, b in ((1, 2), (2, 3), (3, 4), (4, 5)):
            assert any({a, b} <= s for s in shared), \
                f"precondition: adjacent pair {a},{b} must share a bucket"
        return df

    def test_chain_collapses_to_one_root(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            minhash_duplicate_groups,
        )

        df = self._chain_df()
        roots = minhash_duplicate_groups(rd.from_pandas(df)).to_pandas()
        root_of = dict(zip(roots["doc_id"], roots["dup_root"]))
        assert root_of[1] == root_of[2] == root_of[3] \
            == root_of[4] == root_of[5] == 1
        assert root_of[6] == 6

    def test_propagation_modes_agree(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_minhash

        df = self._chain_df()
        a = dedup_minhash(rd.from_pandas(df), reduce="driver").to_pandas()
        b = dedup_minhash(rd.from_pandas(df),
                          reduce="partitioned").to_pandas()
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b))
        assert set(a["doc_id"]) == {1, 6}


class TestLshPairsPartitioned:
    def test_modes_bit_identical_on_planted_dups(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            embedding_lsh_candidate_pairs,
        )

        rng = np.random.RandomState(9)
        base = rng.randn(30, 16)
        rows = [v / np.linalg.norm(v) for v in base]
        for i in range(4):
            v = rows[i] + rng.randn(16) * 0.01
            rows.append(v / np.linalg.norm(v))
        df = pd.DataFrame({"vec_id": range(len(rows)),
                           "embedding": [r.tolist() for r in rows]})
        driver = embedding_lsh_candidate_pairs(
            rd.from_pandas(df), reduce="driver")
        part = embedding_lsh_candidate_pairs(
            rd.from_pandas(df), reduce="partitioned").to_pandas()
        pd.testing.assert_frame_equal(_sorted(driver), _sorted(part))
        assert len(driver) >= 4          # the planted pairs were found


class TestSimhashNearPartitioned:
    def test_modes_agree_on_mixed_corpus(self, ray_session):
        """Driver union-find vs distributed edge-verified label
        propagation: identical kept rows on a corpus with exact dups,
        hamming-near dups and unique docs."""
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_simhash_near
        from tests.fixtures import make_pages

        pages = make_pages(n=60, seed=13)
        texts = pages["text"].to_pylist()
        texts.append(texts[0])                       # exact dup
        near = texts[1].replace("the", "thee", 1)    # tiny perturbation
        texts.append(near)
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        a = dedup_simhash_near(rd.from_pandas(df),
                               reduce="driver").to_pandas()
        b = dedup_simhash_near(rd.from_pandas(df),
                               reduce="partitioned").to_pandas()
        pd.testing.assert_frame_equal(_sorted(a), _sorted(b))
        assert len(a) < len(df)                      # dups collapsed


class TestJaccardPairsPartitioned:
    def test_modes_agree_with_scores(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            jaccard_candidate_pairs,
        )

        base = ("one two three four five six seven eight nine ten eleven "
                "twelve thirteen fourteen fifteen sixteen seventeen eighteen")
        near = base + " nineteen"
        near2 = base.replace("eleven", "elf")
        other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                           "text": [base, near, near2, other]})
        driver = jaccard_candidate_pairs(rd.from_pandas(df), threshold=0.5)
        part = jaccard_candidate_pairs(rd.from_pandas(df), threshold=0.5,
                                       reduce="partitioned").to_pandas()
        assert len(driver) >= 2
        pd.testing.assert_frame_equal(_sorted(driver), _sorted(part))

    def test_partitioned_survives_empty_candidate_set(self, ray_session):
        """All-distinct corpus: zero candidate pairs must flow through
        the joins as typed empty partitions, not crash Acero."""
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            jaccard_candidate_pairs,
        )

        df = pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["alpha beta gamma delta epsilon zeta",
                     "one two three four five six seven"],
        })
        out = jaccard_candidate_pairs(rd.from_pandas(df), threshold=0.5,
                                      reduce="partitioned").to_pandas()
        assert len(out) == 0
        # zero-row results may surface schema-less (Ray drops the
        # column info with the last empty block) — rows are the contract
        assert list(out.columns) in ([], ["id_a", "id_b", "jaccard"])


class TestDistributedKmeans:
    def test_recovers_planted_clusters(self, ray_session, tmp_path):
        """Full-data distributed Lloyd's must recover well-separated
        planted clusters: pure assignments, and an IVF index built with
        fit='distributed' returns exact top-k at full probe."""
        import ray.data as rd

        from modernsearchengines_ray.stages.ann import (
            IVFIndex,
            kmeans_fit_distributed,
        )

        rng = np.random.RandomState(4)
        centers = np.eye(4, 16)               # 4 orthogonal directions
        vecs, labels = [], []
        for c in range(4):
            for _ in range(30):
                v = centers[c] + rng.randn(16) * 0.05
                vecs.append((v / np.linalg.norm(v)).tolist())
                labels.append(c)
        df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
        ds = rd.from_pandas(df)
        cents = kmeans_fit_distributed(ds, num_clusters=4, iters=8)
        assign = np.argmax(np.asarray(vecs) @ cents.T, axis=1)
        # purity: every planted cluster maps to exactly one centroid
        mapping = {}
        for a, lbl in zip(assign, labels):
            mapping.setdefault(lbl, set()).add(a)
        assert all(len(s) == 1 for s in mapping.values()), mapping
        assert len({next(iter(s)) for s in mapping.values()}) == 4

        index = IVFIndex.build(ds, str(tmp_path / "ivf"), num_clusters=4,
                               fit="distributed")
        q = np.asarray(vecs[0])
        hits = index.search(q, k=5, nprobe=4)
        sims = np.asarray(vecs) @ q
        want = np.lexsort((np.arange(len(vecs)), -sims))[:5].tolist()
        assert [i for i, _ in hits] == want

    def test_unknown_fit_mode_rejected(self, ray_session, tmp_path):
        import ray.data as rd

        from modernsearchengines_ray.stages.ann import IVFIndex

        df = pd.DataFrame({"vec_id": [0], "embedding": [[1.0, 0.0]]})
        with pytest.raises(ValueError, match="fit"):
            IVFIndex.build(rd.from_pandas(df), str(tmp_path / "x"),
                           num_clusters=1, fit="bogus")


class TestDecontamination:
    def test_planted_contamination_detected(self):
        from modernsearchengines_ray.functions.quality import word_ngrams

        probe = " ".join(f"w{i}" for i in range(20))
        probe_grams = word_ngrams(probe, 13)
        assert len(probe_grams) == 8          # 20 - 13 + 1
        # a doc quoting 13+ consecutive probe words is contaminated
        contaminated = "intro text " + " ".join(
            f"w{i}" for i in range(3, 16)) + " outro"
        clean = " ".join(f"x{i}" for i in range(30))
        short = "w0 w1 w2"
        assert word_ngrams(contaminated, 13) & probe_grams
        assert not (word_ngrams(clean, 13) & probe_grams)
        assert word_ngrams(short, 13) == set()

    def test_overlap_count_matches_manual(self):
        from modernsearchengines_ray.functions.quality import word_ngrams

        text = "a b c d e f g h i j k l m n"          # 14 words
        grams = word_ngrams(text, 13)
        assert grams == {"a b c d e f g h i j k l m",
                         "b c d e f g h i j k l m n"}


class TestMultiQueryAnn:
    def test_batched_topk_matches_per_query_exact(self, ray_session):
        """brute_force_topk with a query MATRIX must equal the exact
        per-query matmul ranking (ties by id) for every query."""
        import ray.data as rd

        from modernsearchengines_ray.stages.ann import brute_force_topk

        rng = np.random.RandomState(21)
        mat = rng.randn(80, 12)
        df = pd.DataFrame({"vec_id": range(80),
                           "embedding": [r.tolist() for r in mat]})
        queries = rng.randn(3, 12)
        out = brute_force_topk(rd.from_pandas(df), queries, k=5)

        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qn @ mn.T
        for qi in range(3):
            order = np.lexsort((np.arange(80), -sims[qi]))[:5]
            got = out[out["query_idx"] == qi]
            assert got["vec_id"].tolist() == order.tolist(), qi
            assert got["rank"].tolist() == [0, 1, 2, 3, 4]
            np.testing.assert_allclose(got["cos_sim"].to_numpy(),
                                       sims[qi][order], rtol=0, atol=1e-12)


class TestCollisionPairsKernel:
    def test_pairs_within_buckets_only(self):
        from modernsearchengines_ray.stages.dedup import _collision_pairs

        ids = np.array([1, 2, 3, 2, 1, 4], dtype=np.int64)
        buckets = np.array([10, 10, 10, 20, 20, 30], dtype=np.int64)
        got = _collision_pairs(ids, buckets)
        assert got == {(1, 2), (1, 3), (2, 3)}

    def test_duplicate_rows_and_strings(self):
        from modernsearchengines_ray.stages.dedup import _collision_pairs

        ids = np.array([5, 5, 6], dtype=np.int64)
        buckets = np.asarray(["b:1", "b:1", "b:1"], dtype=object)
        assert _collision_pairs(ids, buckets) == {(5, 6)}

    def test_empty(self):
        from modernsearchengines_ray.stages.dedup import _collision_pairs

        assert _collision_pairs(np.array([], dtype=np.int64),
                                np.array([], dtype=np.int64)) == set()


class TestRound3Hardening:
    """Round-3 items: embedding-dedup partitioned tier, cluster-derived
    join partitions, empty-input short-circuits, short-doc scoping,
    offset-safe list reads (VERDICT r2 #1/#5/#6 + ADVICE r2)."""

    def _planted_df(self):
        rng = np.random.RandomState(3)
        base = rng.randn(40, 32)
        rows = [v / np.linalg.norm(v) for v in base]
        for i in range(5):
            v = rows[i] + rng.randn(32) * 0.01
            rows.append(v / np.linalg.norm(v))
        return pd.DataFrame({
            "vec_id": range(len(rows)),
            "embedding": [r.tolist() for r in rows],
        })

    def test_embedding_cosine_modes_agree(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_embedding_cosine

        df = self._planted_df()
        a = dedup_embedding_cosine(rd.from_pandas(df),
                                   reduce="driver").to_pandas()
        b = dedup_embedding_cosine(rd.from_pandas(df),
                                   reduce="partitioned").to_pandas()
        a = a.sort_values("vec_id", ignore_index=True)
        b = b.sort_values("vec_id", ignore_index=True)[a.columns]
        assert a["vec_id"].tolist() == b["vec_id"].tolist()
        # vectors must round-trip the blob pack bit-exactly
        np.testing.assert_array_equal(np.stack(a["embedding"].to_numpy()),
                                      np.stack(b["embedding"].to_numpy()))
        assert set(a["vec_id"]) == set(range(40))

    def test_embedding_cosine_matrix_rejects_partitioned(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_embedding_cosine

        with pytest.raises(ValueError, match="reduce"):
            dedup_embedding_cosine(rd.from_pandas(self._planted_df()),
                                   method="matrix", reduce="partitioned")

    def test_default_join_partitions_derived_from_cluster(self, ray_session):
        import ray

        from modernsearchengines_ray.stages.dedup import (
            default_join_partitions,
        )

        cpus = int(ray.cluster_resources()["CPU"])
        assert default_join_partitions() == max(2, cpus // 2)

    def test_empty_input_short_circuits(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            dedup_embedding_cosine,
            dedup_exact_hash,
            dedup_minhash,
            dedup_simhash_near,
            embedding_lsh_candidate_pairs,
            jaccard_candidate_pairs,
        )

        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }))
        assert dedup_exact_hash(docs, keep_key="doc_id").to_pandas().empty
        assert dedup_minhash(docs).to_pandas().empty
        assert dedup_simhash_near(docs).to_pandas().empty
        assert len(jaccard_candidate_pairs(docs)) == 0

        vecs = rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
        }))
        assert len(embedding_lsh_candidate_pairs(vecs)) == 0
        assert dedup_embedding_cosine(vecs).to_pandas().empty

    def test_short_docs_kept_and_never_candidates(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            dedup_minhash,
            jaccard_candidate_pairs,
        )

        # two identical 2-word docs: below shingle length, excluded
        # from banding (the SQL oracle's len(words) >= 3 scope) --
        # never paired, never dropped
        long_doc = " ".join(f"w{i}" for i in range(30))
        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["tiny doc", "tiny doc", long_doc, long_doc],
        })
        pairs = jaccard_candidate_pairs(rd.from_pandas(df))
        assert pairs[["id_a", "id_b"]].values.tolist() == [[3, 4]]
        kept = dedup_minhash(rd.from_pandas(df)).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 2, 3]

    def test_list_matrix_offset_safe(self):
        import pyarrow as pa

        from modernsearchengines_ray.functions.arrowlist import list_matrix

        arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
        tab = pa.table({"embedding": arr}).slice(1, 2)
        got = list_matrix(tab["embedding"], 2)
        np.testing.assert_array_equal(got, [[3.0, 4.0], [5.0, 6.0]])

    def test_lsh_pairs_identical_under_small_batches(self, ray_session):
        """Sliced-batch regression (ADVICE r2): batch_size smaller than
        the block must not misalign the embedding matrix."""
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import (
            embedding_lsh_candidate_pairs,
        )

        df = self._planted_df()
        whole = embedding_lsh_candidate_pairs(rd.from_pandas(df))
        # re-run with the dataset pre-split into many tiny blocks, which
        # forces sliced list arrays through every batch fn
        sliced = embedding_lsh_candidate_pairs(
            rd.from_pandas(df).repartition(7))
        pd.testing.assert_frame_equal(
            _sorted(whole), _sorted(sliced))


class TestPrunedBucketPull:
    def test_only_collision_rows_reach_the_driver(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import _pruned_bucket_pull

        tab = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "band_key": pa.array(["a", "a", "b", "c", "d", "e"]),
        })
        got = _pruned_bucket_pull(rd.from_arrow(tab).repartition(3),
                                  "doc_id", "band_key")
        # singleton buckets b/c/d/e pruned distributed-side: only the
        # two rows of bucket "a" are pulled
        assert got.num_rows == 2
        assert sorted(got["doc_id"].to_pylist()) == [1, 2]
        assert set(got["band_key"].to_pylist()) == {"a"}


class TestDedupIncremental:
    def _ds(self, rows):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import add_text_hash

        df = pd.DataFrame(rows, columns=["doc_id", "text"])
        return rd.from_pandas(df).map_batches(
            add_text_hash, batch_format="pyarrow")

    @pytest.mark.parametrize("reduce", ["driver", "partitioned"])
    def test_drops_only_reference_collisions(self, ray_session, reduce):
        from modernsearchengines_ray.stages.dedup import dedup_incremental

        ref = self._ds([(1, "alpha beta"), (2, "gamma delta")])
        new = self._ds([
            (10, "alpha beta"),     # exists in ref -> dropped
            (11, "fresh content"),  # new -> kept
            (12, "fresh content"),  # duplicate WITHIN new -> still kept
            (13, "gamma delta"),    # exists in ref -> dropped
        ])
        out = dedup_incremental(new, ref, key_col="text_hash",
                                reduce=reduce, num_partitions=2)
        got = sorted(out.to_pandas()["doc_id"].tolist())
        # incremental dedup removes vs the REFERENCE only; new-vs-new
        # duplicates are the next snapshot's dedup_exact problem
        assert got == [11, 12], reduce

    @pytest.mark.parametrize("reduce", ["driver", "partitioned"])
    def test_empty_reference_keeps_everything(self, ray_session, reduce):
        from modernsearchengines_ray.stages.dedup import dedup_incremental

        ref = self._ds([]).filter(expr="doc_id > 0")  # empty
        new = self._ds([(1, "a a"), (2, "b b")])
        out = dedup_incremental(new, ref, key_col="text_hash",
                                reduce=reduce, num_partitions=2)
        assert sorted(out.to_pandas()["doc_id"].tolist()) == [1, 2]


class TestParagraphDedup:
    def _corpus(self):
        import ray.data as rd

        # P1 appears in docs 0, 1 and twice in doc 2; P2 only in doc 1
        return rd.from_items([
            {"doc_id": 0, "text": "P1\nA"},
            {"doc_id": 1, "text": "P2\nP1\nB"},
            {"doc_id": 2, "text": "P1\nP1"},
            {"doc_id": 3, "text": "C"},
        ])

    def test_first_occurrence_semantics(self):
        from modernsearchengines_ray.stages.dedup import dedup_paragraphs

        out = dedup_paragraphs(self._corpus()).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        by_id = {r.doc_id: r for r in out.itertuples()}
        assert by_id[0].text == "P1\nA"          # doc 0 keeps everything
        assert by_id[1].text == "P2\nB"          # P1 already seen in doc 0
        assert by_id[1].n_paras == 3 and by_id[1].n_kept == 2
        assert 2 not in by_id                    # fully-duplicate doc drops
        assert by_id[3].text == "C"

    def test_tier_parity(self):
        from modernsearchengines_ray.stages.dedup import dedup_paragraphs

        a = dedup_paragraphs(self._corpus(), reduce="driver") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = dedup_paragraphs(self._corpus(), reduce="partitioned") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_intra_doc_duplicates_keep_first_position(self):
        import ray.data as rd

        from modernsearchengines_ray.stages.dedup import dedup_paragraphs

        ds = rd.from_items([{"doc_id": 5, "text": "X\nY\nX"}])
        out = dedup_paragraphs(ds).to_pandas()
        assert out.iloc[0].text == "X\nY"
        assert out.iloc[0].n_paras == 3 and out.iloc[0].n_kept == 2
