"""Shared pytest fixtures: one Ray session per test session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_table():
    from fixtures import make_pages

    return make_pages(n=200, seed=42)


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory, pages_table):
    import pyarrow.parquet as pq

    path = tmp_path_factory.mktemp("pages") / "pages.parquet"
    pq.write_table(pages_table, str(path))
    return str(path)


@pytest.fixture(scope="session")
def prepared(ray_session, pages_parquet, tmp_path_factory):
    """Run corpus prep + index build once; share across test modules."""
    import ray.data as rd

    from modernsearchengines_ray.oracle import build_oracle_index
    from modernsearchengines_ray.pipelines.build_index import build_index
    from modernsearchengines_ray.pipelines.corpus_prep import prepare_corpus

    tmp = tmp_path_factory.mktemp("index")
    pages = rd.read_parquet(pages_parquet)
    corpus_df = prepare_corpus(pages, doc_id_mode="dense_rank").to_pandas()
    index_dir = str(tmp / "idx")
    result = build_index(
        rd.from_pandas(corpus_df[["doc_id", "url", "text"]]),
        index_dir,
        corpus_id="test",
    )
    oracle_corpus = [
        (int(r.doc_id), r.url, "", r.text) for r in corpus_df.itertuples()
    ]
    oracle_index = build_oracle_index(oracle_corpus)
    return corpus_df, index_dir, result, oracle_index
