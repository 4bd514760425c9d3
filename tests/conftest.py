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
