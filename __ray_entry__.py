"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline on sf0.001 — full sharded inverted-index
  build over the documents table plus one query served through the
  shard-scorer actor pool; returns the per-term index statistics.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 (plus the training-data extensions); each takes sf_dir.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents where SQL can
  express the operator (see driver_queries.ORACLE_SQL for the list and
  the rationale for rows-only entries).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    import pyarrow.parquet as pq
    import ray.data as rd

    from modernsearchengines_ray.config import IndexConfig
    from modernsearchengines_ray.pipelines.build_index import build_index
    from modernsearchengines_ray.pipelines.query import QueryEngine
    from modernsearchengines_ray.state.shards import list_shard_files

    cfg = IndexConfig(prepend_url_words=False, num_shards=8)
    from modernsearchengines_ray.pipelines.driver_queries import clean_schema

    ds = rd.read_parquet(
        f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"],
        schema=clean_schema(f"{SF_SMOKE}/documents.parquet",
                            ["doc_id", "text"]))
    tmp = tempfile.mkdtemp(prefix="msr_entry_")
    try:
        result = build_index(ds, tmp, cfg=cfg, corpus_id="entry-sf0.001")
        engine = QueryEngine(tmp, num_scorers=2)
        try:
            hits = engine.search("stream data query")
            assert isinstance(hits, list)
        finally:
            engine.shutdown()
        tables = [
            pq.read_table(p, columns=["term", "df", "idf"])
            for p in list_shard_files(tmp)
        ]
        import pyarrow as pa

        stats = pa.concat_tables(tables).sort_by("term")
        assert result.terms == stats.num_rows
        return stats.to_pandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from modernsearchengines_ray.pipelines.driver_queries import QUERY_FUNCS

    return dict(QUERY_FUNCS)


def oracle_sql() -> dict[str, str]:
    from modernsearchengines_ray.pipelines.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
