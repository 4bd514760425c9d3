"""Empty-input robustness for the round's new stages: every operator
must return an EMPTY, correctly-typed result — never raise.  (Ray's
``to_pandas`` flattens zero-row datasets to no columns, so schema is
asserted at the Dataset level.)"""

from __future__ import annotations

import pyarrow as pa
import pytest


@pytest.fixture()
def empty_docs(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))


@pytest.fixture()
def empty_events(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    }))


def test_pagerank_empty_edges(ray_session):
    import ray.data as rd

    from modernsearchengines_ray.stages.graph import pagerank

    edges = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string()),
    }))
    out = pagerank(edges)
    assert out.count() == 0
    assert out.schema().names == ["node", "rank"]


def test_dup_spans_empty_corpus(empty_docs):
    from modernsearchengines_ray.stages.spans import dup_span_stats

    out = dup_span_stats(empty_docs)
    assert out.count() == 0
    assert out.schema().names == [
        "doc_id", "n_spans", "dup_spans", "dup_span_ratio"]


def test_asof_empty_both_sides(empty_events):
    from modernsearchengines_ray.stages.joins import asof_join_backward

    out = asof_join_backward(
        empty_events, empty_events, key_col="user_id", ts_col="ts",
        left_id_col="event_id", right_value_col="value")
    assert isinstance(out, pa.Table)
    assert out.num_rows == 0
    assert out.column_names == [
        "left_id", "key", "ts_us", "matched", "r_ts_us", "r_value"]


def test_interval_join_empty_probe(empty_events):
    from modernsearchengines_ray.stages.joins import interval_join

    iv = pa.table({
        "window_id": pa.array([0], pa.int64()),
        "lo_us": pa.array([0], pa.int64()),
        "hi_us": pa.array([10], pa.int64()),
    })
    out = interval_join(empty_events, iv, ts_col="ts",
                        id_col="event_id")
    assert out.count() == 0
    assert out.schema().names == ["event_id", "window_id"]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """A zero-row copy of every sf0.001 table: same schemas, no data —
    the ADVICE r4 empty-input contract for the driver-fold entries."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("empty_sf")
    for t in ("documents", "events", "orders", "embeddings"):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), out / f"{t}.parquet")
    return str(out)


def test_revenue_pareto_empty_orders(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_revenue_pareto

    out = q_revenue_pareto(empty_sf_dir)
    assert out.num_rows == 0
    assert out.column_names == [
        "customers_total", "customers_80pct", "revenue_cents"]


def test_peak_concurrency_empty_events(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_peak_concurrency

    out = q_peak_concurrency(empty_sf_dir)
    assert out.num_rows == 0
    assert out.column_names == ["peak", "first_t_us"]


def test_length_gini_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_length_gini

    out = q_length_gini(empty_sf_dir)
    assert out.num_rows == 1
    assert out["n"][0].as_py() == 0
    assert out["gini"][0].as_py() is None


def test_bounce_rate_empty_events(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_bounce_rate

    out = q_bounce_rate(empty_sf_dir)
    assert out.num_rows == 1
    assert out["sessions"][0].as_py() == 0
    assert out["bounces"][0].as_py() is None
    assert out["bounce_rate"][0].as_py() is None


def test_mutual_nn_empty_b_side(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_mutual_nn

    ds = q_mutual_nn(empty_sf_dir)
    assert ds.count() == 0
    assert ds.schema().names == ["a_id", "b_id", "cos_sim"]


def test_bm25_facets_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_bm25_facets

    out = q_bm25_facets(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["source", "n_matching", "best_score"]


def test_more_like_this_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_more_like_this

    out = q_more_like_this(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score"]


def test_shard_rebalance_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_shard_rebalance

    out = q_shard_rebalance(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["old_shard", "new_shard", "n_moved"]


def test_near_dedup_incremental_empty_documents(ray_session,
                                               empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_near_dedup_incremental

    out = q_near_dedup_incremental(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id"]


def test_term_cooccurrence_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_term_cooccurrence

    out = q_term_cooccurrence(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["term_a", "term_b", "n"]


def test_source_keywords_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_source_keywords

    out = q_source_keywords(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["source", "rank", "term", "w"]


def test_coreset_select_empty_embeddings(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_coreset_select

    # SQL mirror: min over empty = NULL -> one (rank 0, NULL) row
    out = q_coreset_select(empty_sf_dir)
    assert len(out) == 1
    assert out["rank"].iloc[0] == 0
    assert out["vec_id"].isna().iloc[0]


def test_shuffle_export_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_shuffle_export

    out = q_shuffle_export(empty_sf_dir)
    assert len(out) == 1
    assert out["n_rows"].iloc[0] == 0
    assert out["order_checksum"].isna().iloc[0]


def test_percolate_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        _PERC_QUERIES, q_percolate

    # SQL mirror: the query table is the LEFT side, so every stored
    # query still emits its zero row
    out = q_percolate(empty_sf_dir)
    assert len(out) == len(_PERC_QUERIES)
    assert (out["n_docs"] == 0).all()


def test_mmr_rerank_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_mmr_rerank

    out = q_mmr_rerank(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["rank", "doc_id", "mmr"]


def test_doc_novelty_empty_documents(ray_session, empty_sf_dir):
    from modernsearchengines_ray.pipelines.driver_queries import \
        q_doc_novelty

    out = q_doc_novelty(empty_sf_dir)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_grams", "novel",
                                 "novelty"]
