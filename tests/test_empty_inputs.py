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
