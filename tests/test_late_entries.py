"""Unit tests for the late round-4 driver entries' edge behavior on
hand-built inputs (the SQL-parity gate runs in test_driver_queries;
these pin the paths the gate data cannot reach: empty slices, known
Pareto crossings, tie handling)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def tmp_sf(tmp_path):
    """A minimal sf-dir the q_* entries can read from."""
    def write(table: str, tab: pa.Table):
        pq.write_table(tab, tmp_path / f"{table}.parquet")
        return str(tmp_path)
    return write


class TestVocabOverlapEmpty:
    def test_no_slice_docs_returns_null_row(self, ray_session, tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_vocab_overlap)

        sf = tmp_sf("documents", pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta", "gamma"], pa.string()),
            "source": pa.array(["srcX", "srcY"], pa.string()),
        }))
        out = q_vocab_overlap(sf).to_pandas()
        # mirrors SQL's sum-over-zero-rows: one row, all NULL
        assert len(out) == 1
        assert out.isna().all(axis=None)


class TestRevenuePareto:
    def _sf(self, tmp_sf, prices_by_cust):
        rows = [(c, p) for c, ps in prices_by_cust.items() for p in ps]
        return tmp_sf("orders", pa.table({
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_totalprice": pa.array([float(r[1]) for r in rows],
                                     pa.float64()),
        }))

    def test_known_crossing(self, ray_session, tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_revenue_pareto)

        # revenues 50, 25, 15, 10 (total 100): descending prefix hits
        # 80% (=80) at the third customer (50+25=75 < 80; +15=90 >= 80)
        sf = self._sf(tmp_sf, {1: [50.0], 2: [25.0],
                               3: [15.0], 4: [10.0]})
        out = q_revenue_pareto(sf).to_pandas()
        assert int(out["customers_total"].iloc[0]) == 4
        assert int(out["customers_80pct"].iloc[0]) == 3
        assert int(out["revenue_cents"].iloc[0]) == 10000

    def test_exact_boundary_counts_the_crossing_row(self, ray_session,
                                                    tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_revenue_pareto)

        # 60 + 20 == 80 exactly: inclusive-cum >= threshold rule keeps
        # the second customer as the crossing (cum 60 < 80, 80 >= 80)
        sf = self._sf(tmp_sf, {1: [60.0], 2: [20.0], 3: [20.0]})
        out = q_revenue_pareto(sf).to_pandas()
        assert int(out["customers_80pct"].iloc[0]) == 2

    def test_single_customer(self, ray_session, tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_revenue_pareto)

        sf = self._sf(tmp_sf, {7: [10.0, 20.0]})
        out = q_revenue_pareto(sf).to_pandas()
        assert int(out["customers_total"].iloc[0]) == 1
        assert int(out["customers_80pct"].iloc[0]) == 1


class TestBenfordEdges:
    def test_absent_digits_emit_no_rows(self, ray_session, tmp_sf):
        from modernsearchengines_ray.pipelines.driver_queries import (
            q_benford_prices)

        # all prices lead with 1 or 2 (in cents); sub-cent row dropped
        sf = tmp_sf("lineitem", pa.table({
            "l_extendedprice": pa.array(
                [1.00, 12.34, 2.50, 0.005], pa.float64()),
        }))
        out = q_benford_prices(sf).to_pandas()
        assert sorted(out["digit"].tolist()) == [1, 2]
        assert int(out["n"].sum()) == 3
        assert float(out["observed_p"].sum()) == pytest.approx(1.0)
