"""profile_columns semantics beyond the SQL gate: nulls, empties, HLL
tier accuracy, and mode validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from modernsearchengines_ray.stages.profile import profile_columns


def _run(df, columns, **kw):
    import ray.data as rd

    return profile_columns(rd.from_pandas(df), columns, **kw).to_pandas()


class TestProfileColumns:
    def test_nulls_and_minmax(self, ray_session):
        df = pd.DataFrame({
            "a": [1.0, None, 3.0, None, -2.5],
            "b": [7, 7, 7, 7, 7],
        })
        out = _run(df, ["a", "b"]).set_index("column")
        assert out.loc["a", "n_rows"] == 5
        assert out.loc["a", "n_nulls"] == 2
        assert out.loc["a", "min_val"] == -2.5
        assert out.loc["a", "max_val"] == 3.0
        assert out.loc["a", "n_distinct"] == 3
        assert out.loc["b", "n_nulls"] == 0
        assert out.loc["b", "n_distinct"] == 1

    def test_all_null_column(self, ray_session):
        df = pd.DataFrame({"a": pd.array([None, None], dtype="Float64")})
        out = _run(df, ["a"]).iloc[0]
        assert out["n_rows"] == 2 and out["n_nulls"] == 2
        assert np.isnan(out["min_val"]) and np.isnan(out["max_val"])
        assert out["n_distinct"] == 0

    def test_empty_table(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"a": pa.array([], pa.float64())}))
        out = profile_columns(ds, ["a"]).to_pandas().iloc[0]
        assert out["n_rows"] == 0
        assert np.isnan(out["min_val"])

    def test_hll_tier_within_error_band(self, ray_session):
        rng = np.random.RandomState(5)
        df = pd.DataFrame({"a": rng.randint(0, 4000, 20000).astype(float)})
        exact = _run(df, ["a"], distinct="exact").iloc[0]["n_distinct"]
        approx = _run(df, ["a"], distinct="hll").iloc[0]["n_distinct"]
        assert abs(approx - exact) / exact < 0.05

    def test_none_tier_and_bad_mode(self, ray_session):
        df = pd.DataFrame({"a": [1.0, 2.0]})
        out = _run(df, ["a"], distinct="none").iloc[0]
        assert out["n_distinct"] == -1
        with pytest.raises(ValueError, match="distinct"):
            _run(df, ["a"], distinct="bogus")


class TestEmptyHllTier:
    def test_empty_input_hll_matches_exact(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"a": pa.array([], pa.float64())}))
        exact = profile_columns(ds, ["a"], distinct="exact") \
            .to_pandas().iloc[0]["n_distinct"]
        hll = profile_columns(ds, ["a"], distinct="hll") \
            .to_pandas().iloc[0]["n_distinct"]
        assert exact == hll == 0
