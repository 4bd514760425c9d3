"""Global dense-numbering semantics (stages/rank.py) on hand-built
inputs: multi-block correctness vs a local sort, mixed sort
directions, string keys, the unique-key contract, and empty input.
The SQL parity gate (vocab_build) runs in test_driver_queries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from modernsearchengines_ray.stages.rank import global_row_number


def _run(tab: pa.Table, cols, descending=False, blocks=8):
    import ray.data as rd

    ds = rd.from_arrow(tab).repartition(blocks)
    out = global_row_number(ds, cols, descending=descending)
    return out.to_pandas().sort_values("row_number",
                                       ignore_index=True)


class TestGlobalRowNumber:
    def test_matches_local_sort_many_blocks(self, ray_session):
        rng = np.random.default_rng(11)
        vals = rng.permutation(5000).astype(np.int64)
        tab = pa.table({"v": pa.array(vals, pa.int64())})
        got = _run(tab, ["v"])
        assert list(got["row_number"]) == list(range(1, 5001))
        assert list(got["v"]) == sorted(vals.tolist())

    def test_descending_with_string_tiebreak(self, ray_session):
        tab = pa.table({
            "n": pa.array([3, 1, 3, 2, 1], pa.int64()),
            "t": pa.array(["b", "d", "a", "c", "e"], pa.string()),
        })
        got = _run(tab, ["n", "t"], descending=[True, False],
                   blocks=3)
        want = pd.DataFrame({
            "n": [3, 3, 2, 1, 1],
            "t": ["a", "b", "c", "d", "e"],
            "row_number": [1, 2, 3, 4, 5],
        })
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_block_count_invariance(self, ray_session):
        rng = np.random.default_rng(5)
        tab = pa.table({
            "v": pa.array(rng.permutation(999).astype(np.int64)),
        })
        a = _run(tab, ["v"], blocks=1)
        b = _run(tab, ["v"], blocks=13)
        pd.testing.assert_frame_equal(a, b)

    def test_empty_input(self, ray_session):
        import ray.data as rd

        tab = pa.table({"v": pa.array([], pa.int64())})
        out = global_row_number(rd.from_arrow(tab), ["v"])
        assert out.count() == 0
        # typed result even when empty (Dataset.to_pandas drops the
        # schema of an empty dataset, so assert on the dataset)
        assert "row_number" in out.schema().names


class TestGlobalRunningSum:
    def _run(self, tab, blocks, **kw):
        import ray.data as rd

        from modernsearchengines_ray.stages.rank import (
            global_running_sum)

        out = global_running_sum(
            rd.from_arrow(tab).repartition(blocks), ["k"], "v",
            out_col="run", **kw)
        return out.to_pandas().sort_values("k",
                                           ignore_index=True)

    def test_matches_sequential_cumsum(self, ray_session):
        rng = np.random.default_rng(11)
        k = rng.permutation(777).astype(np.int64)
        v = rng.integers(0, 100, 777).astype(np.int64)
        tab = pa.table({"k": k, "v": v})
        got = self._run(tab, blocks=9)
        order = np.argsort(k)
        want_excl = np.cumsum(v[order]) - v[order]
        assert np.array_equal(got["run"].to_numpy(), want_excl)

        got_incl = self._run(tab, blocks=9, exclusive=False)
        assert np.array_equal(got_incl["run"].to_numpy(),
                              np.cumsum(v[order]))

    def test_block_count_invariance(self, ray_session):
        rng = np.random.default_rng(13)
        tab = pa.table({
            "k": pa.array(rng.permutation(500).astype(np.int64)),
            "v": pa.array(rng.integers(1, 9, 500).astype(np.int64)),
        })
        a = self._run(tab, blocks=1)
        b = self._run(tab, blocks=17)
        pd.testing.assert_frame_equal(a, b)

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.rank import (
            global_running_sum)

        tab = pa.table({"k": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64())})
        out = global_running_sum(rd.from_arrow(tab), ["k"], "v")
        assert out.count() == 0
        assert "run_sum" in out.schema().names
