"""stages/diff.py — dataset reconciliation."""

from __future__ import annotations

import pyarrow as pa


def _diff(ray_session, left_rows, right_rows, nparts=4):
    import ray.data as rd

    from modernsearchengines_ray.stages.diff import dataset_diff

    def tbl(rows):
        return pa.table({
            "doc_id": pa.array([k for k, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        })

    ds = dataset_diff(rd.from_arrow(tbl(left_rows)),
                      rd.from_arrow(tbl(right_rows)),
                      "doc_id", "text", num_partitions=nparts)
    # the Dataset schema stays typed even when empty; Ray's
    # to_pandas() drops columns on a fully-empty dataset, so go
    # through take_all for the dict view
    assert ds.schema().names == ["doc_id", "status"]
    return {r["doc_id"]: r["status"] for r in ds.take_all()}


class TestDatasetDiff:
    def test_added_removed_changed(self, ray_session):
        got = _diff(ray_session,
                    [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
                    [(2, "b"), (3, "X"), (4, "d"), (5, "e")])
        assert got == {1: "removed", 3: "changed", 5: "added"}

    def test_identical_sides_empty_diff(self, ray_session):
        rows = [(i, f"t{i}") for i in range(20)]
        assert _diff(ray_session, rows, rows) == {}

    def test_disjoint_sides(self, ray_session):
        got = _diff(ray_session, [(1, "a")], [(2, "b")])
        assert got == {1: "removed", 2: "added"}

    def test_bytes_payload(self, ray_session):
        import ray.data as rd

        from modernsearchengines_ray.stages.diff import dataset_diff

        def tbl(rows):
            return pa.table({
                "doc_id": pa.array([k for k, _ in rows], pa.int64()),
                "blob": pa.array([b for _, b in rows], pa.binary()),
            })

        out = dataset_diff(
            rd.from_arrow(tbl([(1, b"\x00\x01"), (2, b"zz")])),
            rd.from_arrow(tbl([(1, b"\x00\x02"), (2, b"zz")])),
            "doc_id", "blob", num_partitions=2).to_pandas()
        assert dict(zip(out["doc_id"], out["status"])) == {1: "changed"}
