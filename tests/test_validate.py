"""Validation-rule semantics on hand-built inputs (the SQL parity
gate runs in test_driver_queries): null handling per rule kind,
duplicate counting, rule ordering, and the O(rules) output contract."""

from __future__ import annotations

import pyarrow as pa

from modernsearchengines_ray.stages import validate as v


def _ds(tab: pa.Table, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(tab).repartition(blocks)


class TestValidate:
    def test_mixed_rules_and_null_semantics(self, ray_session):
        tab = pa.table({
            "id": pa.array([1, 2, 2, 3, 3, 3], pa.int64()),
            "txt": pa.array(["a", None, "c", None, "e", "f"],
                            pa.string()),
            "n": pa.array([5, -1, None, 30, 100, 7], pa.int64()),
            "lang": pa.array(["en", "de", "zh", None, "es", "en"],
                             pa.string()),
        })
        out = v.validate(_ds(tab), [
            v.unique("id"),
            v.not_null("txt"),
            v.in_range("n", 0, 50),
            v.accepted_values("lang", ("en", "de")),
        ]).to_pandas()
        assert list(out["rule"]) == ["id_unique", "txt_not_null",
                                     "n_range", "lang_accepted"]
        # duplicates: 6 rows - 3 distinct ids = 3
        # nulls in txt: 2; range: -1 and 100 violate, null n does NOT
        # accepted: zh + es violate, null lang does NOT
        assert list(out["violations"]) == [3, 2, 2, 2]
        assert list(out["checked"]) == [6] * 4

    def test_clean_input_all_zero(self, ray_session):
        tab = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "x": pa.array([1.0, 2.0, 3.0], pa.float64()),
        })
        out = v.validate(_ds(tab, 2), [
            v.unique("id"), v.not_null("x"), v.in_range("x", 0, 10),
        ]).to_pandas()
        assert (out["violations"] == 0).all()

    def test_custom_names_and_order_preserved(self, ray_session):
        tab = pa.table({"a": pa.array([1, 1], pa.int64())})
        out = v.validate(_ds(tab, 1), [
            v.in_range("a", 5, 9, name="strict"),
            v.unique("a", name="no_dups"),
        ]).to_pandas()
        assert list(out["rule"]) == ["strict", "no_dups"]
        assert list(out["violations"]) == [2, 1]
