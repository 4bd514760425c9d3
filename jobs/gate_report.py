"""Builder-side FULL correctness gate (VERDICT r4 #4).

The driver's per-round CORRECTNESS snapshot caps at 50 of the ~190
``queries()`` entries, so the signal of record undercounts the suite.
This job runs the same side-by-side compare the driver runs — every
entry's Ray pipeline vs its ``oracle_sql()`` DuckDB query at sf0.01,
rows + schema + values (atol 1e-9 after sorting columns by name and
rows by value) — over ALL entries, and writes ``GATE_r{N}.json`` in
the driver's exact record format (``rows_match`` / ``schema_match`` /
``hash_match`` / ``spark_rows`` / ``oracle_rows`` / ``err``;
rows-only entries record ``err="no_oracle"`` with their row count,
matching the driver's weaker check).

Run from the repo root (workers import the package from cwd):

    python jobs/gate_report.py [--sf-dir /root/testdata/sf0.01]
                               [--out GATE_r05.json] [--only name,...]

Owns its Ray session (scripts own init/shutdown; the library and
``__ray_entry__`` never call ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result):
    import pandas as pd

    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def gate_entry(name: str, fn, sql: str | None, con, sf_dir: str) -> dict:
    import pandas as pd

    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        res = _to_pandas(fn(sf_dir))
        rec["spark_rows"] = int(len(res))
    except Exception as e:  # noqa: BLE001 — the report IS the handler
        rec["err"] = f"{type(e).__name__}: {e}"[:300]
        return rec
    if sql is None:
        rec["err"] = "no_oracle"
        return rec
    try:
        want = con.execute(sql).fetchdf()
        rec["oracle_rows"] = int(len(want))
    except Exception as e:  # noqa: BLE001
        rec["err"] = f"oracle: {type(e).__name__}: {e}"[:300]
        return rec
    a, b = _norm(res), _norm(want)
    rec["schema_match"] = list(a.columns) == list(b.columns)
    rec["rows_match"] = len(a) == len(b)
    if rec["schema_match"] and rec["rows_match"]:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          rtol=0, atol=1e-9)
            rec["hash_match"] = True
        except AssertionError as e:
            rec["hash_match"] = False
            rec["err"] = str(e).splitlines()[0][:300]
    else:
        rec["hash_match"] = False
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(REPO / "GATE_r05.json"))
    ap.add_argument("--only", default=None,
                    help="comma-separated entry names (default: all)")
    args = ap.parse_args()

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs, oracle = entry_mod.queries(), entry_mod.oracle_sql()
    names = sorted(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{args.sf_dir}/{t}.parquet'")

    report: dict[str, dict] = {}
    t0 = time.monotonic()
    n_pass = n_nooracle = n_fail = 0
    for i, name in enumerate(names, 1):
        t1 = time.monotonic()
        rec = gate_entry(name, qs[name], oracle.get(name), con,
                         args.sf_dir)
        rec["sec"] = round(time.monotonic() - t1, 2)
        report[name] = rec
        if rec["hash_match"]:
            n_pass += 1
            tag = "PASS"
        elif rec["err"] == "no_oracle":
            n_nooracle += 1
            tag = "NO_ORACLE"
        else:
            n_fail += 1
            tag = "FAIL"
        print(f"[{i}/{len(names)}] {name}: {tag} ({rec['sec']}s)",
              flush=True)

    summary = {
        "entries": len(names), "pass": n_pass,
        "no_oracle": n_nooracle, "fail": n_fail,
        "sf_dir": args.sf_dir,
        "total_sec": round(time.monotonic() - t0, 1),
    }
    Path(args.out).write_text(json.dumps(
        {"_summary": summary, **report}, indent=2) + "\n")
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
