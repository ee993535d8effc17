#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate (t2):
run graft.Verify first, then this script compares each Spark parquet dump
against its DuckDB oracle (columns sorted by name, rows sorted, exact
equality). Usage: tools/check.py [sfdir] [outdir] [--json artifact.json]

--json writes a driver-format correctness artifact (per-query
rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) — used to
record the standing 10x-stress gate (CORRECTNESS_stress_rN.json).
"""
import argparse
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sfdir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("outdir", nargs="?", default="/tmp/verify_out")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write the driver-format correctness artifact here")
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name prefixes to check (targeted re-runs)")
    ns = ap.parse_args()
    sfdir, outdir, json_out = ns.sfdir, ns.outdir, ns.json_out
    only = ns.only.split(",") if ns.only else None
    con = duckdb.connect()
    # out-of-core: an in-memory connection has NO temp_directory, so a big
    # oracle (dd8's closure at the 100x probe needed >100 GB resident)
    # aborts instead of spilling — give it a spill dir. Insertion-order
    # preservation buffers entire intermediates per operator (the 100x run
    # spilled >70 GB with it on); result order is irrelevant here (norm()
    # sorts before comparing), so turn it off.
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql("SET preserve_insertion_order=false")
    con.sql("SET memory_limit='90GB'")
    import os
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):  # spark-written table directory
            path += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = []
    # driver-format artifact rows (only meaningful with --json)
    record = {}

    def rec(name, rows_match, schema_match, hash_match, sr, orr, err=None):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": sr,
                        "oracle_rows": orr, "err": err}

    checked = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(p) for p in only):
            continue
        checked += 1
        sql = oracle[name]
        if not glob.glob(f"{outdir}/{name}/*.parquet"):
            print(f"{name}: FAIL missing spark output")
            fails.append(name)
            rec(name, False, False, False, 0, None, "missing spark output")
            continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        try:
            exp = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL oracle error: {e}")
            fails.append(name)
            rec(name, False, False, False, len(got), None, f"oracle error: {e}"[:200])
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name}: FAIL columns {list(g.columns)} vs {list(e.columns)}")
            fails.append(name)
            rec(name, len(g) == len(e), False, False, len(g), len(e))
            continue
        if [str(t) for t in g.dtypes] != [str(t) for t in e.dtypes]:
            print(f"{name}: WARN dtypes {dict(g.dtypes.astype(str))} vs {dict(e.dtypes.astype(str))}")
        if len(g) != len(e):
            print(f"{name}: FAIL rowcount {len(g)} vs {len(e)}")
            fails.append(name)
            rec(name, False, True, False, len(g), len(e))
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"{name}: OK ({len(g)} rows)")
            rec(name, True, True, True, len(g), len(e))
        except AssertionError as ex:
            msg = str(ex).split("\n")[0:6]
            print(f"{name}: FAIL values: " + " | ".join(msg))
            fails.append(name)
            rec(name, True, True, False, len(g), len(e))
    # rows-only queries (no oracle SQL): recorded in the artifact too, with
    # hash_match=null + rows_only=true, so the stress-gate JSON reports the
    # same coverage as the printed report instead of silently dropping them
    extra = sorted(set(p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if "/oracle_sql" not in p)
                   - set(oracle))
    if only:
        extra = [n for n in extra if any(n.startswith(p) for p in only)]
    for name in extra:
        try:
            n = con.sql(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
            print(f"{name}: rows-only ({n} rows)")
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": n,
                            "oracle_rows": None, "err": None, "rows_only": True}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: rows-only FAIL (no readable output: {e})")
            fails.append(name)
            record[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"no readable output: {e}"[:200],
                            "rows_only": True}
    print(f"\n{checked - len(fails)}/{checked} oracle queries OK")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(record)} queries)")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
