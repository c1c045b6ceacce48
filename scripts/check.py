#!/usr/bin/env python3
"""Local correctness checker mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py [sfDir] [outDir]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
(or runs it with --run). For each query: load the Spark parquet result and
the DuckDB oracle result, sort columns by name, sort rows, compare values.
"""
import json
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", check=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Reconcile against Verify's self-audit record (round 11+): a query
    # that threw leaves no output directory, so without this the checker
    # would silently skip it — exactly the round-10 failure mode. Queries
    # WITHOUT an oracle entry are covered only by this marker.
    thrown = {}
    try:
        audit = json.load(open(f"{out_dir}/errors.json"))
        thrown = audit.get("errors", {})
        for name, err in sorted(thrown.items()):
            print(f"FAIL {name}: query threw: {err}")
            n_fail += 1
        if audit.get("n_written") != audit.get("n_selected"):
            print(f"AUDIT: only {audit.get('n_written')} of "
                  f"{audit.get('n_selected')} selected queries wrote output "
                  f"({audit.get('n_registered')} registered)")
    except FileNotFoundError:
        print("AUDIT: no errors.json — run Verify from round 11+ "
              "so failures cannot vanish silently")
    for name, sql in sorted(oracle.items()):
        if name in thrown:
            continue  # already reported from errors.json
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # value compare: exact on strings/ints; floats at 1e-9 relative
        # tolerance (identical-intent doubles can differ in the last ulp
        # at a rounding boundary when summation order differs)
        mismatch = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                import numpy as np
                if (pd.api.types.is_float_dtype(a) or
                        pd.api.types.is_float_dtype(b)):
                    af = a.astype(float).to_numpy()
                    bf = b.astype(float).to_numpy()
                    ok = pd.Series(
                        np.isclose(af, bf, rtol=1e-9, atol=1e-12) |
                        (pd.isnull(af) & pd.isnull(bf)))
                else:
                    ok = (a.astype(object).where(pd.notnull(a), None) ==
                          b.astype(object).where(pd.notnull(b), None))
            except Exception:
                ok = pd.Series([False] * len(a))
            bad = (~ok).to_numpy().nonzero()[0]
            if len(bad):
                i = bad[0]
                mismatch = f"col {c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} ({len(bad)} diffs)"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
