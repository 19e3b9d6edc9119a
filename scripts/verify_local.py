#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/verify_local.py <out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet result (written by graft.Verify), runs the
corresponding oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the
<sf_dir> parquet corpus, sorts columns by name / rows by all columns, and
compares values. Reports per-query PASS/FAIL.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    import numpy as np
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 9)
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(norm(x) for x in v.tolist()) + "]"
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def canon(df):
    # Mimic the DRIVER's harness exactly: sort_values runs on the RAW
    # columns first (so a top-level ndarray/struct column raises
    # "unhashable type" here, same as in CORRECTNESS_r*), then normalize.
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        df[c] = [norm(v) for v in df[c]]
    return df


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for col in got.columns:
            a = list(got[col])
            b = list(want[col])
            if a != b:
                bad = next(i for i in range(len(a)) if a[i] != b[i])
                mismatch = f"col {col} row {bad}: got {a[bad]} want {b[bad]}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
