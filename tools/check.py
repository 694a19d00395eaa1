#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB with the sf tables
registered as views, and compares: schema (column names), row count, and
values (rows sorted by all columns, column order normalized by name).
Dev-only tooling — the shipped Scala library has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(
            round(v, 9) if isinstance(v, float) else v for v in row))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    # optional 3rd arg: '--subset' — only then may output dirs be absent
    # (graft.Verify <sf> <out> <names> runs). On a FULL run a missing dir
    # means the query CRASHED in Verify and must FAIL, not skip.
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    subset = len(sys.argv) > 3 and sys.argv[3] == "--subset"
    con = duckdb.connect()
    # pin the oracle environment in the output: a hash divergence that
    # reproduces nowhere locally (round 9's q109/q115) is usually an
    # engine-version or float-policy delta, and the artifact should say
    # which engine produced the expected values
    try:  # setting name varies across DuckDB versions
        fp = con.execute(
            "SELECT current_setting('ieee_floating_point_ops')").fetchone()[0]
    except Exception:
        fp = "n/a"
    print(f"oracle: duckdb {duckdb.__version__}, "
          f"ieee_floating_point_ops={fp}, python {sys.version.split()[0]}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import os
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if subset:
                continue
            print(f"FAIL {name}: no output written (query crashed in Verify?)")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        # normalize column order by name
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = canon([tuple(r[i] for i in gperm) for r in got_rows])
        e = canon([tuple(r[i] for i in eperm) for r in exp_rows])
        if g != e:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad[0]}:\n  got {bad[1]}\n  exp {bad[2]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
