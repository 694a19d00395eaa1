#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB with the sf tables
registered as views, and compares: schema (column names), row count, and
values (rows sorted by all columns, column order normalized by name).
Dev-only tooling — the shipped Scala library has no Python dependency.

TYPE DISCIPLINE (round 19): value comparison alone is structurally blind
to the bug class that red-rowed r9 (DECIMAL) and r17/r18 (HUGEINT): Python
`123 == 123.0`, but the driver hashes a pandas/Arrow rendering where a
HUGEINT/DECIMAL column becomes float64 ("123.0" vs "123"). So this gate
additionally (a) LINTS every oracle_sql.json entry's bound result types —
any HUGEINT/UHUGEINT/DECIMAL column fails loudly even on subset runs, and
(b) fails when a got/exp column pair lands in different type classes
(int vs float vs string ...). An uncast `sum()` over BIGINT can no longer
pass locally and red at the driver.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB types the driver's Arrow/pandas hasher renders differently than
# the Spark dump (HUGEINT -> float64 "123.0"; DECIMAL -> Decimal/float
# renderings) — banned from oracle results outright.
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def type_class(t):
    """Coarse class a column type hashes as downstream: two columns in
    different classes WILL diverge under the driver even when Python
    values compare equal."""
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "CHAR", "BPCHAR"):
        return "str"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


def lint_oracle_types(con, oracle):
    """Bind (not execute) every oracle query and reject banned types."""
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
        except Exception as e:
            bad.append((name, "<bind>", f"bind error: {e}"))
            continue
        for col, t in zip(rel.columns, rel.types):
            ts = str(t).upper()
            if ts.startswith(BANNED_TYPES):
                bad.append((name, col, ts))
    for name, col, ts in bad:
        print(f"TYPELINT FAIL {name}: column '{col}' is {ts} — cast it "
              f"(driver hashes this type differently than the Spark dump)")
    return len(bad)


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
    # global type lint FIRST, over every oracle entry (binding only, so
    # it is cheap and runs even on --subset): the close-time guard the
    # r18 verdict asked for
    n_fail = lint_oracle_types(con, oracle)
    n_pass = 0
    import os
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if subset:
                continue
            print(f"FAIL {name}: no output written (query crashed in Verify?)")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got_types = [str(t).upper() for t in got_rel.types]
            got_rows = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp_types = [str(t).upper() for t in exp_rel.types]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        tmm = [(c, gt, et) for c, gt, et in zip(
                   sorted(got_cols),
                   [got_types[got_cols.index(c)] for c in sorted(got_cols)],
                   [exp_types[exp_cols.index(c)] for c in sorted(exp_cols)])
               if type_class(gt) != type_class(et)]
        if tmm:
            for c, gt, et in tmm:
                print(f"FAIL {name}: column '{c}' type class differs — "
                      f"got {gt} vs oracle {et} (driver would hash-red this)")
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
