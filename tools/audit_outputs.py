#!/usr/bin/env python3
"""Vacuous-output audit over a graft.Verify dump: flags queries whose
results can pass the oracle while exercising nothing — 0 rows, constant
columns, or all-null columns. Pair with tools/check.py: the oracle proves
values match; this proves the interesting branches fired.

Usage: python3 tools/audit_outputs.py <verifyOutDir>
"""
import sys, glob, os
import duckdb


def main():
    out_dir = sys.argv[1]
    con = duckdb.connect()
    issues = []
    dirs = sorted(d for d in glob.glob(f"{out_dir}/q_*") if os.path.isdir(d))
    for d in dirs:
        name = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            issues.append(f"{name}: no output files")
            continue
        rel = f"read_parquet({files!r})"
        n = con.execute(f"SELECT count(*) FROM {rel}").fetchone()[0]
        if n == 0:
            issues.append(f"{name}: 0 rows")
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {rel}").fetchall()]
        for c in cols:
            try:
                dv, nulls = con.execute(
                    f'SELECT count(DISTINCT "{c}"), count(*) - count("{c}") FROM {rel}'
                ).fetchone()
            except Exception:
                continue  # non-comparable types (arrays etc.)
            if nulls == n:
                issues.append(f"{name}.{c}: entirely null ({n} rows)")
            elif n > 3 and dv <= 1:
                issues.append(
                    f"{name}.{c}: constant ({dv} distinct over {n} rows, {nulls} null)")
    print(f"audited {len(dirs)} query outputs")
    for i in issues:
        print("FLAG", i)
    print(f"== {len(issues)} flags ==")


if __name__ == "__main__":
    main()
