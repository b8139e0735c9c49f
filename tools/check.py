#!/usr/bin/env python3
"""Local pre-verification loop mimicking the driver's correctness gate:
run graft.Verify output (parquet per query) against each oracleSql in
DuckDB over the same lake dir, and compare values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single-file tables; ScaleUp-generated
        # lakes are Spark-written DIRECTORIES named <t>.parquet
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t_q = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
            # Driver-hasher parity gate: DuckDB types bare integer-sum
            # output columns HUGEINT, which the driver canonicalizes
            # differently from Spark's BIGINT even when values are
            # identical (q_packing_plan r4, q_ship_priority r8). Python's
            # str() hides the difference, so compare declared types, not
            # values: any HUGEINT/UHUGEINT oracle output column is a
            # guaranteed future driver hash-mismatch -> hard FAIL here.
            otypes = con.execute(f"DESCRIBE {sql}").fetchall()
            hug = [r[0] for r in otypes
                   if "HUGEINT" in str(r[1]).upper()]
            if hug:
                print(f"FAIL {name}: oracle outputs HUGEINT column(s) "
                      f"{hug} — wrap in CAST(... AS BIGINT)")
                n_fail += 1
                continue
            # Softer observability: surface any oracle-vs-spark declared
            # type mismatch (DECIMAL width drift etc.) without failing —
            # value compare below still decides pass/fail. Compared
            # POSITIONALLY under the same name-sort the hash compare uses,
            # so duplicate output column names don't collapse (a dict
            # keyed by name would keep only the last duplicate's type).
            stypes = sorted((r[0], str(r[1]).upper()) for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall())
            otypes_sorted = sorted((r[0], str(r[1]).upper()) for r in otypes)
            if len(stypes) == len(otypes_sorted):
                for (scol, st), (ocol, ot) in zip(stypes, otypes_sorted):
                    if scol == ocol and st != ot:
                        print(f"TYPEWARN {name}.{scol}: spark {st} "
                              f"vs oracle {ot}")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        g = sorted(tuple(canon(r[i]) for i in gi) for r in got)
        w = sorted(tuple(canon(r[i]) for i in wi) for r in want)
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
        elif g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            extra = f" rows {len(g)} vs {len(w)}" if len(g) != len(w) else ""
            print(f"FAIL {name}: values differ{extra}; first diffs: {diff}")
            n_fail += 1
        else:
            dt = time.time() - t_q
            # a slow oracle is a correctness-gate hazard (the round-10
            # lesson: DuckDB CTE inlining blew the driver's compare
            # budget) -- surface it here before the driver pays for it
            slow = f"  SLOWORACLE {dt:.1f}s" if dt > 10 else ""
            print(f"PASS {name} ({len(g)} rows){slow}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
