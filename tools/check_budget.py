#!/usr/bin/env python3
"""Budgeted per-query oracle compare for the large-SF sweeps: wraps
tools/check.py one query at a time under a wall-clock timeout, so the
near-dup family's quadratic DuckDB replays surface as TIMEOUT instead
of stalling the whole sweep (the r10 empty-artifact failure mode).

Usage: python3 tools/check_budget.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import json, os, subprocess, sys, time

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if d.startswith("q_") and d in oracle and
                   os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_to = 0
    failures, timeouts = [], []
    for name in names:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "check.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=budget)
            out = r.stdout.strip().splitlines()
            verdict = next((l for l in out if l.startswith(("PASS", "FAIL"))),
                           "FAIL <no output>")
            if verdict.startswith("PASS"):
                n_pass += 1
            else:
                n_fail += 1
                failures.append(name)
            print(f"{verdict}  [{time.time() - t0:.1f}s]", flush=True)
        except subprocess.TimeoutExpired:
            n_to += 1
            timeouts.append(name)
            print(f"TIMEOUT {name} after {budget}s", flush=True)
    print(f"== {n_pass} pass / {n_fail} fail / {n_to} timeout ==")
    if failures:
        print("failures:", ", ".join(failures))
    if timeouts:
        print("timeouts:", ", ".join(timeouts))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
