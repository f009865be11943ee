#!/usr/bin/env python3
"""Dev tool: budgeted per-query oracle sweep for a scale rung.

Runs tools/compare.py one query at a time under a wall-clock budget
(the DuckDB side of some oracles is definitionally super-linear — the
recursive-CTE / brute-LSH anchors), recording ok / FAIL / SKIP(budget).

Usage:
  python3 tools/rung_sweep.py <sfDir> <verifyOutDir> <budget_s> <query...>

Writes one line per query to stdout; exit 1 iff any FAIL (budget skips
are not failures — they are documented oracle-cost ceilings).
"""
import subprocess, sys, time

def main():
    sf_dir, out_dir, budget = sys.argv[1], sys.argv[2], float(sys.argv[3])
    queries = sys.argv[4:]
    n_pass = n_fail = n_skip = 0
    for q in queries:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "tools/compare.py", sf_dir, out_dir, q],
                capture_output=True, text=True, timeout=budget)
            dt = time.time() - t0
            line = (r.stdout.strip().splitlines() or ["(no output)"])[0]
            if r.returncode == 0:
                print(f"{line}  [{dt:.1f}s]"); n_pass += 1
            else:
                # on FAIL keep the full compare.py output (mismatch
                # detail is on later stdout lines; a traceback is on
                # stderr) — first-line-only lost it from the artifact
                detail = r.stdout.strip()
                if r.stderr.strip():
                    detail += ("\n--- stderr ---\n" + r.stderr.strip())
                print(f"{detail or '(no output)'}  [{dt:.1f}s]"); n_fail += 1
        except subprocess.TimeoutExpired:
            print(f"SKIP(oracle>{budget:.0f}s) {q}"); n_skip += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} budget-skip")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
