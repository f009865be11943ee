#!/usr/bin/env python3
"""Dev tool: per-query scaling ratio between two bench_full.json-style
artifacts (e.g. sf0.1 official vs a generated-sf1 run).

Usage: python3 tools/scale_ratio.py <small.json> <big.json> [data_ratio]

Prints queries sorted by time ratio big/small (descending), flagging
anything whose ratio exceeds the data-size ratio (default 10) — at a
10x data step, a well-partitioned scan/agg/join should scale at most
~linearly in data size; super-linear queries are the scale bugs the
sf1 rung exists to surface. Sub-second small-side times are noisy:
ratios computed against a 0.05 s floor so a 0.02->0.4 s query doesn't
read as a 20x blowup.
"""
import json, sys

def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    floor = 0.05
    sq, bq = small["queries"], big["queries"]
    rows = []
    for k in sorted(bq):
        if k not in sq:
            continue
        s, b = max(sq[k], floor), bq[k]
        rows.append((b / s, sq[k], bq[k], k))
    rows.sort(reverse=True)
    n_flag = 0
    print(f"{'ratio':>7} {'small_s':>8} {'big_s':>8}  query")
    for r, s, b, k in rows:
        flag = " <== SUPER-LINEAR" if r > data_ratio else ""
        if flag:
            n_flag += 1
        print(f"{r:7.2f} {s:8.3f} {b:8.3f}  {k}{flag}")
    ts, tb = small.get("value"), big.get("value")
    print(f"\ntotals: small {ts:.1f}s big {tb:.1f}s overall ratio "
          f"{tb/ts:.2f} (data ratio {data_ratio:g})")
    print(f"{n_flag} queries exceed the data ratio")
    sys.exit(0)

if __name__ == "__main__":
    main()
