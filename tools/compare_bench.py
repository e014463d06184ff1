#!/usr/bin/env python3
"""Compare two bench_full records: per-query ratio vs a linear-scale
expectation.

Usage: compare_bench.py <base.json> <scaled.json> [data_factor]

For the sf1 record (data_factor=10), a query at data_factor x base time
scaled linearly; the round's investigation gate is ratio > 2x LINEAR
(i.e. > 2*data_factor x base wall). Most queries should land well under
linear (constant per-query overheads amortize); the known
output-quadratic floors (q_ann_brute) are expected above it.
"""
import json
import sys

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

bq, sq = base["queries"], scaled["queries"]
common = sorted(set(bq) & set(sq), key=lambda n: -sq[n])
print(f"base   total {base['value']:8.1f}s n={base['n']} "
      f"load {base.get('load_avg_start')}→{base.get('load_avg_max')}")
print(f"scaled total {scaled['value']:8.1f}s n={scaled['n']} "
      f"load {scaled.get('load_avg_start')}→{scaled.get('load_avg_max')}")
print(f"{'query':34s} {'base':>8s} {'scaled':>8s} {'ratio':>7s}  flag(>2x-linear)")
flagged = []
for n in common:
    b, s = bq[n], sq[n]
    if b < 0 or s < 0:
        print(f"{n:34s} {b:8.3f} {s:8.3f}    ERR")
        continue
    r = s / b if b > 0.001 else float("inf")
    flag = "  <<< SUPER-LINEAR" if s > 2 * factor * b and s - factor * b > 1.0 else ""
    if flag:
        flagged.append((n, b, s, r))
    if s > 1.0 or flag:
        print(f"{n:34s} {b:8.3f} {s:8.3f} {r:6.1f}x{flag}")
missing = sorted(set(sq) - set(bq))
if missing:
    print("only in scaled:", ", ".join(missing))
errs = {k: v for k, v in list(base.get("errors", {}).items()) +
        list(scaled.get("errors", {}).items())}
if errs:
    print("ERRORS:", errs)
print(f"\n{len(flagged)} queries above 2x-linear "
      f"(and >1s over linear): {[f[0] for f in flagged]}")
