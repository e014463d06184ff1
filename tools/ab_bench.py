#!/usr/bin/env python3
"""Quiet A/B bench bisect: two git refs, one query slice, alternating runs.

The protocol that resolved the r11 "dedup-family regression" (SCALE.md,
round 12): run `graft.Bench <queries>` ALTERNATING between two checkouts
(A B A B ...), N runs per version, then compare per-query ranges. If the
ranges OVERLAP, no code delta survives the noise floor — the drift was
measurement variance / suite composition, not a regression. Promoted to
a tool (VERDICT r12 #8) so every future drift triage is one command:

    python3 tools/ab_bench.py <refA> <refB> q_dedup_semantic q_entropy_filter
        [--runs 4] [--sf /root/testdata/sf0.1] [--cpus 32] [--json out.json]

Each ref runs from its own `git worktree` (HEAD may be used directly when
the working tree is clean and the ref resolves to it). Bench itself times
min-of-2 passes per run; the harness adds nothing to the timed path — it
only orchestrates and parses the final JSON line. The verdict per query:

  - OVERLAP:  [minA, maxA] and [minB, maxB] intersect -> no delta beyond
              noise at this run count.
  - DISJOINT: ranges separated -> a real delta; the midpoint gap and
              direction are reported.

Exit code 0 always (this is a measurement, not a gate); read the verdict.
With --runs 1 every range is a single point and "disjoint" is vacuous —
use the default 4 (or more) for a meaningful envelope; the r12 bisect
measured this family's floor at ±25-35% for sub-3-second walls.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd=REPO, env=None, capture=False):
    return subprocess.run(cmd, cwd=cwd, env=env, check=True,
                          stdout=subprocess.PIPE if capture else None,
                          stderr=subprocess.STDOUT if capture else None,
                          text=True)


def resolve(ref):
    return sh(["git", "rev-parse", ref], capture=True).stdout.strip()


def make_worktree(ref, tmproot):
    """Check the ref out into a throwaway worktree; returns its path."""
    path = os.path.join(tmproot, "ab_" + resolve(ref)[:12])
    if not os.path.isdir(path):
        sh(["git", "worktree", "add", "--detach", path, ref])
    return path


def bench_once(workdir, queries, sf, cpus):
    """One graft.Bench invocation; returns the parsed final-JSON line."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=str(cpus))
    out = sh(["sbt", "-batch", "runMain graft.Bench " + " ".join(queries)],
             cwd=workdir, env=env, capture=True).stdout
    for line in reversed(out.splitlines()):
        line = line.removeprefix("[info] ").strip()
        if line.startswith('{"metric":"total"'):
            return json.loads(line)
    sys.exit(f"no bench JSON line from {workdir}\n--- tail ---\n" +
             "\n".join(out.splitlines()[-30:]))


def ranges(samples):
    """{query: [walls...]} -> {query: (min, max)} (errors excluded)."""
    out = {}
    for run in samples:
        for q, sec in run["queries"].items():
            if sec >= 0:
                out.setdefault(q, []).append(sec)
    return {q: (min(v), max(v)) for q, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("refA")
    ap.add_argument("refB")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=4, help="runs per version")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--json", help="write the full verdict JSON here")
    args = ap.parse_args()

    tmproot = tempfile.mkdtemp(prefix="graft-ab-")
    wts = {}
    try:
        for ref in (args.refA, args.refB):
            wts[ref] = make_worktree(ref, tmproot)
            # Build once up front so compile time never lands mid-sequence.
            sh(["sbt", "-batch", "compile"], cwd=wts[ref], capture=True)

        samples = {args.refA: [], args.refB: []}
        load0 = os.getloadavg()[0]
        for i in range(args.runs):
            # Strict alternation: a monotone disturbance (thermal ramp,
            # background job) contaminates both versions equally.
            for ref in (args.refA, args.refB):
                r = bench_once(wts[ref], args.queries, args.sf, args.cpus)
                samples[ref].append(r)
                print(f"run {i + 1}/{args.runs} {ref}: total={r['value']}s "
                      f"load_max={r.get('load_avg_max')}", flush=True)

        ra, rb = ranges(samples[args.refA]), ranges(samples[args.refB])
        verdict = {}
        for q in sorted(set(ra) | set(rb)):
            if q not in ra or q not in rb:
                verdict[q] = {"verdict": "missing-in-one-version"}
                continue
            (a0, a1), (b0, b1) = ra[q], rb[q]
            overlap = a0 <= b1 and b0 <= a1
            mid_a, mid_b = (a0 + a1) / 2, (b0 + b1) / 2
            verdict[q] = {
                "rangeA": [a0, a1], "rangeB": [b0, b1],
                "verdict": "overlap" if overlap else "disjoint",
                "delta_pct": round((mid_b - mid_a) / mid_a * 100, 1),
            }
        result = {
            "refA": args.refA, "refB": args.refB,
            "runs_per_version": args.runs, "sf": args.sf,
            "load_avg_before": load0, "load_avg_after": os.getloadavg()[0],
            "queries": verdict,
            "disjoint": sorted(q for q, v in verdict.items()
                               if v["verdict"] == "disjoint"),
        }
        print(json.dumps(result, indent=2))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(result, f, indent=2)
        if result["disjoint"]:
            print(f"\nREAL DELTA in: {', '.join(result['disjoint'])} "
                  "(ranges disjoint; sign of delta_pct gives direction "
                  "B vs A)")
        else:
            print("\nNO DELTA beyond noise: every per-query range overlaps.")
    finally:
        for path in wts.values():
            subprocess.run(["git", "worktree", "remove", "--force", path],
                           cwd=REPO)


if __name__ == "__main__":
    main()
