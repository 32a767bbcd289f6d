#!/usr/bin/env python3
"""Noise-immune bench regression check (round-13 item #7).

Wall-clock on this host swings 16-20% with I/O weather; the plan-shape
metrics Bench captures per query (task count, shuffle read/write bytes)
are deterministic properties of plan + data. A CODE regression moves
them; host noise does not. Usage:

    python3 tools/compare_plan_metrics.py BENCH_OUT.json BENCH_LAST.json

Exit 1 if any query's task count or shuffle bytes moved more than the
tolerance (tasks: +-20%% or +-8 absolute, whichever is larger, AQE
coalescing wiggles a few tasks; shuffle bytes: +-25%% or 4 MiB) —
each flagged query names the metric and both values.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f).get("plan_metrics", {})


def main(base_path, cur_path):
    base, cur = load(base_path), load(cur_path)
    if not base or not cur:
        print(f"no plan_metrics in {'both' if not base and not cur else base_path if not base else cur_path} - "
              "re-run Bench (it captures them in the warm-up pass)")
        return 2
    flagged = []
    for q in sorted(set(base) & set(cur)):
        b, c = base[q], cur[q]
        dt = abs(c["tasks"] - b["tasks"])
        if dt > max(8, 0.2 * b["tasks"]):
            flagged.append(f"{q}: tasks {b['tasks']} -> {c['tasks']}")
        for k in ("shuffle_read", "shuffle_write"):
            db = abs(c[k] - b[k])
            if db > max(4 << 20, 0.25 * b[k]):
                flagged.append(f"{q}: {k} {b[k]} -> {c[k]}")
    missing = sorted(set(base) - set(cur))
    extra = sorted(set(cur) - set(base))
    if missing:
        print(f"queries only in baseline: {missing}")
    if extra:
        print(f"queries only in current: {extra}")
    if flagged:
        print(f"{len(flagged)} plan-shape moves (code change, not host noise):")
        for f in flagged:
            print(" ", f)
        return 1
    print(f"plan shapes stable across {len(set(base) & set(cur))} queries")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
