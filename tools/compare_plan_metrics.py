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


def self_test():
    """Exercise the gate on a deliberately-regressed plan (round-14
    item: the gate must be shown to CATCH, not just to pass)."""
    import tempfile
    import os
    base = {"plan_metrics": {
        "q_ok": {"tasks": 100, "shuffle_read": 50 << 20, "shuffle_write": 10 << 20},
        "q_bad": {"tasks": 40, "shuffle_read": 8 << 20, "shuffle_write": 1 << 20},
    }}
    # q_bad lost a broadcast hint: tasks and shuffle bytes balloon far
    # past the AQE-wiggle tolerance; q_ok moves inside it
    cur = {"plan_metrics": {
        "q_ok": {"tasks": 104, "shuffle_read": 52 << 20, "shuffle_write": 10 << 20},
        "q_bad": {"tasks": 160, "shuffle_read": 900 << 20, "shuffle_write": 300 << 20},
    }}
    paths = []
    for doc in (base, cur):
        f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(doc, f)
        f.close()
        paths.append(f.name)
    try:
        rc = main(paths[0], paths[1])
        assert rc == 1, f"regressed plan must be flagged (exit {rc})"
        rc = main(paths[0], paths[0])
        assert rc == 0, f"identical plans must pass (exit {rc})"
    finally:
        for p in paths:
            os.unlink(p)
    print("self-test OK: regression flagged, stable pair passes")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--self-test":
        sys.exit(self_test())
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
