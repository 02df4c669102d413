#!/usr/bin/env python
"""Compare two full-catalog bench artifacts (BENCH_ALL_r*.json) and
print per-query regressions/improvements — the measured, committed
answer to "did this round make anything slower?".

Defaults to the two newest git-tracked artifacts.  Informational by
default (host noise moves single sub-second queries ±50% between
rounds; the SUM is the stable signal); pass ``--fail-over=PCT`` to exit
nonzero when any shared query slower than ``--floor`` seconds regresses
by more than PCT percent — useful as a local gate after a deliberate
perf change, not in CI.

Usage:
  python tools/bench_compare.py [OLD.json NEW.json]
      [--threshold=30] [--floor=0.5] [--fail-over=PCT]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tracked_bench_all() -> list[str]:
    try:
        out = subprocess.run(
            ["git", "ls-files", "BENCH_ALL_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        return sorted(os.path.join(REPO, rel) for rel in out)
    except (OSError, subprocess.CalledProcessError):
        return sorted(glob.glob(os.path.join(REPO, "BENCH_ALL_r*.json")))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("old", nargs="?")
    parser.add_argument("new", nargs="?")
    parser.add_argument("--threshold", type=float, default=30.0)
    parser.add_argument("--floor", type=float, default=0.5)
    parser.add_argument("--fail-over", type=float, default=None)
    args = parser.parse_args()

    if args.old and args.new:
        old_path, new_path = args.old, args.new
    else:
        arts = tracked_bench_all()
        if len(arts) < 2:
            raise SystemExit("need two BENCH_ALL_r*.json artifacts")
        old_path, new_path = arts[-2], arts[-1]

    with open(old_path) as fh:
        old = json.load(fh)["queries"]
    with open(new_path) as fh:
        new = json.load(fh)["queries"]

    shared = sorted(set(old) & set(new))
    t = args.threshold / 100.0
    # Both sides must clear --floor before a ratio is computed: a
    # rounded 0.0s entry in either artifact would otherwise divide by
    # zero, and sub-floor timings are noise anyway.
    comparable = [k for k in shared if min(old[k], new[k]) > args.floor]
    regressions = [
        (new[k] / old[k] - 1, k, old[k], new[k])
        for k in comparable
        if new[k] > old[k] * (1 + t)
    ]
    improvements = [
        (1 - new[k] / old[k], k, old[k], new[k])
        for k in comparable
        if old[k] > new[k] * (1 + t)
    ]
    print(
        f"{os.path.basename(old_path)} -> {os.path.basename(new_path)}: "
        f"{len(shared)} shared queries, "
        f"sum {sum(old[k] for k in shared):.1f}s -> "
        f"{sum(new[k] for k in shared):.1f}s"
    )
    for label, rows in (
        (f"regressions >{args.threshold:.0f}% (over {args.floor}s)",
         sorted(regressions, reverse=True)),
        (f"improvements >{args.threshold:.0f}% (over {args.floor}s)",
         sorted(improvements, reverse=True)),
    ):
        print(f"{label}: {len(rows)}")
        for pct, k, a, b in rows:
            print(f"  {k}: {a}s -> {b}s ({pct * 100:+.0f}%)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"new keys ({len(added)}): "
              + ", ".join(f"{k}={new[k]}s" for k in added))
    if removed:
        print(f"removed keys ({len(removed)}): " + ", ".join(removed))
    if args.fail_over is not None:
        bad = [r for r in regressions if r[0] * 100 > args.fail_over]
        if bad:
            raise SystemExit(
                f"{len(bad)} queries regressed more than {args.fail_over}%"
            )


if __name__ == "__main__":
    main()
