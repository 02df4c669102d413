#!/usr/bin/env python
"""Print the staleness-ordered driver-queue rotation (VERDICT r8 task #1).

After round 8 every catalog key has a driver CORRECTNESS row, so the
50-key gate window became a rolling regression gate: never-gated
additions first, then every gated key ascending by the round of its
LATEST row across the git-tracked ``CORRECTNESS_r*.json`` artifacts
(alphabetical within a round).  This script prints that rotation so
``__spark_entry__._STALE_ROTATION`` can be regenerated instead of
hand-edited; ``tests/test_driver_contract.py`` asserts the committed
list matches this computation.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tracked_correctness() -> list[str]:
    """Git-tracked CORRECTNESS artifacts only — the driver deposits the
    current round's file UNTRACKED after the final commit, and counting
    it would make the queue red-by-construction at every round boundary
    (the readme_stats.py pathology, VERDICT r8 What's-wrong #1)."""
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    except (OSError, subprocess.CalledProcessError):
        return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    return sorted(os.path.join(REPO, rel) for rel in out)


def latest_round() -> dict[str, int]:
    """key -> round number of its most recent driver CORRECTNESS row."""
    latest: dict[str, int] = {}
    for path in tracked_correctness():
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for key in json.load(fh):
                latest[key] = max(rnd, latest.get(key, 0))
    return latest


def stale_rotation() -> list[str]:
    """Gated keys, stalest first (ascending latest round, then name)."""
    latest = latest_round()
    return sorted(latest, key=lambda k: (latest[k], k))


def backlog() -> list[str]:
    """Never-driver-gated catalog keys, in catalog-dict order.

    Normally small (<= the 15-per-round cap), but the driver skipped
    its round-9 CORRECTNESS deposit, leaving all 55 round-9 keys
    ungated — so round 10 fills the whole 50-key window from this
    list (backlog-drain mode) instead of re-gating stale keys.
    """
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from knot_another_pipeline_spark.catalog_queries import QUERIES

    gated = set(latest_round())
    return [k for k in QUERIES if k not in gated]


if __name__ == "__main__":
    print("# backlog (never gated, catalog order):")
    for key in backlog():
        print(key)
    print("# stale rotation (gated, stalest first):")
    for key in stale_rotation():
        print(key)
