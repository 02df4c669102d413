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


def latest_rows() -> dict[str, tuple[int, dict]]:
    """key -> (round, row) of its most recent driver CORRECTNESS row."""
    latest: dict[str, tuple[int, dict]] = {}
    for path in tracked_correctness():
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for key, row in json.load(fh).items():
                if key not in latest or rnd > latest[key][0]:
                    latest[key] = (rnd, row)
    return latest


def latest_round() -> dict[str, int]:
    """key -> round number of its most recent driver CORRECTNESS row."""
    return {k: rnd for k, (rnd, _row) in latest_rows().items()}


def _row_green(row: dict) -> bool:
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and row.get("hash_match", True) is not False
        and not row.get("err")
    )


def stale_rotation() -> list[str]:
    """Gated keys: red-latest-row keys first, then stalest-first.

    A key whose most recent driver row is red (any of rows/schema/hash
    false, or an err) jumps the staleness queue — a red row must be
    re-gated the very next round so the fix's green row lands in the
    driver record (round-10's ``priority_linestatus`` is the motivating
    case).  Green keys follow ascending by latest-gated round, then
    name.
    """
    rows = latest_rows()
    return sorted(
        rows, key=lambda k: (_row_green(rows[k][1]), rows[k][0], k)
    )


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
