"""README artifact-derived numbers must match the artifacts (VERDICT r6
task #5 — the third round in a row a hand-written README count drifted;
this makes the class unrecreatable)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

from tools.readme_stats import README, expected_values, render  # noqa: E402


def test_readme_numbers_match_artifacts():
    with open(README) as fh:
        text = fh.read()
    regenerated = render(text, expected_values())
    assert regenerated == text, (
        "README numbers drifted from the artifacts — run "
        "`python tools/readme_stats.py --write`"
    )
