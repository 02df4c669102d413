#!/usr/bin/env python
"""Verify (default) or regenerate (--write) the committed plan-shape
ledger ``tools/plan_shapes.json``: for every catalog query, the number
of shuffle exchanges (hash / range / single-partition) and broadcast
exchanges in its initial physical plan at sf0.001.

The ledger turns every shuffle optimization ever won (fuzzy_match's
FastSS join, the chi-squared margin rewrite, negative_samples'
global_rank re-route, ...) into a pinned invariant:
``tests/test_driver_contract.py`` fails any query whose shuffle count
GROWS vs the ledger, and flags drift in either direction so the ledger
is regenerated deliberately, never silently.

Counts are stable because the environment is pinned (Spark version,
configs, sf0.001 fixtures) and the initial AQE plan does not depend on
runtime statistics.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "tools", "plan_shapes.json")
SF = "/root/testdata/sf0.001"


def plan_shape(df) -> dict[str, int]:
    """Exchange census of a DataFrame's initial physical plan."""
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    # Word-boundary match: "BroadcastExchange ..." and "ReusedExchange
    # ..." must NOT count as shuffles (a bare substring count overstated
    # the shuffle column for every query with a broadcast join).
    broadcasts = len(re.findall(r"(?<![A-Za-z])BroadcastExchange ", plan))
    shuffles = len(re.findall(r"(?<![A-Za-z])Exchange ", plan))
    single = len(re.findall(r"(?<![A-Za-z])Exchange SinglePartition", plan))
    return {
        "shuffles": shuffles,
        "broadcasts": broadcasts,
        "single_partition": single,
    }


def current_shapes() -> dict[str, dict[str, int]]:
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from knot_another_pipeline_spark.catalog_queries import QUERIES
    from knot_another_pipeline_spark.session import get_spark

    spark = get_spark()
    return {
        name: plan_shape(QUERIES[name](spark, SF)) for name in sorted(QUERIES)
    }


def main() -> None:
    shapes = current_shapes()
    if "--write" in sys.argv[1:]:
        with open(LEDGER, "w") as fh:
            json.dump(shapes, fh, indent=1, sort_keys=True)
        print(f"wrote {len(shapes)} plan shapes to {LEDGER}")
        return
    with open(LEDGER) as fh:
        recorded = json.load(fh)
    drift = {
        k: (recorded.get(k), v)
        for k, v in shapes.items()
        if recorded.get(k) != v
    }
    missing = sorted(set(recorded) - set(shapes))
    if drift or missing:
        raise SystemExit(
            f"plan shapes drifted (run `python tools/plan_shapes.py "
            f"--write` if deliberate): drift={drift} removed={missing}"
        )
    print(f"{len(shapes)} plan shapes match the ledger")


if __name__ == "__main__":
    main()
