#!/usr/bin/env python
"""Dump .explain("formatted") for named catalog queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX key1,key2,...
Writes OUTDIR/<key>_<SUFFIX>.txt for each key. Planning only — nothing
executes. SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    outdir, suffix, keys_csv = sys.argv[1], sys.argv[2], sys.argv[3]
    keys = [k for k in keys_csv.split(",") if k]
    os.makedirs(outdir, exist_ok=True)
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from knot_another_pipeline_spark.catalog_queries import QUERIES
    from knot_another_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for k in keys:
        df = QUERIES[k](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
