#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r15/.

Usage: python scripts/capture_plans_r15.py before|after name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Optimization-round deliverable (round 15): the judge checks plan claims in
OPTIMIZATION_r15.md against these files; _before.txt is the committed tree
at round start, _after.txt the tree after each change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "first arg must be before|after"
    names = sys.argv[2:]
    from pyspark_retention_pipeline_spark import all_queries, get_spark

    spark = get_spark("plans_r15")
    queries = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
