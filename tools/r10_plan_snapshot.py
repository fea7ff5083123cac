#!/usr/bin/env python
"""Snapshot `.explain("formatted")` plans for the r10 optimization
round into plans/r10/<query>_<tag>.txt (tag = before/after), so every
optimization's plan claim is checkable against a committed artifact.

Usage: python tools/r10_plan_snapshot.py <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nass_summary_spark.plans.queries import QUERIES  # noqa: E402
from nass_summary_spark.session import get_spark  # noqa: E402

if __name__ == "__main__":
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r10",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r10_plan_snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
