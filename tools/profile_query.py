#!/usr/bin/env python
"""Per-job wall profile of one or more registered queries.

Runs each query isolated (noop-style full materialization via the
bench's own action), then prints every Spark job's duration plus the
DRIVER GAPS between consecutive jobs — the quantity the UI hides and
where py4j/planning taxes live.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_query.py q [q ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nass_summary_spark.plans.queries import QUERIES  # noqa: E402
from nass_summary_spark.session import get_spark  # noqa: E402


def run(spark, name, sf_dir):
    sc = spark.sparkContext
    t = sc.statusTracker()
    before_ids = set(t.getJobIdsForGroup() or [])
    sc.setJobDescription(f"profile:{name}")
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    t_build = time.time() - t0
    # same action as bench.py so profiles decompose the bench number
    df.count()
    wall = time.time() - t0
    sc.setJobDescription(None)
    import json
    from urllib.request import urlopen

    ui = sc.uiWebUrl
    app = sc.applicationId
    jobs = json.load(urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))
    jobs = [j for j in jobs if j["jobId"] not in before_ids]
    jobs.sort(key=lambda j: j["jobId"])

    def ts(s):
        import datetime

        return datetime.datetime.strptime(
            s[:23], "%Y-%m-%dT%H:%M:%S.%f"
        ).timestamp()

    print(f"\n=== {name}: wall {wall:.2f}s (df-build {t_build:.2f}s, {len(jobs)} jobs)")
    prev_end = None
    tot_job, tot_gap = 0.0, 0.0
    for j in jobs:
        st, en = ts(j["submissionTime"]), ts(j["completionTime"])
        dur = en - st
        gap = (st - prev_end) if prev_end is not None else 0.0
        tot_job += dur
        tot_gap += max(gap, 0.0)
        ntask = j.get("numTasks")
        flag = " <<<" if dur > 0.4 or gap > 0.4 else ""
        print(
            f"  job {j['jobId']:>4} dur {dur:6.2f}s gap {gap:6.2f}s "
            f"tasks {ntask:>4}  {j.get('description') or j.get('name','')[:60]!s:.60}{flag}"
        )
        prev_end = en
    print(f"  total job {tot_job:.2f}s, inter-job gaps {tot_gap:.2f}s, wall {wall:.2f}s")


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # same scan-split configs as bench.py so profiles match the bench
    spark = get_spark(
        "profile",
        extra_configs={
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "1m",
            "spark.ui.retainedStages": "20000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same python-worker-pool warmup as bench.py so Arrow paths are clean
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for name in sys.argv[1:]:
        run(spark, name, sf_dir)
