#!/usr/bin/env python
"""Round-16 stage attribution: run one registry query with the Spark UI
enabled and dump per-stage wall/task stats from the REST API — the
guide §7.1 empirical loop for queries whose wall needs attributing.

Usage: python scripts/exp_stage_attr_r16.py <query_name> [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName(f"attr-{name}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from pyspark_retention_pipeline_spark.registry import all_queries

    qs = all_queries()
    walls = []
    for rep in range(reps):
        spark.sparkContext.setJobDescription(f"{name}-rep{rep}")
        df = qs[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    print(f"walls: {[round(w, 3) for w in walls]}", flush=True)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    # keep stages from the LAST rep's jobs (warmest)
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    last_job_ids = {
        j["jobId"]
        for j in jobs
        if (j.get("description") or "").startswith(f"{name}-rep{reps - 1}")
    }
    last_stage_ids = set()
    for j in jobs:
        if j["jobId"] in last_job_ids:
            last_stage_ids.update(j.get("stageIds", []))
    rows = []
    for s in stages:
        if s["stageId"] not in last_stage_ids:
            continue
        dur = 0.0
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t1 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t2 = datetime.strptime(s["completionTime"], fmt)
            dur = (t2 - t1).total_seconds()
        rows.append(
            (
                s["stageId"],
                dur,
                s["numCompleteTasks"],
                round(s.get("executorRunTime", 0) / 1000.0, 3),
                s["name"].split("\n")[0][:60],
            )
        )
    rows.sort(key=lambda r: -r[1])
    print("stageId,wall_s,tasks,executorRunTime_s,name", flush=True)
    for r in rows:
        print(f"{r[0]},{r[1]:.3f},{r[2]},{r[3]},{r[4]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
