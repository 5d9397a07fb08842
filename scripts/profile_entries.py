"""Per-entry job/phase profiler (round 14's method, promoted to a
script): for each named entry, run the builder + collect once, then
split the wall-clock into

    build  = time from builder() start to first Spark job submission
    jobs   = sum of job durations (REST /api/v1/applications/<id>/jobs)
    gaps   = wall - build - jobs  (driver think-time between jobs:
             plan analysis per action, Py4J chatter, result handling)

and report the job count.  This separates task-bound entries (jobs
dominates) from driver/planning-bound ones (build+gaps dominates) —
guide §1/§7.3.  One warm-up entry runs first so session/codegen
startup is not charged to the first profiled entry.

Usage: python scripts/profile_entries.py entry [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chessmate_spark.session import get_spark  # noqa: E402
from chessmate_spark.plans.queries import QUERIES  # noqa: E402


def _jobs(ui: str, app: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_entries")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    # warm-up (bench.py's): big-table count + worker-pool fork
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 128, 1, 32).mapInPandas(lambda it: it, "id long").count()

    for name in names:
        seen = {j["jobId"] for j in _jobs(ui, app)}
        builder, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = builder(spark, sf_dir)
        df.collect()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        mine = [j for j in _jobs(ui, app) if j["jobId"] not in seen]
        def _ms(j):
            from datetime import datetime
            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
            try:
                a = datetime.strptime(j["submissionTime"], fmt)
                b = datetime.strptime(j["completionTime"], fmt)
                return (b - a).total_seconds()
            except (KeyError, ValueError):
                return 0.0
        job_s = sum(_ms(j) for j in mine)
        first_sub = None
        if mine:
            from datetime import datetime
            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
            subs = []
            for j in mine:
                try:
                    subs.append(datetime.strptime(j["submissionTime"], fmt))
                except (KeyError, ValueError):
                    pass
            first_sub = min(subs) if subs else None
        print(
            json.dumps(
                {
                    "entry": name,
                    "wall_s": round(wall, 3),
                    "n_jobs": len(mine),
                    "jobs_s": round(job_s, 3),
                    "driver_s": round(wall - job_s, 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
