"""Dump ``.explain("formatted")`` for declared queries to plans/<round>/.

Usage:
    python scripts/dump_plans.py TAG entry [entry ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<entry>_<TAG>.txt (default round
r15) for each entry (TAG = before|after).
The plan is built at $SPARK_GRAFT_SF_DIR (default sf0.1) on the bench
session config, WITHOUT executing the query — explain is plan-time.
Entries whose builders run driver-side work (multi-action lifecycles)
still produce the plan of their RETURNED frame; that is the judged
artifact.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chessmate_spark.session import get_spark  # noqa: E402
from chessmate_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        root, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        builder, _ = QUERIES[name]
        df = builder(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
