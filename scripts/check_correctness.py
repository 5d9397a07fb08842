"""Local mirror of the driver's correctness gate.

Runs selected ``queries()`` entries on a VANILLA SparkSession (no session.py
confs — exactly like the driver harness) and compares against the DuckDB
``oracle_sql()`` at sf0.01.

Usage:
    python scripts/check_correctness.py [entry ...]     # default: all
    SPARK_GRAFT_CHECK_SF_DIR=/root/testdata/sf0.001 python scripts/check_correctness.py

Round checklist (round 10+): run the FULL sweep at all three committed
scale factors before closing a round — sf0.01 (the driver gate's sf;
artifact CORRECTNESS_full_r{N}.json), sf0.1 (CORRECTNESS_sf01_r{N}.json),
and sf0.001 (CORRECTNESS_sf0001_r{N}.json).  One tiny sf cannot catch
scale-sensitive regressions (dial regimes engaging, partition-order
effects, overflow); the small sf catches the opposite failure mode
(fixture-starved dials, e.g. v11's nprobe floor).  Every entry is
expected to hash-match at ALL THREE since the round-10 dial-scaling work
(lsh_plan_for routing, pq_operating_point ladder, d13 probe count) — an
approximate entry going red at exactly one sf means a dial regime
shifted, and the fix belongs in the corpus-scaled dial, not the oracle.
Set SPARK_GRAFT_CHECK_OUT to write the artifact.  (The entry count
grows with the inventory — compare against len(queries()), not a
hardcoded number.)
"""

from __future__ import annotations

import json
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(value):
    if value is None:
        return "<null>"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    return str(value)


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(row[i]) for i in order) for row in rows)


def main() -> int:
    names = sys.argv[1:] or sorted(entry_mod.queries().keys())

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("correctness_check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    failed = []
    for name in names:
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = queries[name](spark, SF_DIR)
            spark_cols = list(sdf.columns)
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
            oracle = oracles.get(name)
            if oracle is None:
                rec["err"] = "no_oracle"
            else:
                res = con.execute(oracle)
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                rec["oracle_rows"] = len(duck_rows)
                rec["rows_match"] = len(spark_rows) == len(duck_rows)
                rec["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
                rec["hash_match"] = (
                    _row_set(spark_rows, spark_cols)
                    == _row_set(duck_rows, duck_cols)
                )
                if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]):
                    failed.append(name)
        except Exception:
            rec["err"] = traceback.format_exc()
            failed.append(name)
        results[name] = rec
        status = ("ERR" if rec["err"] and rec["err"] != "no_oracle"
                  else "no_oracle" if rec["err"] == "no_oracle"
                  else "PASS" if name not in failed else "FAIL")
        print(f"{name}: {status} (spark={rec['spark_rows']} oracle={rec['oracle_rows']})")

    out_path = os.environ.get(
        "SPARK_GRAFT_CHECK_OUT", "/tmp/correctness_local.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; details: {out_path}")
    if failed:
        print("FAILED:", ", ".join(failed))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
