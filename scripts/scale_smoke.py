#!/usr/bin/env python
"""Scale smoke test: does each representative query scale ~linearly?

Synthesizes a ~10x copy of the sf0.1 tables (ids shifted per replica so
keys stay distinct and join/group cardinalities scale with the data) into
/tmp/chessmate_sf1, then times a representative query subset at both
scales and prints the time ratio.  A healthy distributed plan shows a
ratio near the data ratio (10x) or below; a quadratic operator (all-pairs
join, driver-side collect) would show ~100x and fails the check.

Usage: python scripts/scale_smoke.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chessmate_spark.plans.queries import QUERIES
from chessmate_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/chessmate_sf1"
REPLICAS = 10
# id-bearing columns to shift per replica (keeps keys distinct so distinct
# counts, join fanouts, and group cardinalities scale with the copies)
SHIFT = 10_000_000
ID_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": [],      # dims keep their keys: fact/dim ratio grows 10x
    "part": [],
    "nation": [],
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = {"supplier", "part", "nation", "region"}

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q18_large_orders",
    "j7_asof_join",
    "j10_salted_skew_join",
    "a10_user_sessions",
    "a11_percentiles",
    "t1_token_counts",
    "t5_sequence_pack",
    "d1_exact_dedup_groups",
    "d2_minhash_lsh_pairs",
    "d8_dup_clusters",
    "v6_lsh_ann",
    "v8_embedding_quantize",
]

RATIO_LIMIT = 30.0  # 10x data; allow 3x dispersion for fixed overheads


def build(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE_v2")):
        return
    os.makedirs(DST, exist_ok=True)
    for table, id_cols in ID_COLS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        if table in DIMS:
            out = df
        else:
            copies = []
            for i in range(REPLICAS):
                c = df
                for col in id_cols:
                    c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
                # perturb CONTENT per replica too: identical text/vectors
                # across replicas would make near-dup pair counts grow
                # ~REPLICAS^2 (every dup cluster cross-links all copies),
                # turning a linear operator into a quadratic-looking one
                if table == "documents":
                    c = c.withColumn(
                        "text",
                        F.concat(
                            F.coalesce(F.col("text"), F.lit("")),
                            F.lit(f" replica{i} tag{i} salt{i}"),
                        ),
                    )
                elif table == "embeddings":
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            F.col("embedding"),
                            lambda x: (x + F.lit(i * 0.01)).cast("float"),
                        ),
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(f"built {table}", flush=True)
    open(os.path.join(DST, "_DONE_v2"), "w").write("ok\n")


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="chessmate_scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    spark.read.parquet(f"{DST}/lineitem.parquet").count()  # warm
    spark.range(0, 128, 1, 32).mapInPandas(lambda it: it, "id long").count()

    failures = []
    print(f"{'query':32s} {'sf0.1':>8s} {'sf~1':>8s} {'ratio':>7s}")
    for name in names:
        builder, _ = QUERIES[name]
        t0 = time.perf_counter()
        builder(spark, SRC).collect()
        small = time.perf_counter() - t0
        t0 = time.perf_counter()
        builder(spark, DST).collect()
        big = time.perf_counter() - t0
        ratio = big / max(small, 1e-9)
        flag = ""
        if ratio > RATIO_LIMIT:
            failures.append(name)
            flag = "  <-- SUPERLINEAR"
        print(f"{name:32s} {small:8.2f} {big:8.2f} {ratio:7.1f}{flag}",
              flush=True)
    if failures:
        print(f"FAIL: superlinear scaling in {failures}")
        return 1
    print("OK: all ratios within linear-scaling bounds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
