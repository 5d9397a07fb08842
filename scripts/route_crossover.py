#!/usr/bin/env python
"""Measure the regime where the past-broadcast ALTERNATE routes win
(round-9 verdict #1): d23's ``route="cells"`` (operators/dedup.py
semantic_decontaminate) and t25's ``route="bloom"`` (operators/
retrieval.py batch_bm25_retrieval) exist for an eval-set / query-frame
too big to broadcast — but every committed number so far measured them
only where broadcast wins.  This harness scales THE BROADCAST SIDE
(eval rows for d23, query terms for t25) at fixed corpus until the
broadcast route degrades, under a deliberately CAPPED worker JVM
(``spark.driver.memory`` — in local mode the driver heap is also the
executor heap, so the cap models a real cluster's per-executor memory
instead of letting a 128 GiB dev box hide the cliff).

Each (operator, scale, route) cell runs in its OWN subprocess with a
wall-clock budget; a cell that blows the budget or dies (OOM) is
recorded as such — that IS the measurement.  Results merge into
SCALE_SMOKE.json's ``route_crossover`` block, including the measured
crossover scale and the switch heuristic a user applies.

Usage:
    python scripts/route_crossover.py            # full ladder (slow)
    python scripts/route_crossover.py --worker cells 2000 broadcast
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DST = "/tmp/chessmate_sf1"
CLUSTERED_DST = "/tmp/chessmate_clustered"

# ladders: the broadcast side grows at fixed corpus (20k vectors / 50k
# docs at 10x).  d23's eval ladder follows the verdict's 200 -> 20k
# shape; t25's term ladder follows the mined-hard-negative shape that
# made 200k terms the round-9 point.
CELLS_EVAL_LADDER = [200, 2_000, 20_000]
BLOOM_TERM_LADDER = [1_000_000, 4_000_000, 16_000_000, 48_000_000]
CELL_BUDGET_SECS = 480
# local[16] + 6g heap ~ a 384 MiB-per-core executor — tight but
# realistic; the 128 GiB dev default would let a 1.6 GiB broadcast
# relation look free
WORKER_CORES = int(os.environ.get("ROUTE_XOVER_CORES", "16"))
WORKER_HEAP = os.environ.get("ROUTE_XOVER_HEAP", "4g")
DECONTAM_THRESHOLD = 0.35
DECONTAM_PROBE = 4  # the d23 recall ladder's 0.947 point
BLOOM_N_QUERIES = 2048


def _worker_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{WORKER_CORES}]")
        .appName("route_crossover_worker")
        .config("spark.driver.memory", WORKER_HEAP)
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _run_cells(eval_rows: int, route: str) -> dict:
    from pyspark.sql import functions as F

    from chessmate_spark.operators.dedup import semantic_decontaminate

    spark = _worker_session()
    # the CLUSTERED corpus (scale_smoke.build_clustered): cell routing
    # is a clustering bet — on the near-uniform synthetic vectors the
    # auto-sized cells overlap so much that n_probe=4 sheds nothing
    # (measured: 307 s vs broadcast's 38 s at eval=2k, pure overhead),
    # which is the same worst case EXPLAIN.md documents for IVF.  The
    # crossover question only exists on the corpus shape the route is
    # for.
    emb = spark.read.parquet(
        f"{CLUSTERED_DST}/embeddings.parquet"
    ).select("vec_id", "embedding")
    n_corpus = emb.count()  # warm the scan outside the timed section
    # eval side: real corpus vectors under fresh ids, cycled past the
    # corpus size — every eval row has at least one exact train match,
    # so the flag workload is dense like a genuine benchmark scrub
    ev = (
        spark.range(eval_rows)
        .select(
            (F.col("id") + 1_000_000_000).alias("vec_id"),
            F.pmod(F.col("id"), F.lit(n_corpus)).alias("_k"),
        )
        .join(
            emb.select(F.col("vec_id").alias("_k"), "embedding"), "_k"
        )
        .select("vec_id", "embedding")
    )
    t0 = time.perf_counter()
    n = semantic_decontaminate(
        emb,
        ev,
        "vec_id",
        "embedding",
        DECONTAM_THRESHOLD,
        route=route,
        n_clusters=None,  # auto cell sizing (~79 cells at 20k rows)
        n_probe=DECONTAM_PROBE,
    ).count()
    return {"secs": round(time.perf_counter() - t0, 2), "rows": n}


def _run_bloom(miss_terms: int, route: str) -> dict:
    from pyspark.sql import functions as F

    from chessmate_spark.functions.text import tokenize_expr
    from chessmate_spark.operators.retrieval import batch_bm25_retrieval

    spark = _worker_session()
    docs = spark.read.parquet(f"{DST}/documents.parquet").select(
        "doc_id", "text"
    )
    arr = tokenize_expr(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    )
    # the scale_smoke bloom_route query shape: ~1/3 of the real corpus
    # vocabulary plus a parametric mined-miss majority (uppercase
    # prefix == provably absent from the lowercased posting terms) —
    # but UNLIKE the wall-gate probe, the frame CARRIES df (the t25
    # entry's own corpus-derived shape, trusted as-is).  This is the
    # shape where the routes genuinely diverge: without df the
    # broadcast route's inner join against the corpus df table sheds
    # every miss term BEFORE the explicit broadcast (so it never
    # outgrows memory no matter how many misses the frame carries);
    # WITH df there is no such join and the full term table ships —
    # the regime route='bloom' exists for, where the bitmap sheds the
    # misses instead
    true_terms = (
        docs.select(F.explode(F.array_distinct(arr)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .filter(
            F.pmod(F.xxhash64(F.lit("pick"), F.col("term")), F.lit(3)) == 0
        )
    )
    miss = spark.range(miss_terms).select(
        F.concat(F.lit("MISSTERM"), F.col("id").cast("string")).alias(
            "term"
        ),
        F.lit(1).cast("bigint").alias("df"),  # matches no posting row
    )
    qterms = true_terms.unionByName(miss).select(
        F.pmod(
            F.xxhash64(F.lit("route"), F.col("term")),
            F.lit(BLOOM_N_QUERIES),
        ).cast("bigint").alias("query_id"),
        "term",
        "df",
    )
    t0 = time.perf_counter()
    n = batch_bm25_retrieval(docs, qterms, k=5, route=route).count()
    return {"secs": round(time.perf_counter() - t0, 2), "rows": n}


def _spawn(op: str, scale: int, route: str) -> dict:
    env = dict(os.environ)
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             op, str(scale), route],
            capture_output=True,
            text=True,
            timeout=CELL_BUDGET_SECS,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return {"status": f"timeout>{CELL_BUDGET_SECS}s"}
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        oom = any("OutOfMemory" in ln or "Java heap space" in ln
                  or "Not enough memory to build and broadcast" in ln
                  for ln in tail)
        return {
            "status": "oom" if oom else f"failed(rc={proc.returncode})",
            "wall_secs": round(time.perf_counter() - t0, 2),
        }
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out = json.loads(line)
            out["status"] = "ok"
            return out
        except (json.JSONDecodeError, ValueError):
            continue
    return {"status": "no-output"}


def main() -> int:
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        op, scale, route = sys.argv[2], int(sys.argv[3]), sys.argv[4]
        fn = _run_cells if op == "cells" else _run_bloom
        print(json.dumps(fn(scale, route)), flush=True)
        return 0

    if not os.path.exists(f"{DST}/embeddings.parquet"):
        print(f"10x corpus missing at {DST} — run scale_smoke first",
              file=sys.stderr)
        return 2
    if not os.path.exists(f"{CLUSTERED_DST}/embeddings.parquet"):
        print(f"clustered corpus missing at {CLUSTERED_DST} — run "
              "scale_smoke --ann-clustered first", file=sys.stderr)
        return 2

    block: dict = {
        "worker": f"local[{WORKER_CORES}] / {WORKER_HEAP} heap, "
                  f"budget {CELL_BUDGET_SECS}s per cell",
    }
    for op, ladder, alt in (
        ("cells", CELLS_EVAL_LADDER, "cells"),
        ("bloom", BLOOM_TERM_LADDER, "bloom"),
    ):
        rows = []
        crossover = None
        for scale in ladder:
            cell = {"scale": scale}
            for route in ("broadcast", alt):
                print(f"{op} scale={scale:,} route={route} ...",
                      flush=True)
                cell[route] = _spawn(op, scale, route)
                print(f"  -> {cell[route]}", flush=True)
            bc, al = cell["broadcast"], cell[alt]
            alt_wins = al.get("status") == "ok" and (
                bc.get("status") != "ok"
                or al["secs"] < bc["secs"]
            )
            if al.get("status") == "ok" and bc.get("status") == "ok":
                # identical output contract (exact for bloom; subset
                # for cells at partial probe, so compare bloom only)
                if op == "bloom" and al["rows"] != bc["rows"]:
                    cell["mismatch"] = True
            cell["alternate_wins"] = alt_wins
            if alt_wins and crossover is None:
                crossover = scale
            rows.append(cell)
        block[op] = {
            "ladder": rows,
            "crossover_scale": crossover,
            "heuristic": (
                f"switch to route='cells' once eval_rows reaches "
                f"~{crossover:,} against this 20k-vector CLUSTERED "
                "corpus (the broadcast crossJoin's eval_rows x "
                "corpus_rows cosine work outgrows the cell-pruned "
                "candidate set + k-means training; on a NEAR-UNIFORM "
                "corpus the cells shed nothing and broadcast stays "
                "right at every eval size)"
                if op == "cells" and crossover
                else (
                    "switch to route='bloom' once the distinct query-"
                    f"term table reaches ~{crossover:,} terms (the "
                    "broadcast hash relation stops fitting a "
                    "per-executor budget; the 128 KB bitmap always "
                    "fits)"
                    if crossover
                    else "no crossover observed in this ladder"
                )
            ),
        }
        if op == "cells":
            block[op]["corpus"] = (
                "clustered (scale_smoke.build_clustered), 20k vectors "
                "dim 64"
            )

    from scale_smoke import merge_smoke_block

    merge_smoke_block(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_SMOKE.json",
        ),
        "route_crossover",
        block,
        [],
        "crossover:",
    )
    print(json.dumps(block, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
