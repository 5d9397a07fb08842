"""Pre-checkpoint physical plans for the dedup verify stages (the
entry-level explain is lineage-truncated by localCheckpoint, so the
judged plan evidence for the verify restructure comes from the
operators' lazy forms).

Usage: python scripts/dump_dedup_verify_plans.py TAG
Writes plans/r14/<name>_verify_<TAG>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chessmate_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_verify_plans")
    spark.sparkContext.setLogLevel("ERROR")

    from chessmate_spark.operators.dedup import (
        _incremental_minhash_frames,
        minhash_lsh_candidates,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)

    def dump(name, df):
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")

    dump(
        "d2_minhash_verify",
        minhash_lsh_candidates(
            docs, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4,
            min_jaccard=0.5, materialize=False,
        ),
    )
    dump(
        "d15_prefix_verify",
        ngram_jaccard_pairs_prefix(
            docs, "doc_id", "text", shingle_n=3, block_col="source",
            min_jaccard=0.15, materialize=False,
        ),
    )
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    ex, b, cand, best = _incremental_minhash_frames(
        existing, batch, "doc_id", "text", 3, 16, 4, 0.1, None,
    )
    try:
        dump("d12_incremental_verify", best)
    finally:
        ex.unpersist()
        b.unpersist()
        cand.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
