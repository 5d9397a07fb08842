"""CDC MERGE (lakehouse upsert): apply an insert/update/delete change
batch to a target snapshot — the `MERGE INTO` semantics Delta/Iceberg
expose, built from one join.

Reference parity: the reference's player upsert (services/ingest) is the
insert-if-absent special case (SURVEY §2.3 J6); this is the general
three-way form a warehouse sync needs.

Scale shape: ONE equi-join on the merge key.  In production the change
batch is orders of magnitude smaller than the target, so the join
broadcasts (AQE decides; a LEFT join from target plus a broadcast
anti-join union would hard-code the same thing) — the target is scanned
once and never shuffled.  The apply is pure column CASE logic; no
windows, no state.

Semantics (strict clause matching, like SQL MERGE):
  * matched  + op='delete'  → row dropped
  * matched  + op='update'  → change columns replace target columns
  * unmatched + op='insert' → row added
  * change rows that match nothing (update/delete of a missing key) are
    ignored; target rows with no change pass through unchanged.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_merge(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    value_cols: List[str] | None = None,
) -> DataFrame:
    """Apply ``changes`` (key, op, value columns) to ``target`` (key,
    value columns); returns the post-merge snapshot with the target's
    column set.

    ``value_cols`` defaults to every non-key target column also present
    in the change batch.  Change columns not in the target are ignored;
    target columns absent from the change batch carry NULL on inserts.
    """
    if value_cols is None:
        value_cols = [
            c
            for c in target.columns
            if c != key and c in changes.columns
        ]
    t = target.alias("t")
    c = changes.alias("c")
    joined = t.join(c, F.col(f"t.{key}") == F.col(f"c.{key}"), "full_outer")
    op = F.col(f"c.{op_col}")
    matched = F.col(f"t.{key}").isNotNull()
    keep = (
        # target rows survive everything except a matched delete (an
        # 'insert' whose key already exists fires no clause: the target
        # row passes through unchanged, like SQL MERGE)
        (matched & (op.isNull() | (op != "delete")))
        # inserts of genuinely new keys
        | (~matched & (op == "insert"))
    )
    out_cols = [F.coalesce(F.col(f"t.{key}"), F.col(f"c.{key}")).alias(key)]
    for col in target.columns:
        if col == key:
            continue
        if col in value_cols:
            out_cols.append(
                F.when(
                    matched & (op == "update"), F.col(f"c.{col}")
                )
                .when(~matched & (op == "insert"), F.col(f"c.{col}"))
                .otherwise(F.col(f"t.{col}"))
                .alias(col)
            )
        else:
            out_cols.append(F.col(f"t.{col}").alias(col))
    return joined.filter(keep).select(*out_cols)
