"""As-of and range joins — operators Spark lacks natively, composed from
built-in ops with scale-honest shuffle shapes.

As-of join (kdb aj / DuckDB ASOF JOIN / pandas merge_asof): each left row
matches the LATEST right row at-or-before its timestamp, per key.
Composition: tag + union both sides, one window pass per key carries the
most recent right payload forward, filter back to left rows.  ONE shuffle
on the key, one within-partition sort — the same cost as a sort-merge
join, with no inequality-join fallback to nested loops.

Range join (point-in-interval): equi-join on a bucketized range domain —
each interval explodes into the buckets it covers, each point probes its
bucket, exact BETWEEN filters the candidates.  Candidate volume is
|points| + Σ interval_width/bucket_width instead of |points|×|intervals|,
which is what keeps it off BroadcastNestedLoopJoin at scale.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: List[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[List[str]] = None,
    asof_ts_col: str = "asof_ts",
    how: str = "left",
) -> DataFrame:
    """For each left row: the latest right row with ``right_ts <=
    left_ts`` within the same ``by`` group (ties: the right row counts).

    Returns the left columns + ``asof_ts_col`` + ``right_cols`` (null when
    no right row precedes — or the row dropped when ``how='inner'``).

    The matched right row's timestamp and payload travel as ONE struct
    through ``last(..., ignorenulls=True)``, so a right row whose payload
    column is legitimately NULL yields NULL for that column (never an
    older row's value).  Right rows sharing (key, ts) resolve to the
    greatest payload tuple — a stable, documented rule rather than
    partition-order luck.
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in by and c != right_ts
        ]
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    payload_type = StructType(
        [StructField("_ts", rtypes[right_ts])]
        + [StructField(c, rtypes[c]) for c in right_cols]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_is_left"),
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(payload_type).alias("_payload"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c)
          for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.lit(0).alias("_is_left"),
        F.col(right_ts).alias("_t"),
        F.struct(
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("_payload"),
    ).select(*l_tag.columns)  # align column order for the union
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal _t so <= semantics hold;
    # _payload breaks ties among right rows deterministically
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("_t").asc(),
            F.col("_is_left").asc(),
            F.col("_payload").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_is_left"),
        F.last("_payload", ignorenulls=True).over(w).alias("_carried"),
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        F.col("_carried._ts").alias(asof_ts_col),
        *[F.col(f"_carried.{c}").alias(c) for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col(asof_ts_col).isNotNull())
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    interval: str,
) -> DataFrame:
    """Inner join of right rows landing in ``[left_ts, left_ts +
    interval)`` per key (the j9 / stream-stream time-band shape).

    One equi-join shuffle on the key carries the non-equi time band as a
    post-join filter — never a nested-loop join.  SQL three-valued logic
    applies: NULL keys and NULL timestamps match nothing.  ``interval``
    is a Spark interval literal body, e.g. ``"30 MINUTES"``.
    """
    band = (F.col(right_ts) >= F.col(left_ts)) & (
        F.col(right_ts) < F.col(left_ts) + F.expr(f"INTERVAL {interval}")
    )
    return left.join(
        right, (F.col(left_key) == F.col(right_key)) & band
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of points to every interval containing them, via
    bucketized equi-join + exact BETWEEN verify.  ``bucket_width`` trades
    interval fan-out against candidate width — pick ~ the median interval
    length."""
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                F.floor(F.col(hi_col) / F.lit(bucket_width)),
            )
        ),
    )
    return (
        p.join(i, "_bucket")
        .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bucket")
    )
