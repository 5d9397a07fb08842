"""Top-k operators.

Global top-k (O2/O4) compiles to TakeOrderedAndProject — per-partition heaps
plus one merge, no global sort shuffle.  Grouped top-k uses a window with
row_number, which shuffles once on the group key; with AQE skewed groups are
split.  Always pass a total order (tiebreak column) for determinism
(SURVEY §7.3 'ordering ties').
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order_cols: List[Column], k: int) -> DataFrame:
    """O2/O4: global deterministic top-k."""
    return df.orderBy(*order_cols).limit(k)


def topk_per_group(
    df: DataFrame,
    group_cols: List[str],
    order_cols: List[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group (used by the k-NN join and per-query search)."""
    window = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(window))
        .filter(F.col(rank_col) <= k)
    )
