"""Declarative data-quality audit — the Deequ pattern (Schelter et al.
VLDB 2018, "Automating Large-Scale Data Quality Verification"), the
validation gate a production training pipeline runs BEFORE dedup or
training ever sees the data: completeness, uniqueness, accepted values,
ranges, and referential integrity, each as a named constraint with a
measured metric and a pass/fail verdict.

Scale shape (the reason Deequ itself is Spark-native): every row-local
constraint on one table compiles to ONE aggregate expression, so a
whole suite over a table is a single partial+final scan — adding a
constraint adds a column to the agg, never a scan; uniqueness rides the
same scan as an exact count-distinct (one extra expand exchange keyed
on the column, AQE-sized); referential integrity is a broadcast-or-
shuffle semi-join counted, never materialized.  The audit result is
CONSTANT-size (one row per constraint) regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One named row-local constraint: ``fraction`` is an aggregate
    Column producing the metric in [0, 1]; ``threshold`` is the minimum
    passing value (pass = metric >= threshold)."""

    name: str
    fraction: Column
    threshold: float = 1.0


def _frac(pred: Column) -> Column:
    """Fraction of rows satisfying ``pred`` — 0.0 on an empty table,
    and the sum is coalesced so an ALL-NULL predicate column (sum over
    no non-NULL inputs is NULL) also reports 0.0/fail instead of a
    NULL metric a ``passed == False`` gate would sail past (the audit
    must never fail OPEN via NULL)."""
    n = F.count(F.lit(1))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.coalesce(F.sum(pred.cast("bigint")), F.lit(0))
        .cast("double")
        / n
    )


def completeness(col: str, threshold: float = 1.0) -> Constraint:
    return Constraint(
        f"completeness({col})", _frac(F.col(col).isNotNull()), threshold
    )


def uniqueness(col: str, threshold: float = 1.0) -> Constraint:
    """Distinct fraction: count_distinct/count (Deequ's 'uniqueness' is
    value-level; this is the key-integrity form — 1.0 iff the column is
    a key).  NULLs count into the denominator but never the numerator,
    so a nullable 'key' can't pass by being empty."""
    n = F.count(F.lit(1))
    frac = F.when(n == 0, F.lit(0.0)).otherwise(
        F.count_distinct(F.col(col)).cast("double") / n
    )
    return Constraint(f"uniqueness({col})", frac, threshold)


def accepted_values(
    col: str, values: Sequence[str], threshold: float = 1.0
) -> Constraint:
    return Constraint(
        f"accepted_values({col})",
        _frac(F.col(col).isin(list(values))),
        threshold,
    )


def in_range(
    col: str, lo: float, hi: float, threshold: float = 1.0
) -> Constraint:
    return Constraint(
        f"in_range({col})",
        _frac(F.col(col).between(F.lit(lo), F.lit(hi))),
        threshold,
    )


def non_negative(col: str, threshold: float = 1.0) -> Constraint:
    return Constraint(
        f"non_negative({col})", _frac(F.col(col) >= 0), threshold
    )


def audit_table(
    df: DataFrame, table: str, constraints: Sequence[Constraint]
) -> DataFrame:
    """Run a constraint suite over ONE table in ONE scan: all metric
    expressions evaluate in a single agg; the one-row result unpivots to
    (constraint, metric, threshold, passed) long form driver-free (a
    constant-width projection + explode, no collect)."""
    if not constraints:
        raise ValueError("audit_table needs at least one constraint")
    agg = df.agg(
        *[c.fraction.alias(f"_m{i}") for i, c in enumerate(constraints)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(f"{table}.{c.name}").alias("constraint"),
                F.col(f"_m{i}").alias("metric"),
                F.lit(float(c.threshold)).alias("threshold"),
            )
            for i, c in enumerate(constraints)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("_c"))
        .select("_c.constraint", "_c.metric", "_c.threshold")
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
    )


def referential_integrity(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    child_table: str,
    parent_table: str,
    threshold: float = 1.0,
    broadcast_parent_keys: Optional[bool] = None,
) -> DataFrame:
    """Fraction of child rows whose foreign key exists in the parent —
    counted via LEFT SEMI join, never materializing the join.  NULL
    foreign keys fail the constraint (they reference nothing), matching
    the SQL semi-join semantics exactly.

    ``broadcast_parent_keys=None`` (default): no hint — Spark's own
    size estimate / AQE picks broadcast for small distinct-key sets and
    a shuffle semi-join past the threshold, so an auditor pointing this
    at a fact-sized parent cannot OOM the driver by default (round-8
    ADVICE: the old force-broadcast default was the unsafe posture).
    ``True``: force broadcast — the explicit opt-in for KNOWN
    dimension-sized parents where the caller wants the pinned
    no-shuffle plan.  ``False``: force the shuffle semi-join (the
    fact-parent posture, e.g. when statistics are missing and the size
    estimate would over-broadcast)."""
    keys = parent.select(F.col(pk).alias("_pk")).distinct()
    if broadcast_parent_keys is True:
        keys = F.broadcast(keys)
    elif broadcast_parent_keys is False:
        keys = keys.hint("shuffle_hash")
    total = child.agg(F.count(F.lit(1)).alias("_n"))
    matched = (
        child.join(keys, F.col(fk) == F.col("_pk"), "left_semi")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    name = f"{child_table}.referential({fk} -> {parent_table}.{pk})"
    metric = F.when(F.col("_n") == 0, F.lit(0.0)).otherwise(
        F.col("_m").cast("double") / F.col("_n")
    )
    return (
        total.crossJoin(matched)
        .select(
            F.lit(name).alias("constraint"),
            metric.alias("metric"),
            F.lit(float(threshold)).alias("threshold"),
        )
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
    )
