"""Skew mitigation: salted equi-join.

AQE's skew-join splitter handles moderate skew after the fact; salting
handles it by construction when one join key dominates (the classic
hot-row problem: one user/orderkey holds 1% of a 10^12-row fact table, so
one shuffle partition gets 10^10 rows while the rest idle).

The transform: spread the fact side's identical keys across ``salts``
sub-keys with a deterministic hash of row-identity columns, replicate the
dim side once per sub-key, and equi-join on (key, salt).  Join output is
IDENTICAL to the unsalted join — the salt is an internal partitioning
detail — which makes the operator oracle-checkable against the plain SQL
join.  Cost: the dim side shuffles ``salts``× its size; use it when
dim ≪ fact (the only regime where key skew hurts anyway).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_cm_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: List[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``fact_key = dim_key``, spreading
    each fact key over ``salts`` shuffle sub-partitions.

    ``salt_on``: fact columns that identify a row (or at least distribute
    within a key group) — the salt is ``xxhash64(salt_on) mod salts``, so
    the same row always lands on the same sub-key (deterministic retries,
    no rand()).  ``how`` supports 'inner' and 'left' — the fact side keeps
    exactly one salt per row, so left semantics survive salting.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salts < 1:
        # salts=0 would silently drop every dim row (empty explode) and
        # NULL every fact salt (pmod by zero) — a wrong answer, not an error
        raise ValueError(f"salts must be >= 1, got {salts}")
    if SALT_COL in fact.columns or SALT_COL in dim.columns:
        # withColumn would silently overwrite the caller's column and the
        # final drop would remove it — losing user data, not just renaming
        raise ValueError(
            f"input already carries reserved column {SALT_COL!r}; "
            "rename it before calling salted_join"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(salts))
    salted_fact = fact.withColumn(SALT_COL, salt)
    replicated_dim = dim.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salts)])),
    )
    cond = (salted_fact[fact_key] == replicated_dim[dim_key]) & (
        salted_fact[SALT_COL] == replicated_dim[SALT_COL]
    )
    out = salted_fact.join(replicated_dim, cond, how)
    return out.drop(SALT_COL)
