"""Vector similarity as JVM-side SQL expressions (zip_with + aggregate).

V2's cosine similarity (reference: repo_qdrant.ml:132-170, distance=Cosine
config.ml:97) expressed declaratively so Catalyst keeps it inside codegen —
no Python in the hot loop.  Accumulation is left-to-right in array index
order, giving a deterministic result for oracle hash-matching (SURVEY §7.3).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|); 0.0 when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(dot_product(a, b) / denom)


def query_vector_lit(vec: Sequence[float]) -> Column:
    """A driver-computed query vector as an array<double> literal column."""
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with pre-computed norms: dot(a,b)/(norm_a*norm_b).

    FP-identical to ``cosine_similarity`` (same operations, same order) but
    each side's norm is computed once per ROW instead of once per PAIR —
    3x fewer interpreted HOF aggregates inside pairwise joins.
    """
    denom = norm_a * norm_b
    return F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(dot_product(a, b) / denom)
