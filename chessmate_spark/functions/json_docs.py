"""F17: JSON result-document construction (`to_json(struct(...))`).

Every reference API response is a built JSON object with a fixed field
order and explicit nulls (chessmate_api.ml:77-115's ``to_json``: game
summary fields, scores, agent block).  Spark-side the document is ONE
``to_json`` expression — JVM codegen, no UDF — and the exact byte output
(field order, null policy, float repr) is oracle-checked against DuckDB's
``to_json``.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnLike = Union[Column, str]


def _col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def result_document(fields: Mapping[str, ColumnLike]) -> Column:
    """Build the response JSON for one result row.

    ``fields`` maps output field name → column, in emission order (the
    reference emits a fixed order; dict insertion order preserves it).
    Nulls are kept explicit (`"eco":null`), matching the reference's
    `Null emission rather than Spark's default field dropping.
    """
    struct = F.struct(*[_col(c).alias(name) for name, c in fields.items()])
    return F.to_json(struct, {"ignoreNullFields": "false"})


def attach_result_documents(
    df: DataFrame,
    fields: Mapping[str, ColumnLike],
    out_col: str = "document",
    keep: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Project id columns (``keep``) plus the built JSON document."""
    keep_cols = [F.col(c) for c in (keep or [])]
    return df.select(*keep_cols, result_document(fields).alias(out_col))
