"""Small driver-built DataFrames via the Arrow path.

``spark.createDataFrame(list_of_tuples, schema)`` converts row-by-row
through Py4J — measured ~0.6 s for a 40-row LUT frame with 128-element
double arrays (round 14).  Routing the same rows through a pandas frame
rides Arrow (guide §6: Arrow for driver transfers) at ~3x less driver
time, with Spark's usual silent fallback to the row path when a type
cannot cross Arrow.  Use for SIMPLE schemas only (ints / doubles /
strings / flat arrays, no nulls in non-nullable slots): nested structs
and nullable ints do not round-trip pandas cleanly — keep those on the
tuple path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for small simple-typed row
    sets, routed through pandas so the conversion rides Arrow."""
    if not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd
    from pyspark.sql.types import StructType, _parse_datatype_string

    st = (
        schema
        if isinstance(schema, StructType)
        else _parse_datatype_string(schema)
    )
    pdf = pd.DataFrame(rows, columns=st.fieldNames())
    return spark.createDataFrame(pdf, st)
