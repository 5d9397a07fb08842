"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid-search query at sf0.001;
``queries()`` exposes the full operator inventory from SURVEY.md §2 over the
driver's synthetic tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every deterministic entry (rows-only entries omit the oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chessmate_spark.plans.queries import QUERIES, oracle_sql_map, query_map

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's hybrid /query pipeline (filter → embedding
    join → cosine + keyword blend → top-k) on the sf0.001 tables."""
    builder, _oracle = QUERIES["hybrid_search_documents"]
    return builder(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
