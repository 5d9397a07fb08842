"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB over the same parquet tables at
sf0.001, compare row counts, column names, and order-insensitive values.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(value):
    if value is None:
        return "<null>"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    return str(value)


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(_canon(row[i]) for i in order) for row in rows
    )


ALL_QUERIES = sorted(entry_mod.queries().keys())
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    builder = entry_mod.queries()[name]
    sdf = builder(spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracle = ORACLES.get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak mode)
        return

    result = duck.execute(oracle)
    duck_cols = [d[0] for d in result.description]
    duck_rows = result.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert _row_set(spark_rows, spark_cols) == _row_set(duck_rows, duck_cols), (
        f"{name}: value mismatch"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "total_score", "vector_score", "keyword_score"]
