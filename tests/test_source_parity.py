"""Source-format parity: operators are declarative over ANY source the
DataFrame reader supports — the same documents through parquet, CSV,
JSON, and ORC must produce identical operator output."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chessmate_spark.operators.textan import token_counts

SF_DIR = "/root/testdata/sf0.001"

DOCS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@pytest.fixture()
def doc_sources(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    csv_dir = str(tmp_path / "docs_csv")
    json_dir = str(tmp_path / "docs_json")
    orc_dir = str(tmp_path / "docs_orc")
    # escape/quote must round-trip arbitrary text through CSV
    docs.write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).option("escape", '"').csv(csv_dir)
    docs.write.mode("overwrite").json(json_dir)
    docs.write.mode("overwrite").orc(orc_dir)
    return {
        "parquet": docs,
        "csv": spark.read.schema(DOCS_DDL)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)  # texts with embedded newlines
        .csv(csv_dir),
        "json": spark.read.schema(DOCS_DDL).json(json_dir),
        "orc": spark.read.orc(orc_dir),
    }


def _rows(df):
    return sorted(
        tuple(str(v) for v in r)
        for r in token_counts(df, "doc_id", "text").collect()
    )


def test_token_counts_identical_across_sources(spark, doc_sources):
    base = _rows(doc_sources["parquet"])
    assert len(base) > 0
    assert _rows(doc_sources["csv"]) == base
    assert _rows(doc_sources["json"]) == base
    assert _rows(doc_sources["orc"]) == base


def test_row_counts_survive_roundtrip(spark, doc_sources):
    n = doc_sources["parquet"].count()
    assert doc_sources["csv"].count() == n
    assert doc_sources["json"].count() == n
    assert doc_sources["orc"].count() == n
