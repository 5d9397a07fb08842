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


def test_schema_evolution_merge_across_parquet_batches(spark, tmp_path):
    """Source capability: a corpus written in batches with an EVOLVING
    schema (a column added later) reads as one DataFrame under
    mergeSchema, old rows NULL-filled — and operators run over the merged
    frame unchanged.  This is how a long-lived 100 TB corpus actually
    looks: early shards lack columns that later ingest versions added."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "evolving")
    docs.limit(100).select("doc_id", "text", "lang").write.mode(
        "append"
    ).parquet(out)
    docs.limit(100).select(
        "doc_id", "text", "lang", "source"
    ).withColumn("quality_tier", F.lit("gold")).write.mode("append").parquet(
        out
    )

    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {
        "doc_id", "text", "lang", "source", "quality_tier",
    }
    assert merged.count() == 200
    # old-batch rows surface the new columns as NULL
    assert merged.filter(F.col("quality_tier").isNull()).count() == 100
    assert merged.filter(F.col("source").isNull()).count() == 100

    # operators are schema-evolution-agnostic: token counting over the
    # merged frame equals the same op over the plain frames
    counted = token_counts(merged, "doc_id", "text")
    assert counted.count() == 200
    one = token_counts(docs.limit(100), "doc_id", "text")
    merged_sum = counted.agg(F.sum("ws_tokens")).collect()[0][0]
    plain_sum = one.agg(F.sum("ws_tokens")).collect()[0][0]
    assert merged_sum == 2 * plain_sum
