"""Interchange-format connectors: lossless CSV / JSON-Lines round trips.

The reference ingests text formats at its edges (PGN dumps in, JSON
documents out — SURVEY §2.1 S1/S12, §2.7 F17); an analytics engine at
100 TB meets the same formats as interchange: upstream dumps arrive as
CSV/JSONL, and the first job is a schema-enforced read that lands them
as parquet.  These helpers pin the exact option set under which a
Spark CSV/JSONL write→read is BIT-LOSSLESS for the engine's column
types (ints, doubles, decimals, strings with quotes/commas/newlines,
NULLs, timestamps), so the connector entries can be oracle-checked
against the original parquet: round trip, compare to the source.

Scale shape: both writers/readers are plain DataFrame sources — fully
distributed, one file per partition, schema enforced on read (never
inferSchema, which costs an extra full scan and can mistype columns).
`FAILFAST` mode makes corruption loud; production pipelines that expect
dirty rows should switch to PERMISSIVE + a `_corrupt_record` column,
exactly the S1 bad-records pattern used by the PGN splitter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# One option set, shared by writer and reader: RFC-4180 quoting with
# doubled quotes, the conventional \\N NULL token, and microsecond
# timestamps (Spark's default CSV pattern drops sub-second precision;
# parquet carries micros).
#
# KNOWN CSV LIMIT (pinned in tests/test_formats.py): a string value
# equal to the null token reads back as NULL — Spark's univocity reader
# applies nullValue after quote removal, so quoting cannot disambiguate
# (true whatever token is chosen, including the "" default, which
# conflates empty strings instead).  Corpora that may legitimately
# contain the token must use JSONL (native null, no sentinel) — one more
# reason CSV is an edge format to land as parquet, not an internal one.
_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}

_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**_CSV_OPTS).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    # multiLine: quoted embedded newlines are legal RFC-4180 and the
    # writer emits them, so the reader must accept them.  The cost is
    # real and worth knowing at 100 TB: multiLine CSV files are NOT
    # splittable (one task per file, since a record boundary can't be
    # found mid-file) — pipelines with newline-carrying text should
    # prefer JSONL (always splittable, s14) or land parquet immediately.
    return (
        spark.read.options(**_CSV_OPTS, mode="FAILFAST", multiLine="true")
        .schema(schema)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**_JSON_OPTS).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return (
        spark.read.options(**_JSON_OPTS, mode="FAILFAST")
        .schema(schema)
        .json(path)
    )


def roundtrip_csv(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as CSV and read it back under the same schema —
    the connector-correctness primitive behind s13."""
    write_csv(df, path)
    return read_csv(df.sparkSession, path, df.schema)


def roundtrip_jsonl(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as JSON Lines and read it back under the same
    schema — the connector-correctness primitive behind s14."""
    write_jsonl(df, path)
    return read_jsonl(df.sparkSession, path, df.schema)


def roundtrip_orc(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as ORC and read it back under the same schema — the
    columnar-sibling connector proof behind s15.  ORC is splittable with
    footer statistics and predicate pushdown (a lake format in its own
    right); no option pinning is needed because the format carries types
    natively."""
    df.write.mode("overwrite").orc(path)
    return df.sparkSession.read.schema(df.schema).orc(path)


def read_jsonl_permissive(
    spark: SparkSession, path: str, schema_ddl: str,
    corrupt_col: str = "_corrupt",
    cache: bool = False,
):
    """PERMISSIVE JSONL read with a corrupt-record side channel — the
    connector-level form of the reference's per-game error tolerance
    (pgn_parser.ml fold_games' on_error: a bad record is captured and
    reported, never aborts the file).

    Malformed lines parse to all-NULL fields with the raw line in
    ``corrupt_col``; well-formed lines leave it NULL.  ``cache=True``
    materializes the parse once — REQUIRED only for queries that
    reference ONLY the corrupt-record column (Spark refuses those on an
    uncached scan, since it would have to re-parse per reference); a
    query that also projects data columns, or that runs a single
    action, doesn't need the cache and shouldn't pay the
    materialization."""
    schema = f"{schema_ddl}, {corrupt_col} string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    if cache:
        df.cache()
    return df
