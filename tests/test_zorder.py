"""Z-order layout nets: Morton key correctness, data preservation, and
the footer-statistics skipping advantage over a single-key sorted
layout — decided from parquet footers, the same information a scan
planner prunes with."""

from __future__ import annotations

from pyspark.sql import functions as F

from chessmate_spark.ingest.zorder import (
    ZKEY,
    footer_skip_fraction,
    write_zordered,
    zorder_key,
)

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 16


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_morton_key_interleaves_bits(spark):
    """Hand-checked Morton codes on a tiny frame: with y's bits at odd
    positions, (x=3, y=0) -> 0b0101 = 5 and (x=0, y=3) -> 0b1010 = 10."""
    df = spark.createDataFrame(
        [(3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (0.0, 0.0)], "x double, y double"
    )
    keyed = zorder_key(df, ["x", "y"], bits=2, linear=True)
    got = {(r["x"], r["y"]): r[ZKEY] for r in keyed.collect()}
    assert got[(3.0, 0.0)] == 0b0101
    assert got[(0.0, 3.0)] == 0b1010
    assert got[(3.0, 3.0)] == 0b1111
    assert got[(0.0, 0.0)] == 0

    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan, "Morton key must be pure JVM expressions"


def test_quantile_ranks_preserve_order_and_spread(spark):
    """Quantile mode: rank order follows value order, and a skewed
    column still spreads across the full bit range (the property linear
    scaling loses)."""
    ev = _events(spark)
    keyed = zorder_key(ev.select("event_id", "value"), ["value"], bits=4)
    rows = keyed.collect()
    by_value = sorted(rows, key=lambda r: r["value"])
    keys = [r[ZKEY] for r in by_value]
    assert keys == sorted(keys), "rank must be monotone in value"
    used = {r[ZKEY] for r in rows}
    assert len(used) >= 12, f"skewed column must still use most levels: {len(used)}"


def test_zordered_write_preserves_data(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "z")
    write_zordered(ev, path, ["user_id", "value"], N_FILES)
    back = spark.read.parquet(path)
    assert sorted(r["event_id"] for r in back.collect()) == sorted(
        r["event_id"] for r in ev.collect()
    )
    assert ZKEY not in back.columns
    import os

    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == N_FILES


def test_zorder_skips_on_both_columns_where_single_sort_cannot(
    spark, tmp_path
):
    """The reason z-order exists: a user_id-sorted layout skips nothing
    for a value-only predicate; the z-ordered layout skips most files
    for range predicates on EITHER column."""
    ev = _events(spark)
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered(ev, zpath, ["user_id", "value"], N_FILES)
    (
        ev.repartitionByRange(N_FILES, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # value-only box: the single-key layout's value stats span everything.
    value_box = {"value": (10.0, 25.0)}
    z_skip = footer_skip_fraction(zpath, value_box)
    s_skip = footer_skip_fraction(spath, value_box)
    assert s_skip == 0.0, "user_id-sorted files cannot skip on value"
    assert z_skip >= 0.5, f"z-order should skip most files, got {z_skip}"

    # user_id box: both layouts skip (z-order gives up SOME user_id
    # tightness but must retain real skipping).
    stats = ev.agg(
        F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
    ).collect()[0]
    span = stats["hi"] - stats["lo"]
    id_box = {"user_id": (stats["lo"], stats["lo"] + span * 0.1)}
    assert footer_skip_fraction(spath, id_box) >= 0.8
    assert footer_skip_fraction(zpath, id_box) >= 0.5

    # 2-D box: conjunctive skipping compounds on the z layout.
    both = {**id_box, **value_box}
    assert footer_skip_fraction(zpath, both) >= footer_skip_fraction(
        zpath, id_box
    )


def test_zordered_scan_pushes_filters(spark, tmp_path):
    """The range predicates must reach the parquet scan (PushedFilters),
    so the reader actually exploits the tight footers at read time."""
    ev = _events(spark)
    path = str(tmp_path / "z")
    write_zordered(ev, path, ["user_id", "value"], N_FILES)
    q = spark.read.parquet(path).filter(
        (F.col("value") >= 10.0)
        & (F.col("value") <= 25.0)
        & (F.col("user_id") < 100)
    )
    # simple-string plans truncate long scan lines; formatted mode
    # prints the full PushedFilters list
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = q._jdf.queryExecution().explainString(mode)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "GreaterThanOrEqual(value" in pushed
    assert "LessThan(user_id" in pushed
