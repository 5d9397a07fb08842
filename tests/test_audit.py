"""Data-quality audit operators (Deequ pattern, operators/audit.py):
constraint semantics on hand-built frames, the empty-table fail-closed
contract, and the one-scan / broadcast-semi plan shapes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chessmate_spark.operators.audit import (
    accepted_values,
    audit_table,
    completeness,
    in_range,
    non_negative,
    referential_integrity,
    uniqueness,
)
from chessmate_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _people(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", -5.0),
        (3, None, 0.0),
        (3, "a", 110.0),  # duplicate id
    ]
    return spark.createDataFrame(rows, "id bigint, tag string, val double")


def test_constraint_metrics_and_verdicts(spark):
    df = _people(spark)
    out = {
        r["constraint"]: r
        for r in audit_table(
            df,
            "people",
            [
                completeness("tag"),
                uniqueness("id"),
                accepted_values("tag", ["a", "b"]),
                in_range("val", 0.0, 100.0),
                non_negative("val", threshold=0.5),
            ],
        ).collect()
    }
    assert out["people.completeness(tag)"]["metric"] == 0.75
    assert not out["people.completeness(tag)"]["passed"]
    assert out["people.uniqueness(id)"]["metric"] == 0.75
    # NULL tag is not an accepted value
    assert out["people.accepted_values(tag)"]["metric"] == 0.75
    # -5.0 out of range
    assert out["people.in_range(val)"]["metric"] == 0.5
    # 3/4 non-negative >= 0.5 threshold -> passes
    assert out["people.non_negative(val)"]["metric"] == 0.75
    assert out["people.non_negative(val)"]["passed"]


def test_uniqueness_nulls_cannot_pass(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (None,)], "id bigint"
    )
    row = audit_table(df, "t", [uniqueness("id")]).collect()[0]
    # 1 distinct non-null value over 3 rows: NULLs stay in the
    # denominator, so a mostly-NULL column is NOT a key
    assert row["metric"] == pytest.approx(1 / 3)
    assert not row["passed"]


def test_referential_integrity_counts_and_null_fk_fails(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)],
        "id bigint, fk bigint",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk bigint")
    row = referential_integrity(
        child, "fk", parent, "pk", "child", "parent"
    ).collect()[0]
    assert row["constraint"] == "child.referential(fk -> parent.pk)"
    assert row["metric"] == 0.5  # 99 dangles, NULL references nothing
    assert not row["passed"]


def test_empty_tables_fail_closed(spark):
    df = spark.createDataFrame([], "id bigint, tag string")
    rows = audit_table(
        df, "t", [completeness("tag"), uniqueness("id")]
    ).collect()
    assert len(rows) == 2
    assert all(r["metric"] == 0.0 and not r["passed"] for r in rows)
    child = spark.createDataFrame([], "id bigint, fk bigint")
    parent = spark.createDataFrame([(1,)], "pk bigint")
    r = referential_integrity(
        child, "fk", parent, "pk", "c", "p"
    ).collect()[0]
    assert r["metric"] == 0.0 and not r["passed"]


def test_audit_table_is_one_scan(spark):
    """The suite's scale claim: N row-local constraints compile into one
    aggregate over one scan — the plan contains exactly one read of the
    input (no self-union of scans) and no join."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    out = audit_table(
        df, "t", [completeness("k"), non_negative("id"), in_range("k", 0, 3)]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan
    assert "Join" not in plan, plan


def test_a31_entry_referential_side_broadcasts(spark):
    """a31's scale claim: referential checks are broadcast LEFT SEMI
    counts — no SortMergeJoin anywhere in the audit plan."""
    df = QUERIES["a31_constraint_audit"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    rows = df.collect()
    assert len(rows) == 8
    byname = {r["constraint_name"]: r for r in rows}
    # the deliberately failing constraint really fails with a metric
    assert not byname["lineitem.uniqueness(l_orderkey)"]["passed"]
    assert 0.0 < byname["lineitem.uniqueness(l_orderkey)"]["metric"] < 1.0
    # referential integrity of the synthetic TPC-H tables holds
    assert byname[
        "lineitem.referential(l_orderkey -> orders.o_orderkey)"
    ]["passed"]


def test_all_null_column_fails_closed(spark):
    """Review regression: sum over an all-NULL predicate column is NULL;
    the metric must coalesce to 0.0/fail — a passed=None row would sail
    through a `passed == False` gate (fail-open)."""
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id bigint, tag string"
    )
    rows = {
        r["constraint"]: r
        for r in audit_table(
            df, "t", [accepted_values("tag", ["a"]), in_range("id", 5, 9)]
        ).collect()
    }
    acc = rows["t.accepted_values(tag)"]
    assert acc["metric"] == 0.0 and acc["passed"] is False
    # in_range on non-NULL ids is unaffected by the coalesce
    assert rows["t.in_range(id)"]["metric"] == 0.0


def test_referential_broadcast_posture_is_explicit(spark):
    """Round-8 ADVICE: the default must not force-broadcast an unknown
    parent's key set.  True pins the broadcast semi; False pins a
    non-broadcast semi; the hint-free default still computes the same
    metric (plan choice is Spark's, correctness is ours)."""
    child = spark.range(0, 1000).selectExpr("id", "id % 100 AS fk")
    parent = spark.range(0, 90).selectExpr("id AS pk")

    forced = referential_integrity(
        child, "fk", parent, "pk", "c", "p", broadcast_parent_keys=True
    )
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan

    shuffled = referential_integrity(
        child, "fk", parent, "pk", "c", "p", broadcast_parent_keys=False
    )
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan

    rows = [
        f.collect()[0]["metric"]
        for f in (
            forced,
            shuffled,
            referential_integrity(child, "fk", parent, "pk", "c", "p"),
        )
    ]
    assert rows == [0.9, 0.9, 0.9]


# ---------------------------------------------------------------------------
# distribution_drift (PSI)


def _psi(ref_fracs, cur_fracs, eps=1e-4):
    """Reference implementation: PSI over aligned bucket dicts."""
    import math

    buckets = set(ref_fracs) | set(cur_fracs)
    total = 0.0
    for b in buckets:
        fr = max(ref_fracs.get(b, 0.0), eps)
        fc = max(cur_fracs.get(b, 0.0), eps)
        total += (fc - fr) * math.log(fc / fr)
    return total


def test_drift_categorical_hand_computed(spark):
    from chessmate_spark.operators.audit import distribution_drift

    ref = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 2, "cat string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 1 + [("b",)] * 3, "cat string"
    )
    rows = distribution_drift(
        ref, cur, categorical_cols=["cat"]
    ).collect()
    assert len(rows) == 1
    want = _psi({"a": 0.5, "b": 0.5}, {"a": 0.25, "b": 0.75})
    assert rows[0]["feature"] == "cat"
    assert abs(rows[0]["psi"] - want) < 1e-6
    assert rows[0]["verdict"] == "major"  # 0.2747 >= 0.25


def test_drift_identical_distributions_stable(spark):
    from chessmate_spark.operators.audit import distribution_drift

    df = spark.createDataFrame(
        [(float(i % 10), str(i % 3)) for i in range(30)],
        "num double, cat string",
    )
    rows = {
        r["feature"]: r
        for r in distribution_drift(
            df, df, numeric_cols=["num"], categorical_cols=["cat"]
        ).collect()
    }
    assert rows["num"]["psi"] == 0.0 and rows["num"]["verdict"] == "stable"
    assert rows["cat"]["psi"] == 0.0 and rows["cat"]["verdict"] == "stable"


def test_drift_vanished_category_epsilon(spark):
    """A category present in ref but absent in cur takes the epsilon
    substitute, contributing a large FINITE term (never ±inf/NaN)."""
    import math

    from chessmate_spark.operators.audit import distribution_drift

    ref = spark.createDataFrame(
        [("a",)] * 4 + [("gone",)], "cat string"
    )
    cur = spark.createDataFrame([("a",)] * 5, "cat string")
    row = distribution_drift(ref, cur, categorical_cols=["cat"]).first()
    want = _psi({"a": 0.8, "gone": 0.2}, {"a": 1.0})
    assert math.isfinite(row["psi"])
    assert abs(row["psi"] - want) < 1e-6
    assert row["verdict"] == "major"


def test_drift_numeric_binning_and_clamp(spark):
    """Fixed-width bins come from the REFERENCE range; current-side
    out-of-range values clamp into the end bins (the drift signal)."""
    from chessmate_spark.operators.audit import distribution_drift

    ref = spark.createDataFrame(
        [(float(v),) for v in range(10)], "num double"
    )  # range [0, 9], 10 bins: floor((v-0)*10/9) clamped to 9
    cur = spark.createDataFrame(
        [(float(v),) for v in (0, 1, 2, 50, 60, -5, -6, 3, 4, 5)],
        "num double",
    )

    def bin_of(v):
        return min(9, max(0, int((v - 0.0) * 10.0 // 9.0)))

    ref_fr = {}
    for v in range(10):
        b = str(bin_of(v))
        ref_fr[b] = ref_fr.get(b, 0.0) + 0.1
    cur_fr = {}
    for v in (0, 1, 2, 50, 60, -5, -6, 3, 4, 5):
        b = str(bin_of(v))
        cur_fr[b] = cur_fr.get(b, 0.0) + 0.1
    row = distribution_drift(ref, cur, numeric_cols=["num"]).first()
    assert abs(row["psi"] - _psi(ref_fr, cur_fr)) < 1e-6


def test_drift_nulls_excluded_and_constant_reference(spark):
    from chessmate_spark.operators.audit import distribution_drift

    ref = spark.createDataFrame(
        [(5.0,), (5.0,), (None,)], "num double"
    )
    cur = spark.createDataFrame(
        [(5.0,), (None,), (None,)], "num double"
    )
    # constant reference range (mx == mn): everything lands in bin 0 on
    # both sides; NULLs drop entirely -> identical one-bucket dists
    row = distribution_drift(ref, cur, numeric_cols=["num"]).first()
    assert row["psi"] == 0.0
    assert row["verdict"] == "stable"


def test_drift_requires_features(spark):
    from chessmate_spark.operators.audit import distribution_drift

    df = spark.createDataFrame([(1.0,)], "num double")
    with pytest.raises(ValueError):
        distribution_drift(df, df)


def test_drift_plan_is_jvm_only(spark):
    """No Python evaluation nodes anywhere in the drift plan — the PSI
    arithmetic is pure expressions (the portability the oracle needs)."""
    from chessmate_spark.operators.audit import distribution_drift

    df = spark.createDataFrame(
        [(float(i), str(i % 2)) for i in range(8)], "num double, cat string"
    )
    plan = distribution_drift(
        df, df, numeric_cols=["num"], categorical_cols=["cat"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_windowed_drift_per_day_psi(spark):
    """Two days, one matching the global mix and one heavily skewed:
    the skewed day's PSI is hand-computed against the GLOBAL (both
    days pooled) reference, including the epsilon term for a bucket
    the day never saw."""
    from chessmate_spark.operators.audit import windowed_drift

    # day 1: values 0..9 uniform; day 2: all mass at 9 (plus one 0)
    rows = [("2024-01-01 10:00:00", float(v)) for v in range(10)]
    rows += [("2024-01-02 10:00:00", 9.0)] * 9
    rows += [("2024-01-02 11:00:00", 0.0)]
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = {
        str(r["day"])[:10]: r
        for r in windowed_drift(df, "ts", "value").collect()
    }
    assert set(out) == {"2024-01-01", "2024-01-02"}

    # reference = pooled 20 rows; bucket b = min(9, max(0, v*10//9))
    def bucket(v):
        return min(9, max(0, int(v * 10.0 // 9.0)))

    pooled, d1, d2 = {}, {}, {}
    for v in list(range(10)) + [9] * 9 + [0]:
        pooled[bucket(float(v))] = pooled.get(bucket(float(v)), 0) + 1
    for v in range(10):
        d1[bucket(float(v))] = d1.get(bucket(float(v)), 0) + 1
    for v in [9.0] * 9 + [0.0]:
        d2[bucket(v)] = d2.get(bucket(v), 0) + 1

    import math

    def psi(day_counts, day_n):
        total = 0.0
        for b, cnt in pooled.items():
            fr = max(cnt / 20.0, 1e-4)
            fc = max(day_counts.get(b, 0) / day_n, 1e-4)
            total += (fc - fr) * math.log(fc / fr)
        return total

    assert abs(out["2024-01-01"]["psi"] - psi(d1, 10)) < 1e-6
    assert abs(out["2024-01-02"]["psi"] - psi(d2, 10)) < 1e-6
    # the skewed day is non-stable; day 1 may read moderate (it also
    # differs from the pooled mix) but must be LESS drifted than day 2
    assert out["2024-01-02"]["psi"] > out["2024-01-01"]["psi"]
    assert out["2024-01-02"]["verdict"] in ("moderate", "major")


def test_windowed_drift_identical_days_stable(spark):
    from chessmate_spark.operators.audit import windowed_drift

    rows = [
        (f"2024-01-0{d} 12:00:00", float(v))
        for d in (1, 2, 3)
        for v in range(8)
    ]
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = windowed_drift(df, "ts", "value").collect()
    assert len(out) == 3
    assert all(r["psi"] == 0.0 and r["verdict"] == "stable" for r in out)


def test_windowed_drift_null_ts_excluded(spark):
    """Round-9 review: a NULL-timestamp row used to form a day=NULL
    group that never re-joined the grid (NULL != NULL), emitting a
    garbage (NULL, huge-psi, major) row — identically in the oracle
    engine, so only a unit test can pin it.  NULL ts rows are
    excluded like NULL values."""
    from chessmate_spark.operators.audit import windowed_drift

    rows = [("2024-01-01 10:00:00", float(v)) for v in range(8)]
    rows += [(None, 5.0), (None, None), ("2024-01-01 11:00:00", None)]
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = windowed_drift(df, "ts", "value").collect()
    assert len(out) == 1
    assert out[0]["day"] is not None
    assert out[0]["psi"] == 0.0  # the one real day IS the reference


def test_windowed_drift_is_three_scans(spark):
    """The docstring's scale claim, pinned like audit_table's one-scan
    test: three source scans total — the eager bounded min/max collect
    (runs before the returned plan exists), plus EXACTLY two scans in
    the returned plan (global reference fractions, per-(day, bucket)
    counts).  The grid-free PSI decomposition is what keeps it at two:
    day totals ride a window over the counted frame and the
    vanished-mass terms ride the broadcast reference, so no subtree is
    referenced twice."""
    from chessmate_spark.operators.audit import windowed_drift

    df = spark.range(0, 200).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias(
            "ts"
        ),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    plan = windowed_drift(df, "ts", "value")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Range (0, 200") == 2, plan


def test_drift_all_null_reference_feature_reads_unmeasurable(spark):
    """Round-9 ADVICE: a numeric feature whose reference side has zero
    non-NULL values used to VANISH from the output (NULL range -> every
    bucket NULL -> filtered) — the most degraded reference state read
    as silence.  It must emit an explicit (feature, NULL,
    'unmeasurable') row while other features still measure."""
    from chessmate_spark.operators.audit import distribution_drift

    ref = spark.createDataFrame(
        [(None, 1.0, "x"), (None, 2.0, "y")],
        "dead double, num double, cat string",
    )
    cur = spark.createDataFrame(
        [(5.0, 1.0, "x"), (6.0, 2.0, "y")],
        "dead double, num double, cat string",
    )
    out = {
        r["feature"]: r
        for r in distribution_drift(
            ref, cur, numeric_cols=["dead", "num"], categorical_cols=["cat"]
        ).collect()
    }
    assert set(out) == {"dead", "num", "cat"}
    assert out["dead"]["psi"] is None
    assert out["dead"]["verdict"] == "unmeasurable"
    assert out["num"]["psi"] == 0.0 and out["num"]["verdict"] == "stable"
    assert out["cat"]["psi"] == 0.0 and out["cat"]["verdict"] == "stable"

    # every requested feature unmeasurable: still one row each, loud
    only = distribution_drift(ref, cur, numeric_cols=["dead"]).collect()
    assert len(only) == 1
    assert only[0]["verdict"] == "unmeasurable"


def test_drift_present_tiny_bucket_keeps_true_fraction(spark):
    """Round-9 ADVICE: epsilon is the ABSENT-bucket substitution, not a
    floor on present buckets — on a side with more than 1/epsilon rows
    a genuinely present tiny bucket keeps its true fraction.  Here the
    reference has a 1-in-20000 bucket (frac 5e-5 < epsilon 1e-4) that
    the current side never saw: under the old all-bucket clamp the
    vanished-mass term was zero (both sides clamped to epsilon); the
    true-fraction convention reports it."""
    import math

    from chessmate_spark.operators.audit import distribution_drift

    ref = spark.range(20000).select(
        F.when(F.col("id") == 0, F.lit(9.0)).otherwise(F.lit(0.0)).alias("v")
    )
    cur = spark.range(10).select(F.lit(0.0).alias("v"))
    row = distribution_drift(ref, cur, numeric_cols=["v"]).first()
    fr0, fr9, eps = 19999 / 20000.0, 1 / 20000.0, 1e-4
    expected = (1.0 - fr0) * math.log(1.0 / fr0) + (eps - fr9) * math.log(
        eps / fr9
    )
    assert abs(row["psi"] - expected) < 2e-6
    assert row["psi"] > 0.0  # the old clamp read this as exactly 0


def test_windowed_drift_tiny_bucket_true_fraction(spark):
    """The same absent-vs-present epsilon convention in the windowed
    monitor: a global 1-in-20010 bucket (true frac < epsilon) absent
    from a small day contributes its true-fraction vanished-mass term."""
    import math

    from chessmate_spark.operators.audit import windowed_drift

    day1 = spark.range(20000).select(
        F.to_timestamp(F.lit("2024-01-01 10:00:00")).alias("ts"),
        F.when(F.col("id") == 0, F.lit(9.0)).otherwise(F.lit(0.0)).alias("v"),
    )
    day2 = spark.range(10).select(
        F.to_timestamp(F.lit("2024-01-02 10:00:00")).alias("ts"),
        F.lit(0.0).alias("v"),
    )
    out = {
        str(r["day"])[:10]: r
        for r in windowed_drift(day1.unionByName(day2), "ts", "v").collect()
    }
    fr0, fr9, eps = 20009 / 20010.0, 1 / 20010.0, 1e-4
    expected = (1.0 - fr0) * math.log(1.0 / fr0) + (eps - fr9) * math.log(
        eps / fr9
    )
    assert abs(out["2024-01-02"]["psi"] - expected) < 2e-6
    assert out["2024-01-02"]["psi"] > 0.0


def test_windowed_drift_categorical_per_day_psi(spark):
    """categorical=True: buckets are the category values; a skewed
    day's PSI hand-computed against the pooled category mix, including
    the epsilon vanished-mass term for a category the day never saw."""
    import math

    from chessmate_spark.operators.audit import windowed_drift

    # day 1: a,a,b,c ; day 2: c,c,c,c (never sees a or b)
    rows = [("2024-01-01 10:00:00", c) for c in ["a", "a", "b", "c"]]
    rows += [("2024-01-02 10:00:00", "c")] * 4
    df = spark.createDataFrame(rows, "ts string, cat string").select(
        F.col("ts").cast("timestamp").alias("ts"), "cat"
    )
    out = {
        str(r["day"])[:10]: r
        for r in windowed_drift(df, "ts", "cat", categorical=True).collect()
    }
    pooled = {"a": 2 / 8.0, "b": 1 / 8.0, "c": 5 / 8.0}
    d1 = {"a": 2 / 4.0, "b": 1 / 4.0, "c": 1 / 4.0}
    d2 = {"c": 4 / 4.0}

    def psi(day):
        total = 0.0
        for cat, fr in pooled.items():
            fc = day.get(cat, 1e-4)
            total += (fc - fr) * math.log(fc / fr)
        return total

    assert abs(out["2024-01-01"]["psi"] - psi(d1)) < 1e-6
    assert abs(out["2024-01-02"]["psi"] - psi(d2)) < 1e-6
    assert out["2024-01-02"]["verdict"] == "major"  # vanished a AND b


def test_windowed_drift_categorical_null_excluded(spark):
    """NULL categories and NULL timestamps are excluded exactly like
    the numeric mode; identical days read stable (psi == 0.0)."""
    from chessmate_spark.operators.audit import windowed_drift

    rows = [
        (f"2024-01-0{d} 12:00:00", c)
        for d in (1, 2)
        for c in ["x", "x", "y"]
    ]
    rows += [(None, "x"), ("2024-01-01 13:00:00", None), (None, None)]
    df = spark.createDataFrame(rows, "ts string, cat string").select(
        F.col("ts").cast("timestamp").alias("ts"), "cat"
    )
    out = windowed_drift(df, "ts", "cat", categorical=True).collect()
    assert len(out) == 2
    assert all(r["psi"] == 0.0 and r["verdict"] == "stable" for r in out)


def test_windowed_drift_categorical_is_two_scans(spark):
    """Categorical mode drops the min/max collect, so the WHOLE
    operator is two source scans: the returned plan holds exactly the
    two counted scans (global category fractions, per-(day, category)
    counts) and nothing runs eagerly before it."""
    from chessmate_spark.operators.audit import windowed_drift

    df = spark.range(0, 200).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 3600).alias(
            "ts"
        ),
        F.concat(F.lit("c"), (F.col("id") % 7).cast("string")).alias("cat"),
    )
    plan = windowed_drift(df, "ts", "cat", categorical=True)._jdf\
        .queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 200") == 2, plan
