"""Declarative data-quality audit — the Deequ pattern (Schelter et al.
VLDB 2018, "Automating Large-Scale Data Quality Verification"), the
validation gate a production training pipeline runs BEFORE dedup or
training ever sees the data: completeness, uniqueness, accepted values,
ranges, and referential integrity, each as a named constraint with a
measured metric and a pass/fail verdict.

Scale shape (the reason Deequ itself is Spark-native): every row-local
constraint on one table compiles to ONE aggregate expression, so a
whole suite over a table is a single partial+final scan — adding a
constraint adds a column to the agg, never a scan; uniqueness rides the
same scan as an exact count-distinct (one extra expand exchange keyed
on the column, AQE-sized); referential integrity is a broadcast-or-
shuffle semi-join counted, never materialized.  The audit result is
CONSTANT-size (one row per constraint) regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One named row-local constraint: ``fraction`` is an aggregate
    Column producing the metric in [0, 1]; ``threshold`` is the minimum
    passing value (pass = metric >= threshold)."""

    name: str
    fraction: Column
    threshold: float = 1.0


def _frac(pred: Column) -> Column:
    """Fraction of rows satisfying ``pred`` — 0.0 on an empty table,
    and the sum is coalesced so an ALL-NULL predicate column (sum over
    no non-NULL inputs is NULL) also reports 0.0/fail instead of a
    NULL metric a ``passed == False`` gate would sail past (the audit
    must never fail OPEN via NULL)."""
    n = F.count(F.lit(1))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.coalesce(F.sum(pred.cast("bigint")), F.lit(0))
        .cast("double")
        / n
    )


def completeness(col: str, threshold: float = 1.0) -> Constraint:
    return Constraint(
        f"completeness({col})", _frac(F.col(col).isNotNull()), threshold
    )


def uniqueness(col: str, threshold: float = 1.0) -> Constraint:
    """Distinct fraction: count_distinct/count (Deequ's 'uniqueness' is
    value-level; this is the key-integrity form — 1.0 iff the column is
    a key).  NULLs count into the denominator but never the numerator,
    so a nullable 'key' can't pass by being empty."""
    n = F.count(F.lit(1))
    frac = F.when(n == 0, F.lit(0.0)).otherwise(
        F.count_distinct(F.col(col)).cast("double") / n
    )
    return Constraint(f"uniqueness({col})", frac, threshold)


def accepted_values(
    col: str, values: Sequence[str], threshold: float = 1.0
) -> Constraint:
    return Constraint(
        f"accepted_values({col})",
        _frac(F.col(col).isin(list(values))),
        threshold,
    )


def in_range(
    col: str, lo: float, hi: float, threshold: float = 1.0
) -> Constraint:
    return Constraint(
        f"in_range({col})",
        _frac(F.col(col).between(F.lit(lo), F.lit(hi))),
        threshold,
    )


def non_negative(col: str, threshold: float = 1.0) -> Constraint:
    return Constraint(
        f"non_negative({col})", _frac(F.col(col) >= 0), threshold
    )


def audit_table(
    df: DataFrame, table: str, constraints: Sequence[Constraint]
) -> DataFrame:
    """Run a constraint suite over ONE table in ONE scan: all metric
    expressions evaluate in a single agg; the one-row result unpivots to
    (constraint, metric, threshold, passed) long form driver-free (a
    constant-width projection + explode, no collect)."""
    if not constraints:
        raise ValueError("audit_table needs at least one constraint")
    agg = df.agg(
        *[c.fraction.alias(f"_m{i}") for i, c in enumerate(constraints)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(f"{table}.{c.name}").alias("constraint"),
                F.col(f"_m{i}").alias("metric"),
                F.lit(float(c.threshold)).alias("threshold"),
            )
            for i, c in enumerate(constraints)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("_c"))
        .select("_c.constraint", "_c.metric", "_c.threshold")
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
    )


def _fixed_width_bucket(
    col: Column, mn: Column, mx: Column, n_bins: int
) -> Column:
    """The PSI bucket expression shared by ``distribution_drift`` and
    ``windowed_drift``: ``n_bins`` fixed-width bins over [mn, mx] with
    out-of-range values CLAMPED into the end bins and a degenerate
    (mx == mn) range collapsing to one bin.  ONE definition on purpose
    — each caller's hand-written SQL oracle mirrors this arithmetic
    bit-for-bit, so a tweak here must show up in both PSI paths (and
    both oracles) at once, never silently diverge them."""
    raw = F.floor((col - mn) * F.lit(float(n_bins)) / (mx - mn))
    return F.when(mx == mn, F.lit(0)).otherwise(
        F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))
    )


def distribution_drift(
    reference: DataFrame,
    current: DataFrame,
    numeric_cols: Sequence[str] = (),
    categorical_cols: Sequence[str] = (),
    n_bins: int = 10,
    epsilon: float = 1e-4,
    stable_below: float = 0.1,
    major_at: float = 0.25,
) -> DataFrame:
    """Population Stability Index between two snapshots of the same
    table — the drift monitor a training pipeline runs when a new data
    dump lands, BEFORE mixing it into the corpus (the audit sibling of
    the constraint suite: constraints ask "is this snapshot sane",
    drift asks "is it the same distribution we trained on").

    PSI per feature = Σ_buckets (cur_frac - ref_frac) ·
    ln(cur_frac / ref_frac), with the standard industry verdicts
    (< 0.1 stable, < 0.25 moderate, else major).  Numeric features are
    bucketed into ``n_bins`` FIXED-WIDTH bins over the REFERENCE
    min/max (current-side out-of-range values clamp into the end bins
    — exactly the drift signal); categoricals bucket by value.  A
    bucket ABSENT from one side takes ``epsilon`` (the PSI
    zero-substitution convention) so a category appearing or vanishing
    contributes a large finite term instead of ±inf; a bucket that is
    present keeps its TRUE fraction, even when that fraction dips
    below epsilon on a side with more than 1/epsilon rows.  NULLs are
    excluded from both sides (PSI is over the observed distribution;
    completeness drift is ``completeness``'s job).  Output: one
    ``(feature, psi, verdict)`` row per feature — including an
    explicit ``(feature, NULL, 'unmeasurable')`` row for a numeric
    feature whose reference side has NO non-NULL values (no range, no
    bins, PSI undefined): the most degraded reference state must read
    as a loud verdict from the monitor, never as a silently missing
    feature.

    Scale shape: feature count never adds scans — one bounded min/max
    collect over the reference (2·|numeric features| scalars, inlined
    as literals, the same posture as ``windowed_drift``), then ONE
    scan per side emitting (feature, bucket) rows for ALL features via
    a constant-width explode, partial+final counted; everything after
    the two counted aggregates is bucket-cardinality-sized (Σ n_bins +
    distinct categories), so the join/window/PSI arithmetic touches
    hundreds of rows no matter how big the snapshots are.  All
    arithmetic is portable (floor-form rounding, natural log, double
    division in a pinned order), so an external SQL engine reproduces
    the psi values bit-for-bit — the a32 oracle does.
    """
    from ..functions.scoring import portable_round

    if not numeric_cols and not categorical_cols:
        raise ValueError("distribution_drift needs at least one feature")
    # bounded collect BY CONTRACT: 2·|numeric_cols| scalars, independent
    # of table size.  Inlining the ranges as literals keeps each side's
    # bucket scan free of a stats crossJoin (no twice-referenced
    # reference-aggregate subtree), and makes a feature with an all-NULL
    # reference side KNOWN here so it gets an explicit row below.
    ranges: dict = {}
    unmeasurable: list = []
    if numeric_cols:
        row = reference.agg(
            *[
                agg(F.col(c)).alias(f"_{tag}_{c}")
                for c in numeric_cols
                for tag, agg in (("mn", F.min), ("mx", F.max))
            ]
        ).first()
        for c in numeric_cols:
            if row[f"_mn_{c}"] is None:
                unmeasurable.append(c)
            else:
                ranges[c] = (
                    float(row[f"_mn_{c}"]),
                    float(row[f"_mx_{c}"]),
                )

    def bucket_fracs(df: DataFrame) -> DataFrame:
        entries = []
        for c in numeric_cols:
            if c not in ranges:
                continue
            # fixed-width bin over the REFERENCE range; clamp keeps
            # current-side outliers in the end bins
            mn, mx = ranges[c]
            b = _fixed_width_bucket(
                F.col(c), F.lit(mn), F.lit(mx), n_bins
            )
            entries.append(
                F.struct(
                    F.lit(c).alias("feature"),
                    F.when(F.col(c).isNull(), F.lit(None))
                    .otherwise(b)
                    .cast("string")
                    .alias("bucket"),
                )
            )
        for c in categorical_cols:
            entries.append(
                F.struct(
                    F.lit(c).alias("feature"),
                    F.col(c).cast("string").alias("bucket"),
                )
            )
        counts = (
            df.select(F.explode(F.array(*entries)).alias("_e"))
            .select("_e.feature", "_e.bucket")
            .where(F.col("bucket").isNotNull())
            .groupBy("feature", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        total = F.sum("cnt").over(Window.partitionBy("feature"))
        return counts.select(
            "feature",
            "bucket",
            (F.col("cnt").cast("double") / total).alias("frac"),
        )

    unmeasured = None
    if unmeasurable:
        unmeasured = reference.sparkSession.createDataFrame(
            [(c, None, "unmeasurable") for c in unmeasurable],
            "feature string, psi double, verdict string",
        )
    if not ranges and not categorical_cols:
        return unmeasured  # every requested feature is unmeasurable

    ref = bucket_fracs(reference).select(
        F.col("feature").alias("_rf"),
        F.col("bucket").alias("_rb"),
        F.col("frac").alias("_rfrac"),
    )
    cur = bucket_fracs(current).select(
        F.col("feature").alias("_cf"),
        F.col("bucket").alias("_cb"),
        F.col("frac").alias("_cfrac"),
    )
    # a side that never saw the bucket coalesces to epsilon; a present
    # bucket keeps its true fraction (counts are >= 1, so never log(0))
    joined = ref.join(
        cur,
        (F.col("_rf") == F.col("_cf")) & (F.col("_rb") == F.col("_cb")),
        "full_outer",
    ).select(
        F.coalesce(F.col("_rf"), F.col("_cf")).alias("feature"),
        F.coalesce(F.col("_rfrac"), F.lit(epsilon)).alias("fr"),
        F.coalesce(F.col("_cfrac"), F.lit(epsilon)).alias("fc"),
    )
    psi = portable_round(
        F.sum((F.col("fc") - F.col("fr")) * F.log(F.col("fc") / F.col("fr"))),
        6,
    )
    out = (
        joined.groupBy("feature")
        .agg(psi.alias("psi"))
        .select(
            "feature",
            "psi",
            F.when(F.col("psi") < stable_below, F.lit("stable"))
            .when(F.col("psi") < major_at, F.lit("moderate"))
            .otherwise(F.lit("major"))
            .alias("verdict"),
        )
    )
    return out.unionByName(unmeasured) if unmeasured is not None else out


def windowed_drift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    n_bins: int = 10,
    epsilon: float = 1e-4,
    stable_below: float = 0.1,
    major_at: float = 0.25,
    categorical: bool = False,
) -> DataFrame:
    """Per-day PSI of ``value_col`` against the table's GLOBAL
    distribution — the form a production monitor actually runs: one
    snapshot arrives per day/partition, and the question is "which
    days drifted?", not a single two-snapshot comparison
    (``distribution_drift`` is the two-snapshot core; this is its
    time-series deployment).  Output: one ``(day, psi, verdict)`` row
    per distinct day of ``ts_col``, same verdict ladder.

    ``categorical=True`` buckets by VALUE instead of fixed-width bins
    — the form the reference's payload fields need (result, eco,
    opening_slug are all categorical).  The category set is the global
    reference side by construction (every day's categories are a
    subset of the whole table's), so the same grid-free decomposition
    applies untouched: a category a day never saw contributes its
    vanished-mass term through the global sum, and no (day × category)
    grid is ever built.  Categorical mode also drops the min/max
    collect — TWO source scans total.

    Scale shape (numeric): three source scans total regardless of day
    count — a bounded min/max collect (two scalars, inlined as
    literals), ONE bucket-counted scan for the global reference
    fractions, ONE (day, bucket) counted scan for the windows; the
    returned plan contains exactly the latter two (pinned in tests,
    both modes).  No grid and no twice-referenced subtree: PSI per day
    decomposes exactly as
    SUM_present [(fc-fr)·ln(fc/fr) - missD(b)] + SUM_all missD(b)
    where missD(b) = (eps-fr)·ln(eps/fr) is the epsilon term a bucket
    contributes when a day never saw it (the vanished-mass signal) —
    the global SUM_all rides the broadcast reference frame as a
    window-summed column, so day totals come from a window over the
    tiny counted frame and nothing corpus-derived evaluates twice.
    Rows with a NULL value OR a NULL timestamp are excluded (a NULL
    day would never re-join on the bucket key and would emit a garbage
    major row).  Same portable arithmetic as distribution_drift (one
    shared bucket expression); the a33/a34 oracles mirror the
    decomposition term-for-term, so psi reproduces bit-for-bit.
    """
    from ..functions.scoring import portable_round

    if categorical:
        # bucket by value; the global side is the reference, so every
        # day's category set is a subset — the full-outer concern from
        # distribution_drift cannot arise here
        bucket = F.col(value_col).cast("string")
    else:
        # bounded collect BY CONTRACT: two scalars (the global
        # min/max), independent of table size — inlining them as
        # literals keeps the source-scan count structurally at three
        # (stats, reference fractions, day counts) instead of
        # embedding a stats subtree under every base reference and
        # relying on exchange reuse to dedupe it
        row = df.agg(
            F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx")
        ).first()
        if row["_mn"] is None:
            # no non-NULL values anywhere: no distribution, no days
            return df.select(
                F.date_trunc("DAY", F.col(ts_col)).alias("day"),
                F.lit(0.0).alias("psi"),
                F.lit("stable").alias("verdict"),
            ).limit(0)
        bucket = _fixed_width_bucket(
            F.col(value_col),
            F.lit(float(row["_mn"])),
            F.lit(float(row["_mx"])),
            n_bins,
        ).cast("bigint")
    # NULL ts rows are excluded like NULL values: a day=NULL group
    # would never re-join on the bucket key (NULL != NULL), so every
    # bucket would take epsilon and emit a garbage (NULL, huge-psi,
    # major) row — in BOTH engines, so the oracle could not catch it
    base = df.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.date_trunc("DAY", F.col(ts_col)).alias("day"),
        bucket.alias("bucket"),
    )
    # per-bucket reference fraction, its epsilon "vanished-mass" term
    # missΔ(b) = (eps - fr)·ln(eps / fr), and the global Σ missΔ — all
    # riding ONE evaluation of this tiny frame into the broadcast join.
    # Present buckets keep their TRUE fraction (counts >= 1, never 0);
    # only a bucket a day never saw takes epsilon, via missΔ below —
    # the distribution_drift convention.
    fr = F.col("cnt").cast("double") / F.col("_tot")
    ref = (
        base.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("_tot", F.sum("cnt").over(Window.partitionBy()))
        .select("bucket", fr.alias("fr"))
        .withColumn(
            "miss",
            (F.lit(epsilon) - F.col("fr"))
            * F.log(F.lit(epsilon) / F.col("fr")),
        )
        .withColumn("miss_all", F.sum("miss").over(Window.partitionBy()))
    )
    # single day-side aggregation; day totals via a window over the
    # tiny (days x bins) frame.  PSI per day decomposes exactly:
    #   Σ_present [(fc-fr)·ln(fc/fr) - missΔ(b)]  +  Σ_all missΔ(b)
    # — a bucket the day never saw contributes its missΔ through the
    # global sum, so no (day x bucket) grid and no second reference to
    # any corpus-derived frame is needed
    fc = F.col("cnt").cast("double") / F.col("day_n")
    term = (fc - F.col("fr")) * F.log(fc / F.col("fr")) - F.col("miss")
    per_day = (
        base.groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn(
            "day_n", F.sum("cnt").over(Window.partitionBy("day"))
        )
        .join(F.broadcast(ref), "bucket")
        .select("day", term.alias("term"), "miss_all")
    )
    psi = portable_round(F.sum("term") + F.max("miss_all"), 6)
    return (
        per_day.groupBy("day")
        .agg(psi.alias("psi"))
        .select(
            "day",
            "psi",
            F.when(F.col("psi") < stable_below, F.lit("stable"))
            .when(F.col("psi") < major_at, F.lit("moderate"))
            .otherwise(F.lit("major"))
            .alias("verdict"),
        )
    )


def referential_integrity(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    child_table: str,
    parent_table: str,
    threshold: float = 1.0,
    broadcast_parent_keys: Optional[bool] = None,
) -> DataFrame:
    """Fraction of child rows whose foreign key exists in the parent —
    counted via LEFT SEMI join, never materializing the join.  NULL
    foreign keys fail the constraint (they reference nothing), matching
    the SQL semi-join semantics exactly.

    ``broadcast_parent_keys=None`` (default): no hint — Spark's own
    size estimate / AQE picks broadcast for small distinct-key sets and
    a shuffle semi-join past the threshold, so an auditor pointing this
    at a fact-sized parent cannot OOM the driver by default (round-8
    ADVICE: the old force-broadcast default was the unsafe posture).
    ``True``: force broadcast — the explicit opt-in for KNOWN
    dimension-sized parents where the caller wants the pinned
    no-shuffle plan.  ``False``: force the shuffle semi-join (the
    fact-parent posture, e.g. when statistics are missing and the size
    estimate would over-broadcast)."""
    keys = parent.select(F.col(pk).alias("_pk")).distinct()
    if broadcast_parent_keys is True:
        keys = F.broadcast(keys)
    elif broadcast_parent_keys is False:
        keys = keys.hint("shuffle_hash")
    total = child.agg(F.count(F.lit(1)).alias("_n"))
    matched = (
        child.join(keys, F.col(fk) == F.col("_pk"), "left_semi")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    name = f"{child_table}.referential({fk} -> {parent_table}.{pk})"
    metric = F.when(F.col("_n") == 0, F.lit(0.0)).otherwise(
        F.col("_m").cast("double") / F.col("_n")
    )
    return (
        total.crossJoin(matched)
        .select(
            F.lit(name).alias("constraint"),
            metric.alias("metric"),
            F.lit(float(threshold)).alias("threshold"),
        )
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
    )
