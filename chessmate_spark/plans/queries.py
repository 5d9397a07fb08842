"""Declared query inventory: every operator from SURVEY.md §2 as a
(spark_builder, duckdb_oracle_sql) pair over the driver's synthetic tables.

Determinism conventions (SURVEY §7.3):
  * money aggregates go through exact DECIMAL arithmetic, then CAST AS DOUBLE
    — bit-identical across Spark and DuckDB regardless of accumulation order;
  * float scores (cosine, overlap, blends) are ROUND(x, 6);
  * timestamps are formatted to strings at the output boundary;
  * every ordering carries a unique tiebreak column;
  * DuckDB ``sum(int)`` returns HUGEINT → always CAST AS BIGINT in oracles.

Each Spark builder takes (spark, sf_dir) and reads the parquet tables the
driver provides; the oracle SQL runs on DuckDB views of the same files.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.embedding import deterministic_embedding
from ..functions.scoring import blend_scores, keyword_overlap, portable_round
from ..functions.text import tokenize_expr, tokenize_sources
from ..functions.vector import cosine_similarity, query_vector_lit
from ..operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from ..operators.relational import paginate
from ..operators.similarity import brute_force_topk, cosine_knn_join
from ..operators.textan import language_id, quality_score, token_counts
from ..operators.topk import topk_per_group

SparkBuilder = Callable[[SparkSession, str], DataFrame]
Entry = Tuple[SparkBuilder, Optional[str]]

QUERIES: Dict[str, Entry] = {}


# Inferred parquet schemas per (SparkContext, path) — METADATA caching,
# not data caching (round 15, guide §1.2/§7.3 plan-build cost): every
# bare ``spark.read.parquet(path)`` runs a 1-task footer-inference job
# before the query proper, and the suite re-reads the same immutable
# tables hundreds of times (2-3 ``_t`` calls per entry).  Passing the
# once-inferred schema back via ``.schema(...)`` skips exactly that job;
# the data is re-scanned from parquet on every action as before.  Keyed
# on the active context so a relaunched JVM re-infers.
_SCHEMA_CACHE: Dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..functions.embedding import active_context_key

    path = f"{sf_dir}/{name}.parquet"
    key = (active_context_key(), path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _sf_token(sf_dir: str) -> str:
    """Token for /tmp artifact paths and catalog table names derived from
    an sf_dir: leaf name for readability + md5 of the FULL path so two
    corpora that happen to share a leaf directory name (runA/sf0_1 vs
    runB/sf0_1) can never alias each other's standing tables.  Data
    immutability per path is the contract (the driver's testdata dirs are
    read-only); a mutable corpus must not use standing-table reuse."""
    import hashlib
    import re as _re

    leaf = _re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    return f"{leaf}_{hashlib.md5(sf_dir.rstrip('/').encode()).hexdigest()[:8]}"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` guaranteed to be a timestamp column.

    Current testdata stores ``ts`` as parquet timestamp[us]
    (isAdjustedToUTC=false), which every Spark session reads as
    TIMESTAMP_NTZ — naive wall time, matching what DuckDB sees, so oracle
    comparisons are timezone-independent.  Downstream operators must use
    NTZ-tolerant expressions (``timestamp_diff``/``window``), not
    ``unix_micros``.

    Fallback: earlier testdata generations stored INT64 TIMESTAMP(NANOS),
    which vanilla Spark rejects (PARQUET_TYPE_ILLEGAL) unless the legacy
    nanosAsLong conf is set.  If the plain read fails, retry under the flag
    (restored immediately after the schema resolves) and rebuild the
    timestamp from the raw nanos count with integer DIV — ns counts exceed
    2^53, so a double round-trip would be off by ±1 µs on some rows.
    """
    try:
        ev = _t(spark, sf_dir, "events")
        dt = dict(ev.dtypes)["ts"]
    except Exception:
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            ev = _t(spark, sf_dir, "events")
            dt = dict(ev.dtypes)["ts"]
        finally:
            if prior is None or prior == "false":
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
    if dt == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a small-but-compute-heavy table across all cores.

    documents/embeddings arrive as one tiny parquet file (single split), but
    per-row cost is dominated by expression work (md5 loops, 64-dim cosines,
    shingle intersections) — parallelism must follow compute cost, not input
    bytes.  The shuffle moves a few MB; the win is every core working.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parallelism)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(_t(spark, sf_dir, "documents"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(_t(spark, sf_dir, "embeddings"))


def _table_rows(sf_dir: str, name: str) -> int:
    """Exact row count of one of the driver's immutable parquet tables
    from its footer metadata (round 15, guide §1.2): a ``df.count()``
    launches a Spark job (and, through ``_spread``, a full repartition
    exchange) to count rows the file's own metadata records.  Identical
    number — both read the same footer."""
    import pyarrow.parquet as _pq

    return _pq.read_metadata(f"{sf_dir}/{name}.parquet").num_rows


def _emb_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN entries' 5-row query frame off the RAW embeddings scan
    (round 15, guide §6 predicate pushdown): every serve collects the
    query vectors once, and routing that collect through ``_emb``'s
    corpus-wide ``_spread`` repartition made each one a full-table
    shuffle + 32 tiny tasks — the filter now pushes down to the parquet
    scan (PushedFilters: vec_id < 5) and the collect is one single-task
    job.  Row-identical to filtering the spread frame; ``_spread``
    stays on the corpus side, where the per-row compute is."""
    return (
        _t(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .filter(F.col("query_id") < 5)
    )


def _register(name: str, oracle: Optional[str]):
    def wrap(fn: SparkBuilder) -> SparkBuilder:
        QUERIES[name] = (fn, oracle)
        return fn

    return wrap


def _micro4(col):
    """``CAST(x AS DECIMAL(_,4))`` as integer 1e-4 units via pure FP
    arithmetic: ``floor(x*10000 + 0.5) :: long``.  Round 14 (guide
    §2.3 narrower types / §1.2 per-task work): Spark's double→decimal
    cast routes every row through ``BigDecimal.valueOf(double)`` —
    i.e. ``Double.toString`` — which dominated the TPC-H aggregate
    entries (q1's four decimal aggregations: 1.05 s → 0.40 s at
    sf0.1).  Provably identical to the decimal cast for data with ≤ 2
    true fractional digits (every TPC-H money/quantity column):
    ``x·10⁴`` is then an integer ± 1 ulp, so the +0.5/floor round and
    decimal HALF_UP agree for positive AND negative values; columns
    with arbitrary fractional digits (e.g. events.value) must keep
    the decimal cast, where the .5 boundary is live."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 10000 + F.lit(0.5)).cast("long")


def _from_micro(sum_col, micro_digits=4):
    """Integer micro-unit sum → the DOUBLE the decimal form produced:
    one decimal division per GROUP (exact — the quotient has at most
    ``micro_digits`` decimals and each /10⁴ step carries scale 6), then
    one correctly-rounded double conversion.  Values are bit-identical
    to summing decimals and casting (verified at all three committed
    scale factors)."""
    out = sum_col.cast("decimal(38,0)")
    for _ in range(0, micro_digits, 4):
        out = out / F.lit(10000)
    return out.cast("double")


def _msum(micro_col):
    """Sum of a micro-unit term with GRAND-TOTAL headroom: the long
    term is cast to ``decimal(38,0)`` before the sum (round-14 ADVICE —
    a plain long sum overflows at ~9.2e14 currency units, i.e. below
    the repo's 10¹¹-row posture for q1's grand totals; ANSI on would
    hard-error at scale, ANSI off would wrap silently).  The long→
    decimal cast is an integer conversion, so the round-14 win over
    ``BigDecimal.valueOf(double)`` is kept; ``_rev_term`` already used
    exactly this shape.  Per-group sums with a PROVABLE bound (q18's
    per-order quantity: ≤ 5e5 micro-units per line) may stay long."""
    return F.sum(micro_col.cast("decimal(38,0)"))


def _dsum(col):
    """Exact decimal-semantics sum cast to double (order-independent,
    oracle-exact) — micro-unit form, see ``_micro4``/``_msum``."""
    return _from_micro(_msum(_micro4(col)))


_REVENUE = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE)"
)


def _rev_term(disc=None):
    """The micro-unit revenue TERM: ``extendedprice·(1-discount)`` as an
    exact integer in 1e-8 units, summed as ``decimal(38,0)`` so the
    grand-total row of a 10¹¹-row corpus cannot overflow a long (a pure
    long sum caps at ~9.2e14 currency units).  Identical to
    ``sum(cast(p as decimal(18,4)) * cast(1-d as decimal(8,4)))``: both
    factors carry ≤ 2 true fractional digits, so ``floor(x·10⁴+0.5)``
    reproduces each decimal cast exactly (see ``_micro4``) and the
    integer product IS the decimal product ×10⁸.  The per-row win is the
    same as ``_dsum``'s: no ``BigDecimal.valueOf(double)`` —
    long→decimal is an integer conversion, double→decimal goes through
    ``Double.toString``."""
    if disc is None:
        disc = F.lit(1.0) - F.col("l_discount")
    return (
        _micro4("l_extendedprice") * _micro4(disc)
    ).cast("decimal(38,0)")


def _revenue_expr(disc=None):
    return _from_micro(F.sum(_rev_term(disc)), micro_digits=8)


# ---------------------------------------------------------------------------
# Aggregations (A1, A6, A7) + classic analytics shapes
# ---------------------------------------------------------------------------

@_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
           """ + _REVENUE + """ AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial+final aggregation (A1/A6 class)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _revenue_expr().alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           """ + _REVENUE + """ AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → grouped top-k.
    customer is broadcast; lineitem never shuffles before the filter."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_expr().alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_register(
    "q5_local_supplier_volume",
    """
    SELECT n_name, """ + _REVENUE + """ AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake joins; all dims broadcast, one fact shuffle."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(_revenue_expr().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@_register(
    "a1_count_filtered",
    """
    SELECT CAST(count(*) AS BIGINT) AS total
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice >= 50000
    """,
)
def a1_count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: pagination COUNT(*) sharing the search predicate."""
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") >= 50000))
        .agg(F.count(F.lit(1)).alias("total"))
    )


@_register(
    "a6_status_histogram",
    """
    WITH totals AS (
      SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_orderstatus)
    SELECT status, cnt FROM totals
    UNION ALL
    SELECT 'TOTAL' AS status, CAST(sum(cnt) AS BIGINT) AS cnt FROM totals
    ORDER BY status
    """,
)
def a6_status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/U3: per-status counts + grand-total row via UNION ALL."""
    totals = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grand = totals.agg(
        F.lit("TOTAL").alias("status"), F.sum("cnt").alias("cnt")
    )
    return totals.unionByName(grand).orderBy("status")


@_register(
    "a7_windowed_counts",
    """
    SELECT CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-30 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_1d,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-24 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_7d,
           CAST(count(*) AS BIGINT) AS cnt_all
    FROM events
    """,
)
def a7_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: windowed throughput counts against a fixed reference 'now'."""
    ev = _events(spark, sf_dir)
    day = F.lit("2024-01-30 00:00:00").cast("timestamp")
    week = F.lit("2024-01-24 00:00:00").cast("timestamp")
    one = F.lit(1)
    zero = F.lit(0)
    return ev.agg(
        F.sum(F.when(F.col("ts") >= day, one).otherwise(zero)).alias("cnt_1d"),
        F.sum(F.when(F.col("ts") >= week, one).otherwise(zero)).alias("cnt_7d"),
        F.count(one).alias("cnt_all"),
    )


# ---------------------------------------------------------------------------
# Filters / joins / pagination (P*, J*, O*)
# ---------------------------------------------------------------------------

@_register(
    "o1_pagination",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderstatus
    FROM orders
    ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC
    LIMIT 20 OFFSET 10
    """,
)
def o1_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: deterministic page sort + offset page (TakeOrderedAndProject)."""
    orders = _t(spark, sf_dir, "orders")
    page = paginate(
        orders,
        [F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc()],
        limit=20,
        offset=10,
    )
    return page.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_orderstatus",
    )


@_register(
    "p6_range_filter",
    """
    SELECT p_partkey, p_brand, p_type
    FROM part
    WHERE upper(p_brand) BETWEEN 'BRAND#20' AND 'BRAND#29' AND p_size >= 25
    ORDER BY p_partkey
    """,
)
def p6_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: lexicographic string-range filter (ECO-range semantics)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(
            F.upper(F.col("p_brand")).between("BRAND#20", "BRAND#29")
            & (F.col("p_size") >= 25)
        )
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")
    )


@_register(
    "p10_rating_delta",
    """
    SELECT c_custkey, s_suppkey, round(abs(c_acctbal - s_acctbal), 2) AS bal_delta
    FROM customer JOIN supplier ON c_nationkey = s_nationkey
    WHERE c_acctbal IS NOT NULL AND s_acctbal IS NOT NULL
      AND abs(c_acctbal - s_acctbal) <= 100
    ORDER BY c_custkey, s_suppkey
    """,
)
def p10_rating_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: |a-b| <= delta with null guards (max_rating_delta semantics)."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    return (
        cust.join(F.broadcast(supp), cust["c_nationkey"] == supp["s_nationkey"])
        .filter(
            F.col("c_acctbal").isNotNull()
            & F.col("s_acctbal").isNotNull()
            & (F.abs(F.col("c_acctbal") - F.col("s_acctbal")) <= 100)
        )
        .select(
            "c_custkey",
            "s_suppkey",
            portable_round(F.abs(F.col("c_acctbal") - F.col("s_acctbal")), 2).alias("bal_delta"),
        )
        .orderBy("c_custkey", "s_suppkey")
    )


@_register(
    "j1_left_join_summaries",
    """
    SELECT o_orderkey, coalesce(c_name, '') AS customer_name, o_orderstatus
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice >= 100000
    ORDER BY o_orderkey
    """,
)
def j1_left_join_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact ⟕ broadcast dim with COALESCE'd display name (F15)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 100000)
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("c_name"), F.lit("")).alias("customer_name"),
            "o_orderstatus",
        )
        .orderBy("o_orderkey")
    )


@_register(
    "j3_semi_join",
    """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: semi-join by id set (id = ANY(...) semantics)."""
    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"], "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("l_returnflag")
    )


@_register(
    "j6_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_totalprice > 300000
                              AND o_custkey IS NOT NULL)
    ORDER BY c_custkey
    """,
)
def j6_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: anti-join (player-upsert 'not yet present' semantics).  The
    probe side is the high-value order subset so the result is non-empty
    at every sf — an all-customers probe returns zero rows at sf0.01,
    which would make the oracle check vacuous."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@_register(
    "o4_topk_per_group",
    """
    SELECT o_orderstatus, o_orderkey, o_totalprice, rank FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders)
    WHERE rank <= 3
    ORDER BY o_orderstatus, rank
    """,
)
def o4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: top-k per group via window (vector over-fetch collapse shape)."""
    ranked = topk_per_group(
        _t(spark, sf_dir, "orders"),
        ["o_orderstatus"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )
    return ranked.select("o_orderstatus", "o_orderkey", "o_totalprice", "rank").orderBy(
        "o_orderstatus", "rank"
    )


@_register(
    "u1_distinct_pairs",
    """
    SELECT DISTINCT user_id, event_type FROM events
    WHERE event_type IN ('purchase', 'signup')
    ORDER BY user_id, event_type
    """,
)
def u1_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U4: dedup via distinct."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type")
    )


@_register(
    "f16_json_extraction",
    """
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def f16_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: JSON tag extraction with scalar coercion."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k_bucket")
    )

# ---------------------------------------------------------------------------
# Vector / similarity operators (V2-V5) over the embeddings table
# ---------------------------------------------------------------------------

_QUERY_TOKENS = ["spark", "join", "merge"]
_EMBED_DIM = 64


def _query_vec() -> list:
    return deterministic_embedding(_QUERY_TOKENS, _EMBED_DIM)


def _duck_vec_literal() -> str:
    return "[" + ", ".join(repr(v) for v in _query_vec()) + "]"


def _duck_cosine(vec_expr: str, q_expr: str) -> str:
    """Explicit cosine in DuckDB mirroring the Spark zip_with/aggregate form."""
    return (
        f"(CASE WHEN sqrt(list_sum(list_transform({vec_expr}, x -> CAST(x AS DOUBLE) * x)))"
        f" * sqrt(list_sum(list_transform({q_expr}, x -> CAST(x AS DOUBLE) * x))) = 0 THEN 0.0"
        f" ELSE list_sum(list_transform(list_zip({vec_expr}, {q_expr}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({vec_expr}, x -> CAST(x AS DOUBLE) * x)))"
        f" * sqrt(list_sum(list_transform({q_expr}, x -> CAST(x AS DOUBLE) * x)))) END)"
    )


def _v2_oracle() -> str:
    cos = _duck_cosine("embedding", _duck_vec_literal())
    return f"""
    SELECT vec_id, label, round({cos}, 6) AS score
    FROM embeddings
    WHERE label <> 7
    ORDER BY score DESC, vec_id
    LIMIT 15
    """


@_register("v2_cosine_topk", None)  # oracle attached below after definition
def v2_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2+V3: payload pre-filter → exact cosine top-k, deterministic order."""
    emb = _emb(spark, sf_dir)
    hits = brute_force_topk(
        emb,
        _query_vec(),
        k=15,
        id_cols=["vec_id", "label"],
        vec_col="embedding",
        pre_filter=F.col("label") != 7,
    )
    return hits.select("vec_id", "label", portable_round(F.col("score"), 6).alias("score"))


QUERIES["v2_cosine_topk"] = (v2_cosine_topk, _v2_oracle())


def _v4_oracle() -> str:
    cos = _duck_cosine("embedding", _duck_vec_literal())
    return f"""
    WITH hits AS (
      SELECT label, round({cos}, 6) AS score, vec_id
      FROM embeddings
      ORDER BY score DESC, vec_id
      LIMIT 50)
    SELECT label, max(score) AS best_score, CAST(count(*) AS BIGINT) AS hit_count
    FROM hits GROUP BY label ORDER BY label
    """


@_register("v4_hit_collapse", None)
def v4_hit_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/V4: over-fetched hits collapsed per group key (max score + count)."""
    emb = _emb(spark, sf_dir)
    hits = brute_force_topk(
        emb, _query_vec(), k=50, id_cols=["vec_id", "label"], vec_col="embedding"
    ).select("label", portable_round(F.col("score"), 6).alias("score"))
    return (
        hits.groupBy("label")
        .agg(F.max("score").alias("best_score"), F.count(F.lit(1)).alias("hit_count"))
        .orderBy("label")
    )


QUERIES["v4_hit_collapse"] = (v4_hit_collapse, _v4_oracle())


def _knn_oracle() -> str:
    cos = _duck_cosine("c.embedding", "q.embedding")
    return f"""
    SELECT query_id, neighbor_id, score FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({cos}, 6) AS score,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY round({cos}, 6) DESC, c.vec_id) AS rn
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 5 AND c.vec_id >= 5)
    WHERE rn <= 3
    ORDER BY query_id, score DESC, neighbor_id
    """


def _v2_knn_join_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = _emb_queries(spark, sf_dir)
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding").filter(
        F.col("neighbor_id") >= 5
    )
    knn = cosine_knn_join(
        queries,
        corpus,
        k=3,
        query_id="query_id",
        corpus_id="neighbor_id",
    )
    return knn.select(
        "query_id", "neighbor_id", portable_round(F.col("score"), 6).alias("score")
    ).orderBy("query_id", F.col("score").desc(), "neighbor_id")


QUERIES["v2_knn_join"] = (_v2_knn_join_fixed, _knn_oracle())

# ---------------------------------------------------------------------------
# Text analysis over documents (F1/F2/F12/F13 generalized + pipeline ops)
# ---------------------------------------------------------------------------

_DUCK_WS_TOKENS = (
    "list_filter(string_split_regex(trim(coalesce({col}, '')), '\\s+'),"
    " t -> t <> '')"
)
_DUCK_NORM_TOKENS = (
    "list_filter(string_split_regex(trim(regexp_replace(lower(coalesce({col}, ''))"
    ", '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')"
)


@_register(
    "t1_token_counts",
    """
    SELECT doc_id,
           CAST(len(""" + _DUCK_WS_TOKENS.format(col="text") + """) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(coalesce(text, ''), '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER) AS bpe_tokens,
           CAST(length(coalesce(text, '')) AS INTEGER) AS n_chars
    FROM documents ORDER BY doc_id
    """,
)
def t1_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex + chars."""
    docs = _docs(spark, sf_dir)
    out = token_counts(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("int").alias("ws_tokens"),
        F.col("bpe_tokens").cast("int").alias("bpe_tokens"),
        F.col("n_chars").cast("int").alias("n_chars"),
    ).orderBy("doc_id")


def _quality_oracle() -> str:
    toks = _DUCK_WS_TOKENS.format(col="lower(text)")
    stop = "['the','and','of','to','is','in','that','for','with','was']"
    return f"""
    WITH t AS (
      SELECT doc_id,
             {toks} AS tokens,
             greatest(length(coalesce(text, '')), 1) AS n_chars,
             length(regexp_replace(coalesce(text, ''), '[a-zA-Z0-9\\s]', '', 'g')) AS punct_chars
      FROM documents),
    s AS (
      SELECT doc_id,
             least(CAST(len(tokens) AS DOUBLE) / 100.0, 1.0) AS length_score,
             least(CAST(len(list_filter(tokens, t -> list_contains({stop}, t))) AS DOUBLE)
                   / greatest(len(tokens), 1) * 4.0, 1.0) AS stop_score,
             least(CAST(punct_chars AS DOUBLE) / n_chars * 4.0, 1.0) AS punct_penalty,
             CAST(n_chars AS DOUBLE) / greatest(len(tokens), 1) AS mean_word_len
      FROM t)
    SELECT doc_id,
           round(length_score, 6) AS length_score,
           round(stop_score, 6) AS stopword_score,
           round(punct_penalty, 6) AS punct_ratio_penalty,
           round(0.4 * length_score + 0.3 * stop_score
                 + 0.2 * (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
                 + 0.1 * (1.0 - punct_penalty), 6) AS quality
    FROM s ORDER BY doc_id
    """


@_register("t2_quality_score", None)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics (length/punct/stopword ratios)."""
    return quality_score(_docs(spark, sf_dir), "doc_id", "text").orderBy(
        "doc_id"
    )


QUERIES["t2_quality_score"] = (t2_quality_score, _quality_oracle())


def _langid_oracle() -> str:
    toks = _DUCK_WS_TOKENS.format(col="lower(text)")
    markers = {
        "en": "['the','and','of','to','is','in','that','for','with','was']",
        "de": "['der','die','und','das','ist','nicht','ein','mit','von','zu']",
        "fr": "['le','la','et','les','des','est','une','dans','que','pour']",
        "es": "['el','la','los','que','de','en','es','una','por','con']",
    }
    score = lambda lang: (
        f"CAST(len(list_filter(tokens, t -> list_contains({markers[lang]}, t))) AS DOUBLE)"
        f" / greatest(len(tokens), 1)"
    )
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS tokens FROM documents),
    s AS (SELECT doc_id,
                 {score('de')} AS s_de, {score('en')} AS s_en,
                 {score('es')} AS s_es, {score('fr')} AS s_fr
          FROM t),
    m AS (SELECT doc_id, s_de, s_en, s_es, s_fr,
                 greatest(s_de, s_en, s_es, s_fr) AS best FROM s)
    SELECT doc_id,
           CASE WHEN best = 0 THEN 'und'
                WHEN best = s_fr THEN 'fr'
                WHEN best = s_es THEN 'es'
                WHEN best = s_en THEN 'en'
                ELSE 'de' END AS detected_lang,
           round(best, 6) AS lang_score
    FROM m ORDER BY doc_id
    """


@_register("t3_language_id", None)
def t3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID (argmax, ties -> later language code)."""
    return language_id(_docs(spark, sf_dir), "doc_id", "text").orderBy(
        "doc_id"
    )


QUERIES["t3_language_id"] = (t3_language_id, _langid_oracle())


@_register(
    "f13_tokenize_sources",
    """
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(coalesce(text, '') || ' ' || coalesce(source, '')),
                                            '[^a-z0-9]+'),
                         t -> length(t) >= 3))), ' ') AS tokens_str
    FROM documents ORDER BY doc_id
    """,
)
def f13_tokenize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: sorted deduped >=3-char tokens across several source columns."""
    docs = _docs(spark, sf_dir)
    toks = tokenize_sources(F.col("text"), F.col("source"))
    return docs.select(
        "doc_id", F.concat_ws(" ", toks).alias("tokens_str")
    ).orderBy("doc_id")


@_register(
    "a4_keyword_overlap",
    """
    SELECT doc_id,
           round(CAST(len(list_intersect(['spark','join','merge'],
             list_sort(list_distinct(list_filter(
               string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),
               t -> length(t) >= 3))))) AS DOUBLE) / 3.0, 6) AS overlap
    FROM documents ORDER BY doc_id
    """,
)
def a4_keyword_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: |plan.keywords ∩ doc tokens| / |plan.keywords|."""
    docs = _docs(spark, sf_dir)
    toks = tokenize_sources(F.col("text"))
    return docs.select(
        "doc_id",
        portable_round(keyword_overlap(toks, _QUERY_TOKENS), 6).alias("overlap"),
    ).orderBy("doc_id")

# ---------------------------------------------------------------------------
# Deduplication family (exact, MinHash-LSH, SimHash, n-gram Jaccard)
# ---------------------------------------------------------------------------

_DUCK_SHINGLES3 = """
list_distinct([array_to_string(list_slice(tokens, i, i + 2), ' ')
               FOR i IN range(1, greatest(len(tokens) - 2, 1) + 1)])
"""


@_register(
    "d1_exact_dedup_groups",
    """
    WITH hashed AS (
      SELECT doc_id,
             md5(substring(coalesce(text, ''), 1, 40)) AS dup_hash
      FROM documents)
    SELECT dup_hash, min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS dup_count
    FROM hashed GROUP BY dup_hash
    ORDER BY dup_hash
    """,
)
def d1_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-group documents by content prefix digest."""
    docs = _docs(spark, sf_dir)
    hashed = docs.select(
        "doc_id",
        F.md5(F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40)).alias(
            "dup_hash"
        ),
    )
    return (
        hashed.groupBy("dup_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .orderBy("dup_hash")
    )


def _minhash_lsh_oracle(num_hashes: int = 16, bands: int = 4, min_j: float = 0.1) -> str:
    from ..functions.hashing import MINHASH_PRIME, minhash_constants

    rows = num_hashes // bands
    toks = _DUCK_NORM_TOKENS.format(col="text")
    base = (
        f"(('0x' || substring(md5('mh:' || s), 1, 15))::BIGINT % {MINHASH_PRIME})"
    )
    consts = minhash_constants(num_hashes)
    sig_items = ", ".join(
        f"list_min(list_transform(shingles, s -> ({a} * {base} + {b}) % {MINHASH_PRIME}))"
        for a, b in consts
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS tokens FROM documents),
    sh AS (
      SELECT doc_id, {_DUCK_SHINGLES3} AS shingles FROM toks),
    sig AS (
      SELECT doc_id, shingles,
             [{sig_items}] AS signature
      FROM sh),
    bands AS (
      SELECT doc_id, shingles, unnest(
        [CAST(b AS VARCHAR) || ':' ||
         md5(array_to_string(list_transform(
             list_slice(signature, b * {rows} + 1, b * {rows} + {rows}),
             x -> CAST(x AS VARCHAR)), ','))
         FOR b IN range({bands})]) AS band
      FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.shingles AS sh_a, b.shingles AS sh_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                 / len(list_distinct(list_concat(sh_a, sh_b))), 6) AS jaccard
    FROM pairs
    WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
          / len(list_distinct(list_concat(sh_a, sh_b))) >= {min_j}
    ORDER BY id_a, id_b
    """


_LSH_PAIR_CACHE: Dict[tuple, DataFrame] = {}


def _prune_lsh_cache() -> None:
    """Drop cache entries whose SparkSession has stopped: a dead entry
    pins checkpoint blocks and the session object for process lifetime
    (a leak in long-lived multi-session processes), and its id(spark)
    key could even be reused by a new session after GC."""
    for key in list(_LSH_PAIR_CACHE):
        try:
            ctx = _LSH_PAIR_CACHE[key].sparkSession.sparkContext
            stopped = ctx._jsc is None
        except Exception:
            stopped = True
        if stopped:
            del _LSH_PAIR_CACHE[key]


def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup candidate pairs, materialized ONCE per
    (session, sf_dir): d2 (pairs), d8 (clusters), d10 (resolution), and
    d11 (rank) all consume the SAME candidate edge list, and a
    production curation DAG materializes that pair stage once and fans
    out (pipeline.py does exactly this) — re-running the MinHash sweep
    per consumer would be the real-world mistake, not an engine
    property.  minhash_lsh_candidates already returns an EAGER
    localCheckpoint (truncated lineage, blocks held while the frame is
    referenced), so the dict holds that frame directly — an extra
    persist() would store a second copy of the same id-pair data.
    Contract: a cached sf_dir's corpus is immutable (true for the
    driver's read-only testdata); a mutable corpus must not use this
    cache.  Cache size is bounded by LIVE sessions x sf_dirs in-process
    (stopped sessions' entries are pruned on every access)."""
    _prune_lsh_cache()
    key = (id(spark), sf_dir)
    if key not in _LSH_PAIR_CACHE:
        from ..operators.dedup import minhash_route

        docs = _docs(spark, sf_dir)
        # planner-routed dial (round 11): at the declared 0.1 threshold
        # the planner PROVES pruning infeasible (best target-reaching
        # banding (66, 66, 1) admits 97% of all-pairs as background —
        # "LSH" there is all-pairs wearing a shuffle), so the route
        # returns the declared (16, 4) fallback: the tractability
        # compromise, detection-at-0.1 ~0.0004 by the S-curve, i.e.
        # only strong near-dups (J >~ 0.7, detection > 0.55) are
        # reliably surfaced — the semantics the mirrored oracle pins.
        # The asserts are the static-oracle tripwire: if the planner
        # ever routes differently, the entry must fail loudly rather
        # than drift from its (16, 4) mirror.  The prunable-regime
        # counterpart entries are d24 (frozen planned dial) and d26
        # (corpus-adaptive planned dial, bracket-mirrored oracle).
        # footer row count (round 15): identical to docs.count() on the
        # immutable driver table, zero Spark jobs (vs a full scan +
        # _spread exchange per cache miss)
        hashes, bands, plan = minhash_route(
            _table_rows(sf_dir, "documents"), 0.1
        )
        assert not plan.prunes and (hashes, bands) == (16, 4), (
            f"minhash_route returned ({hashes}, {bands}, prunes="
            f"{plan.prunes}) but d2/d8/d10/d11's oracle mirrors (16, 4)"
        )
        _LSH_PAIR_CACHE[key] = minhash_lsh_candidates(
            docs, "doc_id", "text",
            shingle_n=3, num_hashes=hashes, bands=bands, min_jaccard=0.1,
        )
    return _LSH_PAIR_CACHE[key]


@_register("d2_minhash_lsh_pairs", None)
def d2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs with exact Jaccard verify."""
    pairs = _lsh_pairs(spark, sf_dir)
    return pairs.select(
        "id_a", "id_b", portable_round(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


QUERIES["d2_minhash_lsh_pairs"] = (d2_minhash_lsh_pairs, _minhash_lsh_oracle())


@_register(
    "d24_minhash_planned_dedup",
    _minhash_lsh_oracle(num_hashes=50, bands=25, min_j=0.5),
)
def d24_minhash_planned_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup at a PLANNER-SIZED operating point: the
    (50 hashes, 25 bands, 2 rows/band) banding is
    ``minhash_banding_plan(n_rows=500, threshold=0.5,
    target_recall=0.999)``'s recommendation (500 = the gate corpus's
    document count) — detection 0.9992 at the
    threshold versus the default (16, 4) dial's 0.23 (the S-curve gap
    the planner exists to close; measured at recall 1.0 vs 0.306 over
    planted positives in SCALE_SMOKE `minhash_planner`).

    The dial is FROZEN at the gate-corpus plan rather than re-planned
    per run: the oracle mirrors the banding arithmetic hash-for-hash in
    SQL, so a static dial keeps the entry bit-exact at EVERY scale
    factor (the d2 contract), while a runtime-planned dial would change
    shape under a static oracle — exactly the dial-regime trap the
    round-10 three-sf sweep exists to catch.  At larger corpora the
    planner buys more rows per band (5k docs → (156, 52, 3); the
    monotonicity is property-tested) and a production caller re-plans
    per corpus; recall at the planned points is the probe's committed
    measurement, and THIS entry pins the non-default-shape pipeline
    (a 50-hash signature, 2-row bands, a 25-way band explode) against
    the independent DuckDB mirror."""
    from ..operators.dedup import minhash_lsh_candidates

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text",
        shingle_n=3, num_hashes=50, bands=25, min_jaccard=0.5,
    )
    return pairs.select(
        "id_a", "id_b", portable_round(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


# d25: the hyperplane planner's PRUNING arm, oracle-pinned (the d24
# freezing convention applied to the cosine family).  Dial notes:
#   * threshold 0.8 — the regime hyperplane LSH exists for (d7's 0.35
#     is proven non-prunable by lsh_plan_for and routes exact).
#   * (9 planes, 51 tables) = lsh_plan_for(550, 0.8, target_recall=0.999)
#     — the gate corpus is 500 embeddings + 50 planted twins.  FROZEN at
#     the gate plan so the static oracle mirrors one banding at every
#     scale factor; candidate fraction is dial-only (0.0949), so the
#     frozen dial stays pruning at sf0.1 too.
#   * planted twins: the synthetic corpus is near-uniform (max background
#     cosine 0.60 at sf0.1), so without plants the entry would be
#     vacuously empty.  Twin of row id (id < 50): id + 1000000, vector
#     v_i + (u(id,i)*2 - 1) * 0.09 with u = md5_60('tw:id:i') / 2^60 —
#     pure double arithmetic both engines compute bit-identically;
#     cosine(v, twin) ≈ 0.92 - 0.96, comfortably above threshold.
_D25_THRESHOLD = 0.8
_D25_PLANES = 9
_D25_TABLES = 51
_D25_DELTA = 0.09
_D25_TWINS = 50
_D25_QUANT = 1_000_000
_D25_PLANE_MOD = 2_000_001  # 2 * PORTABLE_PLANE_SCALE + 1
_HASH60_DIV = "1152921504606846976.0"  # 2^60 as a double literal


# shared CTE text for the d25/d27 oracles: the augmented corpus (base),
# its quantized integer form (q), and a per-(table, plane) INTEGER plane
# vector CTE + the zipped exact dot.  The dot runs as one 64-element
# list op per (row, table, plane) pair instead of exploding a
# (row × table × plane × dim) cross join through a hash aggregate —
# measured 141 s → seconds on the sf0.1 oracle.  All arithmetic stays
# BIGINT (products ≤ ~1.2e12, sums ≤ ~7.7e13 — exact), mirroring the
# Spark UDF's int64 matmul value-for-value.
def _d25_base_q_ctes() -> str:
    twin_u = (
        "(('0x' || substring(md5('tw:' || CAST(vec_id AS VARCHAR) || ':' "
        "|| CAST(i AS VARCHAR)), 1, 15))::BIGINT / " + _HASH60_DIV + ")"
    )
    return f"""base AS (
      SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS id,
             [CAST(embedding[i + 1] AS DOUBLE)
              + ({twin_u} * 2.0 - 1.0) * {_D25_DELTA}
              FOR i IN range({_EMBED_DIM})] AS v
      FROM embeddings WHERE vec_id < {_D25_TWINS}),
    q AS (
      SELECT id,
             [CAST(floor(v[i + 1] * {_D25_QUANT}.0 + 0.5) AS BIGINT)
              FOR i IN range({_EMBED_DIM})] AS qv
      FROM base)"""


def _hyperplane_band_ctes(
    suffix: str, planes: int, tables: int, gate: str = ""
) -> str:
    """planes/sig/cand chain for one banding (optionally gated on a
    corpus-count bracket predicate), over the shared base/q CTEs."""
    plane_c = (
        "((('0x' || substring(md5('hp:' || CAST(t.range AS VARCHAR) || ':' "
        "|| CAST(p.range AS VARCHAR) || ':' || CAST(i AS VARCHAR)), "
        f"1, 15))::BIGINT) % {_D25_PLANE_MOD}) - {_D25_PLANE_MOD // 2}"
    )
    return f"""planes{suffix} AS (
      SELECT t.range AS t, p.range AS p,
             [{plane_c} FOR i IN range({_EMBED_DIM})] AS cv
      FROM range({tables}) t, range({planes}) p{gate}),
    sig{suffix} AS (
      SELECT q.id, pl.t,
             sum(CASE WHEN list_sum(list_transform(
                        list_zip(q.qv, pl.cv), x -> x[1] * x[2])) >= 0
                      THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS band
      FROM q, planes{suffix} pl GROUP BY q.id, pl.t),
    cand{suffix} AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM sig{suffix} a JOIN sig{suffix} b
        ON a.t = b.t AND a.band = b.band AND a.id < b.id)"""


def _d25_oracle() -> str:
    cos = _duck_cosine("a.v", "b.v")
    return f"""
    WITH {_d25_base_q_ctes()},
    {_hyperplane_band_ctes("", _D25_PLANES, _D25_TABLES)},
    scored AS (
      SELECT c.id_a, c.id_b,
             floor({cos} * 1000000 + 0.5) / 1000000 AS score
      FROM cand c
      JOIN base a ON a.id = c.id_a
      JOIN base b ON b.id = c.id_b)
    SELECT id_a, id_b, score FROM scored
    WHERE score >= {_D25_THRESHOLD}
    ORDER BY id_a, id_b
    """


def _d25_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings as double vectors plus the 50 planted near-dup twins —
    every float op mirrored expression-for-expression in _d25_oracle's
    base CTE (single add/multiply chains, no summation-order hazard)."""
    emb = _emb(spark, sf_dir)
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    def perturb(x, i):
        c = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("tw:"),
                        F.col("vec_id").cast("string"),
                        F.lit(":"),
                        i.cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        u = c / F.lit(float(1 << 60))
        return x.cast("double") + (u * F.lit(2.0) - F.lit(1.0)) * F.lit(
            _D25_DELTA
        )

    twins = emb.filter(F.col("vec_id") < _D25_TWINS).select(
        (F.col("vec_id") + F.lit(1000000)).alias("id"),
        F.transform("embedding", perturb).alias("v"),
    )
    return base.unionByName(twins)


@_register("d25_hyperplane_planned_neardup", _d25_oracle())
def d25_hyperplane_planned_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup in the PRUNING regime, oracle-pinned: the
    planner arm d7 structurally cannot exercise (its 0.35 threshold is
    proven non-prunable; its oracle is exact all-pairs) runs here at
    threshold 0.8 with the planned (9, 51) banding mirrored
    HASH-FOR-HASH by the DuckDB oracle — signatures are exact int64
    arithmetic over md5-derived integer planes
    (portable_hyperplanes/portable_signatures_udf), so both engines
    compute identical band values and identical candidate sets, making
    the entry bit-exact at every scale factor regardless of LSH recall
    (the d24 convention for the Jaccard family, applied to cosine).

    The corpus is near-uniform (max background cosine 0.60), so 50
    deterministic near-dup twins (cos ≈ 0.92-0.96) are planted by pure
    double arithmetic both engines share; the dial keeps the random-
    candidate fraction at 0.0949 — the pruning behaviour the planner
    promised, measured against all-pairs in SCALE_SMOKE
    `hyperplane_planned`.  The FROZEN dial's candidate volume is
    quadratic in corpus size by design (fraction is dial-only);
    ``d27_hyperplane_adaptive_neardup`` is the corpus-adaptive twin
    whose bracketed dial keeps the fraction falling instead."""
    from ..operators.dedup import portable_hyperplane_neardup

    aug = _d25_augmented(spark, sf_dir)
    out = portable_hyperplane_neardup(
        aug, "id", "v", _D25_THRESHOLD, dim=_EMBED_DIM,
        n_planes=_D25_PLANES, n_tables=_D25_TABLES, quant=_D25_QUANT,
    )
    return out.orderBy("id_a", "id_b")


_D27_BRACKET_CAP = 1_000_000


def _hyperplane_adaptive_brackets(
    threshold: float = _D25_THRESHOLD, target_recall: float = 0.999
) -> "list[tuple[int, int, int, int]]":
    """(count_lo, count_hi, n_planes, n_tables) rows mirroring
    ``hyperplane_planned_dial``'s decade step function through the
    _D27_BRACKET_CAP ceiling, adjacent equal dials merged — the d26
    bracket-table discipline applied to the cosine family, derived from
    the same function both the Spark entry and the SQL oracle use."""
    from ..operators.dedup import hyperplane_planned_dial

    out: "list[list[int]]" = []
    for lo, hi, rep in (
        (0, 1_000, 500),
        (1_000, 10_000, 5_000),
        (10_000, 100_000, 50_000),
        (100_000, 1_000_000, 500_000),
    ):
        p = hyperplane_planned_dial(rep, threshold, target_recall)
        if out and out[-1][1] == lo and out[-1][2:] == [p.n_planes, p.n_tables]:
            out[-1][1] = hi
        else:
            out.append([lo, hi, p.n_planes, p.n_tables])
    return [tuple(row) for row in out]


def _d27_oracle() -> str:
    """The d25 oracle with the banding chosen per corpus-size BRACKET:
    the shared base/q CTEs stay identical; each bracket gets its own
    planes/sig/cand chain whose planes CTE is gated on the augmented
    corpus count, so exactly one branch materializes planes (and
    therefore candidates) — the static-string mirror of
    ``hyperplane_planned_dial``.  The corpus count in SQL is
    ``count(*) + {twins}`` because the entry plants the d25 twins."""
    cos = _duck_cosine("a.v", "b.v")
    cnt = f"(SELECT count(*) + {_D25_TWINS} FROM embeddings)"
    ctes = [_d25_base_q_ctes()]
    cands = []
    for bi, (lo, hi, planes, tables) in enumerate(_hyperplane_adaptive_brackets()):
        gate = f"\n      WHERE {cnt} >= {lo} AND {cnt} < {hi}"
        ctes.append(_hyperplane_band_ctes(str(bi), planes, tables, gate))
        cands.append(f"SELECT id_a, id_b FROM cand{bi}")
    union = "\n      UNION ALL ".join(cands)
    return (
        "WITH " + ",\n    ".join(ctes) + f""",
    cand AS ({union}),
    scored AS (
      SELECT c.id_a, c.id_b,
             floor({cos} * 1000000 + 0.5) / 1000000 AS score
      FROM cand c
      JOIN base a ON a.id = c.id_a
      JOIN base b ON b.id = c.id_b)
    SELECT id_a, id_b, score FROM scored
    WHERE score >= {_D25_THRESHOLD}
    ORDER BY id_a, id_b
    """
    )


@_register("d27_hyperplane_adaptive_neardup", _d27_oracle())
def d27_hyperplane_adaptive_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d25's pruning-arm pipeline with the dial PLANNED FROM THE CORPUS
    at run time — the d26 adaptivity applied to the cosine family, and
    the answer to d25's documented frozen-dial trade (a static dial's
    candidate volume is quadratic in corpus size; the planner's dial
    keeps the fraction FALLING instead: (9, 51)/0.095 at the 550-row
    gate corpus, (12, 105)/0.025 at sf0.1's 2,050 rows).  The entry
    counts the augmented corpus, takes ``hyperplane_planned_dial``'s
    decade-quantized banding, and runs the portable integer pipeline;
    the oracle carries one banding chain per corpus bracket, gated on
    ``count(*) + 50``, each chain mirroring its banding hash-for-hash —
    so the entry stays bit-exact at every scale factor while the dial
    steps across the sweep."""
    from ..operators.dedup import (
        hyperplane_planned_dial,
        portable_hyperplane_neardup,
    )

    aug = _d25_augmented(spark, sf_dir)
    # one aggregate replaces aug.count(): base + twin counts together.
    # The oracle's bracket gate hardcodes count(*) + 50, but the entry
    # plants only min(50, rows with vec_id < 50) twins — assert the
    # corpus actually carries the 50 twin sources, or the two engines
    # would sit at different corpus counts and could pick different
    # bracket dials (round-12 ADVICE)
    # round 15: aggregate over the RAW scan — the count doesn't need
    # _spread's 32-way exchange (identical numbers, one scan-only job)
    counts = _t(spark, sf_dir, "embeddings").agg(
        F.count(F.lit(1)).alias("_n_base"),
        F.sum(
            F.when(F.col("vec_id") < _D25_TWINS, 1).otherwise(0)
        ).alias("_n_twins"),
    ).head()
    assert counts["_n_twins"] == _D25_TWINS, (
        f"corpus has only {counts['_n_twins']} of the {_D25_TWINS} twin "
        "source rows (vec_id < 50): the oracle's count(*) + 50 bracket "
        "gate would disagree with the entry's corpus count"
    )
    n = counts["_n_base"] + counts["_n_twins"]
    assert n < _D27_BRACKET_CAP, (
        f"corpus of {n} rows is past the oracle's bracket table — "
        "extend _hyperplane_adaptive_brackets before trusting the mirror"
    )
    plan = hyperplane_planned_dial(n, _D25_THRESHOLD)
    assert plan.prunes  # threshold 0.8 is the prunable regime
    out = portable_hyperplane_neardup(
        aug, "id", "v", _D25_THRESHOLD, dim=_EMBED_DIM,
        n_planes=plan.n_planes, n_tables=plan.n_tables, quant=_D25_QUANT,
        n_rows=n,
    )
    return out.orderBy("id_a", "id_b")


_D26_THRESHOLD = 0.5
_D26_BRACKET_CAP = 1_000_000


def _minhash_adaptive_brackets(
    threshold: float = _D26_THRESHOLD, target_recall: float = 0.999
) -> "list[tuple[int, int, int, int]]":
    """(count_lo, count_hi, num_hashes, bands) rows mirroring
    ``minhash_planned_dial``'s decade step function through the
    _D26_BRACKET_CAP corpus ceiling, adjacent equal dials merged — the
    bracket table BOTH the Spark entry and the SQL oracle derive their
    dial from, so they cannot disagree by construction."""
    from ..operators.dedup import minhash_planned_dial

    out: "list[list[int]]" = []
    for lo, hi, rep in (
        (0, 1_000, 500),
        (1_000, 10_000, 5_000),
        (10_000, 100_000, 50_000),
        (100_000, 1_000_000, 500_000),
    ):
        p = minhash_planned_dial(rep, threshold, target_recall)
        if out and out[-1][1] == lo and out[-1][2:] == [p.num_hashes, p.bands]:
            out[-1][1] = hi
        else:
            out.append([lo, hi, p.num_hashes, p.bands])
    return [tuple(row) for row in out]


def _minhash_adaptive_oracle(min_j: float = _D26_THRESHOLD) -> str:
    """The d2 oracle parameterized by the PLANNED dial per corpus-size
    bracket: one banding pipeline per bracket, each branch's documents
    scan gated on ``count(*)`` so exactly one branch is non-empty — the
    static-string mirror of a runtime-planned dial.  Signature hashing
    is restructured to ONE md5 per shingle (the base hash precomputed,
    then cheap (a*h+b) mod P per hash function — the minhash_expr
    discipline), which keeps the 156-hash branch affordable."""
    from ..functions.hashing import MINHASH_PRIME, minhash_constants

    toks = _DUCK_NORM_TOKENS.format(col="text")
    base = (
        f"(('0x' || substring(md5('mh:' || s), 1, 15))::BIGINT % {MINHASH_PRIME})"
    )
    cnt = "(SELECT count(*) FROM documents)"
    ctes = []
    finals = []
    for bi, (lo, hi, num_hashes, bands) in enumerate(_minhash_adaptive_brackets(min_j)):
        rows = num_hashes // bands
        consts = minhash_constants(num_hashes)
        sig_items = ", ".join(
            f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
            for a, b in consts
        )
        ctes.append(f"""
    toks{bi} AS (
      SELECT doc_id, {toks} AS tokens FROM documents
      WHERE {cnt} >= {lo} AND {cnt} < {hi}),
    sh{bi} AS (
      SELECT doc_id, {_DUCK_SHINGLES3} AS shingles FROM toks{bi}),
    hs{bi} AS (
      SELECT doc_id, shingles,
             list_transform(shingles, s -> {base}) AS hs
      FROM sh{bi}),
    sig{bi} AS (
      SELECT doc_id, shingles, [{sig_items}] AS signature FROM hs{bi}),
    bands{bi} AS (
      SELECT doc_id, shingles, unnest(
        [CAST(b AS VARCHAR) || ':' ||
         md5(array_to_string(list_transform(
             list_slice(signature, b * {rows} + 1, b * {rows} + {rows}),
             x -> CAST(x AS VARCHAR)), ','))
         FOR b IN range({bands})]) AS band
      FROM sig{bi}),
    pairs{bi} AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.shingles AS sh_a, b.shingles AS sh_b
      FROM bands{bi} a JOIN bands{bi} b
        ON a.band = b.band AND a.doc_id < b.doc_id)""")
        finals.append(f"""
      SELECT id_a, id_b,
             round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                   / len(list_distinct(list_concat(sh_a, sh_b))), 6) AS jaccard
      FROM pairs{bi}
      WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
            / len(list_distinct(list_concat(sh_a, sh_b))) >= {min_j}""")
    return (
        "WITH " + ",".join(ctes)
        + "\n    SELECT id_a, id_b, jaccard FROM ("
        + "\n      UNION ALL".join(finals)
        + ")\n    ORDER BY id_a, id_b"
    )


@_register("d26_minhash_adaptive_dedup", _minhash_adaptive_oracle())
def d26_minhash_adaptive_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup with the dial PLANNED FROM THE CORPUS at run
    time — the loop d24 left open (its dial is frozen at the gate-corpus
    plan).  The entry counts the corpus, takes
    ``minhash_planned_dial(n, 0.5)``'s decade-quantized banding, and
    runs the standard candidates-then-exact-verify pipeline; the DuckDB
    mirror carries one banding pipeline per corpus-size bracket, gated
    on ``count(*)``, so the SAME planned dial is mirrored hash-for-hash
    whatever scale factor the driver runs — the dial actually CHANGES
    across the committed sweeps ((50, 25) at the 500-doc sf0.001/sf0.01
    corpora, (156, 52) at the 5,000-doc sf0.1 corpus) and the entry
    stays bit-exact at each.  Production callers use the un-quantized
    planner directly; the brackets exist so a static oracle can follow
    the dial (extension past 10^6 docs is one more generated branch —
    the assert below keeps Spark and the oracle honest about the
    ceiling)."""
    from ..operators.dedup import minhash_lsh_candidates, minhash_planned_dial

    docs = _docs(spark, sf_dir)
    # footer row count (round 15): identical to docs.count(), zero jobs
    n = _table_rows(sf_dir, "documents")
    assert n < _D26_BRACKET_CAP, (
        f"corpus of {n} docs is past the oracle's bracket table — "
        "extend _minhash_adaptive_brackets before trusting the mirror"
    )
    plan = minhash_planned_dial(n, _D26_THRESHOLD)
    assert plan.prunes  # threshold 0.5 is the prunable regime
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text",
        shingle_n=3, num_hashes=plan.num_hashes, bands=plan.bands,
        min_jaccard=_D26_THRESHOLD,
    )
    return pairs.select(
        "id_a", "id_b", portable_round(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def _ngram_jaccard_oracle(min_j: float = 0.15) -> str:
    toks = _DUCK_NORM_TOKENS.format(col="text")
    return f"""
    WITH toks AS (
      SELECT doc_id, source, {toks} AS tokens FROM documents),
    sh AS (
      SELECT doc_id, source, {_DUCK_SHINGLES3} AS shingles FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= {min_j}
    ORDER BY id_a, id_b
    """


@_register("d3_ngram_jaccard_pairs", None)
def d3_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs within a blocking key (source)."""
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, block_col="source", min_jaccard=0.15
    )
    return pairs.select(
        "id_a", "id_b", portable_round(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


QUERIES["d3_ngram_jaccard_pairs"] = (d3_ngram_jaccard_pairs, _ngram_jaccard_oracle())


def _simhash_oracle(bits: int = 16) -> str:
    toks = _DUCK_NORM_TOKENS.format(col="text")
    h60 = "('0x' || substring(md5('sim:' || t), 1, 15))::BIGINT"
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS tokens FROM documents),
    votes AS (
      SELECT doc_id,
             [list_sum(list_transform(tokens,
                t -> CASE WHEN ({h60} % CAST(pow(2, b + 1) AS BIGINT))
                               >= CAST(pow(2, b) AS BIGINT)
                          THEN 1 ELSE -1 END))
              FOR b IN range({bits})] AS v
      FROM t)
    SELECT doc_id,
           CAST(coalesce(list_sum([CASE WHEN v[b + 1] > 0
                       THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END
                  FOR b IN range({bits})]), 0) AS BIGINT) AS simhash
    FROM votes ORDER BY doc_id
    """


@_register("d4_simhash", None)
def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (16-bit for the oracle; bits configurable)."""
    docs = _docs(spark, sf_dir)
    return simhash_fingerprints(docs, "doc_id", "text", bits=16).orderBy("doc_id")


QUERIES["d4_simhash"] = (d4_simhash, _simhash_oracle())

# ---------------------------------------------------------------------------
# Hybrid search flagship (the reference's /query pipeline on documents)
# ---------------------------------------------------------------------------

def _hybrid_oracle() -> str:
    cos = _duck_cosine("e.embedding", _duck_vec_literal())
    toks = (
        "list_sort(list_distinct(list_filter("
        "string_split_regex(lower(coalesce(d.text, '')), '[^a-z0-9]+'),"
        " t -> length(t) >= 3)))"
    )
    return f"""
    WITH scored AS (
      SELECT d.doc_id,
             least(greatest({cos}, 0.0), 1.0) AS v_raw,
             CAST(len(list_intersect(['spark','join','merge'], {toks})) AS DOUBLE) / 3.0 AS k_raw
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE d.lang = 'en')
    SELECT doc_id,
           round(0.75 * v_raw + 0.25 * k_raw, 6) AS total_score,
           round(v_raw, 6) AS vector_score,
           round(k_raw, 6) AS keyword_score
    FROM scored
    ORDER BY total_score DESC, doc_id
    LIMIT 10
    """


@_register("hybrid_search_documents", None)
def hybrid_search_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hybrid /query pipeline re-expressed on the documents
    corpus: metadata filter (P*) → embedding join (J4) → clamped cosine (V2,
    F20) → keyword overlap (A4, F13) → 0.75/0.25 blend (F21) → top-k (O2).

    One broadcast-free equi-join + per-row codegen expressions + TakeOrdered.
    """
    docs = _docs(spark, sf_dir).filter(F.col("lang") == "en")
    emb = _emb(spark, sf_dir)
    joined = docs.join(emb, docs["doc_id"] == emb["vec_id"])
    cos = cosine_similarity(F.col("embedding"), query_vector_lit(_query_vec()))
    v_raw = F.least(F.greatest(cos, F.lit(0.0)), F.lit(1.0))
    k_raw = keyword_overlap(tokenize_sources(F.col("text")), _QUERY_TOKENS)
    scored = joined.select(
        "doc_id",
        portable_round(blend_scores(v_raw, k_raw), 6).alias("total_score"),
        portable_round(v_raw, 6).alias("vector_score"),
        portable_round(k_raw, 6).alias("keyword_score"),
    )
    return scored.orderBy(F.col("total_score").desc(), F.col("doc_id")).limit(10)


QUERIES["hybrid_search_documents"] = (hybrid_search_documents, _hybrid_oracle())


def _v5_oracle(dim: int = 8) -> str:
    toks = (
        "list_sort(list_distinct(list_filter("
        "string_split_regex(lower(coalesce(text, '')), '[^a-z0-9]+'),"
        " t -> length(t) >= 3)))"
    )
    from ..functions.embedding import _v5_constants, duckdb_bucket_sql

    dims = ", ".join(
        f"round(CASE WHEN len(tokens) = 0 THEN 0.0 ELSE "
        f"least(greatest(CAST(list_sum(list_transform(tokens, t -> "
        + duckdb_bucket_sql(a, b)
        + f")) AS DOUBLE) / 10000.0 / len(tokens), 0.0), 1.0) END, 6) AS e{i}"
        for i, (a, b) in enumerate(_v5_constants(dim))
    )
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS tokens FROM documents)
    SELECT doc_id, {dims} FROM t ORDER BY doc_id
    """


@_register("v5_deterministic_embedding", None)
def v5_deterministic_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5: the engine-defined deterministic embedding of document tokens
    (dim 8 shown column-wise for the oracle)."""
    from ..functions.embedding import deterministic_embedding_expr

    docs = _docs(spark, sf_dir)
    toks = tokenize_sources(F.col("text"))
    emb = deterministic_embedding_expr(toks, 8)
    cols = [
        portable_round(F.element_at(emb, i + 1), 6).alias(f"e{i}") for i in range(8)
    ]
    return docs.select("doc_id", *cols).orderBy("doc_id")


QUERIES["v5_deterministic_embedding"] = (v5_deterministic_embedding, _v5_oracle())


# ---------------------------------------------------------------------------
# Scalar-function packs over inline VALUES (F3, F4, F7, F19)
# ---------------------------------------------------------------------------

_DATE_VALUES = [
    "1994.09.11", "1994.9.1", "1994.??.??", "1994.??.15", "????.??.??",
    "  ", "1994", "2001.12.31", "1994.01.123", "1999.7.04",
]


@_register(
    "f4_date_normalization",
    """
    WITH raw(id, d) AS (VALUES """
    + ", ".join(f"({i}, '{v}')" for i, v in enumerate(_DATE_VALUES))
    + """),
    parts AS (
      SELECT id, d, trim(d) AS t, string_split(trim(d), '.') AS p FROM raw)
    SELECT id,
      CASE
        WHEN t = '' THEN NULL
        WHEN len(p) <> 3 THEN t
        WHEN NOT regexp_matches(trim(p[1]), '^[0-9]+$') THEN NULL
        ELSE trim(p[1]) || '-' ||
          (CASE WHEN regexp_matches(trim(p[2]), '^[0-9]{1,2}$')
                THEN lpad(trim(p[2]), 2, '0') ELSE '01' END) || '-' ||
          (CASE WHEN regexp_matches(trim(p[3]), '^[0-9]{1,2}$')
                THEN lpad(trim(p[3]), 2, '0') ELSE '01' END)
      END AS normalized
    FROM parts ORDER BY id
    """,
)
def f4_date_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: PGN date wildcards → ISO dates, as a pure Column expression."""
    rows = [(i, v) for i, v in enumerate(_DATE_VALUES)]
    df = spark.createDataFrame(rows, "id int, d string")
    t = F.trim(F.col("d"))
    p = F.split(t, "\\.")
    comp = lambda c: F.when(
        c.rlike("^[0-9]{1,2}$"), F.lpad(c, 2, "0")
    ).otherwise(F.lit("01"))
    normalized = (
        F.when(t == "", F.lit(None).cast("string"))
        .when(F.size(p) != 3, t)
        .when(~F.trim(F.element_at(p, 1)).rlike("^[0-9]+$"), F.lit(None).cast("string"))
        .otherwise(
            F.concat_ws(
                "-",
                F.trim(F.element_at(p, 1)),
                comp(F.trim(F.element_at(p, 2))),
                comp(F.trim(F.element_at(p, 3))),
            )
        )
    )
    return df.select("id", normalized.alias("normalized")).orderBy("id")


_SLUG_VALUES = [
    "King's Indian Defense", "Caro-Kann Defense", "  A  B  C ",
    "1.d4 Nf6 2.c4 e6: Indian systems with ...e6", "Grunfeld Defense", "",
]


@_register(
    "f3_slugify",
    """
    WITH raw(id, name) AS (VALUES """
    + ", ".join(f"({i}, '{v}')".replace("'s", "''s") for i, v in enumerate(_SLUG_VALUES))
    + """)
    SELECT id,
           trim(regexp_replace(regexp_replace(lower(name), '''', '', 'g'),
                               '[^a-z0-9]+', '_', 'g'), '_') AS slug
    FROM raw ORDER BY id
    """,
)
def f3_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: slugify as a Column expression."""
    from ..functions.text import slugify_expr

    rows = [(i, v) for i, v in enumerate(_SLUG_VALUES)]
    df = spark.createDataFrame(rows, "id int, name string")
    return df.select("id", slugify_expr(F.col("name")).alias("slug")).orderBy("id")


_ECO_VALUES = ["E60", "E99", "B20", "C05", "A80", "D70", "Z99", "b21", " e75 "]


def _f7_oracle() -> str:
    from ..chess.openings import ALL

    catalogue_rows = ", ".join(
        "('" + e.eco_start + "', '" + e.eco_end + "', '"
        + e.canonical.replace("'", "''") + "', '" + e.slug + "')"
        for e in ALL
    )
    eco_rows = ", ".join(f"({i}, '{v}')" for i, v in enumerate(_ECO_VALUES))
    return f"""
    WITH cat(eco_start, eco_end, canonical, slug) AS (VALUES {catalogue_rows}),
    raw(id, eco) AS (VALUES {eco_rows})
    SELECT r.id, upper(trim(r.eco)) AS eco, c.canonical, c.slug
    FROM raw r LEFT JOIN cat c
      ON upper(trim(r.eco)) BETWEEN c.eco_start AND c.eco_end
    ORDER BY r.id
    """


@_register("f7_eco_catalogue", None)
def f7_eco_catalogue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: ECO → opening catalogue broadcast range join."""
    from ..chess.openings import ALL

    cat = spark.createDataFrame(
        [(e.eco_start, e.eco_end, e.canonical, e.slug) for e in ALL],
        "eco_start string, eco_end string, canonical string, slug string",
    )
    raw = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_ECO_VALUES)], "id int, eco string"
    )
    eco_norm = F.upper(F.trim(raw["eco"]))
    joined = raw.join(
        F.broadcast(cat),
        eco_norm.between(cat["eco_start"], cat["eco_end"]),
        "left",
    )
    return joined.select(
        "id", eco_norm.alias("eco"), "canonical", "slug"
    ).orderBy("id")


QUERIES["f7_eco_catalogue"] = (f7_eco_catalogue, _f7_oracle())


# ---------------------------------------------------------------------------
# Registry accessors (the __spark_entry__ contract)
# ---------------------------------------------------------------------------

def query_map() -> Dict[str, SparkBuilder]:
    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql_map() -> Dict[str, str]:
    return {
        name: oracle for name, (_fn, oracle) in QUERIES.items() if oracle is not None
    }

# ---------------------------------------------------------------------------
# Chess-domain pipeline queries (ingest → jobs → hybrid) over inline fixtures
# ---------------------------------------------------------------------------

_CHESS_FIXTURE = """[Event "Test Event"]
[Site "Somewhere"]
[Date "2024.01.01"]
[White "Sample White"]
[Black "Sample Black"]
[Result "1-0"]

1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 1-0

[Event "KID Match"]
[Site "Testville"]
[Date "2023.05.05"]
[White "Strong, Player"]
[Black "Weaker, Player"]
[Result "1-0"]
[WhiteElo "2600"]
[BlackElo "2520"]
[ECO "E62"]
[Opening "King's Indian Defense"]

1. d4 Nf6 2. c4 g6 3. Nc3 Bg7 4. e4 d6 5. Nf3 O-O 1-0
"""


def _chess_positions_oracle() -> str:
    """Golden VALUES oracle: expected positions replayed by the pure-Python
    engine (itself pinned to the reference's golden FEN corpus)."""
    from ..chess.pgn import split_games, parse_game
    from ..chess.replay import fens_of_moves

    rows = []
    for gid, chunk in enumerate(split_games(_CHESS_FIXTURE), start=1):
        game = parse_game(chunk)
        sans = [m.san for m in game.moves]
        for ply, (san, fen) in enumerate(zip(sans, fens_of_moves(sans)), start=1):
            side = "black" if ply % 2 == 1 else "white"
            rows.append(
                f"({gid}, {ply}, '{san}', '{fen}', '{side}')"
            )
    values = ", ".join(rows)
    return f"""
    SELECT * FROM (VALUES {values}) t(game_id, ply, san, fen, side_to_move)
    ORDER BY game_id, ply
    """


@_register("chess_ingest_positions", None)
def chess_ingest_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S3 + X1/X2: PGN ingest → exploded positions table (distributed
    parse/replay via mapInPandas; golden-FEN oracle)."""
    from ..ingest import ingest_pgn_text

    result = ingest_pgn_text(spark, _CHESS_FIXTURE)
    return result.positions.select(
        "game_id", "ply", "san", "fen", "side_to_move"
    ).orderBy("game_id", "ply")


QUERIES["chess_ingest_positions"] = (chess_ingest_positions, _chess_positions_oracle())


@_register("chess_jobs_drain", None)
def chess_jobs_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-Q4 + S7: drain the embedding-jobs queue; per-status counts joined
    with the vector count (rows-only driver check; lifecycle is pinned by
    tests/test_jobs.py)."""
    from ..ingest import ingest_pgn_text
    from ..streaming import JobsState, drain_jobs

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    statuses = state.jobs.groupBy("status").agg(F.count(F.lit(1)).alias("cnt"))
    vectors = state.position_vectors.agg(
        F.lit("vectors").alias("status"), F.count(F.lit(1)).alias("cnt")
    )
    return statuses.unionByName(vectors).orderBy("status")


def _chess_jobs_oracle() -> str:
    from ..chess.pgn import parse_games

    total = sum(g.ply_count for g in parse_games(_CHESS_FIXTURE))
    return f"""
    SELECT * FROM (VALUES ('completed', CAST({total} AS BIGINT)),
                          ('vectors', CAST({total} AS BIGINT))) t(status, cnt)
    ORDER BY status
    """


QUERIES["chess_jobs_drain"] = (chess_jobs_drain, _chess_jobs_oracle())


# S11 TWIC precheck: a drop with every malformation class the reference's
# twic_precheck_command.ml:31-89 detects (clean game, no-moves, missing
# Result, bad Result token, unparseable header, headers-only tail).
_TWIC_FIXTURE = """[Event "Good Game"]
[Site "Test"]
[Result "1-0"]

1. e4 e5 2. Nf3 Nc6 1-0

[Event "Empty Game"]
[Result "*"]

*

[Event "No Result"]

1. d4 d5 2. c4 e6 3. Nc3 Nf6 4. Bg5 Be7 5. e3 O-O 6. Nf3 h6 7. Bh4 b6 8. cxd5 exd5

[Event "Bad Result"]
[Result "2-0"]

1. c4 c5

[Event "Broken Header"
1. f4 d5 *

[Event "Empty No Result"]
"""

_NO_MOVES_HINT = "Remove the block or ensure the move list is present."
_MISSING_RESULT_HINT = (
    'Add a [Result "1-0"/"0-1"/"1/2-1/2" or "*"] tag before the moves.'
)


def _twic_precheck_oracle() -> str:
    # golden rows: the reference validator's exact output on _TWIC_FIXTURE
    rows = [
        (2, 1, "No moves detected", _NO_MOVES_HINT,
         '[Event "Empty Game"]\n[Result "*"]\n\n*'),
        (3, 1, "Missing [Result] tag", _MISSING_RESULT_HINT,
         '[Event "No Result"]\n\n1. d4 d5 2. c4 e6 3. Nc3 Nf6 4. Bg5 Be7'
         ' 5. e3 O-O 6. Nf3 h6…'),
        (4, 1, "Unexpected result token '2-0'",
         "Use one of 1-0, 0-1, 1/2-1/2, or *.",
         '[Event "Bad Result"]\n[Result "2-0"]\n\n1. c4 c5'),
        (5, 1, 'Parse error: Invalid PGN header line: [Event "Broken Header"',
         "Clean up or remove this entry (often a TWIC editorial note).",
         '[Event "Broken Header"\n1. f4 d5 *'),
        (6, 1, "No moves detected", _NO_MOVES_HINT,
         '[Event "Empty No Result"]'),
        (6, 2, "Missing [Result] tag", _MISSING_RESULT_HINT,
         '[Event "Empty No Result"]'),
    ]
    values = ",\n".join(
        "({}, {}, '{}', '{}', '{}')".format(
            g, p,
            problem.replace("'", "''"),
            hint.replace("'", "''"),
            preview.replace("'", "''"),
        )
        for g, p, problem, hint, preview in rows
    )
    return f"""
    SELECT * FROM (VALUES
    {values}
    ) t(game_no, problem_no, problem, hint, preview)
    ORDER BY game_no, problem_no
    """


@_register("s11_twic_precheck", None)
def s11_twic_precheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: TWIC drop precheck — malformed-PGN issues DataFrame
    (twic_precheck_command.ml:31-89), distributed over game chunks."""
    from ..ingest import twic_precheck

    return twic_precheck(spark, _TWIC_FIXTURE).orderBy("game_no", "problem_no")


QUERIES["s11_twic_precheck"] = (s11_twic_precheck, _twic_precheck_oracle())


@_register(
    "q6_job_prune",
    """
    SELECT doc_id AS id, doc_id AS position_id,
           CASE WHEN doc_id % 2 = 0 AND doc_id % 3 <> 0 THEN 'pending'
                ELSE 'completed' END AS status
    FROM documents ORDER BY id
    """,
)
def q6_job_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: prune stale pending jobs — a pending job whose position already
    has a vector flips to completed (prune_pending_jobs.sh:29-44's
    jobs⟗position_vectors merge).  Seeded deterministically from documents:
    even doc_ids are pending jobs, every third doc_id already has a vector."""
    from ..streaming.jobs import prune_stale_jobs

    docs = _docs(spark, sf_dir).select("doc_id")
    jobs = docs.select(
        F.col("doc_id").alias("id"),
        F.col("doc_id").alias("position_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("pending"))
        .otherwise(F.lit("completed"))
        .alias("status"),
        F.lit(0).alias("attempts"),
    )
    vectors = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("position_id")
    )
    pruned = prune_stale_jobs(jobs, vectors)
    return pruned.select("id", "position_id", "status").orderBy("id")


@_register(
    "chess_hybrid_canonical",
    """
    SELECT * FROM (VALUES
      (CAST(2 AS BIGINT), 'Strong, Player', 'Weaker, Player', '1-0',
       'kings_indian_defense', CAST(0.81647 AS DOUBLE),
       CAST(0.977516 AS DOUBLE), CAST(0.333333 AS DOUBLE))
    ) t(id, white, black, result, opening_slug,
        total_score, vector_score, keyword_score)
    """,
)
def chess_hybrid_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 + §3.1 end-to-end: the canonical bench question compiled and
    executed over the ingested fixture corpus.  The oracle is the golden
    result row: the whole pipeline (ingest → deterministic embed → intent
    compile → hybrid blend) is seeded and fixture-driven, so its output is
    bit-stable and hash-checkable."""
    from ..ingest import ingest_pgn_text
    from ..query import Request, analyse
    from ..streaming import JobsState, drain_jobs
    from .hybrid import HybridTables, execute

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    plan = analyse(
        Request(
            text=(
                "Find King's Indian games where White is 2500 and Black is"
                " 100 points lower"
            )
        )
    )
    # lazy checkpoints (round 15): the hybrid execution references the
    # games/players frames from several broadcast subtrees, and each
    # one re-analyzed and re-ran the PGN-parse lineage without a
    # truncation point (drain_jobs checkpoints only its OWN copies)
    tables = HybridTables(
        games=ingest.games.localCheckpoint(eager=False),
        players=ingest.players.localCheckpoint(eager=False),
        position_vectors=state.position_vectors,
    )
    execution = execute(tables, plan, dim=8)
    return execution.results.select(
        "id", "white", "black", "result", "opening_slug",
        portable_round(F.col("total_score"), 6).alias("total_score"),
        portable_round(F.col("vector_score"), 6).alias("vector_score"),
        portable_round(F.col("keyword_score"), 6).alias("keyword_score"),
    )

@_register(
    "serve_query_canonical",
    """
    SELECT * FROM (VALUES
      (CAST(2 AS BIGINT), 'Strong, Player', 'Weaker, Player', '1-0',
       CAST(2023 AS INTEGER), 'KID Match', 'kings_indian_defense',
       'King''s Indian Defense', 'E62',
       'Strong, Player vs Weaker, Player — KID Match (1-0)',
       CAST(0.81647 AS DOUBLE), CAST(0.977516 AS DOUBLE),
       CAST(0.333333 AS DOUBLE), CAST(1 AS BIGINT), false, 'disabled',
       '#2 Strong, Player vs Weaker, Player (score 0.82)')
    ) t(game_id, white, black, result, year, event, opening_slug,
        opening_name, eco, synopsis, score, vector_score, keyword_score,
        total, has_more, agent_status, summary)
    """,
)
def serve_query_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving shim end-to-end (SURVEY §7.2 step 9): ingest →
    answer_question → response payload, flattened to one row per result
    with the response scalars alongside.  Every field of the reference's
    /query JSON contract (chessmate_api.ml:77-115, :789-806) that the
    fixture exercises is golden-checked: the result document (synopsis,
    year, opening fallbacks, scores), the paging scalars, agent_status,
    and the result_formatter summary line."""
    import math

    from ..ingest import ingest_pgn_text
    from ..query import answer_question
    from ..streaming import JobsState, drain_jobs
    from .hybrid import HybridTables

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    # lazy checkpoints (round 15): the hybrid execution references the
    # games/players frames from several broadcast subtrees, and each
    # one re-analyzed and re-ran the PGN-parse lineage without a
    # truncation point (drain_jobs checkpoints only its OWN copies)
    tables = HybridTables(
        games=ingest.games.localCheckpoint(eager=False),
        players=ingest.players.localCheckpoint(eager=False),
        position_vectors=state.position_vectors,
    )
    payload = answer_question(
        spark, tables,
        "Find King's Indian games where White is 2500 and Black is"
        " 100 points lower",
        dim=8,
    )

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = [
        (
            r["game_id"], r["white"], r["black"], r["result"], r["year"],
            r["event"], r["opening_slug"], r["opening_name"], r["eco"],
            r["synopsis"], r6(r["score"]), r6(r["vector_score"]),
            r6(r["keyword_score"]), payload["total"], payload["has_more"],
            payload["agent_status"], payload["summary"],
        )
        for r in payload["results"]
    ]
    return spark.createDataFrame(
        rows,
        "game_id long, white string, black string, result string,"
        " year int, event string, opening_slug string,"
        " opening_name string, eco string, synopsis string,"
        " score double, vector_score double, keyword_score double,"
        " total long, has_more boolean, agent_status string,"
        " summary string",
    )


@_register(
    "serve_query_batch",
    """
    SELECT * FROM (VALUES
      (CAST(0 AS INTEGER), CAST(1 AS INTEGER), CAST(2 AS BIGINT),
       'Strong, Player', 'Weaker, Player', '1-0', 'kings_indian_defense',
       CAST(0.81647 AS DOUBLE), CAST(1 AS BIGINT), false),
      (CAST(1 AS INTEGER), CAST(0 AS INTEGER), CAST(NULL AS BIGINT),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), CAST(0 AS BIGINT),
       false),
      (CAST(2 AS INTEGER), CAST(1 AS INTEGER), CAST(1 AS BIGINT),
       'Sample White', 'Sample Black', '1-0', 'unknown_opening',
       CAST(0.793055 AS DOUBLE), CAST(2 AS BIGINT), false),
      (CAST(2 AS INTEGER), CAST(2 AS INTEGER), CAST(2 AS BIGINT),
       'Strong, Player', 'Weaker, Player', '1-0', 'kings_indian_defense',
       CAST(0.66861 AS DOUBLE), CAST(2 AS BIGINT), false)
    ) t(question_id, rank, game_id, white, black, result, opening_slug,
        score, total, has_more)
    ORDER BY question_id, rank
    """,
)
def serve_query_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch multi-question serving end-to-end (round-8; round-7
    verdict #4): three questions — the canonical hit, a no-match
    (Sicilian: empty page with total=0), and a result-filter page —
    answered by ``batch_answer`` (query/serve.py), which compiles ALL
    plans into ONE DataFrame program (plans/hybrid_batch.py): the
    summaries join is scanned once and rows fan out to matching
    questions by an array-of-predicates explode, totals are one
    grouped count, pages one question-partitioned window, the vector
    side one scan scored against the broadcast query vectors, and the
    scoring tail MIRRORS hybrid's ``_score_page`` with plan literals
    replaced by metadata columns (payload identity pinned by
    test_serving.py).  Two Spark actions for the whole batch vs four
    per question — the batch answer to the reference's ~500 req/s
    serving rate (chessmate_api.ml:586-724 generalized to a question
    batch); measured ~30x the one-at-a-time rate at N=64
    (SERVE_BENCH.json batch_mode).

    The golden oracle pins every question's ordered result documents
    AND the empty-question contract (rank 0, NULL document, total=0);
    tests/test_serving.py additionally proves payload-identity against
    the per-question ``answer_question`` loop over a wider set."""
    import math

    from ..ingest import ingest_pgn_text
    from ..query import batch_answer
    from ..streaming import JobsState, drain_jobs
    from .hybrid import HybridTables

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    # lazy checkpoints (round 15): the hybrid execution references the
    # games/players frames from several broadcast subtrees, and each
    # one re-analyzed and re-ran the PGN-parse lineage without a
    # truncation point (drain_jobs checkpoints only its OWN copies)
    tables = HybridTables(
        games=ingest.games.localCheckpoint(eager=False),
        players=ingest.players.localCheckpoint(eager=False),
        position_vectors=state.position_vectors,
    )
    questions = [
        "Find King's Indian games where White is 2500 and Black is"
        " 100 points lower",
        "Show me Sicilian games",
        "games won by white",
    ]
    payloads = batch_answer(spark, tables, questions, dim=8)

    def r6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = []
    for i, p in enumerate(payloads):
        if not p["results"]:
            rows.append(
                (i, 0, None, None, None, None, None, None,
                 p["total"], p["has_more"])
            )
        for rank, r in enumerate(p["results"], 1):
            rows.append(
                (i, rank, r["game_id"], r["white"], r["black"],
                 r["result"], r["opening_slug"], r6(r["score"]),
                 p["total"], p["has_more"])
            )
    return spark.createDataFrame(
        rows,
        "question_id int, rank int, game_id long, white string,"
        " black string, result string, opening_slug string,"
        " score double, total long, has_more boolean",
    ).orderBy("question_id", "rank")


# ---------------------------------------------------------------------------
# Multimodal binary columns (opaque blobs + typed metadata)
# ---------------------------------------------------------------------------

@_register(
    "m1_binary_features",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(coalesce(text, ''))) AS INTEGER) AS blob_len,
           md5(coalesce(text, '')) AS blob_md5,
           lower(hex(encode(substring(coalesce(text, ''), 1, 4)))) AS magic_hex
    FROM documents ORDER BY media_id
    """,
)
def m1_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column features (length / digest / magic bytes) — all
    JVM-side.  The fake blob is the utf-8 text, so the oracle can mirror via
    VARCHAR ops (documents are ASCII; bytes == chars)."""
    from ..operators.multimodal import attach_fake_media, binary_features

    media = attach_fake_media(_docs(spark, sf_dir), "doc_id", "text")
    out = binary_features(media)
    return out.select(
        "media_id",
        F.col("blob_len").cast("int").alias("blob_len"),
        "blob_md5", "magic_hex",
    ).orderBy("media_id")


@_register(
    "m2_image_decode_stub",
    """
    WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx FROM documents)
    SELECT doc_id AS media_id,
           true AS decoded,
           CAST(((strpos('0123456789abcdef', substr(hx,1,1))-1)*16 + strpos('0123456789abcdef', substr(hx,2,1))-1) * 4 + 16 AS INTEGER) AS width,
           CAST(((strpos('0123456789abcdef', substr(hx,3,1))-1)*16 + strpos('0123456789abcdef', substr(hx,4,1))-1) * 4 + 16 AS INTEGER) AS height,
           ((strpos('0123456789abcdef', substr(hx,5,1))-1)*16 + strpos('0123456789abcdef', substr(hx,6,1))-1) / 255.0 AS mean_r,
           ((strpos('0123456789abcdef', substr(hx,7,1))-1)*16 + strpos('0123456789abcdef', substr(hx,8,1))-1) / 255.0 AS mean_g,
           ((strpos('0123456789abcdef', substr(hx,9,1))-1)*16 + strpos('0123456789abcdef', substr(hx,10,1))-1) / 255.0 AS mean_b,
           'stub-decoder (no codec libs in container)' AS decode_note
    FROM h ORDER BY media_id
    """,
)
def m2_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode stage, pinned to ``codec='stub'``: the fake
    blobs are utf-8 text, and the deterministic md5-derived stats are what
    the DuckDB oracle recomputes from the hex digest — so the mapInPandas
    plumbing is hash-checked end to end regardless of whether PIL exists.
    The REAL body (``codec='pil'``, same signature/schema) is unit-tested
    wherever PIL is importable (tests/test_multimodal.py)."""
    from ..operators.multimodal import attach_fake_media, decode_image_features

    media = attach_fake_media(_docs(spark, sf_dir), "doc_id", "text")
    return decode_image_features(media, codec="stub").orderBy("media_id")


@_register(
    "m3_byte_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unnest(string_split(coalesce(text, ''), '')) AS c
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n
      FROM ch WHERE c <> '' GROUP BY doc_id, c
    ),
    tot AS (SELECT doc_id, sum(n) AS total FROM cnt GROUP BY doc_id),
    ent AS (
      SELECT cnt.doc_id,
             floor(-sum((n/total) * log2(n/total)) * 1000000 + 0.5) / 1000000
               AS entropy
      FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id
    )
    SELECT d.doc_id AS media_id, CAST(coalesce(ent.entropy, 0.0) AS DOUBLE) AS entropy
    FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
    ORDER BY media_id
    """,
)
def m3_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon byte-entropy triage over binary blobs (pandas UDF).  The
    fixture blob is the utf-8 text and documents are ASCII, so the DuckDB
    oracle reproduces the byte histogram from a character split."""
    from ..operators.multimodal import attach_fake_media, byte_entropy

    media = attach_fake_media(_docs(spark, sf_dir), "doc_id", "text")
    return byte_entropy(media).orderBy("media_id")

# ---------------------------------------------------------------------------
# Result formatting (O5/F18/F19) and agent blending (X7 stub + F21)
# ---------------------------------------------------------------------------

@_register(
    "o5_result_formatting",
    """
    SELECT printf('#%d %s — %s (%.2f)', o_orderkey, coalesce(c_name, ''),
                  o_orderstatus, o_totalprice) AS line
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 5
    """,
)
def o5_result_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5+F18: top-5 ranked summary lines (result_formatter.ml:8-16 shape)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    top = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(5)
    )
    return top.select(
        F.format_string(
            "#%d %s — %s (%.2f)",
            F.col("o_orderkey"),
            F.coalesce(F.col("c_name"), F.lit("")),
            F.col("o_orderstatus"),
            F.col("o_totalprice"),
        ).alias("line")
    )


@_register(
    "f19_opening_prettifier",
    """
    WITH raw(id, slug) AS (VALUES (0, 'kings_indian_defense'),
                                  (1, 'caro_kann_defense'),
                                  (2, 'a_b_c'), (3, 'sicilian')),
    words AS (
      SELECT id, string_split(replace(slug, '_', ' '), ' ') AS w FROM raw)
    SELECT id,
           array_to_string(list_transform(w,
             x -> upper(substring(x, 1, 1)) || substring(x, 2)), ' ') AS pretty
    FROM words ORDER BY id
    """,
)
def f19_opening_prettifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19: slug 'a_b_c' → 'A B C' (chessmate_api.ml:41-51)."""
    df = spark.createDataFrame(
        [(0, "kings_indian_defense"), (1, "caro_kann_defense"),
         (2, "a_b_c"), (3, "sicilian")],
        "id int, slug string",
    )
    return df.select(
        "id", F.initcap(F.replace(F.col("slug"), F.lit("_"), F.lit(" "))).alias("pretty")
    ).orderBy("id")


@_register(
    "x7_agent_blend",
    """
    WITH scored AS (
      SELECT doc_id,
             0.5 AS base_score,
             CASE WHEN doc_id % 3 = 0
                  THEN (doc_id % 100) / 100.0 END AS agent_score
      FROM documents)
    SELECT doc_id,
           CASE WHEN agent_score IS NULL THEN base_score
                ELSE least(1.0, 0.6 * base_score
                           + 0.4 * least(greatest(agent_score, 0.0), 1.0))
           END AS total_score
    FROM scored ORDER BY doc_id
    """,
)
def x7_agent_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 stub + F21 agent path: deterministic injected agent scores blended
    min(1, 0.6*base + 0.4*clamp01(agent)) — exactly how the reference's tests
    exercise the GPT evaluator without the external service
    (test_query.ml:258-306)."""
    docs = _docs(spark, sf_dir)
    base = F.lit(0.5)
    agent = F.when(
        F.col("doc_id") % 3 == 0, (F.col("doc_id") % 100) / F.lit(100.0)
    )
    clamped = F.least(F.greatest(agent, F.lit(0.0)), F.lit(1.0))
    total = F.when(agent.isNull(), base).otherwise(
        F.least(F.lit(1.0), F.lit(0.6) * base + F.lit(0.4) * clamped)
    )
    return docs.select("doc_id", total.alias("total_score")).orderBy("doc_id")

# ---------------------------------------------------------------------------
# Fingerprinting + approximate ANN (scale path)
# ---------------------------------------------------------------------------

def _fingerprint_oracle(num_hashes: int = 4) -> str:
    from ..functions.hashing import MINHASH_PRIME, universal_constants

    base = (
        f"(('0x' || substring(md5('mh:' || s), 1, 15))::BIGINT % {MINHASH_PRIME})"
    )
    sig_items = ", ".join(
        f"list_min(list_transform(grams, s -> ({a} * {base} + {b}) % {MINHASH_PRIME}))"
        for a, b in universal_constants(num_hashes, "uh")
    )
    return f"""
    WITH g AS (
      SELECT doc_id,
             list_distinct([substring(lower(coalesce(text, '')), i, 8)
                            FOR i IN range(1, greatest(length(coalesce(text, '')) - 7, 1) + 1)])
               AS grams
      FROM documents),
    sig AS (SELECT doc_id, [{sig_items}] AS signature FROM g)
    SELECT doc_id,
           md5(array_to_string(list_transform(signature, x -> CAST(x AS VARCHAR)), ','))
             AS fingerprint
    FROM sig ORDER BY doc_id
    """


@_register("d5_document_fingerprint", None)
def d5_document_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash-style document fingerprint: minhash over char 8-grams."""
    from ..operators.textan import document_fingerprint

    return document_fingerprint(_docs(spark, sf_dir), "doc_id", "text").orderBy(
        "doc_id"
    )


QUERIES["d5_document_fingerprint"] = (d5_document_fingerprint, _fingerprint_oracle())


@_register("v6_lsh_ann", _knn_oracle())
def v6_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN via random-hyperplane LSH bucket collisions with
    exact re-rank (the 100 TB path when brute force is too wide).

    Checked against the EXACT top-k oracle: (n_planes=3, n_tables=32) is
    sized so bucket recall is 1.0 on this corpus — deterministic seeded
    planes make that a stable, hash-checkable property, so the driver row
    verifies the whole LSH candidate machinery end to end."""
    from ..operators.similarity import lsh_bucketed_topk

    emb = _emb(spark, sf_dir)
    queries = _emb_queries(spark, sf_dir)
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding").filter(
        F.col("neighbor_id") >= 5
    )
    out = lsh_bucketed_topk(
        queries, corpus, k=3, dim=_EMBED_DIM,
        query_id="query_id", corpus_id="neighbor_id",
        n_planes=3, n_tables=32,
    )
    return out.select(
        "query_id", "neighbor_id", portable_round(F.col("score"), 6).alias("score")
    ).orderBy("query_id", F.col("score").desc(), "neighbor_id")

# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (exact + LSH scale path)
# ---------------------------------------------------------------------------

_NEARDUP_THRESHOLD = 0.35


def _neardup_oracle() -> str:
    cos = _duck_cosine("a.embedding", "b.embedding")
    return f"""
    SELECT id_a, id_b, score FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             floor({cos} * 1000000 + 0.5) / 1000000 AS score
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    WHERE score >= {_NEARDUP_THRESHOLD}
    ORDER BY id_a, id_b
    """


@_register("d6_embedding_neardup", None)
def d6_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (broadcast self-join; the
    oracle baseline for the LSH-accelerated variant)."""
    from ..operators.dedup import embedding_neardup_pairs

    emb = _emb(spark, sf_dir)
    return embedding_neardup_pairs(
        emb, "vec_id", "embedding", _NEARDUP_THRESHOLD
    ).orderBy("id_a", "id_b")


QUERIES["d6_embedding_neardup"] = (d6_embedding_neardup, _neardup_oracle())


@_register("d7_embedding_neardup_lsh", _neardup_oracle())
def d7_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidate near-dup pairs: collide on (table, hyperplane signature),
    verify exact cosine — with the THRESHOLD-AWARE feasibility planner
    (operators/dedup.py lsh_plan_for) deciding whether LSH can prune at
    all before committing to it.

    Checked against the EXACT all-pairs oracle at EVERY scale factor.
    Three arms, all exact-verified so precision is 1.0 by construction:

    * ``plan.prunes`` — the planner found a banding that reaches the
      recall target while keeping the random-candidate fraction < 0.5.
      That regime (threshold well above cosine 0 — at 0.8 the planner's
      banding keeps candidates under 5% of all-pairs) is FENCED here:
      recall-0.9999 LSH against this entry's exact all-pairs oracle
      would be a probabilistic gate, so the arm raises loudly instead
      (structurally unreachable at the committed 0.35 threshold), and
      the planned-banding pipeline is oracle-pinned by
      ``d25_hyperplane_planned_neardup``, whose oracle mirrors the
      banding hash-for-hash.
    * gate scale (≤800 rows), non-pruning threshold — keep the historic
      forced-LSH (3, 32) point (lsh_banding_for's floor): recall is
      measured 1.0 there, so the driver row hash-checks the FULL LSH
      pipeline (signatures → bucket self-join → pair dedup → exact
      verify) against the quadratic oracle.
    * beyond gate scale, non-pruning threshold — route to the exact
      BNLJ path.  Measured (sf0.1, 2,000 near-uniform vectors,
      threshold 0.35): every recall-0.9999 banding yields >= 60%
      candidate fraction — 1.2-2.0M distinct candidates of the 2.0M
      all-pairs, i.e. "LSH" degenerates to all-pairs plus a shuffle,
      strictly worse than the shuffle-free exact join (the size-only
      ladder's banding here reads recall 0.55: the dial-regime mismatch
      the round-10 second-sf sweep surfaced).  The exact path keeps its
      driver-memory contract (one (id, vector) side materialized,
      500k-row guard); at 100 TB the honest low-threshold route is the
      k-means-cells family (d13), whose candidate volume is
      corpus-shaped, not threshold-shaped — the guard message says so."""
    from ..operators.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
        lsh_banding_for,
        lsh_plan_for,
    )

    emb = _emb(spark, sf_dir)
    # footer row count (round 15): identical to emb.count(), zero jobs
    n = _table_rows(sf_dir, "embeddings")
    plan = lsh_plan_for(n, _NEARDUP_THRESHOLD, target_recall=0.9999)
    if plan.prunes:
        # NOT oracle-exact: this arm would run recall-0.9999 LSH against
        # the EXACT all-pairs oracle, i.e. a probabilistic hash mismatch
        # of ~1 missed pair per 10k true pairs whenever it engages.  It
        # is structurally unreachable at the committed 0.35 threshold
        # (lsh_plan_for proves no recall-0.9999 banding prunes there —
        # prunes depends only on the threshold), so raising
        # _NEARDUP_THRESHOLD into the prunable regime must ALSO switch
        # this entry's gate semantics: either mirror the planned banding
        # in the oracle (the d25_hyperplane_planned_neardup pattern) or
        # gate on a recall floor instead of a value hash.  Fail loudly
        # rather than ship a silently probabilistic gate; the planned-
        # banding pipeline itself is exercised and oracle-pinned by d25.
        raise AssertionError(
            "d7's prunes arm engaged (threshold "
            f"{_NEARDUP_THRESHOLD}, plan {plan!r}) but the entry's "
            "oracle is exact all-pairs — mirror the banding in the "
            "oracle (d25 pattern) or switch to a recall-floor gate "
            "before enabling this arm"
        )
    elif n <= 800:
        planes, tables = lsh_banding_for(n)
        out = embedding_neardup_lsh(
            emb, "vec_id", "embedding", _NEARDUP_THRESHOLD, dim=_EMBED_DIM,
            n_planes=planes, n_tables=tables, n_rows=n,
        )
    else:
        out = embedding_neardup_pairs(
            emb, "vec_id", "embedding", _NEARDUP_THRESHOLD
        )
    return out.orderBy("id_a", "id_b")


@_register(
    "v7_ivf_ann",
    """
    SELECT vec_id AS query_id, 3 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY query_id
    """,
)
def v7_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate k-NN: coarse k-means cells + nprobe probing + exact
    re-rank (FAISS IndexIVFFlat semantics as a batch join).

    IVF on near-uniform vectors cannot promise recall 1.0, so the driver
    row is a RECALL CHECK: the entry runs the IVF path AND the exact kNN
    baseline, joins them, and returns per-query ``recall_ok`` (recall@3 >=
    0.6).  The oracle predicts all-true — an approximation-quality gate
    that goes red if the IVF machinery degrades.  The IVF join itself is
    scale-shaped: sampled (sort-free) centroid training, nlist ~
    sqrt(corpus) by default, broadcast-query probe join so the corpus
    never shuffles (salted cell-key variant for huge query batches)."""
    from ..operators.similarity import cosine_knn_join, ivf_topk

    emb = _emb(spark, sf_dir)
    queries = _emb_queries(spark, sf_dir)
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding").filter(
        F.col("neighbor_id") >= 5
    )
    approx = ivf_topk(
        queries, corpus, k=3,
        query_id="query_id", corpus_id="neighbor_id",
        nlist=8, nprobe=6,
    ).select("query_id", "neighbor_id")
    exact = cosine_knn_join(
        queries, corpus, k=3, query_id="query_id", corpus_id="neighbor_id"
    ).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("k"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.col("k").cast("int").alias("k"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("k") >= 0.6).alias(
                "recall_ok"
            ),
        )
    )
    return per_q.orderBy("query_id")


@_register(
    "v10_pq_ann",
    """
    SELECT vec_id AS query_id, 3 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY query_id
    """,
)
def v10_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate k-NN (Jégou et al. 2011; FAISS
    IndexPQ + asymmetric distance): the MEMORY side of the ANN family —
    v6/v7 cut which vectors a query touches, PQ cuts what each touched
    vector costs (dim float32 → m code bytes; measured payload in
    SCALE_SMOKE.json `pq_bytes`: packed codes shuffle ~18x below
    vectors, parquet scan ~19-30x below), so
    the approximate-scoring scan moves CODES only and the corpus'
    vectors are read just twice (encode; exact re-rank of the
    k·overfetch shortlist).

    v7's recall-gate contract: the entry runs the PQ path AND the exact
    kNN baseline and returns per-query ``recall_ok`` (recall@3 >= 0.6);
    the oracle predicts all-true.  Near-uniform synthetic vectors are
    PQ's worst case exactly as they are IVF's (no subspace structure to
    quantize — measured worst-query recall 0.67 at this operating
    point, the smoke records the dial at 10x); every stage (hash-mod
    training sample, Lloyd iterations, ADC ordering) is deterministic,
    so the gate cannot flap.  ADC scoring is a pure JVM ``aggregate``
    over the code array against broadcast per-query lookup tables —
    no Python and no vector movement in the scan.

    (ksub, overfetch) come from the corpus-scaled ladder
    ``pq_operating_point`` — the fixed sf0.01 point (16, 32) reads 0.33
    on its worst query at sf0.1, the dial-regime mismatch the round-10
    second-sf sweep surfaced; the ladder's rungs are measured green at
    both committed scale factors."""
    from ..operators.similarity import (
        cosine_knn_join,
        pq_operating_point,
        pq_topk,
    )

    queries = _emb_queries(spark, sf_dir)
    # in-entry corpus pin off the RAW scan (round 15 — the v15
    # rationale): the encode pass, the ADC scan's shortlist re-rank,
    # and the exact baseline all read one materialization; released
    # after the eager checkpoint of the 5-row gate (v11's convention)
    corpus = (
        _t(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .filter(F.col("neighbor_id") >= 5)
        .persist()
    )
    ksub, overfetch = pq_operating_point(
        _table_rows(sf_dir, "embeddings") - 5, k=3
    )
    try:
        approx = pq_topk(
            queries, corpus, k=3,
            query_id="query_id", corpus_id="neighbor_id",
            m=8, ksub=ksub, overfetch=overfetch,
        ).select("query_id", "neighbor_id")
        exact = cosine_knn_join(
            queries, corpus, k=3, query_id="query_id", corpus_id="neighbor_id"
        ).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        per_q = (
            exact.groupBy("query_id")
            .agg(F.count("*").alias("k"))
            .join(
                hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
                "query_id",
                "left",
            )
            .select(
                "query_id",
                F.col("k").cast("int").alias("k"),
                (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("k") >= 0.6).alias(
                    "recall_ok"
                ),
            )
        )
        out = per_q.orderBy("query_id").localCheckpoint(eager=True)
    finally:
        corpus.unpersist()
    return out


@_register(
    "v11_ivfpq_ann",
    """
    SELECT vec_id AS query_id, 3 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY query_id
    """,
)
def v11_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC approximate k-NN (FAISS IndexIVFPQ; Jégou et al. 2011 §V):
    the composition of both ANN cuts — v7's IVF cells cut WHICH vectors
    a query touches (the probe join is cell-pruned: a broadcast
    equi-join on cell, nprobe/nlist of the corpus, vs v10's all-rows
    cross join), and v10's PQ codes cut what each touched vector COSTS
    (the scan reads m packed code BYTES per row, never a vector).  PQ
    here encodes the RESIDUAL x_norm - centroid[cell] with
    residual-trained codebooks, so the ADC estimate decomposes exactly
    as <q, centroid_cell> + sum_sub LUT[code] — the production ANN
    posture for billion-row corpora.

    v7/v10's recall-gate contract: runs IVFADC AND the exact kNN
    baseline, returns per-query ``recall_ok`` (recall@3 >= 0.6); the
    oracle predicts all-true.  Every stage (hash-mod training sample,
    Lloyd iterations, stable cell argsort, ADC ordering) is
    deterministic, so the gate cannot flap.  nprobe and overfetch are
    the two dials; the smoke records the (nprobe x overfetch) grid.
    (ksub, overfetch) come from the corpus-scaled ``pq_operating_point``
    ladder (see v10): the fixed sf0.01 point reads 0.33 on its worst
    sf0.1 query; the ladder reads 0.67+ everywhere at both committed
    scale factors (the residual 0.67 is an unprobed-cell miss — probing
    all 8 cells reads 1.0 — i.e. the IVF dial, not the PQ one)."""
    from ..operators.similarity import (
        cosine_knn_join,
        ivfpq_topk,
        pq_operating_point,
    )

    # corpus persisted (round 14): the recall-gate composition reads it
    # from SEVEN subtrees (training sample, encode, ADC re-rank side,
    # exact baseline, and the gate's broadcast collects) — without the
    # pin every broadcast subtree re-runs the scan+repartition chain.
    # d2's materialize convention: eager checkpoint of the 5-row gate,
    # then release.  Round 15: pin the RAW scan (v10/v15's convention —
    # the table's natural partitioning, not the 32-way _spread) and take
    # the corpus size from the parquet footer (identical to the old
    # emb.count(), zero jobs).
    queries = _emb_queries(spark, sf_dir)
    corpus = (
        _t(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .filter(F.col("neighbor_id") >= 5)
        .persist()
    )
    # nprobe 7/8 at the fixture scale: with ~10 vectors per cell a
    # single unprobed cell can hold a third of one query's exact top-3
    # (verified: nprobe=6 is green at sf0.01 but one sf0.001 query drops
    # to 1/3); at real scale auto_nlist ~ sqrt(N) makes nprobe/nlist a
    # small fraction and the smoke grid records the dial honestly
    ksub, overfetch = pq_operating_point(
        _table_rows(sf_dir, "embeddings") - 5, k=3
    )
    approx = ivfpq_topk(
        queries, corpus, k=3,
        query_id="query_id", corpus_id="neighbor_id",
        nlist=8, nprobe=7, m=8, ksub=ksub, overfetch=overfetch,
    ).select("query_id", "neighbor_id")
    exact = cosine_knn_join(
        queries, corpus, k=3, query_id="query_id", corpus_id="neighbor_id"
    ).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count("*").alias("k"))
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.col("k").cast("int").alias("k"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("k") >= 0.6).alias(
                "recall_ok"
            ),
        )
    )
    try:
        out = per_q.localCheckpoint(eager=True)
    finally:
        corpus.unpersist()
    return out.orderBy("query_id")


# ---------------------------------------------------------------------------
# Streaming-shared window aggregation (batch form of the streaming query)
# ---------------------------------------------------------------------------

@_register(
    "a9_windowed_event_counts",
    """
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS event_count,
           CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def a9_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts per event_type — the exact expressions the
    Structured Streaming pipeline runs (streaming/structured.py), evaluated
    in batch so the oracle can check them.  The streaming variant adds only
    the watermark (late-data pruning), not different arithmetic."""
    from ..streaming.structured import windowed_event_counts

    ev = _events(spark, sf_dir)
    return windowed_event_counts(ev).orderBy("window_start", "event_type")


@_register("chess_jobs_stream", None)
def chess_jobs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-Q4 as a REAL Structured Streaming run: positions land as parquet
    files, a checkpointed availableNow file-source stream embeds them and
    appends position_vectors (streaming/structured.py).  Returns the sink
    row count + distinct content-hash ids."""
    import os
    import tempfile

    from ..ingest import ingest_pgn_text
    from ..streaming.structured import run_embedding_stream

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    base = tempfile.mkdtemp(prefix="chess_jobs_stream_")
    pos_dir = os.path.join(base, "positions")
    vec_dir = os.path.join(base, "vectors")
    ckpt = os.path.join(base, "ckpt")
    ingest.positions.select(
        "id", "game_id", "ply", "move_number", "side_to_move", "fen", "san"
    ).write.mode("append").parquet(pos_dir)
    run_embedding_stream(spark, pos_dir, vec_dir, ckpt, dim=8).awaitTermination()
    vectors = spark.read.parquet(vec_dir)
    return vectors.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("position_id").alias("n_positions"),
    )


def _chess_jobs_stream_oracle() -> str:
    from ..chess.pgn import parse_games

    total = sum(g.ply_count for g in parse_games(_CHESS_FIXTURE))
    return f"""
    SELECT CAST({total} AS BIGINT) AS n_vectors, CAST({total} AS BIGINT) AS n_positions
    """


QUERIES["chess_jobs_stream"] = (chess_jobs_stream, _chess_jobs_stream_oracle())

# ---------------------------------------------------------------------------
# Wider TPC-H-shaped analytics (the schema's subset: no partsupp, no
# commit/receipt dates — Q2/Q4/Q9/Q11/Q12/Q16/Q17/Q19/Q20/Q21 don't map)
# ---------------------------------------------------------------------------

@_register(
    "q6_revenue_change",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + predicate + single agg — every filter
    pushes to the parquet scan, zero shuffles (partial/final agg only)."""
    li = _t(spark, sf_dir, "lineitem")
    lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _revenue_expr(disc=F.col("l_discount")).alias("revenue")
        )
    )


@_register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, """ + _REVENUE + """ AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice, l_discount
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
             OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation volume by year.  Both nation dims and
    supplier/customer broadcast; the only shuffle is the final group-by.
    The nation pair is NATION_20/NATION_11 — names from the synthetic
    testdata, chosen non-empty at sf0.001/0.01/0.1 so the oracle match is
    never vacuous (TPC-H's FRANCE/GERMANY matched nothing)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_n2key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_20")
        & (F.col("cust_nation") == "NATION_11")
    ) | (
        (F.col("supp_nation") == "NATION_11")
        & (F.col("cust_nation") == "NATION_20")
    )
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_revenue_expr().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, """ + _REVENUE + """ AS revenue, c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20
    (TakeOrderedAndProject after one grouped shuffle)."""
    lo = F.lit("1997-10-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue_expr().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "q13_order_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: per-customer order counts → histogram of counts
    (two grouped shuffles, the second over a tiny domain)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@_register(
    "q14_promo_revenue",
    """
    SELECT CAST(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1.0 - l_discount AS DECIMAL(8,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END)
           / sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
      AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional ratio aggregate over a broadcast part
    join; the division happens once, after decimal-exact sums."""
    lo = F.lit("1997-09-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-10-01 00:00:00").cast("timestamp")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,4)")
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(disc))
            .cast("double")
            .alias("promo_revenue")
        )
    )


@_register(
    "q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(20,4))) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-having semi-join back onto the fact table.
    The qualifying-key set is aggregated first, then left-semi joined —
    lineitem shuffles once on l_orderkey for both the HAVING and the agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_micro4("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150 * 10000)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_bigkey"),
                li["l_orderkey"] == F.col("_bigkey"), "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@_register(
    "q18_bucketed_twin",
    """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(20,4))) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_bucketed_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 over BUCKETED copies of lineitem/orders (EXPLAIN.md's scale
    note made executable): lineitem bucketed by l_orderkey and orders by
    o_orderkey turn both the HAVING aggregation and the fact join into
    co-located scans — the builder raises unless the physical plan has
    ZERO shuffle exchanges.  Same oracle as q18: bucketing must change the
    plan, never the answer.  At 100 TB this is the pay-the-shuffle-once-
    at-ingest contract; the one-time bucketed write here stands in for
    that ingest step."""
    from ..ingest.bucketed import (
        ensure_bucketed,
        read_table,
        shuffle_exchange_count,
    )

    token = _sf_token(sf_dir)
    li_table, ord_table = f"cm_q18_li_{token}", f"cm_q18_ord_{token}"
    # pay the bucketed write once per session+sf (the ingest-time
    # contract); repeat runs read the standing tables
    ensure_bucketed(
        _t(spark, sf_dir, "lineitem"), li_table, ["l_orderkey"], 8,
        path=f"/tmp/chessmate_bucketed/{li_table}",
    )
    ensure_bucketed(
        _t(spark, sf_dir, "orders"), ord_table, ["o_orderkey"], 8,
        path=f"/tmp/chessmate_bucketed/{ord_table}",
    )
    li = read_table(spark, li_table)
    orders = read_table(spark, ord_table)
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_micro4("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150 * 10000)
        .select("l_orderkey")
    )
    out = (
        li.join(big.withColumnRenamed("l_orderkey", "_bigkey"),
                li["l_orderkey"] == F.col("_bigkey"), "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
    n_exchanges = shuffle_exchange_count(out)
    if n_exchanges != 0:
        raise AssertionError(
            f"bucketed Q18 plan has {n_exchanges} shuffle exchanges;"
            " co-location contract broken"
        )
    return out


@_register(
    "q22_idle_customers",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nation instead of phone prefix): scalar-subquery
    threshold + anti-join against orders, grouped balances.  "Idle" means
    no order since 1999-01-01 — in the synthetic testdata every customer
    has at least one order overall, so the classic no-orders-ever
    predicate was vacuously empty at every sf."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    nation = _t(spark, sf_dir, "nation")
    # scalar aggregate computed once on the driver — a broadcast literal,
    # exactly what Catalyst does for an uncorrelated scalar subquery
    threshold = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal"))
        .first()[0]
    )
    return (
        cust.filter(F.col("c_acctbal") > F.lit(threshold))
        .join(orders.select(F.col("o_custkey").alias("_okey")),
              F.col("c_custkey") == F.col("_okey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("n_name")
    )

# ---------------------------------------------------------------------------
# Agent-evaluation cache as a keyed table (§1.5, agent_cache.ml:14-36)
# ---------------------------------------------------------------------------

def _x8_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    cleaned = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(":"),
        F.lower(F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40)),
    )
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned_text"),
        F.slice(F.split(cleaned, " "), 1, 3).alias("keywords"),
        F.lit(50).alias("limit"),
        (F.lit(2000) + F.col("doc_id") % 5).cast("int").alias("white_min"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(1900)).cast("int").alias("black_min"),
        F.lit(100).alias("max_rating_delta"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("kings_indian_defense")).alias(
            "opening_slug"
        ),
        F.lit("1-0").alias("result"),
        F.coalesce(F.col("text"), F.lit("")).alias("pgn"),
    )


@_register(
    "x8_agent_cache",
    """
    WITH req AS (
      SELECT doc_id,
             CAST(doc_id AS VARCHAR) || ':' ||
               lower(substring(coalesce(text, ''), 1, 40)) AS cleaned,
             coalesce(text, '') AS pgn
      FROM documents),
    keyed AS (
      SELECT doc_id,
             md5(concat_ws('|',
               cleaned,
               array_to_string((string_split(cleaned, ' '))[1:3], ','),
               '50',
               CAST(2000 + doc_id % 5 AS VARCHAR),
               CASE WHEN doc_id % 2 = 0 THEN '1900' ELSE ' ' END,
               '100',
               CASE WHEN doc_id % 4 = 0 THEN 'kings_indian_defense' ELSE ' ' END,
               '1-0',
               md5(pgn))) AS cache_key
      FROM req)
    SELECT doc_id, cache_key,
           doc_id % 3 = 0 AS cache_hit,
           CASE WHEN doc_id % 3 = 0
                THEN floor((doc_id % 97) / 97.0 * 1000000 + 0.5) / 1000000
           END AS agent_score
    FROM keyed ORDER BY doc_id
    """,
)
def x8_agent_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent cache as a keyed table: digest keys (F14 layout), warm the
    cache for every third request, broadcast-lookup the full batch.  The
    oracle recomputes the md5 key layout independently — key portability is
    part of the check."""
    from ..operators.cache import agent_cache_key, cache_lookup, cache_merge

    req = _x8_requests(spark, sf_dir).withColumn(
        "cache_key",
        agent_cache_key(
            F.col("cleaned_text"), F.col("keywords"), F.col("limit"),
            F.col("white_min"), F.col("black_min"), F.col("max_rating_delta"),
            F.col("opening_slug"), F.col("result"), F.col("pgn"),
        ),
    )
    warm = req.filter(F.col("doc_id") % 3 == 0).select(
        "cache_key",
        portable_round((F.col("doc_id") % 97) / F.lit(97.0), 6).alias(
            "agent_score"
        ),
    )
    cache = cache_merge(None, warm)
    out = cache_lookup(
        req.select("doc_id", "cache_key"), cache, value_cols=["agent_score"]
    )
    return out.select("doc_id", "cache_key", "cache_hit", "agent_score").orderBy(
        "doc_id"
    )


@_register(
    "x9_agent_guarded",
    """
    SELECT doc_id,
           CASE WHEN doc_id BETWEEN 3 AND 5 THEN 'error'
                WHEN doc_id > 5 THEN 'breaker_open'
                ELSE 'ok' END AS note,
           CASE WHEN doc_id BETWEEN 3 AND 5 OR doc_id > 5
                THEN CAST(0.0 AS DOUBLE)
                ELSE floor((doc_id % 97) / 97.0 * 1000000 + 0.5) / 1000000
           END AS agent_score
    FROM documents WHERE doc_id < 10 ORDER BY doc_id
    """,
)
def x9_agent_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent guard rails end to end (agent_circuit_breaker.ml + retry.ml +
    config.ml:98-102): a driver-side evaluator that fails on doc_ids 3-5
    trips the breaker (threshold 3), so docs 6+ short-circuit to the
    fallback without calling the agent — the V7 degrade-don't-fail path.
    The guarded scores land in a Spark frame exactly as the x7 blend
    consumes them; the oracle predicts score and breaker note per row."""
    from ..functions.resilience import CircuitBreaker, guarded_evaluate

    doc_ids = [r[0] for r in
               _docs(spark, sf_dir).select("doc_id").filter(F.col("doc_id") < 10)
               .orderBy("doc_id").collect()]

    clock = [0.0]
    breaker = CircuitBreaker(now_fn=lambda: clock[0])
    breaker.configure(threshold=3, cooloff_seconds=60.0)

    import math

    def make_eval(doc_id: int):
        def _eval() -> float:
            if 3 <= doc_id <= 5:
                raise RuntimeError("simulated agent outage")
            return math.floor(doc_id % 97 / 97.0 * 1e6 + 0.5) / 1e6
        return _eval

    rows = []
    for doc_id in doc_ids:
        score, note = guarded_evaluate(
            breaker, make_eval(doc_id), timeout_seconds=15.0,
            fallback=lambda: 0.0,
        )
        rows.append((doc_id, note, float(score)))
    return spark.createDataFrame(
        rows, "doc_id long, note string, agent_score double"
    ).orderBy("doc_id")


def _f17_oracle() -> str:
    return """
    SELECT o_orderkey AS game_id,
           to_json(struct_pack(
             game_id := o_orderkey,
             white := c_name,
             black := c_mktsegment,
             result := o_orderstatus,
             year := year(o_orderdate),
             event := o_orderpriority,
             opening_slug := replace(lower(o_orderpriority), '-', '_'),
             opening_name := o_orderpriority,
             eco := CASE WHEN o_orderkey % 3 = 0 THEN NULL
                         ELSE upper(substr(c_mktsegment, 1, 2)) END,
             phases := ['opening', 'middlegame'],
             themes := [lower(c_mktsegment)],
             keywords := string_split(lower(o_orderpriority), '-'),
             white_elo := CAST(o_orderkey % 2800 AS INTEGER),
             black_elo := CASE WHEN o_orderkey % 2 = 0 THEN NULL
                               ELSE CAST((o_orderkey * 7) % 2800 AS INTEGER) END,
             synopsis := printf('#%d %s — %s (%.2f)', o_orderkey,
                                coalesce(c_name, ''), o_orderstatus, o_totalprice),
             score := floor(o_totalprice / 1000000 * 1000000 + 0.5) / 1000000,
             vector_score := floor(o_orderkey % 100 / 100.0 * 1000000 + 0.5) / 1000000,
             keyword_score := floor(o_orderkey % 7 / 7.0 * 1000000 + 0.5) / 1000000,
             agent_score := CAST(NULL AS DOUBLE),
             agent_explanation := CAST(NULL AS VARCHAR),
             agent_themes := CAST([] AS VARCHAR[]),
             agent_reasoning_effort := CAST(NULL AS VARCHAR)
           )) AS document
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey <= 100
    ORDER BY game_id
    """


@_register("f17_json_results", _f17_oracle())
def f17_json_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17: result-document JSON construction (chessmate_api.ml:77-115's
    to_json) — the full response shape (summary fields, nullable eco/elo,
    phase/theme/keyword arrays, scores, explicit-null agent block) built as
    ONE to_json(struct(...)) expression and byte-compared against DuckDB's
    to_json.  Values are mapped from orders⟕customer so the oracle can
    recompute them."""
    from ..functions.json_docs import result_document

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = (
        o.filter(F.col("o_orderkey") <= 100)
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left")
    )
    fields = {
        "game_id": F.col("o_orderkey"),
        "white": F.col("c_name"),
        "black": F.col("c_mktsegment"),
        "result": F.col("o_orderstatus"),
        "year": F.year("o_orderdate"),
        "event": F.col("o_orderpriority"),
        "opening_slug": F.replace(
            F.lower("o_orderpriority"), F.lit("-"), F.lit("_")
        ),
        "opening_name": F.col("o_orderpriority"),
        "eco": F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.upper(F.substring("c_mktsegment", 1, 2))
        ),
        "phases": F.array(F.lit("opening"), F.lit("middlegame")),
        "themes": F.array(F.lower("c_mktsegment")),
        "keywords": F.split(F.lower("o_orderpriority"), "-"),
        "white_elo": (F.col("o_orderkey") % 2800).cast("int"),
        "black_elo": F.when(
            F.col("o_orderkey") % 2 == 0, F.lit(None).cast("int")
        ).otherwise(((F.col("o_orderkey") * 7) % 2800).cast("int")),
        "synopsis": F.format_string(
            "#%d %s — %s (%.2f)", F.col("o_orderkey"),
            F.coalesce(F.col("c_name"), F.lit("")), F.col("o_orderstatus"),
            F.col("o_totalprice"),
        ),
        "score": portable_round(F.col("o_totalprice") / 1000000, 6),
        "vector_score": portable_round(F.col("o_orderkey") % 100 / 100.0, 6),
        "keyword_score": portable_round(F.col("o_orderkey") % 7 / 7.0, 6),
        "agent_score": F.lit(None).cast("double"),
        "agent_explanation": F.lit(None).cast("string"),
        "agent_themes": F.array().cast("array<string>"),
        "agent_reasoning_effort": F.lit(None).cast("string"),
    }
    return j.select(
        F.col("o_orderkey").alias("game_id"),
        result_document(fields).alias("document"),
    ).orderBy("game_id")


@_register(
    "f23_pgn_truncation",
    """
    SELECT doc_id,
           CASE WHEN length(coalesce(text, '')) <= 300 THEN coalesce(text, '')
                ELSE substr(coalesce(text, ''), 1, 300) ||
                     chr(10) || '... [PGN truncated]' END AS pgn,
           length(coalesce(text, '')) > 300 AS truncated
    FROM documents ORDER BY doc_id
    """,
)
def f23_pgn_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F23: evaluator-payload truncation (agent_evaluator.ml:29-33 —
    production cap 3000 chars; 300 here so the fixture corpus exercises
    both branches)."""
    from ..functions.guards import truncate_pgn

    docs = _docs(spark, sf_dir)
    text = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        truncate_pgn(text, max_chars=300).alias("pgn"),
        (F.length(text) > 300).alias("truncated"),
    ).orderBy("doc_id")


@_register(
    "f24_sanitizer",
    """
    WITH seeded AS (
      SELECT doc_id,
             substr(coalesce(text, ''), 1, 40) ||
             CASE doc_id % 4
               WHEN 0 THEN ' OPENAI_API_KEY=sk-live-secret-000 tail'
               WHEN 1 THEN ' see postgres://user:pw@host:5432/db ok'
               WHEN 2 THEN ' token sk-abcdef1234567890 done'
               ELSE '' END AS raw
      FROM documents)
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
        'sk-[A-Za-z0-9_-]{8,}', '[redacted]', 'g'),
        'gpt-[A-Za-z0-9_-]{8,}', '[redacted]', 'g'),
        'OPENAI_API_KEY=[^\\s]+', '[redacted]', 'g'),
        'DATABASE_URL=[^\\s]+', '[redacted]', 'g'),
        'postgres://[^\\s]+', '[redacted]', 'g'),
        'postgresql://[^\\s]+', '[redacted]', 'g'),
        'redis://[^\\s]+', '[redacted]', 'g'),
        'AGENT_API_KEY=[^\\s]+', '[redacted]', 'g') AS cleaned
    FROM seeded ORDER BY doc_id
    """,
)
def f24_sanitizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24: secret/DSN redaction (lib/core/sanitizer.ml) — patterns applied
    in reference order over text seeded with every secret class."""
    from ..functions.guards import sanitize

    docs = _docs(spark, sf_dir)
    raw = F.concat(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit(" OPENAI_API_KEY=sk-live-secret-000 tail"))
        .when(F.col("doc_id") % 4 == 1,
              F.lit(" see postgres://user:pw@host:5432/db ok"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" token sk-abcdef1234567890 done"))
        .otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id", sanitize(raw).alias("cleaned")
    ).orderBy("doc_id")


@_register(
    "x5_theme_classifier",
    """
    WITH tagged AS (
      SELECT doc_id,
             [coalesce(source, ''),
              CASE doc_id % 5
                WHEN 0 THEN 'Queenside Majority push'
                WHEN 1 THEN '  KINGSIDE ATTACK  '
                WHEN 2 THEN 'a central break idea'
                WHEN 3 THEN 'kingside attack with queenside majority'
                ELSE 'quiet maneuvering' END] AS tags
      FROM documents)
    SELECT doc_id,
           CASE WHEN len(list_filter(tags,
                  t -> contains(lower(trim(t)), 'queenside majority'))) > 0
                THEN 'queenside_majority'
                WHEN len(list_filter(tags,
                  t -> contains(lower(trim(t)), 'kingside attack'))) > 0
                THEN 'kingside_attack'
                WHEN len(list_filter(tags,
                  t -> contains(lower(trim(t)), 'central break'))) > 0
                THEN 'central_break'
                ELSE 'unknown' END AS theme
    FROM tagged ORDER BY doc_id
    """,
)
def x5_theme_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: tags → theme enum (position_features.ml:5-25) with the
    reference's priority order; seeded tags cover case/whitespace handling
    and the multi-match priority."""
    from ..functions.guards import classify_theme

    docs = _docs(spark, sf_dir)
    tags = F.array(
        F.coalesce(F.col("source"), F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("Queenside Majority push"))
        .when(F.col("doc_id") % 5 == 1, F.lit("  KINGSIDE ATTACK  "))
        .when(F.col("doc_id") % 5 == 2, F.lit("a central break idea"))
        .when(F.col("doc_id") % 5 == 3,
              F.lit("kingside attack with queenside majority"))
        .otherwise(F.lit("quiet maneuvering")),
    )
    return docs.select(
        "doc_id", classify_theme(tags).alias("theme")
    ).orderBy("doc_id")


# Realistic ingest batch: 5 opening lines x N header-varied copies, so the
# bench number measures distributed parse+replay throughput, not 2-row
# fixture overhead (every line is legal under the replay engine).
_CHESS_BATCH_LINES = [
    ("italian", "e4 e5 Nf3 Nc6 Bc4 Bc5 c3 Nf6 d4 exd4 cxd4 Bb4+ Nc3 Nxe4"
                " O-O Bxc3 bxc3 d5"),
    ("qgd", "d4 d5 c4 e6 Nc3 Nf6 Bg5 Be7 e3 O-O Nf3 Nbd7 Rc1 c6 Bd3 dxc4"
            " Bxc4 Nd5"),
    ("sicilian", "e4 c5 Nf3 d6 d4 cxd4 Nxd4 Nf6 Nc3 a6 Be2 e5 Nb3 Be7 O-O O-O"),
    ("french", "e4 e6 d4 d5 Nc3 Bb4 e5 c5 a3 Bxc3+ bxc3 Ne7"),
    ("caro", "e4 c6 d4 d5 Nc3 dxe4 Nxe4 Bf5 Ng3 Bg6 h4 h6 Nf3 Nd7"),
]
_CHESS_BATCH_COPIES = 25


def _numbered_moves(sans: list) -> str:
    parts = []
    for i, san in enumerate(sans):
        if i % 2 == 0:
            parts.append(f"{i // 2 + 1}. {san}")
        else:
            parts.append(san)
    return " ".join(parts)


def _chess_batch_text() -> str:
    games = []
    gid = 0
    for copy in range(_CHESS_BATCH_COPIES):
        for name, line in _CHESS_BATCH_LINES:
            gid += 1
            sans = line.split()
            games.append(
                f'[Event "{name} bench {copy}"]\n'
                f'[Site "Benchville"]\n'
                f'[Date "2024.0{copy % 9 + 1}.0{gid % 9 + 1}"]\n'
                f'[White "White Player {gid}"]\n'
                f'[Black "Black Player {gid}"]\n'
                f'[Result "1-0"]\n\n'
                f"{_numbered_moves(sans)} 1-0"
            )
    return "\n\n".join(games) + "\n"


def _chess_batch_oracle() -> str:
    from ..chess.pgn import parse_games

    parsed = parse_games(_chess_batch_text())
    games = len(parsed)
    players = len(
        {g.headers["White"] for g in parsed} | {g.headers["Black"] for g in parsed}
    )
    positions = sum(g.ply_count for g in parsed)
    return f"""
    SELECT * FROM (VALUES (CAST({games} AS BIGINT), CAST({players} AS BIGINT),
                           CAST({positions} AS BIGINT), CAST({positions} AS BIGINT),
                           CAST(0 AS BIGINT)))
           t(games, players, positions, jobs, corrupt)
    """


@_register("chess_ingest_batch", None)
def chess_ingest_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S5 + X1 at batch scale: 125 header-varied games parsed and
    replayed distributed (mapInPandas); returns the relational-table counts
    the transaction commits.  Oracle: the pure-Python parser's counts."""
    from ..ingest import ingest_pgn_text

    result = ingest_pgn_text(spark, _chess_batch_text())
    games = result.games.agg(F.count(F.lit(1)).alias("games"))
    players = result.players.agg(F.count(F.lit(1)).alias("players"))
    positions = result.positions.agg(F.count(F.lit(1)).alias("positions"))
    jobs = result.embedding_jobs.agg(F.count(F.lit(1)).alias("jobs"))
    corrupt = result.corrupt.agg(F.count(F.lit(1)).alias("corrupt"))
    return (
        games.crossJoin(players).crossJoin(positions)
        .crossJoin(jobs).crossJoin(corrupt)
    )


QUERIES["chess_ingest_batch"] = (chess_ingest_batch, _chess_batch_oracle())


def _s12_fen_oracle() -> str:
    from ..chess.pgn import parse_game, split_games
    from ..chess.replay import fens_of_moves

    rows = []
    for gid, chunk in enumerate(split_games(_CHESS_FIXTURE), start=1):
        game = parse_game(chunk)
        sans = [m.san for m in game.moves]
        for ply, (san, fen) in enumerate(zip(sans, fens_of_moves(sans)), start=1):
            rows.append(f"({gid}, {ply}, '{san}', '{fen}')")
    values = ", ".join(rows)
    return f"""
    SELECT * FROM (VALUES {values}) t(game_no, ply, san, fen)
    ORDER BY game_no, ply
    """


@_register("s12_fen_emitter", None)
def s12_fen_emitter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: the pgn→fen CLI as a distributed operator
    (pgn_to_fen_command.ml) — FEN after every half-move, golden-checked by
    the pure replay engine."""
    from ..ingest.fen_emit import emit_fens

    return emit_fens(spark, _CHESS_FIXTURE).orderBy("game_no", "ply")


QUERIES["s12_fen_emitter"] = (s12_fen_emitter, _s12_fen_oracle())


@_register(
    "a8_worker_rates",
    """
    SELECT CAST(120 AS BIGINT) AS processed, CAST(3 AS BIGINT) AS failed,
           CAST(floor(120 / (90.0 / 60.0) * 1000000 + 0.5) / 1000000 AS DOUBLE)
             AS jobs_per_min,
           CAST(floor(5400.0 / 90.0 * 1000000 + 0.5) / 1000000 AS DOUBLE)
             AS chars_per_sec
    """,
)
def a8_worker_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: worker throughput gauges (embedding_worker.ml:65-93) — counters
    accumulated per job, wall-clock rates computed at snapshot.  Seeded
    deterministically: 120 jobs (3 failed, 45 FEN chars each) over a fixed
    90-second window; the oracle recomputes the gauge arithmetic."""
    from ..streaming.metrics import WorkerMetrics, worker_rates_frame

    m = WorkerMetrics(start_time=1000.0)
    for i in range(120):
        m.update(failed=(i % 40 == 0), fen_length=45.0)
    frame = worker_rates_frame(spark, m, now=1090.0)
    return frame.select(
        "processed", "failed",
        portable_round(F.col("jobs_per_min"), 6).alias("jobs_per_min"),
        portable_round(F.col("chars_per_sec"), 6).alias("chars_per_sec"),
    )


@_register("v1_client_embedding", None)
def v1_client_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1: the external-embedder worker shape — mapInPandas batches feed an
    EmbeddingClient (chunk guards ≤2048 items / ≤120k chars, retry w/
    backoff; embedding_client.ml:12-56,134-210) whose transport here is the
    deterministic V5 embedder, so the whole client path is hash-checked
    against the same oracle as the expression path."""
    import re as _re

    import pandas as _pd

    dim = 8

    def batches(it):
        from chessmate_spark.functions.embed_client import EmbeddingClient
        from chessmate_spark.functions.embedding import deterministic_embedding

        def _tokens(text):
            toks = [
                t for t in _re.split(r"[^a-z0-9]+", (text or "").lower())
                if len(t) >= 3
            ]
            return sorted(set(toks))

        client = EmbeddingClient(
            lambda texts: [deterministic_embedding(_tokens(t), dim) for t in texts],
            max_batch_size=64, max_chars=20_000,
        )
        for pdf in it:
            vecs = client.embed_texts(list(pdf["text"]))
            out = _pd.DataFrame({"doc_id": pdf["doc_id"]})
            for i in range(dim):
                out[f"e{i}"] = [
                    __import__("math").floor(v[i] * 1e6 + 0.5) / 1e6 for v in vecs
                ]
            yield out

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    schema = "doc_id long, " + ", ".join(f"e{i} double" for i in range(dim))
    return docs.mapInPandas(batches, schema).orderBy("doc_id")


QUERIES["v1_client_embedding"] = (v1_client_embedding, _v5_oracle())


# ---------------------------------------------------------------------------
# Remaining TPC-H shapes (q2..q21), adapted to the reduced testdata schema
# (no partsupp / shipmode / commitdate): each keeps the ORIGINAL's plan
# shape — decorrelated min, EXISTS semi-join, share-of-total, correlated
# avg, disjunctive pushdown, nested semi/anti self-joins — on the columns
# that exist.
# ---------------------------------------------------------------------------

@_register(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey, l_extendedprice
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    mins AS (
      SELECT l_partkey AS m_partkey, min(l_extendedprice) AS min_price
      FROM offers GROUP BY 1)
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM offers
    JOIN mins ON l_partkey = m_partkey AND l_extendedprice = min_price
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size = 11 AND p_type = 'ECONOMY'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (decorrelated correlated-min subquery): cheapest
    EUROPE offer per part, joined back on the min — partsupp replaced by
    the (l_partkey, l_suppkey, l_extendedprice) offers in lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")
    offers = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
              nat["n_regionkey"] == reg["r_regionkey"])
        .select("l_partkey", "l_suppkey", "l_extendedprice")
    )
    mins = offers.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    out = (
        offers.join(
            mins,
            (offers["l_partkey"] == mins["m_partkey"])
            & (offers["l_extendedprice"] == mins["min_price"]),
        )
        .join(
            F.broadcast(
                part.filter((F.col("p_size") == 11) & (F.col("p_type") == "ECONOMY"))
            ),
            F.col("p_partkey") == offers["l_partkey"],
        )
        .join(F.broadcast(supp.alias("s2")),
              offers["l_suppkey"] == F.col("s2.s_suppkey"))
        .join(F.broadcast(nat.alias("nn2")),
              F.col("s2.s_nationkey") == F.col("nn2.n_nationkey"))
        .select(
            F.col("s2.s_acctbal").alias("s_acctbal"),
            F.col("s2.s_name").alias("s_name"),
            F.col("nn2.n_name").alias("n_name"),
            "p_partkey", "p_name",
        )
        .distinct()
    )
    return out.orderBy(
        F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
    ).limit(20)


@_register(
    "q4_priority_exists",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join): orders with at least one
    line shipped after the order date ("late" stands in for the missing
    commitdate/receiptdate pair), counted per priority."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "q8_market_share",
    """
    WITH volumes AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(1.0 - l_discount AS DECIMAL(8,4)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM volumes GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's slice of
    EUROPE-customer ECONOMY-part revenue per year; conditional share of a
    decimal-exact total, divided once at the end."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = _t(spark, sf_dir, "supplier")
    n1 = nat.alias("n1")
    n2 = nat.alias("n2")
    volume = _rev_term()
    vols = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), cust["c_nationkey"] == F.col("n1.n_nationkey"))
        .join(F.broadcast(reg), F.col("n1.n_regionkey") == reg["r_regionkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n2), supp["s_nationkey"] == F.col("n2.n_nationkey"))
        .select(
            F.year(o["o_orderdate"]).alias("o_year"),
            volume.alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    # both sides were cast to double BEFORE the division, so replacing
    # each decimal sum with its micro-unit twin is value-identical
    share = _from_micro(
        F.sum(
            F.when(
                F.col("supp_nation") == "NATION_7", F.col("volume")
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ),
        micro_digits=8,
    ) / _from_micro(F.sum("volume"), micro_digits=8)
    return (
        vols.groupBy("o_year")
        .agg(share.alias("mkt_share"))
        .orderBy("o_year")
    )


@_register(
    "q9_product_profit",
    """
    SELECT n_name AS nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name, year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1.0 - l_discount)
                  - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and year): supplycost is
    proxied by 0.5*p_retailprice (no partsupp table).  The per-row amount
    is computed in DOUBLE (bit-identical across engines) and cast to
    decimal ONCE so the group sums stay exact."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    # _micro4 of the double expression equals the decimal(18,4) cast
    # exactly: the true value has <= 4 fractional digits (2+2 and
    # 1+2+0), so x*1e4 sits within ~1e-7 of an integer and the .5
    # rounding boundary is never live, positive or negative
    amount = _micro4(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    rows = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        rows.groupBy("nation", "o_year")
        .agg(_from_micro(_msum(F.col("amount"))).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@_register(
    "q11_value_concentration",
    """
    WITH pv AS (
      SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey)
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM pv
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(sum(value) AS DOUBLE) * 0.0008 FROM pv)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (share-of-total HAVING via scalar subquery): part
    inventory value within one region vs a fraction of the global total —
    the scalar aggregate rides a broadcast cross join, no second scan of
    the grouped frame."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    pv = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_micro4("l_extendedprice")).alias("_value_m"))
        .localCheckpoint(eager=False)
    )
    total = pv.agg(
        (_from_micro(_msum(F.col("_value_m"))) * F.lit(0.0008)).alias(
            "_threshold"
        )
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(_from_micro(F.col("_value_m")) > F.col("_threshold"))
        .select(
            "l_partkey", _from_micro(F.col("_value_m")).alias("value")
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@_register(
    "q12_priority_linestatus",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional priority counts per line class):
    linestatus stands in for the missing shipmode; late lines bucket order
    priorities into high/low counters in one pass."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
    )
    return (
        joined.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@_register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (view + max scalar subquery): quarterly revenue per
    supplier, keep the max earner(s) — decimal-exact equality against the
    broadcast max, so FP never decides the winner."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_term()).alias("_total_m"))
        .localCheckpoint(eager=False)
    )
    # max/equality over the exact integer micro sums is the same
    # winner the exact decimal comparison picked
    best = revenue.agg(F.max("_total_m").alias("_best"))
    return (
        supp.join(revenue, supp["s_suppkey"] == revenue["supplier_no"])
        .crossJoin(F.broadcast(best))
        .filter(F.col("_total_m") == F.col("_best"))
        .select(
            "s_suppkey", "s_name",
            _from_micro(F.col("_total_m"), micro_digits=8).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@_register(
    "q16_supplier_counts",
    """
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (distinct supplier counts per part attribute with a
    complaint anti-join): the partsupp pairs come from distinct lineitem
    (partkey, suppkey); "complaints" = negative account balance."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    kept = pairs.join(
        F.broadcast(bad), pairs["l_suppkey"] == bad["s_suppkey"], "left_anti"
    )
    return (
        kept.join(F.broadcast(part), kept["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@_register(
    "q17_small_quantity_revenue",
    """
    WITH avgq AS (
      SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS threshold
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated per-part average, decorrelated into a
    grouped join): lines under 20% of their part's mean quantity."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avgq = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(avgq, li["l_partkey"] == avgq["a_partkey"])
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (_from_micro(_msum(_micro4("l_extendedprice")))
             / F.lit(7.0)).alias("avg_yearly")
        )
    )


@_register(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 40
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunction of conjunctive brand/size/quantity
    ranges): one broadcast join, the OR-of-ANDs evaluated post-join — AQE
    and codegen keep it one stage."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = _rev_term()
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(cond)
        .agg(_from_micro(F.sum(disc), micro_digits=8).alias("revenue"))
    )


@_register(
    "q20_excess_shippers",
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    part_total AS (
      SELECT l_partkey AS t_partkey, sum(qty) AS total FROM shipped GROUP BY 1),
    big AS (
      SELECT DISTINCT l_suppkey
      FROM shipped
      JOIN part_total ON l_partkey = t_partkey
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%' AND qty > 0.3 * total)
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM big)
    ORDER BY s_name
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested semi-join chain): suppliers who shipped
    >30% of a small-part's yearly volume — availqty is proxied by the
    shipped totals (no partsupp table)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = _t(spark, sf_dir, "supplier")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total")
    )
    big = (
        shipped.join(part_total, shipped["l_partkey"] == part_total["t_partkey"])
        .join(F.broadcast(part), shipped["l_partkey"] == part["p_partkey"])
        .filter(F.col("qty") > F.lit(0.3) * F.col("total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(big, supp["s_suppkey"] == big["l_suppkey"], "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@_register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate),
    all_pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM all_pairs l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS self-joins): the only supplier
    who shipped late on a multi-supplier finished order — late =
    shipped-after-orderdate (no commit/receipt dates)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    all_pairs = li.select("l_orderkey", "l_suppkey").distinct()
    l2 = all_pairs.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    waiting = (
        late.join(
            l2,
            (late["l_orderkey"] == l2["_ok2"]) & (late["l_suppkey"] != l2["_sk2"]),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3["_ok3"]) & (F.col("l_suppkey") != l3["_sk3"]),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), waiting["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@_register(
    "a10_user_sessions",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us > CAST(120 AS BIGINT) * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered),
    numbered AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged)
    SELECT user_id, session_no,
           min(CAST(ts AS TIMESTAMP)) AS session_start,
           max(CAST(ts AS TIMESTAMP)) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
)
def a10_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (120-min gap) over the event stream —
    the batch form of the applyInPandasWithState stateful operator
    (streaming/sessions.py); lag/cumsum decorrelation, two user_id
    shuffles, no UDF."""
    from ..streaming.sessions import sessionize_batch

    ev = _events(spark, sf_dir)
    return sessionize_batch(ev, gap_minutes=120)


@_register(
    "j7_asof_join",
    """
    SELECT l.event_id, l.user_id, CAST(l.ts AS TIMESTAMP) AS ts,
           CAST(r.ts AS TIMESTAMP) AS asof_ts, r.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT user_id, ts,
                           CASE WHEN event_id % 7 = 0 THEN NULL
                                ELSE value END AS value
                    FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (kdb aj / DuckDB ASOF): every purchase matched to the
    user's latest at-or-before click.  Composed as tag-union + one
    windowed carry-forward per user — one shuffle, no inequality-join
    nested loop; the oracle is DuckDB's NATIVE ASOF JOIN.  Every 7th
    click's value is nulled on BOTH engines so the fixture proves the
    matched row's NULL payload comes through as NULL (struct carry),
    never an older click's value."""
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("click_value"),
    )
    out = asof_join(
        purchases, clicks, by=["user_id"],
        left_ts="ts", right_ts="ts", right_cols=["click_value"],
    )
    return out.select(
        "event_id", "user_id", "ts", "asof_ts", "click_value"
    ).orderBy("event_id")


@_register(
    "j8_range_join",
    """
    SELECT p_partkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM (SELECT p_partkey, p_retailprice * 90 AS lo,
                 p_retailprice * 90 + 8000 AS hi
          FROM part WHERE p_partkey < 40) iv
    JOIN orders ON o_totalprice BETWEEN lo AND hi
    GROUP BY p_partkey ORDER BY p_partkey
    """,
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (point-in-interval) join via bucketized equi-join + exact
    BETWEEN verify — candidates are bucket collisions, never
    points x intervals.  Orders priced inside each part's derived band."""
    from ..operators.asof import range_join

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 40).select(
        "p_partkey",
        (F.col("p_retailprice") * 90).alias("lo"),
        (F.col("p_retailprice") * 90 + 8000).alias("hi"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = range_join(
        orders, part, point_col="o_totalprice",
        lo_col="lo", hi_col="hi", bucket_width=8000.0,
    )
    return (
        joined.groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("p_partkey")
    )


@_register(
    "j9_interval_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts < c.ts + INTERVAL 30 MINUTE
    ORDER BY click_id, purchase_id
    """,
)
def j9_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval join (click → purchases within 30 min, per user):
    the batch twin of the watermarked stream-stream join
    (tests/test_stream_join.py runs the same predicate as two joined
    streams with state bounded by the watermark + interval).  Equi-join
    on user_id carries the non-equi time band — one key shuffle, the band
    filters post-join (operators/asof.py interval_join)."""
    from ..operators.asof import interval_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    out = interval_join(
        clicks, purchases, "user_id", "p_user_id",
        "click_ts", "purchase_ts", "30 MINUTES",
    )
    return out.select(
        "click_id", "purchase_id", "user_id", "click_ts", "purchase_ts"
    ).orderBy("click_id", "purchase_id")


@_register(
    "a11_percentiles",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS p50,
           floor(quantile_cont(value, 0.9) * 1000000 + 0.5) / 1000000 AS p90,
           floor(quantile_cont(value, 0.99) * 1000000 + 0.5) / 1000000 AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def a11_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (monitoring-style
    p50/p90/p99).  Spark's `percentile` and DuckDB's `quantile_cont` share
    linear-interpolation semantics; portable rounding absorbs their
    last-bit interpolation differences."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            portable_round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            portable_round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def _dup_clusters_oracle() -> str:
    """Transitive closure of the MinHash-LSH pair relation as a DuckDB
    recursive CTE — the oracle twin of the large-star/small-star labeling
    (operators/graph.py).  The recursive walk is fine at oracle scale; the
    Spark side is the one that has to scale."""
    pair_sql = _minhash_lsh_oracle()
    return f"""
    WITH RECURSIVE
    prs AS (SELECT id_a, id_b FROM ({pair_sql})),
    edges AS (SELECT id_a AS a, id_b AS b FROM prs
              UNION
              SELECT id_b AS a, id_a AS b FROM prs),
    walk(node, reach) AS (
      SELECT a, b FROM edges
      UNION
      SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
    labels AS (
      SELECT node, least(node, min(reach)) AS component_id
      FROM walk GROUP BY node)
    SELECT node AS doc_id, component_id,
           CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
             AS cluster_size,
           node = component_id AS is_canonical
    FROM labels
    ORDER BY doc_id
    """


@_register("d8_dup_clusters", _dup_clusters_oracle())
def d8_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS from the MinHash-LSH pair list: transitive
    closure via alternating large-star/small-star connected components
    (O(log n) rounds, two shuffles each, id-only edges), then one
    canonical doc per cluster.  This is the step that turns pairwise
    near-dup detection into an actual corpus dedup pass."""
    from ..operators.graph import dup_clusters

    pairs = _lsh_pairs(spark, sf_dir)
    return dup_clusters(pairs).orderBy("doc_id")


@_register(
    "t4_stratified_sample",
    """
    SELECT doc_id, lang, source,
           ('0x' || substring(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % 1000 AS bucket
    FROM documents
    WHERE ('0x' || substring(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15))
            ::BIGINT % 1000
          < CASE WHEN lang = 'en' THEN 250 ELSE 750 END
    ORDER BY doc_id
    """,
)
def t4_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus rebalancing: each doc
    hashes to a stable bucket (md5 of its id — reproducible across runs,
    clusters, and engines, unlike rand()-based sampleBy), and per-language
    keep-rates downsample the dominant language.  Rates live in a tiny
    broadcast dim, so the plan is scan + broadcast-join + filter: no
    shuffle, fully pushdown-friendly, works unchanged on 10^9 rows."""
    rates = spark.createDataFrame([("en", 250)], ["lang", "rate_permille"])
    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("smp:"), F.col("doc_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("bigint")
        % 1000
    )
    return (
        docs.withColumn("bucket", bucket)
        .join(F.broadcast(rates), "lang", "left")
        .filter(F.col("bucket") < F.coalesce(F.col("rate_permille"), F.lit(750)))
        .select("doc_id", "lang", "source", "bucket")
        .orderBy("doc_id")
    )


@_register(
    "v8_embedding_quantize",
    """
    WITH scaled AS (
      SELECT vec_id,
             CASE WHEN list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) = 0 THEN 1.0
                  ELSE list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) / 127.0 END AS scale,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings)
    SELECT vec_id, scale,
           list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INTEGER))
             AS q8
    FROM scaled
    ORDER BY vec_id
    """,
)
def v8_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (per-vector max-abs scale) — the
    standard 4× storage cut before shipping embeddings to an ANN index.
    Pure JVM array expressions (transform/array_max), no Python on the
    data path; floor(x/scale + 0.5) instead of round() because floor has
    identical semantics on both engines for negative halves."""
    emb = _emb(spark, sf_dir)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    scaled = emb.select(
        "vec_id",
        F.when(maxabs == 0, F.lit(1.0)).otherwise(maxabs / 127.0).alias("scale"),
        vec.alias("v"),
    )
    return scaled.select(
        "vec_id",
        "scale",
        F.transform(
            F.col("v"),
            lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"),
        ).alias("q8"),
    ).orderBy("vec_id")


@_register(
    "j10_salted_skew_join",
    f"""
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           {_REVENUE} AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    ORDER BY s.s_nationkey
    """,
)
def j10_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join: identical answer to the plain equi-join (the
    oracle IS the unsalted SQL), but every fact key is spread over 8
    shuffle sub-partitions so one hot supplier can never pin a straggler
    partition.  Deterministic salt (xxhash64 of row identity), dim side
    replicated 8x — the trade that wins whenever dim ≪ fact."""
    from ..operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    joined = salted_join(
        li, sup, "l_suppkey", "s_suppkey",
        salt_on=["l_orderkey", "l_linenumber"], salts=8,
    )
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _revenue_expr().alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


@_register(
    "t5_sequence_pack",
    """
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(coalesce(text, ''),
                  '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT doc_id, source, n_tokens,
           CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS tok_offset,
           CAST(floor(coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 2048.0) AS BIGINT) AS seq_id
    FROM t
    ORDER BY doc_id
    """,
)
def t5_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: concatenate docs per source shard in id
    order, chunk at 2048 BPE-ish tokens; each doc gets its shard token
    offset and starting sequence id.  One prefix-sum window per shard —
    a single shuffle on source."""
    from ..operators.textan import sequence_pack

    docs = _docs(spark, sf_dir)
    return sequence_pack(docs, "doc_id", "text", "source", 2048).orderBy(
        "doc_id"
    )


def _decontaminate_oracle(n: int = 4) -> str:
    toks = _DUCK_NORM_TOKENS.format(col="text")
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS tokens FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(list_slice(tokens, i, i + {n - 1}), ' ')
                            FOR i IN range(1, greatest(len(tokens) - {n - 1}, 1) + 1)])
               AS shingles
      FROM toks),
    ev AS (
      SELECT DISTINCT doc_id AS eval_id, unnest(shingles) AS s
      FROM sh WHERE doc_id % 97 = 0),
    tr AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 97 <> 0)
    SELECT tr.doc_id,
           CAST(count(DISTINCT tr.s) AS BIGINT) AS n_shared_shingles,
           min(ev.eval_id) AS contaminated_by
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    ORDER BY tr.doc_id
    """


@_register("d9_decontaminate", _decontaminate_oracle())
def d9_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training docs sharing any 4-token
    shingle with the (broadcast) eval set — the benchmark-overlap scrub
    every LLM corpus runs before training.  Eval set here: doc_id % 97 = 0."""
    from ..operators.textan import decontaminate

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    out = decontaminate(train, eval_df, "doc_id", "text", shingle_n=4)
    return out.select(
        "doc_id",
        F.col("n_shared_shingles").cast("bigint").alias("n_shared_shingles"),
        "contaminated_by",
    ).orderBy("doc_id")


def _repetition_oracle() -> str:
    toks = _DUCK_NORM_TOKENS.format(col="text")
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS tokens FROM documents),
    grams AS (
      SELECT doc_id,
             [array_to_string(list_slice(tokens, i, i + 2), ' ')
              FOR i IN range(1, greatest(len(tokens) - 2, 1) + 1)] AS g
      FROM toks)
    SELECT doc_id,
           CAST(len(g) AS INTEGER) AS n_ngrams,
           floor((CAST(len(g) AS DOUBLE) - len(list_distinct(g)))
                 / len(g) * 1000000 + 0.5) / 1000000 AS dup_ngram_frac
    FROM grams
    ORDER BY doc_id
    """


@_register("t6_repetition_score", _repetition_oracle())
def t6_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition quality signal: fraction of 3-gram
    occurrences that repeat an earlier one (Gopher-style filter)."""
    from ..operators.textan import repetition_score

    docs = _docs(spark, sf_dir)
    return repetition_score(docs, "doc_id", "text", ngram=3).orderBy("doc_id")


_PII_TEXT_SQL = (
    "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com call 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || '-9876 ref ' || CAST(100000 + doc_id AS VARCHAR)"
)


@_register(
    "t7_pii_scrub",
    f"""
    WITH injected AS (
      SELECT doc_id, {_PII_TEXT_SQL} AS text2 FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text2,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}')) AS INTEGER)
             AS n_email,
           CAST(len(regexp_extract_all(text2,
                '[0-9]{{3}}-[0-9]{{4}}-[0-9]{{4}}')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(text2, '[0-9]{{6,}}')) AS INTEGER)
             AS n_digits,
           md5(regexp_replace(regexp_replace(regexp_replace(text2,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{{2,}}', '<EMAIL>', 'g'),
                '[0-9]{{3}}-[0-9]{{4}}-[0-9]{{4}}', '<PHONE>', 'g'),
                '[0-9]{{6,}}', '<NUM>', 'g')) AS scrub_md5
    FROM injected
    ORDER BY doc_id
    """,
)
def t7_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern redaction over a deterministically injected fixture
    column (the synthetic corpus contains no PII, so each doc gets a
    derived email/phone/id-number appended identically on both engines);
    per-pattern counts plus the md5 of the scrubbed text prove the
    replacements byte-for-byte."""
    from ..operators.textan import pii_scrub

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("-9876 ref "),
            (F.col("doc_id") + 100000).cast("string"),
        ).alias("text2"),
    )
    out = pii_scrub(injected, "doc_id", "text2")
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_digits").cast("int").alias("n_digits"),
        F.md5(F.col("scrubbed_text")).alias("scrub_md5"),
    ).orderBy("doc_id")


@_register(
    "m4_frame_sample",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             CAST(length(coalesce(text, '')) % 50 + 1 AS INTEGER) AS n_frames
      FROM documents)
    SELECT media_id, CAST(unnest(range(0, n_frames, 7)) AS BIGINT) AS frame_index
    FROM media
    ORDER BY media_id, frame_index
    """,
)
def m4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: every 7th frame index per media row
    (frame decode itself would be the mapInPandas stage of the image
    path).  Frame counts derived from doc length so the sample is
    non-trivial; pure sequence/explode expressions."""
    from ..operators.multimodal import frame_sample

    docs = _docs(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.lit("video/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.length(F.coalesce(F.col("text"), F.lit(""))) % 50 + 1)
            .cast("int")
            .alias("n_frames"),
        ).alias("meta"),
    )
    return frame_sample(media, every_n=7).select(
        "media_id", F.col("frame_index").cast("bigint").alias("frame_index")
    ).orderBy("media_id", "frame_index")


@_register(
    "a13_rollup_revenue",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER)
             AS grouping_id,
           CAST(count(*) AS BIGINT) AS n_items,
           {_REVENUE} AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY grouping_id, returnflag, linestatus
    """,
)
def a13_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: revenue at (flag, status), per-flag subtotal, and
    grand total in ONE pass — Spark expands the rollup into a single
    partial+final aggregation over grouping sets, not three scans."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _revenue_expr().alias("revenue"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("grouping_id"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "grouping_id",
            "n_items",
            "revenue",
        )
        .orderBy("grouping_id", "returnflag", "linestatus")
    )


@_register(
    "a14_moving_avg",
    """
    SELECT s_suppkey, day,
           floor(avg(day_qty) OVER (
                 PARTITION BY s_suppkey ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 1000000 + 0.5)
             / 1000000 AS qty_7d_avg
    FROM (
      SELECT l_suppkey AS s_suppkey,
             CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS day_qty
      FROM lineitem
      WHERE l_suppkey <= 20
      GROUP BY 1, 2)
    ORDER BY s_suppkey, day
    """,
)
def a14_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of daily shipped quantity per supplier — the
    monitoring window-frame shape (ROWS BETWEEN): one groupBy shuffle on
    (supplier, day), one window sort per supplier partition."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    daily = (
        li.groupBy(
            F.col("l_suppkey").alias("s_suppkey"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(_dsum("l_quantity").alias("day_qty"))
    )
    w = (
        Window.partitionBy("s_suppkey")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "s_suppkey",
        "day",
        portable_round(F.avg("day_qty").over(w), 6).alias("qty_7d_avg"),
    ).orderBy("s_suppkey", "day")


@_register(
    "t8_chunk_documents",
    """
    WITH toks AS (
      SELECT doc_id, {toks} AS tokens FROM documents
      WHERE len({toks}) > 0),
    chunks AS (
      SELECT doc_id, len(tokens) AS n_tokens,
             unnest([CAST(i AS INTEGER)
                     FOR i IN range(0, greatest(len(tokens) - 16, 1), 48)])
               AS chunk_no
      FROM toks),
    sliced AS (
      SELECT c.doc_id, c.chunk_no,
             array_to_string(
               list_slice(t.tokens, c.chunk_no + 1, c.chunk_no + 64), ' ')
               AS chunk_text
      FROM chunks c JOIN toks t USING (doc_id))
    SELECT doc_id, CAST(chunk_no AS INTEGER) AS chunk_no,
           CAST(len(string_split(chunk_text, ' ')) AS INTEGER)
             AS chunk_tokens,
           md5(chunk_text) AS chunk_md5
    FROM sliced
    ORDER BY doc_id, chunk_no
    """.format(toks=_DUCK_NORM_TOKENS.format(col="text")),
)
def t8_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: overlapping 64-token windows with
    stride 48 (16-token overlap) per doc — the splitting step before a
    chunk-level embedding pass.  Expression-only: sequence of chunk
    starts, posexplode, slice; the oracle md5-compares every chunk's
    exact text."""
    from ..functions.text import norm_tokens_expr

    docs = _docs(spark, sf_dir)
    toks = norm_tokens_expr(F.coalesce(F.col("text"), F.lit("")))
    # zero-token docs produce no chunks (otherwise the forced first chunk
    # start would emit a phantom 1-token chunk of the empty string)
    base = docs.select("doc_id", toks.alias("tokens")).filter(
        F.size("tokens") > 0
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("tokens") - 16, F.lit(1)) - 1,
        F.lit(48),
    )
    chunked = base.select(
        "doc_id",
        "tokens",
        F.explode(starts).alias("chunk_no"),
    ).select(
        "doc_id",
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.concat_ws(
            " ", F.slice(F.col("tokens"), F.col("chunk_no") + 1, 64)
        ).alias("chunk_text"),
    )
    return chunked.select(
        "doc_id",
        "chunk_no",
        F.size(F.split(F.col("chunk_text"), " ")).cast("int").alias(
            "chunk_tokens"
        ),
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_no")


@_register(
    "a15_heavy_hitters",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS event_count
    FROM events
    GROUP BY user_id
    ORDER BY event_count DESC, user_id
    LIMIT 20
    """,
)
def a15_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by event count — the batch twin of the stateful
    heavy-hitter stream (streaming/structured.py run_heavy_hitters_stream,
    GroupState counters surviving restarts via the checkpoint).  The
    orderBy().limit() compiles to TakeOrderedAndProject after a
    partial+final count."""
    from ..streaming.structured import heavy_hitters_batch

    ev = _events(spark, sf_dir)
    return heavy_hitters_batch(ev, k=20)


@_register(
    "u5_set_operations",
    """
    SELECT doc_id FROM (
      SELECT doc_id FROM documents WHERE n_chars < 600
      INTERSECT
      SELECT doc_id FROM documents WHERE lang = 'en')
    EXCEPT
    SELECT doc_id FROM documents WHERE source = 'src1'
    ORDER BY doc_id
    """,
)
def u5_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT): short English docs minus one
    excluded source.  Catalyst compiles both to joins (left-semi /
    left-anti over distinct inputs) — no driver-side set logic."""
    docs = _docs(spark, sf_dir)
    short = docs.filter(F.col("n_chars") < 600).select("doc_id")
    english = docs.filter(F.col("lang") == "en").select("doc_id")
    excluded = docs.filter(F.col("source") == "src1").select("doc_id")
    return short.intersect(english).subtract(excluded).orderBy("doc_id")


@_register(
    "a16_pivot_revenue",
    f"""
    SELECT l_returnflag,
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN
                CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1.0 - l_discount AS DECIMAL(8,4)) END), 0)
             AS DOUBLE) AS rev_F,
           CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN
                CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1.0 - l_discount AS DECIMAL(8,4)) END), 0)
             AS DOUBLE) AS rev_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a16_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: revenue by returnflag spread across linestatus columns.
    Spark's pivot with explicit values compiles to ONE pass of
    conditional partial+final aggregates — no per-column scans; the
    oracle is the equivalent conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    rev = _rev_term()
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(rev))
        .select(
            "l_returnflag",
            _from_micro(
                F.coalesce(F.col("F"), F.lit(0).cast("decimal(38,0)")),
                micro_digits=8,
            ).alias("rev_F"),
            _from_micro(
                F.coalesce(F.col("O"), F.lit(0).cast("decimal(38,0)")),
                micro_digits=8,
            ).alias("rev_O"),
        )
        .orderBy("l_returnflag")
    )


@_register(
    "a17_ntile_quartiles",
    """
    WITH ranked AS (
      SELECT c_custkey, c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
      FROM customer)
    SELECT quartile,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(min(c_acctbal) * 100 + 0.5) / 100 AS min_bal,
           floor(max(c_acctbal) * 100 + 0.5) / 100 AS max_bal
    FROM ranked
    GROUP BY quartile
    ORDER BY quartile
    """,
)
def a17_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles of customers by account balance with per-bucket
    stats — the cohort-bucketing window shape (deterministic tiebreak so
    both engines assign identical buckets).  A global (unpartitioned)
    ntile funnels through one sort partition by definition; at 100 TB
    the same cohorting is done per shard key or via percentile cutoffs
    (a11's partial+final aggregate) — this entry pins the exact global
    semantics."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    ranked = cust.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )
    return (
        ranked.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            portable_round(F.min("c_acctbal"), 2).alias("min_bal"),
            portable_round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("quartile")
    )


@_register(
    "a17_cohort_cutoffs",
    """
    WITH cuts AS (
      SELECT floor(quantile_cont(c_acctbal, 0.75) * 10000 + 0.5) / 10000 AS p75,
             floor(quantile_cont(c_acctbal, 0.50) * 10000 + 0.5) / 10000 AS p50,
             floor(quantile_cont(c_acctbal, 0.25) * 10000 + 0.5) / 10000 AS p25
      FROM customer),
    bucketed AS (
      SELECT c_acctbal,
             CASE WHEN c_acctbal >= p75 THEN 1
                  WHEN c_acctbal >= p50 THEN 2
                  WHEN c_acctbal >= p25 THEN 3
                  ELSE 4 END AS cohort
      FROM customer, cuts)
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(min(c_acctbal) * 100 + 0.5) / 100 AS min_bal,
           floor(max(c_acctbal) * 100 + 0.5) / 100 AS max_bal
    FROM bucketed
    GROUP BY cohort
    ORDER BY cohort
    """,
)
def a17_cohort_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe cohort twin of a17_ntile_quartiles: quartile CUTOFFS via
    one exact-`percentile` partial+final aggregate, buckets assigned by
    comparison against the broadcast 1-row cutoff frame — NO global sort
    anywhere in the plan (a17's unpartitioned ``Window.orderBy`` funnels
    every row through one task; this form is how the same cohorting runs
    at 100 TB).  Cutoffs are rounded to 4 dp before comparison: account
    balances carry 2 decimals, interpolated cutoffs land on 4-decimal
    midpoints, so last-bit interpolation differences between Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` can never flip a row's
    cohort.  Bucket sizes match ntile's up to ties at the boundaries
    (pinned by tests/test_queries_aux.py); reference parity: same
    pagination/ranking surface as services/api (SURVEY §2.6).

    Exact ``percentile`` is kept for bit-level oracle parity; its partial
    state buffers values, so the extreme-scale production form swaps in
    ``percentile_approx`` (fixed-size t-digest-style sketch, identical
    plan shape — cutoffs stay a 1-row broadcast)."""
    cust = _t(spark, sf_dir, "customer")
    cuts = cust.agg(
        portable_round(F.percentile("c_acctbal", F.lit(0.75)), 4).alias("p75"),
        portable_round(F.percentile("c_acctbal", F.lit(0.50)), 4).alias("p50"),
        portable_round(F.percentile("c_acctbal", F.lit(0.25)), 4).alias("p25"),
    )
    bucketed = cust.crossJoin(F.broadcast(cuts)).select(
        "c_acctbal",
        F.when(F.col("c_acctbal") >= F.col("p75"), 1)
        .when(F.col("c_acctbal") >= F.col("p50"), 2)
        .when(F.col("c_acctbal") >= F.col("p25"), 3)
        .otherwise(4)
        .alias("cohort"),
    )
    return (
        bucketed.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            portable_round(F.min("c_acctbal"), 2).alias("min_bal"),
            portable_round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("cohort")
    )


@_register(
    "a15_heavy_hitters_sketch",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS event_count
    FROM events
    GROUP BY user_id
    ORDER BY event_count DESC, user_id
    LIMIT 20
    """,
)
def a15_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state twin of a15_heavy_hitters: merged per-partition
    Misra-Gries summaries (operators/sketch.py) instead of one counter
    per distinct user.  Memory is O(capacity) per task and the merge
    shuffles ≤ capacity rows per partition — the shape that survives
    billions of distinct users, where a15's exact count (and the
    GroupState stream's per-user state) grows without bound.

    Shares a15's EXACT oracle deliberately: capacity=4096 exceeds the
    distinct-user count per partition at every test SF, and a
    Misra-Gries summary that never overflows is an exact count map, so
    the sketch must reproduce the exact top-20 bit-for-bit here.  The
    approximation regime (distinct keys ≫ capacity) is pinned separately
    by tests/test_sketch.py's guarantee test.  Reference parity: same
    worker-metrics surface as A8/Q1 (embedding_worker.ml:65-93)."""
    from ..operators.sketch import heavy_hitters_sketch

    ev = _events(spark, sf_dir)
    return heavy_hitters_sketch(ev, key_col="user_id", k=20, capacity=4096)


@_register(
    "t9_corpus_shuffle",
    """
    WITH h AS (
      SELECT doc_id,
             ('0x' || substring(md5('shfl:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS skey
      FROM documents)
    SELECT doc_id,
           CAST(skey % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY skey % 8
                                   ORDER BY skey, doc_id) AS BIGINT)
             AS shard_pos
    FROM h
    ORDER BY shard, shard_pos
    """,
)
def t9_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data writes
    (operators/ordering.py): md5-derived 60-bit key → shard = key mod 8,
    shard_pos = per-shard rank.  Reproducible across runs/engines (the
    oracle replays the identical arithmetic), one shard exchange + an
    in-partition sort — never a global sort.  The 100 TB form is
    write_shuffled_shards, which turns the same plan into a
    shard-partitioned parquet layout."""
    from ..operators.ordering import shuffle_shards

    docs = _docs(spark, sf_dir)
    return (
        shuffle_shards(docs, "doc_id", n_shards=8)
        .select("doc_id", "shard", "shard_pos")
        .orderBy("shard", "shard_pos")
    )


@_register(
    "t10_vocabulary",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(trim(coalesce(lower(text), '')), '\\s+'),
               t -> t <> '')) AS token
      FROM documents),
    per_doc AS (
      SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY token, doc_id)
    SELECT token,
           CAST(sum(tf) AS BIGINT) AS n_occurrences,
           CAST(count(*) AS BIGINT) AS doc_freq
    FROM per_doc
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 50
    """,
)
def t10_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by occurrences with document
    frequency (operators/textan.py vocabulary) — map-side-combined
    aggregations + TakeOrderedAndProject, shuffling (token, count) pairs
    only."""
    from ..operators.textan import vocabulary

    return vocabulary(_docs(spark, sf_dir), "doc_id", "text", top_n=50)


@_register(
    "a18_approx_distinct",
    """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           true AS approx_ok
    FROM events
    """,
)
def a18_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality sketch gate (v7's recall_ok pattern): run BOTH the
    exact distinct count and HyperLogLog++ (``approx_count_distinct``,
    rsd=0.05) and return the exact value plus whether the sketch landed
    within 3x its configured error.  The oracle predicts approx_ok=true,
    so HLL degradation goes red without putting an engine-specific
    estimate in the hash.  At 100 TB the sketch is the only viable form:
    fixed ~1.5 KB of state per partition merged once, vs the exact
    count's shuffle of every distinct key."""
    ev = _events(spark, sf_dir)
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
    )
    return row.select(
        F.col("exact").cast("bigint").alias("exact_users"),
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.greatest(F.col("exact") * 0.15, F.lit(1.0))
        ).alias("approx_ok"),
    )


@_register(
    "a19_cube_revenue",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER)
             AS grouping_id,
           CAST(count(*) AS BIGINT) AS n_items,
           {_REVENUE} AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY grouping_id, returnflag, linestatus
    """,
)
def a19_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE: every grouping-set combination — leaf, both one-column
    marginals, grand total — in ONE Expand + partial+final aggregation
    pass (a13's rollup covers only the prefix hierarchy; cube adds the
    per-status marginal).  Same single-scan property at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _revenue_expr().alias("revenue"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("grouping_id"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "grouping_id",
            "n_items",
            "revenue",
        )
        .orderBy("grouping_id", "returnflag", "linestatus")
    )


def _dedup_resolve_oracle() -> str:
    """Corpus survivors after cluster resolution: documents minus the
    non-canonical members of every near-dup cluster (d8's oracle reused
    as the cluster source)."""
    cluster_sql = _dup_clusters_oracle()
    return f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (
      SELECT c.doc_id FROM ({cluster_sql}) c WHERE NOT c.is_canonical)
    ORDER BY d.doc_id
    """


@_register("d10_dedup_resolve", _dedup_resolve_oracle())
def d10_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup RESOLUTION — the final stage of the near-dup pipeline that
    d2 (pairs) and d8 (clusters) feed: keep one canonical document per
    duplicate cluster and emit the surviving corpus.

    Plan shape: the cluster labeling reduces to an id-only drop-list
    (non-canonical members), which is tiny relative to the corpus —
    the LEFT ANTI join against it is the only corpus-touching step, and
    the drop-list side broadcasts at any realistic dup rate.  The corpus
    itself is scanned once and never shuffled, which is what makes this
    form viable at 100 TB (reference analogue: the ingest upsert's
    skip-existing semantics, services/ingest lib — here applied
    corpus-wide)."""
    from ..operators.graph import dup_clusters

    docs = _docs(spark, sf_dir)
    pairs = _lsh_pairs(spark, sf_dir)
    drop = (
        dup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    return (
        docs.join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_WS_TOKS_SQL = (
    "list_filter(string_split_regex(trim(coalesce(lower(text), '')),"
    " '\\s+'), t -> t <> '')"
)


@_register(
    "t11_unigram_logprob",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_WS_TOKS_SQL}) AS token
      FROM documents),
    vocab AS (
      SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM vocab)
    SELECT t.doc_id, t.lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           floor(avg(-ln(v.cnt / tt.total)) * 1000000.0 + 0.5) / 1000000.0
             AS avg_neg_logprob
    FROM toks t JOIN vocab v USING (token) CROSS JOIN tot tt
    GROUP BY t.doc_id, t.lang
    ORDER BY t.doc_id
    """,
)
def t11_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (the CCNet/KenLM-filter shape
    at unigram order): train token probabilities on the corpus itself,
    then score each document by its mean negative log-likelihood — high
    values flag gibberish / off-distribution documents, the standard
    pretraining quality gate.

    Plan shape: one token-explode scan feeds BOTH the model (token →
    count, map-side-combined agg) and the scorer; the trained vocab is a
    dim table (distinct tokens ≪ corpus tokens) so the scoring join
    broadcasts, and the per-doc aggregation is the only corpus-scale
    shuffle.  At 100 TB the vocab stays broadcast-size for any natural
    corpus (≤ tens of millions of types); nothing else changes."""
    docs = _docs(spark, sf_dir)
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.select(
        "doc_id", "lang", F.explode(tokenize_expr(text)).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    model = vocab.crossJoin(F.broadcast(total)).select(
        "token", (-F.log(F.col("cnt") / F.col("total"))).alias("neg_logp")
    )
    return (
        toks.join(F.broadcast(model), "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            portable_round(F.avg("neg_logp"), 6).alias("avg_neg_logprob"),
        )
        .orderBy("doc_id")
    )


_TFIDF_TERMS = ("merge", "window", "stream")


def _eq_term(term: str):
    """Single-arg lambda factory (a two-arg lambda would be interpreted by
    ``F.filter`` as the (element, index) form)."""
    return lambda x: x == F.lit(term)


@_register(
    "t12_tfidf_search",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WS_TOKS_SQL}) AS token
      FROM documents),
    doc_len AS (
      SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
    n_docs AS (SELECT count(*) AS n FROM documents),
    hits AS (
      SELECT doc_id, token, count(*) AS tf
      FROM toks WHERE token IN {_TFIDF_TERMS!r}
      GROUP BY doc_id, token),
    idf AS (
      SELECT h.token,
             ln((nd.n + 1.0) / (count(*) + 1.0)) + 1.0 AS idf
      FROM hits h CROSS JOIN n_docs nd
      GROUP BY h.token, nd.n)
    SELECT h.doc_id,
           floor(sum(h.tf * 1.0 / dl.n_tokens * i.idf) * 1000000.0 + 0.5)
             / 1000000.0 AS score
    FROM hits h
    JOIN doc_len dl USING (doc_id)
    JOIN idf i ON h.token = i.token
    GROUP BY h.doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def t12_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword relevance ranking over the corpus: score each
    document for a fixed query-term set by sum(tf/|doc| · idf) with
    smoothed idf = ln((N+1)/(df+1)) + 1 (the scikit-learn convention),
    and return the top-20.  This is the lexical half of the reference's
    hybrid retrieval (keyword_overlap, lib/search — A4/F12) upgraded to a
    corpus-statistics weighting.

    Plan shape: because the query-term set is a small literal, tf per
    term is a pure array expression (`size(filter(tokens, = term))`) —
    NO explode, NO per-token shuffle anywhere.  Pass 1 is a scalar
    partial+final aggregate (N plus one df per term, a handful of ints
    per task); its 1-row result broadcasts back and pass 2 scores +
    `TakeOrderedAndProject`s in a single map-side stage.  Two corpus
    scans, zero wide exchanges — the whole query is embarrassingly
    parallel at any scale.  Scores are rounded-then-ordered in BOTH
    engines so LIMIT-boundary ties resolve identically."""
    docs = _docs(spark, sf_dir)
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    arr = tokenize_expr(text)
    base = docs.select(
        "doc_id",
        F.size(arr).cast("bigint").alias("n_tokens"),
        *[
            F.size(F.filter(arr, _eq_term(t))).cast("bigint").alias(f"tf_{i}")
            for i, t in enumerate(_TFIDF_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(_TFIDF_TERMS))
        ],
    )
    tfidf_sum = None
    for i in range(len(_TFIDF_TERMS)):
        idf = F.log((F.col("n") + 1.0) / (F.col(f"df_{i}") + 1.0)) + 1.0
        term = F.col(f"tf_{i}") * 1.0 / F.col("n_tokens") * idf
        tfidf_sum = term if tfidf_sum is None else tfidf_sum + term
    any_hit = None
    for i in range(len(_TFIDF_TERMS)):
        hit = F.col(f"tf_{i}") > 0
        any_hit = hit if any_hit is None else any_hit | hit
    return (
        base.crossJoin(F.broadcast(stats))
        .filter(any_hit)
        .select("doc_id", portable_round(tfidf_sum, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@_register(
    "j11_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    changes AS (
      SELECT user_id, ts, event_id, event_type
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS version,
           event_type AS state,
           CAST(ts AS TIMESTAMP) AS valid_from,
           lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version
    """,
)
def j11_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from a change stream:
    collapse consecutive identical states per user, then derive
    [valid_from, valid_to) intervals with lead() — the standard CDC →
    warehouse-dimension materialization (the batch analogue of the
    reference's player-upsert history, services/ingest).

    Plan shape: two windows, both partitioned by user_id — ONE shuffle
    (the second window reuses the first's partitioning; AQE keeps them
    in the same exchange), per-user state is a single lag value.  No
    global sort, no driver loop; scales with users × changes."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    return changes.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    ).orderBy("user_id", "version")


@_register(
    "a20_session_window_native",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_us IS NULL
                       OR epoch_us(ts) - prev_us > CAST(120 AS BIGINT) * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered),
    numbered AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged)
    SELECT user_id,
           min(CAST(ts AS TIMESTAMP)) AS session_start,
           max(CAST(ts AS TIMESTAMP)) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def a20_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization through Spark's NATIVE ``session_window``
    aggregate — the twin of a10's lag/cumsum form, proving the built-in
    path computes identical sessions (oracle: the same recursive
    definition a10 uses, aggregated to per-session rows).

    Why it matters: ``session_window`` is the ONLY sessionization form
    Structured Streaming can run incrementally with watermark-based
    state eviction — the a10 window-function form is batch-only.  Plan
    shape: one hash exchange on user_id into a session-merging
    aggregation; no window function, no second shuffle beyond output
    presentation.  session_window's end = last event + gap, so the gap
    is subtracted back to report the true last-event time."""
    ev = _events(spark, sf_dir)
    grouped = ev.groupBy(
        "user_id", F.session_window("ts", "120 minutes").alias("sw")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return grouped.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        (F.col("sw.end") - F.expr("INTERVAL 120 MINUTES")).alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


@_register(
    "a21_approx_quantile_gate",
    """
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * 1000000.0 + 0.5) / 1000000.0
             AS exact_p50,
           floor(quantile_cont(value, 0.9) * 1000000.0 + 0.5) / 1000000.0
             AS exact_p90,
           true AS approx_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a21_approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch gate (a18's HLL pattern applied to percentiles):
    run the exact interpolated percentile AND ``approx_percentile``
    (Greenwald-Khanna, accuracy 10000) side by side per event_type, and
    return the exact values plus whether the sketch landed within 5% /
    0.5 absolute of truth.  The oracle predicts approx_ok=true, so a
    sketch regression goes red without hashing an engine-specific
    estimate.

    At 100 TB the sketch is the production form: bounded per-partition
    summary state merged once (partial+final), vs the exact percentile's
    full-value-list state.  Completes the sketch family next to
    HyperLogLog (a18) and Misra-Gries (a15_sketch)."""
    ev = _events(spark, sf_dir)
    row = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("e50"),
        F.percentile("value", F.lit(0.9)).alias("e90"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("value", F.lit(0.9), F.lit(10000)).alias("a90"),
    )
    tol50 = F.greatest(F.abs(F.col("e50")) * 0.05, F.lit(0.5))
    tol90 = F.greatest(F.abs(F.col("e90")) * 0.05, F.lit(0.5))
    return row.select(
        "event_type",
        portable_round(F.col("e50"), 6).alias("exact_p50"),
        portable_round(F.col("e90"), 6).alias("exact_p90"),
        (
            (F.abs(F.col("a50") - F.col("e50")) <= tol50)
            & (F.abs(F.col("a90") - F.col("e90")) <= tol90)
        ).alias("approx_ok"),
    ).orderBy("event_type")


@_register(
    "t13_quality_audit",
    """
    WITH mutated AS (
      SELECT lang,
             CASE WHEN doc_id % 21 = 0 THEN NULL
                  WHEN doc_id % 7 = 0 THEN ''
                  ELSE text END AS text,
             CASE WHEN doc_id % 13 = 0 THEN n_chars + 5
                  ELSE n_chars END AS n_chars
      FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT)
             AS n_null_text,
           CAST(count(*) FILTER (WHERE text = '') AS BIGINT)
             AS n_empty_text,
           CAST(count(*) FILTER (WHERE text IS NOT NULL
                                 AND n_chars <> length(text)) AS BIGINT)
             AS n_len_mismatch,
           CAST(count(*) FILTER (WHERE length(text) < 100) AS BIGINT)
             AS n_short
    FROM mutated
    GROUP BY lang
    ORDER BY lang
    """,
)
def t13_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit pass (the Deequ/expectations shape): per-lang
    null / empty / length-integrity / too-short counts in ONE scan and
    ONE partial+final aggregation — the validation gate a pipeline runs
    before promoting an ingest batch.

    The clean synthetic corpus would make every violation count zero (a
    vacuous oracle), so defects are injected deterministically first —
    doc_id % 21 → NULL text, % 7 → empty, % 13 → n_chars corrupted —
    identically in both engines (t7_pii_scrub's fixture-injection
    pattern), making every audit column prove its own detection logic.
    Conditional aggregates only; no joins, no second shuffle."""
    docs = _docs(spark, sf_dir)
    mutated = docs.select(
        "lang",
        F.when(F.col("doc_id") % 21 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 7 == 0, F.lit(""))
        .otherwise(F.col("text"))
        .alias("text"),
        F.when(F.col("doc_id") % 13 == 0, F.col("n_chars") + 5)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    return (
        mutated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("text").isNull().cast("bigint"))
            .cast("bigint")
            .alias("n_null_text"),
            F.sum((F.col("text") == "").cast("bigint"))
            .cast("bigint")
            .alias("n_empty_text"),
            F.sum(
                (
                    F.col("text").isNotNull()
                    & (F.col("n_chars") != F.length("text"))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_len_mismatch"),
            F.sum((F.length("text") < 100).cast("bigint"))
            .cast("bigint")
            .alias("n_short"),
        )
        .orderBy("lang")
    )


@_register(
    "a22_funnel",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOURS
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOURS
      GROUP BY e.user_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase,
           floor((SELECT count(*) FROM s3) * 1000000.0
                 / (SELECT count(*) FROM s1) + 0.5) / 1000000.0
             AS conversion
    """,
)
def a22_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step conversion funnel (view → click within 24 h → purchase
    within 24 h of the click), earliest-qualifying-progression semantics —
    the classic product-analytics query every OLAP engine is benchmarked
    on.

    Plan shape: three per-user min-aggregations chained by user_id
    equi-joins — every shuffle is on the same user_id key, so after the
    first exchange the join/agg pipeline stays co-partitioned (no
    re-shuffle); each step's frame shrinks monotonically (funnel!), and
    the final counts are 1-row scalar aggregates.  No window functions,
    no per-event state; scales with events/user."""
    ev = _events(spark, sf_dir)
    day = F.expr("INTERVAL 24 HOURS")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    c2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click"))
    c3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            F.when(F.col("n_view") == 0, F.lit(None).cast("double"))
            .otherwise(
                portable_round(
                    F.col("n_purchase") * F.lit(1.0) / F.col("n_view"), 6
                )
            )
            .alias("conversion"),
        )
    )


@_register(
    "a23_retention",
    """
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events)
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', CAST(f.cohort_week AS DATE),
                         CAST(a.active_week AS DATE)) / 7 AS BIGINT)
             AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY f.cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def a23_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by first-activity
    week, counted in every subsequent week they return — the second
    canonical product-analytics workload next to the funnel (a22).

    Plan shape: per-user first-event aggregation and the distinct
    (user, week) activity set both shuffle on user_id; the join stays on
    that key, and the final (cohort, offset) rollup is a small
    partial+final aggregation (output is #cohorts × #offsets rows).
    Both engines truncate weeks to Monday, so the offset arithmetic is
    engine-portable."""
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@_register(
    "j12_fuzzy_match_counts",
    """
    WITH p AS (
      SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
      FROM part)
    SELECT a.p_partkey, a.p_name,
           CAST(count(*) AS BIGINT) AS n_near_matches
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_partkey <> b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= 1
    GROUP BY a.p_partkey, a.p_name
    ORDER BY a.p_partkey
    """,
)
def j12_fuzzy_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-similarity self-join (blocked entity resolution): for
    every part, count the OTHER parts whose name is within Levenshtein
    distance 1, considering only candidates sharing the same first token
    — the classic blocking-key design that makes edit-distance joins
    feasible at scale (all-pairs is O(n²); blocked is Σ block².

    Plan shape: the physical join key is (block, length band) — one side
    replicates each row to lengths {L-1, L, L+1}, which is LOSSLESS for
    this predicate (lev ≤ 1 forces |Δlen| ≤ 1), so the declared
    first-token-block semantics are untouched while hot blocks shatter
    into per-length cells: Σ cell² comparisons instead of Σ block²
    (50M → ~3M on the sf0.1 names).  Edit distance evaluates JVM-side
    (`F.levenshtein`, whole-stage codegen) as the join residual, then a
    partial+final count per part.  Remaining skew dial at 100 TB: salt
    hot (block, length) cells, skew.py-style.  The oracle declares only
    the block + distance predicate — the banding provably cannot change
    the answer, so it stays exact."""
    p = _spread(
        _t(spark, sf_dir, "part").select(
            "p_partkey",
            "p_name",
            F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
            F.length("p_name").alias("ln"),
        )
    )
    bands = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        F.col("blk").alias("b_blk"),
        F.explode(
            F.array(F.col("ln") - 1, F.col("ln"), F.col("ln") + 1)
        ).alias("ln_k"),
    )
    return (
        p.join(
            bands,
            (F.col("blk") == F.col("b_blk"))
            & (F.col("ln") == F.col("ln_k"))
            & (F.col("p_partkey") != F.col("b_key"))
            # thresholded form (Spark 3.5+): the banded algorithm
            # early-exits past distance 1 — O(k·len) per pair instead of
            # the full O(len²) DP table; returns -1 iff distance > 1, so
            # `BETWEEN 0 AND 1` is boolean-identical to `lev(a,b) <= 1`
            & (
                F.levenshtein(F.col("p_name"), F.col("b_name"), 1)
                .between(0, 1)
            ),
        )
        .groupBy("p_partkey", "p_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_near_matches"))
        .orderBy("p_partkey")
    )


@_register(
    "a24_time_range_avg",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
      FROM events
      GROUP BY 1, 2, 3)
    SELECT event_type, day,
           floor(day_value * 1000000.0 + 0.5) / 1000000.0 AS day_value,
           floor(avg(day_value) OVER (
                 PARTITION BY event_type ORDER BY day_num
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) * 1000000.0 + 0.5)
             / 1000000.0 AS trailing_7d_avg
    FROM daily
    ORDER BY event_type, day
    """,
)
def a24_time_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-CALENDAR-DAY average via a RANGE window frame — the
    time-anchored complement of a14's ROWS frame: when a day has no
    events, RANGE correctly averages over the days that exist inside the
    calendar window instead of sliding back to older rows.  Frame bounds
    are integer day numbers (days since epoch) in BOTH engines, so the
    range arithmetic is engine-portable.

    Plan shape: one partial+final daily aggregation (exact DECIMAL sums),
    then one window per event_type partition over ~days rows — the
    post-aggregation frame is tiny regardless of raw event volume, which
    is what makes calendar-window dashboards cheap at 100 TB: the
    shuffle carries (type, day) rows, never events."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(
            "event_type",
            F.col("ts").cast("date").alias("day_d"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("day_value")
        )
        .select(
            "event_type",
            F.col("day_d").cast("string").alias("day"),
            F.datediff(F.col("day_d"), F.lit("1970-01-01").cast("date")).alias(
                "day_num"
            ),
            "day_value",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        portable_round(F.col("day_value"), 6).alias("day_value"),
        portable_round(F.avg("day_value").over(w), 6).alias("trailing_7d_avg"),
    ).orderBy("event_type", "day")


@_register(
    "m5_waveform_features",
    """
    WITH w AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings)
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_samples,
           floor(sqrt(list_sum(list_transform(v, x -> x * x)) / len(v))
                 * 1000000.0 + 0.5) / 1000000.0 AS rms,
           floor(list_max(list_transform(v, x -> abs(x)))
                 * 1000000.0 + 0.5) / 1000000.0 AS peak,
           CAST(len(list_filter(range(1, len(v)),
                    i -> (v[i] >= 0) <> (v[i + 1] >= 0))) AS BIGINT)
             AS zero_crossings
    FROM w
    ORDER BY vec_id
    """,
)
def m5_waveform_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style waveform feature extraction over a numeric sample
    array (RMS energy, peak amplitude, zero-crossing count) — the m-family
    pattern applied to 1-D signals: the embeddings table's float arrays
    stand in for decoded PCM frames, exactly how the image path (m2)
    separates decode (stubbed/tiered) from feature extraction (real,
    oracle-checked).

    Plan shape: pure JVM higher-order array expressions (transform /
    aggregate / filter over a zip of adjacent samples) — no explode, no
    shuffle except output ordering; embarrassingly parallel at any
    scale, the same property as m1/m3."""
    emb = _emb(spark, sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    n = F.size(v)
    sumsq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x * x
    )
    rms = F.sqrt(sumsq / n)
    peak = F.array_max(F.transform(v, lambda x: F.abs(x)))
    signs = F.transform(v, lambda x: (x >= 0).cast("int"))
    crossings = F.size(
        F.filter(
            F.zip_with(
                F.slice(signs, 1, n - 1),
                F.slice(signs, 2, n - 1),
                lambda a, b: a != b,
            ),
            lambda t: t,
        )
    )
    return emb.select(
        "vec_id",
        n.cast("bigint").alias("n_samples"),
        portable_round(rms, 6).alias("rms"),
        portable_round(peak, 6).alias("peak"),
        crossings.cast("bigint").alias("zero_crossings"),
    ).orderBy("vec_id")


@_register(
    "a25_grouped_correlation",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor(corr(value, CAST(extract(hour FROM ts) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS value_hour_corr
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a25_grouped_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation (value vs hour-of-day per event type)
    — the co-moment aggregate family (corr/covar), computed as a single
    partial+final aggregation: each task keeps the five running moments
    (n, Σx, Σy, Σxx, Σyy, Σxy) and merges them once, the same bounded-
    state shape as every other sketch/moment aggregate here.  Both
    engines implement the numerically-stable co-moment update, and the
    result is rounded before comparison."""
    ev = _events(spark, sf_dir)
    hour = F.hour("ts").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            portable_round(F.corr("value", hour), 6).alias("value_hour_corr"),
        )
        .orderBy("event_type")
    )


@_register(
    "a26_hopping_counts",
    """
    WITH expanded AS (
      SELECT event_type,
             unnest(ARRAY[date_trunc('hour', ts),
                          date_trunc('hour', ts) - INTERVAL 1 HOUR])
               AS window_start
      FROM events)
    SELECT event_type,
           strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM expanded
    GROUP BY 1, 2
    ORDER BY event_type, window_start
    """,
)
def a26_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) window counts — 2-hour windows advancing every
    hour, so each event contributes to exactly two windows: the
    monitoring/alerting window shape (smooth trend lines without
    tumbling-boundary artifacts), and the form Structured Streaming
    executes incrementally with watermark eviction.

    Plan shape: Spark's `window(ts, '2 hours', '1 hour')` compiles to an
    Expand (window-per-event replication, factor = duration/slide = 2)
    feeding ONE partial+final aggregation — the oracle replays the same
    two-starts-per-event expansion explicitly.  Exchange volume is
    (type, window, count) partials, bounded by distinct windows per
    partition, not events."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.window("ts", "2 hours", "1 hour").alias("win"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "event_type",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
        .orderBy("event_type", "window_start")
    )


def _pagerank_oracle(iterations: int = 10, damping: float = 0.85) -> str:
    """Unrolled power iteration: r_{i+1} as a CTE chain over the d2 pair
    relation — fixed iteration count makes PageRank expressible as plain
    SQL (recursive CTEs cannot aggregate over the recursive table)."""
    pair_sql = _minhash_lsh_oracle()
    ctes = [
        f"prs AS ({pair_sql})",
        "edges AS (SELECT id_a AS u, id_b AS v FROM prs"
        " UNION SELECT id_b AS u, id_a AS v FROM prs)",
        "deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u)",
        "cnt AS (SELECT count(*) AS n FROM deg)",
        "r0 AS (SELECT u AS node, 1.0 / c.n AS rank"
        " FROM deg CROSS JOIN cnt c)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""r{i + 1} AS (
      SELECT d.u AS node,
             (1.0 - {damping}) / c.n
               + {damping} * coalesce(s.in_sum, 0.0) AS rank
      FROM deg d CROSS JOIN cnt c
      LEFT JOIN (
        SELECT e.v AS node, sum(r.rank / dg.deg) AS in_sum
        FROM r{i} r
        JOIN edges e ON r.node = e.u
        JOIN deg dg ON e.u = dg.u
        GROUP BY e.v) s ON d.u = s.node)"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT node AS doc_id,
           floor(rank * 100000000.0 + 0.5) / 100000000.0 AS pagerank
    FROM r{iterations}
    ORDER BY doc_id
    """


@_register("d11_pagerank_dupgraph", _pagerank_oracle())
def d11_pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate graph — the web-graph quality
    signal LLM data pipelines weight documents by (highly-linked ≈
    highly-duplicated here: rank mass concentrates in dense dup
    neighborhoods, a useful inverse-quality prior).  Second iterative
    algorithm beside connected components (d8), same execution shape:
    10 fixed power iterations, each ONE join + ONE aggregation moving
    (node, contribution) pairs only, lineage truncated per round with
    lazy localCheckpoint.  At 100 TB the per-round shuffle is O(edges) id
    pairs — vectors and documents never move.  The oracle unrolls the
    identical iteration as a CTE chain."""
    from ..operators.graph import pagerank

    pairs = _lsh_pairs(spark, sf_dir)
    ranks = pagerank(pairs, iterations=10, damping=0.85)
    return ranks.select(
        F.col("node").alias("doc_id"),
        portable_round(F.col("rank"), 8).alias("pagerank"),
    ).orderBy("doc_id")


def _c4_word5_gram_exprs() -> "tuple[Column, Column]":
    """The C4-style word-5-gram expressions ``(w, grams)`` — SHARED by
    t14 and its CMS-gated twin t26, whose identity-oracle contract
    requires the two gram derivations to stay bit-identical: one
    definition means they cannot drift."""
    w = F.split(F.lower(F.col("text")), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 5),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, F.lit(5))),
    )
    return w, grams


@_register(
    "t14_boilerplate_ngrams",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(w[i.i:i.i+4], ' ') AS g
      FROM toks, unnest(range(1, len(w) - 3)) i(i)
      WHERE len(w) >= 5)
    SELECT g AS ngram, CAST(count(*) AS BIGINT) AS doc_count
    FROM grams
    GROUP BY g
    HAVING count(*) >= 3
    ORDER BY ngram
    """,
)
def t14_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate detection: word 5-grams appearing in >= 3
    DISTINCT documents — the corpus-wide frequent-phrase pass an LLM
    pipeline runs to find navigation chrome / license footers before
    stripping them (Raffel et al. 2020 drop any line seen 3+ times).

    Plan shape: per-doc shingling is pure expression work (split →
    sequence → slice → concat_ws → explode), then ONE shuffle keyed by
    (ngram, doc_id) for the distinct and a map-side-combined count on top
    — the same exploded-shingle discipline as d2/d9: only (gram-hash,
    id) pairs ever move, never documents.  At 100 TB gram doc-frequency
    is a classic skew point (the boilerplate grams ARE the hot keys) —
    partial aggregation absorbs them before the exchange."""
    docs = _docs(spark, sf_dir)
    w, grams = _c4_word5_gram_exprs()
    return (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 5)
        .select("doc_id", F.explode(grams).alias("ngram"))
        .distinct()
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("doc_count"))
        .filter(F.col("doc_count") >= 3)
        .orderBy("ngram")
    )


@_register(
    "a27_zscore_outliers",
    """
    WITH stats AS (
      SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           floor(e.value * 1000000.0 + 0.5) / 1000000.0 AS value,
           floor((e.value - s.m) / s.sd * 1000000.0 + 0.5) / 1000000.0
             AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE abs(e.value - s.m) / s.sd > 3.0
    ORDER BY e.event_id
    """,
)
def a27_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| > 3 vs the event-type
    mean/stddev) — the metric-anomaly pass run over telemetry before
    training on it, and the grouped-standardization shape feature
    pipelines use.

    Plan shape: ONE partial+final moments aggregation (count/avg/stddev
    merge in bounded state per task) produces a 5-row stats dim that is
    broadcast back onto the fact scan — the big side is read once,
    filtered in place, never shuffled.  At 100 TB this is the canonical
    two-pass standardize: tiny dim out, broadcast join back, predicate
    evaluated scan-side."""
    ev = _events(spark, sf_dir)
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("sd"),
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            portable_round(F.col("value"), 6).alias("value"),
            portable_round(z, 6).alias("zscore"),
        )
        .orderBy("event_id")
    )


def _source_weight_dim(docs: DataFrame) -> DataFrame:
    """Per-source alpha-smoothed mixing weights as an INTEGER micro-weight
    dim (source, n_docs, char_mass, weight_micro) — THE single definition
    t15 (reports weight_micro/1e6) and t19 (samples by integer
    comparison) both consume; a change to the exponent or rounding lands
    in both entries at once."""
    mass = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("char_mass"),
    )
    raw = mass.withColumn(
        "r", F.pow(F.col("char_mass").cast("double"), F.lit(0.7))
    )
    z = F.sum("r").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return raw.select(
        "source",
        "n_docs",
        "char_mass",
        F.floor(F.col("r") / z * 1_000_000.0 + 0.5)
        .cast("bigint")
        .alias("weight_micro"),
    )


@_register(
    "t15_mixing_weights",
    """
    WITH mass AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS char_mass
      FROM documents GROUP BY source),
    raw AS (
      SELECT source, n_docs, char_mass,
             pow(CAST(char_mass AS DOUBLE), 0.7) AS r
      FROM mass)
    SELECT source, n_docs, char_mass,
           floor(r / (SELECT sum(r) FROM raw) * 1000000.0 + 0.5)
             / 1000000.0 AS weight
    FROM raw
    ORDER BY source
    """,
)
def t15_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing weights: per-source sampling
    probability proportional to (char mass)^0.7 — the alpha-smoothed
    resampling rule multilingual/multi-source LLM training uses to
    up-weight small sources without letting big ones dominate (the
    mBERT/XLM-R exponent-smoothing recipe).

    Plan shape: ONE partial+final aggregation collapses the corpus to a
    per-source mass dim (sources number in the thousands at most); the
    normalizing constant is an unpartitioned window SUM over that dim —
    bounded by the source count, NOT a second corpus scan (a scalar
    subquery would re-derive the whole aggregation subtree).  After the
    first shuffle nothing bigger than the dim ever moves.  Downstream,
    t4's deterministic hash-bucket sampler consumes exactly this weight
    column."""
    dim = _source_weight_dim(_docs(spark, sf_dir))
    # weight_micro / 1e6 == floor(r/z * 1e6 + 0.5) / 1e6 exactly
    return dim.select(
        "source",
        "n_docs",
        "char_mass",
        (F.col("weight_micro").cast("double") / 1_000_000.0).alias("weight"),
    ).orderBy("source")


@_register(
    "v9_embedding_pool",
    """
    SELECT vec_id, CAST(i.i AS BIGINT) AS dim,
           floor((CAST(embedding[4*i.i+1] AS DOUBLE)
                + CAST(embedding[4*i.i+2] AS DOUBLE)
                + CAST(embedding[4*i.i+3] AS DOUBLE)
                + CAST(embedding[4*i.i+4] AS DOUBLE)) / 4.0
                 * 1000000.0 + 0.5) / 1000000.0 AS pooled
    FROM embeddings, unnest(range(0, 16)) i(i)
    ORDER BY vec_id, dim
    """,
)
def v9_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooling dimensionality reduction 64-d → 16-d (each output
    dim averages a contiguous 4-float block) — the cheap Matryoshka-
    style coarse representation ANN pipelines use as a first-pass
    filter: 4× less memory and 4× faster distance math for the
    candidate-generation stage, with v2/v6/v7 re-ranking on the full
    vector.

    Plan shape: pure narrow expression work — sequence/explode plus
    element_at arithmetic, no shuffle at all (the orderBy is
    presentation-only for the oracle).  Additions run left-to-right in
    double in both engines, so values are bit-identical before the
    portable round."""
    emb = _emb(spark, sf_dir)
    pooled = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("dim"),
        "embedding",
    )
    val = (
        F.element_at("embedding", F.col("dim") * 4 + 1).cast("double")
        + F.element_at("embedding", F.col("dim") * 4 + 2).cast("double")
        + F.element_at("embedding", F.col("dim") * 4 + 3).cast("double")
        + F.element_at("embedding", F.col("dim") * 4 + 4).cast("double")
    )
    return pooled.select(
        "vec_id",
        F.col("dim").cast("bigint").alias("dim"),
        portable_round(val / 4.0, 6).alias("pooled"),
    ).orderBy("vec_id", "dim")


def _inc_dedup_prefix_ctes(num_hashes: int, bands: int) -> str:
    """Shared toks/sh/sig/bands CTE text for the incremental-dedup
    oracles (d12 and the d28 lifecycle entry): one MinHash banding of
    the FULL documents table; each increment's cand chain then selects
    its own (batch, existing) split from the shared band table."""
    from ..functions.hashing import MINHASH_PRIME, minhash_constants

    rows = num_hashes // bands
    toks = _DUCK_NORM_TOKENS.format(col="text")
    base = (
        f"(('0x' || substring(md5('mh:' || s), 1, 15))::BIGINT % {MINHASH_PRIME})"
    )
    consts = minhash_constants(num_hashes)
    sig_items = ", ".join(
        f"list_min(list_transform(shingles, s -> ({a} * {base} + {b}) % {MINHASH_PRIME}))"
        for a, b in consts
    )
    return f"""toks AS (
      SELECT doc_id, {toks} AS tokens FROM documents),
    sh AS (
      SELECT doc_id, {_DUCK_SHINGLES3} AS shingles FROM toks),
    sig AS (
      SELECT doc_id, shingles,
             [{sig_items}] AS signature
      FROM sh),
    bands AS (
      SELECT doc_id, shingles, unnest(
        [CAST(b AS VARCHAR) || ':' ||
         md5(array_to_string(list_transform(
             list_slice(signature, b * {rows} + 1, b * {rows} + {rows}),
             x -> CAST(x AS VARCHAR)), ','))
         FOR b IN range({bands})]) AS band
      FROM sig)"""


def _inc_dedup_increment_ctes(
    suffix: str, batch_pred: str, exist_pred: str, min_j: float
) -> str:
    """cand/scored/best chain for ONE increment over the shared band
    table.  ``batch_pred``/``exist_pred`` are format strings taking
    ``{col}`` (e.g. ``"{col} % 3 = 1"``); the candidate rule is d12's —
    x in the batch, m either existing or an earlier batch doc."""
    bx = batch_pred.format(col="x.doc_id")
    bm = batch_pred.format(col="m.doc_id")
    em = exist_pred.format(col="m.doc_id")
    return f"""cand{suffix} AS (
      SELECT DISTINCT x.doc_id AS xid, m.doc_id AS mid,
             x.shingles AS sh_x, m.shingles AS sh_m,
             CASE WHEN {em} THEN 'existing' ELSE 'batch' END
               AS origin
      FROM bands x JOIN bands m ON x.band = m.band
      WHERE {bx}
        AND (({em}) OR (({bm}) AND m.doc_id < x.doc_id))),
    scored{suffix} AS (
      SELECT xid, mid, origin,
             CAST(len(list_intersect(sh_x, sh_m)) AS DOUBLE)
             / len(list_distinct(list_concat(sh_x, sh_m))) AS j
      FROM cand{suffix}),
    best{suffix} AS (
      SELECT xid, mid, origin, j,
             row_number() OVER (PARTITION BY xid ORDER BY j DESC, mid)
               AS rn
      FROM scored{suffix} WHERE j >= {min_j})"""


def _incremental_dedup_oracle(
    num_hashes: int = 16, bands: int = 4, min_j: float = 0.1
) -> str:
    return f"""
    WITH {_inc_dedup_prefix_ctes(num_hashes, bands)},
    {_inc_dedup_increment_ctes("", "{col} % 2 = 1", "{col} % 2 = 0", min_j)}
    SELECT xid AS doc_id, mid AS matched_id, origin,
           round(j, 6) AS jaccard
    FROM best WHERE rn = 1
    ORDER BY doc_id
    """


@_register("d12_incremental_dedup", _incremental_dedup_oracle())
def d12_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the daily-ingest form of d2/d8 — a new batch
    (odd doc_ids) checked against the already-kept corpus (even doc_ids)
    AND against earlier docs in the same batch, reporting each duplicate
    batch doc's best match with its origin.  This is the operation a
    100 TB pipeline runs per increment (full-corpus re-dedup is a
    backfill); in production the existing side's band table is a
    persisted signature store, so each increment shuffles only O(batch)
    band rows.  Plan shape identical to d2: (id, band) bucket join, exact
    shingle-Jaccard verify on candidates only, then a per-doc best-match
    window bounded by candidate count.

    Dial: planner-routed like d2's ``_lsh_pairs`` — 0.1 is the proven
    non-prunable threshold, so ``minhash_route`` returns the declared
    (16, 4) fallback the static oracle mirrors (assert = the tripwire);
    an incremental run at a prunable threshold would take the planned
    dial instead (d26 pins that regime's oracle mechanics)."""
    from ..operators.dedup import incremental_minhash_dedup, minhash_route

    docs = _docs(spark, sf_dir)
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    # footer row count (round 15): identical to docs.count(), zero jobs
    hashes, bands, plan = minhash_route(_table_rows(sf_dir, "documents"), 0.1)
    assert not plan.prunes and (hashes, bands) == (16, 4), (
        f"minhash_route returned ({hashes}, {bands}, prunes="
        f"{plan.prunes}) but d12's oracle mirrors (16, 4)"
    )
    out = incremental_minhash_dedup(
        existing, batch, "doc_id", "text",
        shingle_n=3, num_hashes=hashes, bands=bands, min_jaccard=0.1,
    )
    return out.select(
        "doc_id",
        "matched_id",
        "origin",
        portable_round(F.col("jaccard"), 6).alias("jaccard"),
    ).orderBy("doc_id")


# the three-increment split the d28 lifecycle entry drives and its
# oracle mirrors: (batch_pred, exist_pred) per increment, thirds of the
# documents table ingested in sequence against a growing store
_D28_INCREMENTS = (
    ("{col} % 3 = 0", "1 = 0"),
    ("{col} % 3 = 1", "{col} % 3 = 0"),
    ("{col} % 3 = 2", "{col} % 3 < 2"),
)


def _lifecycle_oracle(
    num_hashes: int = 16, bands: int = 4, min_j: float = 0.1
) -> str:
    """Three d12-style increment chains over one shared banding — the
    static mirror of the commit-log lifecycle: increment k's existing
    side is exactly the union of batches 0..k-1, which is what the
    store holds when the appends are exactly-once."""
    ctes = [_inc_dedup_prefix_ctes(num_hashes, bands)]
    selects = []
    for k, (bp, ep) in enumerate(_D28_INCREMENTS):
        ctes.append(_inc_dedup_increment_ctes(str(k), bp, ep, min_j))
        selects.append(
            f"SELECT CAST({k} AS BIGINT) AS increment, xid AS doc_id, "
            f"mid AS matched_id, origin, round(j, 6) AS jaccard "
            f"FROM best{k} WHERE rn = 1"
        )
    union = "\n    UNION ALL ".join(selects)
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    {union}
    ORDER BY increment, doc_id
    """
    )


@_register("d28_incremental_lifecycle", _lifecycle_oracle())
def d28_incremental_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END incremental dedup lifecycle (round 12, closing the
    round-11 verdict's #1): three ingest batches (doc_id thirds) driven
    through a COMMIT-LOG-BACKED signature store —

        dedup batch k against the store → append batch k's state
        exactly once (txn marker = batch id) → repeat —

    returning every increment's duplicate report.  The oracle mirrors
    each increment as a d12 chain whose existing side is the union of
    batches 0..k-1 — exactly what the store holds when appends are
    exactly-once, so a double-append OR a lost append would change the
    candidate sets and break the hash.  The entry additionally asserts
    the exactly-once mechanics in-line (one commit-log version per
    batch; a REPLAY of batch 1 is detected and skipped; the final store
    mirrors the corpus row count exactly), failing loudly rather than
    drifting.

    Scale shape (ingest/dedup_lifecycle.py): per increment the batch's
    shingle scan runs once (persisted state frame feeds both the dedup
    and the append), the batch's band table broadcasts into the band
    join (the store side streams — no exchange carries store-side band
    rows), the verify exchange is candidate-pruned (broadcast semi-join
    by default; bloom opt-in), and the append is one commit-log
    transaction of O(batch) rows.  Reference analog: the
    re-ingest hygiene of scripts/prune_pending_jobs.sh + vector-id
    idempotency (SURVEY §2.9 Q6) applied to dedup state."""
    import shutil
    import tempfile

    from ..ingest.dedup_lifecycle import (
        SIGNATURE_STORE_APP,
        dedup_increment,
        open_signature_store,
    )
    from ..operators.dedup import minhash_signature_state

    docs = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="chessmate_sigstore_")
    try:
        store = open_signature_store(spark, tmp)
        outs = []
        for k in range(3):
            third = docs.filter(F.col("doc_id") % 3 == k)
            inc = dedup_increment(
                store, third, "doc_id", "text", batch_id=k,
                shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
            )
            assert inc.appended_version == k + 1, (
                f"batch {k} landed as version {inc.appended_version}, "
                "expected one commit per batch (exactly-once violated)"
            )
            outs.append(
                inc.duplicates.withColumn(
                    "increment", F.lit(k).cast("bigint")
                )
            )
        # replay of batch 1: the commit log must detect and skip it
        replay = store.append_idempotent(
            minhash_signature_state(
                docs.filter(F.col("doc_id") % 3 == 1), "doc_id", "text",
                shingle_n=3, num_hashes=16,
            ),
            SIGNATURE_STORE_APP, 1,
        )
        assert replay is None and store.latest_version() == 3, (
            f"replay appended (version={replay}, "
            f"head={store.latest_version()}): exactly-once violated"
        )
        # footer-based counts (round 15, guide §1.2): both sides of the
        # store-mirrors-corpus assert are properties the immutable
        # parquet files' own metadata records — two driver-side footer
        # reads replace two full Spark count jobs, same exact numbers
        import pyarrow.parquet as _pq

        n_store = store.count_rows()
        n_docs = _pq.ParquetFile(
            f"{sf_dir}/documents.parquet"
        ).metadata.num_rows
        assert n_store == n_docs, (
            f"store holds {n_store} rows for a {n_docs}-doc corpus: "
            "state was dropped or double-appended"
        )
        out = outs[0].unionByName(outs[1]).unionByName(outs[2])
        # duplicates frames are localCheckpoint-materialized, so the
        # store directory can be removed before the driver collects
        return out.select(
            "increment",
            "doc_id",
            "matched_id",
            "origin",
            portable_round(F.col("jaccard"), 6).alias("jaccard"),
        ).orderBy("increment", "doc_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@_register(
    "j13_cdc_merge",
    """
    WITH t AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
    changes AS (
      SELECT c_custkey AS k, 'delete' AS op,
             CAST(NULL AS DOUBLE) AS amt, CAST(NULL AS VARCHAR) AS nm
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, 'update', c_acctbal + 100.0, c_name
      FROM customer WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c_custkey + 10000000, 'insert', 0.0,
             'new-' || CAST(c_custkey AS VARCHAR)
      FROM customer WHERE c_custkey % 10 = 2
      UNION ALL
      SELECT c_custkey, 'insert', -1.0,
             'dup-' || CAST(c_custkey AS VARCHAR)
      FROM customer WHERE c_custkey % 10 = 3),
    merged AS (
      SELECT coalesce(t.c_custkey, c.k) AS c_custkey,
             CASE WHEN t.c_custkey IS NOT NULL AND c.op = 'update' THEN c.nm
                  WHEN t.c_custkey IS NULL AND c.op = 'insert' THEN c.nm
                  ELSE t.c_name END AS c_name,
             CASE WHEN t.c_custkey IS NOT NULL AND c.op = 'update' THEN c.amt
                  WHEN t.c_custkey IS NULL AND c.op = 'insert' THEN c.amt
                  ELSE t.c_acctbal END AS c_acctbal,
             t.c_custkey AS tk, c.op AS op
      FROM t FULL OUTER JOIN changes c ON t.c_custkey = c.k)
    SELECT c_custkey, c_name, c_acctbal FROM merged
    WHERE (tk IS NOT NULL AND (op IS NULL OR op <> 'delete'))
       OR (tk IS NULL AND op = 'insert')
    ORDER BY c_custkey
    """,
)
def j13_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (lakehouse upsert): apply a deterministic synthetic
    change batch — deletes (key%10=0), updates (=1, +100 balance),
    inserts of new keys (=2), and a no-clause-fires insert of EXISTING
    keys (=3, must pass the target row through untouched) — to the
    customer snapshot, Delta/Iceberg `MERGE INTO` semantics from one
    full-outer equi-join + CASE resolution (operators/merge.py).

    Plan shape: ONE join on the merge key; in production the change
    batch is tiny vs the target so AQE broadcasts it and the target
    never shuffles.  The apply is pure column logic — no window, no
    state, no second pass."""
    from ..operators.merge import cdc_merge

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    k = F.col("c_custkey")
    changes = (
        cust.filter(k % 10 == 0)
        .select(
            k.alias("c_custkey"),
            F.lit("delete").alias("op"),
            F.lit(None).cast("double").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_name"),
        )
        .unionByName(
            cust.filter(k % 10 == 1).select(
                k.alias("c_custkey"),
                F.lit("update").alias("op"),
                (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
                F.col("c_name"),
            )
        )
        .unionByName(
            cust.filter(k % 10 == 2).select(
                (k + 10000000).alias("c_custkey"),
                F.lit("insert").alias("op"),
                F.lit(0.0).alias("c_acctbal"),
                F.concat(F.lit("new-"), k.cast("string")).alias("c_name"),
            )
        )
        .unionByName(
            cust.filter(k % 10 == 3).select(
                k.alias("c_custkey"),
                F.lit("insert").alias("op"),
                F.lit(-1.0).alias("c_acctbal"),
                F.concat(F.lit("dup-"), k.cast("string")).alias("c_name"),
            )
        )
    )
    return cdc_merge(cust, changes, "c_custkey").orderBy("c_custkey")


@_register(
    "m6_waveform_resample",
    """
    SELECT vec_id, CAST(i.i AS BIGINT) AS sample_idx,
           floor((CAST(embedding[CAST(floor(i.i * 63.0 / 47.0) AS BIGINT) + 1]
                       AS DOUBLE)
                    * (1.0 - (i.i * 63.0 / 47.0
                              - floor(i.i * 63.0 / 47.0)))
                + CAST(embedding[least(
                         CAST(floor(i.i * 63.0 / 47.0) AS BIGINT) + 2, 64)]
                       AS DOUBLE)
                    * (i.i * 63.0 / 47.0 - floor(i.i * 63.0 / 47.0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS value
    FROM embeddings, unnest(range(0, 48)) i(i)
    ORDER BY vec_id, sample_idx
    """,
)
def m6_waveform_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform resampling 64 → 48 samples by linear interpolation —
    the audio-rate normalization step (m5's sibling: m5 extracts
    features from a signal, this reshapes the signal itself), over the
    same numeric sample arrays.

    Plan shape: sequence/explode + element_at blending in the
    projection — zero shuffles beyond presentation order; the double
    arithmetic (left-to-right position mapping and blend) is
    bit-identical across engines before the portable round."""
    from ..operators.multimodal import waveform_resample

    emb = _emb(spark, sf_dir)
    out = waveform_resample(
        emb, "vec_id", "embedding", src_len=64, dst_len=48
    )
    return out.select(
        "vec_id",
        "sample_idx",
        portable_round(F.col("value"), 6).alias("value"),
    ).orderBy("vec_id", "sample_idx")


@_register(
    "t17_source_cap",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    ORDER BY source, rk
    """,
)
def t17_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep exactly K docs per source, chosen
    by a deterministic md5 shuffle order — the "no source dominates"
    guard a curation pipeline applies after t15's mixing weights, and
    reproducible across runs/engines because the order key is a hash,
    never rand().

    Plan shape: one hash exchange on source + in-partition sort for the
    row_number, filter rk <= K — per-group top-k.  At 100 TB with a
    pathological mega-source, the window sorts that group's full
    partition; the production hardening is a hash-threshold PRE-filter
    (keep rows with md5 below ~K/n_source quantile, a scan-side
    predicate) before the exact window — same output, bounded sort
    input.  K here is 10."""
    docs = _docs(spark, sf_dir)
    order_key = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(order_key, F.col("doc_id"))
    )
    return (
        docs.select("doc_id", "source", rk.cast("bigint").alias("rk"))
        .filter(F.col("rk") <= 10)
        .orderBy("source", "rk")
    )


@_register(
    "t16_bigram_logprob",
    f"""
    WITH ta AS (
      SELECT doc_id, lang, {_WS_TOKS_SQL} AS w FROM documents),
    toks AS (
      SELECT doc_id, unnest(w) AS token FROM ta),
    uni AS (
      SELECT token, count(*) AS c1 FROM toks GROUP BY token),
    v AS (SELECT count(*) AS vocab FROM uni),
    big AS (
      SELECT doc_id, lang, w[i.i] AS w1, w[i.i + 1] AS w2
      FROM ta, unnest(range(1, len(w))) i(i)
      WHERE len(w) >= 2),
    c2 AS (
      SELECT w1, w2, count(*) AS cnt FROM big GROUP BY w1, w2)
    SELECT b.doc_id, b.lang,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(avg(-ln((c2.cnt + 1.0) / (u.c1 + vv.vocab)))
                 * 1000000.0 + 0.5) / 1000000.0 AS avg_neg_logprob
    FROM big b
    JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
    JOIN uni u ON b.w1 = u.token
    CROSS JOIN v vv
    GROUP BY b.doc_id, b.lang
    ORDER BY b.doc_id
    """,
)
def t16_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score with add-1 smoothing —
    t11's next-order sibling (the CCNet/KenLM filter family): train
    conditional probabilities p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) on the
    corpus, score each doc by mean negative log-likelihood over its
    bigrams.

    Plan shape: one tokenized scan feeds unigram counts, bigram counts,
    and the scorer (adjacent-token pairs via zipped slices — no
    positional self-join).  The unigram model broadcasts like t11's;
    the BIGRAM model is the scale watch-point — bigram types can exceed
    broadcast size, and then the score join degrades gracefully to a
    hash join co-partitioned on (w1, w2): still one corpus-scale
    shuffle.  V is a 1-row dim."""
    docs = _docs(spark, sf_dir)
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    ta = docs.select("doc_id", "lang", tokenize_expr(text).alias("w"))
    toks = ta.select(F.explode("w").alias("token"))
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("vocab"))
    n = F.size("w")
    pairs = F.arrays_zip(
        F.slice(F.col("w"), 1, n - 1).alias("w1"),
        F.slice(F.col("w"), 2, n - 1).alias("w2"),
    )
    big = (
        ta.filter(n >= 2)
        .select("doc_id", "lang", F.explode(pairs).alias("p"))
        .select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    neg = -F.log((F.col("cnt") + 1.0) / (F.col("c1") + F.col("vocab")))
    return (
        big.join(c2, ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("token", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            portable_round(F.avg(neg), 6).alias("avg_neg_logprob"),
        )
        .orderBy("doc_id")
    )


@_register(
    "j14_bloom_prune_join",
    """
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000.0
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def j14_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join: identical answer to the plain equi-join (the
    oracle IS the unfiltered SQL join), but the orders side tests each
    o_custkey against a 128 Kbit Bloom filter of the ~10%-selective
    customer dim BEFORE any exchange, so ~90% of fact rows never enter
    the shuffle.  No false negatives by construction; the exact join
    removes the false positives.  The 100 TB case this exists for: a dim
    whose key set is too large to broadcast as rows but whose bitmap is
    a few hundred KiB (operators/bloom.py module docstring).  Reference
    parity: the payload-filter push V3 (SURVEY §2.8) when the filter set
    outgrows a broadcast list."""
    from ..operators.bloom import bloom_prune_join

    orders = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    joined = bloom_prune_join(
        orders, dim, "o_custkey", "c_custkey", m_bits=1 << 17
    )
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("c_nationkey")
    )


@_register(
    "s13_csv_roundtrip",
    """
    SELECT c_custkey, c_name, c_nationkey,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
    FROM customer
    ORDER BY c_custkey
    """,
)
def s13_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV connector proof: customer → CSV (RFC-4180 quoting, explicit
    NULL token, schema-enforced FAILFAST read) → back, compared against
    the ORIGINAL parquet by the oracle — the round trip must be
    bit-lossless or the hash check fails.  The interchange pattern at
    100 TB: upstream dumps arrive as CSV, the first job schema-reads
    them (never inferSchema — that's a second full scan) and lands
    parquet (ingest/formats.py).  Reference parity: text-edge ingest,
    SURVEY §2.1 S1/S10."""
    from ..ingest.formats import roundtrip_csv

    token = _sf_token(sf_dir)
    cust = _t(spark, sf_dir, "customer")
    back = roundtrip_csv(cust, f"/tmp/chessmate_formats/{token}/customer_csv")
    return back.orderBy("c_custkey")


@_register(
    "s14_jsonl_roundtrip",
    """
    SELECT event_id, user_id, event_type,
           CAST(value AS DOUBLE) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
           props
    FROM events
    ORDER BY event_id
    """,
)
def s14_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines connector proof over the one table with REAL
    microsecond timestamps (events.ts): JSONL with the pinned micros
    format → schema-enforced read → back, oracle-compared against the
    original parquet with 6-digit fractional output — so the silent
    default-option failure (second-precision truncation) flips this
    entry red instead of hiding behind midnight-only dates.  JSONL is
    the document-interchange twin of s13 and the line format every
    LLM-corpus pipeline emits.  Reference parity: JSON document
    construction/extraction, SURVEY §2.7 F16/F17."""
    from ..ingest.formats import roundtrip_jsonl

    token = _sf_token(sf_dir)
    ev = _events(spark, sf_dir)
    back = roundtrip_jsonl(ev, f"/tmp/chessmate_formats/{token}/events_jsonl")
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "props",
    ).orderBy("event_id")


def _register_x10():
    # shares t8's oracle verbatim: the UDTF must reproduce the expression
    # pipeline's chunks byte-for-byte
    t8_oracle = QUERIES["t8_chunk_documents"][1]

    @_register("x10_chunk_udtf", t8_oracle)
    def x10_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Python UDTF surface (SURVEY §2.10): the t8 RAG chunker
        re-expressed as a table function in a LATERAL join, sharing t8's
        oracle so the two forms are pinned byte-identical (chunk md5s).
        The reference has no UDTFs; this entry proves the engine's
        extension point for operators that genuinely need one-row→N-rows
        Python (a future tokenizer/parser Spark can't express).  Arrow-
        optimized (useArrow), but still per-row Python — the docstringed
        contract is that t8's expression form IS the production path and
        this surface exists for semantics expressions can't reach."""
        import re as _re2

        from pyspark.sql.functions import udtf

        @udtf(
            returnType="doc_id bigint, chunk_no int, chunk_text string",
            useArrow=True,
        )
        class ChunkWindows:
            def eval(self, doc_id, text):
                toks = (
                    _re2.sub(r"[^a-z0-9]+", " ", (text or "").lower())
                    .strip()
                    .split()
                )
                if not toks:
                    return
                for start in range(0, max(len(toks) - 16, 1), 48):
                    yield doc_id, start, " ".join(toks[start : start + 64])

        spark.udtf.register("cm_chunk_windows", ChunkWindows)
        token = _sf_token(sf_dir)
        view = f"cm_x10_docs_{token}"
        _docs(spark, sf_dir).createOrReplaceTempView(view)
        return spark.sql(
            f"""
            SELECT c.doc_id, c.chunk_no,
                   CAST(size(split(c.chunk_text, ' ')) AS INT) AS chunk_tokens,
                   md5(c.chunk_text) AS chunk_md5
            FROM {view} d, LATERAL cm_chunk_windows(d.doc_id, d.text) c
            ORDER BY c.doc_id, c.chunk_no
            """
        )


_register_x10()


def _register_j15():
    # shares j9's oracle verbatim: the two-stream run must produce the
    # batch interval join's exact rows
    j9_oracle = QUERIES["j9_interval_join"][1]

    @_register("j15_stream_interval_join", j9_oracle)
    def j15_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Stream-stream interval join as a REAL Structured Streaming run
        (not the batch twin): events land as parquet, two readStream
        sides (clicks, purchases) with watermarks join on user_id within
        [click_ts, click_ts + 30 min), availableNow drains to a parquet
        sink, and the sink must equal j9's batch answer row-for-row —
        same oracle.  The watermark here is sized to the fixture's full
        time span so no row is late-dropped (the oracle is the complete
        join); production picks the real lateness SLA and the state
        store holds only watermark+interval of history per side —
        the bounded-state contract tests/test_stream_join.py pins on
        synthetic late rows."""
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="cm_j15_")
        # watermarks require TIMESTAMP (not NTZ, which is how parquet
        # timestamp[us] arrives): pin the session tz to UTC — the one tz
        # with no DST gaps, so NTZ→TZ→NTZ is bijective — cast in, run the
        # stream, cast back, restore the conf (the _events pattern)
        tz_key = "spark.sql.session.timeZone"
        prior_tz = spark.conf.get(tz_key)
        spark.conf.set(tz_key, "UTC")
        try:
            src, sink, ckpt = f"{base}/src", f"{base}/sink", f"{base}/ckpt"
            ev = _events(spark, sf_dir)
            ts_type = dict(ev.dtypes)["ts"]
            ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
            # watermark delay sized from the corpus's ACTUAL time span
            # (+1 h slack), computed before the stream starts — a
            # constant (the old 90 days) silently late-drops rows the
            # moment a corpus outgrows it and diverges from the oracle
            bounds = ev.agg(
                F.min("ts").alias("lo"), F.max("ts").alias("hi")
            ).first()
            span_s = (
                int((bounds["hi"] - bounds["lo"]).total_seconds()) + 3600
                if bounds["lo"] is not None
                else 3600
            )
            wm = f"{span_s} seconds"
            # one file → one micro-batch: with multiple batches the
            # fixture's unordered arrival could interact with the
            # watermark; the single-batch drain keeps the run equal to
            # the batch join by construction while still exercising the
            # streaming operator + state store
            ev.coalesce(1).write.mode("overwrite").parquet(src)
            schema = spark.read.parquet(src).schema
            stream = spark.readStream.schema(schema).parquet(src)
            clicks = (
                stream.filter(F.col("event_type") == "click")
                .select(
                    F.col("event_id").alias("click_id"),
                    "user_id",
                    F.col("ts").alias("click_ts"),
                )
                .withWatermark("click_ts", wm)
            )
            purchases = (
                stream.filter(F.col("event_type") == "purchase")
                .select(
                    F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("p_user_id"),
                    F.col("ts").alias("purchase_ts"),
                )
                .withWatermark("purchase_ts", wm)
            )
            joined = clicks.join(
                purchases,
                F.expr(
                    "user_id = p_user_id"
                    " AND purchase_ts >= click_ts"
                    " AND purchase_ts < click_ts + INTERVAL 30 MINUTES"
                ),
            ).select(
                "click_id", "purchase_id", "user_id", "click_ts",
                "purchase_ts",
            )
            q = (
                joined.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            import glob as _glob

            if not _glob.glob(f"{sink}/*.parquet"):
                # zero matches (e.g. empty input): the sink dir has no data
                # files and a parquet read would raise; emit the contract
                # schema empty
                ddl = (
                    "click_id bigint, purchase_id bigint, user_id bigint,"
                    f" click_ts {ts_type}, purchase_ts {ts_type}"
                )
                return spark.createDataFrame([], ddl)
            out = (
                spark.read.parquet(sink)
                .withColumn("click_ts", F.col("click_ts").cast(ts_type))
                .withColumn("purchase_ts", F.col("purchase_ts").cast(ts_type))
                .orderBy("click_id", "purchase_id")
            )
            out = out.localCheckpoint(eager=True)
        finally:
            spark.conf.set(tz_key, prior_tz)
            shutil.rmtree(base, ignore_errors=True)
        return out


_register_j15()


@_register("d13_semantic_dedup", _neardup_oracle())
def d13_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (k-means cells + within-
    cell exact cosine): third member of the embedding-dedup family —
    d6 is the exact all-pairs ORACLE baseline, d7 buckets by random
    hyperplanes, d13 buckets by LEARNED k-means cells (SemDeDup, Abbas
    et al. 2023), which at production scale concentrates semantic
    neighbors far better than random planes (fewer cells probed for the
    same recall).  Shares d6's exact oracle: at this scale the 2-probe
    cell assignment must recover every true pair; recall < 1 is
    possible by construction and the scale smoke measures it."""
    from ..operators.dedup import semantic_neardup_pairs

    emb = _emb(spark, sf_dir)
    # n_clusters auto-sizes with the corpus (cells ∝ N, bounded cell
    # population — the linear-total-comparisons configuration; at
    # oracle scale it resolves to the floor of 8 cells, so the exact
    # oracle regime is unchanged).  n_probe=5: the synthetic fixture's
    # embeddings are near-uniform (no semantic cluster structure for
    # k-means to find), the worst case for cell-bucketed recall — real
    # text embeddings cluster tightly and probe 1-2 cells (the scale
    # smoke records the recall/probe curve on the 10x corpus).  Probe 4
    # recovers all exact pairs at sf0.01 but drops 3 of 4,137 at sf0.1
    # (the round-10 second-sf sweep's finding); probe 5 is measured
    # exact at BOTH committed scale factors, and raising probe can only
    # add pairs the exact verify then keeps, never change existing ones
    out = semantic_neardup_pairs(
        emb, "vec_id", "embedding", _NEARDUP_THRESHOLD, n_probe=5,
    )
    return out.select(
        F.col("id_a"), F.col("id_b"), F.col("score")
    ).orderBy("id_a", "id_b")


@_register(
    "a28_group_regression",
    """
    SELECT l_returnflag,
           floor(regr_slope(l_extendedprice, l_quantity) * 1000000 + 0.5)
             / 1000000 AS slope,
           floor(regr_intercept(l_extendedprice, l_quantity) * 1000000 + 0.5)
             / 1000000 AS intercept,
           floor(regr_r2(l_extendedprice, l_quantity) * 1000000 + 0.5)
             / 1000000 AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a28_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares regression (price on quantity per return
    flag) through the NATIVE regr_* aggregate family — closed-form OLS
    from running sums, so it is one partial+final aggregation pass like
    a25's corr: no second scan, no window, bounded state per group.
    Completes the statistical-aggregate coverage next to corr (a25),
    percentiles (a11/a21), and stddev-based z-scores (a27)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            portable_round(
                F.regr_slope("l_extendedprice", "l_quantity"), 6
            ).alias("slope"),
            portable_round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 6
            ).alias("intercept"),
            portable_round(
                F.regr_r2("l_extendedprice", "l_quantity"), 6
            ).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity")
            .cast("bigint")
            .alias("n"),
        )
        .orderBy("l_returnflag")
    )


def _register_m7():
    m3_oracle = QUERIES["m3_byte_entropy"][1]

    @_register("m7_entropy_arrow", m3_oracle)
    def m7_entropy_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
        """mapInArrow extension surface: m3's byte-entropy triage
        consuming pyarrow RecordBatches directly (no Arrow→pandas blob
        copy — the conversion that dominates when blobs are MBs), pinned
        bit-identical to the pandas form via m3's shared oracle.
        Completes the Python-boundary inventory: pandas_udf (cosine),
        mapInPandas (decode/replay), applyInPandasWithState (sessions),
        UDTF (x10), and now raw-Arrow."""
        from ..operators.multimodal import attach_fake_media, byte_entropy_arrow

        media = attach_fake_media(_docs(spark, sf_dir), "doc_id", "text")
        return byte_entropy_arrow(media).orderBy("media_id")


_register_m7()


@_register(
    "s15_orc_roundtrip",
    """
    SELECT event_id, user_id, event_type,
           CAST(value AS DOUBLE) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
           props
    FROM events
    ORDER BY event_id
    """,
)
def s15_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC connector proof (s13/s14's columnar sibling — Spark ships the
    ORC reader/writer natively), over events so the timestamp check
    carries real microseconds (6-digit fractional output in the
    oracle).  Unlike the text formats, ORC is columnar+splittable with
    predicate pushdown, so it is a first-class LAKE format, not just an
    edge format; this entry pins that the engine round-trips it
    losslessly."""
    from ..ingest.formats import roundtrip_orc

    token = _sf_token(sf_dir)
    ev = _events(spark, sf_dir)
    back = roundtrip_orc(ev, f"/tmp/chessmate_formats/{token}/events_orc")
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "props",
    ).orderBy("event_id")


@_register(
    "m8_image_resize_stub",
    """
    WITH m AS (
      -- documents are ASCII, so the stub's byte arithmetic equals char
      -- arithmetic on the text itself (DuckDB substring takes VARCHAR)
      SELECT doc_id,
             coalesce(text, '') AS s,
             CASE WHEN text IS NULL THEN NULL
                  ELSE length(text) % 640 + 1 END AS w,
             CASE WHEN text IS NULL THEN NULL
                  ELSE length(text) % 480 + 1 END AS h
      FROM documents),
    cut AS (
      SELECT doc_id, w, h,
             substring(s, 1, greatest(1, length(s) // 4)) AS out_s
      FROM m)
    SELECT doc_id AS media_id,
           TRUE AS resized,
           CAST(ceil(w / 2.0) AS INT) AS out_width,
           CAST(ceil(h / 2.0) AS INT) AS out_height,
           CAST(length(out_s) AS BIGINT) AS out_len,
           md5(out_s) AS out_md5
    FROM cut
    ORDER BY media_id
    """,
)
def m8_image_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE stage (the remaining verb of the multimodal brief:
    decode / feature-extract / resize / frame-sample), stub codec pinned
    for the oracle like m2: output dims are ceil(meta/factor), the blob
    truncates to the proportional byte count, and the oracle md5-compares
    the output bytes.  The REAL tier exists and is unit-tested: numpy
    nearest-neighbor downsample + re-encode for 24-bit BMP
    (operators/multimodal.py _resize_bmp, tests/test_multimodal.py) —
    same three-tier philosophy as the m2 decode stage."""
    from ..operators.multimodal import attach_fake_media, resize_images

    media = attach_fake_media(_docs(spark, sf_dir), "doc_id", "text")
    out = resize_images(media, factor=2, codec="stub")
    return out.select(
        "media_id",
        "resized",
        "out_width",
        "out_height",
        F.length("out_blob").cast("bigint").alias("out_len"),
        F.md5("out_blob").alias("out_md5"),
    ).orderBy("media_id")


@_register(
    "t18_token_ids",
    f"""
    WITH doc_toks AS (
      SELECT doc_id,
             unnest({_WS_TOKS_SQL}) AS token,
             generate_subscripts({_WS_TOKS_SQL}, 1) AS pos
      FROM documents),
    vocab AS (
      SELECT token,
             row_number() OVER (ORDER BY count(*) DESC, token) AS tid
      FROM doc_toks GROUP BY token
      QUALIFY row_number() OVER (ORDER BY count(*) DESC, token) <= 50),
    enc AS (
      SELECT d.doc_id, d.pos, coalesce(v.tid, 0) AS tid
      FROM doc_toks d LEFT JOIN vocab v USING (token))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
    FROM enc
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def t18_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab-apply encoding — the step between tokenization (t1/t10) and
    sequence packing (t5): map every token to its id in the corpus-built
    top-50 vocabulary (rank by count desc, token asc — t10's
    deterministic order), OOV → 0, and emit per-doc (n_tokens, n_oov,
    md5 of the exact id sequence) so the oracle pins the encoded stream
    byte-for-byte.  Plan: one explode feeds the vocab count AND the
    encoder; the vocab is a 50-row broadcast; the per-doc reassembly
    sorts WITHIN each doc's rows (array_sort on (pos, tid) structs after
    collect_list — no global or per-partition row sort).  The vocab
    ranking window is a single partition over DISTINCT TOKENS (types,
    not occurrences) — the t15 normalizer-dim note, not a row funnel."""
    docs = _docs(spark, sf_dir)
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.select(
        "doc_id", F.posexplode(tokenize_expr(text)).alias("pos", "token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = (
        counts.withColumn("tid", F.row_number().over(w))
        .filter(F.col("tid") <= 50)
        .select("token", "tid")
    )
    enc = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos", F.coalesce(F.col("tid"), F.lit(0)).alias("tid")
    )
    per_doc = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("int")).cast("bigint").alias("n_oov"),
        F.array_sort(
            F.collect_list(F.struct("pos", "tid"))
        ).alias("_seq"),
    )
    ids_md5 = F.md5(
        F.concat_ws(
            ",", F.transform(F.col("_seq"), lambda s: s["tid"].cast("string"))
        )
    )
    return per_doc.select(
        "doc_id", "n_tokens", "n_oov", ids_md5.alias("ids_md5")
    ).orderBy("doc_id")


def _register_d14():
    cluster_sql = _dup_clusters_oracle()

    @_register(
        "d14_dup_weights",
        f"""
        WITH clusters AS ({cluster_sql})
        SELECT d.doc_id,
               CAST(coalesce(c.cluster_size, 1) AS BIGINT) AS cluster_size,
               floor(1.0 / coalesce(c.cluster_size, 1) * 1000000 + 0.5)
                 / 1000000 AS weight
        FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
        ORDER BY d.doc_id
        """,
    )
    def d14_dup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SOFT dedup: keep every document but weight it 1/cluster_size
        (duplicates split one document's worth of sampling mass instead
        of being dropped) — the alternative to hard resolution (d10)
        when near-dups carry complementary context; weighted-sampling
        consumers plug the weight straight into t15's mixing stage.
        Plan: d8's cluster frame (id-only, O(log n) rounds) LEFT-joins
        onto the corpus id list — the corpus never shuffles, the
        cluster side broadcasts at any realistic dup rate."""
        from ..operators.graph import dup_clusters

        docs = _docs(spark, sf_dir)
        clusters = dup_clusters(_lsh_pairs(spark, sf_dir)).select(
            "doc_id", "cluster_size"
        )
        out = docs.select("doc_id").join(
            F.broadcast(clusters), "doc_id", "left"
        )
        size = F.coalesce(F.col("cluster_size"), F.lit(1))
        return out.select(
            "doc_id",
            size.cast("bigint").alias("cluster_size"),
            portable_round(F.lit(1.0) / size, 6).alias("weight"),
        ).orderBy("doc_id")


_register_d14()


def _register_d15():
    d3_oracle = QUERIES["d3_ngram_jaccard_pairs"][1]

    @_register("d15_jaccard_prefix_join", d3_oracle)
    def d15_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        """PPJoin prefix filtering (Chaudhuri et al. 2006, Xiao et al.
        2008) applied to d3's exact set-similarity join — SAME oracle,
        provably identical output, but candidates must collide on a
        rarest-first PREFIX token, so the frequent shingles that blow up
        d3's Σ block² candidate count never generate pairs.  This is the
        standard scale path for exact thresholded Jaccard when LSH's
        approximation (d2) isn't acceptable."""
        from ..operators.dedup import ngram_jaccard_pairs_prefix

        docs = _docs(spark, sf_dir)
        pairs = ngram_jaccard_pairs_prefix(
            docs, "doc_id", "text",
            shingle_n=3, block_col="source", min_jaccard=0.15,
        )
        return pairs.select(
            "id_a", "id_b", portable_round(F.col("jaccard"), 6).alias("jaccard")
        ).orderBy("id_a", "id_b")


_register_d15()


_T19_BUDGET = 200


@_register(
    "t19_mixture_sample",
    f"""
    WITH mass AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS char_mass
      FROM documents GROUP BY source),
    raw AS (
      SELECT source, n_docs, pow(CAST(char_mass AS DOUBLE), 0.7) AS r
      FROM mass),
    wts AS (
      SELECT source, n_docs,
             CAST(floor(r / (SELECT sum(r) FROM raw) * 1000000.0 + 0.5)
                  AS BIGINT) AS weight_micro
      FROM raw),
    bucketed AS (
      SELECT d.doc_id, d.source,
             CAST(('0x' || substring(
                md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 1000000 AS BIGINT) AS bucket,
             w.n_docs, w.weight_micro
      FROM documents d JOIN wts w USING (source))
    SELECT doc_id, source, bucket
    FROM bucketed
    WHERE bucket * n_docs < weight_micro * {_T19_BUDGET}
    ORDER BY doc_id
    """,
)
def t19_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the t15 mixture: draw a ~200-doc sample whose
    per-source composition follows the alpha-smoothed weights — the step
    that turns mixing WEIGHTS into an actual training corpus.  Fully
    deterministic and float-free at the decision boundary: each doc's
    md5 bucket (integer in [0, 1e6)) is kept iff
    ``bucket * n_docs < weight_micro * budget`` — pure BIGINT
    comparison, so no engine can disagree on a boundary doc (the rounded
    micro-weight itself is the quantity t15's oracle already pins).
    Plan: t15's per-source dim (one partial+final agg + types-dim
    window) broadcast-joins onto the corpus scan; the scan-side filter
    is the only other work — zero corpus shuffles, reproducible without
    rand(), exactly t4's bucket discipline."""
    docs = _docs(spark, sf_dir)
    wts = _source_weight_dim(docs).select("source", "n_docs", "weight_micro")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("bigint")
        % 1_000_000
    )
    return (
        docs.select("doc_id", "source", bucket.alias("bucket"))
        .join(F.broadcast(wts), "source")
        .filter(
            F.col("bucket") * F.col("n_docs")
            < F.col("weight_micro") * F.lit(_T19_BUDGET)
        )
        .select("doc_id", "source", "bucket")
        .orderBy("doc_id")
    )


def _bpe_oracle(
    n_merges: int = 8,
    toks: Optional[str] = None,
    corpus_cte: str = "",
    corpus: str = "documents",
) -> str:
    """Unrolled BPE iteration (d11's CTE-chain trick): each round is a
    pair-count + argmax CTE and a replace-apply CTE; the output unions
    the per-round argmax rows.  ``toks``/``corpus_cte``/``corpus`` let
    the unicode twin (t22) swap the tokenizer and inject its corpus."""
    toks = toks or _DUCK_NORM_TOKENS.format(col="text")
    parts = [
        f"""{corpus_cte}w AS MATERIALIZED (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest({toks}) AS word FROM {corpus}) GROUP BY word),
    v0 AS MATERIALIZED (
      SELECT freq,
             array_to_string(list_transform(string_split(word, ''),
               c -> '<' || c || '>'), '') AS repr
      FROM w)"""
    ]
    selects = []
    for i in range(n_merges):
        parts.append(
            f"""p{i} AS MATERIALIZED (
      SELECT syms[i] AS l, syms[i + 1] AS r,
             CAST(sum(freq) AS BIGINT) AS cnt
      FROM (SELECT freq,
                   string_split(substring(repr, 2, length(repr) - 2), '><')
                     AS syms
            FROM v{i}) t,
           LATERAL (SELECT unnest(range(1, len(t.syms))) AS i) u
      WHERE len(syms) >= 2
      GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 1)"""
        )
        parts.append(
            f"""v{i + 1} AS MATERIALIZED (
      SELECT freq, replace(repr,
        '<' || (SELECT l FROM p{i}) || '><' || (SELECT r FROM p{i}) || '>',
        '<' || (SELECT l FROM p{i}) || (SELECT r FROM p{i}) || '>') AS repr
      FROM v{i})"""
        )
        selects.append(
            f"SELECT {i + 1} AS rank, l, r, l || r AS merged, cnt FROM p{i}"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY rank"
    )


@_register("t20_bpe_merges", _bpe_oracle(8))
def t20_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016): the first 8
    learned merge rules over the corpus, count-weighted with
    lexicographic tie-breaks.  The distributed shape
    (operators/textan.py learn_bpe_merges): one corpus pass to the
    word-frequency TYPES table, then every round is a partial+final
    pair-count aggregate + a 1-row argmax collect + one literal string
    replace over marker-wrapped symbol strings — provably identical to
    the per-word reference merge (pinned in tests).  The oracle unrolls
    the identical 8 rounds as a CTE chain (d11's trick), so this
    iterative algorithm is still hash-checked end to end."""
    from ..operators.textan import learn_bpe_merges

    merges = learn_bpe_merges(_docs(spark, sf_dir), "doc_id", "text", 8)
    rows = [
        (i + 1, l, r, l + r, cnt) for i, (l, r, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, l string, r string, merged string, cnt bigint"
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Unicode tokenization twins (round 6): the default corpus tokenizer is
# byte-ASCII for reference parity (SURVEY §7.3's Unicode note), which
# mangles non-Latin text.  These entries exercise the opt-in UTF-8-safe
# tokenizer (\p{L}\p{N} classes — functions/text.py
# unicode_norm_tokens_expr) end-to-end over a deterministically injected
# multilingual corpus: German (case-folded umlauts/ß), Cyrillic, Greek,
# and CJK (no-space script — contiguous runs tokenize as one unit).
# Both engines lowercase Unicode-aware and both regex engines (Java,
# RE2) implement \p{L}/\p{N}, so the oracle mirrors the exact pipeline.
# Phrases avoid the known engine-divergent edge (word-final capital
# sigma Σ, which Java lowercases contextually to ς).

_UNICODE_PHRASES = [
    "Grünfeld Verteidigung Großmeister Eröffnung",
    "Защита Каро-Канн дебют Защита",
    "Ελληνικά Ανοίγματα Σκάκι",
    "東京将棋対局",
]

_DUCK_UNICODE_TOKS = (
    "list_filter(string_split_regex(trim(regexp_replace(lower(coalesce({col}, ''))"
    ", '[^\\p{{L}}\\p{{N}}]+', ' ', 'g')), ' '), t -> t <> '')"
)

_DUCK_UNICODE_CORPUS = """
      SELECT doc_id,
             coalesce(text, '') || ' ' || CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'Grünfeld Verteidigung Großmeister Eröffnung'
               WHEN 1 THEN 'Защита Каро-Канн дебют Защита'
               WHEN 2 THEN 'Ελληνικά Ανοίγματα Σκάκι'
               ELSE '東京将棋対局' END AS text
      FROM documents"""


def _unicode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    phrases = F.array(*[F.lit(p) for p in _UNICODE_PHRASES])
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" "),
            F.element_at(phrases, (F.col("doc_id") % 4 + 1).cast("int")),
        ).alias("text"),
    )


@_register(
    "t21_unicode_token_ids",
    f"""
    WITH ucorpus AS ({_DUCK_UNICODE_CORPUS}),
    doc_toks AS (
      SELECT doc_id,
             unnest({_DUCK_UNICODE_TOKS.format(col="text")}) AS token,
             generate_subscripts({_DUCK_UNICODE_TOKS.format(col="text")}, 1) AS pos
      FROM ucorpus),
    vocab AS (
      SELECT token,
             row_number() OVER (ORDER BY count(*) DESC, token) AS tid
      FROM doc_toks GROUP BY token
      QUALIFY row_number() OVER (ORDER BY count(*) DESC, token) <= 50),
    enc AS (
      SELECT d.doc_id, d.pos, coalesce(v.tid, 0) AS tid
      FROM doc_toks d LEFT JOIN vocab v USING (token))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
    FROM enc
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def t21_unicode_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t18's vocab→token-id encoding run through the UTF-8-safe
    tokenizer over the multilingual corpus: the byte-ASCII default
    would shred every injected phrase into separator noise; this entry
    proves the \\p{L}\\p{N} token classes carry non-Latin text
    end-to-end (tokenize → corpus-built vocab → id encoding), with the
    per-doc id stream md5-pinned.  Plan shape identical to t18 (one
    posexplode feeds vocab count and encoder, 50-row vocab broadcasts,
    per-doc array_sort reassembly — the ranking window is over distinct
    TOKEN TYPES)."""
    from ..functions.text import unicode_norm_tokens_expr

    docs = _unicode_docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(unicode_norm_tokens_expr(F.col("text"))).alias(
            "pos", "token"
        ),
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = (
        counts.withColumn("tid", F.row_number().over(w))
        .filter(F.col("tid") <= 50)
        .select("token", "tid")
    )
    enc = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "pos", F.coalesce(F.col("tid"), F.lit(0)).alias("tid")
    )
    per_doc = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("int")).cast("bigint").alias("n_oov"),
        F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("_seq"),
    )
    ids_md5 = F.md5(
        F.concat_ws(
            ",", F.transform(F.col("_seq"), lambda s: s["tid"].cast("string"))
        )
    )
    return per_doc.select(
        "doc_id", "n_tokens", "n_oov", ids_md5.alias("ids_md5")
    ).orderBy("doc_id")


@_register(
    "t22_unicode_bpe",
    _bpe_oracle(
        8,
        toks=_DUCK_UNICODE_TOKS.format(col="text"),
        corpus_cte=f"ucorpus AS MATERIALIZED ({_DUCK_UNICODE_CORPUS}),\n    ",
        corpus="ucorpus",
    ),
)
def t22_unicode_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t20's BPE merge learning with ``tokenizer="unicode"`` over the
    multilingual corpus: merge rules learn over umlauts, Cyrillic,
    Greek, and CJK symbol strings (character splitting is code-point
    based in both engines).  Same distributed shape as t20 — one corpus
    pass to the word-frequency TYPES table, then per round a
    partial+final pair aggregate + 1-row argmax + literal replace, with
    per-round lineage truncation; the oracle unrolls the identical 8
    rounds over the identical injected corpus."""
    from ..operators.textan import learn_bpe_merges

    merges = learn_bpe_merges(
        _unicode_docs(spark, sf_dir), "doc_id", "text", 8,
        tokenizer="unicode",
    )
    rows = [
        (i + 1, l, r, l + r, cnt) for i, (l, r, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, l string, r string, merged string, cnt bigint"
    ).orderBy("rank")


def _register_d16():
    # shares d10's oracle verbatim: the bloom split must equal the plain
    # broadcast anti join row-for-row (no false negatives + exact
    # suspect-branch anti join)
    d10_oracle = QUERIES["d10_dedup_resolve"][1]

    @_register("d16_dedup_resolve_bloom", d10_oracle)
    def d16_dedup_resolve_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
        """d10's dedup resolution routed through the Bloom drop-list
        split (operators/bloom.py bloom_prune_anti_join) — the
        production path once the non-canonical drop-list outgrows a
        broadcast: definite non-members keep without any exchange, only
        bloom suspects (true drops + false positives) pay the exact
        anti join.  Identity with the broadcast form is the entry's
        oracle claim."""
        from ..operators.bloom import bloom_prune_anti_join
        from ..operators.graph import dup_clusters

        docs = _docs(spark, sf_dir)
        drop = (
            dup_clusters(_lsh_pairs(spark, sf_dir))
            .filter(~F.col("is_canonical"))
            .select("doc_id")
        )
        return (
            bloom_prune_anti_join(docs, drop, "doc_id", "doc_id")
            .select("doc_id", "lang", "source", "n_chars")
            .orderBy("doc_id")
        )


_register_d16()


_PARA_TOKENS = 8  # tokens per synthetic paragraph (corpus has no newlines)


@_register(
    "d17_paragraph_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_NORM_TOKENS.format(col="text")} AS t
      FROM documents),
    chunks AS (
      SELECT doc_id, CAST(i AS INT) AS pos,
             array_to_string(t[(CAST(i AS INT)*{_PARA_TOKENS}+1):(CAST(i AS INT)*{_PARA_TOKENS}+{_PARA_TOKENS})], ' ') AS para
      FROM toks,
           LATERAL (SELECT unnest(range(0,
             CAST(ceil(len(t)/{_PARA_TOKENS}.0) AS BIGINT))) AS i) u),
    ranked AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY md5(para)
                                ORDER BY doc_id, pos) AS rn
      FROM chunks),
    kept AS (SELECT doc_id, pos, para FROM ranked WHERE rn = 1),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             md5(string_agg(para, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id),
    meta AS (
      SELECT doc_id, CAST(ceil(len(t)/{_PARA_TOKENS}.0) AS BIGINT) AS n_paras
      FROM toks)
    SELECT m.doc_id, m.n_paras,
           coalesce(p.n_kept, 0) AS n_kept,
           coalesce(p.clean_md5, md5('')) AS clean_md5
    FROM meta m LEFT JOIN per_doc p USING (doc_id)
    ORDER BY m.doc_id
    """,
)
def d17_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (the C4/Dolma curation pass between
    doc-level dedup d1 and shingle near-dup d2): every paragraph keeps
    only its FIRST corpus occurrence (min (doc_id, pos)); documents are
    reassembled from their surviving paragraphs and the cleaned text is
    md5-pinned per doc.  The fixture corpus has no newlines, so
    paragraphs are deterministic 8-token windows — the operator shape is
    identical for real newline-split paragraphs.

    Plan (round 14): one posexplode scan; the first-occurrence
    resolution is ONE groupBy(md5(para)).min(struct(doc_id, pos,
    para)) — partial+final with map-side combine, so a hot boilerplate
    paragraph collapses to one row per task BEFORE the exchange (the
    skew-safe alternative to a per-hash window sort), and the kept
    paragraph text RIDES the min struct ((doc_id, pos) is a unique
    prefix, so the struct min IS the first occurrence; equal hashes
    carry equal text).  This removes the round-8 shape's join-back of
    the exploded paragraphs against the firsts table — one exchange
    and a second paragraph-table derivation gone; per-doc reassembly
    is an in-group array_sort, never a row sort.  The per-doc
    paragraph count likewise derives from the ALREADY-EXPLODED rows
    (one doc-keyed count over narrow rows) instead of a second
    tokenize scan: the old meta side re-ran the whole normalize/chunk
    chain, and because it fed a broadcast join the planner ran that
    chain in the broadcast subtree's SINGLE scan task — 3.3 s
    single-threaded at sf0.1, measured (the _spread parallelism was
    silently lost under the broadcast).  A doc absent from the explode
    has zero paragraphs; the final coalesce restores it."""
    from ..functions.text import norm_tokens_expr

    P = _PARA_TOKENS
    docs = _docs(spark, sf_dir)
    t = norm_tokens_expr(F.coalesce(F.col("text"), F.lit("")))
    n_chunks = F.ceil(F.size(t) / F.lit(P)).cast("int")
    chunks = F.when(
        F.size(t) <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i * P + 1, P)),
        )
    )
    base = docs.select("doc_id", chunks.alias("_chunks"))
    paras = base.select(
        "doc_id", F.posexplode("_chunks").alias("pos", "para")
    ).withColumn("_h", F.md5("para"))
    kept = (
        paras.groupBy("_h")
        .agg(F.min(F.struct("doc_id", "pos", "para")).alias("_f"))
        .select(
            F.col("_f.doc_id").alias("doc_id"),
            F.col("_f.pos").alias("pos"),
            F.col("_f.para").alias("para"),
        )
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.array_sort(F.collect_list(F.struct("pos", "para"))).alias("_seq"),
    )
    clean = F.concat_ws(
        " ", F.transform(F.col("_seq"), lambda s: s["para"])
    )
    meta_n = paras.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras")
    )
    ids = docs.select("doc_id")
    # shuffle_hash hints: with broadcast joins the planner re-executes
    # each aggregate's tokenize/chunk chain inside a broadcast subtree
    # whose scan collapses to ONE task (the _spread repartition is
    # eliminated under the broadcast — measured 2×2.9 s single-threaded
    # at sf0.1); the hinted shuffle join keeps both chains on the
    # 32-way layout, and doc_id-keyed exchanges of 5k aggregate rows
    # are noise.
    return (
        ids.join(meta_n.hint("shuffle_hash"), "doc_id", "left")
        .join(
            per_doc.select(
                "doc_id", "n_kept", clean.alias("_clean")
            ).hint("shuffle_hash"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_paras"), F.lit(0).cast("bigint")).alias(
                "n_paras"
            ),
            F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias(
                "n_kept"
            ),
            F.md5(F.coalesce(F.col("_clean"), F.lit(""))).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


_CM_DEPTH, _CM_WIDTH = 4, 512


@_register(
    "a29_countmin_gate",
    f"""
    WITH exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id LIMIT 10),
    coords AS (
      SELECT user_id, j,
             (('0x' || substring(md5('cm' || j || ':' ||
               CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % {_CM_WIDTH})
               AS bucket
      FROM events, LATERAL (SELECT unnest(range(0, {_CM_DEPTH})) AS j) u),
    cms AS (
      SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM coords GROUP BY j, bucket),
    probe AS (
      SELECT e.user_id, e.exact_cnt, j,
             (('0x' || substring(md5('cm' || j || ':' ||
               CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT % {_CM_WIDTH})
               AS bucket
      FROM exact e, LATERAL (SELECT unnest(range(0, {_CM_DEPTH})) AS j) u)
    SELECT p.user_id, p.exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS est_cnt,
           min(c.cnt) >= p.exact_cnt AS never_undercounts
    FROM probe p JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
    GROUP BY p.user_id, p.exact_cnt
    ORDER BY p.exact_cnt DESC, p.user_id
    """,
)
def a29_countmin_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency gate — completes the sketch family
    (HLL cardinality a18, GK quantiles a21, Misra-Gries top-k
    a15_sketch, CMS point queries): estimate the top-10 users' event
    counts from a depth 4 x width 512 counter grid and
    return exact + estimate + the never-undercounts invariant.  Hashes
    are md5-derived, so the sketch is bit-deterministic and the oracle
    computes the IDENTICAL estimate — a regression in the bucket
    arithmetic hash-mismatches instead of hiding inside a tolerance.

    Plan: one scan explodes each event into depth coordinates,
    map-side combine collapses to ≤ depth·width rows per task before
    the single exchange (the sketch is mergeable; partial aggregation
    IS the merge); probes broadcast against the 2048-row sketch."""
    from ..operators.sketch import countmin_estimate, countmin_table

    ev = _events(spark, sf_dir)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(10)
    )
    cms = countmin_table(ev, "user_id", depth=_CM_DEPTH, width=_CM_WIDTH)
    est = countmin_estimate(
        exact.select("user_id"), cms, "user_id",
        depth=_CM_DEPTH, width=_CM_WIDTH,
    )
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            F.col("est_cnt").cast("bigint").alias("est_cnt"),
            (F.col("est_cnt") >= F.col("exact_cnt")).alias(
                "never_undercounts"
            ),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    )


@_register(
    "s16_corrupt_record_channel",
    """
    WITH marks AS (
      SELECT doc_id, text, (doc_id % 7 = 3) AS is_corrupt FROM documents)
    SELECT is_corrupt,
           CASE WHEN is_corrupt
                THEN md5('{"doc_id": ' || CAST(doc_id AS VARCHAR)
                         || ', "text": "unterminated')
                ELSE md5(coalesce(text, '')) END AS payload_md5
    FROM marks
    ORDER BY is_corrupt, payload_md5
    """,
)
def s16_corrupt_record_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record side channel for line-format ingest (the
    connector-level form of the reference's per-game error tolerance,
    pgn_parser.ml:204-260 fold_games on_error): a JSONL file with
    deterministically mangled lines (every doc_id % 7 == 3 truncated
    mid-string) reads under PERMISSIVE mode — good lines parse, bad
    lines land raw in the `_corrupt` column, and NOTHING aborts the
    file.  The oracle reconstructs both populations arithmetically from
    the documents table (it knows which lines were mangled and what the
    mangled bytes are), so the entry hash-pins the split AND the exact
    payload bytes on both sides of the channel.

    Plan: file generation is one projection + text write; the
    PERMISSIVE read is ONE uncached scan (the single output projection
    references data columns too, so Spark's corrupt-column-only
    restriction doesn't apply and a cache would materialize a corpus
    nothing re-reads); the output is a projection over it — no joins,
    no shuffles beyond the presentation sort."""
    import shutil
    import tempfile

    from ..ingest.formats import read_jsonl_permissive

    docs = _docs(spark, sf_dir)
    line = F.when(
        F.col("doc_id") % 7 == 3,
        F.concat(
            F.lit('{"doc_id": '),
            F.col("doc_id").cast("string"),
            F.lit(', "text": "unterminated'),
        ),
    ).otherwise(F.to_json(F.struct("doc_id", "text")))
    base = tempfile.mkdtemp(prefix="cm_s16_")
    try:
        docs.select(line.alias("value")).write.mode("overwrite").text(base)
        parsed = read_jsonl_permissive(
            spark, base, "doc_id bigint, text string"
        )
        out = parsed.select(
            F.col("_corrupt").isNotNull().alias("is_corrupt"),
            F.md5(
                F.coalesce(F.col("_corrupt"), F.col("text"), F.lit(""))
            ).alias("payload_md5"),
        ).orderBy("is_corrupt", "payload_md5")
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


@_register(
    "t23_inverted_index",
    f"""
    WITH doc_toks AS (
      SELECT doc_id,
             unnest({_WS_TOKS_SQL}) AS term,
             generate_subscripts({_WS_TOKS_SQL}, 1) AS pos
      FROM documents),
    postings AS (
      SELECT term, doc_id,
             CAST(count(*) AS BIGINT) AS tf,
             string_agg(CAST(pos AS VARCHAR), '|' ORDER BY pos) AS offs
      FROM doc_toks GROUP BY term, doc_id),
    index_rows AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS tf_total,
             md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || offs, ';'
                            ORDER BY doc_id)) AS postings_md5
      FROM postings GROUP BY term)
    SELECT term, df, tf_total, postings_md5
    FROM index_rows
    WHERE df >= 3
    ORDER BY term
    """,
)
def t23_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index — the retrieval LAYOUT operator t12's
    TF-IDF scoring reads from in a real search stack: per term, the
    document frequency, total term frequency, and the full posting list
    (doc_id with its sorted in-doc positions) serialized and md5-pinned,
    so the oracle checks the exact index payload byte-for-byte, not just
    the statistics.  df >= 3 bounds the long tail (the same cut a real
    index applies to hapax terms).

    Plan: one posexplode scan → (term, doc) partial+final aggregation
    (map-side combine absorbs hot terms) → per-term reassembly where the
    posting list is built by an IN-GROUP array_sort over collected
    (doc_id, offs) structs — bounded by the term's df, never a partition
    sort; the only corpus-scale exchange carries (term, doc, position)
    triples."""
    docs = _docs(spark, sf_dir)
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = docs.select(
        "doc_id", F.posexplode(tokenize_expr(text)).alias("pos", "term")
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.concat_ws(
            "|",
            F.transform(
                # +1: posexplode is 0-based, the oracle's
                # generate_subscripts is 1-based
                F.array_sort(F.collect_list(F.col("pos") + 1)),
                lambda p: p.cast("string"),
            ),
        ).alias("offs"),
    )
    per_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("tf_total"),
        F.array_sort(F.collect_list(F.struct("doc_id", "offs"))).alias("_pl"),
    )
    serialized = F.concat_ws(
        ";",
        F.transform(
            F.col("_pl"),
            lambda s: F.concat(
                s["doc_id"].cast("string"), F.lit(":"), s["offs"]
            ),
        ),
    )
    return (
        per_term.filter(F.col("df") >= 3)
        .select("term", "df", "tf_total", F.md5(serialized).alias("postings_md5"))
        .orderBy("term")
    )


_BM25_K1, _BM25_B = 1.2, 0.75

# per-(doc, term) BM25 contribution — identical arithmetic shape to the
# Spark side's `term` expression (left-to-right: (idf * tf*(k1+1)) / denom)
_BM25_CONTRIB_SQL = (
    f"ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)"
    f" * (h.tf * ({_BM25_K1} + 1.0))"
    f" / (h.tf + {_BM25_K1} * (1.0 - {_BM25_B}"
    f" + {_BM25_B} * dl.n_tokens / s.avgdl))"
)
# FIXED addition order: the Spark side folds term0 + term1 + term2 with
# 0.0 for non-hit terms; a SQL sum() over per-term rows accumulates in
# engine-unspecified order, and a last-ulp difference landing exactly on
# the floor(x*1e6+0.5) half-boundary would flake the hash-pinned oracle.
# Pivoting each term into its own column (max over the single hit row is
# exact) and adding left-to-right matches the Spark fold bit-for-bit.
_BM25_RAW_SQL = "\n             + ".join(
    f"coalesce(max(CASE WHEN token = '{t}' THEN contrib END), 0.0)"
    for t in _TFIDF_TERMS
)


@_register(
    "t24_bm25_search",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WS_TOKS_SQL}) AS token
      FROM documents),
    doc_len AS (
      -- over ALL documents (len of the token list, not an unnest
      -- regroup): a zero-token doc must still count into N and avgdl,
      -- exactly as the Spark side's size(arr) does
      SELECT doc_id, CAST(len({_WS_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avgdl
      FROM doc_len),
    hits AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE token IN {_TFIDF_TERMS!r}
      GROUP BY doc_id, token),
    df AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df
      FROM hits GROUP BY token),
    contrib AS (
      SELECT h.doc_id, h.token,
             {_BM25_CONTRIB_SQL} AS contrib
      FROM hits h
      JOIN doc_len dl USING (doc_id)
      JOIN df d ON h.token = d.token
      CROSS JOIN stats s),
    scored AS (
      SELECT doc_id,
             {_BM25_RAW_SQL} AS raw
      FROM contrib
      GROUP BY doc_id)
    SELECT doc_id,
           floor(raw * 1000000.0 + 0.5) / 1000000.0 AS score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def t24_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (Robertson et al.; Lucene's non-negative idf
    variant) for the fixed query-term set — t12's sibling with the
    retrieval weighting production search engines actually use:
    document-length normalization (b=0.75) and tf saturation (k1=1.2),
    so long documents stop winning on raw term counts and repeated
    terms saturate instead of growing linearly.

    Plan shape identical to t12's no-explode form: tf per literal term
    is a pure array expression in the scan projection; pass 1 is ONE
    scalar partial+final aggregate producing (N, avgdl, df per term);
    its 1-row result broadcasts back and pass 2 scores +
    TakeOrderedAndProject in a single map-side stage.  Two corpus
    scans, zero wide exchanges.  Scores rounded-then-ordered in both
    engines so LIMIT-boundary ties resolve identically."""
    docs = _docs(spark, sf_dir)
    return (
        _bm25_scored_frame(docs)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


def _bm25_scored_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, score) for every document hitting >= 1 fixed query term
    — t24's BM25 arithmetic, unlimited, shared with the v13 RRF fusion
    so both entries rank the IDENTICAL lexical score."""
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    arr = tokenize_expr(text)
    base = docs.select(
        "doc_id",
        F.size(arr).cast("bigint").alias("n_tokens"),
        *[
            F.size(F.filter(arr, _eq_term(t))).cast("bigint").alias(f"tf_{i}")
            for i, t in enumerate(_TFIDF_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("n_tokens").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(_TFIDF_TERMS))
        ],
    )
    k1, b = _BM25_K1, _BM25_B
    score_sum = None
    for i in range(len(_TFIDF_TERMS)):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            (F.col("n") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        denom = tf + k1 * (
            1.0 - b + b * F.col("n_tokens") / F.col("avgdl")
        )
        term = F.when(tf > 0, idf * (tf * (k1 + 1.0)) / denom).otherwise(
            F.lit(0.0)
        )
        score_sum = term if score_sum is None else score_sum + term
    any_hit = None
    for i in range(len(_TFIDF_TERMS)):
        hit = F.col(f"tf_{i}") > 0
        any_hit = hit if any_hit is None else any_hit | hit
    return (
        base.crossJoin(F.broadcast(stats))
        .filter(any_hit)
        .select("doc_id", portable_round(score_sum, 6).alias("score"))
    )


# batch retrieval: queries per md5 bucket of the vocabulary, top-k per query
_BM25_NQ = 64
_BM25_TOPK = 5
# per-(query-term, doc) BM25 contribution in integer MICRO-units:
# rounding each term's contribution to 1e-6 BEFORE the per-(query, doc)
# sum makes the aggregation exact int64 arithmetic — order-independent
# by construction, so neither engine's sum() accumulation order can
# flake the comparison (the stronger form of t24's fixed-order fix; a
# variable-length term set has no fixed order to pin).
_BM25_MICRO_SQL = f"""CAST(floor(
               (ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
                * (p.tf * ({_BM25_K1} + 1.0))
                / (p.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                   + {_BM25_B} * dl.n_tokens / s.avgdl)))
               * 1000000.0 + 0.5) AS BIGINT)"""


@_register(
    "t25_batch_bm25_retrieval",
    f"""
    WITH base AS (
      SELECT doc_id, {_WS_TOKS_SQL} AS toks FROM documents),
    doc_len AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM base),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avgdl
      FROM doc_len),
    postings AS (
      SELECT token AS term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS token FROM base)
      GROUP BY term, doc_id),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df
      FROM postings GROUP BY term),
    qterms AS (
      SELECT (('0x' || substring(md5('q:' || term), 1, 15))::BIGINT
               % {_BM25_NQ}) AS query_id, term, df
      FROM df WHERE df >= 3),
    contrib AS (
      SELECT q.query_id, p.doc_id, {_BM25_MICRO_SQL} AS micro
      FROM postings p
      JOIN qterms q ON p.term = q.term
      JOIN doc_len dl ON p.doc_id = dl.doc_id
      CROSS JOIN stats s),
    scored AS (
      SELECT query_id, doc_id, CAST(sum(micro) AS BIGINT) AS score_micro
      FROM contrib GROUP BY query_id, doc_id),
    ranked AS (
      SELECT query_id, doc_id, score_micro,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank
      FROM scored)
    SELECT query_id, rank, doc_id, score_micro
    FROM ranked WHERE rank <= {_BM25_TOPK}
    ORDER BY query_id, rank
    """,
)
def t25_batch_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch multi-query BM25 retrieval — the LLM-pipeline form of t24
    (round-6 verdict #5): a QUERIES frame joined against the corpus's
    posting lists, scores aggregated per (query, doc), top-k per query.
    This is the hard-negative-mining / eval-retrieval shape: hundreds
    of queries answered in ONE pass over the index instead of one
    Spark job per query.  Reference anchor: the hybrid executor's
    keyword scoring path (hybrid_executor.ml:127-133) generalized
    beyond a single request's keyword set.

    The query set derives deterministically from the corpus itself:
    every vocabulary term with df >= 3 (t23's index cut) is assigned to
    one of {_BM25_NQ} queries by the repo's md5 convention
    (hashing._hash60 % NQ — engine-portable, so the oracle builds the
    IDENTICAL query set).  Scores use t24's BM25 weighting
    (k1={_BM25_K1}, b={_BM25_B}, Lucene non-negative idf), converted
    per term to integer micro-units BEFORE the per-(query, doc) sum —
    exact int64 aggregation, immune to either engine's float
    accumulation order.

    Scale shape: ONE posexplode scan builds (term, doc, tf, doc_len)
    postings with map-side combine (doc length rides the grouping key,
    so no doc-keyed join is ever needed); the per-term df aggregate and
    the query-term table are VOCABULARY-sized and broadcast — the
    posting lists themselves never reshuffle for the retrieval join;
    the (query, doc) score aggregate is the single corpus-scale
    exchange; per-query top-k is the window-top-k (o4's shape) over
    query-partitioned groups.  At 100 TB the postings come from the
    materialized t23 index instead of a rescan, and the only growing
    exchange still carries (query_id, doc_id, int64) triples.

    Since round 8 the retrieval core lives in
    operators/retrieval.py ``batch_bm25_retrieval`` (round-7 verdict
    #5): the entry derives its vocabulary-bucketed query set (df
    attached for free, so the operator adds no query-side join) and
    the operator accepts ANY (query_id, term) frame — with a
    ``route="bloom"`` fallback for term tables past broadcast size,
    property-tested identical to this broadcast plan."""
    from ..functions.hashing import _hash60
    from ..operators.retrieval import batch_bm25_retrieval

    docs = _docs(spark, sf_dir)
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    arr = tokenize_expr(text)
    # df = docs containing the term: per-doc distinct tokens, explode,
    # count — one scan, map-side combined, identical values to the
    # postings-derived df (count over (term, doc) groups)
    df_tbl = (
        docs.select(F.explode(F.array_distinct(arr)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    qterms = df_tbl.filter(F.col("df") >= 3).select(
        (_hash60(F.lit("q"), F.col("term")) % _BM25_NQ).alias("query_id"),
        "term",
        "df",
    )
    return batch_bm25_retrieval(
        docs, qterms, k=_BM25_TOPK, k1=_BM25_K1, b=_BM25_B
    )


def _semantic_resolve_oracle() -> str:
    """Embedding-corpus survivors after SEMANTIC dedup resolution: the
    d10 shape applied to the embedding side — transitive closure of the
    exact cosine-threshold pair relation (d6's oracle as the pair
    source), keep the min-id member per component."""
    pair_sql = _neardup_oracle()
    return f"""
    WITH RECURSIVE
    prs AS (SELECT id_a, id_b FROM ({pair_sql})),
    edges AS (SELECT id_a AS a, id_b AS b FROM prs
              UNION
              SELECT id_b AS a, id_a AS b FROM prs),
    walk(node, reach) AS (
      SELECT a, b FROM edges
      UNION
      SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
    labels AS (
      SELECT node, least(node, min(reach)) AS component_id
      FROM walk GROUP BY node)
    SELECT e.vec_id, e.label
    FROM embeddings e
    WHERE e.vec_id NOT IN (
      SELECT node FROM labels WHERE node <> component_id)
    ORDER BY e.vec_id
    """


@_register("d18_semantic_dedup_resolve", _semantic_resolve_oracle())
def d18_semantic_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SEMANTIC dedup resolution (round 7): the embedding-side
    twin of d10 — SemDeDup pairs (d13's k-means-cell operator) →
    transitive closure (d8's large-star/small-star components, id-only
    edges) → keep the min-id canonical per cluster → surviving corpus
    via anti join.  This is the pass an LLM pipeline actually ships:
    pairwise detection alone doesn't shrink a corpus; the
    cluster-resolve-keep chain does (Abbas et al. 2023 keep one point
    per semantic cluster; d10 is the lexical sibling).

    At oracle scale d13's operating point has recall 1.0 (its own entry
    shares d6's exact oracle), so the resolved corpus is checkable
    against the EXACT pair relation's transitive closure (recursive CTE)
    — the full pipeline value-hashes end-to-end, not just the pair
    stage.  Scale shape: pairs move only ids; components are O(log n)
    id-only rounds; the final anti join broadcasts the non-canonical
    drop-list (tiny at any realistic dup rate) so the corpus is scanned
    once and never shuffled — and past broadcast size the d16 bloom
    split applies unchanged."""
    from ..operators.dedup import semantic_neardup_pairs
    from ..operators.graph import dup_clusters

    emb = _emb(spark, sf_dir)
    pairs = semantic_neardup_pairs(
        emb, "vec_id", "embedding", _NEARDUP_THRESHOLD, n_probe=4
    ).select(F.col("id_a"), F.col("id_b"))
    drop = (
        dup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias("vec_id"))
    )
    return (
        emb.join(F.broadcast(drop), "vec_id", "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


def _register_d19():
    # shares d18's oracle VERBATIM (the d16/d10 identity pattern): the
    # bloom routing must be output-invisible — it only re-routes the plan
    d18_oracle = QUERIES["d18_semantic_dedup_resolve"][1]

    @_register("d19_semantic_resolve_bloom", d18_oracle)
    def d19_semantic_resolve_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
        """d18's semantic dedup resolution routed through the Bloom
        drop-list split (round-7 verdict #6: d18's docstring claimed
        "past broadcast size the d16 bloom split applies unchanged"
        without exercising it — this entry is that sentence as code).

        Same pairs → closure → canonical chain as d18; the survivors
        step replaces the broadcast anti join with
        ``bloom_prune_anti_join``: rows the bitmap proves absent from
        the drop-list keep WITHOUT any exchange, only bloom suspects
        (true drops + false positives) pay the exact anti join — the
        production path once the semantic drop-list outgrows a
        broadcast.  Identity with d18's recursive-CTE oracle is the
        entry's correctness claim."""
        from ..operators.bloom import bloom_prune_anti_join
        from ..operators.dedup import semantic_neardup_pairs
        from ..operators.graph import dup_clusters

        emb = _emb(spark, sf_dir)
        pairs = semantic_neardup_pairs(
            emb, "vec_id", "embedding", _NEARDUP_THRESHOLD, n_probe=4
        ).select(F.col("id_a"), F.col("id_b"))
        drop = (
            dup_clusters(pairs)
            .filter(~F.col("is_canonical"))
            .select(F.col("doc_id").alias("vec_id"))
        )
        return (
            bloom_prune_anti_join(emb, drop, "vec_id", "vec_id")
            .select("vec_id", "label")
            .orderBy("vec_id")
        )


_register_d19()


@_register(
    "s17_commit_log_serializable",
    """
    SELECT CAST(1 AS INTEGER) AS version, doc_id FROM documents
    WHERE doc_id % 3 = 0
    UNION ALL
    SELECT CAST(2 AS INTEGER) AS version, doc_id FROM documents
    WHERE doc_id % 3 <= 1
    UNION ALL
    SELECT CAST(3 AS INTEGER) AS version, doc_id FROM documents
    ORDER BY version, doc_id
    """,
)
def s17_commit_log_serializable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-writer commit protocol (ingest/commit_log.py), driven
    through the round-7 verdict's exact scenario and value-hashed
    end-to-end (round-8; closes the README's 'no concurrent-writer
    table format' limitation vs the reference's Postgres transactions,
    repo_postgres_caqti.ml:536-586):

    1. v1 commits the doc_id%3==0 slice — the base BOTH writers read;
    2. writer B STAGES the %3==2 slice against head v1 (data files on
       disk, manifest not linked);
    3. writer A appends the %3==1 slice and wins v2;
    4. B's commit finds v2 claimed (the atomic link fails), REBASES
       onto A's head, and lands v3 — loser retries, no lost rows.

    The entry returns every version's pinned read tagged by version;
    the oracle reconstructs the serializable history arithmetically
    (v1=base, v2=base+A, v3=all) — so a protocol bug (lost update,
    wrong rebase parent, torn read) breaks the value hash, not just a
    unit test.  Scale shape: commits are metadata-only (one fsync'd
    link per version); the data writes and the reads are ordinary
    distributed parquet I/O; version reads reconstruct the file set
    from the nearest checkpoint + a bounded manifest tail (round-9:
    delta manifests + every-Nth-commit checkpoints keep manifest bytes
    and reads-per-commit O(1) in history length)."""
    import shutil
    import tempfile

    from ..ingest.commit_log import CommitLogTable

    docs = _docs(spark, sf_dir).select("doc_id")
    base = tempfile.mkdtemp(prefix="commit_log_entry_")
    try:
        t = CommitLogTable(spark, base)
        t.append(docs.filter(F.col("doc_id") % 3 == 0))  # v1: common base
        pending_b = t.begin_append(docs.filter(F.col("doc_id") % 3 == 2))
        va = t.append(docs.filter(F.col("doc_id") % 3 == 1))  # A wins v2
        vb = pending_b.commit()  # B rebases to v3
        assert (va, vb) == (2, 3), (va, vb)
        reads = [
            t.read(v).select(
                F.lit(v).cast("int").alias("version"), "doc_id"
            )
            for v in (1, 2, 3)
        ]
        out = reads[0]
        for r in reads[1:]:
            out = out.unionByName(r)
        # the s16 tmp-dir discipline: materialize, then delete the
        # table — otherwise every bench/smoke invocation leaks a full
        # versioned copy of the documents slice into /tmp
        out = out.orderBy("version", "doc_id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def _register_t26():
    # shares t14's oracle VERBATIM (the d16/j14 identity pattern): the
    # CMS gate must be output-invisible — it only re-routes the plan
    t14_oracle = QUERIES["t14_boilerplate_ngrams"][1]

    @_register("t26_boilerplate_cms_gate", t14_oracle)
    def t26_boilerplate_cms_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """t14's boilerplate-n-gram pass routed through the Count-Min
        PRE-FILTER (round-6 verdict #6 — a29's sketch gets a production
        consumer): pass 1 sketches the per-doc-distinct gram stream;
        pass 2 drops every gram whose ESTIMATE is already below the
        doc_count >= 3 threshold at the SCAN — CMS never undercounts,
        so no true boilerplate gram can be dropped (lossless gate,
        identity oracle) — and only the suspect sliver (true heavies +
        sketch collisions) pays the exact groupBy's exchange.

        At 100 TB this inverts t14's cost: the corpus-wide
        (ngram, doc) exchange — dominated by the quadrillion-strong
        light tail — shrinks to the suspects, while the sketch pass is
        one map-side-combined aggregate into depth*width counters and
        per-row probes against broadcast slices.  Width auto-sizes to
        the stream (cells ~ N, the d13 discipline) UP TO the
        broadcastable cap (2^20 cells, ~16 MB per slice;
        countmin_prefilter warns when the cap engages): beyond
        cap·min_count stream rows the gate's selectivity decays toward
        pass-everything — correctness unaffected, the exact stage just
        re-pays its shuffle — and the production form pre-partitions
        the stream (by shard/source) and gates per shard.

        The in-doc dedup rides ``array_distinct`` inside the scan
        projection (equivalent to t14's global (doc_id, ngram)
        distinct because doc_id keys the rows — one less shuffle on
        BOTH passes)."""
        from ..operators.sketch import countmin_prefilter

        docs = _docs(spark, sf_dir)
        w, grams = _c4_word5_gram_exprs()
        stream = (
            docs.select("doc_id", w.alias("w"))
            .filter(F.size("w") >= 5)
            .select("doc_id", F.explode(F.array_distinct(grams)).alias("ngram"))
        )
        suspects = countmin_prefilter(stream, "ngram", min_count=3)
        return (
            suspects.groupBy("ngram")
            .agg(F.count(F.lit(1)).cast("bigint").alias("doc_count"))
            .filter(F.col("doc_count") >= 3)
            .orderBy("ngram")
        )


_register_t26()


@_register(
    "v12_ann_index_persist",
    """
    SELECT vec_id AS query_id, 3 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY query_id
    """,
)
def v12_ann_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with BUILD/SERVE separation (FAISS write_index/read_index;
    the production deployment shape round-7's v11 stopped short of):
    an index job trains the coarse centroids + residual PQ codebooks
    and encodes the corpus ONCE, persisting three parquet artifacts
    (centroids, codebooks, distributed codes); a serve job loads them
    and answers queries WITHOUT retraining or re-encoding — corpus
    vectors are touched only by the exact re-rank join on the
    shortlist.

    Same parameters and recall-gate contract as v11 (recall@3 >= 0.6
    per query, oracle predicts all-true); additionally the persisted
    path is bit-identical to the inline run — float64 round-trips
    parquet exactly and every stage is deterministic — which
    tests/test_similarity.py pins row-for-row.

    At 100 TB: the build job's Arrow encode pass over every vector is
    the expensive step and runs exactly once; each serve job's scan
    reads m code BYTES per row (codes/ is ~the PQ payload smoke row),
    and reindexing cadence decouples from query traffic — the reason
    real ANN deployments split the jobs."""
    import shutil
    import tempfile

    from ..operators.similarity import (
        build_ivfpq_index,
        cosine_knn_join,
        ivfpq_topk,
        load_ivfpq_index,
        pq_operating_point,
    )

    queries = _emb_queries(spark, sf_dir)
    # in-entry corpus pin off the RAW scan (round 15 — the v15
    # rationale): one materialization serves the build's four corpus
    # touches, the serve's re-rank join, AND the exact baseline, on the
    # table's natural partitioning instead of re-running the _spread
    # repartition per broadcast subtree.  Released in the finally.
    corpus = (
        _t(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .filter(F.col("neighbor_id") >= 5)
        .persist()
    )
    # same corpus-scaled operating point as v11 (see pq_operating_point):
    # the BUILD bakes ksub into the codebooks, the SERVE call scales its
    # shortlist — keeping the persisted path bit-identical to the inline
    # run at every committed scale factor.  Footer-count: same number a
    # Spark count() returns, zero jobs.
    ksub, overfetch = pq_operating_point(_table_rows(sf_dir, "embeddings") - 5, k=3)
    index_dir = tempfile.mkdtemp(prefix="cm_v12_index_")
    try:
        build_ivfpq_index(
            corpus, "neighbor_id", index_dir, nlist=8, m=8, ksub=ksub,
            # the entry's persist above owns the pin now; a second
            # persist inside the build would double-cache the frame
        )
        centroids, codebooks, codes = load_ivfpq_index(spark, index_dir)
        approx = ivfpq_topk(
            queries, corpus, k=3,
            query_id="query_id", corpus_id="neighbor_id",
            nprobe=7, overfetch=overfetch,
            centroids=centroids, codebooks=codebooks, codes=codes,
        ).select("query_id", "neighbor_id")
        exact = cosine_knn_join(
            queries, corpus, k=3, query_id="query_id", corpus_id="neighbor_id"
        ).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        per_q = (
            exact.groupBy("query_id")
            .agg(F.count("*").alias("k"))
            .join(
                hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
                "query_id",
                "left",
            )
            .select(
                "query_id",
                F.col("k").cast("int").alias("k"),
                (
                    F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("k") >= 0.6
                ).alias("recall_ok"),
            )
            .orderBy("query_id")
        )
        # the index dir is a tmp artifact: materialize before rmtree
        # (the s16/s17 discipline — otherwise every bench/smoke run
        # leaks an encoded corpus copy into /tmp)
        out = per_q.localCheckpoint(eager=True)
    finally:
        corpus.unpersist()
        shutil.rmtree(index_dir, ignore_errors=True)
    return out


@_register(
    "d20_stream_dedup",
    """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events ORDER BY event_id
    """,
)
def d20_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup as a REAL checkpointed Structured Streaming
    run (streaming/structured.py dedup_events — previously library+test
    only): the events table is duplicated 2x (the at-least-once
    delivery replay, where duplicates are EXACT copies of the record),
    lands as parquet, and a watermarked
    ``dropDuplicatesWithinWatermark`` stream drains to a parquet sink
    that must equal the original table row-for-row — identity oracle.

    Scale shape: the state store holds one key per distinct event_id
    within the watermark horizon — O(distinct keys per horizon), not
    O(all keys ever) — which is what makes exactly-once ingest dedup
    viable on an unbounded 100 TB/day stream; the watermark here is
    sized to the fixture's span (+1 h) so nothing is late-dropped and
    the identity holds exactly (production picks the real lateness
    SLA; tests/test_streaming.py pins the bounded-state eviction on
    synthetic late rows)."""
    import glob as _glob
    import shutil
    import tempfile

    from ..streaming.structured import dedup_events

    base = tempfile.mkdtemp(prefix="cm_d20_")
    tz_key = "spark.sql.session.timeZone"
    prior_tz = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")  # NTZ->TZ->NTZ bijective under UTC
    try:
        src, sink, ckpt = f"{base}/src", f"{base}/sink", f"{base}/ckpt"
        ev = _events(spark, sf_dir)
        cols = ev.columns
        dtypes = dict(ev.dtypes)
        ts_type = dtypes["ts"]
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
        bounds = ev.agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).first()
        span_s = (
            int((bounds["hi"] - bounds["lo"]).total_seconds()) + 3600
            if bounds["lo"] is not None
            else 3600
        )
        # one file -> one micro-batch (the j15 discipline): both copies
        # of every record arrive in the same batch, so the identity is
        # exact regardless of the watermark's eviction cadence
        ev.unionByName(ev).coalesce(1).write.mode("overwrite").parquet(src)
        schema = ev.schema  # not re-read: an empty write has no footer
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = dedup_events(
            stream, key_cols=("event_id",),
            watermark_delay=f"{span_s} seconds",
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if not _glob.glob(f"{sink}/*.parquet"):
            ddl = ", ".join(f"{c} {dtypes[c]}" for c in cols)
            return spark.createDataFrame([], ddl)
        out = (
            spark.read.parquet(sink)
            .withColumn("ts", F.col("ts").cast(ts_type))
            .select(*cols)
            .orderBy("event_id")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set(tz_key, prior_tz)
        shutil.rmtree(base, ignore_errors=True)
    return out


@_register(
    "s18_stream_commit_log_sink",
    """
    SELECT event_id, user_id, event_type, value
    FROM events ORDER BY event_id
    """,
)
def s18_stream_commit_log_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming sink into the commit log (the Delta
    txnAppId/txnVersion pattern over ingest/commit_log.py — round-8's
    s17 proved the multi-writer protocol serializable; this entry makes
    a STREAM a writer): events drain through ``foreachBatch`` with
    ``append_idempotent(batch, app_id, batch_id)``, one commit-log
    version per micro-batch, and a deliberately REPLAYED batch (what a
    restarted query does after a failure between the sink write and the
    checkpoint commit — foreachBatch alone is only at-least-once) is
    detected by its (app_id, batch_id) txn marker and skipped, so the
    final table holds every event exactly once — identity oracle.  The
    sink carries an ACTIVE RetentionPolicy (round-9 verdict: retention
    is now wired into the sink, not a manual afterthought): every 2nd
    commit expires manifests below the covering checkpoint and vacuums
    superseded checkpoints, so the identity oracle ALSO proves
    retention drops no rows — expired manifests' data files stay
    referenced by the surviving checkpoints' complete file lists.

    Scale shape: the idempotence check is driver-side metadata (scan of
    small manifests), each micro-batch append is ordinary distributed
    parquet I/O plus ONE fsync'd atomic link, the replay guard
    composes with concurrent non-stream writers (the append rebase
    re-checks the txn marker inside the claim loop), and the policy
    bounds the metadata footprint over an infinite stream."""
    import shutil
    import tempfile

    from ..ingest.commit_log import (
        CommitLogTable,
        RetentionPolicy,
        streaming_commit_sink,
    )

    base = tempfile.mkdtemp(prefix="cm_s18_")
    try:
        src, ckpt, tbl = f"{base}/src", f"{base}/ckpt", f"{base}/tbl"
        ev = _events(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
        )
        # 4 files x maxFilesPerTrigger=1 -> 4 micro-batches
        ev.repartition(4).write.mode("overwrite").parquet(src)
        schema = ev.schema  # not re-read: an empty write has no footer
        table = CommitLogTable(spark, tbl, checkpoint_interval=2)
        batches = []
        # retention_seconds=0 is safe here: this stream is the table's
        # only writer, and foreachBatch runs serially on the driver
        write_batch = streaming_commit_sink(
            table,
            "s18_stream",
            RetentionPolicy(
                every_n_commits=2, keep_last=2, retention_seconds=0
            ),
        )

        def sink(batch_df, batch_id):
            batches.append((batch_id, write_batch(batch_df, batch_id)))

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if not batches:
            # empty source: availableNow fires zero micro-batches and
            # the table never gets a version — emit the contract schema
            return spark.createDataFrame([], schema)
        assert all(v is not None for _, v in batches), batches
        head = table.latest_version()
        # replay the last micro-batch exactly as a restarted query
        # would (same batch_id; rows re-derived from the source):
        # must be a no-op — no new version, no duplicate rows
        last_id = batches[-1][0]
        replay = table.append_idempotent(ev, "s18_stream", last_id)
        assert replay is None, replay
        assert table.latest_version() == head
        out = table.read().orderBy("event_id").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


_SUBSTR_K = 8  # tokens per rolling window (Lee et al. use 50; fixture docs are 10-99 tokens)


@_register(
    "d21_substring_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_NORM_TOKENS.format(col="text")} AS t
      FROM documents),
    grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(t[(CAST(i AS INT)+1):(CAST(i AS INT)+{_SUBSTR_K})], ' ') AS g
      FROM toks,
           LATERAL (SELECT unnest(range(0,
             greatest(len(t) - {_SUBSTR_K} + 1, 0))) AS i) u),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    marked AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
    cov AS (
      -- O(n*k) toy-scale form of the span union: explode each marked
      -- window into its k token indices and count distinct
      SELECT doc_id,
             CAST(count(DISTINCT pos) AS BIGINT) AS dup_grams,
             CAST(count(DISTINCT pos + j) AS BIGINT) AS dup_tokens
      FROM marked,
           LATERAL (SELECT unnest(range(0, {_SUBSTR_K})) AS j) v
      GROUP BY doc_id),
    meta AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(greatest(len(t) - {_SUBSTR_K} + 1, 0) AS BIGINT) AS n_grams
      FROM toks)
    SELECT m.doc_id, m.n_tokens, m.n_grams, c.dup_grams, c.dup_tokens,
           CAST(c.dup_tokens AS DOUBLE) / m.n_tokens AS dup_fraction
    FROM meta m JOIN cov c USING (doc_id)
    ORDER BY m.doc_id
    """,
)
def d21_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring (token-span) duplication — Lee et al. 2022's
    EXACTSUBSTR pass, the granularity the dedup ladder was missing
    (d1 whole-document -> d17 paragraph -> THIS, k-token spans): every
    {k}-token rolling window repeated anywhere in the corpus marks its
    span duplicated; per doc we report duplicated window starts and the
    merged-interval token coverage Lee et al. trim, plus the fraction.

    The distributed plan replaces their single-node suffix array with a
    rolling-gram frequency join: grams fold to xxhash64 IN the scan
    projection (the corpus-scale exchanges carry int64, never k-token
    strings), the frequency aggregate is partial+final (hot boilerplate
    grams collapse map-side — the d17 skew discipline), the mark-back
    is a hash-keyed shuffle join, and the per-doc span union is an
    in-group sorted-interval merge via F.aggregate (O(dup_grams) per
    doc, no k-way explode; the oracle's count-distinct trick is the
    O(n*k) toy-scale form of the same number).  See
    operators/dedup.py substring_dup_stats for the collision bound."""
    from ..operators.dedup import substring_dup_stats

    docs = _docs(spark, sf_dir)
    return (
        substring_dup_stats(docs, "doc_id", "text", k=_SUBSTR_K)
        .orderBy("doc_id")
    )


d21_substring_dedup.__doc__ = d21_substring_dedup.__doc__.replace(
    "{k}", str(_SUBSTR_K)
)


_RRF_B = 50  # depth of each system's candidate list
_RRF_C = 60  # the standard RRF constant (Cormack et al. 2009)
_RRF_TOPK = 20


def _rrf_oracle() -> str:
    cos = _duck_cosine("embedding", _duck_vec_literal())
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WS_TOKS_SQL}) AS token
      FROM documents),
    doc_len AS (
      SELECT doc_id, CAST(len({_WS_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avgdl
      FROM doc_len),
    hits AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE token IN {_TFIDF_TERMS!r}
      GROUP BY doc_id, token),
    df AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df
      FROM hits GROUP BY token),
    contrib AS (
      SELECT h.doc_id, h.token,
             {_BM25_CONTRIB_SQL} AS contrib
      FROM hits h
      JOIN doc_len dl USING (doc_id)
      JOIN df d ON h.token = d.token
      CROSS JOIN stats s),
    scored AS (
      SELECT doc_id,
             {_BM25_RAW_SQL} AS raw
      FROM contrib
      GROUP BY doc_id),
    bm AS (
      SELECT doc_id,
             CAST(row_number() OVER (
               ORDER BY floor(raw * 1000000.0 + 0.5) / 1000000.0 DESC,
                        doc_id) AS INTEGER) AS bm25_rank
      FROM scored
      QUALIFY bm25_rank <= {_RRF_B}),
    cosr AS (
      -- floor(x*1e6+0.5) mirrors portable_round bit-for-bit (DuckDB
      -- round() can differ at FP half-boundaries — scoring.py:25)
      SELECT vec_id AS doc_id,
             CAST(row_number() OVER (
               ORDER BY floor(({cos}) * 1000000.0 + 0.5) / 1000000.0 DESC,
                        vec_id) AS INTEGER)
               AS cos_rank
      FROM embeddings
      QUALIFY cos_rank <= {_RRF_B})
    SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
           b.bm25_rank, c.cos_rank,
           coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_C} + b.bm25_rank), 0.0)
             + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_C} + c.cos_rank), 0.0)
             AS rrf_score
    FROM bm b FULL OUTER JOIN cosr c ON b.doc_id = c.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT {_RRF_TOPK}
    """


@_register("v13_rrf_fusion", _rrf_oracle())
def v13_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of lexical and semantic retrieval (Cormack
    et al. SIGIR 2009; the fusion Elasticsearch/Vespa hybrid search
    ships): BM25 top-{b} (t24's scorer, shared arithmetic via
    _bm25_scored_frame) and cosine top-{b} over the 1:1-aligned
    embeddings table are fused by score = sum over systems of
    1/({c} + rank), then global top-{k}.  Rank-based fusion needs no
    score calibration between systems — exactly why it is the standard
    first fusion for hybrid RAG retrieval, and the rank-space
    counterpart of the reference's weighted SCORE blend
    (hybrid_executor.ml's vector+keyword mix, F21).

    Scale shape: each system's list is a TakeOrderedAndProject (t24's
    two-scan zero-wide-exchange lexical plan; one corpus scan for the
    cosine side) cut to a CONSTANT {b} rows; ranks come from a window
    over those {b}-row frames (single-partition by construction and by
    intent — never over the corpus); the fusion join and final sort
    touch at most 2*{b} rows regardless of corpus size.  Scores
    rounded-then-ranked in both engines (t24/v2's tie discipline) so
    every cut is deterministic."""
    docs = _docs(spark, sf_dir)
    emb = _emb(spark, sf_dir)
    rank_w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = (
        _bm25_scored_frame(docs)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_RRF_B)
        .select(
            "doc_id",
            F.row_number().over(rank_w).cast("int").alias("bm25_rank"),
        )
    )
    cos = portable_round(
        cosine_similarity(F.col("embedding"), query_vector_lit(_query_vec())),
        6,
    )
    cosr = (
        emb.select(F.col("vec_id").alias("doc_id"), cos.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_RRF_B)
        .select(
            "doc_id",
            F.row_number().over(rank_w).cast("int").alias("cos_rank"),
        )
    )
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_C) + F.col("bm25_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_C) + F.col("cos_rank")), F.lit(0.0)
    )
    return (
        bm.join(cosr, "doc_id", "full")
        .select("doc_id", "bm25_rank", "cos_rank", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(_RRF_TOPK)
    )


v13_rrf_fusion.__doc__ = (
    v13_rrf_fusion.__doc__.replace("{b}", str(_RRF_B))
    .replace("{c}", str(_RRF_C))
    .replace("{k}", str(_RRF_TOPK))
)


def _audit_oracle() -> str:
    # one CTE per table (mirroring the one-scan-per-table plan), long
    # form via UNION ALL; every metric is exact-count DOUBLE division
    return """
    WITH o AS (
      SELECT
        CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) AS comp_ocust,
        CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*) AS uniq_okey,
        CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1
                 ELSE 0 END) AS DOUBLE) / count(*) AS acc_status
      FROM orders),
    l AS (
      SELECT
        CAST(sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1
                 ELSE 0 END) AS DOUBLE) / count(*) AS rng_disc,
        CAST(sum(CASE WHEN l_extendedprice >= 0 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) AS nneg_price,
        CAST(count(DISTINCT l_orderkey) AS DOUBLE) / count(*) AS uniq_lokey
      FROM lineitem),
    ri AS (
      SELECT
        CAST((SELECT count(*) FROM lineitem li
              WHERE li.l_orderkey IN (SELECT o_orderkey FROM orders))
             AS DOUBLE) / (SELECT count(*) FROM lineitem) AS li_orders,
        CAST((SELECT count(*) FROM orders oo
              WHERE oo.o_custkey IN (SELECT c_custkey FROM customer))
             AS DOUBLE) / (SELECT count(*) FROM orders) AS o_cust),
    long AS (
      SELECT 'orders.completeness(o_custkey)' AS constraint_name,
             comp_ocust AS metric, CAST(1.0 AS DOUBLE) AS threshold FROM o
      UNION ALL
      SELECT 'orders.uniqueness(o_orderkey)', uniq_okey,
             CAST(1.0 AS DOUBLE) FROM o
      UNION ALL
      SELECT 'orders.accepted_values(o_orderstatus)', acc_status,
             CAST(1.0 AS DOUBLE) FROM o
      UNION ALL
      SELECT 'lineitem.in_range(l_discount)', rng_disc,
             CAST(1.0 AS DOUBLE) FROM l
      UNION ALL
      SELECT 'lineitem.non_negative(l_extendedprice)', nneg_price,
             CAST(1.0 AS DOUBLE) FROM l
      UNION ALL
      SELECT 'lineitem.uniqueness(l_orderkey)', uniq_lokey,
             CAST(1.0 AS DOUBLE) FROM l
      UNION ALL
      SELECT 'lineitem.referential(l_orderkey -> orders.o_orderkey)',
             li_orders, CAST(1.0 AS DOUBLE) FROM ri
      UNION ALL
      SELECT 'orders.referential(o_custkey -> customer.c_custkey)',
             o_cust, CAST(1.0 AS DOUBLE) FROM ri)
    SELECT constraint_name, metric, threshold,
           metric >= threshold AS passed
    FROM long
    ORDER BY constraint_name
    """


@_register("a31_constraint_audit", _audit_oracle())
def a31_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit — the Deequ pattern (Schelter et
    al. VLDB 2018), the validation gate a pipeline runs before any
    training data ships: completeness, key uniqueness, accepted values,
    ranges, and referential integrity as named constraints with
    measured metrics and pass/fail verdicts.  The suite includes one
    deliberately failing constraint (lineitem.l_orderkey declared
    unique — it is not, orders have multiple lines) so the verdict
    path is exercised with a real measured metric, not just all-green.

    Scale shape (operators/audit.py): all row-local constraints on a
    table compile into ONE aggregate — a whole suite is a single
    partial+final scan per table, constant-size output; uniqueness adds
    an exact count-distinct to the same scan; referential integrity is
    a broadcast LEFT SEMI count (dimension-sized distinct key side),
    never a materialized join.  Adding a constraint adds a column,
    never a scan."""
    from ..operators.audit import (
        accepted_values,
        audit_table,
        completeness,
        in_range,
        non_negative,
        referential_integrity,
        uniqueness,
    )

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    o = audit_table(
        orders,
        "orders",
        [
            completeness("o_custkey"),
            uniqueness("o_orderkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
        ],
    )
    li = audit_table(
        lineitem,
        "lineitem",
        [
            in_range("l_discount", 0.0, 0.1),
            non_negative("l_extendedprice"),
            uniqueness("l_orderkey"),
        ],
    )
    # explicit broadcast opt-in: orders/customer KEY SETS are known
    # dimension-sized here, and the entry's plan pin (no SortMergeJoin)
    # wants the deterministic broadcast semi — the operator default is
    # now hint-free so unknown parents cannot OOM the driver
    r1 = referential_integrity(
        lineitem, "l_orderkey", orders, "o_orderkey", "lineitem", "orders",
        broadcast_parent_keys=True,
    )
    r2 = referential_integrity(
        orders, "o_custkey", customer, "c_custkey", "orders", "customer",
        broadcast_parent_keys=True,
    )
    return (
        o.unionByName(li)
        .unionByName(r1)
        .unionByName(r2)
        .withColumnRenamed("constraint", "constraint_name")
        .orderBy("constraint_name")
    )


@_register(
    "d22_substring_dedup_resolve",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_NORM_TOKENS.format(col="text")} AS t
      FROM documents),
    grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(t[(CAST(i AS INT)+1):(CAST(i AS INT)+{_SUBSTR_K})], ' ') AS g
      FROM toks,
           LATERAL (SELECT unnest(range(0,
             greatest(len(t) - {_SUBSTR_K} + 1, 0))) AS i) u),
    ranked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY g) AS occ,
             row_number() OVER (PARTITION BY g
                                ORDER BY doc_id, pos) AS rn
      FROM grams),
    dropw AS (SELECT doc_id, pos FROM ranked WHERE occ >= 2 AND rn > 1),
    droptok AS (
      SELECT DISTINCT doc_id, pos + j AS tpos
      FROM dropw,
           LATERAL (SELECT unnest(range(0, {_SUBSTR_K})) AS j) v),
    tok_rows AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS tpos,
             t[CAST(u.i AS INT)+1] AS token
      FROM toks, LATERAL (SELECT unnest(range(0, len(t))) AS i) u),
    kept AS (
      SELECT tr.doc_id, tr.tpos, tr.token
      FROM tok_rows tr
      ANTI JOIN droptok d
        ON tr.doc_id = d.doc_id AND tr.tpos = d.tpos),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             md5(string_agg(token, ' ' ORDER BY tpos)) AS clean_md5
      FROM kept GROUP BY doc_id),
    meta AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
    SELECT m.doc_id, m.n_tokens,
           coalesce(p.n_kept, 0) AS n_kept,
           m.n_tokens - coalesce(p.n_kept, 0) AS n_dropped,
           coalesce(p.clean_md5, md5('')) AS clean_md5
    FROM meta m LEFT JOIN per_doc p USING (doc_id)
    ORDER BY m.doc_id
    """,
)
def d22_substring_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup RESOLUTION — the trimming step Lee et al.
    2022 actually apply (d21 measures; this rewrites): every duplicated
    k-token window occurrence except the corpus-first one (min
    (doc_id, pos) per gram) is dropped, documents reassemble from their
    surviving tokens, and the cleaned text is md5-pinned per doc —
    d17's paragraph-level resolution contract at token granularity.
    The first occurrence always survives, so the corpus loses only
    repeats, never content.

    Scale shape (operators/dedup.py substring_dedup_resolve): shares
    d21's hash-only gram exchanges; first-occurrence resolution is
    groupBy(gram_hash).agg(min(struct(doc, pos)), count) — map-side
    combined, the d17 skew discipline; reassembly is pure array
    arithmetic in one projection (no per-token explode — the oracle's
    tok_rows unnest is the toy-scale form)."""
    from ..operators.dedup import substring_dedup_resolve

    docs = _docs(spark, sf_dir)
    return substring_dedup_resolve(
        docs, "doc_id", "text", k=_SUBSTR_K
    ).orderBy("doc_id")


@_register(
    "v14_ann_index_append",
    """
    SELECT vec_id AS query_id, 3 AS k, true AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY query_id
    """,
)
def v14_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC index MAINTENANCE (FAISS ``index.add``; completes the
    lifecycle v12 split into build/serve): the index is built on the
    older 80% of the corpus, the newest 20% arrives later and is
    APPENDED — encoded with the frozen build-time centroids/codebooks,
    cost ∝ the delta — and the serve job answers over the grown index
    without any retraining or corpus re-encode.  v12's recall-gate
    contract, now with exact kNN computed over the FULL corpus, so the
    gate only passes if the appended rows are genuinely searchable
    (drop the append and the newest vectors are unfindable).

    tests/test_similarity.py pins the stronger identity: serving from
    the appended index is row-identical to encoding the grown corpus
    inline with the same frozen model — append changes WHAT is
    indexed, never HOW.

    At 100 TB this is the nightly-delta posture: the build's
    full-corpus Arrow encode runs once per reindex cadence; each delta
    pays one encode pass over the NEW rows plus a distributed parquet
    append (concurrent maintainers route through the commit log — the
    operator docstring states the single-writer contract)."""
    import shutil
    import tempfile

    from ..operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        cosine_knn_join,
        ivfpq_topk,
        load_ivfpq_index,
    )

    queries = _emb_queries(spark, sf_dir)
    # in-entry corpus pin off the RAW scan (round 15 — the v15
    # rationale; released in the finally)
    corpus = (
        _t(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .filter(F.col("neighbor_id") >= 5)
        .persist()
    )
    split = corpus.agg(
        F.percentile_approx("neighbor_id", 0.8, 10000).alias("p")
    ).first()["p"]
    old = corpus.filter(F.col("neighbor_id") <= split)
    new = corpus.filter(F.col("neighbor_id") > split)
    index_dir = tempfile.mkdtemp(prefix="cm_v14_index_")
    try:
        build_ivfpq_index(
            old, "neighbor_id", index_dir, nlist=8, m=8, ksub=16,
            # the entry's persist above owns the pin
        )
        append_to_ivfpq_index(new, "neighbor_id", index_dir)
        centroids, codebooks, codes = load_ivfpq_index(spark, index_dir)
        approx = ivfpq_topk(
            queries, corpus, k=3,
            query_id="query_id", corpus_id="neighbor_id",
            nprobe=7, overfetch=32,
            centroids=centroids, codebooks=codebooks, codes=codes,
        ).select("query_id", "neighbor_id")
        exact = cosine_knn_join(
            queries, corpus, k=3, query_id="query_id", corpus_id="neighbor_id"
        ).select("query_id", "neighbor_id")
        hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        per_q = (
            exact.groupBy("query_id")
            .agg(F.count("*").alias("k"))
            .join(
                hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
                "query_id",
                "left",
            )
            .select(
                "query_id",
                F.col("k").cast("int").alias("k"),
                (
                    F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("k") >= 0.6
                ).alias("recall_ok"),
            )
            .orderBy("query_id")
        )
        out = per_q.localCheckpoint(eager=True)  # tmp index: s16 discipline
    finally:
        corpus.unpersist()
        shutil.rmtree(index_dir, ignore_errors=True)
    return out


@_register(
    "v15_ann_snapshot_lifecycle",
    """
    SELECT vec_id AS query_id, 3 AS k, true AS pinned_identical,
           true AS serve_identical, true AS appended_searchable
    FROM embeddings WHERE vec_id < 5 ORDER BY query_id
    """,
)
def v15_ann_snapshot_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SNAPSHOT-ISOLATED index maintenance (round 13, closing the
    round-12 verdict's #2; operators/ann_snapshot.py): v14's
    build → append lifecycle re-run under the versioned posture a
    server with concurrent readers needs — immutable model dirs, a
    commit-log codes table, an atomic CURRENT pointer flip.  The entry
    drives the full loop and GATES the isolation contract inline:

      1. snapshot_build on the older 80% of the corpus; pin it and
         serve top-k (the long-running reader).
      2. snapshot_maintain with the newest 20% FORCED to rebuild
         (retrain_psi=0 — the trigger path is measured separately in
         SCALE_SMOKE ann_drift; here the point is isolation) — new
         model dir, new codes version, pointer flip.
      3. the PRE-REBUILD pin serves again: must be ROW-IDENTICAL to
         step 1 (``pinned_identical``) — the in-place maintainer
         would have rebuilt under this reader.
      4. the flipped CURRENT serves the grown corpus ROW-IDENTICALLY
         to an inline ivfpq run with the same rebuilt model
         (``serve_identical`` — the snapshot layer changes WHERE
         artifacts live, never results; v12/v14's serve-from-disk
         contract, deterministic at every sf), and five APPENDED
         vectors used as their own queries each find themselves at
         full probe (``appended_searchable``, v14's
         genuinely-searchable trick — cosine 1.0 beats everything on
         a duplicate-free corpus).  An exact-kNN recall gate was
         deliberately NOT used here: on the near-uniform synthetic
         embeddings IVFPQ recall at tight dials is fixture luck
         (v11's committed ladder shows 0.25-0.83 on the uniform
         corpus) — it failed at exactly one sf, which is the
         dial-regime smell the round-10 checklist names, and the
         recall trade is owned by the v11 ladder, not this entry.

    Reference analog: the snapshot journal S9
    (lib/vector/repo_qdrant.ml:262-343) applied to the ANN index.  At
    100 TB this is the zero-downtime reindex: rebuilds land as new
    versions, serving flips atomically, old pins drain at their own
    pace, snapshot_vacuum reclaims at the retention the longest reader
    sets."""
    import shutil
    import tempfile

    from ..operators.ann_snapshot import (
        snapshot_build,
        snapshot_maintain,
        snapshot_pin,
    )
    from ..operators.similarity import ivfpq_topk

    queries = _emb_queries(spark, sf_dir)
    # in-entry corpus pin off the RAW scan (round 15; v11's round-14
    # persist convention): the lifecycle touches the corpus from ~15
    # subtrees (five serves' re-rank joins, two training samples, two
    # encode passes, the split percentile) and every broadcast subtree
    # re-ran the scan + _spread repartition chain without it — ~33
    # tiny tasks each.  The raw scan keeps the table's natural
    # partitioning (pushdown filter, 1-2 splits at bench scale, real
    # splits at corpus scale), the persist pins ONE materialization,
    # and the finally releases it after the eager checkpoint of the
    # 5-row gate — nothing survives the entry, so no cross-run
    # caching.  Measured: 79 -> 57 jobs, 10.8 -> 7.6 s same-window.
    corpus = (
        _t(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .filter(F.col("neighbor_id") >= 5)
        .persist()
    )
    split = corpus.agg(
        F.percentile_approx("neighbor_id", 0.8, 10000).alias("p")
    ).first()["p"]
    old = corpus.filter(F.col("neighbor_id") <= split)
    new = corpus.filter(F.col("neighbor_id") > split)
    root = tempfile.mkdtemp(prefix="cm_v15_snap_")
    try:
        pin0 = snapshot_build(
            old, "neighbor_id", root, nlist=8, m=8, ksub=16
        )

        def serve(qdf, pin, crp, k=3):
            cents, books, codes = pin.load(spark)
            return ivfpq_topk(
                qdf, crp, k=k,
                query_id="query_id", corpus_id="neighbor_id",
                nprobe=8, overfetch=32,
                centroids=cents, codebooks=books, codes=codes,
            ).select("query_id", "neighbor_id")

        before = sorted(map(tuple, serve(queries, pin0, old).collect()))
        turn = snapshot_maintain(
            new, "neighbor_id", root, corpus, retrain_psi=0.0
        )
        assert turn["action"] == "rebuilt", turn
        pin1 = snapshot_pin(root)
        assert pin1.model != pin0.model, "rebuild did not flip CURRENT"
        after = sorted(map(tuple, serve(queries, pin0, old).collect()))
        assert after == before, (
            "pinned reader drifted through the rebuild — snapshot "
            "isolation violated"
        )
        # the flipped snapshot serves identically to an inline run
        # with the same rebuilt model (codes= replaced by the inline
        # encode pass) — the serve-from-disk contract, entry-gated
        cents1, books1, _codes1 = pin1.load(spark)
        snap_rows = sorted(map(tuple, serve(queries, pin1, corpus).collect()))
        inline_rows = sorted(
            map(
                tuple,
                ivfpq_topk(
                    queries, corpus, k=3,
                    query_id="query_id", corpus_id="neighbor_id",
                    nprobe=8, overfetch=32,
                    centroids=cents1, codebooks=books1,
                ).select("query_id", "neighbor_id").collect(),
            )
        )
        assert snap_rows == inline_rows, (
            "snapshot-served rows differ from the inline run with the "
            "same rebuilt model"
        )
        # five appended vectors as their own queries: each must find
        # itself through the flipped index (cosine 1.0 beats every
        # other vector on a duplicate-free corpus; full probe, so the
        # only cut is the ADC pool)
        self_q = new.orderBy("neighbor_id").limit(5).select(
            F.col("neighbor_id").alias("query_id"), "embedding"
        )
        self_hits = serve(self_q, pin1, corpus, k=1).collect()
        assert all(
            r["query_id"] == r["neighbor_id"] for r in self_hits
        ) and len(self_hits) == 5, (
            f"appended vectors not searchable post-rebuild: {self_hits}"
        )
        per_q = queries.select(
            "query_id",
            F.lit(3).cast("int").alias("k"),
            F.lit(True).alias("pinned_identical"),
            F.lit(True).alias("serve_identical"),
            F.lit(True).alias("appended_searchable"),
        ).orderBy("query_id")
        out = per_q.localCheckpoint(eager=True)  # tmp root: s16 discipline
    finally:
        corpus.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    return out


def _semantic_decontaminate_oracle() -> str:
    cos = _duck_cosine("t.embedding", "e.embedding")
    return f"""
    WITH ev AS (SELECT * FROM embeddings WHERE vec_id % 97 = 0),
    tr AS (SELECT * FROM embeddings WHERE vec_id % 97 <> 0),
    scored AS (
      -- rounded (floor form = portable_round) BEFORE thresholding —
      -- d6's boundary convention, so a pair within 1 ulp of the
      -- threshold cannot flag in one engine and not the other
      SELECT t.vec_id, e.vec_id AS eval_id,
             floor(({cos}) * 1000000.0 + 0.5) / 1000000.0 AS cos_r
      FROM tr t, ev e),
    hits AS (
      SELECT * FROM scored WHERE cos_r >= {_NEARDUP_THRESHOLD})
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           max(cos_r) AS max_cos,
           min(eval_id) AS contaminated_by
    FROM hits
    GROUP BY vec_id
    ORDER BY vec_id
    """


@_register("d23_semantic_decontaminate", _semantic_decontaminate_oracle())
def d23_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-set decontamination — d9's benchmark scrub in
    embedding space (lexical shingle overlap misses paraphrases; modern
    pipelines run BOTH before training): flag every training vector
    within cosine {thr} of ANY benchmark vector (rounded before
    thresholding — d6's FP-boundary convention).  Benchmark set:
    vec_id % 97 = 0 (d9's eval-set convention on the embeddings table).

    Scale shape (operators/dedup.py semantic_decontaminate): benchmarks
    are dimension-sized by nature, so the eval side broadcasts and the
    corpus scans ONCE — per-(row, benchmark) JVM cosine on the
    broadcast, partial+final flag aggregate on the corpus id, nothing
    corpus-sized shuffles; a benchmark past broadcast size routes
    through the d13 cell pattern."""
    from ..operators.dedup import semantic_decontaminate

    emb = _emb(spark, sf_dir)
    train = emb.filter(F.col("vec_id") % 97 != 0)
    ev = emb.filter(F.col("vec_id") % 97 == 0)
    return semantic_decontaminate(
        train, ev, "vec_id", "embedding", _NEARDUP_THRESHOLD
    ).orderBy("vec_id")


d23_semantic_decontaminate.__doc__ = d23_semantic_decontaminate.__doc__.replace(
    "{thr}", str(_NEARDUP_THRESHOLD)
)


_DRIFT_SCALE = 1.5  # synthetic drift factor on the current snapshot


def _drift_oracle() -> str:
    # mirrors distribution_drift's arithmetic EXACTLY (fixed-width bins
    # over the reference min/max, epsilon zero-substitution, natural
    # log, floor-form rounding) so psi matches bit-for-bit
    return """
    WITH stats AS (
      SELECT min(value) AS mn, max(value) AS mx
      FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
    ),
    buckets AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS side,
             'value' AS feature,
             CAST(CASE WHEN mx = mn THEN 0
                  ELSE LEAST(9, GREATEST(0,
                       CAST(FLOOR((CASE WHEN event_id % 2 = 0 THEN value
                                   ELSE value * 1.5 END - mn) * 10.0
                                  / (mx - mn)) AS BIGINT)))
                  END AS VARCHAR) AS bucket
      FROM events CROSS JOIN stats
      WHERE value IS NOT NULL
      UNION ALL
      SELECT CASE WHEN event_id % 2 = 0 THEN 'ref' ELSE 'cur' END,
             'event_type', CAST(event_type AS VARCHAR)
      FROM events WHERE event_type IS NOT NULL
    ),
    fracs AS (
      SELECT side, feature, bucket,
             CAST(count(*) AS DOUBLE)
               / sum(count(*)) OVER (PARTITION BY side, feature) AS frac
      FROM buckets GROUP BY side, feature, bucket
    ),
    j AS (
      SELECT COALESCE(r.feature, c.feature) AS feature,
             COALESCE(r.frac, 0.0001) AS fr,
             COALESCE(c.frac, 0.0001) AS fc
      FROM (SELECT * FROM fracs WHERE side = 'ref') r
      FULL OUTER JOIN (SELECT * FROM fracs WHERE side = 'cur') c
        ON r.feature = c.feature AND r.bucket = c.bucket
    ),
    psis AS (
      SELECT feature,
             FLOOR(sum((fc - fr) * LN(fc / fr)) * 1000000.0 + 0.5)
               / 1000000.0 AS psi
      FROM j GROUP BY feature
    )
    SELECT feature, psi,
           CASE WHEN psi < 0.1 THEN 'stable'
                WHEN psi < 0.25 THEN 'moderate'
                ELSE 'major' END AS verdict
    FROM psis ORDER BY feature
    """


@_register("a32_drift_psi", _drift_oracle())
def a32_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit (Population Stability Index) between
    two snapshots — the monitor a training pipeline runs when a new
    data dump lands, BEFORE mixing it into the corpus: a31's constraint
    suite asks "is this snapshot sane", this asks "is it the same
    distribution the model was trained on".  Snapshots: even/odd
    event_id halves of events; the current side's `value` is scaled by
    {scale} (a synthetic drift, the a31 deliberately-failing-constraint
    convention) so the verdict ladder is exercised with a real measured
    psi — `value` reads non-stable (0.19, moderate, at sf0.01),
    `event_type` (genuinely undrifted) reads stable.

    Scale shape (operators/audit.py distribution_drift): feature count
    never adds scans — one bounded min/max collect over the reference
    (2·|numeric| scalars, inlined as literals), one (feature, bucket)
    explode-and-count scan per side (partial+final),
    then everything downstream is bucket-cardinality-sized; PSI
    arithmetic is fully portable (floor-form rounding, natural log,
    pinned division order), which the oracle reproduces bit-for-bit."""
    from ..operators.audit import distribution_drift

    ev = _t(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "value", F.col("value") * F.lit(_DRIFT_SCALE)
    )
    return distribution_drift(
        ref, cur, numeric_cols=["value"], categorical_cols=["event_type"]
    ).orderBy("feature")


a32_drift_psi.__doc__ = a32_drift_psi.__doc__.replace(
    "{scale}", str(_DRIFT_SCALE)
)


@_register(
    "s19_schema_evolution",
    """
    SELECT event_type,
           count(*) AS n_rows,
           count(CASE WHEN event_id % 2 = 1 AND value IS NOT NULL
                 THEN 1 END) AS n_with_value,
           FLOOR(sum(CASE WHEN event_id % 2 = 1 THEN value END)
                 * 1000000.0 + 0.5) / 1000000.0 AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def s19_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet batches of the SAME logical
    table written months apart — the older batch predates the `value`
    column — read back as ONE table with ``mergeSchema=true``, the
    missing column null-filled.  The 100 TB reality this models: a
    year of daily dumps where the schema gained columns along the way;
    a plain multi-path parquet read adopts ONE footer's schema
    (silently dropping the new column for every batch if it picks an
    old footer), so the merged-footer read is a correctness feature,
    not a convenience.  The aggregate proves the null-fill semantics:
    per event_type, rows from the pre-`value` batch count into n_rows
    but never into n_with_value/sum_value.

    Scale shape: schema merge reads FOOTERS (one small read per file,
    driver-side), not data; the scan itself stays one pass with
    column pruning intact.  Write-side: batches land under distinct
    directories exactly as a date-partitioned sink would."""
    token = _sf_token(sf_dir)
    base = f"/tmp/chessmate_evolution/{token}"
    ev = _t(spark, sf_dir, "events")
    # batch 1: the OLD schema (no value column), even ids
    ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type"
    ).write.mode("overwrite").parquet(f"{base}/batch1")
    # batch 2: the evolved schema, odd ids
    ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", "value"
    ).write.mode("overwrite").parquet(f"{base}/batch2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/batch1", f"{base}/batch2"
    )
    from ..functions.scoring import portable_round

    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("value").alias("n_with_value"),
            portable_round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# the grid-free PSI decomposition, shared by the a33 (numeric-bin) and
# a34 (categorical) windowed-drift oracles — everything downstream of
# the `base` CTE is bucket-agnostic:
#   psi(day) = SUM_present [(fc-fr)*ln(fc/fr) - missD(b)]
#            + SUM_all missD(b)
# where missD(b) = (eps - fr)*ln(eps/fr) is the vanished-mass term a
# bucket contributes when a day never saw it; floor-form rounding.
# One string so a convention change (the round-10 epsilon fix had to be
# applied to two identical copies) cannot desynchronize the two oracles.
_WINDOWED_PSI_TAIL = """
    ref AS (
      SELECT bucket,
             CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS fr
      FROM base GROUP BY bucket
    ),
    ref2 AS (
      SELECT bucket, fr,
             (0.0001 - fr) * LN(0.0001 / fr) AS miss,
             sum((0.0001 - fr) * LN(0.0001 / fr)) OVER () AS miss_all
      FROM ref
    ),
    day_counts AS (
      SELECT day, bucket, count(*) AS cnt,
             sum(count(*)) OVER (PARTITION BY day) AS day_n
      FROM base GROUP BY day, bucket
    ),
    terms AS (
      SELECT c.day,
             (CAST(c.cnt AS DOUBLE) / c.day_n - r.fr)
             * LN(CAST(c.cnt AS DOUBLE) / c.day_n / r.fr)
             - r.miss AS term,
             r.miss_all
      FROM day_counts c JOIN ref2 r USING (bucket)
    ),
    psis AS (
      SELECT day,
             FLOOR((sum(term) + max(miss_all)) * 1000000.0 + 0.5)
               / 1000000.0 AS psi
      FROM terms GROUP BY day
    )
    SELECT day, psi,
           CASE WHEN psi < 0.1 THEN 'stable'
                WHEN psi < 0.25 THEN 'moderate'
                ELSE 'major' END AS verdict
    FROM psis ORDER BY day
    """


def _windowed_drift_oracle() -> str:
    # mirrors windowed_drift exactly: global fixed-width bins over the
    # events value range, then the shared grid-free decomposition
    return """
    WITH stats AS (
      SELECT min(value) AS mn, max(value) AS mx FROM events
    ),
    base AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(CASE WHEN mx = mn THEN 0
                  ELSE LEAST(9, GREATEST(0,
                       CAST(FLOOR((value - mn) * 10.0 / (mx - mn))
                            AS BIGINT)))
                  END AS BIGINT) AS bucket
      FROM events CROSS JOIN stats
      WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    """ + _WINDOWED_PSI_TAIL


def _windowed_drift_cat_oracle() -> str:
    # windowed_drift(categorical=True): buckets are the category
    # values themselves (no stats CTE, no bins), then the SAME shared
    # grid-free decomposition tail as the a33 oracle
    return """
    WITH base AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(event_type AS VARCHAR) AS bucket
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ),
    """ + _WINDOWED_PSI_TAIL


@_register("a34_windowed_drift_categorical", _windowed_drift_cat_oracle())
def a34_windowed_drift_categorical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Categorical windowed drift — a33's per-day monitor over a
    CATEGORY column (`event_type`), the form the reference's payload
    fields (result, eco, opening_slug) actually need: per-day PSI on
    category buckets against the table-global category distribution.

    Scale shape (operators/audit.py windowed_drift categorical=True):
    TWO source scans total regardless of day count — no stats collect
    (categories need no range), one category-counted scan for the
    global reference fractions, one (day, category) counted scan for
    the windows — and the same grid-free decomposition (present-bucket
    terms + the global vanished-mass sum riding the broadcast
    reference).  The category set is the global side by construction,
    so a day missing a category contributes its epsilon vanished-mass
    term through the global sum with no (day × category) grid.
    Portable arithmetic; the oracle mirrors term-for-term."""
    from ..operators.audit import windowed_drift

    ev = _events(spark, sf_dir)
    out = windowed_drift(ev, "ts", "event_type", categorical=True)
    return out.select(
        F.col("day").cast("date").alias("day"), "psi", "verdict"
    ).orderBy("day")


@_register("a33_windowed_drift", _windowed_drift_oracle())
def a33_windowed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed drift monitor — a32's PSI core deployed the way a
    production pipeline actually runs it: one snapshot lands per day,
    and the question is "which DAYS drifted from the corpus-wide
    distribution?", one (day, psi, verdict) row each.

    Scale shape (operators/audit.py windowed_drift): three source
    scans total regardless of day count — a bounded min/max collect,
    global bucket fractions, (day, bucket) counts — and the grid-free
    PSI decomposition (present-bucket terms + the global vanished-mass
    sum riding the broadcast reference) means no corpus-derived frame
    is ever referenced twice.  A bucket a day never saw still
    contributes its epsilon vanished-mass term through the global sum.
    Portable arithmetic throughout; the oracle mirrors the
    decomposition term-for-term, psi bit-for-bit."""
    from ..operators.audit import windowed_drift

    # _events, not _t: this entry consumes ts, so it must ride the
    # NTZ/nanos-tolerant read every other ts-consuming builder uses
    ev = _events(spark, sf_dir)
    out = windowed_drift(ev, "ts", "value")
    return out.select(
        F.col("day").cast("date").alias("day"), "psi", "verdict"
    ).orderBy("day")
