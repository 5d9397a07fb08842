"""Bloom-filter join pruning: exact-join identity, no false negatives,
bounded bitmap, NULL-key semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chessmate_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prune_anti_join,
    bloom_prune_join,
)


@pytest.fixture()
def frames(spark):
    fact = spark.createDataFrame(
        [(i, f"k{i % 50}" if i % 7 else None, float(i)) for i in range(300)],
        ["row_id", "k", "val"],
    )
    dim = spark.createDataFrame(
        [(f"k{i}", f"name{i}") for i in range(0, 50, 3)] + [(None, "null_dim")],
        ["dk", "name"],
    )
    return fact, dim


def _sorted_rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_inner_identity_vs_plain_join(spark, frames):
    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    pruned = bloom_prune_join(fact, dim, "k", "dk", m_bits=1 << 12)
    cols = ["row_id", "k", "val", "dk", "name"]
    assert _sorted_rows(pruned, cols) == _sorted_rows(plain, cols)


def test_semi_identity_vs_plain_join(spark, frames):
    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "semi")
    pruned = bloom_prune_join(fact, dim, "k", "dk", how="semi", m_bits=1 << 12)
    cols = ["row_id", "k", "val"]
    assert _sorted_rows(pruned, cols) == _sorted_rows(plain, cols)


def test_no_false_negatives_even_with_tiny_filter(spark, frames):
    # 64 bits for ~17 keys forces false positives; identity must still hold
    # because the exact join removes them.
    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    pruned = bloom_prune_join(fact, dim, "k", "dk", m_bits=64, k=2)
    cols = ["row_id", "k", "val", "dk", "name"]
    assert _sorted_rows(pruned, cols) == _sorted_rows(plain, cols)


def test_anti_identity_vs_plain_anti_join(spark, frames):
    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "left_anti")
    pruned = bloom_prune_anti_join(fact, dim, "k", "dk", m_bits=1 << 12)
    cols = ["row_id", "k", "val"]
    assert _sorted_rows(pruned, cols) == _sorted_rows(plain, cols)


def test_anti_identity_with_tiny_filter_false_positives(spark, frames):
    # 64 bits forces false positives into the suspect branch; the exact
    # anti join there must still keep them, so the union stays identical
    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "left_anti")
    pruned = bloom_prune_anti_join(fact, dim, "k", "dk", m_bits=64, k=2)
    cols = ["row_id", "k", "val"]
    assert _sorted_rows(pruned, cols) == _sorted_rows(plain, cols)


def test_anti_join_keeps_null_fact_keys(spark, frames):
    # NULL keys never equi-match: anti join keeps them; the bloom split
    # must route them to the fast-keep branch
    fact, dim = frames
    pruned = bloom_prune_anti_join(fact, dim, "k", "dk", m_bits=1 << 12)
    nulls_in = fact.filter(F.col("k").isNull()).count()
    nulls_out = pruned.filter(F.col("k").isNull()).count()
    assert nulls_in > 0 and nulls_in == nulls_out


def test_membership_has_no_false_negatives(spark, frames):
    fact, dim = frames
    bitmap = bloom_build(dim, "dk", m_bits=1 << 12)
    dim_keys = {r["dk"] for r in dim.collect() if r["dk"] is not None}
    flagged = fact.withColumn(
        "hit", bloom_might_contain(F.col("k"), bitmap, 1 << 12)
    )
    for r in flagged.collect():
        if r["k"] in dim_keys:
            assert r["hit"] is True, f"false negative for {r['k']}"
        if r["k"] is None:
            assert r["hit"] is False


def test_pruning_actually_drops_rows(spark, frames):
    # With a well-sized filter, most of the 50 fact key groups (only 17 in
    # the dim) should be shed before the join.
    fact, dim = frames
    bitmap = bloom_build(dim, "dk", m_bits=1 << 16)
    kept = fact.where(
        bloom_might_contain(F.col("k"), bitmap, 1 << 16)
    ).count()
    matching = fact.join(dim, fact["k"] == dim["dk"], "semi").count()
    assert matching <= kept < fact.count()


def test_build_skips_null_keys(spark):
    dim = spark.createDataFrame([(None,), (None,)], "dk string")
    bitmap = bloom_build(dim, "dk", m_bits=256)
    assert bitmap == b"\x00" * 32


def test_empty_dim_prunes_everything(spark, frames):
    fact, dim = frames
    out = bloom_prune_join(fact, dim.where(F.lit(False)), "k", "dk", m_bits=256)
    assert out.count() == 0


def test_rejects_outer_join(spark, frames):
    fact, dim = frames
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_prune_join(fact, dim, "k", "dk", how="left")


def test_rejects_bad_params(spark, frames):
    fact, dim = frames
    with pytest.raises(ValueError, match="multiple of 8"):
        bloom_build(dim, "dk", m_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(dim, "dk", m_bits=256, k=0)
    bitmap = bloom_build(dim, "dk", m_bits=256)
    with pytest.raises(ValueError, match="expected 512"):
        bloom_might_contain(F.col("k"), bitmap, 512)


def test_positions_properties():
    """Pure hash-math properties (no Spark): range, determinism, and the
    odd-h2 guarantee that k probes hit k distinct residues for prime m."""
    import numpy as np

    from chessmate_spark.operators.bloom import _positions

    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover
        pytest.skip("hypothesis not installed")

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            min_size=1, max_size=20,
        ),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.sampled_from([64, 256, 1 << 12, 1 << 20]),
        st.integers(min_value=1, max_value=8),
    )
    def check(h1s, h2, m, k):
        h1 = np.array(h1s, dtype=np.int64)
        h2a = np.full(len(h1s), h2, dtype=np.int64)
        pos = _positions(h1, h2a, m, k)
        assert pos.shape == (len(h1s), k)
        assert (pos >= 0).all() and (pos < m).all()
        again = _positions(h1, h2a, m, k)
        assert (pos == again).all()

    check()


def test_positions_distinct_for_power_of_two_m():
    """h2 forced odd => gcd(h2, 2^j) = 1 => the k stepped positions are
    pairwise distinct whenever k <= m."""
    import numpy as np

    from chessmate_spark.operators.bloom import _positions

    rng = np.random.RandomState(7)
    h1 = rng.randint(-(2**62), 2**62, size=50).astype(np.int64)
    h2 = rng.randint(-(2**62), 2**62, size=50).astype(np.int64)
    pos = _positions(h1, h2, 64, 8)
    for row in pos:
        assert len(set(row.tolist())) == 8


def test_persist_fact_pin_and_release(spark, frames):
    # persist_fact pins ONE materialization; release_persisted_fact
    # frees it after the result is materialized (ADVICE r7: without a
    # handle the executor cache leaks per call)
    from chessmate_spark.operators.bloom import release_persisted_fact

    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "left_anti")
    pruned = bloom_prune_anti_join(
        fact, dim, "k", "dk", m_bits=1 << 12, persist_fact=True
    )
    cols = ["row_id", "k", "val"]
    assert _sorted_rows(pruned, cols) == _sorted_rows(plain, cols)
    pinned = pruned._bloom_pinned_fact
    assert pinned.storageLevel.useMemory  # actually persisted
    assert release_persisted_fact(pruned) is True
    assert not pinned.storageLevel.useMemory  # actually released
    assert release_persisted_fact(pruned) is False  # idempotent
    # a plain result carries no pin; release is a safe no-op
    assert release_persisted_fact(plain) is False
