"""Property tests for round-6 operators: the LSH banding ladder's scale
contract and the unicode tokenizer vs a Unicode-category reference."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from chessmate_spark.operators.dedup import lsh_banding_for

# ---------------------------------------------------------------------------
# lsh_banding_for: the quadratic-candidate guard


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_banding_ladder_shape(n):
    planes, tables = lsh_banding_for(n)
    # 62 = int64 signature-packing limit (never binds in practice)
    assert 3 <= planes <= 62
    assert tables >= 8
    if n <= 800:
        assert (planes, tables) == (3, 32)  # the oracle-regime floor


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=800, max_value=10**11))
def test_banding_candidate_factor_never_grows_superlinearly(n):
    # n >= 800: inside the oracle floor the ladder is frozen by design
    """The candidate volume ~ tables * n^2 / 2^planes must grow at most
    ~linearly per corpus decade: jumping from n to 10n may multiply the
    factor-adjusted candidates by at most ~30 (linear x ladder
    granularity), never the ~100x a frozen ladder gives."""
    p1, t1 = lsh_banding_for(n)
    p2, t2 = lsh_banding_for(10 * n)
    cand1 = t1 * n * n / (1 << p1)
    cand2 = t2 * (10 * n) * (10 * n) / (1 << p2)
    assert cand2 <= 30 * cand1


def test_banding_planes_monotone_in_n():
    prev = 0
    for n in (100, 800, 801, 2000, 20_000, 200_000, 2_000_000, 10**9):
        planes, _tables = lsh_banding_for(n)
        assert planes >= prev
        prev = planes


# ---------------------------------------------------------------------------
# unicode tokenizer vs a Unicode-category reference
#
# Alphabet avoids the known engine-divergent case folds (word-final
# capital sigma, Turkish dotted I) — the production entry documents the
# same exclusion.

_SAFE = (
    "abcXYZ019 .,!-_()"
    "äöüßÄÖÜ"      # German
    "бвгдежБВГДЕ"  # Cyrillic
    "αβγδεζΑΒΓΔ"   # Greek (no sigma)
    "東京将棋対局"   # CJK
)


def _py_unicode_tokens(text: str) -> list[str]:
    lowered = text.lower()
    out, cur = [], []
    for ch in lowered:
        if unicodedata.category(ch)[0] in ("L", "N"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=_SAFE, max_size=40), min_size=1, max_size=8
    )
)
def test_unicode_tokenizer_matches_category_reference(spark, texts):
    from pyspark.sql import functions as F

    from chessmate_spark.functions.text import unicode_norm_tokens_expr

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [
        r["toks"]
        for r in df.select(
            unicode_norm_tokens_expr(F.col("t")).alias("toks")
        ).collect()
    ]
    assert got == [_py_unicode_tokens(t) for t in texts]
