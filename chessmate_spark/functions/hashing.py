"""Hashing expressions for dedup: MD5 ids, word shingles, MinHash signatures.

All JVM-side SQL expressions.  The MinHash family is engine-defined on MD5
(portable across Spark / DuckDB / Python):

    h_i(s) = int(md5(i || ':' || s)[:15 hex], 16)     (60-bit, fits BIGINT)
    minhash_i(doc) = min over shingles s of h_i(s)

Banding for LSH: the signature is split into ``bands`` groups of ``rows``
hashes; each band's group is md5-hashed into a bucket key; documents sharing
any (band, bucket) pair are candidate duplicates (classic MinHash-LSH,
Broder 1997 / MMDS ch.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_expr(col: Column) -> Column:
    """F14: hex MD5 digest (vector ids, cache keys, exact-dup keys)."""
    return F.md5(col)


def _hash60(prefix: Column, value: Column) -> Column:
    digest = F.md5(F.concat(prefix, F.lit(":"), value))
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint")


def word_shingles_expr(tokens: Column, n: int) -> Column:
    """n-word shingles of an array<string> column (space-joined, distinct).

    Shorter-than-n documents produce their full token join as one shingle so
    no document hashes to an empty set.
    """
    count = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), count)
    shingle = lambda i: F.concat_ws(" ", F.slice(tokens, i, n))
    return F.array_distinct(F.transform(idx, shingle))


MINHASH_PRIME = (1 << 31) - 1  # Mersenne prime 2^31 - 1


def universal_constants(count: int, prefix: str = "uh"):
    """Deterministic universal-hash constants (a_i, b_i) derived from md5.

    a_i ∈ [1, P-1], b_i ∈ [0, P-1] — reproducible in any engine from the
    same md5, so oracles can mirror hash families exactly.
    """
    import hashlib

    out = []
    for i in range(count):
        digest = hashlib.md5(f"{prefix}:{i}".encode()).hexdigest()
        a = int(digest[:8], 16) % (MINHASH_PRIME - 1) + 1
        b = int(digest[8:16], 16) % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_constants(num_hashes: int):
    return universal_constants(num_hashes, "uh")


def minhash_base_expr(shingle: Column) -> Column:
    """Per-shingle 31-bit base hash: md5('mh:'+s)[:15 hex] % P."""
    digest = F.md5(F.concat(F.lit("mh:"), shingle))
    return (
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % MINHASH_PRIME
    )


def minhash_expr(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature (array<bigint> of length num_hashes).

    One md5 per shingle, then cheap (a*h + b) mod P universal hashes — ~5x
    faster than md5-per-(hash, shingle) since nested higher-order functions
    evaluate interpreted (outside whole-stage codegen): the md5 op count is
    what dominates, so it is minimized.
    """
    # SINGLE aggregate pass with an array<bigint> running-minimum
    # accumulator.  Measured A/B at sf0.1: equal to the per-hash
    # array_min form — Catalyst's subexpression elimination DOES share
    # the md5 transform across those siblings (unlike v5's sibling
    # F.aggregate case, where the miss cost dim× hash passes).  The fold
    # form is kept because it guarantees the one-md5-per-shingle
    # contract structurally instead of leaning on CSE, which silently
    # stops firing if the sibling trees ever diverge.  min regroups
    # exactly, so signatures are bit-identical.
    hashed = F.transform(shingles, minhash_base_expr)
    consts = minhash_constants(num_hashes)
    init = F.array(*[F.lit(MINHASH_PRIME).cast("bigint") for _ in consts])
    folded = F.aggregate(
        hashed,
        init,
        lambda acc, h: F.array(
            *[
                F.least(
                    F.element_at(acc, i + 1),
                    (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME,
                )
                for i, (a, b) in enumerate(consts)
            ]
        ),
    )
    # empty shingle arrays keep the legacy all-NULL signature (array_min
    # of an empty array) rather than leaking the sentinel.  Likewise a
    # non-empty array whose elements are ALL NULL (each hashes to NULL,
    # F.least skips NULLs, and the fold would return the sentinel init —
    # two such degenerate docs would LSH-collide on it).  The guard
    # tests the INPUT (md5 of a non-null string is never null, so
    # "no element contributed" ⇔ "no non-null element exists") rather
    # than comparing `folded` to the sentinel, which would duplicate
    # the whole fold expression tree in the plan.
    nulls = F.array(*[F.lit(None).cast("bigint") for _ in consts])
    return F.when(
        shingles.isNull()
        | (F.size(shingles) <= 0)
        | ~F.exists(shingles, lambda x: x.isNotNull()),
        nulls,
    ).otherwise(folded)


def minhash_sql(shingles_sql: str, num_hashes: int) -> str:
    """``minhash_expr`` as ONE Spark-SQL string — the same fold tree,
    built in a single gateway call (round 15, guide §1.2 driver work):
    the Column-API form issues ~8 Py4J roundtrips per hash constant per
    call (measured 3.6 s of pure driver time building d26's 156-hash
    signature), where ``F.expr`` hands the JVM one string to parse in
    milliseconds.  The parsed tree is node-for-node the expression
    ``minhash_expr`` builds (same functions, same literals, same
    typing), so plans and results are identical — pinned by
    tests/test_hashing_edge.py's dual-form equality.

    ``shingles_sql`` must be a resolvable SQL expression (usually a
    named column); callers with a complex Column input alias it first.
    """
    P = MINHASH_PRIME
    consts = minhash_constants(num_hashes)
    base = (
        "CAST(conv(substring(md5(concat('mh:', s)), 1, 15), 16, 10)"
        f" AS BIGINT) % {P}"
    )
    hashed = f"transform({shingles_sql}, s -> {base})"
    init = ", ".join(f"CAST({P} AS BIGINT)" for _ in consts)
    steps = ", ".join(
        f"least(element_at(acc, {i + 1}), ({a} * h + {b}) % {P})"
        for i, (a, b) in enumerate(consts)
    )
    folded = f"aggregate({hashed}, array({init}), (acc, h) -> array({steps}))"
    nulls = ", ".join("CAST(NULL AS BIGINT)" for _ in consts)
    return (
        f"CASE WHEN {shingles_sql} IS NULL OR size({shingles_sql}) <= 0"
        f" OR NOT exists({shingles_sql}, x -> x IS NOT NULL)"
        f" THEN array({nulls}) ELSE {folded} END"
    )


def minhash_expr_named(col_name: str, num_hashes: int) -> Column:
    """``minhash_expr`` over a NAMED column via the one-call SQL form —
    use at call sites that already alias their shingles; identical
    semantics (see ``minhash_sql``)."""
    return F.expr(minhash_sql(col_name, num_hashes))


def band_keys_expr(signature: Column, bands: int, rows: int) -> Column:
    """LSH band bucket keys: array of ``bands`` strings 'band_i:md5(slice)'."""
    def one_band(b: Column) -> Column:
        chunk = F.slice(signature, b * F.lit(rows) + 1, rows)
        joined = F.concat_ws(",", F.transform(chunk, lambda x: x.cast("string")))
        return F.concat(b.cast("string"), F.lit(":"), F.md5(joined))

    return F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), one_band)


def band_keys_sql(signature_sql: str, bands: int, rows: int) -> str:
    """``band_keys_expr`` as one SQL string (same rationale and
    same-tree contract as ``minhash_sql``)."""
    joined = (
        f"concat_ws(',', transform(slice({signature_sql},"
        " b * {rows} + 1, {rows}), x -> CAST(x AS STRING)))"
    ).format(rows=rows)
    return (
        f"transform(sequence(0, {bands - 1}),"
        f" b -> concat(CAST(b AS STRING), ':', md5({joined})))"
    )


def band_keys_expr_named(col_name: str, bands: int, rows: int) -> Column:
    return F.expr(band_keys_sql(col_name, bands, rows))


def simhash_expr(tokens: Column, bits: int = 32) -> Column:
    """SimHash fingerprint over token 60-bit hashes (bit-majority vote).

    For each bit position, sum +1/−1 votes across tokens; the fingerprint
    sets bits with positive vote.  Returned as bigint.
    """
    # bit b of h tested as (h % 2^(b+1)) >= 2^b — pure bigint arithmetic,
    # bit-identical across engines (no float division involved).  Tokens are
    # hashed ONCE into an integer array; per-bit work is then two literal-mod
    # comparisons (the 2^b values are literal columns, not pow() calls) —
    # nested HOFs run interpreted, so op count is everything.
    pow_lits = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])
    hashed = F.transform(tokens, lambda t: _hash60(F.lit("sim"), t))

    def tok_votes(h: Column) -> Column:
        return F.transform(
            pow_lits,
            lambda p: F.when((h % (p + p)) >= p, F.lit(1).cast("bigint")).otherwise(
                F.lit(-1).cast("bigint")
            ),
        )

    zero = F.array_repeat(F.lit(0).cast("bigint"), bits)
    votes = F.aggregate(
        hashed, zero, lambda acc, h: F.zip_with(acc, tok_votes(h), lambda a, v: a + v)
    )
    bit_values = F.zip_with(
        votes,
        pow_lits,
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(
        bit_values, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


PORTABLE_PLANE_SCALE = 1_000_000
PORTABLE_QUANT = 1_000_000
# 16^15 = 2^60: the hash-to-unit divisor shared by every engine mirror
HASH60_UNIT = float(1 << 60)


def portable_hyperplanes(n_tables: int, n_planes: int, dim: int,
                         scale: int = PORTABLE_PLANE_SCALE):
    """Deterministic INTEGER hyperplanes derived from md5 — reproducible in
    any engine (the ``universal_constants`` discipline applied to
    random-projection LSH, so a SQL oracle can mirror signatures
    hash-for-hash instead of trusting an RNG state):

        c(t, p, i) = md5_60('hp:' || t || ':' || p || ':' || i)
                       % (2*scale + 1) - scale        ∈ [-scale, scale]

    Components are uniform on an integer cube rather than Gaussian; for
    SIGN-projection LSH the bucket candidates are verified exactly
    afterwards, so plane quality only shifts the S-curve slightly — while
    integer components make the signature arithmetic EXACT (no float
    summation-order hazard between engines).  Returns an
    (n_tables * n_planes, dim) int64 matrix.
    """
    import hashlib

    import numpy as np

    mod = 2 * scale + 1
    out = np.empty((n_tables * n_planes, dim), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            row = t * n_planes + p
            for i in range(dim):
                h = int(
                    hashlib.md5(f"hp:{t}:{p}:{i}".encode()).hexdigest()[:15],
                    16,
                )
                out[row, i] = h % mod - scale
    return out
