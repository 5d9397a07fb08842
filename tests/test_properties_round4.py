"""Property tests for the round-4 operators: connected components vs
union-find, salted join vs plain join, sequence packing vs a pure-Python
prefix sum — hypothesis-generated inputs, oracle-checked per example."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from chessmate_spark.operators.graph import connected_components
from chessmate_spark.operators.skew import salted_join
from chessmate_spark.operators.textan import sequence_pack

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=0, max_size=24
)


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(edges=_edges)
@_SETTINGS
def test_cc_equals_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long") if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    got = {
        r["node"]: r["component_id"] for r in connected_components(df).collect()
    }
    assert got == _uf(edges)


_fact_rows = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 4)), min_size=0, max_size=20
)


@given(rows=_fact_rows, salts=st.integers(1, 5), how=st.sampled_from(["inner", "left"]))
@_SETTINGS
def test_salted_join_identity(spark, rows, salts, how):
    fact = spark.createDataFrame(
        [(i, k) for i, (_, k) in enumerate(rows)], "row_id long, k long"
    ) if rows else spark.createDataFrame([], "row_id long, k long")
    dim = spark.createDataFrame([(1, "a"), (3, "b")], "dk long, name string")
    plain = sorted(
        tuple(str(v) for v in r)
        for r in fact.join(dim, fact["k"] == dim["dk"], how).collect()
    )
    salted = sorted(
        tuple(str(v) for v in r)
        for r in salted_join(
            fact, dim, "k", "dk", salt_on=["row_id"], salts=salts, how=how
        ).collect()
    )
    assert salted == plain


_docs = st.lists(st.text(alphabet="ab ", max_size=20), min_size=0, max_size=10)


@given(texts=_docs, capacity=st.integers(1, 8))
@_SETTINGS
def test_sequence_pack_prefix_sum(spark, texts, capacity):
    rows = [(i, t, "s") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string") \
        if rows else spark.createDataFrame([], "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r
        for r in sequence_pack(df, "doc_id", "text", "source", capacity).collect()
    }
    offset = 0
    for i, t in enumerate(texts):
        n = len([w for w in (t or "").split() if w])
        assert got[i]["n_tokens"] == n
        assert got[i]["tok_offset"] == offset
        assert got[i]["seq_id"] == offset // capacity
        offset += n
