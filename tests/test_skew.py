"""Salted-join / hot-key-split-join correctness (result equivalence with a
plain join) and property-based checks for name functions and CC."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from softcite_kb_spark.functions import skew
from softcite_kb_spark.operators import canonicalize as cz


def _skewed_frames(spark):
    # 90% of fact rows hit one hot key
    fact = pd.DataFrame({
        "k": ["hot"] * 900 + [f"k{i}" for i in range(100)],
        "v": range(1000),
    })
    dim = pd.DataFrame({
        "k": ["hot"] + [f"k{i}" for i in range(100)] + ["unmatched"],
        "w": range(102),
    })
    return spark.createDataFrame(fact), spark.createDataFrame(dim)


def test_salted_join_equivalence(spark):
    fact, dim = _skewed_frames(spark)
    plain = {tuple(r) for r in fact.join(dim, "k").select("k", "v", "w").collect()}
    salted = {tuple(r) for r in
              skew.salted_join(fact, dim, "k", salt_buckets=8)
              .select("k", "v", "w").collect()}
    assert salted == plain


def test_hot_key_split_join_equivalence(spark):
    fact, dim = _skewed_frames(spark)
    for how in ("inner", "left"):
        plain = sorted(map(tuple,
                           fact.join(dim, "k", how).select("k", "v", "w").collect()),
                       key=str)
        split = sorted(map(tuple,
                           skew.hot_key_split_join(fact, dim, "k", threshold=100,
                                                   how=how)
                           .select("k", "v", "w").collect()),
                       key=str)
        assert split == plain, how


def test_hot_keys_detection(spark):
    fact, _ = _skewed_frames(spark)
    hk = [r.k for r in skew.hot_keys(fact, "k", 100).collect()]
    assert hk == ["hot"]


# ---- property-based (hypothesis drives pure-Python mirrors; one Spark
# confirmation per example set would be too slow, so properties run on
# the column-expression semantics via small literal frames) -------------

@st.composite
def edge_lists(draw):
    n = draw(st.integers(2, 12))
    m = draw(st.integers(1, 20))
    return [
        (f"v{draw(st.integers(0, n - 1))}", f"v{draw(st.integers(0, n - 1))}")
        for _ in range(m)
    ]


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edge_lists())
def test_cc_random_graphs_match_union_find(spark, pairs):
    pairs = [p for p in pairs if p[0] != p[1]]
    if not pairs:
        return
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    got = {r.member_id: r.component_id
           for r in cz.connected_components(df, max_iter=40).collect()}
    assert got == _union_find(pairs)


def test_salted_join_rejects_outer(spark):
    """right/full outer would duplicate unmatched small-side rows once per
    salt replica — rejected explicitly."""
    import pytest
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "v": [1]}))
    with pytest.raises(ValueError, match="salted_join supports"):
        skew.salted_join(df, df.withColumnRenamed("v", "w"), "k", how="full")
