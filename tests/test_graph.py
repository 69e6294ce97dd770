"""PageRank: hand-checkable structures, a pure-Python power-iteration
reference, conservation of total rank, and materializer equivalence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: F401

from softcite_kb_spark.materialize import ScratchTableMaterializer
from softcite_kb_spark.operators.graph import pagerank
from softcite_kb_spark.storage import TableStore


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]))


def _reference(pairs, n_iter, d=0.85):
    """Plain-Python power iteration with the exact same rounding."""
    nodes = sorted({x for p in pairs for x in p})
    n = len(nodes)
    out = {}
    for s, _t in set(pairs):
        out[s] = out.get(s, 0) + 1
    r = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t in set(pairs):
            contrib[t] += r[s] / out[s]
        dm = sum(r[v] for v in nodes if v not in out)
        r = {v: round((1 - d) / n + d * (contrib[v] + dm / n), 9)
             for v in nodes}
    return {v: round(x, 6) for v, x in r.items()}


def test_pagerank_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = {r.node: r.rank for r in pagerank(e, n_iter=5).collect()}
    assert got == {"a": pytest.approx(1 / 3, abs=1e-6),
                   "b": pytest.approx(1 / 3, abs=1e-6),
                   "c": pytest.approx(1 / 3, abs=1e-6)}


def test_pagerank_matches_python_reference(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
             ("e", "c"), ("e", "a"), ("d", "a"), ("f", "c")]
    got = {r.node: r.rank for r in pagerank(
        _edges(spark, pairs), n_iter=6).collect()}
    assert got == _reference(pairs, 6)
    # hub 'c' (3 in-edges) outranks leaf 'f' (none)
    assert got["c"] > got["f"]
    # total rank conserved (dangling mass redistributed)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_dangling_and_duplicates(spark):
    # duplicate edges collapse; 'b' is dangling (no out-edges)
    pairs = [("a", "b"), ("a", "b"), ("a", "b")]
    got = {r.node: r.rank for r in pagerank(
        _edges(spark, pairs), n_iter=4).collect()}
    assert got == _reference(pairs, 4)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_scratch_materializer(spark, tmp_path):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    scratch = ScratchTableMaterializer(TableStore(str(tmp_path / "s")))
    a = sorted(map(tuple, pagerank(_edges(spark, pairs), 4).collect()))
    b = sorted(map(tuple, pagerank(_edges(spark, pairs), 4,
                                   materializer=scratch).collect()))
    assert a == b and scratch._n > 0
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(_edges(spark, pairs), 0)


def _reference_with_universe(pairs, universe, n_iter, d=0.85):
    """Python reference where the node set = edge endpoints + universe
    (isolated nodes are dangling: they hold and redistribute rank)."""
    nodes = sorted({x for p in pairs for x in p} | set(universe))
    n = len(nodes)
    out = {}
    for s, _t in set(pairs):
        out[s] = out.get(s, 0) + 1
    r = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t in set(pairs):
            contrib[t] += r[s] / out[s]
        dm = sum(r[v] for v in nodes if v not in out)
        r = {v: round((1 - d) / n + d * (contrib[v] + dm / n), 9)
             for v in nodes}
    return {v: round(x, 6) for v, x in r.items()}


def test_pagerank_node_universe_includes_isolated(spark):
    """VERDICT r03 #7: an optional node universe makes isolated nodes
    appear with proper rank (they are dangling — they hold and
    redistribute mass, so every rank shifts vs the edge-only graph);
    matches the Python reference exactly."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    uni = ["a", "x", "y"]  # x, y isolated; a already present
    uni_df = spark.createDataFrame(pd.DataFrame({"node": uni}))
    got = {r.node: r.rank for r in pagerank(
        _edges(spark, pairs), n_iter=5, node_universe=uni_df).collect()}
    assert got == _reference_with_universe(pairs, uni, 5)
    assert "x" in got and "y" in got and got["x"] == got["y"]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)
    # without the universe, isolated nodes are absent (documented)
    got0 = {r.node: r.rank for r in pagerank(
        _edges(spark, pairs), n_iter=5).collect()}
    assert "x" not in got0


def test_pagerank_early_stop_converges(spark):
    """tol early stop: on a quickly-converging cycle, a big n_iter
    budget with tol stops early and matches the fully-iterated result
    to the tolerance; tol=None (q57 mode) is untouched fixed-iteration."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")]
    full = {r.node: r.rank for r in pagerank(
        _edges(spark, pairs), n_iter=40).collect()}
    stopped = {r.node: r.rank for r in pagerank(
        _edges(spark, pairs), n_iter=40, tol=1e-7).collect()}
    for v in full:
        assert stopped[v] == pytest.approx(full[v], abs=1e-5)
    # and the early-stop path really is cheaper than the budget: the
    # same tol on an already-uniform graph stops after iteration 1
    uni = {r.node: r.rank for r in pagerank(
        _edges(spark, [("a", "b"), ("b", "a")]), n_iter=50,
        tol=1e-6).collect()}
    assert uni == {"a": pytest.approx(0.5), "b": pytest.approx(0.5)}
