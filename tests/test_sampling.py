"""Deterministic splitting + token-budget packing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark.operators import sampling as sp


def _docs(spark, n=2000):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n),
        "n_tokens": [(i * 37) % 90 + 10 for i in range(n)],
    }))


def test_hash_split_proportions_and_determinism(spark):
    d = _docs(spark)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = sp.hash_split(d, w).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # pure function of the key: repartitioned input, identical assignment
    b = {r.doc_id: r.split
         for r in sp.hash_split(d.repartition(13), w).collect()}
    a2 = {r.doc_id: r.split for r in sp.hash_split(d, w).collect()}
    assert a2 == b
    with pytest.raises(ValueError, match="sum to 1"):
        sp.hash_split(d, {"train": 0.5})


def test_pack_token_budget_invariants(spark):
    d = _docs(spark, 500)
    budget = 512
    out = sp.pack_token_budget(d, budget, n_shards=8).collect()
    assert len(out) == 500                      # every doc assigned
    rows = sorted(out, key=lambda r: (r.shard, r.doc_id))
    # recompute the offset-packing recurrence per shard and compare
    from collections import defaultdict
    prefix = defaultdict(int)
    for r in rows:
        assert r.bin_idx == prefix[r.shard] // budget
        prefix[r.shard] += r.n_tokens
    # bins never overshoot by a full doc: a bin's START offset is always
    # inside [bin*budget, (bin+1)*budget)
    max_tok = max(r.n_tokens for r in rows)
    from itertools import groupby
    for (shard, b), grp in groupby(rows, key=lambda r: (r.shard, r.bin_idx)):
        tot = sum(r.n_tokens for r in grp)
        assert tot < budget + max_tok
    # determinism across partitionings
    out2 = sp.pack_token_budget(
        _docs(spark, 500).repartition(11), budget, n_shards=8).collect()
    assert (sorted(map(tuple, out)) == sorted(map(tuple, out2)))
    with pytest.raises(ValueError, match="positive"):
        sp.pack_token_budget(d, 0)


def test_stratified_hash_sample_deterministic_and_nested(spark):
    """Per-stratum threshold sampling: deterministic across
    repartitionings, nested across fractions at the same seed,
    fraction-accurate, default_fraction honored, bad fractions raise."""
    import pandas as pd

    from softcite_kb_spark.operators.sampling import stratified_hash_sample

    rows = [(i, ["click", "view", "rare"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "kind"]))
    fr = {"click": 0.5, "view": 0.1}
    got = stratified_hash_sample(df, "kind", fr, key_col="doc_id")
    ids1 = sorted(r.doc_id for r in got.collect())
    ids2 = sorted(r.doc_id for r in stratified_hash_sample(
        df.repartition(17), "kind", fr, key_col="doc_id").collect())
    assert ids1 == ids2 and len(ids1) > 0
    # unmapped stratum dropped by default; kept with default_fraction=1
    kinds = {r.kind for r in got.collect()}
    assert kinds == {"click", "view"}
    all_rare = stratified_hash_sample(
        df, "kind", fr, key_col="doc_id", default_fraction=1.0)
    assert all_rare.filter("kind = 'rare'").count() == 1000
    # fraction accuracy (threshold over a uniform hash)
    n_click = got.filter("kind = 'click'").count()
    n_view = got.filter("kind = 'view'").count()
    assert abs(n_click / 1000 - 0.5) < 0.06
    assert abs(n_view / 1000 - 0.1) < 0.04
    # NESTED: the 10% view-sample is a subset of a 30% one (same seed)
    bigger = {r.doc_id for r in stratified_hash_sample(
        df, "kind", {"view": 0.3}, key_col="doc_id").collect()}
    smaller = {r.doc_id for r in stratified_hash_sample(
        df, "kind", {"view": 0.1}, key_col="doc_id").collect()}
    assert smaller <= bigger
    import pytest as _pt
    with _pt.raises(ValueError, match="fraction"):
        stratified_hash_sample(df, "kind", {"click": 1.5})
    with _pt.raises(ValueError, match="nothing to sample"):
        stratified_hash_sample(df, "kind", {})
