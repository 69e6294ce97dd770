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
