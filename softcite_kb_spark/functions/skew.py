"""Skew-aware join helpers (SURVEY.md section 4: optional salted-join
library function — a DataFrame program, not a planner extension).

The reference's answer to hot keys was truncation
(MAX_INDEXED_CONTEXTS_PER_SOFTWARE = 20000, kb_es_indexing.py:21) and
known-slow short-name merges (merge.py:186-189). Here:

  * ``salted_join`` — classic salting: the skewed (fact) side gets a random
    salt in [0, S); the small side is exploded S times; the join key becomes
    (key, salt), splitting each hot key's row group across S reducers.
  * ``hot_key_split_join`` — broadcast the hot-key subset, shuffle-join the
    tail: one aggregate to find hot keys, then a union of a broadcast join
    (hot) and a plain join (cold). Useful when the dim side is too big to
    broadcast whole but its hot slice is tiny.

AQE's skew-join handles most sort-merge cases automatically (enabled in
session.py); these helpers cover aggregations-after-join and hash joins
AQE won't split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the skewed side salted and the small side replicated.

    The small side grows x salt_buckets — keep it genuinely small. The
    salt column is internal and dropped from the result. ``rand`` is seeded
    per-partition by Spark; determinism of the *result set* is unaffected
    (only row placement changes).

    Only skewed-side-preserving joins are valid: under right/full outer an
    UNMATCHED small-side row would survive once per salt replica
    (salt_buckets duplicate null-extended rows) — rejected explicitly.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not "
            f"{how!r}: the replicated small side duplicates unmatched rows "
            f"under right/full outer semantics")
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = salted.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold`` (one aggregate pass)."""
    return (
        df.groupBy(key).count()
        .filter(F.col("count") > threshold)
        .select(key)
    )


def hot_key_split_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    threshold: int = 100_000,
    how: str = "inner",
) -> DataFrame:
    """Split-plan join: broadcast the dim rows for hot keys, shuffle the rest.

    fact rows with hot keys join against a broadcast of the (small) hot
    slice of dim; the cold tail takes the normal shuffle join. The union of
    both halves is the complete result. Requires ``how`` in
    (inner, left) — the split preserves those semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError("hot_key_split_join supports inner/left only")
    hot = F.broadcast(hot_keys(fact, key, threshold))
    fact_hot = fact.join(hot, key, "left_semi")
    fact_cold = fact.join(hot, key, "left_anti")
    dim_hot = dim.join(hot, key, "left_semi")
    joined_hot = fact_hot.join(F.broadcast(dim_hot), key, how)
    joined_cold = fact_cold.join(dim, key, how)
    return joined_hot.unionByName(joined_cold)
