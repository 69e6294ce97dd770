"""Deterministic sampling / splitting / packing for training corpora.

Two operations every pretraining-data pipeline runs after corpus prep:

  * :func:`hash_split` — train/val/test assignment that is a PURE
    FUNCTION of the row key: stable across runs, cluster sizes, and
    re-partitioning (``df.randomSplit`` is none of those — it depends on
    partition layout and sampling order). The unit interval comes from
    the first 8 hex digits of md5(seed, key) — the same engine-
    reproducible hashing the MinHash oracle uses, so a SQL oracle can
    recompute every assignment bit-for-bit.
  * :func:`pack_token_budget` — group documents into fixed-token-budget
    bins ("sequence packing"): documents are sharded by key hash, each
    shard packs independently in deterministic key order, and a doc's
    bin is the budget-quotient of the token PREFIX-SUM before it (offset
    packing: a doc straddling a boundary belongs to the bin its start
    falls in — the convention concat-then-chunk tokenizers use).

Scale notes: hash_split is embarrassingly parallel (no shuffle beyond
what the caller does). pack_token_budget windows over (shard, key) —
NEVER a global ordered window, which would funnel the corpus through one
reducer; shards bound each window's partition, and real pipelines pack
per output shard anyway (each writer emits its own sequence files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def uniform_unit(key: Column, seed: int = 7) -> Column:
    """Deterministic uniform [0, 1) from a key: md5(seed:key) first 8
    hex digits / 2^32 — reproducible in any engine with md5."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(
        float(2 ** 32))


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``weights`` maps split name -> fraction; fractions must sum to 1
    (within 1e-9). Assignment: u = uniform_unit(key) falls into the
    half-open interval of the cumulative weights, in the DICT ORDER
    given (order is part of the contract — document it in the caller).
    Deterministic per key: the same key always lands in the same split,
    across runs and partitionings.
    """
    if not weights:
        raise ValueError("at least one split required")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = uniform_unit(F.col(key_col), seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = u < F.lit(cum)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def pack_token_budget(
    df: DataFrame,
    budget: int,
    n_shards: int = 64,
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
    seed: int = 7,
) -> DataFrame:
    """Assign each document a (shard, bin_idx) for fixed-budget packing.

    Within a shard (hash of key mod ``n_shards``), documents order by
    key; ``bin_idx = floor(prefix_sum_of_tokens_before_this_doc /
    budget)`` — offset packing. Bin token totals can exceed ``budget``
    by at most one document's length minus one (the straddler), never
    undershoot except the shard's last bin. One window per shard, no
    global sort, no driver loop.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_shards <= 0:
        # would otherwise surface as an ANSI modulo-by-zero deep inside
        # a Spark stage, not at call time
        raise ValueError("n_shards must be positive")
    h = F.md5(F.concat_ws(":", F.lit(f"shard{seed}"),
                          F.col(key_col).cast("string")))
    shard = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards))
    w = (Window.partitionBy("shard").orderBy(F.col(key_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    out = (
        df.withColumn("shard", shard)
        .withColumn(
            "__prefix",
            F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
            .cast("long"))
        .withColumn("bin_idx",
                    F.floor(F.col("__prefix") / F.lit(budget)).cast("long"))
        .drop("__prefix")
    )
    return out


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: int = 7,
) -> DataFrame:
    """Deterministic per-stratum subsampling — the training-mix
    operator (downweight boilerplate-heavy strata, upweight rare ones)
    done as a PURE FUNCTION of the row key.

    A row survives iff ``uniform_unit(key) < fraction[stratum]``:

      * NO shuffle, no window, no sort — a filter over the scan, so the
        plan is embarrassingly parallel and a hot stratum cannot funnel
        anything anywhere (the reason this is a threshold test per row,
        not an exact-k ``row_number`` per stratum);
      * stable across runs, cluster sizes and re-partitionings, unlike
        ``df.sampleBy`` (whose draw depends on partition layout);
      * NESTED by construction: because the unit draw depends only on
        (seed, key), the 10% sample is a strict subset of the 20%
        sample at the same seed — grow a mix without resampling what
        was already taken;
      * strata absent from ``fractions`` take ``default_fraction``
        (0 = drop, 1 = keep-all);
      * engine-reproducible: md5 arithmetic matches any SQL engine, so
        a DuckDB oracle value-checks every kept row.

    Weighted dataset MIXING is this operator applied to a union: tag
    each source with a stratum label, union, and pass the mix weights
    as fractions.
    """
    if not fractions and default_fraction == 0.0:
        raise ValueError("all fractions are zero — nothing to sample")
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for stratum {k!r} must be in "
                             f"[0, 1], got {v}")
    if fractions:
        frac_map = F.create_map(
            *[x for kv in sorted(fractions.items())
              for x in (F.lit(kv[0]), F.lit(float(kv[1])))])
        frac = F.coalesce(frac_map[F.col(strata_col).cast("string")],
                          F.lit(float(default_fraction)))
    else:
        frac = F.lit(float(default_fraction))
    u = uniform_unit(F.col(key_col), seed=seed)
    return df.filter(u < frac)
