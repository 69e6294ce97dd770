"""Graph analytics over the materialized KG edge table.

:func:`pagerank` — node importance by power iteration, the ranking
signal the reference approximates with citation/mention counts
(kb_es_indexing ranks by n_mentions; SURVEY W1 "informativeness") done
properly over the edge structure.

DataFrame shape per iteration (no RDDs, no driver loops over nodes):
one join edge->rank, one groupBy(dst) partial-agg, one broadcast of the
dangling-mass scalar, one materializer barrier (the same injectable
barrier CC/Lloyd use — localCheckpoint single-JVM, scratch tables on a
cluster). Intermediate ranks round to 9 decimals so a SQL oracle can
unroll the SAME iterations and match bit-for-bit; output rounds to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from softcite_kb_spark.materialize import (
    Materializer, local_checkpoint_materializer)


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    node_universe: DataFrame | None = None,
    tol: float | None = None,
    materializer: Materializer | None = None,
) -> DataFrame:
    """(node, rank) after up to ``n_iter`` power iterations.

    Semantics (the classic formulation): edges dedupe to a simple
    directed graph; every node starts at 1/N; each iteration
    ``rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u)
    + dangling_mass/N)`` where dangling_mass is the rank held by
    zero-out-degree nodes (redistributed uniformly, so total rank stays
    1). Deterministic: intermediate ranks round to 9 decimals.

    ``node_universe`` (optional, first column = node id): nodes that
    exist even without edges. ISOLATED nodes then participate — they
    hold rank (they are dangling, so their mass redistributes) and
    appear in the output — instead of being silently absent, which is
    what deriving N from edge endpoints alone does. The universe is
    unioned with edge endpoints, so an incomplete universe can only add
    nodes, never drop edge traffic.

    ``tol`` (optional): L1 early stop — iteration halts once
    ``sum(|rank - prev_rank|) < tol``. The probe is one scalar agg per
    iteration (same bounded-collect style as CC convergence), so large
    ``n_iter`` budgets don't pay for iterations past convergence.
    Default None keeps the fixed-iteration mode bit-for-bit stable for
    the SQL-unrolled oracle (q57).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    mat = materializer or local_checkpoint_materializer
    e = mat(edges.select(F.col(src).cast("string").alias("src"),
                         F.col(dst).cast("string").alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node"))))
    if node_universe is not None:
        uni_col = node_universe.columns[0]
        nodes = nodes.unionByName(
            node_universe.select(
                F.col(uni_col).cast("string").alias("node"))
            .filter(F.col("node").isNotNull()))
    nodes = mat(nodes.distinct())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = mat(e.groupBy("src").agg(
        F.count("*").cast("double").alias("outdeg")))

    ranks = mat(nodes.withColumn(
        "rank", F.round(F.lit(1.0 / n), 9)))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        dangling = (
            ranks.join(outdeg, ranks.node == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        new_ranks = mat(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + damping * (F.coalesce("c", F.lit(0.0))
                                 + F.col("dm") / n),
                    9).alias("rank"))
        )
        if tol is not None:
            delta = (new_ranks.join(
                ranks.select("node", F.col("rank").alias("__prev")),
                "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__prev")))
                     .alias("d")).collect()[0]["d"]) or 0.0
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("node", F.round("rank", 6).alias("rank"))
