"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane) variant as the scale path: at 100 TB you never cross-
join the corpus with itself — you bucket by hyperplane signs and only score
within buckets (recall traded for a ~2^n_planes fan-in reduction).

Dot products use ``aggregate(zip_with(...))`` higher-order functions —
JVM-side, no UDF. Embedding-cosine near-dup dedup reuses the same kernels.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity rounded to 6 decimals (oracle-comparable).

    Inputs widen to double BEFORE any multiply: float32 products differ
    from the SQL oracle's double products by an ulp, which flips the 6th
    rounded decimal on borderline pairs.
    """
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return F.round(
        _dot(a, b) / F.greatest(_norm(a) * _norm(b), F.lit(1e-12)), 6)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries x corpus, window
    row_number <= k. Queries must be the small side (broadcast explicitly);
    the corpus side streams — no corpus self-shuffle.
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(q),
              F.col(id_col) != F.col(query_id_col))  # exclude self-match
        .withColumn("cos", cosine(F.col(vec_col), F.col("__qv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def _plane_coef(seed: int, p: int, c: int) -> float:
    import hashlib

    h = hashlib.md5(f"{seed}:{p}:{c}".encode()).hexdigest()[:8]
    return (int(h, 16) / 0xFFFFFFFF) * 2.0 - 1.0


# above this many plane coefficients the literal-array expression tree is
# the bottleneck (plan size/codegen, not data) — switch to the Arrow path
_EXPR_COEF_LIMIT = 1024


def hyperplane_signs(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 13,
    impl: str = "auto",
) -> Column:
    """LSH bucket id from random-hyperplane sign bits.

    Hyperplane components are deterministic pseudo-randoms derived from
    md5(seed, plane, coord) — reproducible across engines and runs without
    shipping a plane matrix.

    ``impl``: "expr" embeds the plane matrix as literal arrays — exactly
    SQL-oracle-reproducible, but the expression tree grows with
    n_planes*dim (fine at dim 64, plan blow-up at dim 768/1536);
    "pandas" is an Arrow-batched numpy matmul whose closure carries the
    matrix — O(1) plan size at any dim (matmul association can flip a sign
    only when a dot is within fp-epsilon of the hyperplane, measure-zero
    for real embeddings); "auto" picks by coefficient count.
    """
    if impl == "auto":
        impl = "expr" if n_planes * dim <= _EXPR_COEF_LIMIT else "pandas"
    if impl == "expr":
        # single source of truth for the sign rule: bucket from margins
        # (_bucket_from_dots) over the shared per-plane dots — the same
        # composition multi-probe uses, so the kernels cannot drift
        return _bucket_from_dots(
            hyperplane_dots(vec, dim, n_planes, seed, impl="expr"),
            n_planes)

    import numpy as np

    planes = np.array(
        [[_plane_coef(seed, p, c) for c in range(dim)]
         for p in range(n_planes)])          # n_planes x dim
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("long")
    def signs(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack([
            np.asarray(v, dtype=np.float64) if v is not None
            else np.zeros(dim) for v in vs])
        dp = mat @ planes.T                   # rows x n_planes
        return pd.Series(((dp > 0) @ weights).astype(np.int64))

    return signs(vec)


def hyperplane_dots(
    vec: Column, dim: int, n_planes: int = 8, seed: int = 13,
    impl: str = "auto",
) -> Column:
    """Per-plane dot products as ``array<double>`` — the margins behind
    :func:`hyperplane_signs`'s sign bits. Multi-probe LSH needs them:
    the planes with the smallest |margin| are the ones whose sign a near
    neighbor most plausibly lands on the other side of.

    Same two kernels as ``hyperplane_signs``: literal-array expressions
    (exactly SQL-reproducible — sequential fold, the order an oracle's
    list_dot_product uses) under ``_EXPR_COEF_LIMIT`` coefficients, an
    Arrow matmul above it (matmul association can move a margin by ulps —
    fine for probing, not for an exact-equality oracle).
    """
    if impl == "auto":
        impl = "expr" if n_planes * dim <= _EXPR_COEF_LIMIT else "pandas"
    if impl == "expr":
        v = vec.cast("array<double>")
        return F.array(*[
            _dot(v, F.array(*[F.lit(_plane_coef(seed, p, c))
                              for c in range(dim)]))
            for p in range(n_planes)])

    import numpy as np

    planes = np.array(
        [[_plane_coef(seed, p, c) for c in range(dim)]
         for p in range(n_planes)])

    @F.pandas_udf("array<double>")
    def dots(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        mat = np.stack([
            np.asarray(v, dtype=np.float64) if v is not None
            else np.zeros(dim) for v in vs])
        dp = mat @ planes.T
        return pd.Series(list(dp))

    return dots(vec)


def _bucket_from_dots(dots: Column, n_planes: int) -> Column:
    """Bucket id from a margin array: bit p set iff dots[p] > 0 —
    bit-identical to ``hyperplane_signs`` on the same planes."""
    b = F.lit(0).cast("long")
    for p in range(n_planes):
        b = b + F.when(F.element_at(dots, p + 1) > 0,
                       F.lit(1 << p)).otherwise(F.lit(0))
    return b


def probe_buckets(dots: Column, n_planes: int, n_probe: int) -> Column:
    """Multi-probe bucket list: the base bucket plus single-bit flips of
    the ``n_probe - 1`` smallest-|margin| planes (ties by plane index).

    Rationale (Lv et al., multi-probe LSH): a true neighbor that missed
    the query's bucket most likely differs on the plane the query itself
    barely cleared — probing those adjacent buckets recovers most of the
    recall a single probe loses, without growing the corpus-side index.
    Margins are rounded to 9 decimals before ranking so the probe order
    is reproducible in a SQL oracle (double ulps can't flip it).
    """
    if n_probe < 1 or n_probe > n_planes + 1:
        raise ValueError(
            f"n_probe must be in [1, n_planes + 1 = {n_planes + 1}] "
            f"(base bucket + at most one flip per plane), got {n_probe}")
    base = _bucket_from_dots(dots, n_planes)
    if n_probe == 1:
        return F.array(base)
    weights = F.array(*[F.lit(1 << p).cast("long") for p in range(n_planes)])
    ranked = F.transform(
        F.array_sort(F.transform(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda p: F.struct(
                F.round(F.abs(F.element_at(dots, p + 1)), 9).alias("m"),
                p.alias("p")))),
        lambda s: s["p"])
    flips = F.slice(ranked, 1, n_probe - 1)
    return F.concat(
        F.array(base),
        F.transform(flips,
                    lambda p: base.bitwiseXOR(F.element_at(weights, p + 1))))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only within the query's hyperplane
    bucket(s). Equi-join on bucket replaces the cross join — the 100 TB
    path. Recall loss is the LSH trade; lower n_planes = bigger buckets =
    higher recall.

    ``n_probe`` > 1 kills the single-probe recall cliff: each query also
    probes the buckets reached by flipping its ``n_probe - 1``
    smallest-|margin| sign bits (:func:`probe_buckets`) — the QUERY side
    fans out (small, broadcast), the corpus index stays one bucket per
    row. A corpus row can match a query through at most one probe
    (buckets are distinct), so no post-join dedup is needed.
    """
    cb = corpus.withColumn(
        "bucket", hyperplane_signs(F.col(vec_col), dim, n_planes))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    if n_probe == 1:
        qb = q.withColumn(
            "bucket", hyperplane_signs(F.col("__qv"), dim, n_planes))
    else:
        qb = (
            q.withColumn("__dots",
                         hyperplane_dots(F.col("__qv"), dim, n_planes))
            .withColumn("bucket", F.explode(
                probe_buckets(F.col("__dots"), n_planes, n_probe)))
            .drop("__dots")
        )
    scored = (
        cb.select(id_col, vec_col, "bucket")
        .join(F.broadcast(qb), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cos", cosine(F.col(vec_col), F.col("__qv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def _assign_cells(corpus: DataFrame, cents: DataFrame,
                  id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cell_id): each corpus vector joined to its nearest
    centroid — broadcast argmax cosine with a deterministic tiebreak."""
    scored_cells = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(cents))
        .withColumn("__ccos", cosine(F.col(vec_col), F.col("__cv")))
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.desc("__ccos"), F.asc("cell_id"))
    return (
        scored_cells.withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cell_id")
    )


def refine_centroids(
    corpus: DataFrame,
    cents: DataFrame,
    rounds: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materializer=None,
) -> DataFrame:
    """Lloyd refinement of the coarse quantizer, distributed: assign ->
    per-(cell, coordinate) mean (posexplode + groupBy, never a driver
    loop) -> rebuilt centroid arrays. Means are rounded to 6 decimals so
    the refined centroids are deterministic across partitionings (double
    summation order only moves the last ulps). Cells that lose all
    members keep their previous centroid.

    ``materializer``: per-round lineage barrier (see
    softcite_kb_spark.materialize) — localCheckpoint by default, a
    fault-tolerant scratch-table persist on a cluster.
    """
    from softcite_kb_spark.materialize import local_checkpoint_materializer

    mat = materializer or local_checkpoint_materializer
    for _ in range(rounds):
        assigned = _assign_cells(corpus, cents, id_col, vec_col)
        coords = assigned.select(
            "cell_id",
            F.posexplode(F.col(vec_col).cast("array<double>"))
            .alias("pos", "x"))
        means = (
            coords.groupBy("cell_id", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cell_id")
            .agg(F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("__new"))
        )
        cents = mat(
            cents.join(means, "cell_id", "left")
            .select("cell_id",
                    F.coalesce("__new",
                               F.col("__cv").cast("array<double>"))
                    .alias("__cv"))
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    n_probe: int = 2,
    k: int = 5,
    lloyd_rounds: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    materializer=None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into cells,
    score each query only against its ``n_probe`` nearest cells.

    The coarse quantizer starts from DETERMINISTIC seed centroids — the
    corpus vectors with the ``n_cells`` smallest ids (engine-reproducible,
    which is what lets the q40 oracle rebuild the whole search in SQL) —
    optionally refined with ``lloyd_rounds`` distributed k-means rounds
    (:func:`refine_centroids`; better cell balance, same plan shape).
    Every step is a DataFrame op: centroid assignment is a broadcast-join
    argmax, the probe set is a per-query top-n_probe window, and scoring
    is an equi-join on cell id — the corpus is never self-joined or
    cross-joined.

    Recall/latency knobs mirror FAISS IVF: more cells = smaller candidate
    lists; more probes = higher recall. Complements :func:`lsh_topk`
    (hyperplane buckets) as the second ANN scale path.
    """
    cents = (
        corpus.select(F.col(id_col).alias("cell_id"),
                      F.col(vec_col).alias("__cv"))
        .orderBy(F.asc("cell_id"))
        .limit(n_cells)
    )
    if lloyd_rounds > 0:
        cents = refine_centroids(corpus, cents, lloyd_rounds,
                                 id_col=id_col, vec_col=vec_col,
                                 materializer=materializer)
    assigned = _assign_cells(corpus, cents, id_col, vec_col)
    # queries -> top-n_probe cells
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    q_cells = (
        q.join(F.broadcast(cents))
        .withColumn("__ccos", cosine(F.col("__qv"), F.col("__cv")))
    )
    w_probe = Window.partitionBy(query_id_col).orderBy(
        F.desc("__ccos"), F.asc("cell_id"))
    probes = (
        q_cells.withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select(query_id_col, "__qv", "cell_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cos", cosine(F.col(vec_col), F.col("__qv")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 1,
    seed: int = 13,
    max_bucket: int = 0,
    materializer=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucket self-join.

    ``n_tables`` > 1 is the recall lever (standard multi-table LSH): each
    table hashes with an independent plane set (seed offset), candidate
    pairs union across tables and dedupe BEFORE scoring — a true pair
    missed by one table's split is caught by another, and no pair is
    scored twice. Plan shape: ALL tables' buckets come from one
    projection (posexplode over an array of bucket ids, one corpus scan
    behind a self-join barrier), matched by a single equi-join on
    (table, bucket) — not one self-join per table. ``materializer`` is
    the self-join barrier (see softcite_kb_spark.materialize).

    ``max_bucket`` (same skew guard as ``dedup.lsh_candidate_pairs``,
    groupBy-count + anti-join — never a window): a corpus of
    near-identical embeddings that survives exact dedup lands in one
    hyperplane bucket and the self-join goes quadratic; oversized
    buckets are dropped. Default 0 = DISABLED — a silent default cap
    would drop true near-dup pairs in a bucket-heavy corpus with no
    signal (the repo's no-silent-caps rule); opt in explicitly at
    scale.
    """
    from softcite_kb_spark.operators.dedup import cap_buckets

    from softcite_kb_spark.materialize import local_checkpoint_materializer

    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    if n_tables == 1:
        # single table: carry vectors through the one self-join — no
        # candidate dedup, no vector re-join needed. The barrier matters
        # doubly here: the capped plan is consumed by the cap's own
        # count/anti-join branches AND both self-join sides — without it
        # the hyperplane projection would run up to 4x.
        b = df.select(id_col, vec_col).withColumn(
            "bucket", hyperplane_signs(F.col(vec_col), dim, n_planes,
                                       seed=seed))
        b = (materializer or local_checkpoint_materializer)(
            cap_buckets(b, ["bucket"], max_bucket))
        l, r = b.alias("l"), b.alias("r")
        return (
            l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .withColumn("cos", cosine(F.col(f"l.{vec_col}"),
                                      F.col(f"r.{vec_col}")))
            .filter(F.col("cos") >= threshold)
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"), "cos")
        )

    buckets = F.array(*[
        hyperplane_signs(F.col(vec_col), dim, n_planes, seed=seed + 101 * t)
        for t in range(n_tables)])
    bt = df.select(
        F.col(id_col),
        F.posexplode(buckets).alias("tbl", "bucket"))
    bt = cap_buckets(bt, ["tbl", "bucket"], max_bucket)
    bt = (materializer or local_checkpoint_materializer)(bt)
    l, r = bt.alias("l"), bt.alias("r")
    cand = (
        l.join(r, (F.col("l.tbl") == F.col("r.tbl"))
               & (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
