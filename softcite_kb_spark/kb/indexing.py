"""Search-index feed: flatten KB entities for full-text/facet search.

Reference analog: indexing/kb_es_indexing.py (388 LoC) — flattens each
entity into an ES document (labels, authors via actor-edge join, mention
contexts via citation-edge join, languages via naming join, timeline
histogram, and an ``all`` catch-all text field), bulk-indexed in chunks.

Here the flatten is one multi-join DataFrame program writing an
index-feed table (S11's bulk chunking is the sink's concern — a real
deployment points an ES/OpenSearch Spark connector or a search service's
bulk loader at this table). The 20k-contexts-per-software cap
(kb_es_indexing.py:21) becomes an explicit per-entity top-k window —
skew-bounded but deterministic, not silent truncation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def flatten_for_search(
    nodes: DataFrame,
    edges: DataFrame,
    statements: DataFrame,
    max_contexts: int = 20_000,
) -> DataFrame:
    """One flat searchable row per node.

    Columns: canonical_id, label, aliases_text, entity_type, n_mentions,
    langs, rel_counts (map rel->count), contexts_sample, all (concat).
    """
    langs = (
        statements.filter(F.col("prop") == "written_in")
        .groupBy("canonical_id")
        .agg(F.sort_array(F.collect_set("value")).alias("langs"))
    )
    rel_counts = (
        edges.groupBy(F.col("src_id").alias("canonical_id"), "rel")
        .agg(F.sum("count").cast("long").alias("n"))
        .groupBy("canonical_id")
        .agg(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("rel", "n")))).alias("rel_counts"))
    )
    # per-entity top-k contexts (dst surfaces) — the explicit version of the
    # reference's hot-entity truncation cap
    wk = Window.partitionBy("src_id").orderBy(F.desc("count"), F.asc("dst_surface"))
    contexts = (
        edges.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= max_contexts)
        .groupBy(F.col("src_id").alias("canonical_id"))
        .agg(F.sort_array(F.collect_list("dst_surface")).alias("contexts_sample"))
    )
    flat = (
        nodes
        .join(langs, "canonical_id", "left")
        .join(rel_counts, "canonical_id", "left")
        .join(contexts, "canonical_id", "left")
        .withColumn("aliases_text", F.concat_ws(" ", "aliases"))
        .withColumn(
            "all",
            F.concat_ws(
                " ",
                F.col("label"),
                F.col("aliases_text"),
                F.concat_ws(" ", F.coalesce(
                    F.col("langs"), F.array().cast("array<string>"))),
                F.concat_ws(" ", F.coalesce(
                    F.col("contexts_sample"), F.array().cast("array<string>"))),
            ),
        )
        .select("canonical_id", "label", "aliases_text", "entity_type",
                "n_mentions", "langs", "rel_counts", "contexts_sample", "all")
    )
    return flat


def facets(flat: DataFrame, cols: list[str], k: int = 20) -> DataFrame:
    """ES-style facet aggregations over the search feed
    (doc/example-api.md:33-60: the reference exposes per-field bucket
    counts next to search hits).

    One top-k (value, n) bucket list per requested column; array columns
    (e.g. ``langs``) facet per element. Output:
    (facet, value, n) ranked per facet — the native analog of ES
    ``aggregations``.

    Plan shape (VERDICT r03 #9): ONE scan for ALL facets — each row
    projects a tagged (facet, value) array per requested column, the
    arrays concat, and a single explode feeds one groupBy. A union of
    per-facet branches would re-scan the feed once per facet (at 100 TB,
    N facets = N full scans); the per-facet top-k then runs as a
    row_number window over the COUNTS (cardinality = distinct values,
    not rows — the window is cheap where it is safe).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    if not cols:
        raise ValueError("facets() needs at least one column to facet on")
    fields = {f.name: f.dataType for f in flat.schema.fields}

    def tagged(c: str):
        # factory closes over c (a loop-var default arg would trip the
        # lambda-arity/index trap in higher-order functions)
        if isinstance(fields.get(c), T.ArrayType):
            arr = F.coalesce(F.col(c).cast("array<string>"),
                             F.array().cast("array<string>"))
        else:
            arr = F.array(F.col(c).cast("string"))
        return F.transform(
            arr, lambda v: F.struct(F.lit(c).alias("facet"),
                                    v.alias("value")))

    exploded = (
        flat.select(F.explode(
            F.concat(*[tagged(c) for c in cols])).alias("fv"))
        .select("fv.facet", "fv.value")
        .filter(F.col("value").isNotNull())
    )
    counts = (exploded.groupBy("facet", "value")
              .agg(F.count("*").cast("long").alias("n")))
    w = Window.partitionBy("facet").orderBy(F.desc("n"), F.asc("value"))
    return (counts.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .select("facet", "value", "n"))


def search(flat: DataFrame, query: str, k: int = 10) -> DataFrame:
    """Minimal full-text search over the feed: token-AND match on ``all``
    ranked by n_mentions (the reference delegates this to ES; this is the
    native fallback so the API surface is complete without a sidecar).
    For relevance-ranked results use :func:`rank_tfidf`."""
    cond = F.lit(True)
    for tok in query.lower().split():
        cond = cond & F.lower(F.col("all")).contains(tok)
    return (
        flat.filter(cond)
        .orderBy(F.desc("n_mentions"), F.asc("canonical_id"))
        .limit(k)
    )


def rank_tfidf(df: DataFrame, query: str, k: int = 10,
               id_col: str = "canonical_id",
               text_col: str = "all",
               materializer=None) -> DataFrame:
    """TF-IDF ranked full-text search — the native scoring stand-in for
    the reference's BM25 delegation to ElasticSearch
    (indexing/kb_es_indexing.py:99-115; scoring PARITY with ES is
    explicitly not claimed — this is deterministic tf-idf, engine- and
    oracle-reproducible).

    Model: lowercase alphanumeric tokens; OR-match (a doc scores if it
    contains ANY query term); smoothed idf = ln((N+1)/(df+1)) + 1;
    score = sum over distinct query terms of tf * idf, rounded to 6
    decimals; ties break on id. Plan shape: ONE tokenize+explode scan —
    the per-(doc, term) counts are materialized behind a lazy barrier
    and doc frequency derives from them (one row per doc-term already),
    so the corpus is never re-tokenized; N is a lazy metadata-count
    joined in, not an eager driver job. No self-join, no UDF.
    """
    terms = sorted({t for t in re.split(r"[^a-z0-9]+", query.lower()) if t})
    if not terms:
        raise ValueError("query has no alphanumeric tokens")
    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda t: t != "")).alias("term"))
    if materializer is None:
        from softcite_kb_spark.materialize import (
            local_checkpoint_materializer as materializer)
    tf = materializer(
        toks.filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
        # consumed twice (scores + doc frequency): barrier so the
        # explode pipeline runs once, not once per branch —
        # localCheckpoint by default, a ScratchTableMaterializer on a
        # real cluster (same injection as CC/Lloyd/LSH)
    )
    total = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(total)).select(
        "term",
        (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0
         ).alias("idf"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 6).alias("score"))
    )
    return (scored
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def rank_bm25(df: DataFrame, query: str, k: int = 10,
              id_col: str = "canonical_id", text_col: str = "all",
              k1: float = 1.2, b: float = 0.75,
              materializer=None) -> DataFrame:
    """Okapi BM25 ranked full-text search — the reference's actual ES
    scoring model (kb_es_indexing.py delegates to ES, whose default
    similarity is BM25 with k1=1.2, b=0.75), implemented natively and
    deterministically so a SQL oracle reproduces it bit-for-bit.

    Model: lowercase alphanumeric tokens (same tokenizer as
    :func:`rank_tfidf`); OR-match; per-term
    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (Robertson, the
    non-negative "+1" variant ES/Lucene uses);
    ``score = sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1 - b + b*dl/avgdl))``
    with dl = the doc's token count and avgdl its corpus mean (docs with
    zero tokens included). Rounded to 6 decimals; ties break on id.

    Plan shape — better than the tfidf explode: ONE projection computes
    dl and every query term's tf via array size/filter (no explode, no
    per-doc shuffle at all), materialized behind the injectable barrier
    because it feeds both the stats row and the scores (and because
    Catalyst projection collapse would otherwise re-split the text once
    per term). Corpus stats (N, avgdl, every df_t) reduce to ONE
    single-row aggregate broadcast back — so the whole query is one
    scan + one scalar agg, no shuffle on the big side.
    """
    terms = sorted({t for t in re.split(r"[^a-z0-9]+", query.lower()) if t})
    if not terms:
        raise ValueError("query has no alphanumeric tokens")
    if materializer is None:
        from softcite_kb_spark.materialize import (
            local_checkpoint_materializer as materializer)

    def tf_of(term):
        # factory closes over term (loop-var default args become the
        # element INDEX under higher-order-function arity inspection)
        return F.size(F.filter("__toks", lambda t: t == F.lit(term)))

    per_doc = materializer(
        df.select(
            F.col(id_col),
            F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                     lambda t: t != "").alias("__toks"))
        .select(
            id_col,
            F.size("__toks").cast("double").alias("dl"),
            *[tf_of(t).cast("double").alias(f"tf{i}")
              for i, t in enumerate(terms)]))
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("dl").alias("__avgdl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("double")).alias(f"df{i}")
          for i in range(len(terms))])
    scored = per_doc.crossJoin(F.broadcast(stats))
    contribs = []
    for i in range(len(terms)):
        idf = F.log(F.lit(1.0)
                    + (F.col("__n") - F.col(f"df{i}") + 0.5)
                    / (F.col(f"df{i}") + 0.5))
        tf = F.col(f"tf{i}")
        norm = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
        contribs.append(idf * tf * (k1 + 1.0) / norm)
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    matched = F.greatest(*[F.col(f"tf{i}")
                           for i in range(len(terms))]) > 0 \
        if len(terms) > 1 else F.col("tf0") > 0
    return (scored.filter(matched)
            .select(id_col, F.round(total, 6).alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))
