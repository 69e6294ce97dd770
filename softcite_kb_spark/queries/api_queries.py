"""Read-side query library replicating the reference API semantics.

Each function is the Spark re-expression of an AQL endpoint in
api/router.py (cited per function) over the materialized KB tables
(nodes/edges/statements) — or any DataFrame with the same shape. AQL's
COLLECT/SORT/LIMIT becomes groupBy/orderBy/limit; Catalyst plans top-k as
TakeOrderedAndProject, aggregations as partial+final hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_entities_by_count(
    edges: DataFrame, key: str = "dst_id", n: int = 10,
    weight: str | None = None,
) -> DataFrame:
    """A1 — rank entities by mention/citation count.

    Ref: api/router.py:151-169 (software ranked by #citations):
    ``COLLECT software_id = mention._to WITH COUNT INTO counter
    SORT counter DESC LIMIT n``. Weighted variant sums an edge count col.
    """
    agg = (F.sum(weight) if weight else F.count("*")).cast("long").alias("cnt")
    return (
        edges.groupBy(F.col(key).alias("entity"))
        .agg(agg)
        .orderBy(F.desc("cnt"), F.asc("entity"))
        .limit(n)
    )


def group_into_lists(
    edges: DataFrame, group_key: str, item_key: str, n: int = 10,
) -> DataFrame:
    """A2 — group members into lists with counts, biggest groups first.

    Ref: api/router.py:227-252 (mentions grouped by document,
    ``COLLECT ... INTO mentionsByDocument SORT LENGTH(...) DESC``).
    """
    return (
        edges.groupBy(F.col(group_key).alias("grp"))
        # count(item_key), not count(*): collect_list silently drops NULL
        # items — the reported size must match the list (a count(*) would
        # inflate group ranking by null members)
        .agg(F.sort_array(F.collect_list(item_key)).alias("items"),
             F.count(item_key).cast("long").alias("n_items"))
        .orderBy(F.desc("n_items"), F.asc("grp"))
        .limit(n)
    )


def group_count_distinct(
    df: DataFrame, keys: list[str], distinct_col: str,
) -> DataFrame:
    """A3 — multi-key grouping with DISTINCT member counting.

    Ref: api/router.py:750-769 (references collected per (document,
    source) with dedup), :786-806 (citeas group sizes).
    """
    return (
        df.groupBy(*keys)
        .agg(F.countDistinct(distinct_col).cast("long").alias("n_distinct"),
             F.count("*").cast("long").alias("n_total"))
    )


def neighbors(edges: DataFrame, node_id, direction: str = "out",
              rel: str | None = None) -> DataFrame:
    """J10 — graph-traversal filter: edges by endpoint (+ rel type).

    Ref: api/router.py:209-213 (citations by _to), :326-331 (dependencies
    by _from), :356-361 (reverse dependencies by _to).
    """
    col = "src_id" if direction == "out" else "dst_id"
    out = edges.filter(F.col(col) == node_id)
    if rel:
        out = out.filter(F.col("rel") == rel)
    return out


def two_hop(edges_a: DataFrame, edges_b: DataFrame,
            join_left: str = "dst_id", join_right: str = "src_id") -> DataFrame:
    """J10 — 2-hop traversal as a join chain.

    Ref: kb_es_indexing.py:280-304 (person -> software -> mention contexts,
    nested FOR loops); here ``edges_a ⋈ edges_b`` on the shared endpoint.
    start/end are the NON-join endpoints of each side — derived from the
    join columns, so reverse traversals (join_left='src_id' or
    join_right='dst_id') select the true far endpoints instead of echoing
    the via node.
    """
    start_col = "src_id" if join_left == "dst_id" else "dst_id"
    end_col = "dst_id" if join_right == "src_id" else "src_id"
    a = edges_a.alias("a")
    b = edges_b.alias("b")
    return (
        a.join(b, F.col(f"a.{join_left}") == F.col(f"b.{join_right}"))
        .select(
            F.col(f"a.{start_col}").alias("start_id"),
            F.col(f"a.{join_left}").alias("via_id"),
            F.col(f"b.{end_col}").alias("end_id"),
            F.col("a.rel").alias("rel_a"),
            F.col("b.rel").alias("rel_b"),
        )
    )


def rank_mentions_by_informativeness(
    mentions: DataFrame,
    doc_key: str = "conv_id",
    n_anchors_col: str = "n_anchors",
    snippet_col: str = "snippet",
    k: int = 3,
) -> DataFrame:
    """W1 — per-document top-k mentions by informativeness.

    Ref: api/utils.py:63-168 — sort desc by #anchored annotations
    (version/publisher/url qualifiers), tie-break desc snippet length.
    """
    w = Window.partitionBy(doc_key).orderBy(
        F.desc(n_anchors_col), F.desc(F.length(snippet_col)),
        F.asc(snippet_col))
    return (
        mentions.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def timeline_histogram(
    events: DataFrame, entity_key: str, ts_col: str, distinct_col: str,
) -> DataFrame:
    """A9 — per-entity yearly histogram of events + distinct sources.

    Ref: kb_es_indexing.py:170-225 (mentions + distinct citing documents
    bucketed by publication year).
    """
    return (
        events.withColumn("year", F.year(ts_col))
        .groupBy(entity_key, "year")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.countDistinct(distinct_col).cast("long").alias("n_distinct"))
    )


def best_value_per_property(
    statements: DataFrame,
    source_priority: list[str],
    entity_col: str = "canonical_id",
    prop_col: str = "prop",
) -> DataFrame:
    """A10 — deterministic best-value selection per (entity, property).

    Ref: kb/converter.py:325-390 (_select_best_value/_rank_values): pick by
    fixed source-priority list, then max observation count, then value.
    ``array_position`` turns the priority list into an orderable rank.
    """
    prio = F.array(*[F.lit(s) for s in source_priority])
    w = Window.partitionBy(entity_col, prop_col).orderBy(
        F.when(F.array_position(prio, F.col("source")) > 0,
               F.array_position(prio, F.col("source")))
        .otherwise(F.lit(len(source_priority) + 1)).asc(),
        F.desc("count"),
        F.asc("value"),
    )
    return (
        statements.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
