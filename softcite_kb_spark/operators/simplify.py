"""Wikidata-entity simplification projection (reference P3) + cache join (S7/S8).

P3 — `simplify_entity` (common/arango_common.py:432-512): the reference
walks each raw Wikidata JSON document in Python, keeping English-only
labels/descriptions/aliases, collapsing ``mainsnak.datavalue`` to
(value, datatype), reducing wikibase-item values to the bare Q-id, and
dropping properties left empty. Here the same projection is pure nested
Column algebra — ``transform``/``filter`` higher-order functions inside
whole-stage codegen, no Python per row.

Raw input shape (one row per entity):
  id: string
  labels:   map<lang, string>            (already collapsed from {value:..})
  descriptions: map<lang, string>
  aliases:  map<lang, array<string>>
  claims:   map<prop, array<struct<value_id string, value_str string,
                                   datatype string>>>

S7/S8 — md5-keyed HTTP/file caches (harvester.py:20-107,
populate_staging_area.py:560-613): re-expressed as ``cache_join`` — a left
join of requests against a cache table on the md5 key, splitting hits from
misses; enrichment of misses is ingestion-side work, out of engine scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simplify_entities(raw: DataFrame, lang: str = "en") -> DataFrame:
    """English-only projection + snak collapse + empty-property drop."""
    claims = F.map_filter(
        F.transform_values(
            F.col("claims"),
            lambda _k, stmts: F.transform(
                stmts,
                lambda s: F.struct(
                    # wikibase-item collapses to the bare Q-id (P3)
                    F.coalesce(s["value_id"], s["value_str"]).alias("value"),
                    s["datatype"].alias("datatype"),
                ),
            ),
        ),
        lambda _k, stmts: F.size(stmts) > 0,
    )
    return raw.select(
        F.col("id").alias("entity_id"),
        F.col("labels")[lang].alias("label"),
        F.col("descriptions")[lang].alias("description"),
        F.coalesce(F.col("aliases")[lang], F.array()).alias("aliases"),
        claims.alias("claims"),
    ).filter(F.col("label").isNotNull())


def simplify_time_value(col):
    """Wikidata time '+2019-10-25T00:00:00Z' -> date (F11,
    populate_staging_area.py:702-729)."""
    return F.to_date(F.regexp_extract(col, r"\+?(\d{4}-\d{2}-\d{2})", 1))


def cache_join(
    requests: DataFrame,
    cache: DataFrame,
    key_col: str = "url",
) -> tuple[DataFrame, DataFrame]:
    """S7/S8 — split requests into (hits, misses) against an md5-keyed cache.

    ``cache(cache_key, data, success)``; returns (hits with data, misses).
    The reference does one point-lookup per URL (harvester.py:26-48); a
    single left join replaces the loop, and the cache table is the Iceberg
    MERGE target when misses come back enriched.
    """
    keyed = requests.withColumn("cache_key", F.md5(F.col(key_col)))
    joined = keyed.join(cache, "cache_key", "left")
    hits = joined.filter(F.col("success").isNotNull() & F.col("success"))
    misses = joined.filter(F.col("success").isNull()) \
        .select(*requests.columns, "cache_key")
    return hits, misses
