"""Export-boundary format converters (reference P8, kb/converter.py).

Internally the engine keeps the *statement-row* schema
(canonical_id, prop, value, datatype, source, count) — columnar, prunable,
aggregation-native (SURVEY.md 7.0). The reference's nested Wikidata-style
claim documents exist only at the export boundary, produced here:

  * to_claims_json — statements re-nested into
    {"P<prop>": [{value, datatype, references: [{P248: source, count}]}]}
    (internal format, kb/converter.py:126-323 direction)
  * to_simple — property/entity ids replaced by names via a broadcast
    naming dimension (kb/converter.py:21-124; naming KV store
    common/arango_common.py:122-201)
  * codemeta-style projection — best value per mapped property
    (kb/converter.py:392-441) reusing A10 best-value selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from softcite_kb_spark.queries.api_queries import best_value_per_property


def build_claims(statements: DataFrame,
                 entity_col: str = "canonical_id") -> DataFrame:
    """(entity_id, claims) — the nested claims column shared by
    :func:`to_claims_json` and :func:`to_wikidata`.

    Two-level re-nest: statements -> per-prop arrays -> prop-keyed map ->
    JSON. All native (collect_list / map_from_entries / to_json); order is
    made deterministic by sort_array on (prop) and (value) keys.

    When the input carries a ``qualifiers`` column (fold_statements emits
    turn-position provenance under P2677), each claim value is rendered
    with the reference's qualifier shape
    ``[{"P2677": {"value": ..., "datatype": ...}}]``
    (populate_from_mentions.py:288-297).
    """
    has_quals = "qualifiers" in statements.columns
    fields = [
        F.col("value"),
        F.col("datatype"),
        F.array(F.struct(
            F.col("source").alias("P248"),
            F.col("count").alias("count"),
        )).alias("references"),
    ]
    if has_quals:
        # keep qualifiers as array<struct> through the sort (sort_array
        # cannot order structs containing MAP); re-shape to the reference's
        # [{"P2677": {...}}] map form AFTER sorting, below
        fields.append(F.col("qualifiers"))
    per_stmt = statements.select(
        F.col(entity_col).alias("entity_id"),
        "prop",
        F.struct(*fields).alias("stmt"),
    )
    per_prop = (
        per_stmt.groupBy("entity_id", "prop")
        .agg(F.sort_array(F.collect_list("stmt")).alias("stmts"))
    )
    out = (
        per_prop.groupBy("entity_id")
        .agg(F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("prop", "stmts")))
        ).alias("claims"))
    )
    if has_quals:
        # both sorts are done — now reshape each qualifier struct into the
        # reference's per-claim [{"P2677": {value, datatype}}] map form
        out = out.withColumn(
            "claims",
            F.transform_values(
                "claims",
                lambda _, stmts: F.transform(
                    stmts,
                    lambda s: F.struct(
                        s["value"].alias("value"),
                        s["datatype"].alias("datatype"),
                        s["references"].alias("references"),
                        F.transform(
                            s["qualifiers"],
                            lambda q: F.map_from_entries(F.array(F.struct(
                                q["prop"].alias("key"),
                                F.struct(
                                    q["value"].alias("value"),
                                    q["datatype"].alias("datatype"),
                                ).alias("val"),
                            ))),
                        ).alias("qualifiers"),
                    ))))
    return out


def to_claims_json(statements: DataFrame,
                   entity_col: str = "canonical_id") -> DataFrame:
    """(entity_id, claims_json) — one nested Wikidata-style claim doc each
    (internal format, kb/converter.py:126-323 direction)."""
    return (
        build_claims(statements, entity_col)
        .withColumn("claims_json", F.to_json("claims"))
        .select("entity_id", "claims_json")
    )


def to_wikidata(nodes: DataFrame, statements: DataFrame,
                entity_col: str = "canonical_id") -> DataFrame:
    """Vanilla-Wikidata entity export (convert_to_wikidata,
    kb/converter.py:64-116): the engine's simplified English-only fields
    are re-expanded to language level — labels/descriptions/aliases each
    wrapped under an "en" key exactly like _expend_element
    (converter.py:117-124) — claims are nested as in the claims doc, and
    ``type`` is fixed to "item". Returns (entity_id, entity_json).
    """
    claims = build_claims(statements, entity_col)
    n = nodes.select(
        F.col(entity_col).alias("entity_id"),
        F.col("label"),
        F.col("aliases") if "aliases" in nodes.columns
        else F.array().cast("array<string>").alias("aliases"),
        F.col("description") if "description" in nodes.columns
        else F.lit(None).cast("string").alias("description"),
    )
    doc = (
        n.join(claims, "entity_id", "left")
        .select(
            "entity_id",
            F.to_json(F.struct(
                F.col("entity_id").alias("id"),
                F.lit("item").alias("type"),
                F.create_map(F.lit("en"), F.col("label")).alias("labels"),
                F.when(
                    F.col("description").isNotNull(),
                    F.create_map(F.lit("en"), F.col("description")),
                ).alias("descriptions"),
                F.create_map(
                    F.lit("en"),
                    F.coalesce("aliases", F.array().cast("array<string>")),
                ).alias("aliases"),
                F.col("claims"),
            )).alias("entity_json"),
        )
    )
    return doc


def to_simple(statements: DataFrame, naming: DataFrame,
              entity_col: str = "canonical_id") -> DataFrame:
    """Replace prop/value ids with human names via the naming dimension.

    ``naming(id, name)`` is the analog of the reference's naming KV store —
    a small curated table, broadcast (never the shuffle partner of the
    statement fact table).

    The reference's conversion is RECURSIVE over the nested doc
    (convert_to_simple_format, kb/converter.py:21-62: every key and string
    value at any depth gets a naming lookup) — here the statements are
    columnar, so recursion reduces to one more level: when a ``qualifiers``
    column is present, qualifier props and values are renamed too
    (explode -> broadcast join -> regroup keyed on a deterministic
    statement hash, preserving qualifier order).
    """
    has_quals = "qualifiers" in statements.columns
    # regroup key from the RAW identifiers (pre-rename): two distinct raw
    # values whose names collide after the naming join must NOT exchange
    # qualifier lists. Encoded via to_json, not concat_ws — concat_ws
    # SKIPS NULL components and does not escape the separator, so
    # (NULL,'x') would collide with ('x',NULL) and 'V\\x1fS' with
    # 'V'+'S'. source/count disambiguate same-(prop,value) rows; exact
    # duplicate raw rows share a key (their identical qualifier rows are
    # deduped before the regroup below). The qualifiers array itself is
    # part of the key: two rows identical on every scalar field but
    # carrying DIFFERENT qualifier lists are distinct statements
    # (fold_statements can't emit such rows, but to_simple is a public
    # API) — without it they'd collide and dropDuplicates would assign
    # one arbitrary list to both.
    raw_key_cols = [F.col(entity_col).alias("e"), F.col("prop").alias("p"),
                    F.col("value").alias("v")]
    for extra in ("source", "count"):
        if extra in statements.columns:
            raw_key_cols.append(F.col(extra).alias(extra))
    if has_quals:
        raw_key_cols.append(F.col("qualifiers").alias("q"))
    raw_sid = F.sha2(F.to_json(F.struct(*raw_key_cols)), 256)
    if has_quals:
        statements = statements.withColumn("__sid", raw_sid)
    prop_names = F.broadcast(naming.select(
        F.col("id").alias("prop"), F.col("name").alias("prop_name")))
    value_names = F.broadcast(naming.select(
        F.col("id").alias("value"), F.col("name").alias("value_name")))
    base = (
        statements
        .join(prop_names, "prop", "left")
        .join(value_names, "value", "left")
        .select(
            F.col(entity_col).alias("entity_id"),
            F.coalesce("prop_name", "prop").alias("property"),
            F.coalesce("value_name", "value").alias("value"),
            "count",
            *(["__sid", "qualifiers"] if has_quals else []),
        )
    )
    if not has_quals:
        return base
    # exact duplicate raw rows share a __sid — dedupe BEFORE exploding so
    # the regrouped list isn't doubled. (An array_distinct on the final
    # list would instead silently drop legitimately repeated qualifiers
    # WITHIN one statement.)
    q = base.select("__sid", "qualifiers").dropDuplicates(["__sid"]).select(
        "__sid", F.posexplode("qualifiers").alias("pos", "q"))
    qp = F.broadcast(naming.select(
        F.col("id").alias("qprop"), F.col("name").alias("qprop_name")))
    qv = F.broadcast(naming.select(
        F.col("id").alias("qval"), F.col("name").alias("qval_name")))
    qn = (
        q.select("__sid", "pos",
                 F.col("q.prop").alias("qprop"),
                 F.col("q.value").alias("qval"),
                 F.col("q.datatype").alias("qdt"))
        .join(qp, "qprop", "left")
        .join(qv, "qval", "left")
        .groupBy("__sid")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct(
                F.col("pos"),
                F.struct(
                    F.coalesce("qprop_name", "qprop").alias("prop"),
                    F.coalesce("qval_name", "qval").alias("value"),
                    F.col("qdt").alias("datatype"),
                ).alias("q")))),
            lambda s: s["q"]).alias("qualifiers_named"))
    )
    return (
        base.drop("qualifiers")
        .join(qn, "__sid", "left")
        .withColumn(
            "qualifiers",
            F.coalesce(
                "qualifiers_named",
                F.array().cast(
                    "array<struct<prop:string,value:string,datatype:string>>")))
        .drop("__sid", "qualifiers_named")
    )


def to_codemeta(statements: DataFrame,
                property_map: dict[str, str],
                source_priority: list[str],
                entity_col: str = "canonical_id") -> DataFrame:
    """Codemeta-style flat projection: one best value per mapped property.

    Ref: kb/converter.py:392-441 — property-mapped projection with
    _select_best_value; here the A10 window picks the value, then a pivot
    lands one column per codemeta field.
    """
    mapped = statements.filter(
        F.col("prop").isin(*property_map.keys()))
    best = best_value_per_property(mapped, source_priority,
                                   entity_col=entity_col)
    m = F.create_map(*[x for kv in property_map.items()
                       for x in (F.lit(kv[0]), F.lit(kv[1]))])
    best = best.withColumn("codemeta_field", m[F.col("prop")])
    return (
        best.groupBy(F.col(entity_col).alias("entity_id"))
        .pivot("codemeta_field", list(dict.fromkeys(property_map.values())))
        .agg(F.first("value"))
    )
