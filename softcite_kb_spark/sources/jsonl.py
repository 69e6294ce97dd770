"""JSON-lines dump sources (reference S1/S2).

S1 — Wikidata-style bz2 JSONL dump scan (Wikidata_import.py:126-157): the
reference streams the dump line-by-line in Python, tolerantly parsing each
line after stripping a trailing comma. Here: ``spark.read.text`` (bz2/gz
decompression is transparent) + ``from_json`` with PERMISSIVE semantics —
corrupt lines land in a ``_corrupt`` column instead of killing the scan,
and the parse runs JVM-side in parallel over splits.

S2 — mongoexport JSONL scan (software_mention_import.py:61-130): reads one
JSON object per line and rewrites the Mongo ``_id.$oid`` into a flat key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl_dump(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    strip_trailing_comma: bool = True,
) -> DataFrame:
    """Tolerant JSONL dump reader returning (parsed struct, _corrupt).

    ``strip_trailing_comma`` reproduces the reference's
    ``json.loads(line.rstrip(',\\n'))`` (Wikidata dumps are one giant JSON
    array written line-wise). Lines that still fail to parse have a NULL
    struct and the raw line in ``_corrupt`` — the caller decides whether to
    count, quarantine, or drop them.
    """
    raw = spark.read.text(path)
    line = F.col("value")
    if strip_trailing_comma:
        line = F.regexp_replace(line, r",\s*$", "")
    # corrupt detection via from_json's own PERMISSIVE corrupt-record
    # column: a syntactically VALID line whose fields are simply absent
    # ('{}', '{"id": null}') parses clean — the previous all-fields-null
    # heuristic misclassified those as corrupt. One extra struct field,
    # one parse per output column (the parse is CodegenFallback, so each
    # top-level reference evaluates it once — 2 total here, down from the
    # per-field chain's N+1).
    aug = T.StructType(
        list(schema.fields) + [T.StructField("__corrupt", T.StringType())])
    base = (
        raw.select(line.alias("line"))
        .filter(~F.col("line").isin("[", "]"))
        .filter(F.length(F.trim("line")) > 0)
    )

    # bind the parsed struct as a lambda variable (projection collapse
    # would otherwise re-inline — re-run — the parse once per field ref)
    def build(e):
        return F.struct(
            F.when(
                e["__corrupt"].isNull(),
                F.struct(*[e[f].alias(f) for f in schema.fieldNames()]),
            ).alias("entity"),
            e["__corrupt"].alias("_corrupt"),
        )

    row = F.element_at(
        F.transform(
            F.array(F.from_json(
                "line", aug,
                {"mode": "PERMISSIVE",
                 "columnNameOfCorruptRecord": "__corrupt"})),
            build),
        1)
    return base.select(
        row.getField("entity").alias("entity"),
        row.getField("_corrupt").alias("_corrupt"))


def read_mongoexport(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """mongoexport JSONL: one doc per line, ``_id.$oid`` -> ``_key``.

    Ref: software_mention_import.py:61-130 (rewrites ``doc['_id']['$oid']``
    into the document key before insert). gzip is transparent.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if "_id" in df.columns:
        df = (
            df.withColumn("_key", F.col("_id").getField("$oid"))
            .drop("_id")
        )
    return df


def write_entity_list(df: DataFrame, id_col: str, path: str) -> None:
    """S12 — entity-id line-list sink (Wikidata_import.py:267-327 writes
    ``*.wikidata.entities`` files; knowledge_base.py:490-494 reloads them)."""
    df.select(F.col(id_col).cast("string").alias("value")) \
      .distinct().write.mode("overwrite").text(path)


def read_entity_list(spark: SparkSession, path: str,
                     id_col: str = "entity_id") -> DataFrame:
    return spark.read.text(path).select(F.col("value").alias(id_col))
