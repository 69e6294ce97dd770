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
    # skip the array brackets of Wikidata-style dumps
    parsed = (
        raw.select(line.alias("line"))
        .filter(~F.col("line").isin("[", "]"))
        .filter(F.length(F.trim("line")) > 0)
        .withColumn("entity", F.from_json("line", schema))
    )
    # PERMISSIVE from_json yields an all-null struct (not NULL) on corrupt
    # input — flag a line as corrupt when every top-level field is null
    all_null = F.lit(True)
    for f in schema.fieldNames():
        all_null = all_null & F.col("entity").getField(f).isNull()
    parsed = parsed.withColumn(
        "_corrupt",
        F.when(F.col("entity").isNull() | all_null, F.col("line")))
    return parsed.select(
        F.when(F.col("_corrupt").isNull(), F.col("entity")).alias("entity"),
        "_corrupt")


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
