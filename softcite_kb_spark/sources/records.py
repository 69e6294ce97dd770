"""Blank-line-separated key:value record source (reference S3).

The CRAN ``PACKAGES`` file format (cran_import.py:50-73,180-196): records
separated by blank lines, fields as ``Key: value`` with RFC-822-style
continuation lines. The reference splits on "\\n\\n" in driver Python;
here ``spark.read.text(lineSep="\\n\\n")`` gives one record per row and
the field parse is native SQL (split + regexp + map), fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kv_records(
    spark: SparkSession, path: str, keys: list[str] | None = None
) -> DataFrame:
    """Parse blank-line-separated records into (record_idx, fields map).

    Continuation lines (leading whitespace) are folded into the previous
    field with a space, mirroring import_common.py's clean_field collapse.
    If ``keys`` is given, each key is also projected to its own column.
    """
    raw = spark.read.text(path, lineSep="\n\n")
    rec = (
        raw.filter(F.length(F.trim("value")) > 0)
        .withColumn("record_idx", F.monotonically_increasing_id())
        # fold continuation lines: newline + indent -> single space
        .withColumn("flat", F.regexp_replace("value", r"\n[ \t]+", " "))
        .withColumn("lines", F.split("flat", "\n"))
        .withColumn(
            "entries",
            F.filter(
                F.transform(
                    "lines",
                    lambda l: F.struct(
                        F.trim(F.regexp_extract(l, r"^([^:]+):", 1)).alias("key"),
                        F.trim(F.regexp_extract(l, r"^[^:]+:\s*(.*)$", 1)).alias("val"),
                    ),
                ),
                lambda kv: kv["key"] != "",
            ),
        )
        # first occurrence wins on repeated keys: map_from_entries' default
        # EXCEPTION dedup policy would let ONE malformed record (repeated
        # field) kill the whole tolerant scan
        .withColumn(
            "fields",
            F.map_from_entries(F.aggregate(
                "entries",
                F.array().cast("array<struct<key:string,val:string>>"),
                lambda acc, kv: F.when(
                    F.exists(acc, lambda p: p["key"] == kv["key"]), acc
                ).otherwise(F.array_append(acc, kv)),
            )),
        )
        .select("record_idx", "fields")
    )
    if keys:
        for k in keys:
            rec = rec.withColumn(k.lower(), F.col("fields")[k])
    return rec


def parse_dependency_field(col) -> F.Column:
    """Split an R-style dependency list ('pkgA (>= 1.0), pkgB') into bare
    package names. Ref: import_common.py:257-278 (process_dependency_field).
    Native: split on comma, strip version constraints and whitespace.
    """
    return F.filter(
        F.transform(
            F.split(col, ","),
            lambda d: F.trim(F.regexp_replace(d, r"\(.*\)", "")),
        ),
        lambda d: (d != "") & (d != "R"),
    )
