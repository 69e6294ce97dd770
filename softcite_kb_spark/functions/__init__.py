"""Column-level function library (JVM-side, codegen-friendly).

Spark-first re-expressions of the reference's per-row Python string helpers
(SURVEY.md section 2.8). Nothing here is a Python UDF.
"""

from softcite_kb_spark.functions.text import (  # noqa: F401
    block_key,
    capitalized_variant,
    clean_field,
    hyphen_variant,
    is_number,
    norm_name,
    title_author_key,
)
