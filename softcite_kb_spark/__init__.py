"""softcite_kb_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
``softcite/softcite_kb`` (read-only at /root/reference), re-targeted onto
multi-turn conversation / agent transcripts stored as Iceberg/parquet tables:

  stage 1  mention detection + (subj, pred, obj) triple extraction
           (reference analog: software-mention import + populate_from_mentions)
  stage 2  entity linking / disambiguation against curated authority tables
           (reference analog: merging/merge.py candidate lookups + voting,
            kb/knowledge_base.py:404-494)
  stage 3  canonicalization via connected components + statement-fold merge,
           node/edge materialization with lineage + metrics
           (reference analog: populate_staging_area.py:899-1030 union-find +
            kb/knowledge_base.py conflation)

Everything is DataFrame-first: Catalyst plans the joins/aggregations; custom
logic is vectorized pandas/Arrow UDFs only where builtins cannot express the
semantics. Designed for 1000-executor / 100 TB scale (partition by conv_id,
broadcast small authority dims, salt skewed blocking keys, AQE on), tested on
local[N].
"""

__version__ = "0.1.0"

from softcite_kb_spark.session import get_spark  # noqa: F401
