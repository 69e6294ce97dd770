"""Cached distributed fetch — the executable analog of the reference's
harvest loops (S5/S7/S8).

Reference: ``importing/harvester.py:20-107`` (md5(url)-keyed file cache,
one sequential HTTP GET per miss) and ``rOpenSci_import.py:50-113`` (the
same loop against a registry API). Those are driver-side Python loops;
here the SAME semantics run distributed and transactional:

  * the cache is a store table keyed by ``md5(url)`` (S7's cache
    collection as an Iceberg/TableStore MERGE target);
  * only cache MISSES fetch, each distinct URL exactly once per call,
    fanned out across ``n_tasks`` partitions (the concurrency knob a
    polite crawler needs — the reference throttles by being serial);
  * fetch results COMMIT to the cache table before anything downstream
    reads them, so the side-effectful fetch happens exactly once per
    miss no matter how many actions consume the returned plan, and a
    crashed run re-fetches only keys whose commit never landed
    (replay-idempotent, like every other commit in this engine);
  * failures are cached too (``success=false``) and are NOT re-fetched
    unless ``retry_failures=True`` — the reference's cache keeps error
    sentinels the same way.

The transport is INJECTABLE (``Callable[[str], bytes]``, raise on
failure): production passes a real HTTP client; this sandbox has no
network, so tests pass a deterministic fake — which is exactly what
makes the loop's semantics (dedup, write-back, idempotence, failure
caching) testable here at all. The per-URL transport call inside
``mapInPandas`` is IO-bound, not a compute kernel — the no-per-row-
Python contract (§2.10) governs CPU paths; a network round-trip per
URL is the operation itself.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CACHE_SCHEMA = T.StructType([
    T.StructField("cache_key", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("success", T.BooleanType()),
])


def fetch_cached(
    requests: DataFrame,
    store,
    transport: Callable[[str], bytes],
    key_col: str = "url",
    cache_table: str = "_fetch_cache",
    n_tasks: int | None = None,
    retry_failures: bool = False,
    materializer=None,
) -> DataFrame:
    """Resolve ``requests[key_col]`` through the md5-keyed cache table,
    fetching misses via ``transport`` and committing them to ``store``
    before returning. Output = request columns + ``cache_key``,
    ``data``, ``success``, ``from_cache`` (False for rows fetched by
    THIS call). Duplicate URLs in the request set fetch once.
    """
    spark = requests.sparkSession
    keyed = requests.withColumn("cache_key", F.md5(F.col(key_col)))
    if store.exists(cache_table):
        cache0 = store.read(spark, cache_table)
    else:
        cache0 = spark.createDataFrame([], CACHE_SCHEMA)
    settled = cache0 if not retry_failures else cache0.filter("success")
    missing = (keyed.select("cache_key", F.col(key_col).alias("url"))
               .distinct()
               .join(settled.select("cache_key"), "cache_key", "left_anti"))

    if not missing.isEmpty():
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"cache_key": [], "url": [], "data": [],
                       "success": []}
                for ck, url in zip(pdf["cache_key"], pdf["url"]):
                    try:
                        data, ok = transport(url), True
                    except Exception:
                        data, ok = None, False
                    out["cache_key"].append(ck)
                    out["url"].append(url)
                    out["data"].append(data)
                    out["success"].append(ok)
                yield pd.DataFrame(out)

        n = n_tasks or spark.sparkContext.defaultParallelism
        fetched = missing.repartition(n).mapInPandas(
            kernel, schema=CACHE_SCHEMA)
        # the fetch plan is SIDE-EFFECTFUL: it must be materialized
        # EAGERLY before merge(), whose upsert references its input on
        # two plan branches (key anti-join + union) and would run every
        # transport call twice. Same injectable barrier as everywhere.
        if materializer is None:
            from softcite_kb_spark.materialize import (
                local_checkpoint_materializer as materializer)
        fetched = materializer(fetched)
        # commit before anything downstream reads: the side effect runs
        # exactly once per miss no matter how many actions consume the
        # returned plan, and a crash re-fetches only uncommitted keys
        store.merge(fetched, cache_table, key_cols=["cache_key"])

    # an empty request set (or an all-hit one against a store whose
    # cache table was never created) must not die on the re-read
    cache = (store.read(spark, cache_table)
             if store.exists(cache_table) else cache0)
    pre = settled.select("cache_key").withColumn("__pre", F.lit(True))
    return (keyed
            .join(cache.select("cache_key", "data", "success"),
                  "cache_key", "left")
            .join(pre, "cache_key", "left")
            .withColumn("from_cache", F.coalesce(F.col("__pre"),
                                                 F.lit(False)))
            .drop("__pre"))
