"""SparkSession factory with scale-appropriate defaults.

Local mode here (single JVM); on a real cluster the same config block applies
minus master/driver-memory (spark-submit --py-files per BASELINE.json
north_rule). AQE is on so skewed shuffle partitions get split at runtime
(the reference's answer to hot software names was a hard 20k-context cap,
kb_es_indexing.py:21 — we let AQE + explicit salting handle it instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "softcite_kb_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale you would size this to ~2-3x total executor cores instead.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = os.cpu_count() or 32 if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-scale fidelity: the test/bench parquet files are a few MB;
        # the 128 MB default packs each into ONE split and serializes the
        # whole scan on one core. 8 MB splits keep small-file runs parallel;
        # at real cluster scale inputs are many-hundreds-of-files and this
        # only adds harmless extra splits.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        # ...and ask for at least one split per core even when the input is
        # a single small file (advisory; Spark splits parquet by row group)
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (needed between parallelism levels in bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # Spark keeps a defaultSession reference; clear it so a new master takes.
    try:  # pragma: no cover - defensive
        SparkSession.builder._options = {}
    except Exception:
        pass
