"""Structured-Streaming transcript ingestion (beyond-parity).

The reference is strictly batch (SURVEY.md 2.9): its "incremental update"
is an idempotent re-run. This module is the streaming *ingest* path a
live transcript firehose would use — micro-batch extraction into the same
snapshot tables the batch pipeline owns, so downstream stages (linking,
canonicalization) stay batch over consistent snapshots:

  readStream (parquet dir) -> watermark on ts -> stage-1 extraction per
  micro-batch (foreachBatch: the extraction operator is already pure
  DataFrame->DataFrame, so batch and streaming share one code path) ->
  append to the triples table; plus a windowed per-conversation turn-rate
  aggregate as the monitoring stream.

Tests drive it with trigger(availableNow=True) — processes everything
currently in the directory then stops, deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_extract_triples(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    blacklist=None,
):
    """Micro-batch stage-1: foreachBatch reuses the batch extraction
    operator verbatim — one implementation, two execution modes. Appends
    parquet per batch; exactly-once via the streaming checkpoint."""
    from softcite_kb_spark.operators.extraction import extract_triples

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (extract_triples(batch_df, blacklist)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    return (
        stream.writeStream
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def conversation_turn_rates(
    stream: DataFrame,
    watermark: str = "10 minutes",
    window_len: str = "5 minutes",
):
    """Watermarked tumbling-window turn counts per conversation — the
    late-data-tolerant monitoring aggregate (event time = ts)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("win"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "conv_id", "n_turns",
        )
    )


def run_turn_rate_stream(stream: DataFrame, out_dir: str,
                         checkpoint_dir: str):
    rates = conversation_turn_rates(stream)
    return (
        rates.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
