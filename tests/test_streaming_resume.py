"""Streaming crash/resume: kill a running stream, restart from the Spark
checkpoint, and prove exactly-once output — the streaming analog of the
batch pipeline's resume-from-manifest tests.

Three angles:
  * deterministic checkpoint-state persistence (stop between runs, new
    data arrives, dedup state must survive the restart);
  * a mid-stream kill at a nondeterministic batch boundary (stop() as
    soon as the sink shows output) — whatever batch the kill lands on,
    the restarted stream must converge to the same exactly-once result;
  * replay idempotence of the foreachBatch extraction sink (dynamic
    batch_id partition overwrite absorbs a replayed batch).
"""

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark.operators.extraction import extract_triples
from softcite_kb_spark.operators.textops import fingerprint
from softcite_kb_spark.streaming.ingest import (
    TRANSCRIPT_SCHEMA, read_transcript_stream, run_dedup_stream,
    stream_extract_triples)

TS0 = pd.Timestamp("2024-01-01 00:00:00")


def _write_batch(spark, path, texts, start_idx=0):
    pdf = pd.DataFrame({
        "conv_id": [f"c{start_idx + i}" for i in range(len(texts))],
        "turn_idx": pd.Series([0] * len(texts), dtype="int32"),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": [None] * len(texts),
        "ts": pd.Series([TS0 + pd.Timedelta(seconds=start_idx + i)
                         for i in range(len(texts))]).astype("datetime64[us]"),
    })
    # explicit schema: an all-None 'tool' column must not let pandas
    # inference write a BOOLEAN parquet column under a string reader
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def _await(query, timeout=120):
    assert query.awaitTermination(timeout), "stream did not finish in time"


def test_dedup_state_survives_restart(spark, tmp_path):
    """Fingerprints seen before a stop must still dedupe new arrivals
    after the restart — the state store rides the checkpoint."""
    ind = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    _write_batch(spark, ind, [f"text {i}" for i in range(10)])
    q = run_dedup_stream(read_transcript_stream(spark, ind), out, chk)
    _await(q)
    assert spark.read.parquet(out).count() == 10

    # overlap 5 old + 5 new; the old five must be dropped by RESTORED state
    _write_batch(spark, ind, [f"text {i}" for i in range(5, 15)],
                 start_idx=100)
    q2 = run_dedup_stream(read_transcript_stream(spark, ind), out, chk)
    _await(q2)
    got = spark.read.parquet(out)
    assert got.count() == 15
    fps = got.select(fingerprint(F.col("text")).alias("fp"))
    assert fps.distinct().count() == 15  # every fingerprint exactly once


def test_dedup_stream_killed_midway_resumes_exactly_once(spark, tmp_path):
    """stop() the stream as soon as the first micro-batch lands, restart
    from the checkpoint, and assert the final output is the exact dedup
    of ALL input — no batch lost, no batch applied twice, wherever the
    kill landed."""
    ind = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    # 8 single-file batches; texts repeat mod 12 -> cross-batch duplicates
    for b in range(8):
        _write_batch(spark, ind, [f"t{(b * 5 + i) % 12}" for i in range(5)],
                     start_idx=b * 5)
    q = run_dedup_stream(
        read_transcript_stream(spark, ind, max_files_per_trigger=1),
        out, chk)
    # kill at the first sign of committed output (an arbitrary batch
    # boundary — deliberately not a clean end-of-input)
    deadline = time.time() + 120
    while time.time() < deadline:
        if os.path.isdir(out) and any(
                f.endswith(".parquet") for f in os.listdir(out)):
            break
        time.sleep(0.2)
    q.stop()

    q2 = run_dedup_stream(
        read_transcript_stream(spark, ind, max_files_per_trigger=1),
        out, chk)
    _await(q2)
    got = spark.read.parquet(out)
    fps = got.select(fingerprint(F.col("text")).alias("fp"))
    assert got.count() == 12                 # t0..t11, first-seen only
    assert fps.distinct().count() == 12      # exactly once each


def test_extract_stream_killed_midway_matches_batch(spark, tmp_path):
    """Kill the foreachBatch extraction stream mid-run and restart: the
    final triples table must equal batch-mode extraction over the full
    input (the replayed batch rewrites its own batch_id partition —
    idempotent sink + checkpoint = exactly-once)."""
    ind = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    for b in range(6):
        _write_batch(
            spark, ind,
            [f"Tool{b * 4 + i} depends on Lib{(b * 4 + i) % 7}."
             for i in range(4)],
            start_idx=b * 4)
    q = stream_extract_triples(
        read_transcript_stream(spark, ind, max_files_per_trigger=1),
        out, chk)
    deadline = time.time() + 120
    while time.time() < deadline:
        if os.path.isdir(out) and any(
                e.startswith("batch_id=") for e in os.listdir(out)):
            break
        time.sleep(0.2)
    q.stop()

    q2 = stream_extract_triples(
        read_transcript_stream(spark, ind, max_files_per_trigger=1),
        out, chk)
    _await(q2)

    streamed = spark.read.parquet(out).drop("batch_id")
    batch = extract_triples(spark.read.parquet(ind))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_kg_ingest_stream_matches_batch(spark, tmp_path):
    """Micro-batch KG ingestion (run_kg_ingest_stream): transcripts
    stream into the pipeline's bucketed store batch by batch — including
    a mid-stream kill + checkpoint restart — and after the on-demand
    downstream run the KB equals a from-scratch batch pipeline over the
    same turns."""
    from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig
    from softcite_kb_spark.storage import TableStore
    from softcite_kb_spark.streaming.ingest import run_kg_ingest_stream

    ind = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    for b in range(6):
        _write_batch(
            spark, ind,
            [f"Tool{b * 4 + i} depends on Lib{(b * 4 + i) % 7}."
             for i in range(4)],
            start_idx=b * 4)

    from softcite_kb_spark import datagen

    auth = datagen.build_corpus(n_conversations=5)
    cfg = PipelineConfig(min_vote_total=1, partition_buckets=4)
    st = TableStore(str(tmp_path / "kb"))
    for n in ("authority_entities", "authority_ids"):
        st.write(spark.createDataFrame(auth[n]), n)
    pipe = KGPipeline(spark, st, cfg)
    q = run_kg_ingest_stream(
        pipe, read_transcript_stream(spark, ind, max_files_per_trigger=1),
        chk)
    # kill at the first committed table, restart from the checkpoint
    deadline = time.time() + 120
    while time.time() < deadline:
        if st.exists("triples"):
            break
        time.sleep(0.2)
    q.stop()
    q2 = run_kg_ingest_stream(
        pipe, read_transcript_stream(spark, ind, max_files_per_trigger=1),
        chk)
    _await(q2)
    report = pipe.run(resume=True)          # downstream on demand
    assert report["extract"] == "skipped"

    # batch reference over the same turns
    st_ref = TableStore(str(tmp_path / "ref"))
    ref = KGPipeline(spark, st_ref, cfg)
    ref.write_transcripts(spark.read.parquet(ind))
    for n in ("authority_entities", "authority_ids"):
        st_ref.write(spark.createDataFrame(auth[n]), n)
    ref.run(resume=False)

    for t in ("triples", "folded_mentions", "nodes", "edges"):
        a = st.read(spark, t).drop("bucket")
        b = st_ref.read(spark, t).drop("bucket")
        assert a.count() == b.count(), t
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t
