"""Structured-Streaming ingest tests (availableNow trigger = deterministic)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark.streaming import ingest as ing


def _write_transcripts(spark, path):
    pdf = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": pd.array([0, 1, 0, 1], dtype="int32"),
        "role": ["user", "assistant", "user", "assistant"],
        "text": [
            "We ran Statlib v1.0 on the cluster.",
            "Statlib depends on Dataforge.",
            "nothing here.",
            "We ran Graphkit v2.3 on the cluster.",
        ],
        "tool": [None] * 4,
        "ts": pd.to_datetime([
            "2026-01-05 09:00:00", "2026-01-05 09:01:00",
            "2026-01-05 09:00:30", "2026-01-05 09:20:00",
        ]).astype("datetime64[us]"),
    })
    spark.createDataFrame(pdf, schema=ing.TRANSCRIPT_SCHEMA) \
        .write.mode("overwrite").parquet(path)


def test_stream_extract_triples(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    out = os.path.join(tmp_path, "out")
    ckpt = os.path.join(tmp_path, "ckpt")
    _write_transcripts(spark, src)
    stream = ing.read_transcript_stream(spark, src)
    assert stream.isStreaming
    q = ing.stream_extract_triples(stream, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rows = {(r.conv_id, r.pred, r.subj) for r in got.collect()}
    assert ("c1", "depends_on", "Statlib") in rows
    assert ("c1", "has_version", "Statlib") in rows
    assert ("c2", "has_version", "Graphkit") in rows
    # exactly-once: re-running over the same checkpoint adds nothing
    q2 = ing.stream_extract_triples(
        ing.read_transcript_stream(spark, src), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == got.count()


def test_windowed_turn_rates(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    out = os.path.join(tmp_path, "rates")
    ckpt = os.path.join(tmp_path, "ckpt2")
    _write_transcripts(spark, src)
    q = ing.run_turn_rate_stream(
        ing.read_transcript_stream(spark, src), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # appends only closed windows (watermark); schema is the contract here
    assert set(got.columns) == {"window_start", "window_end", "conv_id",
                                "n_turns"}
    closed = {(r.conv_id, r.n_turns) for r in got.collect()}
    # the 09:20 event advances the watermark to 09:10, closing the
    # [09:00, 09:05) window: c1 has 2 turns there, c2 has 1; c2's 09:20
    # window stays open and must NOT be emitted in append mode
    assert ("c1", 2) in closed
    assert ("c2", 1) in closed
    open_windows = got.filter(
        F.col("window_start") >= "2026-01-05 09:20:00").count()
    assert open_windows == 0


def test_stream_dedup_exact(spark, tmp_path):
    """Watermark-bounded streaming dedup: duplicate-content rows are
    dropped within the horizon; distinct content survives."""
    src = os.path.join(tmp_path, "src")
    out = os.path.join(tmp_path, "out")
    ckpt = os.path.join(tmp_path, "ckpt")
    pdf = pd.DataFrame({
        "conv_id": ["c1", "c2", "c3", "c4"],
        "turn_idx": pd.array([0, 0, 0, 0], dtype="int32"),
        "role": ["user"] * 4,
        "text": [
            "the same document text",
            "The same document TEXT!",   # norm-dup of row 0
            "a different document",
            "the same document text",    # exact dup of row 0
        ],
        "tool": [None] * 4,
        "ts": pd.to_datetime([
            "2026-01-05 09:00:00", "2026-01-05 09:01:00",
            "2026-01-05 09:02:00", "2026-01-05 09:03:00",
        ]).astype("datetime64[us]"),
    })
    spark.createDataFrame(pdf, schema=ing.TRANSCRIPT_SCHEMA) \
        .write.mode("overwrite").parquet(src)
    stream = ing.read_transcript_stream(spark, src)
    q = ing.run_dedup_stream(stream, out, ckpt, watermark="10 minutes")
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = sorted(r.text for r in got.collect())
    assert len(texts) == 2
    assert "a different document" in texts
    # exactly one of the three same-fingerprint rows survived
    assert sum("same document" in t for t in texts) == 1


def test_streaming_sessions_gap_and_timeout_close(spark, tmp_path):
    """streaming_sessions closes sessions BOTH ways: an in-update gap
    split (new event > gap after the open session) and an event-time
    TIMEOUT (watermark passes end+gap with no new event for the key).
    maxFilesPerTrigger=1 forces two micro-batches so the watermark
    actually advances between files."""
    import glob

    src = str(tmp_path / "events")
    os.makedirs(src)

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["conv_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf["turn_idx"] = pd.array([0] * len(pdf), dtype="int32")
        pdf["role"] = "user"
        pdf["text"] = "x"
        pdf["tool"] = None
        spark.createDataFrame(
            pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
            schema=ing.TRANSCRIPT_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

    t0 = "2026-01-05 09:00:"
    write_file("f1", [("a", t0 + "00"), ("a", t0 + "10"),
                      ("a", t0 + "20"), ("b", t0 + "05")])
    write_file("f2", [("a", "2026-01-05 10:00:00")])

    stream = (spark.readStream.schema(ing.TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = str(tmp_path / "out")
    q = ing.run_session_stream(stream, out, str(tmp_path / "ckpt"),
                               gap_seconds=100.0, watermark="0 seconds")
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    closed = {(r.key, r.session_start, r.session_end, r.n_events)
              for r in rows if r.closed}
    base = pd.Timestamp("2026-01-05 09:00:00").timestamp()
    # a's first session (3 events over 20s) closed — either by the gap
    # split when the 10:00 event arrived or by timeout, depending on
    # file->batch assignment; b's singleton closed by TIMEOUT only
    assert ("a", base, base + 20.0, 3) in closed
    assert ("b", base + 5.0, base + 5.0, 1) in closed
    # a's second session exists as an open (closed=false) progress row
    opens = {(r.key, r.session_start, r.n_events)
             for r in rows if not r.closed}
    assert ("a", base + 3600.0, 1) in opens


def test_streaming_sessions_late_event_moves_start_back(spark, tmp_path):
    """ADVICE r04: a late cross-trigger event EARLIER than the restored
    session_start (within the watermark and the gap) must move the open
    session's start BACK to the earliest member — matching
    temporal.sessionize batch semantics (sessions close only on forward
    gaps). Before the fix the merged session reported a start later
    than its earliest event."""
    src = str(tmp_path / "events")
    os.makedirs(src)

    def write_file(rows):
        pdf = pd.DataFrame(rows, columns=["conv_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf["turn_idx"] = pd.array([0] * len(pdf), dtype="int32")
        pdf["role"] = "user"
        pdf["text"] = "x"
        pdf["tool"] = None
        spark.createDataFrame(
            pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
            schema=ing.TRANSCRIPT_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

    # trigger 1 opens the session at 09:00:50; trigger 2 delivers a
    # LATE event 40 s earlier (gap=100 s -> merges; watermark=10 min ->
    # not dropped)
    write_file([("a", "2026-01-05 09:00:50"), ("a", "2026-01-05 09:01:00")])
    write_file([("a", "2026-01-05 09:00:10")])

    stream = (spark.readStream.schema(ing.TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = str(tmp_path / "out")
    q = ing.run_session_stream(stream, out, str(tmp_path / "ckpt"),
                               gap_seconds=100.0, watermark="10 minutes")
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    base = pd.Timestamp("2026-01-05 09:00:00").timestamp()
    opens = {(r.key, r.session_start, r.session_end, r.n_events)
             for r in rows if not r.closed}
    # the open session spans ALL three events with start at the
    # earliest (09:00:10), not the restored 09:00:50
    assert ("a", base + 10.0, base + 60.0, 3) in opens
    # and no session was spuriously closed by the backward merge
    assert not any(r.closed for r in rows)
