"""Tests: gazetteer mention detection and the applyInPandasWithState
running-stats operator (state persists across micro-batches)."""

import os

import pytest

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark.operators import extraction as ex
from softcite_kb_spark.streaming import ingest as ing


def test_gazetteer_mentions(spark, corpus):
    got = ex.extract_mentions_gazetteer(
        corpus["transcripts"], corpus["authority_entities"])
    want = corpus["expected_mentions"].filter(
        F.col("entity_id").isNotNull())  # OOV surfaces are not in the gazetteer
    g = {tuple(r) for r in got.select("conv_id", "turn_idx", "surface")
         .distinct().collect()}
    w = {tuple(r) for r in want.select("conv_id", "turn_idx", "surface")
         .distinct().collect()}
    # gazetteer must find every planted in-vocabulary mention (recall 1.0
    # on this corpus); it may legitimately also hit labels inside noise
    assert w <= g
    # and nothing it finds is outside the authority surface space
    surfaces = set()
    for r in corpus["authority_entities"].collect():
        surfaces.add(r.label)
        surfaces.update(r.aliases)
        if r.label.upper() != r.label:
            surfaces.add(r.label.upper())
        if r.label.count("-") == 1:
            surfaces.add(r.label.replace("-", " "))
    assert {s for (_, _, s) in g} <= surfaces


def test_gazetteer_word_boundaries(spark, corpus):
    pdf = pd.DataFrame({
        "conv_id": ["c1"] * 2,
        "turn_idx": pd.array([0, 1], dtype="int32"),
        "text": ["Statliberation is not Statlib here.",
                 "prefix-Statlib should not match either"],
    })
    auth = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["Q1"], "label": ["Statlib"],
        "aliases": [[]],
        "entity_type": ["software"],
        "claims": [[]],
    }))
    got = ex.extract_mentions_gazetteer(spark.createDataFrame(pdf), auth).collect()
    assert [(r.turn_idx, r.surface) for r in got] == [(0, "Statlib")]


def _write_batch(spark, path, convs, mode):
    rows = []
    for conv_id, texts in convs.items():
        for i, t in enumerate(texts):
            rows.append((conv_id, i, "user", t, None,
                         pd.Timestamp("2026-01-05 09:00:00")))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    spark.createDataFrame(pdf, schema=ing.TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode(mode).parquet(path)


def test_stateful_running_stats(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    out = os.path.join(tmp_path, "out")
    ckpt = os.path.join(tmp_path, "ckpt")
    _write_batch(spark, src,
                 {"c1": ["We ran Statlib here.", "plain text"],
                  "c2": ["nothing"]}, "overwrite")
    q = ing.run_conversation_stats_stream(
        ing.read_transcript_stream(spark, src), out, ckpt)
    q.awaitTermination(120)
    first = {r.conv_id: r for r in spark.read.parquet(out).collect()}
    assert first["c1"].n_turns_total == 2
    assert first["c1"].n_mentions_total >= 2  # "We", "Statlib" NAME tokens
    # second micro-batch: state must accumulate, not reset
    _write_batch(spark, src, {"c1": ["We ran Statlib again."]}, "append")
    q2 = ing.run_conversation_stats_stream(
        ing.read_transcript_stream(spark, src), out, ckpt)
    q2.awaitTermination(120)
    latest = (spark.read.parquet(out)
              .orderBy(F.desc("batch_id"))
              .filter(F.col("conv_id") == "c1").first())
    assert latest.n_turns_total == 3
    assert latest.n_turns_total > first["c1"].n_turns_total


def test_gazetteer_max_surfaces_fail_fast(spark, corpus):
    with pytest.raises(ValueError, match="max_surfaces"):
        ex.extract_mentions_gazetteer(
            corpus["transcripts"], corpus["authority_entities"],
            max_surfaces=2)


def test_token_join_matches_regex_path(spark, corpus):
    """The distributed token-join fallback must agree with the alternation-
    regex path on a non-overlapping gazetteer, including multi-word and
    hyphenated surfaces and punctuation-adjacent occurrences."""
    pdf = pd.DataFrame({
        "conv_id": ["c1"] * 5,
        "turn_idx": pd.array(range(5), dtype="int32"),
        "text": [
            "We used Statlib (and STAT-FORGE) yesterday.",
            "Statliberation is not Statlib; prefix-Statlib neither",
            "Stat Forge works, Stat  Forge with two spaces does not",
            "Statlib, Statlib! twice on one turn",
            "nothing here",
        ],
    })
    t = spark.createDataFrame(pdf)
    auth = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["Q1", "Q2"],
        "label": ["Statlib", "Stat-Forge"],
        "aliases": [[], ["STAT-FORGE", "Stat Forge"]],
        "entity_type": ["software", "software"],
        "claims": [[], []],
    }))
    rx = sorted((r.conv_id, r.turn_idx, r.surface) for r in
                ex.extract_mentions_gazetteer(t, auth).collect())
    tj = sorted((r.conv_id, r.turn_idx, r.surface) for r in
                ex.extract_mentions_token_join(t, auth).collect())
    assert rx == tj
    assert ("c1", 3, "Statlib") in tj  # both occurrences
    assert tj.count(("c1", 3, "Statlib")) == 2
    assert ("c1", 2, "Stat Forge") in tj  # single-space bigram only


def test_token_join_on_corpus_gazetteer(spark, corpus):
    """On the generated corpus gazetteer, the join path's matches are a
    superset only where surfaces overlap; with the datagen dictionary
    (distinct 1-2 token labels) recall must cover every planted mention."""
    got = ex.extract_mentions_token_join(
        corpus["transcripts"], corpus["authority_entities"])
    expected = corpus["expected_mentions"].filter(
        F.col("entity_id").isNotNull())
    exp_keys = {(r.conv_id, r.turn_idx, r.surface)
                for r in expected.collect()}
    got_keys = {(r.conv_id, r.turn_idx, r.surface) for r in got.collect()}
    assert exp_keys <= got_keys
