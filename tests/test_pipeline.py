"""End-to-end pipeline tests: full run, resume skip, crash/resume
equivalence, idempotence (fixpoint), metrics presence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark import datagen
from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig
from softcite_kb_spark.storage import TableStore


@pytest.fixture()
def store(spark, corpus, tmp_path):
    st = TableStore(str(tmp_path / "kb"))
    for name in ("transcripts", "authority_entities", "authority_ids"):
        st.write(corpus[name], name)
    return st


def _cfg():
    return PipelineConfig(blacklist=tuple(datagen.BLACKLIST), min_vote_total=1)


def _table_hash(spark, store, name):
    df = store.read(spark, name)
    cols = sorted(df.columns)
    proj = [F.col(c).cast("string") for c in cols]
    return (
        df.select(F.sha2(F.concat_ws("\x1f", *proj), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
        .collect()[0][0]
    )


def test_full_run_and_resume(spark, store):
    pipe = KGPipeline(spark, store, _cfg())
    r1 = pipe.run()
    assert all(v == "ran" for v in r1.values())
    for t in ("triples", "linked_mentions", "canonical_map",
              "statements", "nodes", "edges", "_metrics"):
        assert store.exists(t), t
        assert store.current_snapshot(t).row_count > 0

    # second run: all stages skip (manifest matches)
    r2 = pipe.run()
    assert all(v == "skipped" for v in r2.values())

    # input change invalidates downstream stage 1 but resume still works
    nodes_before = _table_hash(spark, store, "nodes")
    r3 = pipe.run(resume=False)
    assert all(v == "ran" for v in r3.values())
    assert _table_hash(spark, store, "nodes") == nodes_before  # fixpoint


def test_crash_resume_equivalence(spark, corpus, tmp_path):
    # run A: straight through; run B: "crash" after each stage, resume
    stores = {}
    for mode in ("straight", "crashy"):
        st = TableStore(str(tmp_path / mode))
        for name in ("transcripts", "authority_entities", "authority_ids"):
            st.write(corpus[name], name)
        pipe = KGPipeline(spark, st, _cfg())
        if mode == "straight":
            pipe.run()
        else:
            pipe.run(stop_after="extract")
            pipe.run(stop_after="link")
            r = pipe.run()
            assert r["extract"] == "skipped" and r["link"] == "skipped"
            assert r["canonicalize"] == "ran"
        stores[mode] = st
    for t in ("triples", "statements", "nodes", "edges"):
        ha = _table_hash(spark, stores["straight"], t)
        hb = _table_hash(spark, stores["crashy"], t)
        assert ha == hb, f"{t} differs between straight and crash/resume runs"


def test_metrics_lineage_rows(spark, store):
    KGPipeline(spark, store, _cfg()).run()
    m = store.read(spark, "_metrics")
    stages = {r.stage for r in m.select("stage").distinct().collect()}
    assert stages == {"extract", "link", "canonicalize"}
    assert m.filter(F.col("n_rows") < 0).count() == 0
    assert m.filter(F.col("partition_id").isNull()).count() == 0
    # commit mode surfaced per table (merge_mode when the commit was a
    # merge — the scale-monitoring signal for silent full-rewrite merges)
    modes = {r.commit_mode for r in m.select("commit_mode").distinct().collect()}
    assert modes == {"write"}  # plain runs commit via write()


def test_config_change_invalidates(spark, store):
    pipe = KGPipeline(spark, store, _cfg())
    pipe.run()
    pipe2 = KGPipeline(spark, store,
                       PipelineConfig(blacklist=("OTHER",), min_vote_total=1))
    r = pipe2.run()
    assert all(v == "ran" for v in r.values())


def test_pipeline_star_cc_equivalent(spark, corpus, tmp_path):
    """End-to-end: the star-CC update rule plugged in via
    PipelineConfig(cc_algorithm='star') produces the identical KB (nodes,
    edges, statements) as label propagation."""
    hashes = {}
    for algo in ("label-propagation", "star"):
        st = TableStore(str(tmp_path / algo))
        for name in ("transcripts", "authority_entities", "authority_ids"):
            st.write(corpus[name], name)
        cfg = PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                             min_vote_total=1, cc_algorithm=algo)
        KGPipeline(spark, st, cfg).run()
        hashes[algo] = {t: _table_hash(spark, st, t)
                        for t in ("nodes", "edges", "statements")}
    assert hashes["label-propagation"] == hashes["star"]


def test_read_metrics_latest_per_stage(spark, store):
    """The append-only metrics log keeps history; read_metrics collapses
    to the latest run per (stage, table)."""
    pipe = KGPipeline(spark, store, _cfg())
    pipe.run()
    pipe.run(resume=False)  # second full run appends a second metrics set
    full = pipe.read_metrics(current_only=False)
    cur = pipe.read_metrics()
    assert full.count() > cur.count()
    per = (cur.groupBy("stage", "table")
           .agg(F.countDistinct("run_ts").alias("n")).collect())
    assert all(r.n == 1 for r in per)


def test_metrics_schema_migration_from_old_store(spark, store):
    """A _metrics table written by an OLDER library version (no
    commit_mode column) must not kill the run: the append path migrates
    the old rows (NULL backfill) once and continues."""
    pipe = KGPipeline(spark, store, _cfg())
    # simulate the legacy table: write _metrics WITHOUT commit_mode
    legacy = spark.createDataFrame(pd.DataFrame({
        "partition_id": [0], "n_rows": [5], "stage": ["extract"],
        "table": ["triples"], "config": ["deadbeef"], "run_ts": [1.0],
    })).withColumn("n_rows", F.col("n_rows").cast("long"))
    store.write(legacy, "_metrics")
    pipe.run(resume=False)
    m = store.read(spark, "_metrics")
    assert "commit_mode" in m.columns
    # legacy row survives, backfilled NULL; new rows carry a mode
    old = m.filter(F.col("config") == "deadbeef").collect()
    assert len(old) == 1 and old[0].commit_mode is None
    assert m.filter(F.col("commit_mode") == "write").count() > 0


def test_compact_table_preserves_resume(spark, store):
    """Maintenance compaction through the pipeline must not invalidate
    the resume manifest: after compact_table, every stage still skips."""
    pipe = KGPipeline(spark, store, _cfg())
    pipe.run()
    snap = pipe.compact_table("triples")
    assert snap.properties["operation"] == "compact"
    # metrics must not misreport the maintenance commit as a merge
    assert "merge_mode" not in snap.properties
    r = pipe.run()
    assert all(v == "skipped" for v in r.values()), r
    assert store.read(spark, "triples").count() == \
        store.current_snapshot("triples").row_count


def test_metrics_migration_keeps_future_only_columns(spark, store):
    """ADVICE r03: the drift migration must keep the UNION of columns —
    a column that exists only in the pre-existing _metrics table (e.g.
    written by a NEWER library version) survives the rewrite with NULL
    backfill on the new rows, instead of being silently dropped."""
    pipe = KGPipeline(spark, store, _cfg())
    legacy = spark.createDataFrame(pd.DataFrame({
        "partition_id": [0], "n_rows": [5], "stage": ["extract"],
        "table": ["triples"], "config": ["deadbeef"], "run_ts": [1.0],
        "future_col": ["kept"],
    })).withColumn("n_rows", F.col("n_rows").cast("long"))
    store.write(legacy, "_metrics")
    pipe.run(resume=False)
    m = store.read(spark, "_metrics")
    assert "future_col" in m.columns
    assert m.filter(F.col("future_col") == "kept").count() == 1
    new = m.filter(F.col("config") != "deadbeef")
    assert new.count() > 0
    assert new.filter(F.col("future_col").isNotNull()).count() == 0


def test_metrics_append_unrelated_error_not_swallowed(spark, store):
    """Only SchemaDriftError triggers the migration; an unrelated
    ValueError from append must surface, not cause a destructive
    rewrite-then-retry."""
    pipe = KGPipeline(spark, store, _cfg())
    part = spark.createDataFrame(pd.DataFrame({
        "partition_id": [0], "n_rows": [1], "stage": ["x"],
        "table": ["t"], "config": ["c"], "commit_mode": ["write"],
        "run_ts": [1.0]})).withColumn(
            "n_rows", F.col("n_rows").cast("long"))
    pipe._append_metrics(part)  # creates the table

    def boom(df, table, properties=None):
        raise ValueError("disk quota exceeded")

    orig = store.append
    store.append = boom
    try:
        with pytest.raises(ValueError, match="disk quota"):
            pipe._append_metrics(part)
    finally:
        store.append = orig


def test_deferred_metrics_join_all_and_retry(spark, store):
    """_join_metrics must (a) retry a transiently-failed append once
    synchronously — the row is restored, no error surfaces — and
    (b) when one append fails persistently, still join EVERY other
    pending future (no orphaned appends racing a later writer) before
    raising."""
    pipe = KGPipeline(spark, store, _cfg())

    calls = {"flaky": 0, "ok": 0, "late": 0}

    def flaky():
        calls["flaky"] += 1
        if calls["flaky"] == 1:
            raise RuntimeError("transient append failure")

    def ok():
        calls["ok"] += 1

    pipe._defer_metrics(flaky)
    pipe._defer_metrics(ok)
    pipe._join_metrics()  # transient: retried, no error
    assert calls == {"flaky": 2, "ok": 1, "late": 0}
    assert pipe._metrics_futs == []

    def fatal():
        raise RuntimeError("persistent append failure")

    def late():
        calls["late"] += 1

    pipe._defer_metrics(fatal)
    pipe._defer_metrics(late)
    with pytest.raises(RuntimeError, match="persistent"):
        pipe._join_metrics()
    assert calls["late"] == 1  # the sibling append was joined, not orphaned
    assert pipe._metrics_futs == []


def test_ingest_rejects_unbucketed_transcripts_table(spark, corpus,
                                                    tmp_path):
    """ADVICE r03: a store whose transcripts were committed with a
    plain store.write (no bucket layout) + partition_buckets>0 must
    fail ingest_stage1 with a CLEAR error pointing at
    write_transcripts, not an opaque AnalysisException downstream."""
    st = TableStore(str(tmp_path / "kb"))
    st.write(corpus["transcripts"], "transcripts")  # NOT write_transcripts
    for n in ("authority_entities", "authority_ids"):
        st.write(corpus[n], n)
    cfg = PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                         min_vote_total=1, partition_buckets=8)
    pipe = KGPipeline(spark, st, cfg)
    pipe.run(resume=False)  # batch run works fine unbucketed
    batch = corpus["transcripts"].limit(10)
    with pytest.raises(RuntimeError, match="write_transcripts"):
        pipe.ingest_stage1(batch)


def test_ingest_flags_merge_fallback(spark, corpus, tmp_path,
                                     monkeypatch):
    """VERDICT r03 #8: when an increment's replacement merge falls back
    to a full rewrite on a partitioned table, the pipeline warns and
    flags the manifest — a silent O(table) increment is the 100 TB
    failure mode to monitor for."""
    from softcite_kb_spark.storage import TableStore as TS

    st = TableStore(str(tmp_path / "kb"))
    cfg = PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                         min_vote_total=1, partition_buckets=8)
    pipe = KGPipeline(spark, st, cfg)
    pipe.write_transcripts(corpus["transcripts"])
    for n in ("authority_entities", "authority_ids"):
        st.write(corpus[n], n)
    pipe.run(resume=False)
    # force every prunable merge over the prune-width limit
    monkeypatch.setattr(TS, "_MAX_PRUNED_PARTITIONS", 0)
    convs = [r.conv_id for r in corpus["transcripts"].select("conv_id")
             .distinct().limit(2).collect()]
    batch = corpus["transcripts"].filter(F.col("conv_id").isin(convs))
    pipe.ingest_stage1(batch)
    flags = pipe._load_manifest()["_ingest"]["merge_fallbacks"]
    assert "triples" in flags and "prune limit" in flags["triples"]
