"""Incremental stage-2/3 maintenance (VERDICT r04 #2): absorbing a
batch through IncrementalKGPipeline must produce the IDENTICAL
statements/nodes/edges/canonical_map as a from-scratch batch run over
the union — while every read of a corpus-scale table is
partition-pruned to the touched slice (asserted on the recorded bucket
lists and merge modes)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark import datagen
from softcite_kb_spark.plans.incremental import IncrementalKGPipeline
from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig
from softcite_kb_spark.storage import TableStore

OUT_TABLES = ("canonical_map", "statements", "nodes", "edges")


def _cfg():
    return PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                          min_vote_total=1, partition_buckets=8)


@pytest.fixture(scope="module")
def corpus_tables(spark):
    return datagen.build_corpus(n_conversations=60)


def _load(spark, tables):
    return {n: spark.createDataFrame(tables[n])
            for n in ("transcripts", "authority_entities",
                      "authority_ids")}


def _batch_reference(spark, dfs, root, transcripts):
    st = TableStore(root)
    pipe = KGPipeline(spark, st, _cfg())
    pipe.write_transcripts(transcripts)
    for n in ("authority_entities", "authority_ids"):
        st.write(dfs[n], n)
    pipe.run(resume=False)
    return st

def _inc_pipeline(spark, dfs, root, transcripts, surface_buckets=64):
    st = TableStore(root)
    pipe = IncrementalKGPipeline(spark, st, _cfg(),
                                 surface_buckets=surface_buckets)
    pipe.write_transcripts(transcripts)
    for n in ("authority_entities", "authority_ids"):
        st.write(dfs[n], n)
    pipe.bootstrap(resume=False)
    return st, pipe


def _assert_tables_equal(spark, store_a, store_b, name):
    a = store_a.read(spark, name)
    b = store_b.read(spark, name)
    for d in ("bucket",):
        if d in a.columns:
            a = a.drop(d)
        if d in b.columns:
            b = b.drop(d)
    cols = sorted(set(a.columns) & set(b.columns))
    assert sorted(a.columns) == sorted(b.columns), name
    assert a.count() == b.count(), name
    assert a.select(*cols).exceptAll(b.select(*cols)).isEmpty(), name
    assert b.select(*cols).exceptAll(a.select(*cols)).isEmpty(), name


def test_bootstrap_matches_batch(spark, corpus_tables, tmp_path):
    """The re-laid-out bootstrap outputs are row-identical to the plain
    batch pipeline's (the canonical map reconstruction from state is
    exact)."""
    dfs = _load(spark, corpus_tables)
    ref = _batch_reference(spark, dfs, str(tmp_path / "ref"),
                           dfs["transcripts"])
    st, _ = _inc_pipeline(spark, dfs, str(tmp_path / "inc"),
                          dfs["transcripts"])
    for t in OUT_TABLES:
        _assert_tables_equal(spark, ref, st, t)


def test_increment_equals_batch_and_is_pruned(spark, corpus_tables,
                                              tmp_path):
    """80/20 split: bootstrap on A, ingest B incrementally. The KB must
    equal the batch run over A∪B, every corpus-scale merge must commit
    PRUNED, and the recorded read-bucket lists must cover a strict
    subset of the surface buckets (reads scale with the touched slice,
    not the corpus)."""
    dfs = _load(spark, corpus_tables)
    convs = sorted(r.conv_id for r in dfs["transcripts"]
                   .select("conv_id").distinct().collect())
    first = set(convs[: int(len(convs) * 0.8)])
    t_a = dfs["transcripts"].filter(F.col("conv_id").isin(first))
    t_b = dfs["transcripts"].filter(~F.col("conv_id").isin(first))

    ref = _batch_reference(spark, dfs, str(tmp_path / "ref"),
                           dfs["transcripts"])
    st, pipe = _inc_pipeline(spark, dfs, str(tmp_path / "inc"), t_a,
                             surface_buckets=256)
    report = pipe.ingest_increment(t_b)
    assert report == {"extract": "skipped", "link": "incremental",
                      "canonicalize": "incremental"}
    for t in OUT_TABLES:
        _assert_tables_equal(spark, ref, st, t)

    # --- the scale claim ---
    # with 256 surface buckets and a 20% increment the touched/affected
    # surface set must cover well under half the buckets; a diff bug
    # that marks UNCHANGED surfaces as affected (the union/intersect
    # bag-semantics trap) blows straight through this bound
    nb = pipe.surface_buckets
    assert pipe.last_read_buckets, "no pruned reads recorded"
    for table, bks in pipe.last_read_buckets.items():
        assert len(bks) < nb // 2, (
            f"{table}: read {len(bks)}/{nb} buckets — not pruned")
    for t in ("folded_by_surface", "triples_by_subj", "triples_by_obj",
              "surface_stats", "accepted_links", "canonical_map",
              "statements", "nodes", "edges"):
        props = st.current_snapshot(t).properties
        assert props.get("merge_mode") == "pruned", (t, props)


def test_increment_replacement_matches_batch(spark, corpus_tables,
                                             tmp_path):
    """Replaced conversations (changed text -> changed mentions, votes,
    canonicals, statements) converge to the batch result over the
    modified corpus; replaying the same batch is a fixpoint."""
    dfs = _load(spark, corpus_tables)
    some = [r.conv_id for r in dfs["transcripts"].select("conv_id")
            .distinct().orderBy("conv_id").limit(5).collect()]
    modified = dfs["transcripts"].withColumn(
        "text",
        F.when(F.col("conv_id").isin(some),
               F.lit("We ran Statlib v9.9 on the cluster."))
        .otherwise(F.col("text")))

    ref = _batch_reference(spark, dfs, str(tmp_path / "ref"), modified)
    st, pipe = _inc_pipeline(spark, dfs, str(tmp_path / "inc"),
                             dfs["transcripts"])
    batch = modified.filter(F.col("conv_id").isin(some))
    pipe.ingest_increment(batch)
    for t in OUT_TABLES:
        _assert_tables_equal(spark, ref, st, t)

    # replay: same batch again -> identical KB (idempotent fixpoint)
    before = {t: sorted(map(tuple, st.read(spark, t).drop("bucket")
                            .collect())) for t in ("statements", "edges")}
    pipe.ingest_increment(batch)
    for t in OUT_TABLES:
        _assert_tables_equal(spark, ref, st, t)
    after = {t: sorted(map(tuple, st.read(spark, t).drop("bucket")
                           .collect())) for t in ("statements", "edges")}
    assert before == after


def test_decision_flip_propagates(spark, tmp_path):
    """A planted vote-threshold crossing: the bootstrap corpus leaves a
    surface BELOW min_vote_total (unlinked, own canonical); the
    increment pushes it over — the incremental path must flip the
    acceptance, re-point the canonical to the entity hub and rebuild
    that canonical's statements/nodes, exactly as the batch run does."""
    auth_schema = ("entity_id string, label string, "
                   "aliases array<string>, entity_type string, "
                   "claims array<struct<prop:string,value:string,"
                   "datatype:string>>")
    auth = pd.DataFrame([
        {"entity_id": "Q1", "label": "Fliplib", "aliases": [],
         "entity_type": "software", "claims": []},
    ])
    ids = pd.DataFrame([{"id_kind": "pkg", "id_value": "fliplib",
                         "entity_id": "Q1"}])

    def conv(cid, n_turns):
        return [{"conv_id": cid, "turn_idx": i, "role": "user",
                 "text": "We ran Fliplib v1.0 on the cluster.",
                 "tool": None,
                 "ts": pd.Timestamp("2026-01-05 09:00:00")
                 + pd.Timedelta(minutes=i)}
                for i in range(n_turns)]

    base = pd.DataFrame(conv("c1", 1))
    base["turn_idx"] = base["turn_idx"].astype("int32")
    base["ts"] = base["ts"].astype("datetime64[us]")
    extra = pd.DataFrame(conv("c2", 3))
    extra["turn_idx"] = extra["turn_idx"].astype("int32")
    extra["ts"] = extra["ts"].astype("datetime64[us]")

    cfg = PipelineConfig(min_vote_total=3, partition_buckets=4)
    dfs = {"authority_entities": spark.createDataFrame(auth, auth_schema),
           "authority_ids": spark.createDataFrame(ids)}

    st = TableStore(str(tmp_path / "inc"))
    pipe = IncrementalKGPipeline(spark, st, cfg, surface_buckets=8)
    pipe.write_transcripts(spark.createDataFrame(base))
    for n in ("authority_entities", "authority_ids"):
        st.write(dfs[n], n)
    pipe.bootstrap(resume=False)
    # below threshold: unlinked, canonical is the surface's own node
    n0 = st.read(spark, "nodes").collect()
    assert all(not r.canonical_id.startswith("e:") for r in n0)

    pipe.ingest_increment(spark.createDataFrame(extra))
    nodes = st.read(spark, "nodes").collect()
    hub = [r for r in nodes if r.canonical_id == "e:Q1"]
    assert len(hub) == 1 and hub[0].entity_id == "Q1"
    # the old sub-threshold canonical is gone (regrouped, not orphaned)
    assert all(r.canonical_id == "e:Q1" or r.canonical_id.startswith("e:")
               for r in nodes) or len(nodes) == 1

    # batch cross-check over the union
    ref = TableStore(str(tmp_path / "ref"))
    rp = KGPipeline(spark, ref, cfg)
    rp.write_transcripts(spark.createDataFrame(pd.concat([base, extra])))
    for n in ("authority_entities", "authority_ids"):
        ref.write(dfs[n], n)
    rp.run(resume=False)
    for t in OUT_TABLES:
        _assert_tables_equal(spark, ref, st, t)


class _CrashingStore(TableStore):
    """TableStore that raises a planted error INSTEAD of performing the
    commit whose ordinal (or table name) is armed — simulating a crash
    between two of an increment's sequential snapshot commits."""

    def __init__(self, root):
        super().__init__(root)
        self.commit_log: list = []
        self.fail_on_commit: int | None = None  # 0-based ordinal
        self.armed = False

    def _tick(self, table):
        if self.armed:
            if (self.fail_on_commit is not None
                    and len(self.commit_log) == self.fail_on_commit):
                raise RuntimeError(f"planted crash before {table}")
            self.commit_log.append(table)

    def write(self, df, table, *a, **k):
        self._tick(table)
        return super().write(df, table, *a, **k)

    def merge(self, df, table, *a, **k):
        self._tick(table)
        return super().merge(df, table, *a, **k)

    def append(self, df, table, *a, **k):
        self._tick(table)
        return super().append(df, table, *a, **k)


def test_increment_crash_replay_equals_batch(spark, corpus_tables,
                                             tmp_path):
    """A crash at ANY commit boundary inside ingest_increment must be
    recoverable by re-calling it with the same batch: the WAL entry +
    pinned pre-increment snapshots let the replay re-derive the OLD
    touched slice even though stage-1 already replaced those rows (the
    orphaned-eviction hazard a naive re-run hits). Crashes are planted
    at the first commit after stage-1's (the dangerous window: conv
    tables new, surface tables stale) and late in stage-3; after the
    replay all four output tables equal the from-scratch batch run.
    A different batch against a pending WAL is refused."""
    dfs = _load(spark, corpus_tables)
    convs = sorted(r.conv_id for r in dfs["transcripts"]
                   .select("conv_id").distinct().collect())
    first = set(convs[: int(len(convs) * 0.8)])
    t_a = dfs["transcripts"].filter(F.col("conv_id").isin(first))
    t_b = dfs["transcripts"].filter(~F.col("conv_id").isin(first))
    ref = _batch_reference(spark, dfs, str(tmp_path / "ref"),
                           dfs["transcripts"])

    # clean run first: record the increment's commit sequence so the
    # crash ordinals below are structural, not magic numbers
    st0 = _CrashingStore(str(tmp_path / "probe"))
    pipe0 = IncrementalKGPipeline(spark, st0, _cfg(), surface_buckets=64)
    pipe0.write_transcripts(t_a)
    for n in ("authority_entities", "authority_ids"):
        st0.write(dfs[n], n)
    pipe0.bootstrap(resume=False)
    st0.armed = True
    pipe0.ingest_increment(t_b)
    seq = list(st0.commit_log)
    assert len(seq) >= 10, seq
    # the stage-1/stage-2 boundary: first surface-layout table commit
    early = seq.index("folded_by_surface")
    late = len(seq) - 2
    for t in OUT_TABLES:
        _assert_tables_equal(spark, ref, st0, t)  # probe run is correct

    for tag, crash_at in (("early", early), ("late", late)):
        root = str(tmp_path / f"crash_{tag}")
        st = _CrashingStore(root)
        pipe = IncrementalKGPipeline(spark, st, _cfg(),
                                     surface_buckets=64)
        pipe.write_transcripts(t_a)
        for n in ("authority_entities", "authority_ids"):
            st.write(dfs[n], n)
        pipe.bootstrap(resume=False)
        st.armed = True
        st.fail_on_commit = crash_at
        with pytest.raises(RuntimeError, match="planted crash"):
            pipe.ingest_increment(t_b)
        man = pipe._load_manifest()
        assert "wal" in man["_ingest23"], tag  # crash left the WAL entry

        # a DIFFERENT batch must be refused while the WAL is pending
        other = dfs["transcripts"].filter(
            F.col("conv_id") == convs[0])
        with pytest.raises(RuntimeError, match="did not complete"):
            pipe.ingest_increment(other)

        # replay with the SAME batch rolls the increment forward
        st.fail_on_commit = None
        report = pipe.ingest_increment(t_b)
        assert report["link"] == "incremental", tag
        for t in OUT_TABLES:
            _assert_tables_equal(spark, ref, st, t)
        man = pipe._load_manifest()
        assert "wal" not in man["_ingest23"], tag  # cleared on success
        for t in IncrementalKGPipeline.PIN_TABLES:  # pins dropped
            assert IncrementalKGPipeline._WAL_PIN not in (
                st._load_meta(t).get("pins") or {}), (tag, t)


def test_maintain_stream_crash_replay_equals_batch(spark, corpus_tables,
                                                   tmp_path):
    """run_kg_maintain_stream: micro-batches flow through
    ingest_increment so the KB is query-fresh after every trigger.
    Exactly-once across a crash: a planted store failure mid-FIRST
    increment (at the stage-1/stage-2 boundary — the dangerous window)
    fails the streaming query AFTER stage-1 replaced the batch's rows;
    restarting from the Spark checkpoint redelivers the same file set,
    the WAL batch signature matches, and the half-committed increment
    rolls forward. A second trigger then maintains on top. Final KB ==
    from-scratch batch run over the union."""
    from softcite_kb_spark.streaming.ingest import run_kg_maintain_stream

    dfs = _load(spark, corpus_tables)
    convs = sorted(r.conv_id for r in dfs["transcripts"]
                   .select("conv_id").distinct().collect())
    boot = set(convs[: int(len(convs) * 0.8)])
    mid = set(convs[int(len(convs) * 0.8): int(len(convs) * 0.9)])
    t_a = dfs["transcripts"].filter(F.col("conv_id").isin(boot))
    t_b1 = dfs["transcripts"].filter(F.col("conv_id").isin(mid))
    t_b2 = dfs["transcripts"].filter(
        ~F.col("conv_id").isin(boot | mid))
    ref = _batch_reference(spark, dfs, str(tmp_path / "ref"),
                           dfs["transcripts"])

    class _St(TableStore):
        armed = False
        fired = False

        def merge(self, df, table, *a, **k):
            if self.armed and not self.fired \
                    and table == "folded_by_surface":
                self.fired = True
                raise RuntimeError("planted crash")
            return super().merge(df, table, *a, **k)

    st = _St(str(tmp_path / "kb"))
    pipe = IncrementalKGPipeline(spark, st, _cfg(), surface_buckets=64)
    pipe.write_transcripts(t_a)
    for n in ("authority_entities", "authority_ids"):
        st.write(dfs[n], n)
    pipe.bootstrap(resume=False)

    ind = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    t_b1.coalesce(1).write.mode("append").parquet(ind)

    def _stream():
        return spark.readStream.schema(
            dfs["transcripts"].schema).option(
            "maxFilesPerTrigger", 1).parquet(ind)

    st.armed = True
    q = run_kg_maintain_stream(pipe, _stream(), chk)
    with pytest.raises(Exception, match="planted crash"):
        q.awaitTermination(300)
        raise RuntimeError(str(q.exception()))  # surfaced either way
    assert "wal" in pipe._load_manifest()["_ingest23"]

    # restart: checkpoint redelivers the interrupted trigger's batch,
    # the WAL signature matches, and the increment rolls forward
    q2 = run_kg_maintain_stream(pipe, _stream(), chk)
    assert q2.awaitTermination(300), "restarted stream did not finish"
    assert "wal" not in pipe._load_manifest()["_ingest23"]

    # second trigger on the live store (same checkpoint lineage)
    t_b2.coalesce(1).write.mode("append").parquet(ind)
    q3 = run_kg_maintain_stream(pipe, _stream(), chk)
    assert q3.awaitTermination(300)

    assert st.fired  # the crash actually happened mid-increment
    for t in OUT_TABLES:
        _assert_tables_equal(spark, ref, st, t)


def test_changelog_feeds_incremental_consumers(spark, corpus_tables,
                                               tmp_path):
    """The snapshot changelog is how DOWNSTREAM incremental consumers
    (index refresh, export sync) ride an increment: for every output
    table, old snapshot - deletes + inserts == new snapshot (bag
    semantics), and on the bucketed nodes table the changelog scan
    reads only the buckets the pruned merge touched — never the whole
    table."""
    dfs = _load(spark, corpus_tables)
    convs = sorted(r.conv_id for r in dfs["transcripts"]
                   .select("conv_id").distinct().collect())
    first = set(convs[: int(len(convs) * 0.8)])
    t_a = dfs["transcripts"].filter(F.col("conv_id").isin(first))
    t_b = dfs["transcripts"].filter(~F.col("conv_id").isin(first))
    st, pipe = _inc_pipeline(spark, dfs, str(tmp_path / "inc"), t_a)
    pre = {t: st.current_snapshot(t).snapshot_id for t in OUT_TABLES}
    for t in OUT_TABLES:
        st.pin_snapshot(t, "consumer", pre[t])
    pipe.ingest_increment(t_b)

    for t in OUT_TABLES:
        log = st.changelog(spark, t, pre[t])
        assert log.count() > 0, t  # the increment did change the KB
        old = st.read_at(spark, t, pre[t])
        cols = [c for c in old.columns]
        dels = log.filter(F.col("_change_type") == "delete") \
            .select(*cols)
        ins = log.filter(F.col("_change_type") == "insert") \
            .select(*cols)
        rebuilt = old.exceptAll(dels).unionByName(ins)
        new = st.read_at(spark, t,
                         st.current_snapshot(t).snapshot_id)
        assert rebuilt.exceptAll(new).isEmpty() and \
            new.exceptAll(rebuilt).isEmpty(), t

    # pruned scan: the nodes changelog reads a strict subset of buckets
    nodes_log = st.changelog(spark, "nodes", pre["nodes"])
    buckets = {f.split("bucket=")[1].split("/")[0]
               for f in nodes_log.inputFiles()}
    total = pipe.surface_buckets
    assert 0 < len(buckets) < total, (len(buckets), total)
