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
