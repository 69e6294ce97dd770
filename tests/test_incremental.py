"""Incremental ingest: absorbing a new transcript batch via
per-conversation MERGE must produce the IDENTICAL knowledge base as a
from-scratch batch run over the union — and must not re-extract the
existing corpus."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark import datagen
from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig
from softcite_kb_spark.storage import TableStore


def _cfg():
    return PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                          min_vote_total=1, partition_buckets=8)


@pytest.fixture(scope="module")
def corpus_tables(spark):
    return datagen.build_corpus(n_conversations=60)


def _load(spark, tables):
    out = {}
    for name in ("transcripts", "authority_entities", "authority_ids"):
        out[name] = spark.createDataFrame(tables[name])
    return out


def _table_hash(spark, store, name):
    df = store.read(spark, name)
    if "bucket" in df.columns:
        df = df.drop("bucket")
    cols = sorted(df.columns)
    proj = [F.col(c).cast("string") for c in cols]
    return (
        df.select(F.sha2(F.concat_ws("\x1f", *proj), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10)
                   .cast("decimal(38,0)")))
        .collect()[0][0]
    )


def test_incremental_equals_batch(spark, corpus_tables, tmp_path):
    dfs = _load(spark, corpus_tables)
    convs = [r.conv_id for r in
             dfs["transcripts"].select("conv_id").distinct().collect()]
    first = set(convs[: int(len(convs) * 0.8)])
    t_a = dfs["transcripts"].filter(F.col("conv_id").isin(first))
    t_b = dfs["transcripts"].filter(~F.col("conv_id").isin(first))
    assert t_b.count() > 0

    # batch reference: one run over the full corpus
    st_full = TableStore(str(tmp_path / "full"))
    pipe_full = KGPipeline(spark, st_full, _cfg())
    pipe_full.write_transcripts(dfs["transcripts"])
    for n in ("authority_entities", "authority_ids"):
        st_full.write(dfs[n], n)
    pipe_full.run(resume=False)

    # incremental: run on A, then absorb B as an increment
    st_inc = TableStore(str(tmp_path / "inc"))
    pipe_inc = KGPipeline(spark, st_inc, _cfg())
    pipe_inc.write_transcripts(t_a)
    for n in ("authority_entities", "authority_ids"):
        st_inc.write(dfs[n], n)
    pipe_inc.run(resume=False)
    report = pipe_inc.ingest_increment(t_b)

    # the increment did NOT re-extract the corpus...
    assert report["extract"] == "skipped"
    assert report["link"] == "ran" and report["canonicalize"] == "ran"
    # ...and an all-new-conversations batch took the fast-APPEND path
    # (O(batch) I/O — prior files hardlinked, nothing rewritten)
    for t in ("transcripts", "triples", "mentions", "folded_mentions"):
        props = st_inc.current_snapshot(t).properties
        assert props["operation"] == "append", (t, props)

    # identical KB, table by table
    for t in ("triples", "mentions", "folded_mentions",
              "statements", "nodes", "edges"):
        assert _table_hash(spark, st_full, t) == \
            _table_hash(spark, st_inc, t), f"{t} diverged"


def test_increment_replaces_conversations(spark, corpus_tables, tmp_path):
    """A batch containing EXISTING conv_ids takes the merge path: those
    conversations' rows are replaced wholesale, and the resulting KB
    equals a from-scratch batch run over the modified corpus."""
    dfs = _load(spark, corpus_tables)
    some = [r.conv_id for r in dfs["transcripts"].select("conv_id")
            .distinct().orderBy("conv_id").limit(5).collect()]
    modified = dfs["transcripts"].withColumn(
        "text",
        F.when(F.col("conv_id").isin(some),
               F.lit("We ran Statlib v9.9 on the cluster."))
        .otherwise(F.col("text")))

    st_ref = TableStore(str(tmp_path / "ref"))
    pipe_ref = KGPipeline(spark, st_ref, _cfg())
    pipe_ref.write_transcripts(modified)
    for n in ("authority_entities", "authority_ids"):
        st_ref.write(dfs[n], n)
    pipe_ref.run(resume=False)

    st = TableStore(str(tmp_path / "inc"))
    pipe = KGPipeline(spark, st, _cfg())
    pipe.write_transcripts(dfs["transcripts"])
    for n in ("authority_entities", "authority_ids"):
        st.write(dfs[n], n)
    pipe.run(resume=False)
    rep = pipe.ingest_increment(modified.filter(F.col("conv_id").isin(some)))
    assert rep["extract"] == "skipped"
    for t in ("transcripts", "triples", "mentions", "folded_mentions"):
        props = st.current_snapshot(t).properties
        assert props["operation"] == "merge", (t, props)
    for t in ("triples", "mentions", "folded_mentions",
              "statements", "nodes", "edges"):
        assert _table_hash(spark, st_ref, t) == _table_hash(spark, st, t), t


def test_increment_idempotent(spark, corpus_tables, tmp_path):
    """Re-ingesting the same batch is a fixpoint: per-conversation
    replacement merges rewrite identical rows, the KB is unchanged."""
    dfs = _load(spark, corpus_tables)
    st = TableStore(str(tmp_path / "kb"))
    pipe = KGPipeline(spark, st, _cfg())
    pipe.write_transcripts(dfs["transcripts"])
    for n in ("authority_entities", "authority_ids"):
        st.write(dfs[n], n)
    pipe.run(resume=False)
    before = {t: _table_hash(spark, st, t)
              for t in ("triples", "nodes", "edges", "statements")}
    some = dfs["transcripts"].filter(
        F.col("conv_id").isin([r.conv_id for r in dfs["transcripts"]
                               .select("conv_id").distinct().limit(5)
                               .collect()]))
    pipe.ingest_increment(some)
    after = {t: _table_hash(spark, st, t)
             for t in ("triples", "nodes", "edges", "statements")}
    assert before == after
