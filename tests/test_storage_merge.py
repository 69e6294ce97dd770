"""TableStore snapshot semantics + MERGE upsert + incremental pipeline rerun."""

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark import datagen
from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig
from softcite_kb_spark.storage import TableStore


def test_merge_upsert(spark, tmp_path):
    st = TableStore(str(tmp_path / "s"))
    base = spark.createDataFrame(pd.DataFrame(
        {"k": ["a", "b", "c"], "v": [1, 2, 3]}))
    st.write(base, "t")
    upd = spark.createDataFrame(pd.DataFrame(
        {"k": ["b", "d"], "v": [20, 4]}))
    snap = st.merge(upd, "t", ["k"])
    got = {r.k: r.v for r in st.read(spark, "t").collect()}
    assert got == {"a": 1, "b": 20, "c": 3, "d": 4}
    assert snap.properties["operation"] == "merge"
    # snapshot history: write + merge = 2 snapshots, current is the merge
    assert st.current_snapshot("t").snapshot_id == 2
    # merge into missing table = plain write
    snap2 = st.merge(upd, "t2", ["k"])
    assert snap2.row_count == 2


def test_incremental_transcripts_rerun(spark, corpus, tmp_path):
    """New conversations merged into transcripts -> pipeline re-runs and
    the KB grows; untouched conversations' triples are unchanged
    (the reference's incremental update Readme.md:261-265)."""
    st = TableStore(str(tmp_path / "kb"))
    t = corpus["transcripts"]
    first = t.filter(F.col("conv_id") < "conv-000060")
    rest = t.filter(F.col("conv_id") >= "conv-000060")
    st.write(first, "transcripts")
    for name in ("authority_entities", "authority_ids"):
        st.write(corpus[name], name)
    cfg = PipelineConfig(blacklist=tuple(datagen.BLACKLIST), min_vote_total=1)
    KGPipeline(spark, st, cfg).run()
    triples_before = {tuple(r) for r in st.read(spark, "triples").collect()}

    # incremental batch arrives
    st.merge(rest, "transcripts", ["conv_id", "turn_idx"])
    report = KGPipeline(spark, st, cfg).run()
    assert report["extract"] == "ran"  # input snapshot changed
    triples_after = {tuple(r) for r in st.read(spark, "triples").collect()}
    assert triples_before <= triples_after
    assert len(triples_after) > len(triples_before)
