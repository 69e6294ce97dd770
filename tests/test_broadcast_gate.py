"""Authority-broadcast size gate (VERDICT r04 #1) + hot-surface skew
policy (VERDICT r04 #7): the stage-2/3 joins must not hint
``F.broadcast`` unconditionally — a Wikidata-scale authority would OOM
— and the gated shuffle fallback must produce the IDENTICAL accepted
set. The hot-surface split plan must match the plain join's result."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from softcite_kb_spark import datagen
from softcite_kb_spark.operators import canonicalize as cz
from softcite_kb_spark.operators import extraction as ex
from softcite_kb_spark.operators import linking as lk
from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig
from softcite_kb_spark.storage import TableStore


@pytest.fixture(scope="module")
def linked_inputs(spark, corpus, tmp_path_factory):
    """folded_mentions + triples materialized to parquet (so plans show
    clean FileScans), plus the authority tables."""
    d = tmp_path_factory.mktemp("bcgate")
    bl = spark.createDataFrame(pd.DataFrame({"term": datagen.BLACKLIST}))
    triples = ex.extract_triples(corpus["transcripts"], bl)
    folded = ex.fold_mentions(ex.mentions_from_triples(triples))
    fp, tp = str(d / "folded"), str(d / "triples")
    folded.write.parquet(fp)
    triples.write.parquet(tp)
    return {
        "folded": spark.read.parquet(fp),
        "triples": spark.read.parquet(tp),
        "auth": corpus["authority_entities"],
        "ids": corpus["authority_ids"],
    }


def _multiset_equal(a, b):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    assert a.count() == b.count()
    assert a.select(*cols).exceptAll(b.select(*cols)).isEmpty()
    assert b.select(*cols).exceptAll(a.select(*cols)).isEmpty()


def test_authority_fits_broadcast_probe(spark, corpus):
    """The probe passes a curated-sized authority and fails a
    (simulated) web-scale one — the same tables, a tiny threshold."""
    assert lk.authority_fits_broadcast(
        corpus["authority_entities"], corpus["authority_ids"])
    assert not lk.authority_fits_broadcast(
        corpus["authority_entities"], corpus["authority_ids"], max_rows=1)


def test_shuffle_fallback_identical_accepted_set(spark, linked_inputs):
    """broadcast=False (the big-authority path) must produce EXACTLY the
    accepted set of the hinted path, and its static plan must contain
    no broadcast exchange once auto-broadcast is disabled — proving the
    fallback really is a shuffle join, not a re-derived hint."""
    li = linked_inputs
    hinted = lk.link_mentions(li["folded"], li["auth"], li["ids"],
                              li["triples"], min_total=1, broadcast=True)
    gated = lk.link_mentions(li["folded"], li["auth"], li["ids"],
                             li["triples"], min_total=1, broadcast=False)
    _multiset_equal(hinted, gated)
    # the gate actually linked something — the equality is not vacuous
    assert hinted.filter(F.col("entity_id").isNotNull()).count() > 0

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold",
                             None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = lk.link_mentions(
            li["folded"], li["auth"], li["ids"], li["triples"],
            min_total=1, broadcast=False) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert "BroadcastHashJoin" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                           old_aqe)


def test_canonicalize_gated_broadcast_identical(spark, linked_inputs):
    """Stage-3's gated joins (build_nodes / build_edges /
    augment_nodes_with_authority) produce identical tables with the
    hint on and off."""
    li = linked_inputs
    linked = lk.link_mentions(li["folded"], li["auth"], li["ids"],
                              li["triples"], min_total=1)
    canon = cz.canonical_map(linked)
    keys = lk.authority_block_keys(li["auth"])
    for bc in (True, False):
        nodes = cz.build_nodes(canon, authority_entities=li["auth"],
                               broadcast=bc)
        edges = cz.build_edges(li["triples"], canon, authority_keys=keys,
                               broadcast=bc)
        aug = cz.augment_nodes_with_authority(nodes, edges, li["auth"],
                                              broadcast=bc)
        if bc:
            ref_nodes, ref_edges, ref_aug = nodes, edges, aug
        else:
            _multiset_equal(ref_nodes, nodes)
            _multiset_equal(ref_edges, edges)
            _multiset_equal(ref_aug, aug)


def test_hot_surface_split_join_matches_plain(spark, corpus):
    """Planted 40%-hot corpus (one surface owns 40% of all mention
    groups — the reference's known-slow "R" merge, merge.py:186-189):
    the split plan chosen by hot_surface_threshold must produce the
    IDENTICAL linked table, and its plan must actually split (union of
    a broadcast-hot leg and a shuffle-cold leg)."""
    lbl = (corpus["authority_entities"]
           .filter(F.col("entity_type") == "software")
           .select("label").orderBy("label").first().label)
    hot_surface = lbl.lower().replace("-", " ")  # norm_name in Python
    hot = [(f"h{i}", hot_surface, [lbl], 2, [], 0) for i in range(400)]
    cold = [(f"c{i}", f"tool{i % 200}", [f"tool{i % 200}"], 1, [], 0)
            for i in range(600)]
    folded = spark.createDataFrame(
        hot + cold,
        schema="conv_id string, norm_surface string, "
               "surfaces array<string>, n_mentions long, "
               "versions array<string>, first_turn_idx int")
    auth, ids = corpus["authority_entities"], corpus["authority_ids"]
    plain = lk.link_mentions(folded, auth, ids, None, min_total=1,
                             hot_surface_threshold=0)
    split = lk.link_mentions(folded, auth, ids, None, min_total=1,
                             hot_surface_threshold=100)
    _multiset_equal(plain, split)
    # the hot surface is actually linked (equality is not vacuous) and
    # the split plan really unions two legs
    assert plain.filter((F.col("norm_surface") == hot_surface)
                        & F.col("entity_id").isNotNull()).count() == 400
    phys = split._jdf.queryExecution().executedPlan().toString()
    assert "Union" in phys


def test_pipeline_authority_broadcast_never_matches_always(
        spark, tmp_path):
    """End-to-end: a pipeline run with authority_broadcast="never"
    (the Wikidata-scale configuration) emits the same KB as
    "always" — the policy is an execution knob, never a semantics
    knob."""
    tables = datagen.build_corpus(n_conversations=30)
    outs = {}
    for mode in ("always", "never"):
        st = TableStore(str(tmp_path / mode))
        cfg = PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                             min_vote_total=1, authority_broadcast=mode)
        pipe = KGPipeline(spark, st, cfg)
        st.write(spark.createDataFrame(tables["transcripts"]),
                 "transcripts")
        for n in ("authority_entities", "authority_ids"):
            st.write(spark.createDataFrame(tables[n]), n)
        pipe.run(resume=False)
        outs[mode] = st
    for t in ("linked_mentions", "statements", "nodes", "edges"):
        _multiset_equal(outs["always"].read(spark, t),
                        outs["never"].read(spark, t))


def test_broadcast_probe_cached_per_authority_snapshot(
        spark, tmp_path, monkeypatch):
    """Under authority_broadcast="auto" a 3-stage run pays exactly ONE
    O(authority) probe (VERDICT r05 #5): the decision is cached keyed by
    the authority snapshot ids, and invalidates when the authority
    advances."""
    calls = {"n": 0}
    real = lk.authority_fits_broadcast

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(lk, "authority_fits_broadcast", counting)
    tables = datagen.build_corpus(n_conversations=20)
    st = TableStore(str(tmp_path / "kb"))
    cfg = PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                         min_vote_total=1, authority_broadcast="auto")
    pipe = KGPipeline(spark, st, cfg)
    st.write(spark.createDataFrame(tables["transcripts"]), "transcripts")
    for n in ("authority_entities", "authority_ids"):
        st.write(spark.createDataFrame(tables[n]), n)
    pipe.run(resume=False)
    assert calls["n"] == 1
    # a NEW authority snapshot must re-probe (cache keyed by snapshot id)
    st.write(spark.createDataFrame(tables["authority_entities"]),
             "authority_entities")
    pipe._broadcast_decision(st.read(spark, "authority_entities"))
    assert calls["n"] == 2
