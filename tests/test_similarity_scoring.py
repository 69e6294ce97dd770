"""Trigram-similarity candidate scoring (SURVEY.md 2.10 scoring UDF)."""

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark.operators import linking as lk


def test_trigram_similarity_values(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "norm_surface": ["statlib", "statlib", "stat forge", "", "zzz"],
        "match_label": ["Statlib", "Dataforge", "Stat-Forge", "x", None],
    }))
    got = df.withColumn("s", lk.trigram_similarity()).collect()
    s = [r.s for r in got]
    assert s[0] == 1.0                  # case-insensitive identical
    assert 0.0 <= s[1] < 0.3            # different names are far apart
    assert s[2] > 0.5                   # hyphen variant stays close
    assert s[3] == 0.0 and s[4] == 0.0  # empty/null guarded


def test_score_blend_orders_candidates(spark):
    auth = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["QA", "QB"],
        "label": ["Statlib", "Statgrid"],
        "aliases": [["STATLIB"], []],
        "entity_type": ["software"] * 2,
        "claims": [[], []],
    }))
    cands = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "norm_surface": ["statlib", "statlib"],
        "n_mentions": [2, 2],
        "entity_id": ["QA", "QB"],
        "method": ["label", "variant"],
        "score": [1.0, 0.8],
    }))
    scored = lk.score_candidates_similarity(cands, auth)
    rows = {r.entity_id: r.score for r in scored.collect()}
    assert rows["QA"] == 1.0            # exact label keeps full score
    assert rows["QB"] < rows["QA"]      # fuzzy candidate separated
    # voting then prefers the true entity
    winner = lk.vote_links(scored, min_total=1).first()
    assert winner.entity_id == "QA"



def test_strong_id_not_rescored(spark):
    """The authoritative pkg-id match must keep its 1.0 prior even when
    its canonical label is textually far from the surface; and exact
    hyphenated-label matches score 1.0 (norm-name comparison), so a
    space-form competitor cannot steal the surface."""
    auth = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["QA", "QB"],
        "label": ["scikit-learn", "Sklearn"],
        "aliases": [[], []],
        "entity_type": ["software"] * 2,
        "claims": [[], []],
    }))
    cands = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "norm_surface": ["sklearn", "sklearn"],
        "n_mentions": [3, 3],
        "entity_id": ["QA", "QB"],
        "method": ["strong_id", "label"],
        "score": [1.0, 1.0],
    }))
    scored = {r.entity_id: r.score
              for r in lk.score_candidates_similarity(cands, auth).collect()}
    assert scored["QA"] == 1.0          # strong id untouched
    assert scored["QB"] == 1.0          # exact label (norm-name compare)

    # hyphenated exact match: surface 'stat forge' vs label 'Stat-Forge'
    auth2 = spark.createDataFrame(pd.DataFrame({
        "entity_id": ["QH"], "label": ["Stat-Forge"], "aliases": [[]],
        "entity_type": ["software"], "claims": [[]],
    }))
    cands2 = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c1"], "norm_surface": ["stat forge"],
        "n_mentions": [1], "entity_id": ["QH"],
        "method": ["label"], "score": [1.0],
    }))
    got = lk.score_candidates_similarity(cands2, auth2).first()
    assert got.score == 1.0
