"""CorpusPipeline: the clean -> dedup(+near-dup CC) -> filter -> stats
composition over planted fixtures, including the one leg no SQL oracle
covers (connected-components near-dup removal)."""

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark.plans.corpus import CorpusConfig, CorpusPipeline
from softcite_kb_spark.storage import TableStore

GOOD = ("the quick brown fox jumps over the lazy dog and then it runs "
        "far away because the day is long and the sun is warm so the "
        "fox rests in the shade of a tall old tree near the river bank")
GOOD2 = ("a small boat drifts on the quiet lake while the morning mist "
         "lifts slowly and the birds call from the reeds as an old man "
         "casts his line into the water hoping that the fish will bite")


def _docs(spark):
    rows = [
        (1, GOOD + " one"),
        (2, GOOD2 + " two"),
        (3, "contact me at bob@example.com because the meeting is at "
            "the office and the team is waiting for the final report "
            "which is due before the end of the long busy day today"),
        (100, GOOD + " one"),                      # exact dup of 1
        (200, GOOD2 + " two extra tail"),          # near-dup of 2
        (300, "zzz qqq xxx vvv kkk jjj mmm nnn ppp rrr"),       # lang 'und'
        (301, "hi there"),                                      # too short
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _run(spark, tmp_path, sub, **cfg):
    st = TableStore(str(tmp_path / sub))
    st.write(_docs(spark), "documents")
    pipe = CorpusPipeline(spark, st, CorpusConfig(**cfg))
    report = pipe.run()
    return st, report


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    st, report = _run(spark, tmp_path, "kb", jaccard_threshold=0.7)
    corpus = st.read(spark, "corpus")
    ids = sorted(r.doc_id for r in corpus.collect())
    # 1 survives (100 is its exact dup); 2 survives (200 its near-dup —
    # min id wins via CC); 3 survives scrubbed; 300 fails lang, 301 length
    assert ids == [1, 2, 3]
    scrubbed = corpus.filter(F.col("doc_id") == 3).collect()[0].text
    assert "<EMAIL>" in scrubbed and "bob@example.com" not in scrubbed
    # survivorship metrics: every stage accounted for — SIGNED in/out
    # counts so row-gaining anomalies are as visible as drops
    m = {r.stage: (r.rows_in, r.rows_out)
         for r in st.read(spark, "corpus_metrics").collect()}
    assert m["clean"] == (7, 7)
    assert m["dedup"] == (7, 5)      # exact dup + near dup
    assert m["filter"] == (5, 3)     # lang + length
    assert m["stats"] == (3, 3)
    assert report["filter"] == 3


def test_near_dup_survivor_is_numeric_min(spark, tmp_path):
    """The near-dup survivor is the NUMERIC min doc id — ids must not be
    compared as strings, where '10' < '9' and '1000005' < '5' would keep
    the wrong doc of a pair."""
    rows = [(9, GOOD + " same"), (10, GOOD + " same extra tail"),
            (5, GOOD2 + " other"), (1000005, GOOD2 + " other extra tail")]
    st = TableStore(str(tmp_path / "kbn"))
    st.write(spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])), "documents")
    CorpusPipeline(spark, st, CorpusConfig(
        jaccard_threshold=0.7, languages=("en",), min_tokens=5)).run()
    ids = sorted(r.doc_id for r in st.read(spark, "docs_dedup").collect())
    assert ids == [5, 9]


def test_corpus_pipeline_near_dup_toggle(spark, tmp_path):
    st, _ = _run(spark, tmp_path, "kb2", near_dup=False,
                 jaccard_threshold=0.7)
    ids = sorted(r.doc_id for r in st.read(spark, "docs_dedup").collect())
    # exact dedup only: the near-dup 200 stays
    assert 200 in ids and 100 not in ids


def test_corpus_pipeline_idempotent(spark, tmp_path):
    st, _ = _run(spark, tmp_path, "kb3", jaccard_threshold=0.7)
    a = sorted(map(tuple, st.read(spark, "corpus").collect()))
    CorpusPipeline(spark, st, CorpusConfig(jaccard_threshold=0.7)).run()
    b = sorted(map(tuple, st.read(spark, "corpus").collect()))
    assert a == b
