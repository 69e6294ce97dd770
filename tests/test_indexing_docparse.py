"""Tests for the search flatten (P6/S11 analog) and bibtex/HTML parsers
(F14, S4/S6)."""

import pandas as pd
from pyspark.sql import functions as F

from softcite_kb_spark.functions import docparse as dp
from softcite_kb_spark.kb import indexing as ix


def _kb_frames(spark):
    nodes = spark.createDataFrame(pd.DataFrame({
        "canonical_id": ["e:Q1", "e:Q2"],
        "label": ["Statlib", "Dataforge"],
        "aliases": [["STATLIB"], []],
        "entity_type": ["software", "software"],
        "n_mentions": [10, 3],
    }))
    edges = spark.createDataFrame(pd.DataFrame({
        "src_id": ["e:Q1", "e:Q1", "e:Q2"],
        "dst_id": ["e:Q2", "e:Q9", "e:Q9"],
        "rel": ["depends_on", "created_by", "created_by"],
        "count": [4, 1, 2],
        "dst_surface": ["Dataforge", "Ada Lovelace", "Ada Lovelace"],
    }))
    stmts = spark.createDataFrame(pd.DataFrame({
        "canonical_id": ["e:Q1", "e:Q1"],
        "prop": ["written_in", "has_version"],
        "value": ["Python", "1.2"],
        "datatype": ["string"] * 2,
        "source": ["transcripts"] * 2,
        "count": [5, 2],
    }))
    return nodes, edges, stmts


def test_flatten_for_search(spark):
    nodes, edges, stmts = _kb_frames(spark)
    flat = ix.flatten_for_search(nodes, edges, stmts)
    rows = {r.canonical_id: r for r in flat.collect()}
    q1 = rows["e:Q1"]
    assert q1.langs == ["Python"]
    assert q1.rel_counts == {"depends_on": 4, "created_by": 1}
    assert "Dataforge" in q1.contexts_sample
    for tok in ("Statlib", "STATLIB", "Python", "Dataforge"):
        assert tok in q1["all"]
    # cap: max_contexts=1 keeps only the top context per entity
    capped = ix.flatten_for_search(nodes, edges, stmts, max_contexts=1)
    assert len(capped.filter(F.col("canonical_id") == "e:Q1")
               .first().contexts_sample) == 1


def test_search(spark):
    nodes, edges, stmts = _kb_frames(spark)
    flat = ix.flatten_for_search(nodes, edges, stmts)
    hits = ix.search(flat, "statlib python").collect()
    assert [h.canonical_id for h in hits] == ["e:Q1"]
    assert ix.search(flat, "nonexistent").count() == 0


BIB = """
@article{xie2015,
  title = {Dynamic Documents with {R} and knitr},
  author = "Yihui Xie",
  year = {2015},
  journal = {Chapman Hall}
}
@inproceedings{foo2020, title={A Study}, author={A. B.}, year={2020},
  booktitle={Proc. of Things}}
"""


def test_parse_bibtex(spark):
    df = spark.createDataFrame(pd.DataFrame({"bib": [BIB, "", None]}))
    rows = df.select(dp.parse_bibtex("bib").alias("e")).collect()
    e = rows[0].e
    assert len(e) == 2
    assert e[0].entry_type == "article" and e[0].key == "xie2015"
    assert "knitr" in e[0].title and e[0].year == "2015"
    assert e[0].venue == "Chapman Hall"
    assert e[1].entry_type == "inproceedings" and e[1].venue == "Proc. of Things"
    assert rows[1].e == [] and rows[2].e == []
    sig = df.limit(1).select(dp.bib_signature(F.lit(e[0].title)).alias("s")) \
        .first().s
    assert sig == "dynamicdocumentswithrandknitr"


HTML = """
<html><body><h2>knitr: A General-Purpose Tool</h2>
<p>Dynamic report generation.</p>
<table>
<tr><td>Version:</td><td>1.43</td></tr>
<tr><td>Maintainer:</td><td>Yihui Xie &lt;xie@example.org&gt;</td></tr>
<tr><td>License:</td><td><a href="x">GPL</a></td></tr>
</table>
<blockquote>Xie Y (2015). <em>Dynamic Documents</em>.</blockquote>
</body></html>
"""


def test_parse_package_page(spark):
    df = spark.createDataFrame(pd.DataFrame({"html": [HTML, None]}))
    rows = df.select(dp.parse_package_page("html").alias("p")).collect()
    p = rows[0].p
    assert p.title.startswith("knitr")
    assert p.description == "Dynamic report generation."
    assert p.attrs["Version"] == "1.43"
    assert p.attrs["License"] == "GPL"
    assert len(p.citations) == 1 and "Dynamic Documents" in p.citations[0]
    assert rows[1].p.title is None
