"""Tests for the search flatten (P6/S11 analog) and bibtex/HTML parsers
(F14, S4/S6)."""

import pandas as pd
import pytest
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


_TEI_SAMPLE = """<biblStruct xml:id="b7">
  <analytic>
    <title level="a" type="main">Scikit-learn: Machine Learning in &amp;quot;Python&amp;quot;</title>
    <author><persName><forename type="first">Fabian</forename>
      <forename type="middle">G</forename>
      <surname>Pedregosa</surname></persName></author>
    <author><persName><forename type="first">Gael</forename>
      <surname>Varoquaux</surname></persName></author>
    <author><orgName>Inria</orgName></author>
    <idno type="DOI">10.5555/1953048.2078195</idno>
    <idno type="PMID">12345</idno>
    <ptr type="open-access" target="https://example.org/oa.pdf" />
  </analytic>
  <monogr>
    <title level="j">Journal of Machine Learning Research</title>
    <idno type="ISSN">1532-4435</idno>
    <imprint>
      <publisher>JMLR.org</publisher>
      <biblScope unit="volume">12</biblScope>
      <biblScope unit="issue">10</biblScope>
      <biblScope unit="page" from="2825" to="2830" />
      <date type="published" when="2011-10-01" />
    </imprint>
  </monogr>
</biblStruct>"""

_TEI_PAGE_TEXT = """<biblStruct>
  <analytic><title level="a">T</title></analytic>
  <monogr>
    <title level="m">Proc. of Things</title>
    <meeting><title>NeurIPS</title><placeName>Vancouver</placeName></meeting>
    <imprint>
      <biblScope unit="page">11-22</biblScope>
      <date type="published" when="2019" />
    </imprint>
  </monogr>
</biblStruct>"""


def test_tei_biblio_parse(spark):
    """F15: TEI biblStruct xpath battery (tei2json,
    populate_staging_area.py:615-751) as a regex-grammar pandas UDF."""
    df = spark.createDataFrame(
        pd.DataFrame({"tei": [_TEI_SAMPLE, _TEI_PAGE_TEXT, None, "<junk/>"]}))
    rows = df.select(dp.parse_tei_biblio("tei").alias("b")).select("b.*").collect()
    r = rows[0]
    assert r.title == 'Scikit-learn: Machine Learning in &quot;Python&quot;' \
        or r.title == 'Scikit-learn: Machine Learning in "Python"'
    assert r.doi == "10.5555/1953048.2078195"
    assert r.pmid == "12345"
    assert r.oa_link == "https://example.org/oa.pdf"
    assert [a.asDict() for a in r.authors] == [
        {"given": "Fabian G", "family": "Pedregosa"},
        {"given": "Gael", "family": "Varoquaux"},
    ]
    assert r.journal == "Journal of Machine Learning Research"
    assert r.publisher == "JMLR.org"
    assert r.volume == "12" and r.issue == "10"
    assert r.page == "2825-2830"
    assert r.issn == "1532-4435"
    assert r.date == "2011-10-01" and r.year == "2011"

    r2 = rows[1]
    assert r2.monograph == "Proc. of Things"
    assert r2.page == "11-22"  # text fallback when from/to absent
    assert r2.event == "NeurIPS"
    assert r2.year == "2019"

    r3, r4 = rows[2], rows[3]
    assert r3.title is None and r3.authors == []
    assert r4.doi is None


def test_facets(spark):
    """ES-facet analog: per-column top-k buckets, array columns facet per
    element (doc/example-api.md:33-60)."""
    flat = spark.createDataFrame(pd.DataFrame({
        "canonical_id": [f"e{i}" for i in range(6)],
        "entity_type": ["software"] * 4 + ["person"] * 2,
        "langs": [["Python"], ["Python", "R"], [], ["R"], [], []],
        "n_mentions": [5, 4, 3, 2, 1, 1],
    }))
    out = ix.facets(flat, ["entity_type", "langs"], k=2)
    rows = {(r.facet, r.value): r.n for r in out.collect()}
    assert rows[("entity_type", "software")] == 4
    assert rows[("entity_type", "person")] == 2
    assert rows[("langs", "Python")] == 2 and rows[("langs", "R")] == 2


def test_facets_empty_cols_rejected(spark):
    import pytest
    flat = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError, match="at least one column"):
        ix.facets(flat, [])


def test_tei_forename_unescaped(spark):
    tei = ('<biblStruct><analytic><title level="a">T</title>'
           '<author><persName><forename>Jos&#233;</forename>'
           '<surname>N&#233;e</surname></persName></author>'
           '</analytic></biblStruct>')
    r = spark.createDataFrame(pd.DataFrame({"tei": [tei]})) \
        .select(dp.parse_tei_biblio("tei").alias("b")).select("b.*") \
        .collect()[0]
    assert r.authors[0].given == "José"
    assert r.authors[0].family == "Née"


def test_two_hop_reverse_direction(spark):
    """start/end are the non-join endpoints whatever the traversal
    direction (they were hardcoded to src/dst before)."""
    from softcite_kb_spark.queries.api_queries import two_hop
    a = spark.createDataFrame(pd.DataFrame({
        "src_id": ["s1"], "dst_id": ["m"], "rel": ["ra"]}))
    b = spark.createDataFrame(pd.DataFrame({
        "src_id": ["e1"], "dst_id": ["m"], "rel": ["rb"]}))
    # reverse: meet at a.dst == b.dst -> far endpoints are a.src and b.src
    r = two_hop(a, b, join_left="dst_id", join_right="dst_id").collect()[0]
    assert (r.start_id, r.via_id, r.end_id) == ("s1", "m", "e1")
    # default forward direction unchanged
    c = spark.createDataFrame(pd.DataFrame({
        "src_id": ["m"], "dst_id": ["e2"], "rel": ["rc"]}))
    r2 = two_hop(a, c).collect()[0]
    assert (r2.start_id, r2.via_id, r2.end_id) == ("s1", "m", "e2")


def test_rank_tfidf_semantics(spark):
    """OR-match; rare terms outweigh common ones (idf); deterministic
    doc-id tiebreak; empty query rejected."""
    import pytest

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "spark spark spark common",       # high tf on 'spark'
            "rareword common",                # the only 'rareword' doc
            "common common",                  # matches only 'common'
            "nothing relevant here",          # no match at all
        ],
    }))
    got = ix.rank_tfidf(docs, "spark rareword", k=10,
                        id_col="doc_id", text_col="text").collect()
    ids = [r.doc_id for r in got]
    assert set(ids) == {1, 2}        # OR-match; doc 3/4 never score
    # idf: 'rareword' (df=1) beats 'spark' (df=1) only via tf — doc 1 has
    # tf 3 on spark, doc 2 tf 1 on rareword, same idf -> doc 1 first
    assert ids[0] == 1 and got[0].score > got[1].score
    # tie: two docs with identical term profiles order by id
    ties = spark.createDataFrame(pd.DataFrame({
        "doc_id": [7, 5], "text": ["spark x", "spark y"]}))
    t = ix.rank_tfidf(ties, "spark", k=10, id_col="doc_id",
                      text_col="text").collect()
    assert [r.doc_id for r in t] == [5, 7]
    assert t[0].score == t[1].score
    with pytest.raises(ValueError, match="alphanumeric"):
        ix.rank_tfidf(docs, "!!!", id_col="doc_id", text_col="text")


def test_rank_tfidf_custom_materializer(spark, tmp_path):
    """The tf barrier is injectable (VERDICT r03 #4): a durable
    scratch-table materializer must rank identically to the default
    localCheckpoint."""
    import os

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spark spark merge", "merge window", "spark window"]}))
    calls = []

    def scratch(df):
        p = os.path.join(tmp_path, f"scratch{len(calls)}")
        calls.append(p)
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    default = [(r.doc_id, r.score) for r in ix.rank_tfidf(
        docs, "spark window", k=10, id_col="doc_id",
        text_col="text").collect()]
    durable = [(r.doc_id, r.score) for r in ix.rank_tfidf(
        docs, "spark window", k=10, id_col="doc_id", text_col="text",
        materializer=scratch).collect()]
    assert durable == default and len(calls) == 1


def test_facets_single_scan_plan(spark, tmp_path):
    """VERDICT r03 #9: ALL facets come from ONE scan of the feed — the
    optimized plan contains exactly one parquet scan regardless of how
    many facet columns are requested."""
    p = str(tmp_path / "flat")
    spark.createDataFrame(pd.DataFrame({
        "entity_type": ["sw", "sw", "person", None],
        "label": ["a", "b", "b", "c"],
        "langs": [["en"], ["en", "fr"], None, ["de"]],
    })).write.parquet(p)
    flat = spark.read.parquet(p)
    out = ix.facets(flat, ["entity_type", "label", "langs"], k=10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan
    rows = {(r.facet, r.value): r.n for r in out.collect()}
    # semantics unchanged from the per-branch version
    assert rows[("entity_type", "sw")] == 2
    assert rows[("entity_type", "person")] == 1
    assert ("entity_type", "None") not in rows
    assert rows[("langs", "en")] == 2 and rows[("langs", "de")] == 1
    assert rows[("label", "b")] == 2
    # k is enforced per facet with (n desc, value asc) tie-break
    top1 = ix.facets(flat, ["label"], k=1).collect()
    assert [(r.facet, r.value, r.n) for r in top1] == [("label", "b", 2)]


def test_rank_bm25_matches_python_reference(spark):
    """Okapi BM25 vs a plain-Python reference (Robertson idf, k1/b
    length normalization, OR-match, 6-decimal round, id tiebreak)."""
    import math
    import re as _re

    texts = {1: "spark spark spark merge common", 2: "rareword common window",
             3: "common common", 4: "nothing here at all", 5: "",
             6: "spark window", 7: "spark window"}
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    got = [(r.doc_id, r.score) for r in ix.rank_bm25(
        docs, "spark rareword window", k=10, id_col="doc_id",
        text_col="text").collect()]

    def ref(query, k1=1.2, b=0.75):
        terms = sorted({t for t in _re.split(r"[^a-z0-9]+", query.lower())
                        if t})
        toks = {d: [t for t in _re.split(r"[^a-z0-9]+", s.lower()) if t]
                for d, s in texts.items()}
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        out = {}
        for d, tk in toks.items():
            s, hit = 0.0, False
            for t in terms:
                tf = tk.count(t)
                dfq = sum(1 for v in toks.values() if t in v)
                if tf:
                    hit = True
                idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
                s += (idf * tf * (k1 + 1)
                      / (tf + k1 * (1 - b + b * len(tk) / avgdl)))
            if hit:
                out[d] = round(s, 6)
        return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))

    assert got == ref("spark rareword window")
    # identical docs tie and break on id
    pair = [x for x in got if x[0] in (6, 7)]
    assert pair[0][1] == pair[1][1] and pair[0][0] == 6
    with pytest.raises(ValueError, match="alphanumeric"):
        ix.rank_bm25(docs, "???", id_col="doc_id", text_col="text")


def test_rank_bm25_custom_materializer_and_plan(spark, tmp_path):
    """Barrier injectable; and the big side takes ONE scan with no
    explode (tf/dl come from array ops in a single projection)."""
    import os

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["spark spark merge", "merge window", "spark window"]}))
    calls = []

    def scratch(df):
        p = os.path.join(tmp_path, f"s{len(calls)}")
        calls.append(p)
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    a = [(r.doc_id, r.score) for r in ix.rank_bm25(
        docs, "spark window", k=10, id_col="doc_id",
        text_col="text").collect()]
    b = [(r.doc_id, r.score) for r in ix.rank_bm25(
        docs, "spark window", k=10, id_col="doc_id", text_col="text",
        materializer=scratch).collect()]
    assert a == b and len(calls) == 1
    # plan shape: the materialized per-doc stats are parquet-backed; the
    # final plan reads them once for stats and once broadcast-joined —
    # no Generate (explode) anywhere
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    plan = ix.rank_bm25(spark.read.parquet(p), "spark window", k=10,
                        id_col="doc_id", text_col="text") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan
