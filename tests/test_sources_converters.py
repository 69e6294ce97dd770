"""Tests for sources (JSONL dump, kv-records, entity lists), converters
(claims JSON / simple / codemeta), and the api-query library."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from softcite_kb_spark.kb import converter as cv
from softcite_kb_spark.queries import api_queries as aq
from softcite_kb_spark.sources import jsonl as js
from softcite_kb_spark.sources import records as rc


@pytest.fixture(scope="module")
def dump_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("dump")
    p = os.path.join(d, "dump.json")
    with open(p, "w") as f:
        f.write("[\n")
        f.write(json.dumps({"id": "Q1", "labels": "Statlib"}) + ",\n")
        f.write(json.dumps({"id": "Q2", "labels": "Dataforge"}) + ",\n")
        f.write("THIS IS NOT JSON\n")
        f.write(json.dumps({"id": "Q3", "labels": "Graphkit"}) + "\n")
        f.write("]\n")
    return p


def test_jsonl_dump_tolerant_parse(spark, dump_file):
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("labels", T.StringType()),
    ])
    out = js.read_jsonl_dump(spark, dump_file, schema)
    rows = out.collect()
    parsed = [r.entity.id for r in rows if r.entity is not None
              and r.entity.id is not None]
    corrupt = [r._corrupt for r in rows if r._corrupt is not None]
    assert sorted(parsed) == ["Q1", "Q2", "Q3"]
    assert corrupt == ["THIS IS NOT JSON"]


def test_mongoexport_oid_rewrite(spark, tmp_path):
    p = os.path.join(tmp_path, "annotations.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"_id": {"$oid": "abc123"}, "name": "numpy"}) + "\n")
        f.write(json.dumps({"_id": {"$oid": "def456"}, "name": "scipy"}) + "\n")
    df = js.read_mongoexport(spark, p)
    got = {r._key: r.name for r in df.collect()}
    assert got == {"abc123": "numpy", "def456": "scipy"}


def test_entity_list_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"eid": ["Q1", "Q2", "Q2", "Q3"]}))
    path = os.path.join(tmp_path, "entities")
    js.write_entity_list(df, "eid", path)
    back = js.read_entity_list(spark, path)
    assert sorted(r.entity_id for r in back.collect()) == ["Q1", "Q2", "Q3"]


def test_kv_records_parse(spark, tmp_path):
    p = os.path.join(tmp_path, "PACKAGES")
    with open(p, "w") as f:
        f.write("Package: knitr\nVersion: 1.43\nDepends: R (>= 3.3.0), "
                "evaluate (>= 0.15)\nSuggests: markdown,\n rmarkdown\n")
        f.write("\n")
        f.write("Package: ggplot2\nVersion: 3.4.2\nDepends: R (>= 3.3)\n")
    df = rc.read_kv_records(spark, str(p), keys=["Package", "Version", "Depends"])
    rows = {r.package: r for r in df.collect()}
    assert rows["knitr"].version == "1.43"
    assert rows["ggplot2"].version == "3.4.2"
    # continuation line folded
    assert "rmarkdown" in rows["knitr"]["fields"]["Suggests"]
    deps = df.filter(F.col("package") == "knitr").select(
        rc.parse_dependency_field(F.col("depends")).alias("d")).first().d
    assert deps == ["evaluate"]  # 'R' dropped, version constraint stripped


@pytest.fixture(scope="module")
def statements(spark):
    pdf = pd.DataFrame({
        "canonical_id": ["e:Q1", "e:Q1", "e:Q1", "e:Q2"],
        "prop": ["P277", "P277", "P275", "P277"],
        "value": ["Python", "Rust", "MIT", "Scala"],
        "datatype": ["string"] * 4,
        "source": ["transcripts", "wikidata", "transcripts", "transcripts"],
        "count": [5, 2, 1, 3],
    })
    return spark.createDataFrame(pdf)


def test_claims_json_nesting(spark, statements):
    out = {r.entity_id: json.loads(r.claims_json)
           for r in cv.to_claims_json(statements).collect()}
    q1 = out["e:Q1"]
    assert set(q1.keys()) == {"P275", "P277"}
    assert len(q1["P277"]) == 2
    vals = {s["value"] for s in q1["P277"]}
    assert vals == {"Python", "Rust"}
    ref = q1["P275"][0]["references"][0]
    assert ref["P248"] == "transcripts" and ref["count"] == 1


def test_simple_format_naming_join(spark, statements):
    naming = spark.createDataFrame(pd.DataFrame({
        "id": ["P277", "P275"],
        "name": ["programming language", "license"],
    }))
    out = cv.to_simple(statements, naming).collect()
    props = {r.property for r in out}
    assert props == {"programming language", "license"}


def test_codemeta_projection(spark, statements):
    out = cv.to_codemeta(
        statements,
        {"P277": "programmingLanguage", "P275": "license"},
        source_priority=["wikidata", "transcripts"],
    ).collect()
    rows = {r.entity_id: r for r in out}
    # wikidata-sourced value wins by priority even with lower count
    assert rows["e:Q1"].programmingLanguage == "Rust"
    assert rows["e:Q1"].license == "MIT"
    assert rows["e:Q2"].programmingLanguage == "Scala"


def test_api_queries_shapes(spark):
    edges = spark.createDataFrame(pd.DataFrame({
        "src_id": ["a", "a", "b", "c", "a"],
        "dst_id": ["x", "x", "x", "y", "y"],
        "rel": ["cites"] * 5,
        "count": [1, 2, 1, 1, 1],
    }))
    top = aq.top_entities_by_count(edges, key="dst_id", n=1).collect()
    assert top[0].entity == "x" and top[0].cnt == 3
    grouped = aq.group_into_lists(edges, "src_id", "dst_id", n=10).collect()
    byg = {r.grp: r for r in grouped}
    assert byg["a"].n_items == 3 and byg["a"]["items"] == ["x", "x", "y"]
    hop = aq.two_hop(
        edges, spark.createDataFrame(pd.DataFrame({
            "src_id": ["x"], "dst_id": ["z"], "rel": ["dep"]})))
    rows = hop.collect()
    assert all(r.via_id == "x" and r.end_id == "z" for r in rows)
    assert {r.start_id for r in rows} == {"a", "b"}


def test_kv_records_repeated_key_first_wins(spark, tmp_path):
    """A record that repeats a field must not kill the tolerant scan with
    DUPLICATED_MAP_KEY — first occurrence wins."""
    p = tmp_path / "dup.txt"
    p.write_text("Package: foo\nVersion: 1.0\nPackage: LOSER\n\n"
                 "Package: bar\nVersion: 2.0\n")
    from softcite_kb_spark.sources.records import read_kv_records
    rows = {r.package: r for r in
            read_kv_records(spark, str(p), keys=["Package", "Version"]).collect()}
    assert set(rows) == {"foo", "bar"}
    assert rows["foo"].fields["Package"] == "foo"


def test_wikidata_reexpansion(spark, statements):
    """P8 full surface: convert_to_wikidata semantics — labels/aliases
    re-expanded to language level, type=item, claims nested
    (kb/converter.py:64-124)."""
    nodes = spark.createDataFrame(pd.DataFrame({
        "canonical_id": ["e:Q1", "e:Q2"],
        "label": ["Statlib", "ScalaKit"],
        "aliases": [["STATLIB", "Stat-Lib"], []],
    }))
    out = {r.entity_id: json.loads(r.entity_json)
           for r in cv.to_wikidata(nodes, statements).collect()}
    q1 = out["e:Q1"]
    assert q1["type"] == "item" and q1["id"] == "e:Q1"
    assert q1["labels"] == {"en": "Statlib"}
    assert q1["aliases"] == {"en": ["STATLIB", "Stat-Lib"]}
    assert "descriptions" not in q1  # absent field stays absent
    assert {s["value"] for s in q1["claims"]["P277"]} == {"Python", "Rust"}
    assert out["e:Q2"]["aliases"] == {"en": []}


def test_simple_format_renames_qualifiers(spark):
    """The reference's simple conversion is recursive (converter.py:21-62);
    with columnar statements that means qualifier props/values get the
    naming join too, order preserved."""
    stmts = spark.createDataFrame(pd.DataFrame({
        "canonical_id": ["e:Q1"],
        "prop": ["P277"],
        "value": ["Q28865"],
        "datatype": ["string"],
        "source": ["transcripts"],
        "count": [2],
        "qualifiers": [[
            {"prop": "P2677", "value": "c1:0", "datatype": "string"},
            {"prop": "P2677", "value": "c2:3", "datatype": "string"},
        ]],
    }))
    naming = spark.createDataFrame(pd.DataFrame({
        "id": ["P277", "Q28865", "P2677"],
        "name": ["programming language", "Python",
                 "relative position within image"],
    }))
    r = cv.to_simple(stmts, naming).collect()[0]
    assert r.property == "programming language" and r.value == "Python"
    assert [(q.prop, q.value) for q in r.qualifiers] == [
        ("relative position within image", "c1:0"),
        ("relative position within image", "c2:3")]
    # statements without qualifiers -> empty array, not null
    r2 = cv.to_simple(stmts.drop("qualifiers").withColumn(
        "qualifiers", F.array().cast(
            "array<struct<prop:string,value:string,datatype:string>>")),
        naming).collect()[0]
    assert r2.qualifiers == []


def test_simple_format_qualifier_no_collision(spark):
    """Two raw values renaming to the SAME display name must keep their
    own qualifier lists (regroup keys on raw ids, not renamed ones)."""
    stmts = spark.createDataFrame(pd.DataFrame({
        "canonical_id": ["e:Q1", "e:Q1"],
        "prop": ["P277", "P277"],
        "value": ["Q1x", "Q2x"],
        "datatype": ["string"] * 2,
        "source": ["transcripts"] * 2,
        "count": [1, 1],
        "qualifiers": [
            [{"prop": "P2677", "value": "c1:0", "datatype": "string"}],
            [{"prop": "P2677", "value": "c9:9", "datatype": "string"}],
        ],
    }))
    naming = spark.createDataFrame(pd.DataFrame({
        "id": ["Q1x", "Q2x"], "name": ["Python", "Python"],
    }))
    rows = cv.to_simple(stmts, naming).collect()
    assert len(rows) == 2
    quals = sorted(tuple(q.value for q in r.qualifiers) for r in rows)
    assert quals == [("c1:0",), ("c9:9",)]


def test_simple_format_null_component_no_collision(spark):
    """NULL prop/value components must not collide the qualifier regroup
    key (concat_ws skipped NULLs; the key is JSON-encoded now)."""
    stmts = spark.createDataFrame(
        [("e:Q1", None, "x", "string", "t", 1,
          [{"prop": "P2677", "value": "a:0", "datatype": "string"}]),
         ("e:Q1", "x", None, "string", "t", 1,
          [{"prop": "P2677", "value": "b:9", "datatype": "string"}])],
        "canonical_id string, prop string, value string, datatype string, "
        "source string, count long, "
        "qualifiers array<struct<prop:string,value:string,datatype:string>>")
    naming = spark.createDataFrame(pd.DataFrame({"id": ["x"], "name": ["X"]}))
    rows = cv.to_simple(stmts, naming).collect()
    assert len(rows) == 2
    quals = sorted(tuple(q.value for q in r.qualifiers) for r in rows)
    assert quals == [("a:0",), ("b:9",)]
    # repeated qualifiers WITHIN one statement survive (no list distinct)
    stmts2 = spark.createDataFrame(
        [("e:Q1", "x", "y", "string", "t", 1,
          [{"prop": "P2677", "value": "a:0", "datatype": "string"},
           {"prop": "P2677", "value": "a:0", "datatype": "string"}])],
        stmts.schema)
    r2 = cv.to_simple(stmts2, naming).collect()[0]
    assert [q.value for q in r2.qualifiers] == ["a:0", "a:0"]


def test_simple_format_same_scalars_distinct_qualifiers(spark):
    """Two statements identical on EVERY scalar field but carrying
    different qualifier lists are distinct rows; the qualifiers column is
    part of the regroup key, so neither list is silently assigned to the
    other row (fold_statements can't emit such rows, but to_simple is a
    public API)."""
    stmts = spark.createDataFrame(
        [("e:Q1", "P277", "x", "string", "t", 1,
          [{"prop": "P2677", "value": "a:0", "datatype": "string"}]),
         ("e:Q1", "P277", "x", "string", "t", 1,
          [{"prop": "P2677", "value": "b:9", "datatype": "string"}])],
        "canonical_id string, prop string, value string, datatype string, "
        "source string, count long, "
        "qualifiers array<struct<prop:string,value:string,datatype:string>>")
    naming = spark.createDataFrame(pd.DataFrame({"id": ["x"], "name": ["X"]}))
    rows = cv.to_simple(stmts, naming).collect()
    assert len(rows) == 2
    quals = sorted(tuple(q.value for q in r.qualifiers) for r in rows)
    assert quals == [("a:0",), ("b:9",)]


def test_jsonl_empty_object_not_corrupt(spark, tmp_path):
    """A syntactically valid line whose fields are all absent ('{}') is
    NOT corrupt; a malformed line is."""
    p = tmp_path / "d.jsonl"
    p.write_text('{"id": "Q1", "labels": null}\n{}\n{"id": null}\nnot json\n')
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("labels", T.StringType()),
    ])
    rows = js.read_jsonl_dump(spark, str(p), schema,
                              strip_trailing_comma=False).collect()
    corrupt = [r for r in rows if r._corrupt is not None]
    clean = [r for r in rows if r._corrupt is None]
    assert len(corrupt) == 1 and corrupt[0]._corrupt == "not json"
    assert len(clean) == 3
    assert {r.entity.id for r in clean} == {"Q1", None}


def test_fetch_cached_dedup_writeback_and_failure_cache(spark, tmp_path):
    """sources/fetch.fetch_cached: each distinct URL fetches ONCE per
    call (side effect counted via marker files — transports run on
    executors), results commit to the cache table, cached failures are
    not re-fetched unless retry_failures=True."""
    import os

    from softcite_kb_spark.sources.fetch import fetch_cached
    from softcite_kb_spark.storage import TableStore

    marks = str(tmp_path / "marks")
    os.makedirs(marks)

    def transport(url):
        with open(os.path.join(marks, url.replace("/", "_")), "a") as f:
            f.write("x\n")
        if "bad" in url:
            raise IOError("boom")
        return f"payload:{url}".encode()

    def n_calls():
        total = 0
        for f in os.listdir(marks):
            with open(os.path.join(marks, f)) as fh:
                total += sum(1 for _ in fh)
        return total

    store = TableStore(str(tmp_path / "cache"))
    reqs = spark.createDataFrame(pd.DataFrame(
        {"url": ["http://a/1", "http://a/1", "http://a/2", "http://bad/x"],
         "tag": ["p", "q", "r", "s"]}))
    out = fetch_cached(reqs, store, transport, n_tasks=2)
    rows = {(r.tag): (bytes(r.data) if r.data is not None else None,
                      r.success, r.from_cache) for r in out.collect()}
    assert rows["p"] == (b"payload:http://a/1", True, False)
    assert rows["q"] == (b"payload:http://a/1", True, False)
    assert rows["r"] == (b"payload:http://a/2", True, False)
    assert rows["s"] == (None, False, False)
    assert n_calls() == 3  # duplicate URL fetched once; failure counted

    # second call: everything settled -> ZERO transport calls, all hits
    out2 = fetch_cached(reqs, store, transport, n_tasks=2)
    assert n_calls() == 3
    assert all(r.from_cache for r in out2.collect())
    # cached failure row comes back as a failure, not dropped
    s2 = [r for r in out2.collect() if r.tag == "s"][0]
    assert s2.success is False and s2.from_cache

    # a new URL fetches exactly once more
    reqs3 = spark.createDataFrame(pd.DataFrame(
        {"url": ["http://a/3", "http://a/1"], "tag": ["t", "u"]}))
    out3 = {r.tag: r.from_cache for r in
            fetch_cached(reqs3, store, transport, n_tasks=2).collect()}
    assert n_calls() == 4
    assert out3 == {"t": False, "u": True}

    # retry_failures re-fetches ONLY the failed key
    fetch_cached(reqs, store, transport, n_tasks=2, retry_failures=True)
    assert n_calls() == 5


def test_fetch_cached_empty_requests(spark, tmp_path):
    """Empty request set against a store with no cache table yet: no
    fetch, no crash, empty result with the full output schema."""
    from softcite_kb_spark.sources.fetch import fetch_cached
    from softcite_kb_spark.storage import TableStore

    store = TableStore(str(tmp_path / "cache"))
    reqs = spark.createDataFrame([], "url string, tag string")
    out = fetch_cached(reqs, store, lambda u: b"x")
    assert out.count() == 0
    assert {"cache_key", "data", "success", "from_cache"} <= set(out.columns)
