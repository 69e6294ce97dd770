"""Tests for vectorized field parsers (F13 family) and entity
simplification (P3) + cache join (S7/S8)."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from softcite_kb_spark.functions import parsers as pr
from softcite_kb_spark.operators import simplify as sp


def test_parse_r_persons(spark):
    # strings shaped like the reference's test_field_processing.py:8-27
    pdf = pd.DataFrame({"field": [
        'person("Yihui", "Xie", role = c("aut", "cre"), '
        'email = "xie@example.org", comment = c(ORCID = "0000-0003-0645-5666"))',
        'person("Hadley", "Wickham", role = "aut")',
        "Duncan Temple Lang <duncan@example.org>",
        "",
    ]})
    df = spark.createDataFrame(pdf)
    rows = df.select(pr.parse_r_persons("field").alias("p")).collect()
    p0 = rows[0].p[0]
    assert (p0.given, p0.family) == ("Yihui", "Xie")
    assert set(p0.roles) == {"aut", "cre"}
    assert p0.email == "xie@example.org"
    assert p0.orcid == "0000-0003-0645-5666"
    p1 = rows[1].p[0]
    assert p1.family == "Wickham" and p1.roles == ["aut"]
    p2 = rows[2].p[0]
    assert (p2.given, p2.family) == ("Duncan Temple", "Lang")
    assert p2.email == "duncan@example.org"
    assert rows[3].p == []


def test_url_orcid_boolean_git(spark):
    pdf = pd.DataFrame({"u": [
        "https://github.com/yihui/knitr, http://yihui.org/knitr/.",
        "not a url",
    ], "b": ["yes", "nope"]})
    df = spark.createDataFrame(pdf)
    out = df.select(
        pr.parse_url_field("u").alias("urls"),
        pr.parse_boolean_field("b").alias("flag"),
        pr.is_git_repo("u").alias("git"),
    ).collect()
    assert out[0].urls == ["https://github.com/yihui/knitr",
                           "http://yihui.org/knitr/"]
    assert out[0].flag is True and out[0].git is True
    assert out[1].urls == [] and out[1].flag is False and out[1].git is False
    orc = df.select(pr.extract_orcid(
        F.lit("see 0000-0003-0645-5666 here")).alias("o")).first().o
    assert orc == "0000-0003-0645-5666"


RAW_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
    T.StructField("descriptions", T.MapType(T.StringType(), T.StringType())),
    T.StructField("aliases", T.MapType(T.StringType(),
                                       T.ArrayType(T.StringType()))),
    T.StructField("claims", T.MapType(T.StringType(), T.ArrayType(
        T.StructType([
            T.StructField("value_id", T.StringType()),
            T.StructField("value_str", T.StringType()),
            T.StructField("datatype", T.StringType()),
        ])))),
])


def test_simplify_entities(spark):
    rows = [
        ("Q1", {"en": "knitr", "fr": "knitr-fr"}, {"en": "R package"},
         {"en": ["Knitr"], "de": ["x"]},
         {"P31": [{"value_id": "Q7397", "value_str": None,
                   "datatype": "wikibase-item"}],
          "P277": [{"value_id": None, "value_str": "R",
                    "datatype": "string"}],
          "P999": []}),
        ("Q2", {"fr": "only-french"}, {}, {}, {}),
    ]
    df = spark.createDataFrame(rows, schema=RAW_SCHEMA)
    out = sp.simplify_entities(df).collect()
    assert len(out) == 1  # Q2 dropped: no english label
    e = out[0]
    assert e.label == "knitr" and e.description == "R package"
    assert e.aliases == ["Knitr"]
    assert "P999" not in e.claims  # empty property dropped
    assert e.claims["P31"][0].value == "Q7397"  # snak collapsed to Q-id
    assert e.claims["P277"][0].value == "R"


def test_simplify_time_value(spark):
    got = spark.range(1).select(sp.simplify_time_value(
        F.lit("+2019-10-25T00:00:00Z")).alias("d")).first().d
    assert str(got) == "2019-10-25"


def test_cache_join(spark):
    reqs = spark.createDataFrame(pd.DataFrame({
        "url": ["http://a", "http://b", "http://c"]}))
    cache = spark.createDataFrame(pd.DataFrame({
        "cache_key": [
            __import__("hashlib").md5(b"http://a").hexdigest(),
            __import__("hashlib").md5(b"http://b").hexdigest(),
        ],
        "data": ["payload-a", "payload-b"],
        "success": [True, False],
    }))
    hits, misses = sp.cache_join(reqs, cache)
    assert {r.url for r in hits.collect()} == {"http://a"}
    # failed cache entries are retried as misses? no: success=False is a
    # recorded failure -> not a hit; miss = never seen (c) only
    assert {r.url for r in misses.collect()} == {"http://c"}


def test_maintainer_comma_formats(spark):
    """'Family, Given <email>' and comma-separated multi-maintainer lists
    must parse instead of silently returning [] (the anchored fallback
    regex could not consume a comma)."""
    df = spark.createDataFrame(pd.DataFrame({"field": [
        "Doe, Jane <jane@x.org>",
        "Jane Doe <jane@x.org>, Bob Roe <bob@y.org>",
        "Jane Doe <jane@x.org>",
    ]}))
    rows = df.select(pr.parse_r_persons("field").alias("p")).collect()
    fg = rows[0].p
    assert len(fg) == 1 and fg[0].family == "Doe" and fg[0].given == "Jane"
    assert fg[0].email == "jane@x.org"
    multi = rows[1].p
    assert [(x.given, x.family, x.email) for x in multi] == [
        ("Jane", "Doe", "jane@x.org"), ("Bob", "Roe", "bob@y.org")]
    plain = rows[2].p
    assert len(plain) == 1 and plain[0].family == "Doe"
