"""Bibliographic / HTML / TEI document parsers (reference F14, F15, S4/S6).

F14 — bibtex parsing + signature dedup (populate_staging_area.py:425-553):
the reference uses pybtex per-row; pybtex is not in this container, so the
parser is a regex-grammar pandas UDF covering the fields the reference
projects (type, key, title, author, year, journal/booktitle). The
alnum-only dedup signature is a native Column (dedup itself =
dropDuplicates on it).

F15 — TEI-XML bibliographical reference parse (tei2json,
populate_staging_area.py:615-751): the reference runs an lxml xpath
battery over GROBID-produced ``<biblStruct>`` fragments and emits a
simplified-CrossRef dict. lxml is not in this container; the same field
battery is re-expressed as a scoped regex grammar (analytic / monogr /
imprint / meeting blocks first, then per-field matches inside the right
scope — matching the xpath axes) in an Arrow-batched pandas UDF. GROBID
TEI is machine-generated, well-formed, and entity-escaped, which is what
makes the regex kernel safe; a real deployment swaps in an XML parser
inside the same mapInPandas plumbing.

S4/S6 — CRAN package-page / citation-page scrape (cran_import.py:198-331,
:135-151): BeautifulSoup per page in the reference; here a vectorized
regex extraction of the same shape — <h2> title, two-column attribute
table rows, <blockquote> citation blocks. A real deployment would swap the
regex kernel for an HTML parser inside the same mapInPandas plumbing.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

BIBTEX_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("entry_type", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("author", T.StringType()),
    T.StructField("year", T.StringType()),
    T.StructField("venue", T.StringType()),
]))

_ENTRY_RE = re.compile(r"@(\w+)\s*\{\s*([^,\s]+)\s*,", re.S)
_FIELD_RE = re.compile(
    r"(\w+)\s*=\s*(?:\{((?:[^{}]|\{[^{}]*\})*)\}|\"([^\"]*)\")", re.S)


@F.pandas_udf(BIBTEX_SCHEMA)
def parse_bibtex(blocks: pd.Series) -> pd.Series:
    def one(s):
        if not s:
            return []
        out = []
        entries = list(_ENTRY_RE.finditer(s))
        for i, m in enumerate(entries):
            end = entries[i + 1].start() if i + 1 < len(entries) else len(s)
            body = s[m.end():end]
            fields = {}
            for fm in _FIELD_RE.finditer(body):
                fields[fm.group(1).lower()] = (
                    fm.group(2) if fm.group(2) is not None else fm.group(3))
            out.append({
                "entry_type": m.group(1).lower(),
                "key": m.group(2),
                "title": fields.get("title"),
                "author": fields.get("author"),
                "year": fields.get("year"),
                "venue": fields.get("journal") or fields.get("booktitle"),
            })
        return out

    return blocks.map(one)


def bib_signature(title_col):
    """F14 dedup signature: alnum-only lower title
    (populate_staging_area.py:545-553 semantics)."""
    c = F.col(title_col) if isinstance(title_col, str) else title_col
    return F.regexp_replace(F.lower(c), "[^a-z0-9]", "")


HTML_PAGE_SCHEMA = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    T.StructField("citations", T.ArrayType(T.StringType())),
])

_H2_RE = re.compile(r"<h2[^>]*>(.*?)</h2>", re.S | re.I)
_P_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.S | re.I)
_ROW_RE = re.compile(
    r"<tr[^>]*>\s*<td[^>]*>\s*([^<:]+):?\s*</td>\s*<td[^>]*>(.*?)</td>",
    re.S | re.I)
_BQ_RE = re.compile(r"<blockquote[^>]*>(.*?)</blockquote>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _text(html_fragment: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", html_fragment)).strip()


@F.pandas_udf(HTML_PAGE_SCHEMA)
def parse_package_page(html: pd.Series) -> pd.DataFrame:
    """CRAN-shaped package page -> (title, description, attrs, citations).

    A StructType pandas UDF must return a pandas DataFrame (one column per
    struct field), not a Series of dicts.
    """

    def one(s):
        if not s:
            return (None, None, {}, [])
        h2 = _H2_RE.search(s)
        p = _P_RE.search(s)
        attrs = {_text(k): _text(v) for k, v in _ROW_RE.findall(s)}
        cites = [_text(b) for b in _BQ_RE.findall(s)]
        return (
            _text(h2.group(1)) if h2 else None,
            _text(p.group(1)) if p else None,
            attrs,
            cites,
        )

    parsed = [one(s) for s in html]
    return pd.DataFrame(
        parsed, columns=["title", "description", "attrs", "citations"])


# ---------------------------------------------------------------------------
# F15 — TEI-XML biblStruct parse (tei2json, populate_staging_area.py:615-751)
# ---------------------------------------------------------------------------

TEI_BIBLIO_SCHEMA = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("doi", T.StringType()),
    T.StructField("pmid", T.StringType()),
    T.StructField("pmcid", T.StringType()),
    T.StructField("oa_link", T.StringType()),
    T.StructField("authors", T.ArrayType(T.StructType([
        T.StructField("given", T.StringType()),
        T.StructField("family", T.StringType()),
    ]))),
    T.StructField("journal", T.StringType()),
    T.StructField("monograph", T.StringType()),
    T.StructField("publisher", T.StringType()),
    T.StructField("volume", T.StringType()),
    T.StructField("issue", T.StringType()),
    T.StructField("page", T.StringType()),
    T.StructField("issn", T.StringType()),
    T.StructField("isbn", T.StringType()),
    T.StructField("date", T.StringType()),
    T.StructField("year", T.StringType()),
    T.StructField("event", T.StringType()),
])


def _scope(s: str, tag: str) -> str:
    """Inner text of the first <tag>...</tag> block ('' if absent) —
    the regex analog of descending one xpath axis."""
    m = re.search(rf"<{tag}[\s>].*?</{tag}>", s, re.S)
    return m.group(0) if m else ""


def _elem_text(s: str, pattern: str) -> str | None:
    """First match's inner text, unescaped+collapsed (None if absent or
    empty — mirrors _get_first_value_xpath's .text semantics)."""
    m = re.search(pattern, s, re.S)
    if not m:
        return None
    txt = _WS_RE.sub(" ", _html.unescape(m.group(1))).strip()
    return txt or None


def _attr(s: str, pattern: str) -> str | None:
    m = re.search(pattern, s, re.S)
    return m.group(1) if m else None


def _parse_tei_one(tei: str) -> tuple:
    if not tei or "<biblStruct" not in tei:
        return (None,) * 5 + ([],) + (None,) * 11
    analytic = _scope(tei, "analytic")
    monogr = _scope(tei, "monogr")
    imprint = _scope(monogr, "imprint")
    meeting = _scope(monogr, "meeting")

    title = _elem_text(analytic, r'<title[^>]*level="a"[^>]*>(.*?)</title>')
    doi = _elem_text(analytic, r'<idno[^>]*type="DOI"[^>]*>(.*?)</idno>')
    pmid = _elem_text(analytic, r'<idno[^>]*type="PMID"[^>]*>(.*?)</idno>')
    pmcid = _elem_text(analytic, r'<idno[^>]*type="PMCID"[^>]*>(.*?)</idno>')
    oa_link = _attr(
        analytic, r'<ptr[^>]*type="open-access"[^>]*target="([^"]*)"')

    authors = []
    for am in re.finditer(r"<author[\s>].*?</author>", analytic, re.S):
        pm = re.search(r"<persName[\s>].*?</persName>", am.group(0), re.S)
        if not pm:
            continue
        pers = pm.group(0)
        # unescape like _elem_text does — lxml .text semantics apply to
        # forenames just as to every other field
        fornames = [
            _WS_RE.sub(" ", _html.unescape(f)).strip()
            for f in re.findall(r"<forename[^>]*>(.*?)</forename>", pers, re.S)
        ]
        family = _elem_text(pers, r"<surname[^>]*>(.*?)</surname>")
        given = " ".join(f for f in fornames if f) or None
        authors.append({"given": given, "family": family})

    journal = _elem_text(monogr, r'<title[^>]*level="j"[^>]*>(.*?)</title>')
    monograph = _elem_text(monogr, r'<title[^>]*level="m"[^>]*>(.*?)</title>')
    publisher = _elem_text(imprint, r"<publisher[^>]*>(.*?)</publisher>")
    volume = _elem_text(
        imprint, r'<biblScope[^>]*unit="volume"[^>]*>(.*?)</biblScope>')
    issue = _elem_text(
        imprint, r'<biblScope[^>]*unit="issue"[^>]*>(.*?)</biblScope>')
    # page: @from-@to preferred, else the element text (reference :731-738)
    page_el = re.search(r'<biblScope[^>]*unit="page"[^>]*(?:/>|>(.*?)</biblScope>)',
                        imprint, re.S)
    page = None
    if page_el:
        frm = _attr(page_el.group(0), r'from="([^"]*)"')
        to = _attr(page_el.group(0), r'to="([^"]*)"')
        if frm is not None and to is not None:
            page = f"{frm}-{to}"
        elif page_el.group(1):
            # same .text semantics as every other field: unescape entities
            page = _WS_RE.sub(
                " ", _html.unescape(page_el.group(1))).strip() or None
    issn = _elem_text(monogr, r'<idno[^>]*type="ISSN"[^>]*>(.*?)</idno>')
    isbn = _elem_text(monogr, r'<idno[^>]*type="ISBN"[^>]*>(.*?)</idno>')
    # date = @when of imprint/date[@type="published"] (reference _get_date_xpath)
    date = _attr(imprint, r'<date[^>]*type="published"[^>]*when="([^"]*)"')
    if date is None:
        date = _attr(imprint, r'<date[^>]*when="([^"]*)"[^>]*type="published"')
    year = date.split("-")[0] if date else None
    event = _elem_text(meeting, r"<title[^>]*>(.*?)</title>")

    return (title, doi, pmid, pmcid, oa_link, authors, journal, monograph,
            publisher, volume, issue, page, issn, isbn, date, year, event)


@F.pandas_udf(TEI_BIBLIO_SCHEMA)
def parse_tei_biblio(tei: pd.Series) -> pd.DataFrame:
    """TEI <biblStruct> -> simplified-CrossRef row (F15).

    Field battery mirrors tei2json (populate_staging_area.py:615-751):
    analytic title/DOI/PMID/PMCID/oaLink, persName authors (given=joined
    forenames, family=surname), monogr journal/monograph titles, imprint
    publisher/volume/issue/page(from-to | text)/date@when (+derived year),
    monogr ISSN/ISBN, meeting title as event. The reference's
    biblio-glutton lookup branch (:658-663) is an external service call —
    out of engine scope; join the output against a curated biblio dimension
    for the same effect (J-family).
    """
    parsed = [_parse_tei_one(s) for s in tei]
    return pd.DataFrame(parsed, columns=[f.name for f in TEI_BIBLIO_SCHEMA.fields])
