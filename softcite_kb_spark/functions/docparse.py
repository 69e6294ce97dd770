"""Bibliographic / HTML document parsers (reference F14, S4/S6).

F14 — bibtex parsing + signature dedup (populate_staging_area.py:425-553):
the reference uses pybtex per-row; pybtex is not in this container, so the
parser is a regex-grammar pandas UDF covering the fields the reference
projects (type, key, title, author, year, journal/booktitle). The
alnum-only dedup signature is a native Column (dedup itself =
dropDuplicates on it).

S4/S6 — CRAN package-page / citation-page scrape (cran_import.py:198-331,
:135-151): BeautifulSoup per page in the reference; here a vectorized
regex extraction of the same shape — <h2> title, two-column attribute
table rows, <blockquote> citation blocks. A real deployment would swap the
regex kernel for an HTML parser inside the same mapInPandas plumbing.
"""

from __future__ import annotations

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
