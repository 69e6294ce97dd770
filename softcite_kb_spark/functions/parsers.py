"""Vectorized field parsers (reference F13 family, import_common.py).

The reference parses R metadata fields row-at-a-time in Python
(import_common.py:15-211): `person("Given", "Family", role=c("aut","cre"),
email=..., comment=c(ORCID=...))` author fields, maintainer strings, URL
lists, boolean fields. Here each parser is an Arrow-batched pandas UDF
using vectorized Series.str ops — the per-row logic the reference loops
over becomes one regex pass per batch.

These are genuinely procedural string grammars (nested parens, quoted
args) — the one class of function where a pandas UDF beats fighting SQL
regexes (SURVEY.md 7.6).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

ORCID_RE = re.compile(r"(\d{4}-\d{4}-\d{4}-\d{3}[\dX])")
# ref import_common.py:4-5 — ORCID regex extract (F2)

# nested parens (role = c(...)) make a single regex for the whole
# person(...) call fragile — we split on 'person(' and parse each segment
PERSON_OPEN_RE = re.compile(r"person\s*\(")
NAME_HEAD_RE = re.compile(r'^\s*"(?P<given>[^"]*)"\s*(?:,\s*"(?P<family>[^"]*)")?')
ROLE_RE = re.compile(r'"(aut|cre|ctb|cph|trl|com)"')
EMAIL_RE = re.compile(r'email\s*=\s*"([^"]+)"')

PERSON_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("given", T.StringType()),
    T.StructField("family", T.StringType()),
    T.StructField("roles", T.ArrayType(T.StringType())),
    T.StructField("email", T.StringType()),
    T.StructField("orcid", T.StringType()),
]))


@F.pandas_udf(PERSON_SCHEMA)
def parse_r_persons(field: pd.Series) -> pd.Series:
    """R `person(...)` author-field parser (import_common.py:15-122).

    Returns one struct per person with given/family/roles/email/orcid.
    Plain "Given Family <email>" fallback for non-person() strings
    (import_common.py:125-211 maintainer format).
    """

    def one(s):
        if s is None or not str(s).strip():
            return []
        s = str(s)
        out = []
        opens = list(PERSON_OPEN_RE.finditer(s))
        for i, m in enumerate(opens):
            seg_end = opens[i + 1].start() if i + 1 < len(opens) else len(s)
            seg = s[m.end():seg_end]
            head = NAME_HEAD_RE.match(seg)
            if not head:
                continue
            em = EMAIL_RE.search(seg)
            oc = ORCID_RE.search(seg)
            out.append({
                "given": head.group("given") or None,
                "family": head.group("family") or None,
                "roles": ROLE_RE.findall(seg),
                "email": em.group(1) if em else None,
                "orcid": oc.group(1) if oc else None,
            })
        if not out:
            # maintainer-style fallbacks. The anchored "Given Family
            # <email>" pattern can consume no comma, so handle
            # "Family, Given <email>" (common R style) explicitly, then
            # comma-separated multi-maintainer lists, then the plain form.
            fg = re.match(
                r"\s*([^<,]+?)\s*,\s*([^<,]+?)\s*(?:<([^>]+)>)?\s*$", s)
            if fg:
                out.append({
                    "given": fg.group(2) or None,
                    "family": fg.group(1) or None,
                    "roles": [],
                    "email": fg.group(3),
                    "orcid": (ORCID_RE.search(s).group(1)
                              if ORCID_RE.search(s) else None),
                })
            else:
                # split persons on commas OUTSIDE <...>
                for seg in re.split(r",(?![^<]*>)", s):
                    m = re.match(r"\s*([^<,]+?)\s*(?:<([^>]+)>)?\s*$", seg)
                    if not (m and m.group(1)):
                        continue
                    toks = m.group(1).split()
                    out.append({
                        "given": " ".join(toks[:-1]) or None,
                        "family": toks[-1] if toks else None,
                        "roles": [],
                        "email": m.group(2),
                        "orcid": (ORCID_RE.search(seg).group(1)
                                  if ORCID_RE.search(seg) else None),
                    })
        return out

    return field.map(one)


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def extract_orcid(col):
    """F2 — ORCID regex extract as a native Column (import_common.py:96-103)."""
    col = _c(col)
    return F.nullif(
        F.regexp_extract(col, r"(\d{4}-\d{4}-\d{4}-\d{3}[\dX])", 1), F.lit(""))


def parse_url_field(col):
    """F13/url — split multi-URL fields on comma/whitespace, keep http(s)
    entries, strip trailing punctuation (import_common.py:213-228)."""
    col = _c(col)
    return F.filter(
        F.transform(
            F.split(col, r"[,\s]+"),
            lambda u: F.regexp_replace(F.trim(u), r"[.,;]+$", ""),
        ),
        lambda u: u.rlike("^https?://"),
    )


def parse_boolean_field(col):
    """F13/boolean — 'yes'/'true'/'TRUE' -> true (import_common.py:250-255)."""
    col = _c(col)
    return F.lower(F.trim(col)).isin("yes", "true", "t", "1")


def is_git_repo(col):
    """F3 — forge-URL prefix test (import_common.py:7-13)."""
    col = _c(col)
    return col.rlike("(github\\.com|gitlab\\.com|bitbucket\\.org|sourceforge\\.net)")
