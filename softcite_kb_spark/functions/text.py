"""Name normalization / variant / blocking-key Column functions.

Each mirrors a reference helper (cited), re-expressed as native Spark SQL
expressions so they run inside whole-stage codegen — the reference versions
are per-row Python (its single biggest throughput sink).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_field(col: Column) -> Column:
    """Whitespace collapse + trim. Ref: import_common.py:280-284.

    Exactly ``trim(regexp_replace(col, r'\\s+', ' '))``, decomposed so the
    regex only runs when it would do something: Java ``\\s`` is precisely
    ``[ \\t\\n\\x0b\\f\\r]``, so mapping the five non-space whitespace
    chars to ' ' via ``translate`` (cheap per-char) and then collapsing
    runs only when a double space is present (one substring probe) yields
    the identical string — and on this host the regex replace was the
    single most expensive per-char operation in the fold path.
    """
    s = F.translate(col, "\t\n\x0b\f\r", "     ")
    return F.trim(
        F.when(F.contains(s, F.lit("  ")), F.regexp_replace(s, " +", " "))
        .otherwise(s))


# Every character that can START a castable-to-double string: whitespace/
# control (cast trimAll strips code units <= 0x20), sign, dot, digit, and
# the nan/inf initials. Exhaustively verified against try_cast over the
# first-character space (codepoints 0..0x24F x suffix variants).
_NUM_FIRST = tuple(range(0x21)) + tuple(ord(c) for c in "+-.0123456789INin")


def is_number(col: Column) -> Column:
    """True if the string parses as a number. Ref: software_mention_import.py:172-177.

    The ``ascii()`` first-character guard short-circuits the full parse
    attempt: ``try_cast('double')`` measured ~4 us/value on the extraction
    filter path (it dominated the stage), while a codepoint set probe is
    ~free and rejects the overwhelmingly common non-numeric-looking name.
    The guard is a NECESSARY condition of castability, so the conjunction
    is exactly equivalent (ANSI-safe, Spark 4 default).
    """
    return F.ascii(col).isin(*_NUM_FIRST) & col.try_cast("double").isNotNull()


def capitalized_variant(col: Column) -> Column:
    """ALL-CAPS name -> Title Case variant, else NULL.

    Ref: merge.py:299-318 (_capitalized_variant): 'STATA'->'Stata',
    'MICROSOFT WORD'->'Microsoft Word'; already-mixed-case names (e.g.
    'knitr', 'Stata') produce no variant.
    """
    title = F.initcap(F.lower(col))
    return F.when((col == F.upper(col)) & (col != title), title)


def hyphen_variant(col: Column) -> Column:
    """Swap a single hyphen <-> single space, else NULL.

    Ref: merge.py:320-335 (_hyphen_variant): 'STAR-aligner' <-> 'STAR aligner'
    only when the name contains exactly one of the two separators.
    """
    n_hyphen = F.length(col) - F.length(F.regexp_replace(col, "-", ""))
    n_space = F.length(col) - F.length(F.regexp_replace(col, " ", ""))
    return (
        F.when((n_hyphen == 1) & (n_space == 0), F.regexp_replace(col, "-", " "))
        .when((n_space == 1) & (n_hyphen == 0), F.regexp_replace(col, " ", "-"))
    )


def norm_name(col: Column) -> Column:
    """Case/separator-insensitive canonical name for same-name folding.

    Analog of the reference's software_name_processed keying
    (populate_from_mentions.py:173-266) widened with the variant space of
    merge.py:299-335: lower-case, hyphens as spaces, whitespace collapsed.
    """
    return clean_field(F.lower(F.translate(col, "-", " ")))


def block_key(col: Column) -> Column:
    """Blocking key for candidate generation: lower-cased alnum-only.

    Analog of the hash-indexed lookup keys (index_name_key / labels+aliases
    hash indexes, populate_staging_area.py:94-128) and the alnum signature
    dedup of populate_staging_area.py:425-553.
    """
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def title_author_key(title: Column, first_author_family: Column) -> Column:
    """Document blocking key. Ref: populate_staging_area.py:879-897
    (title_author_key): lower-cased de-spaced title + '_' + family name."""
    return F.concat_ws(
        "_",
        F.regexp_replace(F.lower(title), r"\s+", ""),
        F.lower(F.coalesce(first_author_family, F.lit(""))),
    )
