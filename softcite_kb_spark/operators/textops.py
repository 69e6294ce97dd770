"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting over a ``documents(doc_id, text, ...)`` table.
All pure Column expressions (whole-stage codegen; zero Python in the hot
path), written so an ANSI-SQL oracle (DuckDB) can reproduce values exactly:
float outputs are rounded to 6 decimals, hashes are md5-based.

These have no direct reference analog (softcite_kb receives pre-mined text);
they are the corpus-preparation stage a 100 TB transcript pipeline needs
before extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NOTE: keep these lists in sync with the SQL oracles in __spark_entry__.py.
STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
                "was", "for", "on", "with", "as", "at", "by", "be", "this")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit",
                "von", "auf", "nicht", "ich", "sie", "es")
STOPWORDS_FR = ("le", "la", "les", "et", "est", "un", "une", "de", "du", "des",
                "que", "pas", "pour", "dans", "il")
STOPWORDS_ES = ("el", "la", "los", "las", "y", "es", "un", "una", "de", "del",
                "que", "no", "por", "para", "en")

_PUNCT_CLASS = r"""[.,;:!?'"()\[\]\-]"""


def tokens(text: Column) -> Column:
    """Whitespace tokenization; the shared basis of every op here.

    NOTE: split('') yields [''], so consumers that count or iterate must
    drop empty tokens — :func:`nonempty_tokens` does; the dedup kernels
    filter inline.
    """
    return F.split(F.trim(text), r"\s+")


def nonempty_tokens(text: Column) -> Column:
    return F.filter(tokens(text), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Non-empty token count: 0 for empty/whitespace-only text (the raw
    split-array size reports 1 for '' — the [''] quirk)."""
    return F.size(nonempty_tokens(text))


def _sw_count(toks: Column, words: tuple[str, ...]) -> Column:
    # filter() higher-order function keeps this JVM-side
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count + punctuation/digit ratios + per-language stopword ratios."""
    out = (
        df.withColumn("__toks", nonempty_tokens(F.col(text_col)))
        .withColumn("n_tokens", F.size("__toks"))
        .withColumn("n_chars_calc", F.length(text_col))
        # the ratios count occurrences of FIXED ASCII character sets —
        # length(translate(...)) deletes exactly the same characters the
        # regex classes match, at per-char map-lookup cost instead of a
        # regex append loop (the dominant q14 cost on this host)
        .withColumn(
            "punct_ratio",
            F.round(
                (F.length(text_col)
                 - F.length(F.translate(F.col(text_col),
                                        ".,;:!?'\"()[]-", "")))
                / F.greatest(F.length(text_col), F.lit(1)), 6))
        .withColumn(
            "digit_ratio",
            F.round(
                (F.length(text_col)
                 - F.length(F.translate(F.col(text_col),
                                        "0123456789", "")))
                / F.greatest(F.length(text_col), F.lit(1)), 6))
    )
    for lang, words in (("en", STOPWORDS_EN), ("de", STOPWORDS_DE),
                        ("fr", STOPWORDS_FR), ("es", STOPWORDS_ES)):
        out = out.withColumn(
            f"sw_{lang}",
            F.round(_sw_count(F.col("__toks"), words)
                    / F.greatest(F.col("n_tokens"), F.lit(1)), 6))
    return out.drop("__toks")


def quality_from_stats(stats: DataFrame) -> DataFrame:
    """Quality column from an EXISTING text_stats projection — callers
    composing several text measures over one corpus pass use this to
    avoid re-tokenizing (each public wrapper tokenizes internally)."""
    return stats.withColumn(
        "quality",
        F.round(
            0.4 * F.least(F.lit(1.0), F.col("n_tokens") / 64.0)
            + 0.3 * (1.0 - F.least(F.lit(1.0), F.col("punct_ratio") * 5.0))
            + 0.3 * F.least(F.lit(1.0), F.col("sw_en") * 4.0), 6))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic in [0,1]:
    length saturation + low punctuation + stopword presence.

    score = 0.4*min(1, n_tokens/64) + 0.3*(1 - min(1, punct_ratio*5))
          + 0.3*min(1, sw_en*4)
    """
    return quality_from_stats(text_stats(df, text_col))


def lang_from_stats(stats: DataFrame) -> DataFrame:
    """lang_pred column from an EXISTING text_stats projection (see
    :func:`quality_from_stats`)."""
    mx = F.greatest("sw_en", "sw_de", "sw_fr", "sw_es")
    return stats.withColumn(
        "lang_pred",
        # NULL-safe: NULL text gives NULL ratios; every when() condition
        # would be NULL (not true) and control would FALL THROUGH to the
        # 'es' otherwise-branch without the isNull arm
        F.when(mx.isNull() | (mx <= 0.0), F.lit("und"))
        .when(F.col("sw_en") == mx, F.lit("en"))
        .when(F.col("sw_de") == mx, F.lit("de"))
        .when(F.col("sw_fr") == mx, F.lit("fr"))
        .otherwise(F.lit("es")))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax-stopword-ratio language ID with 'und' fallback.

    Ties break by fixed priority en > de > fr > es (strictly-greater
    comparisons in that order — reproducible in a SQL CASE).
    """
    return lang_from_stats(text_stats(df, text_col))


# Scrub patterns: shared Java-regex/RE2 subset (no lookarounds, no
# backrefs) so a SQL oracle applies the IDENTICAL expressions.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://\S+"
# A dotted quad counts as an IP only when NOT embedded in a longer dotted
# sequence: '1.2.3.4.5' is a version string, not '<IP>.5'. \b can't say
# that ('4' to '.' IS a word boundary) and lookarounds are out (RE2 has
# none — the oracle runs this exact pattern), so the boundaries are
# captured groups kept in the replacement. Trailing boundary: end of
# text, a non-digit-non-dot, OR a dot that is itself final/followed by
# a non-digit-non-dot — that last pair is what keeps the sentence-final
# IP in 'connect to 10.0.0.1.' scrubbed while still rejecting
# '1.2.3.4.5' (dot followed by a DIGIT = longer dotted sequence). A
# leading dot stays unscrubbed by design: '.1.2.3.4' is
# indistinguishable from the tail of a longer dotted token. \z, not $:
# Java's $ also matches BEFORE a trailing newline, RE2's only at end of
# text — \z means end-of-text in both. Because a match CONSUMES its
# boundary chars, two IPs separated by a single separator
# ('1.1.1.1,2.2.2.2') need a second pass: the first rewrite ends in '>'
# (a valid boundary), so pass 2 always catches the survivor —
# scrub_pii applies the pattern twice.
IP_RE = (r"(^|[^0-9.])([0-9]{1,3}(\.[0-9]{1,3}){3})"
         r"(\z|\.\z|\.[^0-9.]|[^0-9.])")
CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def scrub_pii(text: Column,
              email_token: str = "<EMAIL>",
              url_token: str = "<URL>",
              ip_token: str = "<IP>") -> Column:
    """Replace emails, URLs, and IPv4 addresses with placeholder tokens —
    the redaction pass a training-data pipeline runs before text ships.
    Order matters: URLs can embed IP/host parts, so URL scrub runs before
    IP scrub; emails first (an email is never inside a URL token here
    because URL_RE would have consumed it). The IP pattern runs TWICE —
    see IP_RE for why one pass can miss an IP adjacent to another."""
    out = F.regexp_replace(text, EMAIL_RE, email_token)
    out = F.regexp_replace(out, URL_RE, url_token)
    ip_repl = "$1" + ip_token + "$4"
    out = F.regexp_replace(out, IP_RE, ip_repl)
    out = F.regexp_replace(out, IP_RE, ip_repl)
    return out


def clean_text(text: Column) -> Column:
    """Normalization pass: strip control characters, collapse whitespace
    runs to single spaces, trim. Composes with :func:`scrub_pii`."""
    out = F.regexp_replace(text, CTRL_RE, "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


# every ASCII char the fingerprint strip removes (the [^a-zA-Z0-9]
# class restricted to ASCII), for the translate fast path below
_NON_ALNUM_ASCII = "".join(
    chr(c) for c in range(0x80)
    if not (chr(c).isascii() and chr(c).isalnum()))


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: md5 of lower-cased alnum-only text.

    The exact-dedup key (dropDuplicates on it = hash dedup); md5 keeps the
    DuckDB oracle bit-identical.

    The strip runs through ``translate`` (per-char map lookup) whenever
    the text is pure ASCII (``length == octet_length``) — measured ~5x
    cheaper than ``regexp_replace`` per char on this host, where the
    regex append loop dominated q17. Non-ASCII text falls back to the
    regex, so the two paths delete exactly the same characters.
    """
    stripped = F.when(
        F.length(text) == F.octet_length(text),
        F.translate(text, _NON_ALNUM_ASCII, ""),
    ).otherwise(F.regexp_replace(text, "[^a-zA-Z0-9]", ""))
    return F.md5(F.lower(stripped))


def add_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint(F.col(text_col)))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", top_n: int = 2,
                     dup_n: int = 3) -> DataFrame:
    """Gopher-style within-document repetition metrics (the
    duplicate-n-gram family of Rae et al. 2021 Appendix A quality
    filters), per document:

    * ``top_gram`` / ``top_gram_count`` — the most frequent word
      ``top_n``-gram and its occurrence count (ties break to the
      lexicographically LARGEST gram — a deterministic rule a SQL
      oracle reproduces with ``ORDER BY c DESC, gram DESC``);
    * ``top_gram_char_frac`` — fraction of the document's non-space
      characters covered by occurrences of that gram
      (``count * gram_chars / doc_chars``);
    * ``dup_gram_char_frac`` — fraction covered by ALL occurrences of
      ``dup_n``-grams appearing more than once. Both fractions use the
      standard overlap-UNCORRECTED coverage sum (each occurrence counts
      its full length even when occurrences overlap), clamped to 1.0 —
      the same approximation production curation stacks apply, chosen
      here because it is exactly relational (no per-position marking).

    Plan shape (the 100 TB story): ONE scan of ``df`` builds both gram
    arrays, tags them, and explodes ONCE (the tagged-concat idiom — a
    union of two explodes would re-scan the corpus); gram counting is a
    hash aggregation on (id, kind, gram) with map-side partial
    aggregation (classic word-count: the shuffle carries distinct grams
    per doc, not occurrences), followed by a tiny per-doc rollup.
    Documents too short to produce any gram survive via the left join
    from the 2-column (id, chars) projection: zero fractions, NULL
    gram. Zero Python anywhere.

    Docs with NULL or too-short text get NULL ``top_gram``, zero count
    and zero fractions (``greatest(chars, 1)`` absorbs the NULL/0
    denominator — Spark's greatest skips NULLs)."""
    from softcite_kb_spark.operators.dedup import shingles

    text = F.col(text_col)
    tagged = F.concat(
        F.transform(shingles(text, top_n),
                    lambda g: F.struct(F.lit(0).alias("k"),
                                       g.alias("gram"))),
        F.transform(shingles(text, dup_n),
                    lambda g: F.struct(F.lit(1).alias("k"),
                                       g.alias("gram"))))
    ex = (df.select(F.col(id_col), F.explode(tagged).alias("t"))
          .select(id_col, F.col("t.k").alias("k"),
                  F.col("t.gram").alias("gram")))
    cnt = ex.groupBy(id_col, "k", "gram").agg(
        F.count("*").cast("long").alias("c"))
    # one rollup computes BOTH metrics: max() skips the NULLs the other
    # kind's rows contribute, so no second scan and no self-join
    per_doc = cnt.groupBy(id_col).agg(
        F.max(F.when(F.col("k") == 0,
                     F.struct(F.col("c"), F.col("gram")))).alias("m"),
        F.sum(F.when((F.col("k") == 1) & (F.col("c") > 1),
                     F.col("c") * (F.length("gram") - (dup_n - 1)))
              ).alias("dup_chars"))
    denom = df.select(
        F.col(id_col),
        F.length(F.regexp_replace(text, r"\s+", "")).alias("__chars"))
    d = F.greatest(F.col("__chars"), F.lit(1))
    return (denom.join(per_doc, id_col, "left")
            .select(
                id_col,
                F.col("m.gram").alias("top_gram"),
                F.coalesce(F.col("m.c"), F.lit(0).cast("long"))
                .alias("top_gram_count"),
                F.round(F.least(
                    F.lit(1.0),
                    F.coalesce(F.col("m.c")
                               * (F.length(F.col("m.gram"))
                                  - (top_n - 1)), F.lit(0)) / d),
                    6).alias("top_gram_char_frac"),
                F.round(F.least(
                    F.lit(1.0),
                    F.coalesce(F.col("dup_chars"), F.lit(0)) / d),
                    6).alias("dup_gram_char_frac")))
