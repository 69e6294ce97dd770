"""Stage 2 — entity linking / disambiguation against curated authority tables.

Reference analog: the merge stage's candidate lookups + validation + voting:

  * strong-identifier fast path — exact DOI/ORCID/package-name conflation
    (populate_from_wikidata.py:155-169, merge.py:40-73)
  * name/alias disjunctive lookup with capitalization + hyphen variants
    (merge.py:180-226, variants merge.py:299-335) — here a *blocking-key
    table*: authority labels, aliases and generated variants exploded to
    normalized keys, joined against folded mentions on the key. The authority side is a
    curated dimension (small relative to mentions), so the join broadcasts —
    mention-side skew (hot "R"-like names) never shuffles.
  * post-validation — programming-language claim sets must overlap or one
    side be empty (merge.py:268-297) -> arrays_overlap join-filter.
  * disambiguation voting — accept an entity for a surface iff its summed
    mention count wins an absolute majority and total evidence passes a
    floor (knowledge_base.py:404-494: count>1, total>=10, count>total/2).

Output: ``links(conv_id, norm_surface, entity_id, method, score)`` plus the
unlinked remainder (OOV mentions stay unlinked by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from softcite_kb_spark.functions.text import norm_name

METHOD_STRONG_ID = "strong_id"
METHOD_LABEL = "label"
METHOD_ALIAS = "alias"
METHOD_VARIANT = "variant"

_METHOD_SCORE = {
    METHOD_STRONG_ID: 1.0,
    METHOD_LABEL: 1.0,
    METHOD_ALIAS: 0.9,
    METHOD_VARIANT: 0.8,
}

# Above this many blocking-key rows the authority dimension stops being
# a safe broadcast: ~2M exploded label/alias keys is O(100s of MB)
# serialized per executor — a Wikidata-scale authority (the reference's
# own source, Wikidata_import.py:120-160, ~100M labels+aliases) would
# OOM the driver. Past the threshold the joins fall back to plain
# shuffle joins (AQE still free to broadcast genuinely small probe
# sides at runtime).
AUTHORITY_BROADCAST_MAX_ROWS = 2_000_000


def _hint(df: DataFrame, broadcast: bool) -> DataFrame:
    """Apply the explicit broadcast hint only when the size gate allows
    it; un-hinted, AQE decides from actual runtime sizes."""
    return F.broadcast(df) if broadcast else df


def authority_fits_broadcast(
    authority_entities: DataFrame,
    authority_ids: DataFrame | None = None,
    max_rows: int = AUTHORITY_BROADCAST_MAX_ROWS,
) -> bool:
    """Row-count probe for the broadcast size gate (VERDICT r04 #1).

    Counts the EXPLODED blocking-key table (labels + aliases + strong
    ids) — the widest frame any stage-2/3 join broadcasts — with one
    column-pruned count job. The probe costs one scan of the authority
    dimension per pipeline stage; the thing it prevents (an
    unconditional ``F.broadcast`` of a 100M-row authority) costs the
    cluster. Callers that know their authority (curated, small) can
    skip the probe by passing an explicit ``broadcast=`` bool to the
    stage functions.
    """
    n = authority_block_keys(authority_entities).count()
    if authority_ids is not None:
        n += authority_ids.count()
    return n <= max_rows


def authority_block_keys(authority_entities: DataFrame) -> DataFrame:
    """Explode authority labels + aliases + generated variants to a
    normalized blocking-key table: (block_key, entity_id, method).

    The reference's lookup disjunction (merge.py:180-226) spans label,
    every alias, the ALL-CAPS->Title variant and the hyphen<->space
    variant. Under :func:`norm_name` blocking, the two generated variants
    PROVABLY collapse onto the label's own key (norm_name lower-cases and
    maps '-' to ' '), so emitting them would only duplicate candidate rows
    for the voting window to dedupe — the variant coverage is a property
    of the key normalization, not extra rows (tests pin the equivalence).
    """
    ent = authority_entities.select("entity_id", "label", "aliases")
    label = ent.select(
        "entity_id", norm_name(F.col("label")).alias("block_key"),
        F.lit(METHOD_LABEL).alias("method"))
    alias = (
        ent.select("entity_id", F.explode("aliases").alias("a"))
        .select("entity_id", norm_name(F.col("a")).alias("block_key"),
                F.lit(METHOD_ALIAS).alias("method"))
    )
    keys = label.unionByName(alias)
    return keys.filter(F.col("block_key").isNotNull() & (F.col("block_key") != ""))


def entity_langs(authority_entities: DataFrame) -> DataFrame:
    """(entity_id, langs array) from P277 claims — post-validation dimension."""
    return (
        authority_entities
        .select(
            "entity_id",
            F.filter("claims", lambda c: c["prop"] == F.lit("P277")).alias("lc"))
        .select(
            "entity_id",
            F.transform("lc", lambda c: c["value"]).alias("langs"))
    )


def mention_langs(triples: DataFrame) -> DataFrame:
    """(norm_surface, langs) observed via written_in triples — the mention
    side of the language post-validation (merge.py:268-297)."""
    return (
        triples.filter(F.col("pred") == "written_in")
        .select(norm_name(F.col("subj")).alias("norm_surface"),
                F.col("obj").alias("lang"))
        .groupBy("norm_surface")
        .agg(F.array_distinct(F.sort_array(F.collect_list("lang"))).alias("mention_langs"))
    )


def trigram_similarity(a: str = "norm_surface", b: str = "match_label"):
    """Char-trigram Jaccard similarity as a scalar pandas UDF Column.

    The scoring kernel of SURVEY.md 2.10: per candidate pair, Jaccard over
    padded character 3-gram sets — the vectorized analog of the reference's
    post-validation scoring (merge.py:268-297 + name-variant rules).
    Arrow-batched; used to re-score candidates whose blocking method is
    weaker than an exact label match.
    """
    import pandas as pd
    from pyspark.sql import types as T

    def grams(s: str) -> set:
        s = f"  {s} "
        return {s[i:i + 3] for i in range(len(s) - 2)}

    # no annotations: `from __future__ import annotations` stringifies
    # hints and pandas_udf's inference can't resolve the local `pd` name;
    # unannotated defaults to SCALAR which is what we want
    @F.pandas_udf(T.DoubleType())
    def sim(xs, ys):
        out = []
        for x, y in zip(xs, ys):
            if not x or not y:
                out.append(0.0)
                continue
            gx, gy = grams(x.lower()), grams(y.lower())
            inter = len(gx & gy)
            out.append(round(inter / (len(gx) + len(gy) - inter), 6))
        return pd.Series(out)

    return sim(F.col(a), F.col(b))


def score_candidates_similarity(
    candidates: DataFrame,
    authority_entities: DataFrame,
    broadcast: bool | None = None,
) -> DataFrame:
    """Blend the method-prior score with trigram similarity to the entity's
    canonical label: score = 0.5*prior + 0.5*trigram, with two guards:

      * strong-identifier candidates keep their prior untouched — the
        authoritative pkg-id/DOI match must never lose a vote to a
        textually-closer wrong entity (the fast path "wins ties" contract);
      * the comparison label is NORM-NAME-normalized like the surface —
        comparing against the raw label scored an exact hyphenated match
        ('stat forge' vs 'Stat-Forge') well under 1.0, letting a space-form
        competitor steal the surface.

    ``broadcast``: size-gate for the label-dimension hint (None =
    probe via :func:`authority_fits_broadcast`).
    """
    if broadcast is None:
        broadcast = authority_fits_broadcast(authority_entities)
    labels = _hint(
        authority_entities.select(
            "entity_id", norm_name(F.col("label")).alias("match_label")),
        broadcast)
    blended = F.round(
        0.5 * F.col("score")
        + 0.5 * trigram_similarity("norm_surface", "match_label"), 6)
    return (
        candidates.join(labels, "entity_id", "left")
        .withColumn(
            "score",
            F.when(F.col("method") == METHOD_STRONG_ID, F.col("score"))
            .otherwise(blended))
        .drop("match_label")
    )


def generate_candidates(
    folded_mentions: DataFrame,
    authority_entities: DataFrame,
    authority_ids: DataFrame | None = None,
    triples: DataFrame | None = None,
    broadcast: bool | None = None,
) -> DataFrame:
    """Blocked candidate generation: one row per (mention-group, entity).

    The authority side is the dimension and must never become the
    SHUFFLE partner of a 10^12-row mention table when it is genuinely
    small — but hinting ``F.broadcast`` unconditionally OOMs the moment
    the authority is Wikidata-scale. ``broadcast`` size-gates the hint:
    None probes via :func:`authority_fits_broadcast`; past the gate the
    join runs as a plain shuffle join (AQE's skew-join splits hot
    mention surfaces at runtime — enabled in session.py — and
    :mod:`softcite_kb_spark.functions.skew` offers explicit
    salting/split plans where AQE can't reach). Candidates carry a
    method + score; the strong-id path wins ties via score then method
    ordering.
    """
    if broadcast is None:
        broadcast = authority_fits_broadcast(authority_entities,
                                             authority_ids)
    m = folded_mentions.select("conv_id", "norm_surface", "n_mentions")

    # union the (tiny) key dimensions FIRST so the 10^12-row mention side
    # is scanned exactly once — a per-method join would re-scan it per path
    keys = authority_block_keys(authority_entities)
    if authority_ids is not None:
        pkg = (
            authority_ids.filter(F.col("id_kind") == "pkg")
            .select(norm_name(F.col("id_value")).alias("block_key"),
                    "entity_id",
                    F.lit(METHOD_STRONG_ID).alias("method"))
        )
        keys = keys.unionByName(pkg)

    cands = (
        m.join(_hint(keys, broadcast),
               m.norm_surface == keys.block_key, "inner")
        .drop("block_key")
    )

    score_map = F.create_map(
        *[x for kv in _METHOD_SCORE.items() for x in (F.lit(kv[0]), F.lit(kv[1]))])
    cands = cands.withColumn("score", score_map[F.col("method")])

    # language post-validation (J6): candidate survives iff language claim
    # sets overlap or either side is empty/unknown
    if triples is not None:
        ml = mention_langs(triples)
        el = entity_langs(authority_entities)
        cands = (
            cands
            .join(ml, "norm_surface", "left")
            .join(_hint(el, broadcast), "entity_id", "left")
            .filter(
                F.col("mention_langs").isNull()
                | F.col("langs").isNull()
                | (F.size("mention_langs") == 0)
                | (F.size("langs") == 0)
                | F.arrays_overlap("mention_langs", "langs")
            )
            .drop("mention_langs", "langs")
        )
    return cands


def vote_links(
    candidates: DataFrame,
    min_total: int = 2,
    majority: float = 0.5,
) -> DataFrame:
    """Disambiguation voting (A8, knowledge_base.py:404-494).

    Votes are mention counts summed per (norm_surface, entity_id) across the
    whole corpus. A surface's winning entity is accepted iff
    total_votes >= min_total and winner_votes > majority * total_votes.
    Window `row_number()=1` with a deterministic tiebreak picks the winner.
    """
    # a mention-group may match one entity through several methods — count
    # its votes once (max score), attribute the best-scoring method
    per_group = (
        candidates
        .groupBy("conv_id", "norm_surface", "entity_id")
        .agg(F.max("n_mentions").alias("n_mentions"),
             F.max(F.struct("score", "method")).alias("best"))
    )
    # a group votes only for its best-scoring candidate(s): scoring decides
    # within a group, voting decides across groups (reference order: score
    # then count, knowledge_base.py:404-494). Exact ties keep both rows —
    # the majority rule then correctly refuses genuinely ambiguous names.
    wg = W.partitionBy("conv_id", "norm_surface")
    per_group = (
        per_group
        .withColumn("__mx", F.max(F.col("best.score")).over(wg))
        .filter(F.col("best.score") == F.col("__mx"))
        .drop("__mx")
    )
    votes = (
        per_group
        .groupBy("norm_surface", "entity_id")
        .agg(F.sum("n_mentions").alias("votes"),
             F.max("best").alias("best"))
        .select("norm_surface", "entity_id", "votes",
                F.col("best.score").alias("score"),
                F.col("best.method").alias("method"))
    )
    w = W.partitionBy("norm_surface")
    votes = votes.withColumn("total_votes", F.sum("votes").over(w))
    rank = W.partitionBy("norm_surface").orderBy(
        F.desc("votes"), F.desc("score"), F.asc("entity_id"))
    return (
        votes.withColumn("rn", F.row_number().over(rank))
        .filter(
            (F.col("rn") == 1)
            & (F.col("total_votes") >= min_total)
            & (F.col("votes") > F.col("total_votes") * majority)
        )
        .select("norm_surface", "entity_id", "votes", "total_votes",
                "score", "method")
    )


def surface_stats(folded_mentions: DataFrame) -> DataFrame:
    """(norm_surface, total n_mentions, group count) — the only
    conversation-dependent input the voting decision needs (see
    :func:`vote_links_surface`). One map-side-combined groupBy whose
    key space is DISTINCT SURFACES, not mention groups. ``n_groups``
    (rows per surface in folded_mentions) doubles as the hot-key
    statistic for the final accepted-map join — computed here so the
    skew policy costs zero extra passes over the mention table."""
    return folded_mentions.groupBy("norm_surface").agg(
        F.sum("n_mentions").alias("surface_mentions"),
        F.count("*").cast("long").alias("n_groups"))


def generate_surface_candidates(
    stats: DataFrame,
    authority_entities: DataFrame,
    authority_ids: DataFrame | None = None,
    triples: DataFrame | None = None,
    broadcast: bool | None = None,
) -> DataFrame:
    """Candidate (surface, entity, method, score) rows at SURFACE
    granularity — the blocking join keyed on norm_surface makes the
    candidate set, the method prior, and the language post-validation
    all pure functions of the surface, so expanding them per
    conversation group (as :func:`generate_candidates` does) multiplies
    identical rows by the number of conversations for no information.
    ``stats`` is :func:`surface_stats` output; ``surface_mentions``
    rides along for the voting stage.

    ``broadcast`` size-gates the authority-side hints (None = probe
    via :func:`authority_fits_broadcast`); past the gate, plain
    shuffle joins — and because ``stats`` has ONE row per distinct
    surface, the shuffle key is unskewed by construction (the hot "R"
    surface is a single row here)."""
    if broadcast is None:
        broadcast = authority_fits_broadcast(authority_entities,
                                             authority_ids)
    keys = authority_block_keys(authority_entities)
    if authority_ids is not None:
        pkg = (
            authority_ids.filter(F.col("id_kind") == "pkg")
            .select(norm_name(F.col("id_value")).alias("block_key"),
                    "entity_id",
                    F.lit(METHOD_STRONG_ID).alias("method"))
        )
        keys = keys.unionByName(pkg)
    cands = (
        stats.join(_hint(keys, broadcast),
                   stats.norm_surface == keys.block_key, "inner")
        .drop("block_key")
    )
    score_map = F.create_map(
        *[x for kv in _METHOD_SCORE.items()
          for x in (F.lit(kv[0]), F.lit(kv[1]))])
    cands = cands.withColumn("score", score_map[F.col("method")])
    if triples is not None:
        ml = mention_langs(triples)
        el = entity_langs(authority_entities)
        cands = (
            cands
            .join(ml, "norm_surface", "left")
            .join(_hint(el, broadcast), "entity_id", "left")
            .filter(
                F.col("mention_langs").isNull()
                | F.col("langs").isNull()
                | (F.size("mention_langs") == 0)
                | (F.size("langs") == 0)
                | F.arrays_overlap("mention_langs", "langs")
            )
            .drop("mention_langs", "langs")
        )
    return cands


def vote_links_surface(
    candidates: DataFrame,
    min_total: int = 2,
    majority: float = 0.5,
) -> DataFrame:
    """:func:`vote_links` collapsed to surface granularity — EXACTLY the
    same accepted set, derived from the observation that candidate sets
    are surface-pure:

    for a surface s, every conversation group carries the SAME candidate
    entities with the SAME scores (the blocking join keys on s alone),
    so the per-group best-score filter selects one best set B(s) shared
    by all groups, and the per-(s, e) vote sum factorizes to
    ``votes(s, e) = M(s)`` for every e in B(s), where M(s) is the
    surface's total mention count. total_votes = |B(s)| * M(s); the
    majority rule reduces to |B(s)| < 1/majority and the tie-break to
    min entity id within B(s).

    Plan consequence at 10^12 turns: the voting shuffle's input drops
    from O(mention groups x candidates) rows to O(distinct surfaces x
    candidates) — and every window here partitions over surface-level
    rows (a handful of candidates each), so the hot-surface skew that
    motivated the group-level plan's groupBy-based rep selection cannot
    funnel a reducer. Equality with the group-level path is pinned by
    tests on every fixture corpus.
    """
    per = (
        candidates
        .groupBy("norm_surface", "entity_id")
        .agg(F.max(F.struct("score", "method")).alias("best"),
             F.first("surface_mentions").alias("votes"))
    )
    wg = W.partitionBy("norm_surface")
    per = (
        per.withColumn("__mx", F.max(F.col("best.score")).over(wg))
        .filter(F.col("best.score") == F.col("__mx"))
        .withColumn("__b", F.count("*").over(wg))
        .withColumn("total_votes", F.col("__b") * F.col("votes"))
    )
    rank = W.partitionBy("norm_surface").orderBy(F.asc("entity_id"))
    return (
        per.withColumn("rn", F.row_number().over(rank))
        .filter(
            (F.col("rn") == 1)
            & (F.col("total_votes") >= min_total)
            & (F.col("votes") > F.col("total_votes") * majority)
        )
        .select("norm_surface", "entity_id", "votes", "total_votes",
                F.col("best.score").alias("score"),
                F.col("best.method").alias("method"))
    )


def link_mentions(
    folded_mentions: DataFrame,
    authority_entities: DataFrame,
    authority_ids: DataFrame | None = None,
    triples: DataFrame | None = None,
    min_total: int = 2,
    broadcast: bool | None = None,
    hot_surface_threshold: int = 0,
) -> DataFrame:
    """Full stage-2: surface-level candidates -> voting -> per-group links.

    Returns folded_mentions columns + (entity_id, link_method, link_score);
    entity_id NULL = unlinked (OOV or below voting thresholds).

    The decision runs at surface granularity (:func:`vote_links_surface`
    — provably identical to the group-level :func:`vote_links` path,
    which remains as the reference implementation and the
    similarity-scoring building block): the 10^12-row mention table is
    touched exactly twice, once by the map-side-combined surface stats
    and once by the final accepted-map join.

    ``broadcast`` size-gates every authority-side hint (None = one
    :func:`authority_fits_broadcast` probe shared by all of them).

    ``hot_surface_threshold`` > 0 turns on the skew POLICY for the
    final accepted-map join when that map is too big to broadcast: a
    surface with more than this many mention groups (the "R" problem,
    merge.py:186-189) joins through a broadcast of the hot slice of
    the accepted map while the cold tail takes the plain shuffle join
    (:func:`softcite_kb_spark.functions.skew.hot_key_split_join`
    shape). The hot-key statistic is ``n_groups``, already computed by
    the surface-stats pass — the DECISION costs zero extra scans; the
    split plan itself reads the mention table through a hot/cold
    semi/anti pair, trading one extra broadcast-filtered scan for
    keeping the hot surface out of the shuffle entirely.
    """
    if broadcast is None:
        broadcast = authority_fits_broadcast(authority_entities,
                                             authority_ids)
    stats = surface_stats(folded_mentions)
    cands = generate_surface_candidates(
        stats, authority_entities, authority_ids, triples,
        broadcast=broadcast)
    accepted = vote_links_surface(cands, min_total=min_total).select(
        "norm_surface",
        F.col("entity_id"),
        F.col("method").alias("link_method"),
        F.col("score").alias("link_score"),
    )
    if hot_surface_threshold > 0:
        # split plan from the precomputed per-surface group counts: the
        # hot slice of the accepted map is bounded by the number of hot
        # surfaces (tiny) and broadcasts; the cold tail shuffles
        hot = F.broadcast(
            stats.filter(F.col("n_groups") > hot_surface_threshold)
            .select("norm_surface"))
        f_hot = folded_mentions.join(hot, "norm_surface", "left_semi")
        f_cold = folded_mentions.join(hot, "norm_surface", "left_anti")
        acc_hot = accepted.join(hot, "norm_surface", "left_semi")
        return (
            f_hot.join(F.broadcast(acc_hot), "norm_surface", "left")
            .unionByName(f_cold.join(accepted, "norm_surface", "left"))
        )
    # surface->entity map size is bounded by distinct surfaces, typically
    # broadcastable, but can reach GBs at web scale — let AQE decide.
    return folded_mentions.join(accepted, "norm_surface", "left")
