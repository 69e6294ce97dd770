"""Deterministic synthetic transcript corpus + authority tables + ground truth.

Produces the stage-1 input shape fixed by BASELINE.json ``input_hint``:

    transcripts(conv_id string, turn_idx int32, role string,
                text string, tool string, ts timestamp)

plus the curated authority tables of stage 2 (the analog of the reference's
Wikidata/CRAN/rOpenSci imports, Wikidata_import.py / cran_import.py) and the
golden outputs (expected mentions / triples / components) used for the
P/R >= 0.95 gate (BASELINE.md).

Everything is seeded-deterministic (numpy Generator, fixed seed): same args
=> byte-identical parquet. Edge cases planted on purpose, mirroring the
reference's behaviors:

  * same-entity repeated mentions within one conversation (same-name folding,
    populate_from_mentions.py:173-266)
  * blacklisted tokens ("SARS"), pure numbers in mention position — must NOT
    be extracted (software_mention_import.py:120-124, :172-177)
  * ALL-CAPS and hyphen<->space surface variants (merge.py:299-335)
  * out-of-vocabulary names that must NOT link to any authority entity
  * skew: Zipf-weighted entity popularity (hot "R"-like names,
    merge.py:186-189) and a few very long conversations

Generation is plain numpy/pandas on the driver — the corpus is an *input*
fixture; at 10^12-turn scale the real input already exists as an Iceberg
table, so datagen speed is not an engine concern.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

# -- name pools -----------------------------------------------------------

_PREFIX = ["Stat", "Data", "Graph", "Text", "Deep", "Fast", "Hyper", "Meta",
           "Open", "Py", "Astro", "Bio", "Geo", "Neuro", "Quant", "Turbo"]
_SUFFIX = ["lib", "kit", "flow", "core", "forge", "net", "miner", "db",
           "viz", "lab", "ml", "sim"]

_FIRST = ["Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Radia",
          "Ken", "Dennis", "Frances"]
_LAST = ["Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth",
         "Perlman", "Thompson", "Ritchie", "Allen"]

_LANGS = ["Python", "Java", "Rust", "Scala", "Julia", "Fortran", "Haskell", "Go"]
_LICENSES = ["MIT", "GPL-3", "Apache-2.0", "BSD-3", "MPL-2.0"]

_NOISE_WORDS = ("the run finished without issues and all metrics looked flat "
                "so we archived the logs then restarted the nightly job with "
                "default settings while watching memory pressure on every node "
                "before lunch because nothing else happened that afternoon").split()

# blacklist per reference software_mention_import.py:50-59 (resources/blacklist)
BLACKLIST = ["SARS", "COVID", "DNA", "HTTP"]

_TOOLS = ["bash", "search", "editor", "browser", "calculator"]

PRED_DEPENDS = "depends_on"
PRED_USES = "uses"
PRED_WRITTEN_IN = "written_in"
PRED_CREATED_BY = "created_by"
PRED_LICENSED = "licensed_under"
PRED_VERSION = "has_version"

ALL_PREDICATES = [PRED_DEPENDS, PRED_USES, PRED_WRITTEN_IN, PRED_CREATED_BY,
                  PRED_LICENSED, PRED_VERSION]


def _software_labels(n: int, rng: np.random.Generator) -> list[str]:
    """n unique software labels; ~1/3 hyphenated (two capitalized parts)."""
    combos = [(p, s) for p in _PREFIX for s in _SUFFIX]
    rng.shuffle(combos)
    labels = []
    for i, (p, s) in enumerate(combos[:n]):
        if i % 3 == 2:
            labels.append(f"{p}-{s.capitalize()}")  # e.g. Stat-Forge
        else:
            labels.append(f"{p}{s}")  # e.g. Statlib
    return labels


def _surface_variants(label: str) -> list[str]:
    """Surface forms the corpus may render a label as.

    Mirrors the reference's match-variant space: _capitalized_variant
    (merge.py:299-318, ALL-CAPS <-> Title) and _hyphen_variant
    (merge.py:320-335, exactly-one-hyphen <-> exactly-one-space).
    """
    out = [label, label.upper()]
    if label.count("-") == 1 and " " not in label:
        out.append(label.replace("-", " "))
    return out


def build_authority(n_software: int = 60, seed: int = 42):
    """Curated authority tables (the Wikidata/CRAN analog).

    Returns (authority_entities, authority_ids) as pandas DataFrames.
    Schema per FIXTURES.md section 2.
    """
    rng = np.random.default_rng(seed)
    labels = _software_labels(n_software, rng)
    persons = [f"{f} {l}" for f, l in zip(_FIRST, _LAST)]

    rows, id_rows = [], []
    qid = 0
    for label in labels:
        qid += 1
        eid = f"Q{qid}"
        aliases = [a for a in _surface_variants(label) if a != label]
        lang = _LANGS[qid % len(_LANGS)]
        claims = [
            {"prop": "P277", "value": lang, "datatype": "wikibase-item"},
            {"prop": "P275", "value": _LICENSES[qid % len(_LICENSES)],
             "datatype": "wikibase-item"},
        ]
        rows.append({"entity_id": eid, "label": label, "aliases": aliases,
                     "entity_type": "software", "claims": claims})
        id_rows.append({"id_kind": "pkg", "id_value": label.lower(),
                        "entity_id": eid})
    for p in persons:
        qid += 1
        eid = f"Q{qid}"
        rows.append({"entity_id": eid, "label": p, "aliases": [],
                     "entity_type": "person", "claims": []})
        orcid = f"0000-0002-{qid:04d}-{(qid * 7) % 10000:04d}"
        id_rows.append({"id_kind": "orcid", "id_value": orcid, "entity_id": eid})
    for lang in _LANGS:
        qid += 1
        rows.append({"entity_id": f"Q{qid}", "label": lang, "aliases": [],
                     "entity_type": "language", "claims": []})
    for lic in _LICENSES:
        qid += 1
        rows.append({"entity_id": f"Q{qid}", "label": lic, "aliases": [],
                     "entity_type": "license", "claims": []})
    return pd.DataFrame(rows), pd.DataFrame(id_rows)


def _zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def build_corpus(
    n_conversations: int = 200,
    seed: int = 42,
    n_software: int = 60,
    hot_conv_frac: float = 0.02,
):
    """Generate the full fixture set.

    Returns dict of pandas DataFrames:
      transcripts, authority_entities, authority_ids,
      expected_mentions, expected_triples
    """
    rng = np.random.default_rng(seed)
    auth_entities, auth_ids = build_authority(n_software=n_software, seed=seed)
    software = auth_entities[auth_entities.entity_type == "software"]
    soft_labels = software.label.tolist()
    soft_ids = software.entity_id.tolist()
    label2id = dict(zip(software.label, software.entity_id))
    person_df = auth_entities[auth_entities.entity_type == "person"]
    persons = person_df.label.tolist()
    person_ids = dict(zip(person_df.label, person_df.entity_id))
    # entity -> claimed P277 language (written_in turns must agree with the
    # authority claim, otherwise stage-2 language post-validation correctly
    # rejects the link and ground truth would be unsatisfiable)
    soft_lang = {
        r.entity_id: next(c["value"] for c in r.claims if c["prop"] == "P277")
        for r in software.itertuples()
    }
    lang_df = auth_entities[auth_entities.entity_type == "language"]
    lang_ids = dict(zip(lang_df.label, lang_df.entity_id))
    lic_df = auth_entities[auth_entities.entity_type == "license"]
    lic_ids = dict(zip(lic_df.label, lic_df.entity_id))

    # out-of-vocabulary tool names: must be extracted but NOT linked
    oov = [f"Zeta{suffix}{i}" for i, suffix in
           enumerate(["tron", "scope", "pulse", "wave", "drive"])]

    soft_w = _zipf_weights(len(soft_labels))  # hot-entity skew

    t_rows, m_rows, tr_rows = [], [], []
    base_ts = np.datetime64("2026-01-05T09:00:00")

    n_hot = max(1, int(n_conversations * hot_conv_frac))
    for c in range(n_conversations):
        conv_id = f"conv-{c:06d}"
        n_turns = int(rng.integers(40, 120)) if c < n_hot else int(rng.integers(3, 12))
        for t in range(n_turns):
            role = ("user", "assistant", "tool")[t % 3]
            tool = _TOOLS[t % len(_TOOLS)] if role == "tool" else None
            ts = base_ts + np.timedelta64(c * 3600 + t * 37, "s")
            kind = rng.choice(
                ["noise", "mention", "depends", "uses", "written", "created",
                 "licensed", "trap", "oov"],
                p=[0.30, 0.20, 0.12, 0.12, 0.08, 0.06, 0.04, 0.04, 0.04],
            )

            def pick_soft():
                i = rng.choice(len(soft_labels), p=soft_w)
                label = soft_labels[i]
                variants = _surface_variants(label)
                surf = variants[int(rng.integers(0, len(variants)))]
                return label, soft_ids[i], surf

            if kind == "noise":
                k = int(rng.integers(5, 12))
                idx = rng.integers(0, len(_NOISE_WORDS), size=k)
                text = " ".join(_NOISE_WORDS[j] for j in idx) + "."
            elif kind == "mention":
                label, eid, surf = pick_soft()
                maj, mnr = int(rng.integers(0, 9)), int(rng.integers(0, 20))
                text = f"We ran {surf} v{maj}.{mnr} on the cluster."
                m_rows.append((conv_id, t, surf, eid, f"{maj}.{mnr}"))
                tr_rows.append((conv_id, t, surf, PRED_VERSION, f"{maj}.{mnr}",
                                eid, None))
            elif kind == "depends":
                la, ea, sa = pick_soft()
                lb, eb, sb = pick_soft()
                if la == lb:
                    lb, eb, sb = pick_soft()
                if la == lb:
                    text = "nothing to report here."
                else:
                    text = f"{sa} depends on {sb}."
                    m_rows.append((conv_id, t, sa, ea, None))
                    m_rows.append((conv_id, t, sb, eb, None))
                    tr_rows.append((conv_id, t, sa, PRED_DEPENDS, sb, ea, eb))
            elif kind == "uses":
                la, ea, sa = pick_soft()
                lb, eb, sb = pick_soft()
                if la == lb:
                    text = "nothing to report here."
                else:
                    text = f"{sa} uses {sb} internally."
                    m_rows.append((conv_id, t, sa, ea, None))
                    m_rows.append((conv_id, t, sb, eb, None))
                    tr_rows.append((conv_id, t, sa, PRED_USES, sb, ea, eb))
            elif kind == "written":
                la, ea, sa = pick_soft()
                lang = soft_lang[ea]
                text = f"{sa} is written in {lang}."
                m_rows.append((conv_id, t, sa, ea, None))
                tr_rows.append((conv_id, t, sa, PRED_WRITTEN_IN, lang, ea,
                                lang_ids[lang]))
            elif kind == "created":
                la, ea, sa = pick_soft()
                p = persons[int(rng.integers(0, len(persons)))]
                text = f"{sa} was created by {p}."
                m_rows.append((conv_id, t, sa, ea, None))
                tr_rows.append((conv_id, t, sa, PRED_CREATED_BY, p, ea,
                                person_ids[p]))
            elif kind == "licensed":
                la, ea, sa = pick_soft()
                lic = _LICENSES[int(rng.integers(0, len(_LICENSES)))]
                text = f"{sa} is licensed under {lic}."
                m_rows.append((conv_id, t, sa, ea, None))
                tr_rows.append((conv_id, t, sa, PRED_LICENSED, lic, ea,
                                lic_ids[lic]))
            elif kind == "trap":
                # blacklisted / numeric mention-position tokens: ground truth
                # contains NOTHING for these turns (precision test)
                bad = [*BLACKLIST, "2021", "3.14"][int(rng.integers(0, 6))]
                text = f"We ran {bad} v1.0 on the cluster."
            else:  # oov: extracted (recall) but unlinkable (entity_id None)
                surf = oov[int(rng.integers(0, len(oov)))]
                maj, mnr = int(rng.integers(0, 9)), int(rng.integers(0, 20))
                text = f"We ran {surf} v{maj}.{mnr} on the cluster."
                m_rows.append((conv_id, t, surf, None, f"{maj}.{mnr}"))
                tr_rows.append((conv_id, t, surf, PRED_VERSION, f"{maj}.{mnr}",
                                None, None))

            t_rows.append((conv_id, t, role, text, tool, ts))

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    transcripts["ts"] = pd.to_datetime(transcripts["ts"]).astype("datetime64[us]")
    expected_mentions = pd.DataFrame(
        m_rows, columns=["conv_id", "turn_idx", "surface", "entity_id", "version"])
    expected_mentions["turn_idx"] = expected_mentions["turn_idx"].astype("int32")
    expected_triples = pd.DataFrame(
        tr_rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj",
                          "subj_entity_id", "obj_entity_id"])
    expected_triples["turn_idx"] = expected_triples["turn_idx"].astype("int32")
    return {
        "transcripts": transcripts,
        "authority_entities": auth_entities,
        "authority_ids": auth_ids,
        "expected_mentions": expected_mentions,
        "expected_triples": expected_triples,
    }


def write_corpus(out_dir: str, shuffle_rows: bool = True, **kwargs) -> dict[str, str]:
    """Materialize the corpus as parquet files; returns {name: path}.

    ``shuffle_rows`` randomizes transcript row order (seeded) so that stable
    turn ordering is actually exercised — the engine must NOT rely on file
    order (north_rule: window-over-(conv_id, turn_idx)).
    """
    os.makedirs(out_dir, exist_ok=True)
    tables = build_corpus(**kwargs)
    if shuffle_rows:
        rng = np.random.default_rng(7)
        t = tables["transcripts"]
        tables["transcripts"] = t.iloc[rng.permutation(len(t))].reset_index(drop=True)
    paths = {}
    for name, df in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
