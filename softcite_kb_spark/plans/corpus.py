"""Training-data corpus preparation pipeline.

The composition a pretraining-data pipeline runs over raw documents
before anything downstream (extraction, indexing, training) sees them —
each stage built from this repo's operator modules, each output an
atomic snapshot commit:

  1. ``clean``  — PII scrub + normalization (textops.scrub_pii /
     clean_text); empty-after-cleaning docs drop here.
  2. ``dedup``  — exact fingerprint dedup (dedup.dedup_exact), then
     MinHash-LSH near-duplicate removal: banded candidate pairs →
     exact-Jaccard verification → connected components over the
     verified-pair graph (the SAME CC used for entity canonicalization
     — one implementation, two jobs) → keep the min doc id per
     duplicate component.
  3. ``filter`` — language whitelist (textops.lang_id) + quality floor
     (textops.quality_score) + token-count band (textops.text_stats).
  4. ``stats``  — per-doc token statistics for the survivors.

Scale shape: every stage is shuffle-bounded (hash dedup one shuffle;
LSH banding an equi-join, never all-pairs; CC O(rounds) shuffles with
the injectable barrier from softcite_kb_spark.materialize), and
SURVIVORSHIP per stage is recorded in a ``corpus_metrics`` table —
silent row loss is the corpus-prep failure mode to monitor for.

Re-runs are idempotent: every stage is deterministic, so running the
pipeline twice commits byte-identical table contents (tested).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from softcite_kb_spark.materialize import Materializer
from softcite_kb_spark.operators import dedup as dd
from softcite_kb_spark.operators import textops as tx
from softcite_kb_spark.operators.canonicalize import connected_components
from softcite_kb_spark.storage import TableStore


@dataclass
class CorpusConfig:
    # near-dup detection
    shingle_n: int = 3
    num_perm: int = 16
    bands: int = 4
    jaccard_threshold: float = 0.8
    max_bucket: int = 200
    # near-dup removal toggle: the LSH->Jaccard->CC leg is the one
    # non-SQL-expressible stage (CC); contract query q52 runs the
    # pipeline with it off so everything else is oracle-value-checked,
    # while the full leg is pytest-verified with planted near-dups
    near_dup: bool = True
    # filtering
    languages: tuple[str, ...] = ("en",)
    min_quality: float = 0.0
    min_tokens: int = 5
    max_tokens: int = 1_000_000
    extra: dict = field(default_factory=dict)


class CorpusPipeline:
    """raw ``documents`` table -> cleaned, deduplicated, filtered corpus.

    Store tables: ``docs_clean``, ``docs_dedup``, ``corpus`` (the
    survivors), ``corpus_stats``, ``corpus_metrics`` (per-stage
    survivorship). Input: a ``documents`` table with (doc_id, text).
    """

    def __init__(self, spark: SparkSession, store: TableStore,
                 config: CorpusConfig | None = None,
                 materializer: Materializer | None = None) -> None:
        self.spark = spark
        self.store = store
        self.config = config or CorpusConfig()
        self.materializer = materializer

    # -- stages -----------------------------------------------------------
    def stage_clean(self) -> None:
        docs = self.store.read(self.spark, "documents")
        cleaned = docs.withColumn(
            "text", tx.clean_text(tx.scrub_pii(F.col("text"))))
        cleaned = cleaned.filter(
            F.col("text").isNotNull() & (F.length("text") > 0))
        self.store.write(cleaned, "docs_clean")

    def _near_dup_drop_ids(self, docs: DataFrame) -> DataFrame:
        """(doc_id) rows to DROP: every member of a verified near-dup
        component except its min id. Pairs come from LSH banding (no
        all-pairs), verification is exact Jaccard on candidates only,
        transitivity from connected components."""
        cfg = self.config
        pairs = dd.lsh_candidate_pairs(
            docs, text_col="text", shingle_n=cfg.shingle_n,
            num_perm=cfg.num_perm, bands=cfg.bands,
            max_bucket=cfg.max_bucket, materializer=self.materializer)
        verified = dd.jaccard_pairs(
            docs, pairs, text_col="text", shingle_n=cfg.shingle_n,
            threshold=cfg.jaccard_threshold)
        # ids keep their NUMERIC type: connected_components min-labels
        # with the column's native ordering, and a string cast would make
        # the survivor the LEXICOGRAPHIC min ('10' < '9'), silently
        # keeping the wrong doc of a pair like (9, 10)
        comp = connected_components(
            verified.select(F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst")),
            materializer=self.materializer)
        return (comp.filter(F.col("member_id") != F.col("component_id"))
                .select(F.col("member_id").alias("doc_id")))

    def stage_dedup(self) -> None:
        docs = self.store.read(self.spark, "docs_clean")
        exact = dd.dedup_exact(docs, id_col="doc_id", text_col="text")
        if self.config.near_dup:
            drops = self._near_dup_drop_ids(exact)
            exact = exact.join(drops, "doc_id", "left_anti")
        self.store.write(exact, "docs_dedup")

    def stage_filter(self) -> None:
        cfg = self.config
        docs = self.store.read(self.spark, "docs_dedup")
        # ONE text_stats pass: the lang_id/quality_score wrappers each
        # tokenize internally, which would double the text-analysis cost
        # of the stage; derive both from a single stats projection
        scored = tx.quality_from_stats(
            tx.lang_from_stats(tx.text_stats(docs)))
        kept = scored.filter(
            F.col("lang_pred").isin(*cfg.languages)
            & (F.col("quality") >= cfg.min_quality)
            & F.col("n_tokens").between(cfg.min_tokens, cfg.max_tokens))
        self.store.write(kept.select(*docs.columns), "corpus")

    def stage_stats(self) -> None:
        corpus = self.store.read(self.spark, "corpus")
        self.store.write(tx.text_stats(corpus), "corpus_stats")

    # -- driver -----------------------------------------------------------
    STAGES = ("clean", "dedup", "filter", "stats")
    _STAGE_OUT = {"clean": "docs_clean", "dedup": "docs_dedup",
                  "filter": "corpus", "stats": "corpus_stats"}

    def run(self) -> dict[str, int]:
        """Run all stages; returns per-stage surviving row counts and
        commits (rows_in, rows_out) per stage to ``corpus_metrics`` —
        the SIGNED picture: a stage that GAINS rows (a join fan-out bug)
        is just as visible as one that drops them (no clamping)."""
        fns = {"clean": self.stage_clean, "dedup": self.stage_dedup,
               "filter": self.stage_filter, "stats": self.stage_stats}
        report: dict[str, int] = {}
        prev = self.store.current_snapshot("documents").row_count
        rows = []
        for stage in self.STAGES:
            fns[stage]()
            n = self.store.current_snapshot(self._STAGE_OUT[stage]).row_count
            report[stage] = n
            rows.append((stage, prev, n))
            prev = n
        metrics = self.spark.createDataFrame(
            rows, "stage string, rows_in long, rows_out long")
        self.store.write(metrics, "corpus_metrics")
        return report
