"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "triples_per_sec": N, ...}

The headline set covers the engine's hot paths: stage-1 extraction over a
600k-turn synthetic transcript table (the north-star metric = triples/sec),
the 3-stage KG pipeline on a generated conversation corpus, and a spread of
aggregation / join / window / dedup / text / similarity operators.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from softcite_kb_spark import datagen  # noqa: E402
from softcite_kb_spark.operators import extraction as ex  # noqa: E402
from softcite_kb_spark.plans.pipeline import KGPipeline, PipelineConfig  # noqa: E402
from softcite_kb_spark.session import get_spark  # noqa: E402
from softcite_kb_spark.storage import TableStore  # noqa: E402

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_segment_revenue_join",
    "q06_supplier_majority_vote",
    "q09_latest_event_per_user",
    "q14_doc_token_stats",
    "q17_doc_fingerprint",
    "q19_doc_minhash",
    "q21_emb_topk",
    "q23_extract_triples_synthetic",
    "q24_fold_mentions_synthetic",
    "q25_lsh_candidate_pairs",
    "q26_simhash_near_pairs",
]


def _consume(df) -> int:
    """Force FULL execution without driver-side materialization cost.

    NOT ``count()``: Catalyst prunes projection-only work under a count,
    so a query whose cost is per-row computed columns (fingerprints,
    minhash slots, token stats) would time an empty-projection parquet
    scan instead of the operator. The noop sink computes every column of
    every row and discards them; row count comes from a cheap accumulator-
    free second count (metadata/pruned — fine, it is not timed work we
    rely on for cost).
    """
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(master=f"local[{cpus}]", app_name="bench",
                      shuffle_partitions=int(cpus))

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # warm the JVM/codegen once (tiny query, not timed)
    _consume(qs["q01_pricing_summary"](spark, sf_dir))

    for name in BENCH_QUERIES:
        # min of 2 reps: the sandbox host has bursty background load and a
        # single-shot timing can be 3-8x off; min approximates uncontended
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _consume(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if name == "q23_extract_triples_synthetic":
            # row count OUTSIDE the timed reps (count() prunes projections,
            # so it measures a different plan than the timed noop sink)
            n = qs[name](spark, sf_dir).count()
            extras["triples_per_sec"] = round(n / best, 1)
            extras["n_triples"] = n

    # full 3-stage KG pipeline on a generated transcript corpus
    work = "/tmp/bench_kb"
    corpus_dir = os.path.join(work, "corpus")
    corpus_cfg = {"n_conversations": 6000, "seed": 42}
    marker = os.path.join(corpus_dir, "_corpus_cfg.json")
    # regenerate when the corpus CONFIG changes — a bare existence check
    # would silently benchmark a stale corpus from an older configuration
    stale = True
    if os.path.exists(marker):
        with open(marker) as f:
            stale = json.load(f) != corpus_cfg
    if stale:
        datagen.write_corpus(corpus_dir, **corpus_cfg)
        with open(marker, "w") as f:
            json.dump(corpus_cfg, f)
    # min-of-2 like every other timing: the pipeline is the largest
    # headline component and a single-shot run is hostage to load bursts
    dt = None
    for rep in range(2):
        store = TableStore(os.path.join(work, f"kb_{int(time.time())}_{rep}"))
        for n in ("transcripts", "authority_entities", "authority_ids"):
            store.write(
                spark.read.parquet(os.path.join(corpus_dir, f"{n}.parquet")), n)
        t0 = time.perf_counter()
        KGPipeline(spark, store,
                   PipelineConfig(blacklist=tuple(datagen.BLACKLIST),
                                  min_vote_total=1)).run(resume=False)
        d = time.perf_counter() - t0
        dt = d if dt is None else min(dt, d)
    timings["kg_pipeline_e2e"] = round(dt, 3)
    n_turns = store.current_snapshot("transcripts").row_count
    n_triples = store.current_snapshot("triples").row_count
    extras["kg_pipeline_turns"] = n_turns
    extras["kg_pipeline_turns_per_sec"] = round(n_turns / dt, 1)
    extras["kg_pipeline_triples"] = n_triples

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
