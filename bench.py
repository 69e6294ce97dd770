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
import shutil
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
            pred = qs[name](spark, sf_dir)
            n = pred.count()
            extras["triples_per_sec"] = round(n / best, 1)
            extras["n_triples"] = n
            # the north rule's OTHER metric: triple P/R vs the exact
            # relational ground truth (one depends_on triple per line),
            # via two-way exceptAll — an order-insensitive diff that
            # cannot false-pass on offsetting errors
            from pyspark.sql import functions as FF
            truth = (
                spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
                .select(
                    FF.col("l_orderkey").cast("string").alias("conv_id"),
                    FF.col("l_linenumber").alias("turn_idx"),
                    FF.concat(FF.lit("Part"), FF.col("l_partkey")).alias("subj"),
                    FF.lit("depends_on").alias("pred"),
                    FF.concat(FF.lit("Part"), FF.col("l_suppkey")).alias("obj"))
            )
            p = pred.select(*truth.columns)
            fp = p.exceptAll(truth).count()
            fn = truth.exceptAll(p).count()
            tp = n - fp
            extras["triple_precision"] = round(tp / max(n, 1), 6)
            extras["triple_recall"] = round(tp / max(tp + fn, 1), 6)

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
        # fixed names, cleared per run (timestamped dirs would leak a KB
        # store per rep per bench invocation)
        rep_root = os.path.join(work, f"kb_rep{rep}")
        shutil.rmtree(rep_root, ignore_errors=True)
        store = TableStore(rep_root)
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

    # incremental ingest (extras only): absorb a ~5% conversation batch
    # into an existing bucketed KB vs the full-rerun cost above — the
    # 10^12-turn claim measured. Setup (initial 95% run) is untimed.
    t_all = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    convs = [r.conv_id for r in t_all.select("conv_id").distinct().collect()]
    convs.sort()
    head = set(convs[: int(len(convs) * 0.95)])
    # fixed name, cleared per run — a timestamped dir would leak one
    # full KB store into /tmp per bench invocation
    inc_root = os.path.join(work, "inc_store")
    shutil.rmtree(inc_root, ignore_errors=True)
    inc_store = TableStore(inc_root)
    inc_pipe = KGPipeline(
        spark, inc_store,
        PipelineConfig(blacklist=tuple(datagen.BLACKLIST), min_vote_total=1,
                       partition_buckets=32))
    inc_pipe.write_transcripts(t_all.filter(F.col("conv_id").isin(head)))
    for n in ("authority_entities", "authority_ids"):
        inc_store.write(
            spark.read.parquet(os.path.join(corpus_dir, f"{n}.parquet")), n)
    inc_pipe.run(resume=False)
    full_extract_sec = inc_pipe._load_manifest()["extract"]["seconds"]
    batch = t_all.filter(~F.col("conv_id").isin(head))
    n_batch_turns = batch.count()
    t0 = time.perf_counter()
    rep = inc_pipe.ingest_increment(batch)
    inc_dt = time.perf_counter() - t0
    assert rep["extract"] == "skipped"
    inc_extract_sec = inc_pipe._load_manifest()["extract"]["seconds"]
    extras["incremental_batch_turns"] = n_batch_turns
    extras["incremental_ingest_sec"] = round(inc_dt, 3)
    # the structural win is STAGE 1 (the raw-turn-scale stage): batch
    # extract+append vs full-corpus extract. Stages 2-3 are corpus-wide
    # disambiguation and re-run either way — their share shrinks as the
    # corpus/batch ratio grows (at 10^12 turns, extract dominates).
    extras["incremental_stage1_sec"] = round(inc_extract_sec, 3)
    extras["full_stage1_sec"] = round(full_extract_sec, 3)
    extras["incremental_stage1_speedup"] = round(
        full_extract_sec / max(inc_extract_sec, 1e-9), 2)
    extras["incremental_vs_full_speedup"] = round(
        timings["kg_pipeline_e2e"] / inc_dt, 2)

    # incremental STAGE-2/3 maintenance (round 5): a 1% conversation
    # batch (the realistic increment ratio a transcript firehose sees
    # between downstream refreshes) into a bootstrapped store — the
    # increment maintains linking + canonicalization state instead of
    # re-running them over the corpus (plans/incremental.py).
    # Bootstrap (full run + state build) is setup, untimed. REPORTING
    # NOTE: at this fixture scale the path is commit-bound (~11 pruned
    # MERGE snapshots of fixed cost per increment) and is EXPECTED to
    # lose to the O(corpus) re-run on wall clock — the structural
    # numbers to watch are the read-bucket fractions (reads scale with
    # the touched slice) and the stage-2/3 attribution, which is what
    # amortizes at 10^12 turns where corpus scans cost minutes-hours.
    from softcite_kb_spark.plans.incremental import (  # noqa: E402
        IncrementalKGPipeline)

    inc23_root = os.path.join(work, "inc23_store")
    shutil.rmtree(inc23_root, ignore_errors=True)
    inc23_store = TableStore(inc23_root)
    inc23 = IncrementalKGPipeline(
        spark, inc23_store,
        PipelineConfig(blacklist=tuple(datagen.BLACKLIST), min_vote_total=1,
                       partition_buckets=32), surface_buckets=64)
    head23 = set(convs[: int(len(convs) * 0.99)])
    inc23.write_transcripts(t_all.filter(F.col("conv_id").isin(head23)))
    for n in ("authority_entities", "authority_ids"):
        inc23_store.write(
            spark.read.parquet(os.path.join(corpus_dir, f"{n}.parquet")), n)
    inc23.bootstrap(resume=False)
    batch23 = t_all.filter(~F.col("conv_id").isin(head23))
    t0 = time.perf_counter()
    rep23 = inc23.ingest_increment(batch23)
    inc23_dt = time.perf_counter() - t0
    assert rep23["link"] == "incremental"
    man23 = inc23._load_manifest()
    stage1_sec = man23["extract"]["seconds"]
    extras["incremental23_ingest_sec"] = round(inc23_dt, 3)
    extras["incremental23_stage1_sec"] = round(stage1_sec, 3)
    extras["incremental23_stage23_sec"] = round(inc23_dt - stage1_sec, 3)
    extras["incremental23_batch_turns"] = batch23.count()
    extras["incremental23_read_buckets"] = {
        t: len(b) for t, b in inc23.last_read_buckets.items()}
    extras["incremental23_total_surface_buckets"] = inc23.surface_buckets

    # skew: planted hot-key join (SURVEY J4's "R" short-name case) —
    # salted vs plain shuffle join under a 10%-hot-key fact table, dim
    # forced past broadcast so join-side skew is real. Both WALL TIME and
    # max/mean partition spread are recorded: locally the dim replication
    # can cost more than the skew saves (few cores, small hot key), while
    # the spread is the cluster-scale signal — a hot partition several x
    # the mean is a straggler at 1000 executors. Not summed into the
    # headline (new in round 3; keeps totals comparable across rounds).
    from softcite_kb_spark.functions.skew import salted_join  # noqa: E402

    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    n_fact, n_keys = 8_000_000, 200_000
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 10 == 0, F.lit("R"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")))
        .alias("key"),
        (F.col("id") % 97).alias("v")).persist()
    dim = spark.range(n_keys).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        (F.col("id") % 13).alias("w")).unionByName(
        spark.createDataFrame([("R", 1)], "key string, w bigint")).persist()
    fact.count()
    dim.count()

    def _skew_plain():
        return fact.join(dim, "key").groupBy("key").agg(
            F.sum(F.col("v") + F.col("w")).alias("s"))

    def _skew_salted():
        return salted_join(fact, dim, "key", salt_buckets=16) \
            .groupBy("key").agg(F.sum(F.col("v") + F.col("w")).alias("s"))

    for tag, fn in (("plain", _skew_plain), ("salted", _skew_salted)):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _consume(fn())
            d = time.perf_counter() - t0
            best = d if best is None else min(best, d)
        extras[f"skew_{tag}_sec"] = round(best, 3)
    for tag, j in (("plain", fact.join(dim, "key")),
                   ("salted", salted_join(fact, dim, "key", 16))):
        cnts = [r["c"] for r in
                j.groupBy(F.spark_partition_id().alias("p"))
                 .agg(F.count("*").alias("c")).collect()]
        extras[f"skew_{tag}_max_over_mean"] = round(
            max(cnts) / (sum(cnts) / len(cnts)), 2)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    fact.unpersist()
    dim.unpersist()

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
