"""Scaling-efficiency evidence: the same job at two parallelism levels.

BASELINE.json's north rule requires throughput scaling efficiency >= 0.8
from N to 4N executors. No real cluster exists in this sandbox, so per
BASELINE.md the evidence is the same job at two local parallelism levels
(N=2 and 4N=8 cores by default) on the same input, reporting throughput at
both plus efficiency = (throughput_4N / throughput_N) / 4.

Why 2 vs 8 and not 8 vs 32: this VM advertises 32 vCPUs but a pure-JVM
codegen probe (range-sum) regresses beyond ~16 threads (SMT + host
contention), so 8->32 would measure the box, not the engine. 2->8 sits
inside the machine's linear region. Override with SCALING_LEVELS=8,32.

Measurement protocol (the numbers are meaningless without it):
  * each level runs in its own subprocess — fresh JVM, no code-cache reuse;
  * one untimed warmup run per level (JIT + codegen compilation otherwise
    lands inside the first timed rep and inflates the low-core level less);
  * REPS timed reps, min taken (min approximates the uncontended machine —
    the sandbox host has bursty background load).

Workload: stage-1 extraction + mention fold + count over a 4x-replicated
synthetic transcript table (~2.4M turns at sf0.1), file-backed with 64
input splits — the north-star hot path, embarrassingly parallel modulo the
fold shuffle.

Usage:
  python bench_scaling.py              # orchestrate both levels, print JSON
  python bench_scaling.py --worker N   # internal: run one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = tuple(int(x) for x in
               os.environ.get("SCALING_LEVELS", "2,8").split(","))
REPLICATE = 4
REPS = 3
INPUT_DIR = "/tmp/scaling_input_v1"


def prepare_input() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from softcite_kb_spark.session import get_spark

    if os.path.exists(os.path.join(INPUT_DIR, "_SUCCESS")):
        return
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      app_name="scaling-prep")
    t = entry_mod._synthetic_transcripts(spark, SF_DIR)
    reps = [t.withColumn("conv_id", F.concat(F.lit(f"r{i}-"), F.col("conv_id")))
            for i in range(REPLICATE)]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    big.repartition(64).write.mode("overwrite").parquet(INPUT_DIR)
    spark.stop()


def worker(cpus: int) -> None:
    from softcite_kb_spark.operators import extraction as ex
    from softcite_kb_spark.session import get_spark

    # Pin the WHOLE process tree (this interpreter + the JVM it spawns —
    # affinity is inherited across fork/exec) to exactly `cpus` logical
    # cores. local[N] caps only Spark TASK threads; on an otherwise idle
    # many-core host the JVM's GC/JIT/IO threads of the low-N leg leak
    # onto spare cores, making the 2-core leg faster than 2 cores of a
    # real N-core node and DEFLATING the measured efficiency (observed:
    # quiet-host samples at 0.56-0.64 vs 0.82-0.90 under load, where
    # competing load incidentally confined the leak). Pinning makes the
    # leg behave like a node that actually has N cores — what the
    # two-cluster-size rule is about. Opt out: SPARK_GRAFT_NO_PIN=1.
    pinned = False
    if not os.environ.get("SPARK_GRAFT_NO_PIN") and hasattr(
            os, "sched_setaffinity"):
        os.sched_setaffinity(0, range(cpus))
        pinned = True

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name=f"scaling-{cpus}")
    big = spark.read.parquet(INPUT_DIR)
    n_turns = big.count()

    def extract_job() -> int:
        return ex.extract_triples(big, blacklist=None).count()

    def fold_job() -> tuple[int, int]:
        # persist/unpersist per rep: a localCheckpoint here would leave its
        # blocks cached forever and successive reps degrade as the block
        # manager fills (measured: 84s -> 173s over 3 reps at 8 cores)
        triples = ex.extract_triples(big, blacklist=None).persist()
        n_triples = triples.count()
        n_groups = ex.fold_mentions(ex.mentions_from_triples(triples)).count()
        triples.unpersist(blocking=True)
        return n_triples, n_groups

    def timed(fn, reps):
        fn()  # warmup: JIT + codegen, untimed
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
        return times

    # primary: extraction (the triples/sec north-star metric; compute-bound
    # — the component whose scaling a cluster would reproduce). The fold is
    # reported too but is shuffle-bound: on local[N] every "executor"
    # shares ONE disk/page cache, so its local thread-scaling floor is not
    # representative of multi-executor shuffle scaling.
    ex_times = timed(extract_job, REPS)
    fold_times = timed(lambda: fold_job(), max(2, REPS - 1))
    n_triples = n_turns  # one depends_on triple per turn in this corpus
    dt = min(ex_times)
    print(json.dumps({
        "cpus": cpus, "pinned": pinned, "seconds": round(dt, 3),
        "extract_rep_seconds": ex_times,
        "fold_rep_seconds": fold_times,
        "fold_seconds": min(fold_times),
        "n_turns": n_turns, "n_triples": n_triples,
        "turns_per_sec": round(n_turns / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
    }))
    spark.stop()


def orchestrate() -> None:
    prepare_input()
    results = {}
    for cpus in LEVELS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, timeout=1500,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(json.dumps({"error": f"worker {cpus} failed",
                              "stderr": p.stderr[-500:]}))
            sys.exit(1)
        results[cpus] = json.loads(lines[-1])
    n, four_n = LEVELS
    scale = four_n / n
    ex_eff = round((results[n]["seconds"] / results[four_n]["seconds"])
                   / scale, 3)
    fold_eff = round(
        (results[n]["fold_seconds"] / results[four_n]["fold_seconds"])
        / scale, 3)
    comb_n = results[n]["seconds"] + results[n]["fold_seconds"]
    comb_4n = results[four_n]["seconds"] + results[four_n]["fold_seconds"]
    comb_eff = round((comb_n / comb_4n) / scale, 3)
    turns = results[n]["n_turns"]
    out = {
        # headline: the full stage-1 job (extraction + mention fold)
        "metric": "scaling_efficiency_n_to_4n",
        "value": comb_eff,
        "unit": "ratio",
        "extract_efficiency": ex_eff,
        "fold_efficiency": fold_eff,
        "combined_throughput_n": round(turns / comb_n, 1),
        "combined_throughput_4n": round(turns / comb_4n, 1),
        "n_level": results[n],
        "four_n_level": results[four_n],
        "sf_dir": SF_DIR,
        "note": f"local[{n}] vs local[{four_n}] per BASELINE.md (no real "
                "cluster in sandbox); warmup + min-of-reps protocol; "
                "efficiency = (time_N/time_4N)/4 on the stage-1 job "
                "(extraction + same-name fold) over the same input",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        orchestrate()
