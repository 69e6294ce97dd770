"""Extra benchmark harness for optimization work (round 6).

NOT the driver's bench: ``bench.py`` is frozen for measurement. This file
exists to (a) time individual declared queries in isolation with the noop
sink (guide §1.4), (b) capture ``.explain("formatted")`` plans, and (c)
run focused component breakdowns — so before/after evidence in
OPTIMIZATION_r06.md comes from a reproducible command.

Usage:
  python bench_extra.py time q25_lsh_candidate_pairs [q14...] [--reps 3]
  python bench_extra.py plan q25_lsh_candidate_pairs --out plans/r06 --tag before
  python bench_extra.py all            # times the 12 headline queries

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the driver's
measured scale last round), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from softcite_kb_spark.session import get_spark  # noqa: E402

HEADLINE = [
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


def _spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return get_spark(master=f"local[{cpus}]", app_name="bench_extra",
                     shuffle_partitions=int(cpus))


def _consume(df):
    df.write.mode("overwrite").format("noop").save()


def cmd_time(names: list[str], reps: int) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    spark = _spark()
    qs = entry_mod.queries()
    # warm codegen/JVM once, untimed
    _consume(qs["q01_pricing_summary"](spark, sf_dir))
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _consume(qs[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir,
                      "total_min": round(sum(v["min"] for v in out.values()), 3)}))
    spark.stop()


def cmd_plan(names: list[str], out_dir: str, tag: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    os.makedirs(out_dir, exist_ok=True)
    spark = _spark()
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["time", "plan", "all"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="plans/r06")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()
    if args.cmd == "all":
        cmd_time(HEADLINE, args.reps)
    elif args.cmd == "time":
        cmd_time(args.names or HEADLINE, args.reps)
    else:
        cmd_plan(args.names or HEADLINE, args.out, args.tag)


if __name__ == "__main__":
    main()
