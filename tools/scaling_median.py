"""Median-of-k scaling measurement (round-4 protocol hardening).

The per-sample protocol (fresh JVM per level, untimed warmup,
min-of-reps) lives in bench_scaling.py; this wrapper addresses the
remaining noise source — the HOST's bandwidth allocation swinging
between samples — by running k complete samples and reporting the
median combined efficiency, per VERDICT r03 item 2. All samples are
recorded, not just the median, so an unstable host shows up as spread
rather than a cherry-pick.

Usage: python tools/scaling_median.py [k]   # default k=3
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(k: int = 3) -> None:
    samples = []
    for i in range(k):
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_scaling.py")],
            capture_output=True, text=True, timeout=3600, cwd=REPO)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(json.dumps({"error": f"sample {i} failed",
                              "stderr": p.stderr[-500:]}))
            sys.exit(1)
        s = json.loads(lines[-1])
        s["sample_wall_sec"] = round(time.time() - t0, 1)
        samples.append(s)
        print(json.dumps({"sample": i, "value": s.get("value"),
                          "extract": s.get("extract_efficiency"),
                          "fold": s.get("fold_efficiency")}),
              flush=True)
    vals = [s["value"] for s in samples]
    out = {
        "metric": "scaling_efficiency_median_of_k",
        "value": statistics.median(vals),
        "unit": "ratio",
        "k": k,
        "samples": vals,
        "extract_samples": [s["extract_efficiency"] for s in samples],
        "fold_samples": [s["fold_efficiency"] for s in samples],
        "detail": samples,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
