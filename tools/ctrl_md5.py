"""Standalone thread-scaling control: the box's own ceiling.

Measures the md5-pipeline control (same expression as
``tools/bench_scaling.py``) at each parallelism level in a FRESH JVM
per level — round 2 showed the control is invalid when it shares a
GC-saturated heap with the graph phases, so this runs it isolated.
Embarrassingly parallel whole-stage-codegen work: its N→4N efficiency
is the most any job can scale on this box at those levels, and engine
efficiencies should be read against it (BASELINE.md round-2 caveat 2).

Usage: python tools/ctrl_md5.py [out_json]   Env: CTRL_LEVELS, CTRL_ROUNDS
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

LEVELS = [int(x) for x in os.environ.get("CTRL_LEVELS", "32,8,2").split(",")]
ROUNDS = int(os.environ.get("CTRL_ROUNDS", 3))

_WORKER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
from pyspark.sql import functions as F
from ligra_spark.session import get_spark

spark = get_spark(f"ctrl{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
ctrl = spark.range(0, 40_000_000, 1, cpus * 2)
ctrl.count()  # materialize range partitions (warm-up)
ts = []
for r in range({rounds}):
    t0 = time.perf_counter()
    ctrl.select(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                .cast("long").alias("h")).agg(F.sum("h")).first()
    ts.append(time.perf_counter() - t0)
print("CTRLRESULT " + json.dumps({{"cpus": cpus, "ctrl_s": ts}}))
"""


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "CTRL_MD5.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(tempfile.gettempdir(), "ctrl_md5_worker.py")
    with open(script, "w") as f:
        f.write(_WORKER.format(repo=repo, rounds=ROUNDS))

    runs = []
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, script, str(cpus)],
            capture_output=True, text=True, timeout=1200,
        )
        for raw in reversed(out.stdout.strip().splitlines()):
            if raw.startswith("CTRLRESULT "):
                runs.append(json.loads(raw[len("CTRLRESULT "):]))
                break
        else:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
            raise SystemExit(f"control worker at {cpus} produced no result")
        print(json.dumps(runs[-1]), file=sys.stderr)

    med = {r["cpus"]: statistics.median(r["ctrl_s"]) for r in runs}
    pairs = {}
    for lo, hi in [(2, 8), (8, 32)]:
        if lo in med and hi in med:
            pairs[f"{lo}to{hi}"] = {
                "speedup": round(med[lo] / med[hi], 3),
                "efficiency": round(med[lo] / med[hi] / (hi / lo), 3),
            }
    summary = {"levels": LEVELS, "rounds": ROUNDS, "runs": runs,
               "median_s": {str(k): round(v, 2) for k, v in med.items()},
               "pairs": pairs}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
