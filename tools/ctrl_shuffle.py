"""Standalone SHUFFLE-scaling control: the box's ceiling for shuffle work.

``tools/ctrl_md5.py`` measures the box's thread-scaling ceiling for
embarrassingly parallel codegen work (no shuffle, negligible memory
traffic).  A PageRank/CC superstep is the opposite regime: one full
shuffle of ~m rows into n groups, memory-bandwidth and shuffle-I/O
bound.  On a single box, 2 cores already see the whole memory
subsystem, so shuffle work CANNOT scale like CPU work when cores are
added — that ceiling is a property of the machine, not the engine.
This control quantifies it with zero engine code: the simplest
possible Spark job with the same shuffle shape as one PR superstep
(160M rows grouped into 4.2M keys, sum-aggregated, noop-sunk), in a
FRESH JVM per level (same isolation lesson as ctrl_md5).

Engine N->4N efficiencies for PR/CC should be read against THIS
control, and the md5 control tells how much of the gap is shuffle vs
scheduling.

Usage: python tools/ctrl_shuffle.py [out_json]
Env: CTRL_LEVELS (default "32,8,2"), CTRL_ROUNDS (default 3),
     CTRL_ROWS (default 160_000_000), CTRL_GROUPS (default 4_194_304)
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
ROWS = int(os.environ.get("CTRL_ROWS", 160_000_000))
GROUPS = int(os.environ.get("CTRL_GROUPS", 4_194_304))

_WORKER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
from pyspark.sql import functions as F
from ligra_spark.session import get_spark

spark = get_spark(f"ctrlshuf{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
# Same shuffle shape as one PR superstep: m rows -> n groups, sum agg.
# Knuth-hash key spreads ids uniformly (matches the engine's
# hash-partitioned layout); noop sink materializes without collect.
base = spark.range(0, {rows}, 1, cpus * 4)
job = (
    base.select(((F.col("id") * F.lit(2654435761)) % F.lit({groups})).alias("k"),
                (F.col("id") % F.lit(1000)).cast("double").alias("v"))
    .groupBy("k").agg(F.sum("v").alias("s"))
)
job.write.format("noop").mode("overwrite").save()  # warm-up
ts = []
for r in range({rounds}):
    t0 = time.perf_counter()
    job.write.format("noop").mode("overwrite").save()
    ts.append(time.perf_counter() - t0)
print("CTRLRESULT " + json.dumps({{"cpus": cpus, "shuffle_s": ts}}))
"""


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "CTRL_SHUFFLE.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(tempfile.gettempdir(), "ctrl_shuffle_worker.py")
    with open(script, "w") as f:
        f.write(_WORKER.format(repo=repo, rounds=ROUNDS, rows=ROWS, groups=GROUPS))

    runs = []
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, script, str(cpus)],
            capture_output=True, text=True, timeout=3600,
        )
        parsed = None
        for raw in reversed(out.stdout.strip().splitlines()):
            if raw.startswith("CTRLRESULT "):
                parsed = json.loads(raw[len("CTRLRESULT "):])
                break
        if parsed is None:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
            raise SystemExit(f"worker local[{cpus}] produced no result JSON")
        runs.append(parsed)
        print(f"local[{cpus}]: {parsed}", file=sys.stderr)

    med = {r["cpus"]: round(statistics.median(r["shuffle_s"]), 2) for r in runs}
    levels = sorted(med)
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        if hi == 4 * lo:
            pairs[f"{lo}to{hi}"] = {
                "speedup": round(med[lo] / med[hi], 3),
                "efficiency": round(med[lo] / med[hi] / 4, 3),
            }
    summary = {
        "shape": {"rows": ROWS, "groups": GROUPS,
                  "note": "range->hash key->groupBy.sum->noop; ~1 PR superstep of shuffle"},
        "levels": LEVELS, "rounds": ROUNDS,
        "runs": runs, "median_s": med, "pairs": pairs,
    }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
