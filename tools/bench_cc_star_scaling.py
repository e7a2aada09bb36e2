"""N→4N scaling for the two-phase star-contraction CC on the same
84M-edge rMat graph as tools/bench_scaling.py — the min-label CC's
2→8 pair is fixed-cost bound (~4.1 s/superstep of driver sync on a
6-round run); star contraction trades rounds for heavier shuffles,
so its parallel fraction — and pair efficiency — should be higher.

Usage: python tools/bench_cc_star_scaling.py [out_json]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

LEVELS = [int(x) for x in os.environ.get("STAR_LEVELS", "8,2").split(",")]
ROUNDS = int(os.environ.get("STAR_ROUNDS", 2))
N = 1 << 22
DEG = 20

_WORKER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
fixdir = sys.argv[2]
from ligra_spark.session import get_spark
from ligra_spark.graph import LinkGraph
from ligra_spark.apps.cc_star import cc_two_phase

spark = get_spark(f"starscale{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
gs = LinkGraph.from_parquet(spark, fixdir + "/edges_sym.parquet", n={n}, symmetric=True).materialize()
cc_two_phase(gs, max_iters=2)  # warm-up
ts, rr = [], 0
for r in range({rounds}):
    t0 = time.perf_counter()
    labels, rr = cc_two_phase(gs)
    labels.count()
    ts.append(time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "cc_star": ts, "rounds": rr}}))
"""


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "CC_STAR_SCALING.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixdir = os.path.join(tempfile.gettempdir(), f"ligra_scaling_n{N}_d{DEG}")
    if not os.path.exists(os.path.join(fixdir, "edges_sym.parquet")):
        raise SystemExit("run tools/bench_scaling.py first (shared fixture)")
    script = os.path.join(fixdir, "star_worker.py")
    with open(script, "w") as f:
        f.write(_WORKER.format(repo=repo, n=N, rounds=ROUNDS))
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, script, str(cpus), fixdir],
            capture_output=True, text=True, timeout=6000,
        )
        parsed = None
        for raw in reversed(out.stdout.strip().splitlines()):
            start = raw.find('{"cpus"')
            if start >= 0:
                try:
                    parsed = json.loads(raw[start:])
                    break
                except json.JSONDecodeError:
                    continue
        if parsed is None:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
            raise SystemExit(f"worker local[{cpus}] failed")
        results[cpus] = parsed
        print(f"local[{cpus}]: {parsed}", file=sys.stderr)
    med = statistics.median
    levels = sorted(results)
    summary = {"levels": {str(c): round(med(results[c]["cc_star"]), 2) for c in levels},
               "rounds": results[levels[0]]["rounds"], "raw": results}
    for lo, hi in zip(levels, levels[1:]):
        sp = med(results[lo]["cc_star"]) / med(results[hi]["cc_star"])
        summary[f"pair_{lo}to{hi}"] = {
            "speedup": round(sp, 2),
            "efficiency": round(sp / (hi / lo), 3),
        }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
