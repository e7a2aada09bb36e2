"""Two-parallelism scaling evidence for the north rule.

No real cluster exists in this sandbox, so N→4N executors is evidenced
by running the SAME job on the SAME input at local[N_CORES_LO] and
local[N_CORES_HI] (4x cores), per the driver instruction.  Protocol
mirrors the reference's timing discipline (1 untimed warm-up + timed
rounds, ``ligra/ligra.h:490-495``): per level, PR(10) and CC run
``ROUNDS`` times after warm-up; we report the median.

A pure-CPU control (md5 pipeline) calibrates the box's own thread-
scaling ceiling — on this VM 8→32 threads tops out well below 4x even
for embarrassingly parallel codegen work, so engine efficiency should
be read against that ceiling, not against an ideal 4.0.

Usage: python tools/bench_scaling.py [out_json]
Writes JSON and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

LO, HI = 8, 32
ROUNDS = int(os.environ.get("SCALING_ROUNDS", 3))
LEVELS = [int(x) for x in os.environ.get("SCALING_LEVELS", "32,8").split(",")]
MERGE = os.environ.get("SCALING_MERGE")  # prior raw-results JSON to reuse
N = 1 << 22  # 4.2M vertices
DEG = 20     # 84M directed edges

_WORKER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
edges_path = sys.argv[2]
from pyspark.sql import functions as F
from ligra_spark.session import get_spark
from ligra_spark.graph import LinkGraph
from ligra_spark.apps import pagerank, components

spark = get_spark(f"scaling{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
g = LinkGraph.from_parquet(spark, edges_path + "/edges.parquet", n={n}).materialize()
gs = LinkGraph.from_parquet(spark, edges_path + "/edges_sym.parquet", n={n}, symmetric=True).materialize()

pagerank(g, max_iters=2)           # warm-up (ligra.h:490 analog)
prs, ccs = [], []
for r in range({rounds}):
    t0 = time.perf_counter(); _, it = pagerank(g, max_iters=10); prs.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); _, cc_r = components(gs); ccs.append(time.perf_counter() - t0)

ctrl = spark.range(0, 40_000_000, 1, cpus * 2)
ctrl.count()
cts = []
for r in range({rounds}):
    t0 = time.perf_counter()
    ctrl.select(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                .cast("long").alias("h")).agg(F.sum("h")).first()
    cts.append(time.perf_counter() - t0)
print(json.dumps({{"cpus": cpus, "pr10": prs, "cc": ccs, "cc_rounds": cc_r,
                   "m": g.m, "m_sym": gs.m, "ctrl": cts}}))
"""


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixdir = os.path.join(tempfile.gettempdir(), f"ligra_scaling_n{N}_d{DEG}")
    if not os.path.exists(os.path.join(fixdir, "edges_sym.parquet")):
        os.makedirs(fixdir, exist_ok=True)
        sys.path.insert(0, repo)
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ligra_spark.rmat import make_symmetric, rmat_edges

        src, dst = rmat_edges(N, DEG * N, seed=1)
        pq.write_table(pa.table({"src": src, "dst": dst}), f"{fixdir}/edges.parquet")
        s, d = make_symmetric(src, dst)
        pq.write_table(pa.table({"src": s, "dst": d}), f"{fixdir}/edges_sym.parquet")

    worker = _WORKER.format(repo=repo, n=N, rounds=ROUNDS)
    script = os.path.join(fixdir, "worker.py")
    with open(script, "w") as f:
        f.write(worker)

    results = {}
    if MERGE and os.path.exists(MERGE):
        with open(MERGE) as f:
            results = {int(k): v for k, v in json.load(f).get("raw", {}).items()}
    for cpus in LEVELS:
        if cpus in results:
            continue
        out = subprocess.run(
            [sys.executable, script, str(cpus), fixdir],
            capture_output=True, text=True, timeout=6000,
        )
        # console progress fragments can share the last line with the
        # result — scan backwards for the first parseable JSON object
        parsed = None
        for raw in reversed(out.stdout.strip().splitlines()):
            start = raw.find('{"cpus"')
            if start < 0:
                continue
            try:
                parsed = json.loads(raw[start:])
                break
            except json.JSONDecodeError:
                continue
        if parsed is None:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-2000:])
            raise SystemExit(f"worker local[{cpus}] produced no result JSON")
        results[cpus] = parsed
        print(f"local[{cpus}]: {results[cpus]}", file=sys.stderr)
        with open(out_json + ".partial", "w") as f:
            json.dump({"raw": results}, f)

    med = statistics.median
    levels = sorted(results)
    any_r = results[levels[0]]
    m, m_sym, ccr = any_r["m"], any_r["m_sym"], any_r["cc_rounds"]
    summary = {
        "graph": {"n": N, "m": m, "m_sym": m_sym},
        "protocol": f"1 warm-up + median of timed rounds per level; levels local{levels}",
        "throughput": {},   # per level, per phase
        "pairs": {},        # N -> 4N efficiency per adjacent 4x pair
        "raw": results,
    }
    phases = (
        ("pagerank10", "pr10", m, 10),
        ("components", "cc", m_sym, ccr),
        ("cpu_control_md5", "ctrl", None, 1),
    )
    for name, key, edges, rounds in phases:
        summary["throughput"][name] = {
            str(c): {
                "sec": round(med(results[c][key]), 2),
                **(
                    {"edges_per_sec_per_superstep": round(
                        edges / (med(results[c][key]) / rounds))}
                    if edges else {}
                ),
            }
            for c in levels
        }
    for lo_c, hi_c in zip(levels, levels[1:]):
        if hi_c != 4 * lo_c:
            continue
        pair = {}
        for name, key, _, _ in phases:
            tlo, thi = med(results[lo_c][key]), med(results[hi_c][key])
            pair[name] = {
                "sec_lo": round(tlo, 2), "sec_hi": round(thi, 2),
                "speedup": round(tlo / thi, 2),
                "efficiency": round(tlo / thi / 4, 3),
            }
        summary["pairs"][f"{lo_c}->{hi_c}"] = pair

    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))

    for pname, pair in summary["pairs"].items():
        print(f"\n| phase ({pname} cores) | N s | 4N s | speedup | efficiency |")
        print("|---|---|---|---|---|")
        for name, e in pair.items():
            print(f"| {name} | {e['sec_lo']} | {e['sec_hi']} | {e['speedup']} | {e['efficiency']} |")


if __name__ == "__main__":
    main()
