"""Billion-edge scaling point (round-3 evidence for the north rule).

Runs the two headline apps at m≈10^9 directed rMat edges (n=2^25) —
the first fixture big enough to stress the salted-hub layout and the
partition-spread behavior for real:

  * PageRank supersteps, salted layout OFF vs ON (salt_buckets=8),
    at local[32]: throughput (edges/sec/superstep) + the cached
    layout's per-partition edge-count spread (max/median — the
    straggler proxy; task wall time tracks partition size for this
    join+agg superstep shape).
  * PageRank at local[8] vs local[32] on the SAME input — the north
    rule's N→4N two-cluster-size criterion, evidenced per the driver
    instruction by two parallelism levels (no real cluster in this
    sandbox).
  * Connected components to fixpoint on the symmetrized graph
    (m≈2×10^9) at local[32], salt OFF vs ON.

Fixture generation is chunked ``rmat_edges`` (bit-exact to a single
call via the ``offset`` parameter) so no 16 GB single allocation is
needed; the symmetric twin is produced by the engine's own
``symmetrize`` (distributed union+dedup) and written once.

Timing protocol mirrors the reference (1 untimed warm-up + timed
rounds, median; ``/root/reference/ligra/ligra.h:490-495``).

Usage: python tools/bench_1b.py [out_json]
Env:   B1_EDGES (default 10^9), B1_N (2^25), B1_LEVELS (32,8),
       B1_SALTS (1,8), B1_ROUNDS (2), B1_PR_ITERS (3), B1_SKIP_CC
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

M = int(os.environ.get("B1_EDGES", 1_000_000_000))
N = int(os.environ.get("B1_N", 1 << 25))
LEVELS = [int(x) for x in os.environ.get("B1_LEVELS", "32,8").split(",")]
SALTS = [int(x) for x in os.environ.get("B1_SALTS", "1,8").split(",")]
ROUNDS = int(os.environ.get("B1_ROUNDS", 2))
PR_ITERS = int(os.environ.get("B1_PR_ITERS", 3))
SKIP_CC = bool(os.environ.get("B1_SKIP_CC"))
CHUNK = 125_000_000

_WORKER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
cpus, salt, mode = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
fixdir = sys.argv[4]
from pyspark.sql import functions as F
from ligra_spark.session import get_spark
from ligra_spark.graph import LinkGraph
from ligra_spark.apps import pagerank, components

spark = get_spark(
    f"b1_{{cpus}}_{{salt}}", cpus=cpus, shuffle_partitions=cpus * 4,
    extra_conf={{
        "spark.driver.memory": "96g",
        "spark.local.dir": fixdir + "/spark-tmp",
        # Disk safety at m=1e9 on a single box: each PR/CC superstep
        # writes ~10 GB of shuffle, and orphaned shuffle files are only
        # deleted when the driver GCs (ContextCleaner); the default
        # periodicGC.interval of 30min let ~7 supersteps of files pile
        # up and filled the disk.  45s keeps the high-water at ~2-3
        # live supersteps.  zstd halves shuffle + spilled-cache bytes
        # vs lz4 at <5% CPU cost on this join+agg shape.
        "spark.cleaner.periodicGC.interval": "45s",
        "spark.io.compression.codec": "zstd",
        "spark.rdd.compress": "true",
    }},
)
spark.sparkContext.setLogLevel("ERROR")

def spread(g):
    rows = g.edges.groupBy(F.spark_partition_id().alias("p")).count().collect()
    cnt = sorted(r["count"] for r in rows)
    med = cnt[len(cnt) // 2]
    return {{"parts": len(cnt), "min": cnt[0], "median": med, "max": cnt[-1],
             "max_over_median": round(cnt[-1] / max(med, 1), 3)}}

out = {{"cpus": cpus, "salt": salt, "mode": mode}}
if mode == "pr":
    t0 = time.perf_counter()
    g = LinkGraph.from_parquet(
        spark, fixdir + "/edges.parquet", n={n},
        num_partitions=cpus * 4, salt_buckets=salt,
    ).materialize()
    out["load_s"] = round(time.perf_counter() - t0, 2)
    out["m"] = g.m
    out["spread"] = spread(g)

    pagerank(g, max_iters=1)  # untimed warm-up (ligra.h:490 analog)
    prs = []
    for r in range({rounds}):
        t0 = time.perf_counter()
        _, it = pagerank(g, max_iters={pr_iters})
        prs.append(time.perf_counter() - t0)
    out["pr_iters"] = {pr_iters}
    out["pr_s"] = prs
    g.unpersist()
else:
    t0 = time.perf_counter()
    gs = LinkGraph.from_parquet(
        spark, fixdir + "/edges_sym.parquet", n={n},
        num_partitions=cpus * 4, symmetric=True, salt_buckets=salt,
    ).materialize()
    out["sym_load_s"] = round(time.perf_counter() - t0, 2)
    out["m_sym"] = gs.m
    out["sym_spread"] = spread(gs)
    t0 = time.perf_counter()
    # cadence-2 lineage cuts: at 2e9 edges a CC round writes ~8-12 GB
    # of shuffle, and files stay referenced until the next checkpoint
    # truncates the plan; the default cadence of 4 keeps too many
    # rounds live for this box's disk.  The cost (an extra 33M-row
    # state write every other round) is recorded, not hidden.
    _, cc_rounds = components(gs, checkpoint_every=2)
    out["cc_s"] = round(time.perf_counter() - t0, 2)
    out["cc_rounds"] = cc_rounds
    out["cc_checkpoint_every"] = 2
print("B1RESULT " + json.dumps(out))
"""

_SYMPREP = r"""
import sys, time
sys.path.insert(0, {repo!r})
fixdir = sys.argv[1]
from ligra_spark.session import get_spark
from ligra_spark.graph import symmetrize

spark = get_spark(
    "b1_symprep", cpus=32, shuffle_partitions=256,
    extra_conf={{"spark.driver.memory": "96g",
                 "spark.local.dir": fixdir + "/spark-tmp"}},
)
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
symmetrize(spark.read.parquet(fixdir + "/edges.parquet")) \
    .write.mode("overwrite").parquet(fixdir + "/edges_sym.parquet")
print(f"symprep done in {{time.time() - t0:.1f}}s")
"""


def generate(fixdir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ligra_spark.rmat import rmat_edges

    edir = os.path.join(fixdir, "edges.parquet")
    os.makedirs(edir, exist_ok=True)
    done = os.path.join(edir, "_SUCCESS")
    if os.path.exists(done):
        return
    off = 0
    part = 0
    while off < M:
        c = min(CHUNK, M - off)
        u, v = rmat_edges(N, c, seed=1, offset=off)
        pq.write_table(
            pa.table({"src": u, "dst": v}),
            os.path.join(edir, f"part-{part:04d}.parquet"),
        )
        print(f"generated edges [{off}, {off + c})", file=sys.stderr)
        off += c
        part += 1
    open(done, "w").close()


def run(cmd_args, timeout):
    out = subprocess.run(cmd_args, capture_output=True, text=True, timeout=timeout)
    for raw in reversed(out.stdout.strip().splitlines()):
        if raw.startswith("B1RESULT "):
            return json.loads(raw[len("B1RESULT "):])
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
    raise SystemExit("worker produced no result JSON")


def main():
    """Two disk-choreographed phases: the box cannot hold both parquet
    twins (11 + 21 GB) AND a worker's shuffle high-water at once, so
    each phase keeps ONLY the file it reads on disk.

      phase cc: needs edges_sym.parquet → delete edges.parquet
                (regenerated later, bit-exact: chunked rmat, seed 1)
      phase pr: needs edges.parquet     → delete edges_sym.parquet

    CC must run first — symmetrize derives from the directed table, so
    the sym file has to exist before the directed one is dropped, and
    regenerating the directed table is pure numpy (no Spark, no
    shuffle) while re-deriving sym is a 2e9-row Spark job."""
    import shutil

    out_json = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_r03.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixdir = os.path.join(tempfile.gettempdir(), f"ligra_1b_n{N}_m{M}")
    os.makedirs(fixdir, exist_ok=True)
    edir = os.path.join(fixdir, "edges.parquet")
    sdir = os.path.join(fixdir, "edges_sym.parquet")

    if not SKIP_CC and not os.path.exists(os.path.join(sdir, "_SUCCESS")):
        generate(fixdir)
        script = os.path.join(fixdir, "symprep.py")
        with open(script, "w") as f:
            f.write(_SYMPREP.format(repo=repo))
        r = subprocess.run(
            [sys.executable, script, fixdir], text=True, timeout=7200,
        )
        if r.returncode != 0:
            raise SystemExit("symprep failed")

    worker = os.path.join(fixdir, "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER.format(repo=repo, n=N, rounds=ROUNDS, pr_iters=PR_ITERS))

    results = []
    partial = out_json + ".partial"
    if os.path.exists(partial):
        with open(partial) as f:
            results = json.load(f).get("runs", [])
    done = {(r["mode"], r["cpus"], r["salt"]) for r in results}
    top = max(LEVELS)
    # (mode, cpus, salt) matrix: CC-to-fixpoint at the top level with
    # salt off/on (the verdict's ask); PR at every level (scaling
    # pair) plus salt-on at the top.
    combos = [("cc", top, s) for s in SALTS] if not SKIP_CC else []
    for cpus in LEVELS:
        for salt in SALTS if cpus == top else SALTS[:1]:
            combos.append(("pr", cpus, salt))

    def free_gb():
        return shutil.disk_usage(fixdir).free / 1e9

    for mode, cpus, salt in combos:
        if (mode, cpus, salt) in done:
            continue
        if mode == "cc" and os.path.exists(edir):
            shutil.rmtree(edir)  # phase cc: sym only on disk
        if mode == "pr":
            if os.path.exists(sdir):
                shutil.rmtree(sdir)  # phase pr: directed only on disk
            generate(fixdir)  # regenerate if phase cc dropped it
        print(f"[bench_1b] {mode} cpus={cpus} salt={salt} "
              f"(free {free_gb():.0f} GB)", file=sys.stderr)
        res = run([sys.executable, worker, str(cpus), str(salt),
                   mode, fixdir], timeout=14400)
        results.append(res)
        print(json.dumps(res), file=sys.stderr)
        with open(partial, "w") as f:
            json.dump({"runs": results}, f)

    # ---- aggregate
    def med(xs):
        return statistics.median(xs)

    summary = {"n": N, "m_directed": M, "runs": results, "table": []}
    by = {(r["cpus"], r["salt"]): r for r in results if r["mode"] == "pr"}
    for r in results:
        row = {"mode": r["mode"], "cpus": r["cpus"], "salt": r["salt"]}
        if r["mode"] == "pr":
            per_step = med(r["pr_s"]) / r["pr_iters"]
            row.update(
                pr_superstep_s=round(per_step, 2),
                pr_edges_per_s=round(r["m"] / per_step),
                spread_max_over_median=r["spread"]["max_over_median"],
            )
        else:
            cc_step = r["cc_s"] / max(r["cc_rounds"], 1)
            row.update(
                cc_s=r["cc_s"], cc_rounds=r["cc_rounds"],
                cc_superstep_s=round(cc_step, 2),
                cc_edges_per_s=round(r["m_sym"] / cc_step),
                spread_max_over_median=r["sym_spread"]["max_over_median"],
            )
        summary["table"].append(row)
    lo, hi = min(LEVELS), max(LEVELS)
    if (lo, SALTS[0]) in by and (hi, SALTS[0]) in by:
        t_lo = med(by[(lo, SALTS[0])]["pr_s"])
        t_hi = med(by[(hi, SALTS[0])]["pr_s"])
        summary["scaling"] = {
            "levels": [lo, hi], "pr_s": [round(t_lo, 2), round(t_hi, 2)],
            "speedup": round(t_lo / t_hi, 3),
            "efficiency": round(t_lo / t_hi / (hi / lo), 3),
        }
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)

    print("| mode | cpus | salt | superstep s | edges/s | spread max/med | CC s (rounds) |")
    print("|---|---|---|---|---|---|---|")
    for row in summary["table"]:
        if row["mode"] == "pr":
            step, eps, cc = row["pr_superstep_s"], row["pr_edges_per_s"], "—"
        else:
            step, eps = row["cc_superstep_s"], row["cc_edges_per_s"]
            cc = f"{row['cc_s']} ({row['cc_rounds']})"
        print(f"| {row['mode']} | {row['cpus']} | {row['salt']} | {step} | "
              f"{eps:,} | {row['spread_max_over_median']} | {cc} |")
    if "scaling" in summary:
        s = summary["scaling"]
        print(f"\nPR scaling local[{s['levels'][0]}]→local[{s['levels'][1]}]: "
              f"speedup {s['speedup']}x, efficiency {s['efficiency']}")


if __name__ == "__main__":
    main()
