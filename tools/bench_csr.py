"""Join engine vs per-partition-CSR backend on the iterative hot path.

Two graphs, both backends, identical algorithms (the apps share ALL
code except the ``edge_map_fn`` physical backend):

  bench  — the BENCH_r{N} graph (sf dir lineitem, V=65536): pagerank10
           + components-to-fixpoint, matching bench.py's protocol.
  rmat   — rMat n=2^21, m=16M directed (+ symmetrized for CC): big
           enough that per-superstep work dominates driver sync.

Pack time is reported separately (it is a once-per-graph cost, like
the LinkGraph load both backends share).  Writes CSR_BACKEND_r03.json.

Usage: python tools/bench_csr.py [sf_dir] [cpus]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

V_BENCH = 65536
# override for bigger points: CSR_RMAT_N / CSR_RMAT_M (+ CSR_SKIP_BENCH=1
# to run only the rMat pair, CSR_SKIP_PR=1 to run only CC)
N_RMAT = int(os.environ.get("CSR_RMAT_N", 1 << 21))
M_RMAT = int(os.environ.get("CSR_RMAT_M", 16_000_000))
SKIP_BENCH = os.environ.get("CSR_SKIP_BENCH") == "1"
SKIP_PR = os.environ.get("CSR_SKIP_PR") == "1"


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def run_pair(name, g, gsym, pack, pack_sym, pack_secs, results):
    from ligra_spark.apps import components, pagerank
    from ligra_spark.csr_backend import make_csr_edge_map

    # warm-up both backends (JIT/codegen/worker spin-up, page cache)
    if not SKIP_PR:
        pagerank(g, max_iters=2)
        pagerank(g, max_iters=2, edge_map_fn=make_csr_edge_map(pack))
    components(gsym, max_iters=2)
    components(gsym, max_iters=2, edge_map_fn=make_csr_edge_map(pack_sym))

    entry = {"m": g.m, "m_sym": gsym.m, "pack_secs": pack_secs}
    if not SKIP_PR:
        entry["pr10_join"], _ = timed(lambda: pagerank(g, max_iters=10))
        entry["pr10_csr"], _ = timed(
            lambda: pagerank(g, max_iters=10, edge_map_fn=make_csr_edge_map(pack))
        )
    t, (ccj, rounds) = timed(lambda: components(gsym))
    entry["cc_join"], entry["cc_rounds"] = t, rounds
    t, (ccc, rounds2) = timed(
        lambda: components(gsym, edge_map_fn=make_csr_edge_map(pack_sym))
    )
    entry["cc_csr"] = t
    assert rounds2 == rounds
    # cross-backend equality is part of the bench contract
    diff = (
        ccj.withColumnRenamed("component", "a")
        .join(ccc.withColumnRenamed("component", "b"), "id")
        .filter("a <> b")
        .count()
    )
    assert diff == 0, f"{name}: CC labels diverge on {diff} vertices"
    if not SKIP_PR:
        entry["pr_speedup_csr"] = round(entry["pr10_join"] / entry["pr10_csr"], 3)
    entry["cc_speedup_csr"] = round(entry["cc_join"] / entry["cc_csr"], 3)
    results[name] = entry
    print(name, json.dumps(entry), flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    from ligra_spark.csr_backend import pack_csr
    from ligra_spark.graph import LinkGraph
    from ligra_spark.session import get_spark

    spark = get_spark("bench_csr", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    results = {"cpus": cpus, "sf_dir": sf_dir}
    tmp = tempfile.mkdtemp(prefix="csr_bench_")

    # --- bench graph (bench.py protocol) ---------------------------------
    if not SKIP_BENCH:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        edges = li.select(
            (F.col("l_orderkey") % V_BENCH).alias("src"),
            (F.col("l_partkey") % V_BENCH).alias("dst"),
        )
        g = LinkGraph.from_edges(spark, edges, n=V_BENCH).materialize()
        gsym = LinkGraph.from_edges(
            spark, edges, n=V_BENCH, make_symmetric=True
        ).materialize()
        tp, pack = timed(lambda: pack_csr(g, f"{tmp}/bench"))
        tps, pack_sym = timed(lambda: pack_csr(gsym, f"{tmp}/bench_sym"))
        run_pair("bench", g, gsym, pack, pack_sym, [tp, tps], results)
        for x in (g, gsym):
            x.unpersist()

    # --- rMat 16M ---------------------------------------------------------
    from ligra_spark.rmat import make_symmetric, rmat_edges

    src, dst = rmat_edges(N_RMAT, M_RMAT, seed=1)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"src": src, "dst": dst}), f"{tmp}/rmat.parquet")
    s2, d2 = make_symmetric(src, dst)
    pq.write_table(pa.table({"src": s2, "dst": d2}), f"{tmp}/rmat_sym.parquet")
    del src, dst, s2, d2
    g = LinkGraph.from_parquet(spark, f"{tmp}/rmat.parquet", n=N_RMAT).materialize()
    gsym = LinkGraph.from_parquet(
        spark, f"{tmp}/rmat_sym.parquet", n=N_RMAT, symmetric=True
    ).materialize()
    tp, pack = timed(lambda: pack_csr(g, f"{tmp}/rmat"))
    tps, pack_sym = timed(lambda: pack_csr(gsym, f"{tmp}/rmat_sym"))
    rmat_name = f"rmat{M_RMAT // 1_000_000}M"
    run_pair(rmat_name, g, gsym, pack, pack_sym, [tp, tps], results)

    if not SKIP_PR:
        results["pr_superstep_edges_per_sec"] = {
            "join": round(results[rmat_name]["m"] / (results[rmat_name]["pr10_join"] / 10)),
            "csr": round(results[rmat_name]["m"] / (results[rmat_name]["pr10_csr"] / 10)),
        }
    tag = "" if (cpus == 32 and not SKIP_BENCH and M_RMAT == 16_000_000) else f"_c{cpus}_{M_RMAT // 1_000_000}M"
    out = f"CSR_BACKEND_r03{tag}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
