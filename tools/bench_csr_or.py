"""bit_or supersteps (64-wave kBFS): join engine vs CSR backend.

ecc_kbfs is the most expensive BENCH_r{N} phase (~41s at sf0.1); its
supersteps are dense bit_or passes — exactly the monoid class where the
CSR kernel won CC (CSR_BACKEND_r03.json). Same protocol as bench_csr:
bench-graph (sf dir lineitem, symmetric) + rMat 16M sym, warm-up pass,
cross-backend equality asserted. Writes CSR_OR_r03.json.

Usage: python tools/bench_csr_or.py [sf_dir] [cpus]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

V_BENCH = 65536
N_RMAT = 1 << 21
M_RMAT = 16_000_000


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def run_pair(name, gsym, pack_sym, results):
    from ligra_spark.apps import radii
    from ligra_spark.apps.ecc import ecc_kbfs
    from ligra_spark.csr_backend import make_csr_edge_map

    em = make_csr_edge_map(pack_sym)
    entry = {"m_sym": gsym.m}
    # warm-up (JIT/codegen/worker spin-up)
    radii(gsym)
    radii(gsym, edge_map_fn=em)

    t, (rj, _) = timed(lambda: radii(gsym))
    entry["radii_join"] = t
    t, (rc, _) = timed(lambda: radii(gsym, edge_map_fn=em))
    entry["radii_csr"] = t
    assert sorted(map(tuple, rj.collect())) == sorted(map(tuple, rc.collect()))
    t, (ej, _) = timed(lambda: ecc_kbfs(gsym, seed=0))
    entry["ecc_kbfs_join"] = t
    t, (ec, _) = timed(lambda: ecc_kbfs(gsym, seed=0, edge_map_fn=em))
    entry["ecc_kbfs_csr"] = t
    assert sorted(map(tuple, ej.collect())) == sorted(map(tuple, ec.collect()))
    entry["radii_speedup_csr"] = round(entry["radii_join"] / entry["radii_csr"], 3)
    entry["ecc_speedup_csr"] = round(
        entry["ecc_kbfs_join"] / entry["ecc_kbfs_csr"], 3
    )
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

    spark = get_spark("bench_csr_or", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    results = {"cpus": cpus, "sf_dir": sf_dir}
    tmp = tempfile.mkdtemp(prefix="csr_or_")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        (F.col("l_orderkey") % V_BENCH).alias("src"),
        (F.col("l_partkey") % V_BENCH).alias("dst"),
    )
    gsym = LinkGraph.from_edges(
        spark, edges, n=V_BENCH, make_symmetric=True
    ).materialize()
    pack_sym = pack_csr(gsym, f"{tmp}/bench_sym")
    run_pair("bench", gsym, pack_sym, results)
    gsym.unpersist()

    from ligra_spark.rmat import make_symmetric, rmat_edges

    import pyarrow as pa
    import pyarrow.parquet as pq

    src, dst = rmat_edges(N_RMAT, M_RMAT, seed=1)
    s2, d2 = make_symmetric(src, dst)
    pq.write_table(pa.table({"src": s2, "dst": d2}), f"{tmp}/rmat_sym.parquet")
    del src, dst, s2, d2
    gsym = LinkGraph.from_parquet(
        spark, f"{tmp}/rmat_sym.parquet", n=N_RMAT, symmetric=True
    ).materialize()
    pack_sym = pack_csr(gsym, f"{tmp}/rmat_sym")
    run_pair("rmat16M", gsym, pack_sym, results)

    with open("CSR_OR_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
