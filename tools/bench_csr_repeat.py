"""Variance-controlled CC backend comparison: ONE session, graph and
pack loaded once, then N alternating (join, csr) components runs —
medians + spreads. Cross-process single-shot runs showed ±30% swings
at 16M edges (26-31s join, 21-28s csr across three sessions); this is
the protocol that decides the honest number.

Usage: python tools/bench_csr_repeat.py [cpus] [reps] [m_directed] [n]
Writes CSR_REPEAT_r03_c{cpus}_m{m}.json
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16_000_000
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 1 << 21

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ligra_spark.csr_backend import make_csr_edge_map, pack_csr
    from ligra_spark.graph import LinkGraph
    from ligra_spark.rmat import make_symmetric, rmat_edges
    from ligra_spark.session import get_spark

    spark = get_spark("bench_csr_repeat", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="csr_rep_")
    src, dst = rmat_edges(n, m, seed=1)
    s2, d2 = make_symmetric(src, dst)
    pq.write_table(pa.table({"src": s2, "dst": d2}), f"{tmp}/sym.parquet")
    del src, dst, s2, d2
    gsym = LinkGraph.from_parquet(
        spark, f"{tmp}/sym.parquet", n=n, symmetric=True
    ).materialize()
    pack = pack_csr(gsym, f"{tmp}/pack")
    em = make_csr_edge_map(pack)

    from ligra_spark.apps import components

    # warm-up both
    components(gsym, max_iters=2)
    components(gsym, max_iters=2, edge_map_fn=em)

    runs = {"join": [], "csr": []}
    for i in range(reps):
        for name, kw in (("join", {}), ("csr", {"edge_map_fn": em})):
            t0 = time.perf_counter()
            _, rounds = components(gsym, **kw)
            runs[name].append(round(time.perf_counter() - t0, 3))
        print(f"rep {i}: join={runs['join'][-1]} csr={runs['csr'][-1]}", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    out = {
        "cpus": cpus,
        "n": n,
        "m_sym": gsym.m,
        "reps": reps,
        "cc_rounds": rounds,
        "join": runs["join"],
        "csr": runs["csr"],
        "join_median": med(runs["join"]),
        "csr_median": med(runs["csr"]),
        "csr_speedup_median": round(med(runs["join"]) / med(runs["csr"]), 3),
    }
    with open(f"CSR_REPEAT_r03_c{cpus}_m{m // 1_000_000}M.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
