"""Incremental triangle maintenance vs full recount: fold one small
edge batch into a maintained count over a large base graph
(`streaming.incremental_triangles`) and compare against re-running the
degree-oriented full enumeration on the union — the number that
justifies the delta formula under a continuous crawl.

The full recount enumerates every wedge of the union (O(m^1.5) under
degree orientation); the incremental fold enumerates only wedges
anchored on the |Δ| new edges (O(|Δ|·d̄)), so the gap widens linearly
with m/|Δ|.

Usage: python tools/bench_incr_tri.py [rmat_n] [deg] [batch_m]
Writes one JSON line; INCR_TRI_r{N}.json is the round artifact.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    batch_m = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    import pandas as pd

    from ligra_spark.apps.triangle import triangle_count
    from ligra_spark.graph import LinkGraph
    from ligra_spark.rmat import make_symmetric, rmat_edges
    from ligra_spark.session import get_spark
    from ligra_spark.streaming import (
        apply_tri_batch,
        read_tri_manifest,
        read_tri_total,
    )

    spark = get_spark("bench_incr_tri")
    p = spark.sparkContext.defaultParallelism

    def df_of(seed, m):
        src, dst = rmat_edges(n, m, seed=seed)
        return spark.createDataFrame(
            pd.DataFrame({"src": src, "dst": dst})
        ).persist()

    base = df_of(5, deg * n)
    batch = df_of(77, batch_m)
    base.count(), batch.count()  # materialize inputs untimed

    tri_dir = tempfile.mkdtemp(prefix="bench_triinc_")

    # bootstrap fold == full delta-vs-empty enumeration + edge write
    t0 = time.perf_counter()
    apply_tri_batch(base, 0, tri_dir)
    t_base = time.perf_counter() - t0
    total0 = read_tri_total(tri_dir)

    # the maintained fold: |batch| new edges against the full adjacency
    t0 = time.perf_counter()
    apply_tri_batch(batch, 1, tri_dir)
    t_incr = time.perf_counter() - t0
    man = read_tri_manifest(tri_dir)

    # full recount on the union (what a non-incremental pipeline pays
    # per refresh), same session, measured after the fold
    updf = (
        base.select("src", "dst").unionByName(batch.select("src", "dst")).toPandas()
    )
    su, du = make_symmetric(updf["src"].to_numpy(), updf["dst"].to_numpy())
    g = LinkGraph.from_edges(
        spark,
        spark.createDataFrame(pd.DataFrame({"src": su, "dst": du})),
        n=n,
        num_partitions=p,
        symmetric=True,
    ).materialize()
    t0 = time.perf_counter()
    full_total = triangle_count(g)
    t_full = time.perf_counter() - t0

    assert full_total == read_tri_total(tri_dir), (
        full_total,
        read_tri_total(tri_dir),
    )
    out = {
        "metric": "incremental_triangles_fold_vs_full_recount",
        "unit": "sec",
        "graph": {"n": n, "m_base": deg * n, "m_batch": batch_m},
        "bootstrap_fold": {"sec": round(t_base, 2), "triangles": total0},
        "incremental_fold": {
            "sec": round(t_incr, 2),
            "delta_triangles": man["deltas"]["1"],
        },
        "full_recount": {"sec": round(t_full, 2), "triangles": full_total},
        "speedup_incr_vs_full": round(t_full / t_incr, 2),
        "total_mismatches": 0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
