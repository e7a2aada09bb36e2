"""Incremental CC maintenance vs full recompute: fold one small edge
batch into a maintained star table over a large base graph
(`streaming.incremental_cc`) and compare against re-running CC on the
union from scratch — the number that justifies maintaining component
state under a continuous crawl.

Two effects to separate honestly:

- the AFFECTED-COMPONENT filter only shrinks the recontraction input
  when the batch misses big components — a random batch on a web-shape
  graph hits the giant component, so the filter passes ~all stars;
- the STAR REPRESENTATION is what wins anyway: the recontraction input
  is |touched vertices| depth-1 star rows (converging in 2-3 rounds),
  not |E| raw edges (converging in ~6-8) — on a 10x-average-degree
  graph that's ~10x fewer input rows times ~3x fewer rounds.

Usage: python tools/bench_incr_cc.py [rmat_n] [deg] [batch_m]
Writes one JSON line; INCR_CC_r{N}.json is the round artifact.
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
    from pyspark.sql import functions as F

    from ligra_spark.apps.cc_star import two_phase_star_pairs
    from ligra_spark.rmat import rmat_edges
    from ligra_spark.session import get_spark
    from ligra_spark.streaming import apply_cc_batch, cc_labels, read_star_pairs

    spark = get_spark("bench_incr_cc")
    p = spark.sparkContext.defaultParallelism

    def df_of(seed, m):
        src, dst = rmat_edges(n, m, seed=seed)
        return spark.createDataFrame(
            pd.DataFrame({"src": src, "dst": dst})
        ).persist()

    base = df_of(5, deg * n)
    batch = df_of(77, batch_m)
    base.count(), batch.count()  # materialize inputs untimed

    cc_dir = tempfile.mkdtemp(prefix="bench_ccinc_")

    # bootstrap fold == full CC over the base edges + version write
    t0 = time.perf_counter()
    r_base = apply_cc_batch(base, 0, cc_dir, p)
    t_base = time.perf_counter() - t0
    n_stars = read_star_pairs(spark, cc_dir).count()

    # the maintained fold (affected split + recontraction + full
    # version write — the sandbox stand-in for an Iceberg bucket COW)
    t0 = time.perf_counter()
    r_incr = apply_cc_batch(batch, 1, cc_dir, p)
    t_incr = time.perf_counter() - t0

    # compute-only fold, measured SECOND against the explicit pre-fold
    # version dir (v0) so both runs see the same warmed page cache —
    # the fold-minus-compute delta prices the version write without an
    # ordering confound
    import os

    from ligra_spark.streaming import update_star_pairs

    prev = spark.read.parquet(os.path.join(cc_dir, "v0"))
    t0 = time.perf_counter()
    stars_c, _ = update_star_pairs(prev, batch, p)
    stars_c.count()
    t_incr_compute = time.perf_counter() - t0

    # the alternative: recompute CC from raw union edges, no write
    t0 = time.perf_counter()
    stars_full, r_full = two_phase_star_pairs(
        base.unionByName(batch).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ),
        p,
    )
    n_full = stars_full.count()
    t_full = time.perf_counter() - t0

    # labels must agree exactly
    from ligra_spark.streaming import star_labels

    inc = cc_labels(spark, cc_dir)
    full = star_labels(stars_full)
    mismatches = (
        inc.withColumnRenamed("component", "c_inc")
        .join(full, "id", "full_outer")
        .filter(
            F.coalesce("c_inc", F.lit(-1)) != F.coalesce("component", F.lit(-1))
        )
        .count()
    )

    out = {
        "metric": "incremental_cc_fold_vs_full_recompute",
        "unit": "sec",
        "graph": {"n": n, "m_base": deg * n, "m_batch": batch_m},
        "bootstrap_fold": {"sec": round(t_base, 2), "rounds": r_base,
                           "stars": n_stars},
        "incremental_fold": {"sec": round(t_incr, 2), "rounds": r_incr},
        "incremental_compute_only": {"sec": round(t_incr_compute, 2)},
        "full_recompute": {"sec": round(t_full, 2), "rounds": r_full,
                           "stars": n_full},
        "speedup_incr_vs_full": round(t_full / t_incr, 2),
        "label_mismatches": mismatches,
        "sharded": sharded_scenario(spark, n, deg, batch_m, p),
    }
    print(json.dumps(out))


def sharded_scenario(spark, n, deg, batch_m, p):
    """Measure the claimed decoupling of fold COMPUTE cost from |V|:
    on a base graph of DISJOINT per-host shards (giant n/2, medium
    n/8, small n/64 — the shape of a host-sharded crawl), fold one
    batch confined to each shard.  The affected-component filter
    passes only that shard's stars, so compute cost must track the
    touched-component size, not the table size.  Reports per-point
    touched stars + compute-only seconds (the version write is COW of
    the whole table in this sandbox stand-in and is priced separately
    by the main scenario)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ligra_spark.rmat import rmat_edges
    from ligra_spark.streaming import star_labels, update_star_pairs
    from ligra_spark.apps.cc_star import two_phase_star_pairs

    # disjoint shards: one giant, one medium, the rest small
    sizes = [n // 2, n // 8] + [n // 64] * ((n - n // 2 - n // 8) // (n // 64))
    srcs, dsts, off = [], [], 0
    for i, sz in enumerate(sizes):
        s, d = rmat_edges(sz, deg * sz, seed=200 + i)
        srcs.append(s + off)
        dsts.append(d + off)
        off += sz
    base = spark.createDataFrame(
        pd.DataFrame({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})
    ).persist()
    base.count()
    stars0, _ = two_phase_star_pairs(
        base.select(F.col("src").alias("u"), F.col("dst").alias("v")), p
    )
    stars0 = stars0.localCheckpoint(eager=True)
    total_stars = stars0.count()

    rng = np.random.RandomState(9)
    points = []
    offsets = {"giant": 0, "medium": n // 2, "small": n // 2 + n // 8}
    shard_n = {"giant": n // 2, "medium": n // 8, "small": n // 64}
    for namept in ("giant", "medium", "small"):
        lo, sz = offsets[namept], shard_n[namept]
        bs = rng.randint(lo, lo + sz, batch_m)
        bd = rng.randint(lo, lo + sz, batch_m)
        batch = spark.createDataFrame(
            pd.DataFrame({"src": bs, "dst": bd})
        ).persist()
        batch.count()
        import time as _t

        t0 = _t.perf_counter()
        stars_new, rounds = update_star_pairs(stars0, batch, p)
        stars_new.count()
        dt = _t.perf_counter() - t0
        # touched stars = rows NOT passed through untouched: the
        # affected slice is exactly the shard's component members
        touched = (
            star_labels(stars_new)
            .filter((F.col("id") >= lo) & (F.col("id") < lo + sz))
            .count()
        )
        points.append(
            {
                "shard": namept,
                "shard_vertices": sz,
                "touched_members": touched,
                "compute_sec": round(dt, 2),
                "rounds": rounds,
            }
        )
        batch.unpersist()
    return {"total_stars": total_stars, "points": points}


if __name__ == "__main__":
    main()
