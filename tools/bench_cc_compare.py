"""Round-count / wall-clock comparison: min-label `components` vs
two-phase large-star/small-star `cc_two_phase`, on the two graph shapes
that decide which one you run at 100 TB:

- high-diameter: 2-D torus (diameter = dn) — min-label needs ~diameter
  supersteps, two-phase O(log n) rounds;
- low-diameter: rMat web-shape — min-label converges in a handful of
  rounds and its ~2-shuffle superstep beats two-phase's ~6-shuffle round.

Usage: python tools/bench_cc_compare.py [dn] [rmat_n] [cap]
Writes one JSON line; components on the torus is CAPPED at `cap`
supersteps and the full cost extrapolated (cost/round x diameter) —
running ~512 supersteps to fixpoint is the pathology, not a benchmark.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    dn = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rmat_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 24

    import pandas as pd

    from ligra_spark.apps import cc_two_phase, components
    from ligra_spark.graph import LinkGraph
    from ligra_spark.rmat import grid_edges, make_symmetric, rmat_edges
    from ligra_spark.session import get_spark

    spark = get_spark("bench_cc_compare")

    def load(src, dst, n):
        df = spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))
        return LinkGraph.from_edges(
            spark, df, n=n, make_symmetric=True
        ).materialize()

    out = {"metric": "cc_algorithms_compare", "unit": "sec"}

    # ---- high-diameter torus ------------------------------------------
    n = dn * dn
    src, dst = grid_edges(n, dims=2)
    g = load(src, dst, n)
    g.edges.count()

    t0 = time.perf_counter()
    labels, rounds_tp = cc_two_phase(g)
    n_comp = labels.select("component").distinct().count()
    t_tp = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, rounds_ml = components(g, max_iters=cap)
    t_ml_cap = time.perf_counter() - t0
    per_round = t_ml_cap / rounds_ml
    out["torus"] = {
        "n": n,
        "diameter": dn,
        "two_phase": {"sec": round(t_tp, 2), "rounds": rounds_tp, "components": n_comp},
        "min_label_capped": {
            "sec": round(t_ml_cap, 2),
            "rounds": rounds_ml,
            "sec_per_round": round(per_round, 3),
            "extrapolated_full_sec": round(per_round * dn, 1),
        },
    }
    g.unpersist()

    # ---- low-diameter rMat --------------------------------------------
    src, dst = rmat_edges(rmat_n, 10 * rmat_n, seed=5)
    src, dst = make_symmetric(src, dst)
    g = load(src, dst, rmat_n)
    g.edges.count()

    t0 = time.perf_counter()
    ml, rounds_ml = components(g)
    c_ml = ml.select("component").distinct().count()
    t_ml = time.perf_counter() - t0

    t0 = time.perf_counter()
    tp, rounds_tp = cc_two_phase(g)
    c_tp = tp.select("component").distinct().count()
    t_tp = time.perf_counter() - t0
    assert c_ml == c_tp, (c_ml, c_tp)
    out["rmat"] = {
        "n": rmat_n,
        "m": int(g.m),
        "min_label": {"sec": round(t_ml, 2), "rounds": rounds_ml, "components": c_ml},
        "two_phase": {"sec": round(t_tp, 2), "rounds": rounds_tp, "components": c_tp},
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
