"""Crossover evidence for the components() auto-star fallback
(VERDICT r03 item 7): on a chain graph (diameter = n−1) measure

  (a) pure min-label, first K rounds only → per-round cost, and the
      extrapolated full-run cost (per-round × diameter),
  (b) components() with the automatic star handoff (default policy),
  (c) cc_two_phase direct,

and on the crawl-shaped bench graph confirm the fallback never fires.
Writes one JSON line (CC_PATH_r{N}.json by the invoking shell).

Usage: python tools/bench_cc_path.py [n_chain]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import pandas as pd
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from ligra_spark.apps import components
    from ligra_spark.apps.cc_star import cc_two_phase
    from ligra_spark.graph import LinkGraph
    from ligra_spark.session import get_spark

    spark = get_spark("cc_path_bench", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    fwd = pd.DataFrame({"src": range(n - 1), "dst": range(1, n)})
    bwd = pd.DataFrame({"src": range(1, n), "dst": range(n - 1)})
    edges = spark.createDataFrame(pd.concat([fwd, bwd]))
    g = LinkGraph.from_edges(spark, edges, n=n).materialize()

    # warm-up (JIT/codegen parity across the measured variants)
    components(g, max_iters=2, star_fallback_after=None)

    probe_rounds = 12
    t0 = time.perf_counter()
    _, r_probe = components(
        g, max_iters=probe_rounds, star_fallback_after=None
    )
    t_probe = time.perf_counter() - t0
    per_round = t_probe / max(r_probe, 1)
    minlabel_projected = per_round * (n - 1)

    t0 = time.perf_counter()
    labels_auto, r_auto = components(g)  # default fallback policy
    t_auto = time.perf_counter() - t0
    ok_auto = (
        labels_auto.agg(F.sum("component").alias("s")).collect()[0]["s"] == 0
    )

    t0 = time.perf_counter()
    labels_star, r_star = cc_two_phase(g)
    t_star = time.perf_counter() - t0
    ok_star = (
        labels_star.agg(F.sum("component").alias("s")).collect()[0]["s"] == 0
    )

    print(
        json.dumps(
            {
                "metric": "components auto-star fallback crossover (chain graph)",
                "n_chain": n,
                "minlabel_per_round_sec": round(per_round, 4),
                "minlabel_projected_full_sec": round(minlabel_projected, 1),
                "auto_fallback_sec": round(t_auto, 3),
                "auto_fallback_rounds": r_auto,
                "auto_labels_exact": bool(ok_auto),
                "cc_two_phase_sec": round(t_star, 3),
                "cc_two_phase_rounds": r_star,
                "star_labels_exact": bool(ok_star),
                "speedup_vs_projected_minlabel": round(
                    minlabel_projected / t_auto, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
