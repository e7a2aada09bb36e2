"""Measure ANN recall@k against the exact brute-force baseline.

The LSH and IVF paths trade recall for a bucketed (never all-pairs)
plan; their knobs (bits, tables, nlist, nprobe) are real parameters.
This tool puts numbers on that trade at a given scale so BASELINE.md
can cite measured recall, not a claim.

recall@k for one probe = |approx top-k ∩ exact top-k| / k, averaged
over probes.  Ties at the k-boundary are pinned by the functions'
deterministic (score desc, id asc) ordering, so the comparison is
exact, not statistical.

Usage: python tools/ann_recall.py [sf_dir] [n_probes] [k]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from ligra_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_bucket_topk,
    )
    from ligra_spark.session import get_spark

    spark = get_spark("ann_recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    probes = emb.filter(F.col("vec_id") < n_probes)

    def topk_sets(df):
        rows = df.collect()
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r["probe_id"], set()).add(r["vec_id"])
        return out

    exact = topk_sets(brute_force_topk(emb, probes, k=k))

    def recall(approx: dict[int, set]) -> float:
        # probes missing from the approx result contribute 0 recall
        tot = sum(len(approx.get(p, set()) & s) / len(s) for p, s in exact.items())
        return round(tot / len(exact), 4)

    configs = [
        ("lsh", {"bits": 8, "tables": 1}),
        ("lsh", {"bits": 8, "tables": 4}),
        ("lsh", {"bits": 6, "tables": 8}),
        ("ivf", {"nlist": 16, "nprobe": 1}),
        ("ivf", {"nlist": 16, "nprobe": 4}),
        ("ivf", {"nlist": 16, "nprobe": 8}),
    ]
    for kind, kw in configs:
        if kind == "lsh":
            df = lsh_bucket_topk(emb, probes, k=k, dim=dim, **kw)
        else:
            df = ivf_topk(emb, probes, k=k, dim=dim, **kw)
        r = recall(topk_sets(df))
        print(json.dumps({"kind": kind, **kw, "k": k, "recall": r,
                          "n_probes": len(exact), "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
