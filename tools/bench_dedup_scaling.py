"""N→4N scaling evidence for the DEDUP PIPELINE (the webtext payload
axis — PR/CC/k-truss cover the graph axis in BENCH_SCALING*/
KT_SCALING).

Workload: the near-dup detection core over a synthesized corpus —
MinHash signatures → banded-LSH candidate pairs → count, plus the
Gopher gate pass-count (the zero-shuffle scan op).  Same input parquet
at local[LO] and local[HI=4·LO]; 1 untimed warm-up + median of timed
rounds per level; read efficiency against the ctrl_md5 pure-CPU
ceiling (CTRL_MD5_r03.json), not an ideal 4.0.

The corpus is deterministic (seeded numpy): ~60-token docs over a
10k-word vocabulary with a planted 2% near-dup tail (last 3 tokens
perturbed) so LSH has real collision work.

Usage: python tools/bench_dedup_scaling.py [out_json]
Env: DEDUP_LEVELS (default "2,8"), DEDUP_ROUNDS (default 2),
     DEDUP_NDOCS (default 200000)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

LEVELS = [int(x) for x in os.environ.get("DEDUP_LEVELS", "2,8").split(",")]
ROUNDS = int(os.environ.get("DEDUP_ROUNDS", 2))
NDOCS = int(os.environ.get("DEDUP_NDOCS", 200_000))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import pandas as pd
from ligra_spark.session import get_spark

n = {ndocs}
rng = np.random.default_rng(12345)
vocab = np.array([f"w{{i}}" for i in range(10_000)])
lens = rng.integers(40, 80, size=n)
texts = []
for i in range(n):
    toks = vocab[rng.integers(0, len(vocab), size=lens[i])]
    texts.append(" ".join(toks))
# planted near-dup tail: 2% of docs are a copy of an earlier doc with
# the last 3 tokens replaced
for i in range(0, n, 50):
    if i + 1 < n:
        toks = texts[i].split()
        toks[-3:] = ["zz1", "zz2", "zz3"]
        texts[i + 1] = " ".join(toks)
pdf = pd.DataFrame({{"doc_id": np.arange(n, dtype="int64"), "text": texts}})
spark = get_spark("dedup_gen", cpus=8, shuffle_partitions=8)
spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(
    sys.argv[1]
)
print("GENOK")
"""

_WORKER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1])
path = sys.argv[2]
from pyspark.sql import functions as F
from ligra_spark.session import get_spark
from ligra_spark.functions.dedup import minhash_signatures, lsh_candidate_pairs
from ligra_spark.functions import gopher_filter

spark = get_spark(f"dedup{{cpus}}", cpus=cpus, shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
docs.limit(16).count()  # open the files untimed

def lsh_job():
    return lsh_candidate_pairs(minhash_signatures(docs), 8, 4).count()

def gate_job():
    return gopher_filter(docs).filter("gopher_pass").count()

lsh_job()  # warm-up
lshs, gates = [], []
for r in range({rounds}):
    t0 = time.perf_counter(); np_ = lsh_job(); lshs.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); ng = gate_job(); gates.append(time.perf_counter() - t0)
print("RESULT " + json.dumps(
    {{"cpus": cpus, "lsh_s": lshs, "gate_s": gates, "pairs": np_, "passed": ng}}
))
"""


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "DEDUP_SCALING.json"
    tmp = tempfile.mkdtemp(prefix="dedup_scaling_")
    corpus = os.path.join(tmp, "docs.parquet")
    gen = os.path.join(tmp, "gen.py")
    with open(gen, "w") as fh:
        fh.write(_GEN.format(repo=REPO, ndocs=NDOCS))
    subprocess.run([sys.executable, gen, corpus], check=True)

    worker = os.path.join(tmp, "worker.py")
    with open(worker, "w") as fh:
        fh.write(_WORKER.format(repo=REPO, rounds=ROUNDS))
    runs = []
    for cpus in LEVELS:
        p = subprocess.run(
            [sys.executable, worker, str(cpus), corpus],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")][0]
        runs.append(json.loads(line[len("RESULT "):]))
        print(line)

    med = {
        r["cpus"]: {
            "lsh": statistics.median(r["lsh_s"]),
            "gate": statistics.median(r["gate_s"]),
        }
        for r in runs
    }
    lo, hi = min(med), max(med)
    ratio = hi / lo
    result = {
        "workload": (
            f"minhash+LSH pair detection and gopher gate over a {NDOCS}-doc "
            "synthesized corpus (seeded, 2% planted near-dups)"
        ),
        "protocol": (
            f"1 warm-up + median of {ROUNDS} rounds per level; "
            f"levels local{LEVELS}; shuffle_partitions = 2x cores"
        ),
        "runs": runs,
        "pairs_detected": runs[0]["pairs"],
        "scaling": {
            "pair": f"{lo} -> {hi} cores",
            "lsh_raw_speedup": round(med[lo]["lsh"] / med[hi]["lsh"], 2),
            "lsh_raw_efficiency": round(
                med[lo]["lsh"] / med[hi]["lsh"] / ratio, 2
            ),
            "gate_raw_speedup": round(med[lo]["gate"] / med[hi]["gate"], 2),
            "gate_raw_efficiency": round(
                med[lo]["gate"] / med[hi]["gate"] / ratio, 2
            ),
        },
    }
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["scaling"]))


if __name__ == "__main__":
    main()
