"""spark-submit entry point for the incremental maintainers — the
operational twin of ``jobs/run_app.py`` for the four maintained
fixpoints (connected components, PageRank scores, triangle count,
near-dup dedup clustering) over a growing input directory.

The input is a parquet DIRECTORY treated as a file-source stream
(each new file = one micro-batch); with ``--available-now`` the job
drains everything currently present and exits — the cron-shaped crawl
refresh.  State lives under ``--state-dir`` (manifest-committed,
replay-idempotent; on a cluster, point it at object storage).

Examples:
    spark-submit --py-files ligra_spark.zip jobs/run_maintain.py \
        --kind cc --input s3://bucket/edge_batches \
        --state-dir s3://bucket/cc_state --checkpoint s3://bucket/ck

    python jobs/run_maintain.py --kind dedup --input /tmp/doc_batches \
        --state-dir /tmp/dd --checkpoint /tmp/ck --available-now
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KINDS = ("cc", "pagerank", "triangles", "dedup")

_SCHEMAS = {
    "cc": "src long, dst long",
    "pagerank": "src long, dst long",
    "triangles": "src long, dst long",
    "dedup": "doc_id long, text string",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=KINDS)
    ap.add_argument("--input", required=True, help="parquet batch directory")
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument(
        "--available-now",
        action="store_true",
        help="drain current files and exit (default: run continuously)",
    )
    ap.add_argument("--n", type=int, default=None, help="vertex universe (pagerank)")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--timeout-s", type=int, default=3600)
    args = ap.parse_args(argv)

    from ligra_spark.session import get_spark
    from ligra_spark import streaming as st

    spark = get_spark(f"maintain_{args.kind}", cpus=args.cpus)
    p = spark.sparkContext.defaultParallelism
    stream = (
        spark.readStream.schema(_SCHEMAS[args.kind])
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(args.input)
    )
    if args.kind == "cc":
        writer = st.incremental_cc_sink(stream, args.state_dir, args.checkpoint, p)
    elif args.kind == "pagerank":
        if args.n is None:
            ap.error("--n is required for --kind pagerank")
        writer = st.incremental_pagerank_sink(
            stream, args.state_dir, args.checkpoint, args.n, p
        )
    elif args.kind == "triangles":
        writer = st.incremental_triangles_sink(
            stream, args.state_dir, args.checkpoint
        )
    else:
        writer = st.incremental_dedup_sink(
            stream, args.state_dir, args.checkpoint, p
        )

    t0 = time.perf_counter()
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        ok = q.awaitTermination(args.timeout_s)
        q.stop()
        if not ok:
            print(json.dumps({"kind": args.kind, "error": "timeout"}))
            return 1
    else:
        q = writer.start()
        q.awaitTermination()

    summary = {"kind": args.kind, "elapsed_s": round(time.perf_counter() - t0, 2)}
    if args.kind == "cc":
        summary["stars"] = st.read_star_pairs(spark, args.state_dir).count()
    elif args.kind == "pagerank":
        man = st.read_pr_manifest(args.state_dir)
        summary["version"] = man["version"]
        summary["batches"] = len(man["batches"])
    elif args.kind == "triangles":
        summary["total_triangles"] = st.read_tri_total(args.state_dir)
    else:
        sd = st.dedup_state(spark, args.state_dir)
        summary["docs"] = sd.count()
        summary["keepers"] = sd.filter("keep = 1").count()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
