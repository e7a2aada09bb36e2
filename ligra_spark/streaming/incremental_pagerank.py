"""Incremental PageRank maintenance over a growing edge stream — the
scores-side companion of ``incremental_cc``.

PageRank is a whole-graph fixpoint, so unlike CC there is no
affected-slice shortcut: every refresh must sweep all edges.  What IS
incremental is the superstep count — the fixpoint is start-independent,
so warm-starting each refresh from the previous committed scores
reconverges from an error of ‖old_fixpoint − new_fixpoint‖ instead of
‖uniform − new_fixpoint‖, both decaying at rate ≈ d per superstep.
The saving is therefore proportional to how small the graph delta is:
warm-starting from the exact fixpoint reconverges in 1 superstep, a
few-percent edge delta saves a handful of supersteps, and a delta so
large that the old fixpoint is farther from the new one than uniform
is saves nothing (measured in ``tests/test_incremental_pr.py``; on
Ligra's lossy no-dangling-redistribution semantics uniform also sheds
leaked mass quickly, which flatters the cold start on small graphs).
On a growing crawl the per-refresh cost becomes (few supersteps) ×
(one edge sweep each), and each sweep is the engine's canonical
one-shuffle superstep over the bucketed edge table.

Storage follows the manifest pattern of ``incremental_cc``/
``ingest_stream``:

  pr_dir/edges/b{batch_id}/   one parquet dir per applied edge batch
                              (replay overwrites — idempotent)
  pr_dir/v{batch_id}/         committed (id, rank) scores version
  pr_dir/_CURRENT             JSON manifest: current version, applied
                              batch ids, per-batch superstep counts

Replay of a committed batch is a no-op; a crash between the version
write and the manifest commit leaves an orphan dir the retry safely
overwrites.  Superseded versions beyond ``retain_versions`` are GC'd.

The maintained scores equal a from-scratch ``apps.pagerank`` run over
the union of all batches to the same epsilon (both are within the
convergence tolerance of the unique fixpoint; pinned by
``tests/test_incremental_pr.py``), while the recorded superstep counts
document the warm-start saving.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..apps.pagerank import pagerank
from ..graph import LinkGraph
from .ingest_stream import _atomic_write

__all__ = [
    "apply_pr_batch",
    "read_pr_scores",
    "read_pr_manifest",
    "incremental_pagerank_sink",
]


def read_pr_manifest(pr_dir: str) -> dict:
    ptr = os.path.join(pr_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return {"version": None, "batches": [], "supersteps": {}}
    with open(ptr) as fh:
        return json.load(fh)


def read_pr_scores(spark: SparkSession, pr_dir: str) -> DataFrame:
    """The committed (id, rank) scores; empty before the first commit.
    Uncommitted version dirs are never read."""
    man = read_pr_manifest(pr_dir)
    if man["version"] is None:
        return spark.createDataFrame([], "id long, rank double")
    return spark.read.parquet(os.path.join(pr_dir, man["version"]))


def _edges_so_far(spark: SparkSession, pr_dir: str, batch_ids) -> DataFrame:
    paths = [os.path.join(pr_dir, "edges", f"b{b}") for b in batch_ids]
    return spark.read.parquet(*paths).select("src", "dst")


def apply_pr_batch(
    new_edges: DataFrame,
    batch_id: int,
    pr_dir: str,
    n: int,
    num_partitions: int,
    damping: float = 0.85,
    epsilon: float = 1e-7,
    max_iters: int = 100,
    retain_versions: int = 2,
) -> int:
    """Fold one micro-batch of (src, dst) edges into the maintained
    scores — the foreachBatch body, module-level so replay idempotence
    is directly testable.  ``n`` is the vertex universe of the graph
    SO FAR (it may grow between batches; new ids warm-start at 1/n).
    Returns supersteps run (0 when the batch was already committed).
    """
    import shutil

    spark = new_edges.sparkSession
    man = read_pr_manifest(pr_dir)
    if int(batch_id) in [int(b) for b in man["batches"]]:
        return 0
    os.makedirs(os.path.join(pr_dir, "edges"), exist_ok=True)
    # a leftover dir from a crashed attempt is safely overwritten —
    # the manifest doesn't list the batch until the commit below
    new_edges.select("src", "dst").write.mode("overwrite").parquet(
        os.path.join(pr_dir, "edges", f"b{batch_id}")
    )
    batches = man["batches"] + [int(batch_id)]
    g = LinkGraph.from_edges(
        spark,
        _edges_so_far(spark, pr_dir, batches),
        n=n,
        num_partitions=num_partitions,
    )
    prev = read_pr_scores(spark, pr_dir)
    init = None if man["version"] is None else prev
    scores, steps = pagerank(
        g, max_iters=max_iters, damping=damping, epsilon=epsilon, init=init
    )
    vname = f"v{batch_id}"
    scores.write.mode("overwrite").parquet(os.path.join(pr_dir, vname))
    g.unpersist()
    history = man.get("history", []) + [vname]
    supersteps = dict(man.get("supersteps", {}))
    supersteps[str(batch_id)] = steps
    _atomic_write(
        os.path.join(pr_dir, "_CURRENT"),
        json.dumps(
            {
                "version": vname,
                "batches": batches,
                "history": history[-max(retain_versions, 1):],
                "supersteps": supersteps,
                "n": n,
            }
        ),
    )
    for old in history[: -max(retain_versions, 1)]:
        shutil.rmtree(os.path.join(pr_dir, old), ignore_errors=True)
    return steps


def incremental_pagerank_sink(
    edges: DataFrame,
    pr_dir: str,
    checkpoint_dir: str,
    n: int,
    num_partitions: int,
    **pr_kwargs,
):
    """foreachBatch writer for a streaming (src, dst) edge frame:
    maintains the scores table under exactly-once replay.  Returns the
    ``DataStreamWriter`` — call ``.trigger(availableNow=True)`` /
    ``.start()`` on it."""
    os.makedirs(pr_dir, exist_ok=True)

    def merge(batch: DataFrame, batch_id: int) -> None:
        apply_pr_batch(batch, batch_id, pr_dir, n, num_partitions, **pr_kwargs)

    return (
        edges.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
