"""Incremental connected-components maintenance over a growing edge
stream — the query-side twin of ``incremental_link_graph_sink``.

A live crawl keeps appending edges; recomputing CC from scratch per
micro-batch is O(E) per batch and unbounded as the graph grows.  This
module maintains the component structure itself: the state is the
STAR-PAIR FIXPOINT of everything seen so far (``(u, v)`` with v = the
component's min id — exactly ``apps.cc_star.two_phase_star_pairs``
output), and each batch is folded in incrementally:

  1. map every batch endpoint to its current center (one lookup join
     against the star table; unseen vertices and centers map to
     themselves),
  2. split the star table into AFFECTED components (center touched by
     the batch) and the untouched rest — the rest is carried over
     verbatim, never re-shuffled,
  3. re-contract only (affected stars ∪ batch pairs) with the
     large-star/small-star alternation.  The affected input is depth-1
     stars glued by batch edges, so the alternation converges in a
     handful of rounds regardless of how large the affected components
     are — per-batch compute is O(|batch| + |affected members|), not
     O(V) and not O(E).

Storage follows the dictionary-sink pattern (``ingest_stream``):
each batch writes a full star-table version dir ``v{batch_id}`` and
commits it by atomically rewriting the JSON ``_CURRENT`` manifest.
Replay of a committed batch is a no-op (the manifest records applied
batch ids); a crash between the version write and the commit leaves
an orphan dir that the replay safely overwrites.  On a real
deployment the star table is an Iceberg table bucketed by center and
step 2/3 become a copy-on-write of the affected buckets only — the
full-version write here is the sandbox stand-in, the COMPUTE is
already incremental.

Reference anchor: the maintained labeling equals
``apps/CC.C:52-68``'s fixpoint (component = min vertex id) over the
union of all batches — pinned by ``tests/test_incremental_cc.py``
against both ``components()`` and ``cc_two_phase()``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..apps.cc_star import two_phase_star_pairs
from .ingest_stream import _atomic_write

__all__ = [
    "update_star_pairs",
    "apply_cc_batch",
    "read_star_pairs",
    "star_labels",
    "cc_labels",
    "incremental_cc_sink",
]

_STAR_SCHEMA = "u long, v long"


def update_star_pairs(
    prev_stars: DataFrame,
    new_edges: DataFrame,
    num_partitions: int,
    max_iters: int = 100,
) -> tuple[DataFrame, int]:
    """Fold one batch of edges into a star-pair fixpoint.

    ``prev_stars``: (u, v) star pairs (v = component min; the empty
    DataFrame for the first batch).  ``new_edges``: (src, dst) raw
    directed pairs, any multiplicity/orientation.  Returns (new star
    fixpoint, contraction rounds run on the affected slice).

    Only components whose center is reachable from a batch endpoint
    are re-contracted; every other star row is passed through
    untouched (no shuffle on the carried-over slice — the union is
    plan-level).
    """
    batch = (
        new_edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        # pin the canonical batch: it feeds endpoints, the contraction
        # input AND (via centers) three joins below — without this a
        # streaming micro-batch source is re-read once per consumer
        .localCheckpoint(eager=True)
    )
    endpoints = (
        batch.select(F.col("u").alias("x"))
        .unionByName(batch.select(F.col("v").alias("x")))
        .distinct()
    )
    # center lookup: members appear in the star table's u column;
    # centers and never-seen vertices map to themselves.  The batch
    # side is normally tiny — the shuffle_hash hint keeps the plan
    # sort-free and AQE converts it to a broadcast join at runtime
    # when the endpoint set fits (an unconditional broadcast would
    # gamble the driver on a giant catch-up batch).
    centers = (
        prev_stars.join(
            endpoints.hint("shuffle_hash"), prev_stars["u"] == endpoints["x"], "inner"
        )
        .select(F.col("v").alias("c"))
        .unionByName(
            # endpoints with no member row: themselves (covers both
            # existing centers and brand-new vertices; a spurious
            # center id for a member-only vertex cannot arise because
            # the member row always exists for non-centers)
            endpoints.join(
                prev_stars.hint("shuffle_hash"),
                endpoints["x"] == prev_stars["u"],
                "left_anti",
            ).select(F.col("x").alias("c"))
        )
        .distinct()
        # tiny (≤ 2·|batch| rows) but referenced by the affected AND
        # rest joins, each evaluated again at write time — pin it so
        # the two prev-star scans inside its own lineage run once
        .localCheckpoint(eager=True)
    )
    affected = prev_stars.join(
        centers.hint("shuffle_hash"), prev_stars["v"] == centers["c"], "left_semi"
    )
    rest = prev_stars.join(
        centers.hint("shuffle_hash"), prev_stars["v"] == centers["c"], "left_anti"
    )
    stars_new, rounds = two_phase_star_pairs(
        affected.unionByName(batch), num_partitions, max_iters=max_iters
    )
    if rounds >= max_iters:
        # a non-fixpoint table must never become the next fold's input:
        # it breaks the members-in-u/centers-in-v invariant the center
        # lookup above relies on.  (Converging EXACTLY at round
        # max_iters trips this too — the safe false positive; raise
        # max_iters.)  O(log² n) convergence means 100 rounds covers
        # any physically storable graph.
        raise RuntimeError(
            f"star contraction did not converge in {max_iters} rounds; "
            "refusing to produce a non-fixpoint star table"
        )
    return rest.unionByName(stars_new), rounds


def _read_cc_manifest(cc_dir: str) -> dict:
    ptr = os.path.join(cc_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return {"version": None, "batches": []}
    with open(ptr) as fh:
        return json.load(fh)


def read_star_pairs(spark: SparkSession, cc_dir: str) -> DataFrame:
    """The committed star fixpoint (u, v); empty before the first
    commit.  Uncommitted version dirs are never read."""
    man = _read_cc_manifest(cc_dir)
    if man["version"] is None:
        return spark.createDataFrame([], _STAR_SCHEMA)
    return spark.read.parquet(os.path.join(cc_dir, man["version"]))


def apply_cc_batch(
    new_edges: DataFrame,
    batch_id: int,
    cc_dir: str,
    num_partitions: int,
    retain_versions: int = 2,
) -> int:
    """Fold one micro-batch into the maintained star table — the
    foreachBatch body, module-level so replay idempotence is directly
    testable.  Returns contraction rounds run (0 when the batch was
    already committed — replaying is a no-op).

    After the commit, superseded version dirs beyond the newest
    ``retain_versions`` are deleted — only ``_CURRENT``'s dir is ever
    read by this module, but one predecessor is kept by default for
    readers still evaluating a ``read_star_pairs`` plan captured
    before the commit.  Without GC a continuous crawl accumulates one
    full O(V) star-table copy per micro-batch, forever."""
    import shutil

    spark = new_edges.sparkSession
    man = _read_cc_manifest(cc_dir)
    if int(batch_id) in [int(b) for b in man["batches"]]:
        return 0
    prev = read_star_pairs(spark, cc_dir)
    stars, rounds = update_star_pairs(prev, new_edges, num_partitions)
    vname = f"v{batch_id}"
    # a leftover dir from a crashed attempt is safely overwritten —
    # the manifest doesn't name it until the commit below
    stars.write.mode("overwrite").parquet(os.path.join(cc_dir, vname))
    history = man.get("history", []) + [vname]
    _atomic_write(
        os.path.join(cc_dir, "_CURRENT"),
        json.dumps(
            {
                "version": vname,
                "batches": man["batches"] + [int(batch_id)],
                "history": history[-max(retain_versions, 1) :],
            }
        ),
    )
    for old in history[: -max(retain_versions, 1)]:
        shutil.rmtree(os.path.join(cc_dir, old), ignore_errors=True)
    return rounds


def star_labels(stars: DataFrame) -> DataFrame:
    """(id, component) from a star-pair table: members label their
    center, centers label themselves, one groupBy-min over the union
    — exactly one shuffle, and at most one row per id even on a
    hand-fed NON-fixpoint table (where an id can appear as both
    member and center; the min is a no-op at a true fixpoint — the
    same defensive convention as ``cc_two_phase``)."""
    return (
        stars.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(
            stars.select(F.col("v").alias("id"), F.col("v").alias("component"))
        )
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def cc_labels(
    spark: SparkSession, cc_dir: str, vertices: DataFrame | None = None
) -> DataFrame:
    """(id, component) from the committed star table — component =
    min id of the component, identical to ``components()`` /
    ``cc_two_phase()`` over the union of all applied batches.  Pass
    ``vertices`` (an (id) DataFrame) to also label isolated vertices
    the edge stream never mentioned (they label themselves)."""
    labels = star_labels(read_star_pairs(spark, cc_dir))
    if vertices is None:
        return labels
    return vertices.join(labels.hint("shuffle_hash"), "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )


def incremental_cc_sink(
    edges: DataFrame,
    cc_dir: str,
    checkpoint_dir: str,
    num_partitions: int,
):
    """foreachBatch writer for a streaming (src, dst) edge frame:
    maintains the star table under exactly-once replay.  Returns the
    ``DataStreamWriter`` — call ``.trigger(availableNow=True)`` /
    ``.start()`` on it."""
    os.makedirs(cc_dir, exist_ok=True)

    def merge(batch: DataFrame, batch_id: int) -> None:
        apply_cc_batch(batch, batch_id, cc_dir, num_partitions)

    return (
        edges.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
