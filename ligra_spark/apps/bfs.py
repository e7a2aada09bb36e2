"""BFS level sets — semantics of ``/root/reference/apps/BFS.C:42-53``.

The reference stores first-visitor PARENT ids, which are race-dependent
(CAS at ``BFS.C:33-35``); the race-free invariant is the level
assignment, which we output (SURVEY.md §2.2 atomics note).  cond =
"unvisited" (``BFS.C:37``) becomes an anti-join against the visited
set; the singleton root frontier broadcasts from superstep 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..engine import edge_map

__all__ = ["bfs_levels"]


def bfs_levels(
    graph,
    root: int = 0,
    max_iters: int | None = None,
    on_superstep=None,
) -> tuple[DataFrame, int]:
    """Returns ((id, level) for REACHED vertices only, levels run).
    Unreached vertices are absent (the numpy oracle marks them -1)."""
    spark = graph.spark
    visited = (
        spark.createDataFrame([(int(root), 0)], "id long, level int")
        .repartition(graph.num_partitions, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = visited.select("id")
    lvl, fsize = 0, 1
    limit = max_iters or graph.n
    while fsize > 0 and lvl < limit:
        lvl += 1
        msgs = edge_map(
            graph,
            frontier,
            message=F.lit(1),
            aggregate=F.min,
            frontier_size=fsize,
        )
        new_frontier = (
            msgs.select("id")
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(lvl).cast("int").alias("level"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        fsize = new_frontier.count()
        if fsize == 0:
            new_frontier.unpersist()
            lvl -= 1
            break
        old = visited
        visited = visited.unionByName(new_frontier).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        visited = visited.localCheckpoint(eager=True)
        old.unpersist()
        new_frontier.unpersist()
        frontier = visited.filter(F.col("level") == lvl).select("id")
        if on_superstep:
            on_superstep(lvl, {"frontier": fsize})
    return visited, lvl
