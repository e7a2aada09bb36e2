"""Random-walk corpus generation over the link graph — the
DeepWalk/node2vec(p=q=1) training-data op: emit fixed-length uniform
random walks as a (walk, step, id) table for downstream embedding
training.  Not a reference app; included because walk corpora are the
standard bridge from a web graph to vertex embeddings in a training
pipeline.

Determinism: the j-th move of walk w is chosen by the reference's
32-bit avalanche hash (``ligra_spark.hashing``, ``utils.h:366-374``)
of the (walk, step) counter — ``h = hashInt32((w·stride + j + seed)
mod 2^32)``, neighbor index ``h % deg`` over neighbors ranked by
ascending dst.  The draw stream depends only on the counter, never on
partitioning or schedule, so results are engine- and
layout-independent (the same counter-based-stream technique as
``apps.local_cluster.heat_kernel_rand``) and the DuckDB oracle replays
the exact walks from the same inlined hash values.

Physical shape: one per-source neighbor-index table (row_number over
the edge table, built once, persisted alongside the graph's bucketed
layout) and, per step, ONE join of the walk frontier against it.  The
frontier is |walks| rows — tiny next to the edge table — so AQE
broadcasts it and the big side never moves; steps emit into a
union-of-steps result (length is a small constant, so plan depth is
bounded).  Degree-0 landings FREEZE (the walk stays put for its
remaining steps), keeping the output a dense walks × (length+1) grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..hashing import with_hash_int32

__all__ = ["random_walks", "neighbor_index"]


def neighbor_index(graph) -> DataFrame:
    """(src, idx, dst) with idx = 0-based rank of dst among src's
    neighbors (ascending dst) — the indexed-adjacency lookup table the
    walks sample from.  One window pass over the edge table."""
    w = Window.partitionBy("src").orderBy("dst")
    return graph.edges.select(
        "src", "dst", (F.row_number().over(w) - 1).alias("idx")
    )


def random_walks(
    graph,
    starts: DataFrame,
    walks_per_start: int = 4,
    length: int = 6,
    seed: int = 0,
) -> DataFrame:
    """(walk, step, id) for ``walks_per_start`` deterministic uniform
    walks of ``length`` steps from every row of ``starts`` (an (id)
    DataFrame); walk = start·walks_per_start + rep.  Steps 0..length
    all emitted; a degree-0 landing freezes in place."""
    stride = length + 1
    mask = F.lit(0xFFFFFFFF)
    # one window shuffle+sort, computed once and reused by every step's
    # join (each of the `length` joins would otherwise re-run it);
    # cached for the lifetime of the result DataFrame's evaluation
    eidx = neighbor_index(graph).persist()
    deg = graph.out_degrees.select("id", F.col("outdeg").alias("deg"))
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(int(walks_per_start) - 1))
    ).alias("rep")
    state = starts.select("id", reps).select(
        (F.col("id") * walks_per_start + F.col("rep")).alias("walk"),
        F.col("id").alias("x"),
    )
    out = [state.select("walk", F.lit(0).alias("step"), F.col("x").alias("id"))]
    for j in range(1, stride):
        counter = (
            (F.col("walk") * stride + F.lit(j) + F.lit(seed)).bitwiseAND(mask)
        )
        st = with_hash_int32(state.select("walk", "x", counter.alias("c")), F.col("c"), out="h")
        st = (
            st.join(deg.withColumnRenamed("id", "x"), "x", "left")
            .join(
                eidx,
                (F.col("x") == eidx["src"])
                & (F.col("h") % F.greatest(F.col("deg"), F.lit(1)) == eidx["idx"]),
                "left",
            )
            .select(
                "walk",
                F.when(
                    F.coalesce("deg", F.lit(0)) > 0, F.col("dst")
                ).otherwise(F.col("x")).alias("x"),
            )
        )
        state = st
        out.append(
            state.select("walk", F.lit(j).alias("step"), F.col("x").alias("id"))
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res
