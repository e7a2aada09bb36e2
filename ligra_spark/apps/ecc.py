"""kBFS eccentricity estimation — the eccentricity-suite semantics
(``/root/reference/apps/eccentricity/kBFS-Ecc.C``, README.md:468-484):
run K simultaneous BFS waves as 64-bit visited bitmasks propagated with
bitwise-OR (``writeOr`` → ``bit_or`` monoid), and estimate each
vertex's eccentricity as the last round its mask grew — i.e. the max
BFS distance from any sample source that reaches it.

Where the reference samples sources by hash (and re-samples for a
second phase), this app takes EXPLICIT sources so results are
deterministic and SQL-expressible (the driver query uses sources
0..15); pass hashed samples for reference-shaped runs (see
``apps.radii`` which keeps the hashed-sampling variant).

Per-superstep plan: identical to radii — one groupBy(dst) shuffle for
the bit_or, one co-partitioned state join; the frontier (mask-changed
vertices) shrinks as waves die out, flipping the engine onto the
broadcast sparse path (``ligra.h:261`` direction optimization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import IterState, edge_map

__all__ = ["ecc_estimate"]


def _signed64(bit: int) -> int:
    return bit - (1 << 64) if bit >= (1 << 63) else bit


def ecc_estimate(
    graph,
    sources: list[int],
    on_superstep=None,
) -> tuple[DataFrame, int]:
    """Returns ((id, ecc) for vertices reached by >=1 source, rounds).

    ecc(v) = max over reaching sources s of dist(s, v) — exact when
    ``sources`` covers the graph, a lower-bound estimate otherwise
    (the kBFS trade-off the eccentricity suite documents).
    """
    if len(sources) > 64:
        raise ValueError("at most 64 simultaneous BFS waves (64-bit masks)")
    spark = graph.spark
    bits: dict[int, int] = {}
    for i, v in enumerate(sources):
        bits[int(v)] = bits.get(int(v), 0) | _signed64(1 << i)
    starts = spark.createDataFrame(
        [(v, b) for v, b in bits.items()], "id long, init_mask long"
    )
    init = graph.vertices.join(F.broadcast(starts), "id", "left").select(
        "id",
        F.coalesce("init_mask", F.lit(0)).cast("long").alias("mask"),
        F.when(F.col("init_mask").isNotNull(), 0).cast("int").alias("ecc"),
        F.col("init_mask").isNotNull().alias("changed"),
    )
    st = IterState(init, num_partitions=graph.num_partitions)
    rounds, fsize = 0, len(bits)
    while fsize > 0:
        rounds += 1
        frontier = st.df.filter("changed").select("id", "mask")
        msgs = edge_map(
            graph,
            frontier,
            message=F.col("mask"),
            aggregate=F.bit_or,
            frontier_size=fsize,
            extra_frontier_cols=("mask",),
        )
        new = (
            st.df.join(msgs.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.col("mask")
                .bitwiseOR(F.coalesce("agg", F.lit(0)))
                .alias("new_mask"),
                "mask",
                "ecc",
            )
            .select(
                "id",
                F.col("new_mask").alias("mask"),
                F.when(F.col("new_mask") != F.col("mask"), F.lit(rounds))
                .otherwise(F.col("ecc"))
                .cast("int")
                .alias("ecc"),
                (F.col("new_mask") != F.col("mask")).alias("changed"),
            )
        )
        new, fsize = st.advance(new, action=lambda df: df.filter("changed").count())
        if on_superstep:
            on_superstep(rounds, {"frontier": fsize})
    return st.df.filter(F.col("ecc").isNotNull()).select("id", "ecc"), rounds
